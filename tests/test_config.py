"""Config-time invariant validation: bad configs must fail loudly at load,
not silently return incomplete kNN sets at runtime."""

import dataclasses

import pytest

from msf_loam_tpu.config import (FeatureConfig, MappingConfig, MsfLoamConfig)


def test_default_config_valid():
    MsfLoamConfig()  # must not raise


def test_knn_gate_beyond_completeness_radius_rejected():
    # 8-cell octant queries are only complete to (cell/2)^2; a wider gate
    # would silently accept incomplete neighbor sets (CLAUDE.md hard rule).
    with pytest.raises(ValueError, match="completeness"):
        MsfLoamConfig(mapping=MappingConfig(knn_dist_sq_max=3.0,
                                            map_cell_size=2.0))


def test_knn_gate_at_bound_accepted():
    MsfLoamConfig(mapping=MappingConfig(knn_dist_sq_max=1.0,
                                        map_cell_size=2.0))
    MsfLoamConfig(mapping=MappingConfig(knn_dist_sq_max=2.25,
                                        map_cell_size=3.0))


def test_bad_table_sizes_rejected():
    with pytest.raises(ValueError):
        MsfLoamConfig(mapping=MappingConfig(map_table_size=0))
    with pytest.raises(ValueError):
        MsfLoamConfig(mapping=MappingConfig(map_cell_capacity=-1))


def test_query_budget_below_knn_rejected():
    with pytest.raises(ValueError, match="query budget|max_query_points"):
        MsfLoamConfig(mapping=MappingConfig(max_query_points=3, knn=5))


def test_sharp_subset_invariant():
    with pytest.raises(ValueError, match="sharp_per_sector"):
        MsfLoamConfig(features=FeatureConfig(sharp_per_sector=30,
                                             less_sharp_per_sector=20))


def test_from_dict_validates():
    with pytest.raises(ValueError, match="completeness"):
        MsfLoamConfig.from_dict({"mapping": {"knn_dist_sq_max": 9.0}})


def test_replace_validates():
    cfg = MsfLoamConfig()
    with pytest.raises(ValueError):
        dataclasses.replace(
            cfg, mapping=MappingConfig(knn_dist_sq_max=9.0))


def test_corner_query_budget():
    # 0 (default) falls back to the shared budget
    mc = MappingConfig()
    assert mc.corner_query_points == mc.max_query_points
    mc = MappingConfig(max_corner_query_points=1024)
    assert mc.corner_query_points == 1024
    with pytest.raises(ValueError, match="max_corner_query_points"):
        MsfLoamConfig(mapping=MappingConfig(max_corner_query_points=3, knn=5))


def test_negative_corner_query_budget_rejected():
    # ADVICE r3: -5 is truthy, so the `or` fallback in corner_query_points
    # never triggers — a negative budget must be a config-time error
    with pytest.raises(ValueError, match="max_corner_query_points"):
        MsfLoamConfig(mapping=MappingConfig(max_corner_query_points=-5))
