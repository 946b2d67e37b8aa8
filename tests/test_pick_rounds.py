"""Fused Pallas pick-rounds kernel (ops/pick_rounds.py) vs the XLA
reference rounds: bit-identical picks and suppression on real scans.
Runs the kernel in interpreter mode on CPU — the SAME kernel code that
compiles on TPU (device verification: scripts/verify_pick_rounds_tpu.py)."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from msf_loam_tpu.config import FeatureConfig
from msf_loam_tpu.dataio import preprocess, synthetic
from msf_loam_tpu.ops import features as F

WORLD = synthetic.World.corridor(seed=0, size=12.0)


def _planes(n_rings=16, seed=0, cfg=None, yaw=0.3):
    cfg = cfg or FeatureConfig(max_points_per_ring=2048)
    c, s = np.cos(yaw), np.sin(yaw)
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
    xyz, ring = synthetic.simulate_scan(
        WORLD, np.array([1.0, 0.4, 0.0]), R, n_rings=n_rings,
        pts_per_ring=1800, noise=0.004, seed=seed)
    img = preprocess.preprocess_scan(xyz, ring, cfg, num_rings=n_rings)
    curv, eligible = F.compute_curvature(img.xyz, img.mask, cfg)
    n_valid = jnp.sum(img.mask.astype(jnp.int32), axis=1)
    sector = F.assign_sectors(eligible, n_valid, cfg)
    gap = F._gap_sq(img.xyz)
    pickable = eligible & ~F.unreliable_mask(img.xyz, img.mask, cfg)
    gate = F.corner_gate_array(curv, eligible, sector, cfg)
    return cfg, curv, pickable, sector, gap, gate


def _compare(cfg, curv, pickable, sector, gap, gate):
    cfg_off = dataclasses.replace(cfg, fused_picks="off")
    cfg_on = dataclasses.replace(cfg, fused_picks="on")
    want_c, want_f, want_sup = F.run_pick_rounds(
        curv, pickable, sector, gap, gate, cfg_off)
    got_c, got_f, got_sup = F.run_pick_rounds(
        curv, pickable, sector, gap, gate, cfg_on)
    np.testing.assert_array_equal(np.asarray(got_c), np.asarray(want_c))
    np.testing.assert_array_equal(np.asarray(got_f), np.asarray(want_f))
    np.testing.assert_array_equal(np.asarray(got_sup), np.asarray(want_sup))
    # sanity: real picks exist
    assert int((np.asarray(got_c) >= 0).sum()) > 50
    assert int((np.asarray(got_f) >= 0).sum()) > 50


def test_pick_rounds_bit_equal_16ring():
    _compare(*_planes(16, seed=0))


def test_pick_rounds_bit_equal_other_scene():
    _compare(*_planes(16, seed=3, yaw=1.2))


def test_pick_rounds_bit_equal_odd_rings():
    # R=12 exercises the row padding path (rb=8 blocks)
    _compare(*_planes(12, seed=1))


def test_pick_rounds_bit_equal_nondefault_budget():
    cfg = FeatureConfig(max_points_per_ring=2048, sharp_per_sector=3,
                        less_sharp_per_sector=15, flat_per_sector=2)
    _compare(*_planes(16, seed=2, cfg=cfg))
