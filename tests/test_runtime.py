"""Native C++ runtime: golden-test against the numpy ingest, prefetcher
ordering, .bin roundtrip."""

import os

import numpy as np
import pytest

from msf_loam_tpu import runtime
from msf_loam_tpu.config import FeatureConfig
from msf_loam_tpu.dataio import kitti, preprocess, synthetic

pytestmark = pytest.mark.skipif(not runtime.available(),
                                reason="native runtime not built")

CFG = FeatureConfig(max_points_per_ring=2048)


def _scan():
    world = synthetic.World.corridor(seed=0, size=12.0)
    return synthetic.simulate_scan(world, np.zeros(3), np.eye(3),
                                   n_rings=16, pts_per_ring=1800)


def test_preprocess_matches_numpy():
    xyz, ring = _scan()
    got_xyz, got_rel, got_mask, kept = runtime.preprocess_scan(
        xyz, ring, CFG.min_range, CFG.scan_period, 16, CFG.max_points_per_ring)
    img = preprocess.preprocess_scan(xyz, ring, CFG, num_rings=16)
    np.testing.assert_array_equal(got_mask, np.asarray(img.mask))
    np.testing.assert_allclose(got_xyz, np.asarray(img.xyz), atol=1e-6)
    np.testing.assert_allclose(got_rel, np.asarray(img.rel_time), atol=1e-5)
    assert kept == int(np.asarray(img.mask).sum())


def test_preprocess_handles_invalid_points():
    xyz = np.array([[np.nan, 0, 0], [0.1, 0, 0], [5, 0, 0]], np.float32)
    ring = np.zeros(3, np.int32)
    _, _, mask, kept = runtime.preprocess_scan(
        xyz, ring, 0.3, 0.1, 1, 16)
    assert kept == 1


def test_bin_roundtrip(tmp_path):
    pts = np.random.default_rng(0).normal(size=(100, 3)).astype(np.float32)
    path = str(tmp_path / "000000.bin")
    kitti.write_kitti_frame(path, pts)
    back = runtime.read_kitti_bin(path)
    np.testing.assert_allclose(back[:, :3], pts, atol=1e-7)


def test_prefetcher_in_order(tmp_path):
    root = str(tmp_path)
    kitti.make_synthetic_kitti_sequence(root, "00", n_frames=5,
                                        pts_per_ring=400)
    vdir = os.path.join(root, "sequences", "00", "velodyne")
    pf = runtime.Prefetcher(vdir, 5, n_rings=16, width=512, n_threads=3)
    seen = []
    for idx, xyz, rel, mask, n_kept in pf:
        seen.append(idx)
        assert n_kept > 0
        assert mask.sum() == n_kept
    pf.close()
    assert seen == [0, 1, 2, 3, 4]
