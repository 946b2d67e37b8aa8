"""Fused Pallas selection+fit kernel (ops.select_fit) vs the XLA reference
path (voxel_map.select_knn_weights + ops.fitting.fit_*_weighted).

Run in interpreter mode on the CPU test backend; the same kernel code is
what executes compiled on TPU (bench.py / kitti_eval exercise that)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msf_loam_tpu.ops import fitting
from msf_loam_tpu.ops.select_fit import select_fit_pallas
from msf_loam_tpu.slam import voxel_map


def _mk_slabs(seed, n=96, c=64, cell=2.0, planar=False, linear=False):
    """Random candidate slabs around each query; ~15% invalid entries."""
    rng = np.random.default_rng(seed)
    q = rng.uniform(-40.0, 40.0, (n, 3)).astype(np.float32)
    off = rng.uniform(-1.4, 1.4, (n, c, 3)).astype(np.float32)
    if planar:
        # squash onto a tilted plane with small out-of-plane noise
        nvec = rng.normal(size=(n, 3)).astype(np.float32)
        nvec /= np.linalg.norm(nvec, axis=-1, keepdims=True)
        off -= (off @ nvec[..., None]) * nvec[:, None, :]
        off += 0.02 * rng.normal(size=(n, c, 1)).astype(np.float32) \
            * nvec[:, None, :]
    if linear:
        dvec = rng.normal(size=(n, 3)).astype(np.float32)
        dvec /= np.linalg.norm(dvec, axis=-1, keepdims=True)
        t = rng.uniform(-1.0, 1.0, (n, c, 1)).astype(np.float32)
        off = t * dvec[:, None, :] \
            + 0.01 * rng.normal(size=(n, c, 3)).astype(np.float32)
    cand = q[:, None, :] + off
    valid = rng.uniform(size=(n, c)) > 0.15
    return (jnp.asarray(cand), jnp.asarray(valid), jnp.asarray(q),
            jnp.float32(cell))


def _planarize(cand, valid):
    """(N, C, 3) + mask -> (3, N, C) with the 1e9 invalid sentinel."""
    sent = jnp.where(valid[..., None], cand, 1e9)
    return jnp.transpose(sent, (2, 0, 1))


def _ref_select(cand, valid, q, cell, k=5):
    return voxel_map.select_knn_weights(cand, valid, q, cell, k=k)


@pytest.mark.parametrize("seed", [0, 1])
def test_topk_distances_match(seed):
    cand, valid, q, cell = _mk_slabs(seed)
    d2r, w_r, wide_r = _ref_select(cand, valid, q, cell)
    out = select_fit_pallas(_planarize(cand, valid), q,
                            (cell * 0.5) ** 2, cell ** 2,
                            k=5, mode="plane2", interpret=True)
    got = np.asarray(out.d2)
    want = np.asarray(d2r)
    fin = want < 1e37
    np.testing.assert_allclose(got[fin], want[fin], rtol=1e-5, atol=1e-6)
    assert np.array_equal(got >= 1e37, ~fin)


def test_line_fit_matches_reference():
    cand, valid, q, cell = _mk_slabs(7, linear=True)
    d2r, w_r, _ = _ref_select(cand, valid, q, cell)
    lines = fitting.fit_lines_weighted(cand, w_r, 5, 3.0)
    gate = np.asarray(d2r[:, 4] < 1e37)
    out = select_fit_pallas(_planarize(cand, valid), q,
                            (cell * 0.5) ** 2, cell ** 2,
                            k=5, mode="line", min_count=5, eig_ratio=3.0,
                            interpret=True)
    v_ref = np.asarray(lines.valid) & gate
    v_got = np.asarray(out.valid) & gate
    assert (v_ref == v_got).mean() > 0.98   # knife-edge eig-ratio ties only
    both = v_ref & v_got
    c_ref, c_got = np.asarray(lines.center)[both], np.asarray(out.center)[both]
    np.testing.assert_allclose(c_got, c_ref, rtol=1e-4, atol=1e-4)
    d_ref, d_got = np.asarray(lines.direction)[both], np.asarray(out.normal)[both]
    dots = np.abs(np.sum(d_ref * d_got, axis=-1))
    assert dots.min() > 1 - 1e-4            # same line, sign-free


@pytest.mark.parametrize("mode", ["plane", "plane2"])
def test_plane_fit_matches_reference(mode):
    cand, valid, q, cell = _mk_slabs(11, planar=True)
    d2r, w_r, wide_r = _ref_select(cand, valid, q, cell)
    if mode == "plane2":
        planes = fitting.fit_planes_two_scale_weighted(
            cand, w_r, wide_r, 5, 0.2, min_wide=5)
    else:
        planes = fitting.fit_planes_weighted(cand, w_r, 5, 0.2)
    gate = np.asarray(d2r[:, 4] < 1e37)
    out = select_fit_pallas(_planarize(cand, valid), q,
                            (cell * 0.5) ** 2, cell ** 2,
                            k=5, mode=mode, min_count=5, min_wide=5,
                            tol=0.2, interpret=True)
    v_ref = np.asarray(planes.valid) & gate
    v_got = np.asarray(out.valid) & gate
    assert (v_ref == v_got).mean() > 0.97   # gate-boundary flips only
    both = v_ref & v_got
    n_ref, n_got = np.asarray(planes.normal)[both], np.asarray(out.normal)[both]
    dots = np.abs(np.sum(n_ref * n_got, axis=-1))
    assert dots.min() > 1 - 1e-3
    c_ref, c_got = np.asarray(planes.center)[both], np.asarray(out.center)[both]
    np.testing.assert_allclose(c_got, c_ref, rtol=1e-3, atol=2e-3)


def test_empty_and_padded_rows():
    cand, valid, q, cell = _mk_slabs(3, n=40)   # pads 40 -> 256 rows
    valid = valid.at[5].set(False)              # a fully-empty query row
    out = select_fit_pallas(_planarize(cand, valid), q,
                            (cell * 0.5) ** 2, cell ** 2,
                            k=5, mode="plane2", interpret=True)
    assert out.d2.shape == (40, 5)
    assert bool(jnp.all(out.d2[5] > 1e37))
    assert not bool(out.valid[5])
    assert bool(jnp.all(jnp.isfinite(out.center))), "no NaNs on empty rows"
    assert bool(jnp.all(jnp.isfinite(out.normal)))


def test_matcher_fused_vs_xla_end_to_end():
    """match_scan2map with fused_select on (interpret) vs off on a real
    small map: recovered poses must agree to millimeters."""
    import dataclasses

    from msf_loam_tpu.config import MappingConfig
    from msf_loam_tpu.core.pointcloud import PointBatch
    from msf_loam_tpu.core.se3 import Pose
    from msf_loam_tpu.slam.mapping import match_scan2map_core
    from msf_loam_tpu.slam.voxel_map import create_map, insert

    rng = np.random.default_rng(0)
    # world: two walls + floor (planes) and a vertical edge column
    npts = 3000
    floor = np.stack([rng.uniform(-10, 10, npts), rng.uniform(-10, 10, npts),
                      np.zeros(npts)], -1)
    wall = np.stack([rng.uniform(-10, 10, npts), np.full(npts, 5.0),
                     rng.uniform(0, 4, npts)], -1)
    wall2 = np.stack([np.full(npts, -6.0), rng.uniform(-10, 10, npts),
                      rng.uniform(0, 4, npts)], -1)
    col = np.stack([np.full(200, 2.0), np.full(200, 2.0),
                    np.linspace(0, 4, 200)], -1)
    surf_pts = np.concatenate([floor, wall, wall2]).astype(np.float32)
    corner_pts = np.concatenate([col, col + [1.5, -2.0, 0.0]]).astype(
        np.float32)

    cfg = MappingConfig(map_table_size=1 << 12, map_cell_capacity=16,
                        max_query_points=512)
    cmap = create_map(cfg.map_table_size, cfg.map_cell_capacity,
                      cfg.map_cell_size, cfg.line_resolution)
    smap = create_map(cfg.map_table_size, cfg.map_cell_capacity,
                      cfg.map_cell_size, cfg.plane_resolution)
    cmap = insert(cmap, jnp.asarray(corner_pts),
                  jnp.ones(len(corner_pts), bool))
    smap = insert(smap, jnp.asarray(surf_pts), jnp.ones(len(surf_pts), bool))

    from msf_loam_tpu.core.se3 import quat_exp
    true_pose = Pose(t=jnp.asarray([0.15, -0.1, 0.05], jnp.float32),
                     q=quat_exp(jnp.asarray([0.0, 0.0, 0.03], jnp.float32)))
    inv = true_pose.inverse()

    def mk_scan(pts, n, q):
        sel = pts[rng.choice(len(pts), n, replace=False)]
        xyz = jnp.pad(inv.apply(jnp.asarray(sel)), ((0, q - n), (0, 0)))
        mask = jnp.pad(jnp.ones(n, bool), (0, q - n))
        return PointBatch(xyz=xyz, mask=mask,
                          rel_time=jnp.zeros(q, jnp.float32),
                          ring=jnp.zeros(q, jnp.int32))

    scan_c = mk_scan(corner_pts, 128, 512)
    scan_s = mk_scan(surf_pts, 512, 512)

    p0 = Pose.identity()
    res_xla = match_scan2map_core(
        cmap, smap, scan_c, scan_s, p0,
        dataclasses.replace(cfg, fused_select="off"))
    res_fused = match_scan2map_core(
        cmap, smap, scan_c, scan_s, p0,
        dataclasses.replace(cfg, fused_select="on"))

    assert bool(res_xla.ok) and bool(res_fused.ok)
    # both recover the true pose (scene has weak z observability — floor
    # only; the two paths agree to 1e-8, so the residual is the scene's)
    np.testing.assert_allclose(np.asarray(res_fused.pose.t),
                               np.asarray(true_pose.t), atol=5e-2)
    # and agree with each other tightly
    np.testing.assert_allclose(np.asarray(res_fused.pose.t),
                               np.asarray(res_xla.pose.t), atol=1e-4)
    np.testing.assert_allclose(np.asarray(res_fused.pose.q),
                               np.asarray(res_xla.pose.q), atol=1e-5)


def test_matcher_two_level_gather_matches_one_level():
    """fused matcher with gather_two_level on vs off: the two-level octant
    gather is bit-identical below the u_max budget, so recovered poses
    must agree exactly (same candidates, same kernel)."""
    import dataclasses

    from msf_loam_tpu.config import MappingConfig
    from msf_loam_tpu.core.pointcloud import PointBatch
    from msf_loam_tpu.core.se3 import Pose, quat_exp
    from msf_loam_tpu.slam.mapping import match_scan2map_core
    from msf_loam_tpu.slam.voxel_map import create_map, insert

    rng = np.random.default_rng(7)
    npts = 2000
    floor = np.stack([rng.uniform(-10, 10, npts), rng.uniform(-10, 10, npts),
                      np.zeros(npts)], -1)
    wall = np.stack([rng.uniform(-10, 10, npts), np.full(npts, 5.0),
                     rng.uniform(0, 4, npts)], -1)
    col = np.stack([np.full(200, 2.0), np.full(200, 2.0),
                    np.linspace(0, 4, 200)], -1)
    surf_pts = np.concatenate([floor, wall]).astype(np.float32)
    corner_pts = np.concatenate([col, col + [1.5, -2.0, 0.0]]).astype(
        np.float32)

    cfg = MappingConfig(map_table_size=1 << 12, map_cell_capacity=16,
                        max_query_points=512, fused_select="on")
    cmap = create_map(cfg.map_table_size, cfg.map_cell_capacity,
                      cfg.map_cell_size, cfg.line_resolution)
    smap = create_map(cfg.map_table_size, cfg.map_cell_capacity,
                      cfg.map_cell_size, cfg.plane_resolution)
    cmap = insert(cmap, jnp.asarray(corner_pts),
                  jnp.ones(len(corner_pts), bool))
    smap = insert(smap, jnp.asarray(surf_pts), jnp.ones(len(surf_pts), bool))

    true_pose = Pose(t=jnp.asarray([0.1, -0.05, 0.02], jnp.float32),
                     q=quat_exp(jnp.asarray([0.0, 0.0, 0.02], jnp.float32)))
    inv = true_pose.inverse()

    def mk_scan(pts, n, q):
        sel = pts[rng.choice(len(pts), n, replace=False)]
        xyz = jnp.pad(inv.apply(jnp.asarray(sel)), ((0, q - n), (0, 0)))
        mask = jnp.pad(jnp.ones(n, bool), (0, q - n))
        return PointBatch(xyz=xyz, mask=mask,
                          rel_time=jnp.zeros(q, jnp.float32),
                          ring=jnp.zeros(q, jnp.int32))

    scan_c = mk_scan(corner_pts, 128, 512)
    scan_s = mk_scan(surf_pts, 512, 512)
    p0 = Pose.identity()

    res_one = match_scan2map_core(
        cmap, smap, scan_c, scan_s, p0,
        dataclasses.replace(cfg, gather_two_level="off"))
    res_two = match_scan2map_core(
        cmap, smap, scan_c, scan_s, p0,
        dataclasses.replace(cfg, gather_two_level="on", gather_u_max=2048))

    assert bool(res_one.ok) and bool(res_two.ok)
    np.testing.assert_array_equal(np.asarray(res_two.pose.t),
                                  np.asarray(res_one.pose.t))
    np.testing.assert_array_equal(np.asarray(res_two.pose.q),
                                  np.asarray(res_one.pose.q))


def test_matcher_grouped_gather_matches_one_level():
    """fused matcher fed grouped queries (gather_grouped on) vs the same
    queries through the one-level gather: bit-identical candidates below
    the group budget, so recovered poses must agree exactly."""
    import dataclasses

    from msf_loam_tpu.config import MappingConfig
    from msf_loam_tpu.core.pointcloud import PointBatch
    from msf_loam_tpu.core.se3 import Pose, quat_exp
    from msf_loam_tpu.slam.mapping import match_scan2map_core
    from msf_loam_tpu.slam.pipeline import downsample_features_grouped
    from msf_loam_tpu.slam.voxel_map import create_map, insert

    rng = np.random.default_rng(9)
    npts = 2000
    floor = np.stack([rng.uniform(-10, 10, npts), rng.uniform(-10, 10, npts),
                      np.zeros(npts)], -1)
    wall = np.stack([rng.uniform(-10, 10, npts), np.full(npts, 5.0),
                     rng.uniform(0, 4, npts)], -1)
    col = np.stack([np.full(200, 2.0), np.full(200, 2.0),
                    np.linspace(0, 4, 200)], -1)
    surf_pts = np.concatenate([floor, wall]).astype(np.float32)
    corner_pts = np.concatenate([col, col + [1.5, -2.0, 0.0]]).astype(
        np.float32)

    cfg = MappingConfig(map_table_size=1 << 12, map_cell_capacity=16,
                        max_query_points=512, fused_select="on",
                        gather_groups=256)
    cmap = create_map(cfg.map_table_size, cfg.map_cell_capacity,
                      cfg.map_cell_size, cfg.line_resolution)
    smap = create_map(cfg.map_table_size, cfg.map_cell_capacity,
                      cfg.map_cell_size, cfg.plane_resolution)
    cmap = insert(cmap, jnp.asarray(corner_pts),
                  jnp.ones(len(corner_pts), bool))
    smap = insert(smap, jnp.asarray(surf_pts), jnp.ones(len(surf_pts), bool))

    true_pose = Pose(t=jnp.asarray([0.1, -0.05, 0.02], jnp.float32),
                     q=quat_exp(jnp.asarray([0.0, 0.0, 0.02], jnp.float32)))
    inv = true_pose.inverse()
    p0 = Pose.identity()

    def mk_grouped(pts, n, q, leaf):
        sel = pts[rng.choice(len(pts), n, replace=False)]
        xyz = jnp.pad(inv.apply(jnp.asarray(sel)), ((0, q - n), (0, 0)))
        mask = jnp.pad(jnp.ones(n, bool), (0, q - n))
        pb = PointBatch(xyz=xyz, mask=mask,
                        rel_time=jnp.zeros(q, jnp.float32),
                        ring=jnp.zeros(q, jnp.int32))
        # grouping key = the matcher's query transform at the prior pose
        return downsample_features_grouped(
            pb, leaf, q, p0.apply(pb.xyz), cfg.map_cell_size,
            cfg.gather_groups)

    scan_c, grp_c = mk_grouped(corner_pts, 300, 512, cfg.line_resolution)
    scan_s, grp_s = mk_grouped(surf_pts, 512, 512, cfg.plane_resolution)

    res_one = match_scan2map_core(
        cmap, smap, scan_c, scan_s, p0,
        dataclasses.replace(cfg, gather_grouped="off"))
    res_grp = match_scan2map_core(
        cmap, smap, scan_c, scan_s, p0,
        dataclasses.replace(cfg, gather_grouped="on"),
        corner_groups=grp_c, surf_groups=grp_s)

    assert bool(res_one.ok) and bool(res_grp.ok)
    np.testing.assert_array_equal(np.asarray(res_grp.pose.t),
                                  np.asarray(res_one.pose.t))
    np.testing.assert_array_equal(np.asarray(res_grp.pose.q),
                                  np.asarray(res_one.pose.q))
