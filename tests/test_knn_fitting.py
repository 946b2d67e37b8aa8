"""kNN kernel vs scipy brute force; line/plane fit numerics vs numpy."""

import jax.numpy as jnp
import numpy as np

from msf_loam_tpu.ops import fitting, knn

RNG = np.random.default_rng(7)


def test_knn_matches_bruteforce():
    q = RNG.normal(size=(137, 3)).astype(np.float32) * 5
    r = RNG.normal(size=(1000, 3)).astype(np.float32) * 5
    rmask = np.ones(1000, bool)
    rmask[::7] = False
    d2, idx = knn.knn(jnp.asarray(q), jnp.ones(137, bool), jnp.asarray(r),
                      jnp.asarray(rmask), k=5, chunk=256)
    d2, idx = np.asarray(d2), np.asarray(idx)

    full = ((q[:, None, :] - r[None, :, :]) ** 2).sum(-1)
    full[:, ~rmask] = np.inf
    want_idx = np.argsort(full, axis=1)[:, :5]
    want_d2 = np.take_along_axis(full, want_idx, axis=1)
    np.testing.assert_allclose(d2, want_d2, rtol=1e-3, atol=1e-3)
    # indices can differ on exact ties; distances must match
    got_d2_from_idx = np.take_along_axis(full, idx, axis=1)
    np.testing.assert_allclose(got_d2_from_idx, want_d2, rtol=1e-3, atol=1e-3)


def test_knn_excludes_invalid_refs():
    q = np.zeros((1, 3), np.float32)
    r = np.array([[0.1, 0, 0], [0.2, 0, 0], [99, 99, 99]], np.float32)
    rmask = np.array([False, True, True])
    d2, idx = knn.knn(jnp.asarray(q), jnp.ones(1, bool), jnp.asarray(r),
                      jnp.asarray(rmask), k=2, chunk=4)
    assert int(idx[0, 0]) == 1
    assert int(idx[0, 1]) == 2


def test_knn_fewer_refs_than_k():
    q = np.zeros((2, 3), np.float32)
    r = np.array([[1.0, 0, 0]], np.float32)
    d2, idx = knn.knn(jnp.asarray(q), jnp.ones(2, bool), jnp.asarray(r),
                      jnp.ones(1, bool), k=3, chunk=4)
    assert int(idx[0, 0]) == 0
    assert (np.asarray(idx)[:, 1:] == -1).all()
    assert np.isinf(np.asarray(d2)[:, 1:]).all() or (np.asarray(d2)[:, 1:] > 1e30).all()


def test_eigh3x3_matches_numpy():
    A = RNG.normal(size=(200, 3, 3)).astype(np.float32)
    A = A + np.swapaxes(A, 1, 2)
    w, V = fitting.eigh3x3(jnp.asarray(A))
    w, V = np.asarray(w), np.asarray(V)
    w_np = np.linalg.eigvalsh(A)[:, ::-1]  # descending
    np.testing.assert_allclose(w, w_np, rtol=1e-3, atol=1e-3)
    # eigenvector property: A v = w v
    for i in range(3):
        Av = np.einsum("nij,nj->ni", A, V[:, :, i])
        wv = w[:, i:i + 1] * V[:, :, i]
        np.testing.assert_allclose(Av, wv, atol=5e-2)


def test_fit_lines_on_true_line():
    d = np.array([1.0, 2.0, -0.5])
    d = d / np.linalg.norm(d)
    t = np.linspace(-1, 1, 5)
    base = np.array([3.0, -1.0, 2.0])
    pts = base[None] + t[:, None] * d[None] + RNG.normal(size=(5, 3)) * 1e-3
    out = fitting.fit_lines(jnp.asarray(pts[None].astype(np.float32)),
                            jnp.ones((1, 5), bool))
    assert bool(out.valid[0])
    np.testing.assert_allclose(np.abs(np.asarray(out.direction[0]) @ d), 1.0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out.center[0]), pts.mean(0), atol=1e-3)


def test_fit_lines_rejects_blob():
    pts = RNG.normal(size=(1, 5, 3)).astype(np.float32)  # isotropic blob
    out = fitting.fit_lines(jnp.asarray(pts), jnp.ones((1, 5), bool))
    assert not bool(out.valid[0])


def test_fit_planes_on_true_plane():
    n = np.array([0.0, 0.0, 1.0])
    xy = RNG.normal(size=(5, 2))
    pts = np.concatenate([xy, np.full((5, 1), 2.0)], axis=1)  # z = 2 plane
    out = fitting.fit_planes(jnp.asarray(pts[None].astype(np.float32)),
                             jnp.ones((1, 5), bool))
    assert bool(out.valid[0])
    np.testing.assert_allclose(np.abs(np.asarray(out.normal[0]) @ n), 1.0, atol=1e-3)


def test_fit_planes_rejects_nonplanar():
    pts = RNG.normal(size=(1, 5, 3)).astype(np.float32) * 2
    out = fitting.fit_planes(jnp.asarray(pts), jnp.ones((1, 5), bool), tol=0.2)
    # 5 random gaussian points are almost surely not within 0.2 of a plane
    assert not bool(out.valid[0])


def test_fit_planes_matches_reference_tls():
    """The reference solves matA0 @ n = -1 via QR (mapping_scan_matcher.cc:
    210) in float64; our float32 fit is centered total-least-squares (the
    two agree on well-spread planar clusters — TLS is additionally stable
    for tight clusters far from the origin, which the -1-RHS solve is not
    in float32). Reference check: smallest right singular vector of the
    centered cluster in float64."""
    pts = (RNG.normal(size=(5, 3)) * 0.1 + np.array([5, 3, 1])).astype(np.float32)
    out = fitting.fit_planes(jnp.asarray(pts[None]), jnp.ones((1, 5), bool), tol=10.0)
    _, _, Vt = np.linalg.svd(pts.astype(np.float64) - pts.mean(0))
    n_ref = Vt[-1]
    got = np.asarray(out.normal[0])
    np.testing.assert_allclose(np.abs(got @ n_ref), 1.0, atol=1e-3)


def test_fit_planes_two_scale_fallback_recovers_grazed_floor():
    """Strict 5-NN = one collinear ring arc (rejected by the spread gate);
    the wide set adds the adjacent ring arcs -> the fallback fit recovers
    the true floor normal, and the near arc lies on the accepted plane."""
    theta = np.linspace(-0.017, 0.017, 5)
    near = np.stack([30 * np.cos(theta), 30 * np.sin(theta),
                     np.full(5, -1.8)], 1).astype(np.float32)
    rows = []
    for rr in (28.8, 30.0, 31.2):  # three ring arcs on the same floor
        rows.append(np.stack([rr * np.cos(theta), rr * np.sin(theta),
                              np.full(5, -1.8)], 1))
    wide = np.concatenate(rows, 0).astype(np.float32)[:16]
    wide = np.concatenate([wide, np.zeros((16 - len(wide), 3), np.float32)])
    wv = np.arange(16) < 15

    strict = fitting.fit_planes(jnp.asarray(near[None]), jnp.ones((1, 5), bool))
    assert not bool(strict.valid[0])
    out = fitting.fit_planes_two_scale(
        jnp.asarray(near[None]), jnp.ones((1, 5), bool),
        jnp.asarray(wide[None]), jnp.asarray(wv[None]))
    assert bool(out.valid[0])
    assert abs(float(out.normal[0, 2])) > 0.99


def test_fit_planes_two_scale_rejects_polluted_wide_set():
    """A wide set mixing two unrelated surfaces must not be accepted, and
    a wide plane the NEAR arc is not on must not be accepted either."""
    theta = np.linspace(-0.017, 0.017, 5)
    near = np.stack([30 * np.cos(theta), 30 * np.sin(theta),
                     np.full(5, -1.8)], 1).astype(np.float32)
    # wide = a clean VERTICAL wall plane near the arc (spread ok, resid ok)
    yy, zz = np.meshgrid(np.linspace(-1, 1, 4), np.linspace(-2, 0, 4))
    wall = np.stack([np.full(16, 30.6), 30 * 0.0 + yy.ravel(),
                     zz.ravel()], 1).astype(np.float32)
    out = fitting.fit_planes_two_scale(
        jnp.asarray(near[None]), jnp.ones((1, 5), bool),
        jnp.asarray(wall[None]), jnp.ones((1, 16), bool))
    # near arc is ~0.6 m off that wall -> resid_near gate rejects
    assert not bool(out.valid[0])


def test_fit_planes_isotropic_patch_unit_normal():
    """Regression: a plane patch with isotropic in-plane spread (repeated
    top eigenvalues) must fit a UNIT normal — the old v2 = v0 x v1
    composition returned a zero normal there (both direct solves hit the
    degenerate fallback), and a zero normal passes every residual gate."""
    yy, zz = np.meshgrid(np.linspace(-1, 1, 4), np.linspace(-1, 1, 4))
    pts = np.stack([np.full(16, 7.0), yy.ravel(), zz.ravel()], 1
                   ).astype(np.float32)
    out = fitting.fit_planes(jnp.asarray(pts[None]), jnp.ones((1, 16), bool))
    n = np.asarray(out.normal[0])
    assert bool(out.valid[0])
    np.testing.assert_allclose(np.linalg.norm(n), 1.0, atol=1e-4)
    assert abs(n[0]) > 0.999


def test_select_matches_query_and_cached_matcher_parity():
    """(a) gather_candidates + select_knn(_2r) must reproduce query_knn(_2r)
    bit-for-bit at the gather positions; (b) the cached-candidate matcher
    must land on the same pose as exact per-round re-query."""
    import dataclasses

    from msf_loam_tpu.config import MappingConfig
    from msf_loam_tpu.core.pointcloud import PointBatch
    from msf_loam_tpu.core.se3 import Pose
    from msf_loam_tpu.slam import mapping, voxel_map

    rng = np.random.default_rng(3)
    m = voxel_map.create_map(1 << 12, 32, 2.0, 0.4)
    # a box room: floor + two walls (line/plane structure for the matcher)
    n = 3000
    pts = np.concatenate([
        np.stack([rng.uniform(-8, 8, n), rng.uniform(-8, 8, n),
                  np.full(n, -1.5)], 1),
        np.stack([np.full(n, 8.0), rng.uniform(-8, 8, n),
                  rng.uniform(-1.5, 2.5, n)], 1),
        np.stack([rng.uniform(-8, 8, n), np.full(n, 8.0),
                  rng.uniform(-1.5, 2.5, n)], 1),
    ]).astype(np.float32)
    m = voxel_map.insert(m, jnp.asarray(pts), jnp.ones(len(pts), bool))

    q = jnp.asarray(pts[rng.choice(len(pts), 256, replace=False)]
                    + rng.normal(0, 0.05, (256, 3)).astype(np.float32))
    qm = jnp.ones(256, bool)
    cand, val = voxel_map.gather_candidates(m, q, qm)
    for got, ref in zip(
            voxel_map.select_knn_2r(cand, val, q, m.cell_size, 5, 16),
            voxel_map.query_knn_2r(m, q, qm, 5, 16)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    scan_idx = rng.choice(len(pts), 512, replace=False)
    scan = PointBatch(
        xyz=jnp.asarray(pts[scan_idx] + rng.normal(0, 0.01, (512, 3))
                        .astype(np.float32)),
        rel_time=jnp.zeros(512), ring=jnp.zeros(512, jnp.int32),
        mask=jnp.ones(512, bool))
    pose0 = Pose(t=jnp.asarray([0.05, -0.04, 0.03]),
                 q=jnp.asarray([1.0, 0.0, 0.002, 0.0]))
    cfg_on = MappingConfig(map_table_size=1 << 12, max_query_points=512,
                           min_map_corner=10, min_map_surf=10)
    cfg_off = dataclasses.replace(cfg_on, reuse_candidates=False)
    out_on = mapping.match_scan2map(m, m, scan, scan, pose0, cfg_on)
    out_off = mapping.match_scan2map(m, m, scan, scan, pose0, cfg_off)
    np.testing.assert_allclose(np.asarray(out_on.pose.t),
                               np.asarray(out_off.pose.t), atol=2e-3)


def test_fit_planes_two_scale_masked_matches_semantics():
    """The moments-based wide fallback must (a) recover the grazed-floor
    normal like the top-k2 variant and (b) reject when the near arc is off
    the wide plane."""
    theta = np.linspace(-0.017, 0.017, 5)
    near = np.stack([30 * np.cos(theta), 30 * np.sin(theta),
                     np.full(5, -1.8)], 1).astype(np.float32)
    rows = []
    for rr in (28.8, 30.0, 31.2):
        rows.append(np.stack([rr * np.cos(theta), rr * np.sin(theta),
                              np.full(5, -1.8)], 1))
    cand = np.concatenate(rows, 0).astype(np.float32)
    cand = np.concatenate([cand, np.zeros((256 - len(cand), 3), np.float32)])
    mask = np.arange(256) < 15

    out = fitting.fit_planes_two_scale_masked(
        jnp.asarray(near[None]), jnp.ones((1, 5), bool),
        jnp.asarray(cand[None]), jnp.asarray(mask[None]))
    assert bool(out.valid[0])
    assert abs(float(out.normal[0, 2])) > 0.99

    # wide set = a vertical wall 0.6 m from the near arc -> reject
    yy, zz = np.meshgrid(np.linspace(-1, 1, 4), np.linspace(-2, 0, 4))
    wall = np.stack([np.full(16, 30.6), yy.ravel(), zz.ravel()], 1
                    ).astype(np.float32)
    wall = np.concatenate([wall, np.zeros((256 - 16, 3), np.float32)])
    wmask = np.arange(256) < 16
    out = fitting.fit_planes_two_scale_masked(
        jnp.asarray(near[None]), jnp.ones((1, 5), bool),
        jnp.asarray(wall[None]), jnp.asarray(wmask[None]))
    assert not bool(out.valid[0])
