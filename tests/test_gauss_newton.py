"""GN solver tests: Jacobians vs finite differences, pose recovery on
synthetic correspondences, Huber/quantile robustness."""

import jax
import jax.numpy as jnp
import numpy as np

from msf_loam_tpu.core.se3 import Pose, quat_exp, quat_normalize, quat_rotate
from msf_loam_tpu.ops import gauss_newton as gn
from msf_loam_tpu.ops import icp_residuals as icp

RNG = np.random.default_rng(11)


def _rand_pose(scale_t=1.0, scale_r=0.3):
    t = jnp.asarray(RNG.normal(size=3).astype(np.float32)) * scale_t
    q = quat_exp(jnp.asarray(RNG.normal(size=3).astype(np.float32)) * scale_r)
    return Pose(t=t, q=q)


def _fd_jacobian(res_fn, pose, eps=1e-4):
    """Finite-difference Jacobian of res_fn(pose) wrt the 6-dim tangent."""
    r0 = res_fn(pose)
    cols = []
    for i in range(6):
        d = np.zeros(6, np.float32)
        d[i] = eps
        r1 = res_fn(pose.retract(jnp.asarray(d)))
        cols.append((np.asarray(r1) - np.asarray(r0)) / eps)
    return np.stack(cols, axis=-1)


def test_edge_jacobian_matches_fd():
    pose = _rand_pose()
    pts = jnp.asarray(RNG.normal(size=(4, 3)).astype(np.float32))
    c = jnp.asarray(RNG.normal(size=(4, 3)).astype(np.float32))
    n = jnp.asarray(RNG.normal(size=(4, 3)).astype(np.float32))
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    valid = jnp.ones(4, bool)

    blocks = icp.edge_residuals(pose, pts, c, n, valid)
    fd = _fd_jacobian(lambda p: icp.edge_residuals(p, pts, c, n, valid).r, pose)
    np.testing.assert_allclose(np.asarray(blocks.J), fd, atol=2e-2, rtol=1e-2)


def test_plane_jacobian_matches_fd():
    pose = _rand_pose()
    pts = jnp.asarray(RNG.normal(size=(4, 3)).astype(np.float32))
    c = jnp.asarray(RNG.normal(size=(4, 3)).astype(np.float32))
    n = jnp.asarray(RNG.normal(size=(4, 3)).astype(np.float32))
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    valid = jnp.ones(4, bool)

    blocks = icp.plane_residuals(pose, pts, c, n, valid)
    fd = _fd_jacobian(lambda p: icp.plane_residuals(p, pts, c, n, valid).r, pose)
    np.testing.assert_allclose(np.asarray(blocks.J), fd, atol=2e-2, rtol=1e-2)


def test_deskew_jacobians_match_fd():
    pose = _rand_pose()
    vel = jnp.asarray(RNG.normal(size=3).astype(np.float32))
    pts = jnp.asarray(RNG.normal(size=(4, 3)).astype(np.float32))
    c = jnp.asarray(RNG.normal(size=(4, 3)).astype(np.float32))
    n = jnp.asarray(RNG.normal(size=(4, 3)).astype(np.float32))
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    valid = jnp.ones(4, bool)
    dk = icp.DeskewTerms(
        delta_p=jnp.asarray(RNG.normal(size=(4, 3)).astype(np.float32)) * 0.01,
        delta_q=quat_normalize(jnp.asarray(
            np.concatenate([np.ones((4, 1)), RNG.normal(size=(4, 3)) * 0.01], 1)
            .astype(np.float32))),
        dt=jnp.asarray(RNG.uniform(0, 0.1, size=4).astype(np.float32)),
        gravity=jnp.asarray([0.0, 0.0, 9.81], dtype=jnp.float32),
    )

    blocks = icp.edge_residuals_deskew(pose, vel, pts, c, n, valid, dk)
    # pose part
    fd_pose = _fd_jacobian(
        lambda p: icp.edge_residuals_deskew(p, vel, pts, c, n, valid, dk).r, pose)
    np.testing.assert_allclose(np.asarray(blocks.J)[..., :6], fd_pose, atol=2e-2, rtol=1e-2)
    # velocity part
    eps = 1e-3
    for i in range(3):
        dv = np.zeros(3, np.float32)
        dv[i] = eps
        r1 = icp.edge_residuals_deskew(pose, vel + jnp.asarray(dv), pts, c, n, valid, dk).r
        fd_col = (np.asarray(r1) - np.asarray(blocks.r)) / eps
        np.testing.assert_allclose(np.asarray(blocks.J)[..., 6 + i], fd_col,
                                   atol=2e-2, rtol=1e-2)


def _make_plane_point_problem(n_pts=300, noise=0.0):
    """Random world points on several planes; target pose is recovered from
    point-to-plane residuals."""
    true_pose = _rand_pose(scale_t=0.5, scale_r=0.2)
    normals = RNG.normal(size=(n_pts, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    pts_world = RNG.normal(size=(n_pts, 3)).astype(np.float32) * 5
    # sensor-frame points: p_s = R^-1 (p_w - t)
    inv = true_pose.inverse()
    pts_sensor = np.asarray(jax.vmap(lambda x: quat_rotate(inv.q, x) + inv.t)(
        jnp.asarray(pts_world)))
    if noise:
        pts_world = pts_world + RNG.normal(size=pts_world.shape).astype(np.float32) * noise
    return true_pose, jnp.asarray(pts_sensor), jnp.asarray(pts_world), jnp.asarray(normals)


def test_gn_recovers_pose_from_plane_constraints():
    true_pose, pts_s, c, n = _make_plane_point_problem()
    valid = jnp.ones(pts_s.shape[0], bool)

    def build(pose, vel):
        blocks = icp.plane_residuals(pose, pts_s, c, n, valid)
        return [blocks], [gn.huber_weights(blocks, 0.5)]

    out = gn.gauss_newton(build, Pose.identity(), jnp.zeros(3), n_iters=10)
    np.testing.assert_allclose(np.asarray(out.pose.t), np.asarray(true_pose.t), atol=1e-3)
    dot = abs(float(jnp.sum(out.pose.q * true_pose.q)))
    assert dot > 0.99999


def test_gn_robust_to_outliers():
    true_pose, pts_s, c, n = _make_plane_point_problem(n_pts=400)
    # corrupt 20% of correspondences
    c_np = np.array(c)
    c_np[:80] += RNG.normal(size=(80, 3)).astype(np.float32) * 5.0
    c_bad = jnp.asarray(c_np)
    valid = jnp.ones(400, bool)

    def build(pose, vel):
        blocks = icp.plane_residuals(pose, pts_s, c_bad, n, valid)
        w = gn.huber_weights(blocks, 0.1) * gn.quantile_inlier_weights(blocks, 0.75)
        return [blocks], [w]

    out = gn.gauss_newton(build, Pose.identity(), jnp.zeros(3), n_iters=15)
    np.testing.assert_allclose(np.asarray(out.pose.t), np.asarray(true_pose.t), atol=0.05)


def test_gn_mixed_edge_plane():
    true_pose = _rand_pose(scale_t=0.3, scale_r=0.15)
    inv = true_pose.inverse()
    # plane constraints
    n_pl = 100
    pn = RNG.normal(size=(n_pl, 3)).astype(np.float32)
    pn /= np.linalg.norm(pn, axis=1, keepdims=True)
    pw = RNG.normal(size=(n_pl, 3)).astype(np.float32) * 3
    ps = np.asarray(jax.vmap(lambda x: quat_rotate(inv.q, x) + inv.t)(jnp.asarray(pw)))
    # edge constraints: lines through world points
    n_ed = 100
    ec = RNG.normal(size=(n_ed, 3)).astype(np.float32) * 3
    ed = RNG.normal(size=(n_ed, 3)).astype(np.float32)
    ed /= np.linalg.norm(ed, axis=1, keepdims=True)
    es = np.asarray(jax.vmap(lambda x: quat_rotate(inv.q, x) + inv.t)(jnp.asarray(ec)))

    def build(pose, vel):
        pb = icp.plane_residuals(pose, jnp.asarray(ps), jnp.asarray(pw), jnp.asarray(pn),
                                 jnp.ones(n_pl, bool))
        eb = icp.edge_residuals(pose, jnp.asarray(es), jnp.asarray(ec), jnp.asarray(ed),
                                jnp.ones(n_ed, bool))
        return [pb, eb], [gn.huber_weights(pb, 0.5), gn.huber_weights(eb, 0.5)]

    out = gn.gauss_newton(build, Pose.identity(), jnp.zeros(3), n_iters=10)
    np.testing.assert_allclose(np.asarray(out.pose.t), np.asarray(true_pose.t), atol=1e-3)


def test_quantile_weights():
    r = jnp.asarray(np.concatenate([np.full(90, 0.1), np.full(10, 5.0)])
                    .astype(np.float32))[:, None]
    blocks = icp.ResidualBlocks(r=r, J=jnp.zeros((100, 1, 6)), valid=jnp.ones(100, bool))
    w = np.asarray(gn.quantile_inlier_weights(blocks, 0.85))
    assert w[:90].all() and not w[90:].any()


def test_threshold_weights_noop_by_default():
    """Parity with the reference's commented-out threshold rejection: the
    default is a no-op; an explicit threshold enables it."""
    r = jnp.asarray(np.array([[0.05], [2.0]], np.float32))
    blocks = icp.ResidualBlocks(r=r, J=jnp.zeros((2, 1, 6)),
                                valid=jnp.ones(2, bool))
    w = np.asarray(gn.threshold_inlier_weights(blocks))
    np.testing.assert_array_equal(w, [1.0, 1.0])
    w = np.asarray(gn.threshold_inlier_weights(blocks, threshold=1.0))
    np.testing.assert_array_equal(w, [1.0, 0.0])
