"""Pose-graph fusion: block-tridiagonal solver numerics, drift correction
with GPS ties, and the reference's simulated-DGPS scenario (1 Hz, 5 cm)."""

import jax
import jax.numpy as jnp
import numpy as np

from msf_loam_tpu.config import PoseGraphConfig
from msf_loam_tpu.core.se3 import Pose, quat_exp, quat_multiply, quat_normalize
from msf_loam_tpu.slam import posegraph

RNG = np.random.default_rng(17)
CFG = PoseGraphConfig()


def test_block_tridiag_solver():
    N = 20
    # random SPD block-tridiagonal system
    D = RNG.normal(size=(N, 6, 6))
    D = np.einsum("nij,nkj->nik", D, D) + 6 * np.eye(6)
    U = RNG.normal(size=(N - 1, 6, 6)) * 0.3
    b = RNG.normal(size=(N, 6))

    H = np.zeros((6 * N, 6 * N))
    for i in range(N):
        H[6 * i:6 * i + 6, 6 * i:6 * i + 6] = D[i]
    for i in range(N - 1):
        H[6 * i:6 * i + 6, 6 * i + 6:6 * i + 12] = U[i]
        H[6 * i + 6:6 * i + 12, 6 * i:6 * i + 6] = U[i].T

    x = posegraph.solve_block_tridiag(
        jnp.asarray(D, dtype=jnp.float32), jnp.asarray(U, dtype=jnp.float32),
        jnp.asarray(b, dtype=jnp.float32))
    want = np.linalg.solve(H, b.reshape(-1)).reshape(N, 6)
    np.testing.assert_allclose(np.asarray(x), want, rtol=2e-2, atol=2e-3)


def _make_trajectory(n, drift=0.0):
    """Ground-truth circle-ish trajectory and a drifted odometry version."""
    ts = np.arange(n) * 1.0
    gt_t = np.stack([0.5 * ts, 2 * np.sin(0.1 * ts), 0 * ts], axis=1)
    yaw = 0.05 * ts
    gt_q = np.stack([np.cos(yaw / 2), 0 * ts, 0 * ts, np.sin(yaw / 2)], axis=1)
    gt = Pose(jnp.asarray(gt_t, dtype=jnp.float32),
              jnp.asarray(gt_q, dtype=jnp.float32))
    if drift == 0.0:
        return ts, gt, gt
    # drifted: accumulate relative poses with a small bias
    est_t = [gt_t[0]]
    est_q = [gt_q[0]]
    for i in range(1, n):
        rel = Pose(gt.t[i - 1], gt.q[i - 1]).inverse().compose(
            Pose(gt.t[i], gt.q[i]))
        rel_drift = Pose(rel.t + jnp.asarray([drift, 0, 0]), rel.q)
        nxt = Pose(jnp.asarray(est_t[-1]), jnp.asarray(est_q[-1])).compose(rel_drift)
        est_t.append(np.asarray(nxt.t))
        est_q.append(np.asarray(nxt.q))
    est = Pose(jnp.asarray(np.asarray(est_t), dtype=jnp.float32),
               jnp.asarray(np.asarray(est_q), dtype=jnp.float32))
    return ts, gt, est


def test_gps_fusion_corrects_drift():
    n = 40
    ts, gt, est = _make_trajectory(n, drift=0.02)
    # relative measurements from the DRIFTED odometry (what the mapper gives)
    data = posegraph.build_graph_data(
        jnp.asarray(ts, dtype=jnp.float32), est,
        gps_times=jnp.asarray(ts[::5] + 0.0, dtype=jnp.float32),
        gps_xyz=gt.t[::5],
        gps_valid=jnp.ones(len(ts[::5]), bool))
    out = posegraph.optimize(est, data, CFG, n_iters=10)
    err_before = np.linalg.norm(np.asarray(est.t) - np.asarray(gt.t), axis=1).max()
    err_after = np.linalg.norm(np.asarray(out.poses.t) - np.asarray(gt.t), axis=1).max()
    assert err_before > 0.3
    assert err_after < 0.08, f"after={err_after}"
    assert float(out.final_cost) < float(out.initial_cost)


def test_sim_gps_noise_scenario():
    """Reference's _SIM_GPS: 1 Hz fixes with U(-5,5) cm noise
    (laser_mapping.cc:451-464)."""
    n = 60
    ts, gt, est = _make_trajectory(n, drift=0.015)
    gps_t = ts[::10]
    gps_xyz = np.asarray(gt.t)[::10] + RNG.uniform(-0.05, 0.05, size=(len(gps_t), 3))
    data = posegraph.build_graph_data(
        jnp.asarray(ts, dtype=jnp.float32), est,
        gps_times=jnp.asarray(gps_t, dtype=jnp.float32),
        gps_xyz=jnp.asarray(gps_xyz, dtype=jnp.float32),
        gps_valid=jnp.ones(len(gps_t), bool))
    out = posegraph.optimize(est, data, CFG, n_iters=10)
    err_after = np.linalg.norm(np.asarray(out.poses.t) - np.asarray(gt.t), axis=1)
    assert err_after.mean() < 0.1


def test_interpolated_gps_between_keyframes():
    """GPS fixes between keyframe times use linear interpolation
    (gps_fusion.cc:58-71)."""
    n = 10
    ts = np.arange(n) * 1.0
    gt_t = np.stack([ts, 0 * ts, 0 * ts], axis=1)
    gt = Pose(jnp.asarray(gt_t, dtype=jnp.float32),
              jnp.broadcast_to(jnp.asarray([1.0, 0, 0, 0]), (n, 4)))
    gps_times = np.asarray([2.5, 6.5])
    gps_xyz = np.asarray([[2.5, 0.5, 0], [6.5, 0.5, 0]], np.float32)
    data = posegraph.build_graph_data(
        jnp.asarray(ts, dtype=jnp.float32), gt,
        jnp.asarray(gps_times, dtype=jnp.float32),
        jnp.asarray(gps_xyz), jnp.ones(2, bool))
    np.testing.assert_allclose(np.asarray(data.gps_frac), [0.5, 0.5], atol=1e-6)
    np.testing.assert_allclose(np.asarray(data.gps_seg), [2, 6])
    out = posegraph.optimize(gt, data, CFG, n_iters=5)
    # pulled towards y=0.5 at the fix locations but held by odometry
    y = np.asarray(out.poses.t)[:, 1]
    assert y.max() > 0.05


def test_no_gps_is_noop():
    """With only relative factors matching the poses, nothing moves."""
    n = 15
    ts, gt, _ = _make_trajectory(n)
    data = posegraph.build_graph_data(
        jnp.asarray(ts, dtype=jnp.float32), gt,
        gps_times=jnp.zeros((0,)), gps_xyz=jnp.zeros((0, 3)),
        gps_valid=jnp.zeros((0,), bool))
    out = posegraph.optimize(gt, data, CFG, n_iters=5)
    np.testing.assert_allclose(np.asarray(out.poses.t), np.asarray(gt.t), atol=1e-4)


def test_padded_graph_matches_unpadded():
    """Bucketed padding must not change the solution for real poses."""
    n = 25
    ts, gt, est = _make_trajectory(n, drift=0.02)
    gps_t = np.asarray(ts[::5], np.float32)
    data = posegraph.build_graph_data(
        jnp.asarray(ts, dtype=jnp.float32), est,
        jnp.asarray(gps_t), gt.t[::5], jnp.ones(len(gps_t), bool))
    out_plain = posegraph.optimize(est, data, CFG, n_iters=8)
    poses_p, data_p = posegraph.pad_graph(est, data, posegraph.next_bucket(n))
    assert poses_p.t.shape[0] == 64
    out_pad = posegraph.optimize(poses_p, data_p, CFG, n_iters=8)
    np.testing.assert_allclose(np.asarray(out_pad.poses.t[:n]),
                               np.asarray(out_plain.poses.t), atol=2e-3)
