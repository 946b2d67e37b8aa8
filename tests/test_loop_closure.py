"""Loop closure: Woodbury-corrected block-tridiagonal solve, loop-factor
pose-graph optimization, keyframe proximity detection."""

import jax
import jax.numpy as jnp
import numpy as np

from msf_loam_tpu.config import PoseGraphConfig
from msf_loam_tpu.core.se3 import Pose, quat_exp, quat_multiply, quat_rotate
from msf_loam_tpu.slam import posegraph

RNG = np.random.default_rng(23)
CFG = PoseGraphConfig()


def _random_tridiag(N):
    """Random well-conditioned symmetric block-tridiagonal (D, U)."""
    U = RNG.normal(size=(N - 1, 6, 6)).astype(np.float32) * 0.3
    D = RNG.normal(size=(N, 6, 6)).astype(np.float32)
    D = np.einsum("nij,nkj->nik", D, D) + 8.0 * np.eye(6)[None]
    return jnp.asarray(D), jnp.asarray(U)


def _dense_from_tridiag(D, U):
    N = D.shape[0]
    H = np.zeros((6 * N, 6 * N), np.float32)
    for i in range(N):
        H[6 * i:6 * i + 6, 6 * i:6 * i + 6] = D[i]
    for i in range(N - 1):
        H[6 * i:6 * i + 6, 6 * (i + 1):6 * (i + 1) + 6] = U[i]
        H[6 * (i + 1):6 * (i + 1) + 6, 6 * i:6 * i + 6] = U[i].T
    return H


def test_multi_rhs_thomas_matches_single():
    N, m = 12, 9
    D, U = _random_tridiag(N)
    B = jnp.asarray(RNG.normal(size=(N, 6, m)).astype(np.float32))
    X = posegraph.solve_block_tridiag_multi(D, U, B)
    for k in range(m):
        xk = posegraph.solve_block_tridiag(D, U, B[:, :, k])
        np.testing.assert_allclose(np.asarray(X[:, :, k]), np.asarray(xk),
                                   atol=1e-4, rtol=1e-4)


def test_woodbury_matches_dense_solve():
    """T + W W^T solved via Thomas+capacitance == dense numpy solve."""
    N, L = 10, 3
    D, U = _random_tridiag(N)
    W = np.zeros((N, 6, 6 * L), np.float32)
    for l, (i, j) in enumerate([(0, 7), (2, 9), (1, 5)]):
        W[i, :, 6 * l:6 * l + 6] = RNG.normal(size=(6, 6)) * 0.5
        W[j, :, 6 * l:6 * l + 6] = RNG.normal(size=(6, 6)) * 0.5
    b = RNG.normal(size=(N, 6)).astype(np.float32)

    Wj = jnp.asarray(W)
    bj = jnp.asarray(b)
    y = posegraph.solve_block_tridiag(D, U, bj)
    Z = posegraph.solve_block_tridiag_multi(D, U, Wj)
    S = jnp.eye(6 * L) + jnp.einsum("nim,nik->mk", Wj, Z)
    Wty = jnp.einsum("nim,ni->m", Wj, y)
    x = y - jnp.einsum("nim,m->ni", Z, jnp.linalg.solve(S, Wty))

    H = _dense_from_tridiag(np.asarray(D), np.asarray(U))
    Wf = W.reshape(6 * N, 6 * L)
    x_dense = np.linalg.solve(H + Wf @ Wf.T, b.reshape(-1)).reshape(N, 6)
    np.testing.assert_allclose(np.asarray(x), x_dense, atol=1e-3, rtol=1e-3)


def _drift_loop_problem(N=40, drift=0.02, seed=3):
    """A square loop trajectory; odometry measurements carry a small bias so
    the integrated chain drifts; ground truth closes the loop."""
    rng = np.random.default_rng(seed)
    side = N // 4
    gt_t, gt_q = [np.zeros(3)], [np.array([1.0, 0, 0, 0])]
    headings = [0.0]
    for i in range(1, N):
        h = (i // side) * (np.pi / 2)
        headings.append(h)
        step = np.array([np.cos(h), np.sin(h), 0.0])
        gt_t.append(gt_t[-1] + step)
        gt_q.append(np.asarray(quat_exp(jnp.asarray([0.0, 0.0, h]))))
    gt = Pose(t=jnp.asarray(np.stack(gt_t), jnp.float32),
              q=jnp.asarray(np.stack(gt_q), jnp.float32))

    # relative measurements with a deterministic yaw bias -> compounding
    # drift (a translation bias would cancel around a closed square)
    bias_q = quat_exp(jnp.asarray([0.0, 0.0, drift]))
    rel_t, rel_q = [], []
    for i in range(N - 1):
        qi_inv = posegraph.quat_conjugate(gt.q[i])
        dt = quat_rotate(qi_inv, gt.t[i + 1] - gt.t[i])
        dq = posegraph.quat_normalize(quat_multiply(qi_inv, gt.q[i + 1]))
        rel_t.append(np.asarray(dt))
        rel_q.append(np.asarray(posegraph.quat_normalize(
            quat_multiply(dq, bias_q))))
    rel = Pose(t=jnp.asarray(np.stack(rel_t), jnp.float32),
               q=jnp.asarray(np.stack(rel_q), jnp.float32))

    # integrate the biased odometry -> drifted initial guess
    ts, qs = [np.zeros(3)], [np.array([1.0, 0, 0, 0])]
    for i in range(N - 1):
        q = jnp.asarray(qs[-1], jnp.float32)
        ts.append(ts[-1] + np.asarray(quat_rotate(q, rel.t[i])))
        qs.append(np.asarray(posegraph.quat_normalize(
            quat_multiply(q, rel.q[i]))))
    poses0 = Pose(t=jnp.asarray(np.stack(ts), jnp.float32),
                  q=jnp.asarray(np.stack(qs), jnp.float32))

    data = posegraph.PoseGraphData(
        times=jnp.arange(N, dtype=jnp.float32),
        rel_meas=rel, rel_valid=jnp.ones(N - 1, bool),
        gps_xyz=jnp.zeros((1, 3)), gps_seg=jnp.zeros(1, jnp.int32),
        gps_frac=jnp.zeros(1), gps_valid=jnp.zeros(1, bool),
    )
    return gt, poses0, data


def test_loop_factor_corrects_drift():
    gt, poses0, data = _drift_loop_problem()
    N = gt.t.shape[0]
    # true relative pose between first and last keyframe (loop closure)
    qi_inv = posegraph.quat_conjugate(gt.q[0])
    meas = Pose(
        t=quat_rotate(qi_inv, gt.t[N - 1] - gt.t[0])[None],
        q=posegraph.quat_normalize(
            quat_multiply(qi_inv, gt.q[N - 1]))[None])
    loops = posegraph.LoopFactors.pad(
        np.array([0]), np.array([N - 1]), meas, to_l=4)

    # anchor pose 0 with a GPS tie so the gauge matches ground truth
    data = data._replace(gps_xyz=gt.t[:1], gps_valid=jnp.ones(1, bool))

    drift0 = float(jnp.linalg.norm(poses0.t[-1] - gt.t[-1]))
    out = posegraph.optimize_with_loops(poses0, data, loops, CFG, n_iters=15)
    drift1 = float(jnp.linalg.norm(out.poses.t[-1] - gt.t[-1]))
    assert drift0 > 0.5, f"problem not drifting: {drift0}"
    assert drift1 < 0.15 * drift0, f"loop closure failed: {drift0} -> {drift1}"
    assert float(out.final_cost) < float(out.initial_cost)


def test_detect_loops_finds_revisit():
    from msf_loam_tpu.slam.loop_closure import detect_loops

    # out-and-back corridor: frame 0 and the final frame share a position
    fwd = np.linspace(0, 20, 30)
    pos = np.zeros((60, 3))
    pos[:30, 0] = fwd
    pos[30:, 0] = fwd[::-1]
    pairs = detect_loops(pos, max_dist=1.0, min_index_gap=20, max_loops=4)
    assert pairs, "no loop detected on an out-and-back path"
    for i, j in pairs:
        assert j - i >= 20
        assert np.linalg.norm(pos[i] - pos[j]) < 1.0
    # a straight path must produce none
    straight = np.zeros((60, 3))
    straight[:, 0] = np.linspace(0, 60, 60)
    assert detect_loops(straight, max_dist=1.0, min_index_gap=20) == []


def test_sparse_pose_graph_optimizes_edges():
    from msf_loam_tpu.slam.loop_closure import LoopEdge, SparsePoseGraph

    gt, poses0, data = _drift_loop_problem()
    N = gt.t.shape[0]
    qi_inv = posegraph.quat_conjugate(gt.q[0])
    g = SparsePoseGraph()
    g.add_edge(LoopEdge(
        0, N - 1,
        np.asarray(quat_rotate(qi_inv, gt.t[N - 1] - gt.t[0])),
        np.asarray(posegraph.quat_normalize(
            quat_multiply(qi_inv, gt.q[N - 1])))))
    data = data._replace(gps_xyz=gt.t[:1], gps_valid=jnp.ones(1, bool))

    drift0 = float(jnp.linalg.norm(poses0.t[-1] - gt.t[-1]))
    out = g.optimize(poses0, data, CFG, n_iters=15)
    drift1 = float(jnp.linalg.norm(out.poses.t[-1] - gt.t[-1]))
    assert drift1 < 0.15 * drift0


def test_match_loop_pair_submap_recovers_relative_pose():
    """Submap edge matcher: keyframe j registered against i's neighborhood
    recovers a known relative pose."""
    import jax

    from msf_loam_tpu.config import FeatureConfig, MsfLoamConfig
    from msf_loam_tpu.dataio import preprocess, synthetic
    from msf_loam_tpu.ops import features as feat_mod
    from msf_loam_tpu.slam.loop_closure import match_loop_pair_submap

    fcfg = FeatureConfig(max_points_per_ring=1024, max_less_flat=4096)
    cfg = MsfLoamConfig(features=fcfg)
    world = synthetic.World.corridor(seed=1, size=14.0)

    def feats_at(p, seed):
        xyz, ring = synthetic.simulate_scan(world, np.asarray(p, np.float64),
                                            np.eye(3), n_rings=16,
                                            pts_per_ring=1200, noise=0.004,
                                            seed=seed)
        img = preprocess.preprocess_scan(xyz, ring, fcfg, 16)
        return feat_mod.extract_features(img, jnp.float32(0.0), fcfg)

    rel_true = np.array([0.4, 0.15, 0.0])
    f_i = feats_at([0, 0, 0], 0)
    f_n = feats_at([0.3, 0, 0], 1)      # neighbor keyframe
    f_j = feats_at(rel_true, 2)
    neighbors = [(f_i, Pose.identity()),
                 (f_n, Pose(t=jnp.asarray([0.3, 0, 0], jnp.float32),
                            q=jnp.asarray([1.0, 0, 0, 0], jnp.float32)))]
    guess = Pose(t=jnp.asarray(rel_true + np.array([0.15, -0.1, 0]),
                               jnp.float32),
                 q=jnp.asarray([1.0, 0, 0, 0], jnp.float32))
    rel, ok = match_loop_pair_submap(neighbors, f_j, guess, cfg)
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(rel.t), rel_true, atol=0.03)


def test_invalid_loops_match_plain_optimize():
    """All-padded (invalid) loop factors must be inert: identical result to
    the chain-only optimizer."""
    gt, poses0, data = _drift_loop_problem(N=16)
    loops = posegraph.LoopFactors.pad(
        np.zeros(0, np.int32), np.zeros(0, np.int32),
        Pose(t=jnp.zeros((0, 3)), q=jnp.zeros((0, 4))), to_l=3)
    out_l = posegraph.optimize_with_loops(poses0, data, loops, CFG, n_iters=5)
    out_p = posegraph.optimize(poses0, data, CFG, n_iters=5)
    np.testing.assert_allclose(np.asarray(out_l.poses.t),
                               np.asarray(out_p.poses.t), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_l.poses.q),
                               np.asarray(out_p.poses.q), atol=1e-4)
