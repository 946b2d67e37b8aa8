"""IMU stack tests: preintegration vs closed-form motion, residual
consistency, IMU-only prediction, gravity/velocity init, extrinsic calib."""

import jax.numpy as jnp
import numpy as np

from msf_loam_tpu.config import ImuConfig
from msf_loam_tpu.core.se3 import (Pose, quat_conjugate, quat_exp,
                                   quat_multiply, quat_normalize, quat_rotate)
from msf_loam_tpu.imu import (buffer as imu_buffer, extrinsic_calib,
                              gravity_init, imu_factor, preintegration)

CFG = ImuConfig(max_imu_samples=64)
G = np.array([0.0, 0.0, 9.81])
RNG = np.random.default_rng(3)


def _simulate_imu(n, dt, accel_world, omega_body, q0=None):
    """Generate IMU samples for constant world acceleration + constant body
    angular rate, starting at rest. Returns (dts, accs, gyrs, gt)."""
    q = np.array([1.0, 0, 0, 0]) if q0 is None else q0
    p = np.zeros(3)
    v = np.zeros(3)
    dts, accs, gyrs = [], [], []
    qs = [q.copy()]
    for _ in range(n):
        # measured specific force: R^T (a_world + g)
        Rt = np.asarray(quat_rotate(quat_conjugate(jnp.asarray(q)),
                                    jnp.asarray(accel_world + G)))
        dts.append(dt)
        accs.append(Rt)
        gyrs.append(omega_body)
        # integrate ground truth
        p = p + v * dt + 0.5 * accel_world * dt * dt
        v = v + accel_world * dt
        q = np.asarray(quat_normalize(quat_multiply(
            jnp.asarray(q), quat_exp(jnp.asarray(omega_body) * dt))))
        qs.append(q.copy())
    return (np.asarray(dts, np.float32), np.asarray(accs, np.float32),
            np.asarray(gyrs, np.float32), dict(p=p, v=v, q=q, qs=qs))


def _pad(a, n, shape=()):
    out = np.zeros((n,) + shape, np.float32)
    out[: len(a)] = a
    return out


def _preintegrate(dts, accs, gyrs, ba=None, bg=None):
    n = len(dts)
    S = CFG.max_imu_samples
    valid = np.zeros(S, bool)
    valid[:n] = True
    return preintegration.preintegrate(
        jnp.asarray(_pad(dts, S)), jnp.asarray(_pad(accs, S, (3,))),
        jnp.asarray(_pad(gyrs, S, (3,))), jnp.asarray(valid),
        jnp.zeros(3) if ba is None else jnp.asarray(ba),
        jnp.zeros(3) if bg is None else jnp.asarray(bg), CFG)


def test_preintegration_static():
    """Stationary IMU: delta_p = 0.5 g_body t^2-like growth from gravity."""
    n, dt = 40, 0.0025
    dts, accs, gyrs, gt = _simulate_imu(n, dt, np.zeros(3), np.zeros(3))
    pre = _preintegrate(dts, accs, gyrs)
    T = n * dt
    # alpha = double-integral of measured acc (= +g in body frame)
    np.testing.assert_allclose(np.asarray(pre.delta_p), 0.5 * G * T * T,
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pre.delta_v), G * T, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(float(pre.sum_dt), T, rtol=1e-5)


def test_preintegration_rotation():
    n, dt = 50, 0.002
    omega = np.array([0.3, -0.2, 0.5])
    dts, accs, gyrs, gt = _simulate_imu(n, dt, np.zeros(3), omega)
    pre = _preintegrate(dts, accs, gyrs)
    q_want = np.asarray(quat_exp(jnp.asarray(omega * n * dt)))
    dot = abs(float(jnp.sum(pre.delta_q * jnp.asarray(q_want))))
    assert dot > 0.99999


def test_preintegration_residual_zero_on_truth():
    """Residual must vanish when states match the true motion."""
    n, dt = 40, 0.0025
    a_w = np.array([1.0, -0.5, 0.3])
    omega = np.array([0.2, 0.1, -0.3])
    dts, accs, gyrs, gt = _simulate_imu(n, dt, a_w, omega)
    pre = _preintegrate(dts, accs, gyrs)
    r = preintegration.evaluate_residual(
        pre,
        jnp.zeros(3), jnp.asarray([1.0, 0, 0, 0]), jnp.zeros(3),
        jnp.zeros(3), jnp.zeros(3),
        jnp.asarray(gt["p"], dtype=jnp.float32), jnp.asarray(gt["q"], dtype=jnp.float32),
        jnp.asarray(gt["v"], dtype=jnp.float32), jnp.zeros(3), jnp.zeros(3),
        jnp.asarray(-G, dtype=jnp.float32) * -1.0)
    assert np.abs(np.asarray(r)).max() < 1e-3


def test_bias_jacobian_first_order():
    """First-order bias correction should track an actual re-integration."""
    n, dt = 40, 0.0025
    dts, accs, gyrs, _ = _simulate_imu(n, dt, np.array([0.5, 0, 0]),
                                       np.array([0.1, 0.2, -0.1]))
    pre0 = _preintegrate(dts, accs, gyrs)
    dbg = np.array([0.01, -0.02, 0.015], np.float32)
    pre1 = _preintegrate(dts, accs, gyrs, bg=dbg)
    dq_dbg = np.asarray(pre0.jacobian)[3:6, 12:15]
    corrected = quat_multiply(pre0.delta_q, quat_exp(jnp.asarray(dq_dbg @ dbg)))
    dot = abs(float(jnp.sum(corrected * pre1.delta_q)))
    assert dot > 0.99999


def test_interpolate_delta_endpoints():
    n, dt = 20, 0.005
    dts, accs, gyrs, gt = _simulate_imu(n, dt, np.array([2.0, 0, 0]),
                                        np.array([0, 0, 1.0]))
    pre = _preintegrate(dts, accs, gyrs)
    t_query = jnp.asarray([0.0, n * dt], dtype=jnp.float32)
    dp, dq = preintegration.interpolate_delta(pre, t_query)
    np.testing.assert_allclose(np.asarray(dp[0]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dp[1]), np.asarray(pre.delta_p), atol=1e-5)
    assert abs(float(jnp.sum(dq[1] * pre.delta_q))) > 0.99999
    # midpoint should be between endpoints
    mid_p, _ = preintegration.interpolate_delta(
        pre, jnp.asarray([n * dt / 2], dtype=jnp.float32))
    assert 0 < float(mid_p[0, 0]) < float(pre.delta_p[0])


def test_imu_presolve_predicts_motion():
    """IMU-only GN should predict state j from state i + preintegration."""
    n, dt = 40, 0.0025
    a_w = np.array([1.0, 0.5, 0.0])
    omega = np.array([0.0, 0.0, 0.5])
    dts, accs, gyrs, gt = _simulate_imu(n, dt, a_w, omega)
    pre = _preintegrate(dts, accs, gyrs)
    state_i = imu_factor.ImuState.zero()
    out = imu_factor.imu_presolve(pre, state_i, jnp.asarray(G, dtype=jnp.float32),
                                  n_iters=10)
    np.testing.assert_allclose(np.asarray(out.pose.t), gt["p"], atol=2e-3)
    np.testing.assert_allclose(np.asarray(out.v), gt["v"], atol=2e-2)
    dot = abs(float(jnp.sum(out.pose.q * jnp.asarray(gt["q"], dtype=jnp.float32))))
    assert dot > 0.9999


def test_gravity_velocity_init():
    """Recover gravity direction + velocities from a synthetic trajectory."""
    N = 20
    frame_dt = 0.1
    # trajectory: constant world acceleration, no rotation
    a_w = np.array([0.5, -0.3, 0.1])
    ps, vs, qs = [], [], []
    p = np.zeros(3); v = np.zeros(3)
    for i in range(N):
        ps.append(p.copy()); vs.append(v.copy()); qs.append([1.0, 0, 0, 0])
        p = p + v * frame_dt + 0.5 * a_w * frame_dt ** 2
        v = v + a_w * frame_dt
    # per-pair preintegration from simulated 400 Hz IMU
    dps, dvs = [], []
    sub = 40
    for i in range(N - 1):
        # body frame == world frame (no rotation): acc = a_w + G
        dts = np.full(sub, frame_dt / sub, np.float32)
        accs = np.tile((a_w + G).astype(np.float32), (sub, 1))
        gyrs = np.zeros((sub, 3), np.float32)
        pre = _preintegrate(dts, accs, gyrs)
        # delta_p in the reference factor convention includes the v_i term
        # removed: delta_p_ij = R_i^T (p_j - p_i - v_i dt - ... ) + ...
        dps.append(np.asarray(pre.delta_p))
        dvs.append(np.asarray(pre.delta_v))

    g0 = jnp.asarray([0.0, 0.0, 9.81], dtype=jnp.float32)
    out = gravity_init.solve_gravity_velocity(
        jnp.asarray(np.asarray(ps, np.float32)),
        jnp.asarray(np.asarray(qs, np.float32)),
        jnp.full((N - 1,), frame_dt, dtype=jnp.float32),
        jnp.asarray(np.asarray(dps, np.float32)),
        jnp.asarray(np.asarray(dvs, np.float32)),
        jnp.ones(N - 1, bool), g0, n_frames=N)
    np.testing.assert_allclose(np.asarray(out.gravity), G, atol=0.05)
    np.testing.assert_allclose(np.asarray(out.velocities), np.asarray(vs), atol=0.05)


def test_extrinsic_rotation_calibration():
    """Hand-eye: recover a known lidar->imu rotation from paired deltas."""
    q_ric = quat_normalize(jnp.asarray([0.95, 0.1, -0.2, 0.15]))
    N = 30
    dq_imu, dq_lidar = [], []
    for i in range(N):
        w = RNG.normal(size=3) * 0.4
        di = quat_exp(jnp.asarray(w.astype(np.float32)))
        dl = quat_multiply(quat_multiply(q_ric, di), quat_conjugate(q_ric))
        dq_imu.append(np.asarray(di))
        dq_lidar.append(np.asarray(dl))
    out = extrinsic_calib.calibrate_extrinsic_rotation(
        jnp.asarray(np.asarray(dq_lidar, np.float32)),
        jnp.asarray(np.asarray(dq_imu, np.float32)),
        jnp.ones(N, bool))
    assert bool(out.converged)
    dot = abs(float(jnp.sum(out.q_ric * q_ric)))
    assert dot > 0.9999


def test_imu_buffer_window():
    buf = imu_buffer.ImuBuffer()
    for i in range(100):
        buf.add(i * 0.0025, [0, 0, 9.81], [0, 0, 0])
    w = buf.window(0.01, 0.11, max_samples=64)
    assert w.valid.sum() > 0
    # total window duration == end - start (phony boundary samples)
    np.testing.assert_allclose(w.dts[w.valid].sum(), 0.1, atol=1e-6)


def test_imu_factor_full_jacobians():
    """FD-verify ALL four analytic blocks of the full IMU factor
    (imu_factor.cc eq46-49): pose_i, speedbias_i, pose_j, speedbias_j,
    including every bias row."""
    import jax

    dts, accs, gyrs, gt = _simulate_imu(
        40, 0.0025, np.array([0.4, -0.2, 0.1]), np.array([0.1, 0.3, -0.2]))
    pre = _preintegrate(dts, accs, gyrs)

    rng = np.random.default_rng(11)
    state_i = imu_factor.ImuState(
        pose=Pose(t=jnp.asarray(rng.normal(size=3) * 0.3, jnp.float32),
                  q=quat_normalize(jnp.asarray(
                      [1.0] + list(rng.normal(size=3) * 0.1), jnp.float32))),
        v=jnp.asarray(rng.normal(size=3) * 0.5, jnp.float32),
        ba=jnp.asarray(rng.normal(size=3) * 0.02, jnp.float32),
        bg=jnp.asarray(rng.normal(size=3) * 0.01, jnp.float32))
    state_j = imu_factor.ImuState(
        pose=Pose(t=jnp.asarray(gt["p"] + rng.normal(size=3) * 0.05,
                                jnp.float32),
                  q=quat_normalize(jnp.asarray(gt["q"], jnp.float32))),
        v=jnp.asarray(gt["v"] + rng.normal(size=3) * 0.05, jnp.float32),
        ba=jnp.asarray(rng.normal(size=3) * 0.02, jnp.float32),
        bg=jnp.asarray(rng.normal(size=3) * 0.01, jnp.float32))
    grav = jnp.asarray(G, jnp.float32)

    def residual_of(delta):
        """delta (30,) retracts both states along the factor's column
        layout: [dpose_i, dv/dba/dbg_i, dpose_j, dv/dba/dbg_j]."""
        si = imu_factor.ImuState(
            pose=state_i.pose.retract(delta[0:6]),
            v=state_i.v + delta[6:9], ba=state_i.ba + delta[9:12],
            bg=state_i.bg + delta[12:15])
        sj = imu_factor.ImuState(
            pose=state_j.pose.retract(delta[15:21]),
            v=state_j.v + delta[21:24], ba=state_j.ba + delta[24:27],
            bg=state_j.bg + delta[27:30])
        r, _ = imu_factor.imu_factor_full(pre, si, sj, grav, info_scale=1.0)
        return r

    r0, J = imu_factor.imu_factor_full(pre, state_i, state_j, grav,
                                       info_scale=1.0)
    # float64 FD on the float32 function: central differences
    J_fd = np.zeros((15, 30))
    eps = 1e-3
    for k in range(30):
        d = np.zeros(30, np.float32)
        d[k] = eps
        rp = np.asarray(residual_of(jnp.asarray(d)))
        rm = np.asarray(residual_of(jnp.asarray(-d)))
        J_fd[:, k] = (rp - rm) / (2 * eps)

    J = np.asarray(J)
    blocks = {"pose_i": (slice(0, 6),), "speedbias_i": (slice(6, 15),),
              "pose_j": (slice(15, 21),), "speedbias_j": (slice(21, 30),)}
    scale = max(1.0, np.abs(J_fd).max())
    for name, (cols,) in blocks.items():
        err = np.abs(J[:, cols] - J_fd[:, cols]).max()
        # bias-correction second-order terms + float32 FD noise
        assert err / scale < 5e-3, (name, err, scale)


def test_imu_factor_full_matches_presolve_blocks():
    """The pose_j / v_j columns of the full factor must equal the reduced
    pre-solve factor's Jacobian (same math, different packing)."""
    dts, accs, gyrs, gt = _simulate_imu(
        30, 0.0025, np.array([0.2, 0.1, -0.1]), np.array([0.0, 0.1, 0.2]))
    pre = _preintegrate(dts, accs, gyrs)
    state_i = imu_factor.ImuState.zero()
    state_j = imu_factor.ImuState(
        pose=Pose(t=jnp.asarray(gt["p"], jnp.float32),
                  q=quat_normalize(jnp.asarray(gt["q"], jnp.float32))),
        v=jnp.asarray(gt["v"], jnp.float32),
        ba=jnp.zeros(3), bg=jnp.zeros(3))
    grav = jnp.asarray(G, jnp.float32)

    blocks = imu_factor.imu_factor_blocks(pre, state_i, state_j, grav)
    r_full, J_full = imu_factor.imu_factor_full(pre, state_i, state_j, grav)
    np.testing.assert_allclose(np.asarray(blocks.r[0]), np.asarray(r_full),
                               rtol=1e-5, atol=1e-6)
    # reduced packs [dpose_j(6), dv_j(3)] = full cols [15:21, 21:24]
    J_red = np.asarray(blocks.J[0])
    np.testing.assert_allclose(J_red[:, 0:6], np.asarray(J_full[:, 15:21]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(J_red[:, 6:9], np.asarray(J_full[:, 21:24]),
                               rtol=1e-5, atol=1e-6)


def test_assoc_matches_scan():
    """The associative-scan preintegration must match the sequential
    lax.scan path to fp tolerance on every field, including padded and
    holed windows."""
    import dataclasses

    import numpy as np

    from msf_loam_tpu.config import ImuConfig
    from msf_loam_tpu.imu import preintegration as P

    rng = np.random.default_rng(0)
    cfg_s = ImuConfig(preint_mode="scan")
    cfg_a = ImuConfig(preint_mode="assoc")
    for S, n_valid, hole in ((40, 40, None), (64, 37, None), (32, 28, 11)):
        dts = np.full(S, 0.0025, np.float32)
        accs = (np.array([0.0, 0, 9.81]) + rng.normal(0, 0.4, (S, 3))
                ).astype(np.float32)
        gyrs = rng.normal(0, 0.3, (S, 3)).astype(np.float32)
        valid = np.arange(S) < n_valid
        if hole is not None:
            valid = valid.copy()
            valid[hole] = False
        dts = np.where(valid, dts, 0.0).astype(np.float32)
        ba = np.array([0.01, -0.02, 0.005], np.float32)
        bg = np.array([0.002, 0.001, -0.003], np.float32)
        a = P.preintegrate(jnp.asarray(dts), jnp.asarray(accs),
                           jnp.asarray(gyrs), jnp.asarray(valid),
                           jnp.asarray(ba), jnp.asarray(bg), cfg_a)
        s = P.preintegrate(jnp.asarray(dts), jnp.asarray(accs),
                           jnp.asarray(gyrs), jnp.asarray(valid),
                           jnp.asarray(ba), jnp.asarray(bg), cfg_s)
        np.testing.assert_allclose(a.delta_p, s.delta_p, atol=1e-5)
        np.testing.assert_allclose(a.delta_q, s.delta_q, atol=1e-6)
        np.testing.assert_allclose(a.delta_v, s.delta_v, atol=1e-5)
        np.testing.assert_allclose(a.jacobian, s.jacobian,
                                   rtol=2e-4, atol=1e-6)
        np.testing.assert_allclose(a.covariance, s.covariance,
                                   rtol=2e-3, atol=1e-11)
        np.testing.assert_allclose(a.sum_dt, s.sum_dt, atol=1e-6)
        np.testing.assert_allclose(a.delta_p_buf, s.delta_p_buf, atol=1e-5)
        np.testing.assert_allclose(a.delta_q_buf, s.delta_q_buf, atol=1e-6)
        np.testing.assert_allclose(a.delta_v_buf, s.delta_v_buf, atol=1e-5)
        assert int(a.n_samples) == int(s.n_samples)


def test_imu_factor_prep_matches_full():
    """The decomposed (frame-constant + per-iteration) IMU factor equals
    the monolithic imu_factor_blocks when state_j shares state_i's biases
    (the tight matcher's configuration)."""
    import numpy as np

    from msf_loam_tpu.config import ImuConfig
    from msf_loam_tpu.core.se3 import Pose, quat_exp
    from msf_loam_tpu.imu import imu_factor as f
    from msf_loam_tpu.imu import preintegration as pi

    rng = np.random.default_rng(3)
    n = 20
    dts = jnp.full((n,), 0.005)
    accs = jnp.asarray(rng.normal([0.1, 0.05, 9.81], 0.05, (n, 3)),
                       jnp.float32)
    gyrs = jnp.asarray(rng.normal(0.02, 0.01, (n, 3)), jnp.float32)
    pre = pi.preintegrate(dts, accs, gyrs, jnp.ones(n, bool),
                          jnp.zeros(3), jnp.zeros(3), ImuConfig())
    g = jnp.asarray([0.0, 0.0, -9.81])
    si = f.ImuState(
        pose=Pose(jnp.asarray([1.0, -0.5, 0.2]),
                  quat_exp(jnp.asarray([0.05, -0.02, 0.3]))),
        v=jnp.asarray([0.5, 0.1, -0.05]),
        ba=jnp.asarray([0.01, -0.02, 0.005]),
        bg=jnp.asarray([0.002, 0.001, -0.003]))
    pj = Pose(jnp.asarray([1.06, -0.48, 0.21]),
              quat_exp(jnp.asarray([0.06, -0.02, 0.31])))
    vj = jnp.asarray([0.55, 0.12, -0.04])
    sj = f.ImuState(pose=pj, v=vj, ba=si.ba, bg=si.bg)

    ref = f.imu_factor_blocks(pre, si, sj, g)
    prep = f.imu_factor_prep(pre, si, g)
    got = f.imu_factor_blocks_from_prep(prep, pj, vj)
    np.testing.assert_allclose(np.asarray(got.r), np.asarray(ref.r),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.J), np.asarray(ref.J),
                               rtol=1e-5, atol=1e-6)
