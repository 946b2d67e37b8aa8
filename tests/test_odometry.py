"""Scan-to-scan odometry: recover known inter-frame motion on synthetic
scans, and accumulate a short trajectory (the reference's LaserOdometry
integration, laser_odometry.cc:69-95)."""

import jax.numpy as jnp
import numpy as np

from msf_loam_tpu.config import FeatureConfig, OdometryConfig
from msf_loam_tpu.core.se3 import Pose, quat_exp, quat_to_matrix
from msf_loam_tpu.dataio import preprocess, synthetic
from msf_loam_tpu.ops import features
from msf_loam_tpu.slam import odometry

FCFG = FeatureConfig(max_points_per_ring=2048, max_less_flat=4096)
OCFG = OdometryConfig()
WORLD = synthetic.World.corridor(seed=0, size=12.0)


def _scan_at(t, R):
    xyz, ring = synthetic.simulate_scan(WORLD, t, R, n_rings=16, pts_per_ring=1800)
    img = preprocess.preprocess_scan(xyz, ring, FCFG, num_rings=16)
    return features.extract_features(img, jnp.float32(0.0), FCFG)


def _yaw_matrix(yaw):
    c, s = np.cos(yaw), np.sin(yaw)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])


def test_recover_translation():
    f0 = _scan_at(np.zeros(3), np.eye(3))
    delta = np.array([0.3, 0.1, 0.0])
    f1 = _scan_at(delta, np.eye(3))
    out = odometry.match_scan2scan(f0, f1, Pose.identity(), OCFG)
    assert bool(out.ok)
    np.testing.assert_allclose(np.asarray(out.pose_curr2last.t), delta, atol=0.03)


def test_recover_rotation_translation():
    f0 = _scan_at(np.zeros(3), np.eye(3))
    yaw = 0.05
    delta_t = np.array([0.25, -0.1, 0.02])
    f1 = _scan_at(delta_t, _yaw_matrix(yaw))
    out = odometry.match_scan2scan(f0, f1, Pose.identity(), OCFG)
    assert bool(out.ok)
    np.testing.assert_allclose(np.asarray(out.pose_curr2last.t), delta_t, atol=0.04)
    got_yaw = 2 * np.arctan2(np.asarray(out.pose_curr2last.q)[3],
                             np.asarray(out.pose_curr2last.q)[0])
    np.testing.assert_allclose(got_yaw, yaw, atol=0.01)


def test_warm_start_helps_large_motion():
    f0 = _scan_at(np.zeros(3), np.eye(3))
    delta = np.array([0.6, 0.0, 0.0])
    f1 = _scan_at(delta, np.eye(3))
    warm = Pose(t=jnp.asarray([0.5, 0.0, 0.0], dtype=jnp.float32),
                q=jnp.asarray([1.0, 0, 0, 0], dtype=jnp.float32))
    out = odometry.match_scan2scan(f0, f1, warm, OCFG)
    np.testing.assert_allclose(np.asarray(out.pose_curr2last.t), delta, atol=0.05)


def test_trajectory_accumulation():
    """5-frame straight-line trajectory: accumulated scan2world pose should
    track ground truth (pose_scan2world_ update, laser_odometry.cc:79)."""
    step = np.array([0.3, 0.05, 0.0])
    scans = [_scan_at(step * i, np.eye(3)) for i in range(5)]
    pose_w = Pose.identity()
    pose_c2l = Pose.identity()
    for i in range(1, 5):
        out = odometry.match_scan2scan(scans[i - 1], scans[i], pose_c2l, OCFG)
        assert bool(out.ok)
        pose_c2l = out.pose_curr2last  # constant-velocity warm start
        pose_w = pose_w.compose(out.pose_curr2last)
    np.testing.assert_allclose(np.asarray(pose_w.t), step * 4, atol=0.08)


def test_too_few_features_flags_not_ok():
    f0 = _scan_at(np.zeros(3), np.eye(3))
    # empty current scan
    import jax
    empty = jax.tree.map(lambda x: jnp.zeros_like(x), f0)
    out = odometry.match_scan2scan(f0, empty, Pose.identity(), OCFG)
    assert not bool(out.ok)


def test_recover_full_6dof_motion():
    """Pitch+roll+z motion (not just planar yaw) must be recovered."""
    from msf_loam_tpu.core.se3 import quat_exp, quat_to_matrix
    f0 = _scan_at(np.zeros(3), np.eye(3))
    rotvec = np.array([0.02, -0.03, 0.04])
    R = np.asarray(quat_to_matrix(quat_exp(jnp.asarray(rotvec, dtype=jnp.float32))))
    delta_t = np.array([0.2, -0.1, 0.08])
    f1 = _scan_at(delta_t, R)
    out = odometry.match_scan2scan(f0, f1, Pose.identity(), OCFG)
    assert bool(out.ok)
    np.testing.assert_allclose(np.asarray(out.pose_curr2last.t), delta_t,
                               atol=0.05)
    from msf_loam_tpu.core.se3 import quat_log
    got_rotvec = np.asarray(quat_log(out.pose_curr2last.q))
    np.testing.assert_allclose(got_rotvec, rotvec, atol=0.01)


def test_deskew_recovers_true_step_on_accelerating_motion():
    """In-matcher deskew (A-LOAM DISTORTION=1 analog, OdometryConfig.deskew):
    on an ACCELERATING platform two consecutive scans carry different
    rolling-shutter distortion; rigid matching recovers the effective-center
    displacement (true step + 0.5*dv*T bias), the deskewed matcher must
    recover the true scan-start-to-scan-start step."""
    import dataclasses

    T = 0.1
    v0 = np.array([3.0, 0.0, 0.0])
    v1 = np.array([4.0, 0.0, 0.0])     # +1 m/s between scans (strong accel)
    step = (v0 + v1) / 2 * T           # true start-to-start displacement

    def scan(t, v, seed):
        xyz, ring = synthetic.simulate_scan(
            WORLD, t, np.eye(3), n_rings=16, pts_per_ring=1800,
            noise=0.004, seed=seed, linear_vel=v, yaw_rate=0.0)
        img = preprocess.preprocess_scan(xyz, ring, FCFG, num_rings=16)
        return features.extract_features(img, jnp.float32(0.0), FCFG)

    f0 = scan(np.zeros(3), v0, seed=1)
    f1 = scan(step, v1, seed=2)
    # warm start = previous step (v0*T), like the pipeline's warm start
    warm = Pose(t=jnp.asarray(v0 * T, jnp.float32),
                q=jnp.asarray([1.0, 0, 0, 0], jnp.float32))

    rigid = odometry.match_scan2scan(f0, f1, warm, OCFG)
    dk_cfg = dataclasses.replace(OCFG, deskew=True)
    dsk = odometry.match_scan2scan(f0, f1, warm, dk_cfg)
    err_rigid = np.linalg.norm(np.asarray(rigid.pose_curr2last.t) - step)
    err_dsk = np.linalg.norm(np.asarray(dsk.pose_curr2last.t) - step)
    assert bool(dsk.ok)
    # rigid carries the 0.5*dv*T = 5 cm center-displacement bias
    assert err_dsk < 0.02, (err_dsk, err_rigid)
    assert err_dsk < 0.6 * err_rigid, (err_dsk, err_rigid)
