"""LIO (tightly-coupled LiDAR-IMU) pipeline on motion-distorted synthetic
scans: estimator init, gravity recovery, deskewed tracking."""

import jax.numpy as jnp
import numpy as np

from msf_loam_tpu.config import (FeatureConfig, ImuConfig, MappingConfig,
                                 MsfLoamConfig)
from msf_loam_tpu.dataio import preprocess, synthetic
from msf_loam_tpu.ops import features
from msf_loam_tpu.slam.pipeline import SlamPipeline, ate_rmse

FCFG = FeatureConfig(max_points_per_ring=2048, max_less_flat=4096)
WORLD = synthetic.World.corridor(seed=0, size=12.0)
G = np.array([0.0, 0.0, 9.81])

V0 = np.array([1.2, 0.4, 0.0])   # constant world velocity (m/s)
YAW_RATE = 0.25                  # rad/s
IMU_HZ = 400
FRAME_DT = 0.1


def _pose_at(t):
    yaw = YAW_RATE * t
    c, s = np.cos(yaw), np.sin(yaw)
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
    return V0 * t, R


def _imu_at(t):
    """acc_body = R^T (a_w + G) with a_w = 0; gyr = [0,0,yaw_rate]."""
    _, R = _pose_at(t)
    return R.T @ G, np.array([0.0, 0.0, YAW_RATE])


def _scan_at(t, distort=True, seed=0):
    p, R = _pose_at(t)
    kw = dict(linear_vel=V0, yaw_rate=YAW_RATE) if distort else {}
    xyz, ring = synthetic.simulate_scan(
        WORLD, p, R, n_rings=16, pts_per_ring=1800, noise=0.004,
        seed=seed, **kw)
    img = preprocess.preprocess_scan(xyz, ring, FCFG, num_rings=16)
    return features.extract_features(img, jnp.float32(t), FCFG)


def _config(init_frames=6):
    return MsfLoamConfig(
        features=FCFG,
        mapping=MappingConfig(map_table_size=1 << 13, max_query_points=2048),
        imu=ImuConfig(init_frames=init_frames, warmup_msgs=10,
                      max_imu_samples=64),
    )


def _run(n_frames, use_imu, init_frames=6):
    pipe = SlamPipeline(_config(init_frames))
    t0 = 1.0  # scans start after some IMU warm-up
    if use_imu:
        t = t0 - 0.5
        while t < t0 + n_frames * FRAME_DT + 0.2:
            acc, gyr = _imu_at(t)
            pipe.add_imu(t, acc, gyr)
            t += 1.0 / IMU_HZ
    p0, R0 = _pose_at(t0)
    gt = []
    for i in range(n_frames):
        ts = t0 + i * FRAME_DT
        # ground truth in the first-frame (SLAM origin) coordinate system
        gt.append(R0.T @ (_pose_at(ts)[0] - p0))
        pipe.process_scan(_scan_at(ts, distort=True, seed=i))
    return pipe, np.asarray(gt)


def test_lio_initializes_and_recovers_gravity():
    pipe, gt = _run(n_frames=8, use_imu=True, init_frames=6)
    assert pipe.is_initialized
    g = np.asarray(pipe.gravity)
    np.testing.assert_allclose(np.linalg.norm(g), 9.81, atol=1e-3)
    # direction within ~6 degrees of true gravity
    cos = g @ G / (np.linalg.norm(g) * np.linalg.norm(G))
    assert cos > 0.994, f"gravity direction off: cos={cos}"


def test_lio_velocity_estimate():
    pipe, gt = _run(n_frames=8, use_imu=True, init_frames=6)
    v = np.asarray(pipe.velocity)
    _, R0 = _pose_at(1.0)
    np.testing.assert_allclose(v, R0.T @ V0, atol=0.25)


def test_lio_tracks_distorted_scans():
    n = 9
    pipe, gt = _run(n_frames=n, use_imu=True, init_frames=6)
    traj = pipe.trajectory()
    # gt here is the scan-START pose of each frame
    err = ate_rmse(traj[:, 1:4], gt, align=False)
    assert err < 0.12, f"LIO ATE {err:.3f} m"


def test_lidar_only_still_works_on_distorted_scans():
    n = 9
    pipe, gt = _run(n_frames=n, use_imu=False)
    traj = pipe.trajectory()
    err = ate_rmse(traj[:, 1:4], gt, align=False)
    assert err < 0.25, f"lidar-only ATE {err:.3f} m"


def test_lio_fused_ring_image_path():
    """process_ring_image routes initialized-LIO frames through the fused
    device program; it must land near the modular process_scan path."""
    from msf_loam_tpu.dataio import preprocess as pp

    def _run_ring(n_frames, init_frames=6):
        pipe = SlamPipeline(_config(init_frames))
        t0 = 1.0
        t = t0 - 0.5
        while t < t0 + n_frames * FRAME_DT + 0.2:
            acc, gyr = _imu_at(t)
            pipe.add_imu(t, acc, gyr)
            t += 1.0 / IMU_HZ
        p0, R0 = _pose_at(t0)
        gt = []
        for i in range(n_frames):
            ts = t0 + i * FRAME_DT
            gt.append(R0.T @ (_pose_at(ts)[0] - p0))
            p, R = _pose_at(ts)
            xyz, ring = synthetic.simulate_scan(
                WORLD, p, R, n_rings=16, pts_per_ring=1800, noise=0.004,
                seed=i, linear_vel=V0, yaw_rate=YAW_RATE)
            img = pp.preprocess_scan(xyz, ring, FCFG, num_rings=16)
            pipe.process_ring_image(img, ts)
        return pipe, np.asarray(gt)

    n = 9
    pipe, gt = _run_ring(n)
    assert pipe.is_initialized
    traj = pipe.trajectory()
    err = ate_rmse(traj[:, 1:4], gt, align=False)
    assert err < 0.15, f"fused LIO ATE {err:.3f} m"


def test_lio_tight_coupling_tracks():
    """A/B for the reference's 'drift if v not constant' todo
    (mapping_scan_matcher.cc:93): with the exact IMU factor inside the
    lidar GN, the velocity state can be FREED and tracking must stay at
    least as good as the held-constant baseline."""
    n = 9
    pipe_base, gt = _run(n_frames=n, use_imu=True, init_frames=6)
    err_base = ate_rmse(pipe_base.trajectory()[:, 1:4], gt, align=False)

    def _run_tight(n_frames, init_frames=6):
        import dataclasses
        cfg = _config(init_frames)
        cfg = dataclasses.replace(
            cfg, imu=dataclasses.replace(cfg.imu, tight_coupling=True))
        pipe = SlamPipeline(cfg)
        t0 = 1.0
        t = t0 - 0.5
        while t < t0 + n_frames * FRAME_DT + 0.2:
            acc, gyr = _imu_at(t)
            pipe.add_imu(t, acc, gyr)
            t += 1.0 / IMU_HZ
        p0, R0 = _pose_at(t0)
        gt = []
        for i in range(n_frames):
            ts = t0 + i * FRAME_DT
            gt.append(R0.T @ (_pose_at(ts)[0] - p0))
            pipe.process_scan(_scan_at(ts, distort=True, seed=i))
        return pipe, np.asarray(gt)

    pipe_t, gt_t = _run_tight(n)
    err_tight = ate_rmse(pipe_t.trajectory()[:, 1:4], gt_t, align=False)
    # measured: 0.035 tight vs 0.069 held-constant (regression headroom 2x)
    assert err_tight < 0.08, f"tight-coupling ATE {err_tight:.3f} m"
    assert err_tight < err_base + 0.01, (err_tight, err_base)
    # velocity stays observable (constrained by the in-solve IMU factor)
    v = np.asarray(pipe_t.velocity)
    _, R0 = _pose_at(1.0)
    np.testing.assert_allclose(v, R0.T @ V0, atol=0.3)
