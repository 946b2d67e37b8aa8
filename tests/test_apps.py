"""App-level end-to-end tests: run_slam over a synthetic KITTI-format
sequence, evaluate CLI, artifacts roundtrip, validation checks."""

import json
import os

import numpy as np
import pytest

from msf_loam_tpu.dataio import artifacts, kitti, synthetic, validation


@pytest.fixture(scope="module")
def kitti_fixture(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("kitti"))
    kitti.make_synthetic_kitti_sequence(root, "00", n_frames=6,
                                        pts_per_ring=1800, yaw_rate=0.1)
    return root


def test_kitti_reader(kitti_fixture):
    seq = kitti.KittiSequence(kitti_fixture, "00", n_rings=16)
    assert len(seq) == 6
    f = seq.read_frame(0)
    assert f.xyz.shape[1] == 3 and len(f.xyz) > 1000
    assert f.gt_pose is not None
    np.testing.assert_allclose(f.gt_pose[:3, 3], 0.0, atol=1e-6)
    f5 = seq.read_frame(5)
    np.testing.assert_allclose(f5.gt_pose[:3, 3], [1.25, 0, 0], atol=1e-5)


def test_run_slam_on_kitti_fixture(kitti_fixture, tmp_path, capsys):
    from msf_loam_tpu.apps.run_slam import main
    rc = main(["--kitti_root", kitti_fixture, "--sequence", "00",
               "--n_rings", "16", "--eval", "--quiet",
               "--output_dir", str(tmp_path)])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["frames"] == 6
    assert out["ate_rmse_m"] < 0.08, out
    assert os.path.exists(tmp_path / "trajectory.npz")


def test_run_slam_loop_closure(tmp_path, capsys):
    """--loop_closure end-to-end on an out-and-back selftest: a revisit is
    detected, scan-matched into a loop edge, and solved without degrading
    the trajectory."""
    from msf_loam_tpu.apps.run_slam import main
    rc = main(["--selftest", "--selftest_path", "loop",
               "--selftest_frames", "30", "--loop_closure", "--eval",
               "--quiet", "--output_dir", str(tmp_path)])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["loop_edges"] >= 1, out
    assert out["ate_rmse_m"] < 0.08, out

    # no-revisit trajectory: detection yields zero edges and the padded
    # (all-invalid) solve must leave the trajectory intact
    rc = main(["--selftest", "--selftest_frames", "25", "--loop_closure",
               "--eval", "--quiet", "--output_dir", str(tmp_path / "b")])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["loop_edges"] == 0, out
    assert out["ate_rmse_m"] < 0.08, out


def test_evaluate_cli(kitti_fixture, tmp_path, capsys):
    from msf_loam_tpu.apps.evaluate import main as eval_main
    from msf_loam_tpu.apps.run_slam import main as slam_main
    slam_main(["--kitti_root", kitti_fixture, "--sequence", "00",
               "--n_rings", "16", "--quiet", "--output_dir", str(tmp_path)])
    capsys.readouterr()
    rc = eval_main(["--trajectory", str(tmp_path / "trajectory.npz"),
                    "--kitti_root", kitti_fixture, "--sequence", "00",
                    "--rpe_delta", "2"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["ate_rmse_m"] < 0.08
    # rotational RPE is reported when both sides carry rotations, and a
    # well-tracked short sequence stays under a degree
    assert out["rpe_2_rot_deg"] is not None
    assert out["rpe_2_rot_deg"] < 1.0, out


def test_rpe_rot_identity_and_known_angle():
    from msf_loam_tpu.apps.evaluate import _quat_wxyz_to_R, rpe_rot_deg
    n = 20
    # identical trajectories -> 0 deg
    q = np.tile(np.array([1.0, 0, 0, 0]), (n, 1))
    R = _quat_wxyz_to_R(q)
    assert rpe_rot_deg(R, R, delta=5) == 0.0
    # estimate accumulates 2 deg per frame of extra yaw -> over delta=5
    # the relative rotation error is exactly 10 deg
    ang = np.deg2rad(2.0) * np.arange(n)
    qe = np.stack([np.cos(ang / 2), np.zeros(n), np.zeros(n),
                   np.sin(ang / 2)], axis=1)
    Re = _quat_wxyz_to_R(qe)
    np.testing.assert_allclose(rpe_rot_deg(Re, R, delta=5), 10.0, atol=1e-6)


def test_ply_roundtrip(tmp_path):
    pts = np.random.default_rng(0).normal(size=(500, 3)).astype(np.float32)
    path = str(tmp_path / "cloud.ply")
    artifacts.save_ply(path, pts)
    back = artifacts.load_ply(path)
    np.testing.assert_allclose(back, pts, atol=1e-7)


def test_gravity_align():
    g = np.array([0.1, -0.2, 9.7])
    pts = np.random.default_rng(1).normal(size=(100, 3))
    out = artifacts.gravity_align(pts, g)
    # the gravity direction maps to +z
    gz = artifacts.gravity_align(g[None] / np.linalg.norm(g), g)
    np.testing.assert_allclose(gz[0], [0, 0, 1], atol=1e-5)
    # rigid: norms preserved
    np.testing.assert_allclose(np.linalg.norm(out, axis=1),
                               np.linalg.norm(pts, axis=1), rtol=1e-5)


def test_trajectory_artifact_roundtrip(tmp_path):
    path = str(tmp_path / "traj.npz")
    times = np.arange(5.0)
    t = np.random.default_rng(2).normal(size=(5, 3))
    q = np.tile([1.0, 0, 0, 0], (5, 1))
    imu = {"times": np.arange(50.0) / 10,
           "angular_velocity": np.zeros((50, 3))}
    artifacts.save_trajectory(path, times, t, q, imu)
    back = artifacts.load_trajectory(path)
    np.testing.assert_allclose(back["translation"], t)
    assert "imu_times" in back


def test_validation_good_scan():
    world = synthetic.World.corridor(seed=0, size=12.0)
    xyz, ring = synthetic.simulate_scan(world, np.zeros(3), np.eye(3),
                                        n_rings=16, pts_per_ring=900)
    from msf_loam_tpu.dataio.preprocess import compute_relative_time
    rel = compute_relative_time(xyz, ring)
    out = validation.validate_scan(xyz, ring, rel, n_rings=16)
    assert out["ok"], out["errors"]


def test_validation_catches_bad_data():
    xyz = np.random.default_rng(0).normal(size=(200, 3))
    xyz[0] = np.nan
    ring = np.full(200, 99, np.int32)
    out = validation.validate_scan(xyz, ring, n_rings=16)
    assert not out["ok"]
    assert len(out["errors"]) >= 2


def test_restamp_latency():
    t = np.arange(5) * 0.1
    np.testing.assert_allclose(validation.restamp_latency(t), t + 0.02)


def test_calib_cli_with_synthetic_imu(tmp_path, capsys):
    """End-to-end: record trajectory+IMU with a known extrinsic rotation,
    recover it via the calib CLI (calib_lidar_imu.cc workflow)."""
    import jax.numpy as jnp

    from msf_loam_tpu.apps.calib_lidar_imu import main as calib_main
    from msf_loam_tpu.core.se3 import (quat_conjugate, quat_exp,
                                       quat_multiply, quat_normalize)

    rng = np.random.default_rng(5)
    q_ric = np.asarray(quat_normalize(jnp.asarray([0.96, 0.15, -0.1, 0.2])))
    n_frames, imu_hz = 40, 200
    frame_dt = 0.1

    # IMU-frame orientation random walk; lidar sees it conjugated by q_ric
    times = np.arange(n_frames) * frame_dt
    imu_times, gyr = [], []
    q_imu = np.array([1.0, 0, 0, 0])
    q_imu_traj = [q_imu]
    for k in range((n_frames - 1) * imu_hz // 10):
        w = np.array([0.6 * np.sin(0.05 * k), 0.4 * np.cos(0.03 * k),
                      0.5 * np.sin(0.02 * k + 1)])
        dt = 1.0 / imu_hz
        imu_times.append(k * dt)
        gyr.append(w)
        q_imu = np.asarray(quat_normalize(quat_multiply(
            jnp.asarray(q_imu), quat_exp(jnp.asarray(w * dt)))))
        q_imu_traj.append(q_imu)

    # lidar orientation: q_l = q_ric * q_imu * q_ric^-1 (hand-eye identity)
    q_lidar = []
    for i in range(n_frames):
        k = min(int(round(i * frame_dt * imu_hz)), len(q_imu_traj) - 1)
        ql = quat_multiply(quat_multiply(jnp.asarray(q_ric),
                                         jnp.asarray(q_imu_traj[k])),
                           quat_conjugate(jnp.asarray(q_ric)))
        q_lidar.append(np.asarray(ql))

    path = str(tmp_path / "traj.npz")
    artifacts.save_trajectory(
        path, times, np.zeros((n_frames, 3)), np.asarray(q_lidar),
        imu={"times": np.asarray(imu_times),
             "angular_velocity": np.asarray(gyr)})
    rc = calib_main(["--trajectory", path])
    out = json.loads(capsys.readouterr().out.strip())
    assert rc == 0
    assert out["converged"]
    got = np.asarray(out["q_ric_wxyz"])
    assert abs(got @ q_ric) > 0.999, (got, q_ric)


def test_kitti_scale_64_ring_pipeline(tmp_path, capsys):
    """HDL-64/KITTI-scale shapes through the full CLI (64 rings)."""
    import json as _json

    from msf_loam_tpu.apps.run_slam import main
    root = str(tmp_path / "kitti64")
    kitti.make_synthetic_kitti_sequence(
        root, "00", n_frames=3, n_rings=64, pts_per_ring=900,
        world=synthetic.World.corridor(seed=2, size=15.0))
    rc = main(["--kitti_root", root, "--sequence", "00", "--n_rings", "64",
               "--eval", "--quiet", "--output_dir", str(tmp_path / "out")])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["frames"] == 3
    assert out["ate_rmse_m"] < 0.1, out


def test_viz_stream_publishes_state(tmp_path, capsys):
    """--viz_stream writes an atomic state.json (poses + sampled map) plus
    the polling viewer; final publish is marked done."""
    from msf_loam_tpu.apps.run_slam import main
    vdir = tmp_path / "viz"
    rc = main(["--selftest", "--selftest_frames", "6", "--quiet",
               "--viz_stream", str(vdir), "--viz_period", "3",
               "--output_dir", str(tmp_path)])
    assert rc == 0
    state = json.loads((vdir / "state.json").read_text())
    assert state["done"] is True
    assert state["frame"] == 6
    assert len(state["traj"]) == 6 * 3
    assert len(state["map"]) > 0 and len(state["map"]) % 3 == 0
    html = (vdir / "viz_live.html").read_text()
    assert "state.json" in html and "<canvas" in html
