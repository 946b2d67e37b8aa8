"""npz bag container: write/replay ordering, KITTI conversion, run_slam
--bag end-to-end, realtime drop simulation."""

import json
import os

import numpy as np
import pytest

from msf_loam_tpu.dataio import kitti, npz_bag
from msf_loam_tpu.dataio.npz_bag import Bag, BagWriter, ImuMsg, OdomMsg, ScanMsg


def _write_bag(path, n_scans=3, imu_hz=50):
    w = BagWriter()
    rng = np.random.default_rng(0)
    for i in range(n_scans):
        t = 0.1 * i
        w.add_scan(t, rng.normal(size=(100, 3)).astype(np.float32),
                   np.zeros(100, np.int32))
        w.add_odom(t, np.array([0.1 * i, 0, 0]), np.array([1.0, 0, 0, 0]))
    for k in range(int(n_scans * 0.1 * imu_hz)):
        w.add_imu(k / imu_hz, [0, 0, 9.81], [0, 0, 0])
    w.save(path)


def test_bag_replay_ordering(tmp_path):
    path = str(tmp_path / "test.npz")
    _write_bag(path)
    bag = Bag(path)
    msgs = list(bag.replay())
    times = [m.time for m in msgs]
    assert times == sorted(times)
    kinds = {type(m) for m in msgs}
    assert kinds == {ScanMsg, ImuMsg, OdomMsg}
    assert bag.n_scans == 3


def test_bag_from_kitti(tmp_path):
    root = str(tmp_path / "kitti")
    kitti.make_synthetic_kitti_sequence(root, "00", n_frames=4,
                                        pts_per_ring=400)
    bag_path = str(tmp_path / "seq00.npz")
    npz_bag.bag_from_kitti(root, "00", bag_path, n_rings=16, imu_rate=100.0)
    bag = Bag(bag_path)
    assert bag.n_scans == 4
    msgs = list(bag.replay())
    imu = [m for m in msgs if isinstance(m, ImuMsg)]
    odom = [m for m in msgs if isinstance(m, OdomMsg)]
    assert len(imu) > 20 and len(odom) == 4
    # stationary-rotation sequence: gyro ~ 0, accel ~ gravity magnitude
    accs = np.asarray([m.acc for m in imu])
    assert abs(np.linalg.norm(accs, axis=1).mean() - 9.81) < 0.5


def test_run_slam_bag_mode(tmp_path, capsys):
    from msf_loam_tpu.apps.run_slam import main
    root = str(tmp_path / "kitti")
    kitti.make_synthetic_kitti_sequence(root, "00", n_frames=5,
                                        pts_per_ring=1800)
    bag_path = str(tmp_path / "seq00.npz")
    npz_bag.bag_from_kitti(root, "00", bag_path, n_rings=16)
    rc = main(["--bag", bag_path, "--n_rings", "16", "--eval", "--quiet",
               "--output_dir", str(tmp_path / "out")])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["frames"] == 5
    assert out["ate_rmse_m"] < 0.08


def test_realtime_replay_drops_when_busy(tmp_path):
    path = str(tmp_path / "test.npz")
    _write_bag(path, n_scans=4)
    bag = Bag(path)
    # consumer that is always busy -> all but maybe the first scan dropped
    import time
    busy = lambda: time.perf_counter() + 10.0
    dropped = [d for m, d in bag.replay_realtime(speed=50.0, busy_until=busy)
               if isinstance(m, ScanMsg)]
    assert all(dropped)
    # never-busy consumer -> nothing dropped
    free = lambda: 0.0
    dropped = [d for m, d in bag.replay_realtime(speed=50.0, busy_until=free)
               if isinstance(m, ScanMsg)]
    assert not any(dropped)


def test_kitti_to_bag_cli(tmp_path, capsys):
    from msf_loam_tpu.apps.kitti_to_bag import main as conv_main
    root = str(tmp_path / "kitti")
    kitti.make_synthetic_kitti_sequence(root, "00", n_frames=3,
                                        pts_per_ring=300)
    out = str(tmp_path / "seq.npz")
    rc = conv_main(["--kitti_root", root, "--sequence", "00", "--output", out,
                    "--n_rings", "16", "--imu_rate", "100", "--latency", "0.02"])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip())
    assert res["scans"] == 3
    bag = Bag(out)
    # latency re-stamp applied
    assert abs(bag.scan(0).time - 0.02) < 1e-6


def test_run_slam_online_mode_sheds_load(tmp_path, capsys):
    """--online replays on the wall clock and drops scans when behind
    (the reference's real-time policy)."""
    from msf_loam_tpu.apps.run_slam import main
    root = str(tmp_path / "kitti")
    kitti.make_synthetic_kitti_sequence(root, "00", n_frames=6,
                                        pts_per_ring=1800)
    bag_path = str(tmp_path / "seq00.npz")
    npz_bag.bag_from_kitti(root, "00", bag_path, n_rings=16)
    rc = main(["--bag", bag_path, "--n_rings", "16", "--online",
               "--online_speed", "50", "--quiet",
               "--output_dir", str(tmp_path / "out")])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # at 50x speed with ~1s/frame processing, most scans get dropped —
    # but at least the first processes and the run completes cleanly
    assert out["frames"] >= 1
    assert out["dropped_scans"] >= 1
    assert out["frames"] + out["dropped_scans"] <= 6
