"""Protobuf pbstream codec roundtrip + viz export + loop-closure stub."""

import json
import os

import numpy as np
import pytest

from msf_loam_tpu import proto as pbcodec
from msf_loam_tpu.dataio import artifacts
from msf_loam_tpu.slam.loop_closure import LoopEdge, SparsePoseGraph


@pytest.mark.skipif(not pbcodec.available(), reason="protoc unavailable")
def test_pbstream_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    times = np.arange(10) * 0.1
    t = rng.normal(size=(10, 3))
    q = np.tile([1.0, 0, 0, 0], (10, 1))
    imu = {"times": np.arange(40) * 0.0025,
           "angular_velocity": rng.normal(size=(40, 3)),
           "linear_acceleration": rng.normal(size=(40, 3))}
    path = str(tmp_path / "trajectory.pbstream")
    pbcodec.write_pbstream(path, times, t, q, imu)
    back = pbcodec.read_pbstream(path)
    np.testing.assert_allclose(back["times"], times, atol=1e-7)
    np.testing.assert_allclose(back["translation"], t, atol=1e-9)
    np.testing.assert_allclose(back["imu_angular_velocity"],
                               imu["angular_velocity"], atol=1e-9)


@pytest.mark.skipif(not pbcodec.available(), reason="protoc unavailable")
def test_calib_cli_reads_pbstream(tmp_path, capsys):
    """The calib tool consumes the pbstream like the reference binary."""
    from msf_loam_tpu.apps.calib_lidar_imu import main as calib_main
    times = np.arange(5) * 0.1
    q = np.tile([1.0, 0, 0, 0], (5, 1))
    imu = {"times": np.arange(100) * 0.005,
           "angular_velocity": np.zeros((100, 3))}
    path = str(tmp_path / "trajectory.pbstream")
    pbcodec.write_pbstream(path, times, np.zeros((5, 3)), q, imu)
    rc = calib_main(["--trajectory", path])
    out = json.loads(capsys.readouterr().out.strip())
    # stationary data -> not enough excitation; tool must exit cleanly
    assert rc in (0, 1)
    assert "converged" in out


def test_export_viz(tmp_path, capsys):
    from msf_loam_tpu.apps.export_viz import main as viz_main
    traj = str(tmp_path / "traj.npz")
    artifacts.save_trajectory(traj, np.arange(3.0), np.eye(3),
                              np.tile([1.0, 0, 0, 0], (3, 1)))
    ply = str(tmp_path / "map.ply")
    artifacts.save_ply(ply, np.random.default_rng(0).normal(size=(100, 3))
                       .astype(np.float32))
    out = str(tmp_path / "viz.html")
    rc = viz_main(["--trajectory", traj, "--map", ply, "--output", out])
    assert rc == 0
    html = open(out).read()
    assert "<canvas" in html and "MAP =" in html
    assert os.path.getsize(out) > 1000


def test_loop_closure_edge_surface():
    g = SparsePoseGraph()
    g.add_edge(LoopEdge(0, 10, np.zeros(3), np.array([1.0, 0, 0, 0])))
    assert len(g.edges) == 1
    # optimization over the collected edges is covered in test_loop_closure
