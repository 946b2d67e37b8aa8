"""Round-trip tests for the pure-Python ROS1 bag reader/writer.

The reference ingests ROS v1 bags (msf_loam_node.cc:448-459); these tests
prove a spec-correct self-written fixture (correct record framing,
chunking, connection/index records, ROS1 message serialization) replays
bit-exactly through the reader and converts to the native npz-bag.
"""

import os

import numpy as np
import pytest

from msf_loam_tpu.dataio import rosbag
from msf_loam_tpu.dataio.npz_bag import Bag, ImuMsg, OdomMsg, ScanMsg


def _fixture_msgs(n_scans=3, n_pts=50, n_imu=20):
    rng = np.random.default_rng(0)
    scans = [ScanMsg(time=10.0 + 0.1 * i,
                     xyz=rng.normal(size=(n_pts, 3)).astype(np.float32),
                     ring=rng.integers(0, 16, size=n_pts).astype(np.int32))
             for i in range(n_scans)]
    imus = [ImuMsg(time=10.0 + 0.0125 * i,
                   acc=rng.normal(size=3), gyr=rng.normal(size=3))
            for i in range(n_imu)]
    odoms = [OdomMsg(time=10.0 + 0.1 * i, t=rng.normal(size=3),
                     q_wxyz=_rand_quat(rng)) for i in range(n_scans)]
    return scans, imus, odoms


def _rand_quat(rng):
    q = rng.normal(size=4)
    return q / np.linalg.norm(q)


def _write_fixture(path, compression="none"):
    scans, imus, odoms = _fixture_msgs()
    w = rosbag.RosbagWriter()
    for s in scans:
        w.add_scan(s, rel_time=np.linspace(0, 0.1, len(s.xyz),
                                           dtype=np.float32))
    for m in imus:
        w.add_imu(m)
    for o in odoms:
        w.add_odom(o)
    w.save(path, compression=compression)
    return scans, imus, odoms


@pytest.mark.parametrize("compression", ["none", "bz2"])
def test_roundtrip(tmp_path, compression):
    path = os.path.join(tmp_path, "t.bag")
    scans, imus, odoms = _write_fixture(path, compression)
    got = list(rosbag.read_messages(path))
    got_scans = [m for t, _, m in got if t == "/velodyne_points"]
    got_imus = [m for t, _, m in got if t == "/imu"]
    got_odoms = [m for t, _, m in got if t == "/odometry_gt"]
    assert len(got_scans) == len(scans)
    assert len(got_imus) == len(imus)
    assert len(got_odoms) == len(odoms)
    for a, b in zip(scans, got_scans):
        np.testing.assert_array_equal(a.xyz, b.xyz)
        np.testing.assert_array_equal(a.ring, b.ring)
        assert abs(a.time - b.time) < 1e-8
    for a, b in zip(imus, got_imus):
        np.testing.assert_allclose(a.acc, b.acc)
        np.testing.assert_allclose(a.gyr, b.gyr)
    for a, b in zip(odoms, got_odoms):
        np.testing.assert_allclose(a.t, b.t)
        np.testing.assert_allclose(a.q_wxyz, b.q_wxyz)


def test_topic_filter(tmp_path):
    path = os.path.join(tmp_path, "t.bag")
    _write_fixture(path)
    got = list(rosbag.read_messages(path, topics=["/imu"]))
    assert got and all(t == "/imu" for t, _, _ in got)


def test_bag_to_npz(tmp_path):
    path = os.path.join(tmp_path, "t.bag")
    out = os.path.join(tmp_path, "t.npz")
    scans, imus, odoms = _write_fixture(path)
    counts = rosbag.bag_to_npz(path, out)
    assert counts == {"scan": len(scans), "imu": len(imus),
                      "odom": len(odoms)}
    bag = Bag(out)
    assert bag.n_scans == len(scans)
    s0 = bag.scan(0)
    np.testing.assert_array_equal(s0.xyz, scans[0].xyz)
    np.testing.assert_array_equal(s0.ring, scans[0].ring)
    # replay preserves global timestamp order
    times = [m.time for m in bag.replay()]
    assert times == sorted(times)


def test_truncated_bag_stops_cleanly(tmp_path):
    path = os.path.join(tmp_path, "t.bag")
    _write_fixture(path)
    blob = open(path, "rb").read()
    cut = os.path.join(tmp_path, "cut.bag")
    with open(cut, "wb") as f:
        f.write(blob[: int(len(blob) * 0.6)])
    # must not raise; yields some prefix of the messages
    got = list(rosbag.read_messages(cut))
    assert len(got) <= 3 + 20 + 3


def test_not_a_bag_raises(tmp_path):
    path = os.path.join(tmp_path, "x.bag")
    with open(path, "wb") as f:
        f.write(b"definitely not a bag file")
    with pytest.raises(ValueError):
        list(rosbag.read_messages(path))


def test_pointcloud2_field_layout(tmp_path):
    """The serialized cloud exposes the velodyne PointXYZIRT layout and
    per-point rel-time survives."""
    path = os.path.join(tmp_path, "t.bag")
    scans, _, _ = _write_fixture(path)
    # grab the raw PointCloud2 to check named-field decode directly
    with open(path, "rb") as f:
        f.read(len(rosbag.MAGIC))
        buf = f.read()
    clouds = []
    conns = {}
    for header, data in rosbag._iter_records(buf):
        op = header.get(b"op", b"\x00")[0]
        if op == rosbag.OP_CHUNK:
            for h2, d2 in rosbag._iter_records(data):
                op2 = h2.get(b"op", b"\x00")[0]
                if op2 == rosbag.OP_CONNECTION:
                    cid = rosbag._U32.unpack(h2[b"conn"])[0]
                    conns[cid] = h2.get(b"topic", b"").decode()
                elif op2 == rosbag.OP_MSG:
                    cid = rosbag._U32.unpack(h2[b"conn"])[0]
                    if conns.get(cid) == "/velodyne_points":
                        clouds.append(rosbag.PointCloud2(d2))
    assert len(clouds) == len(scans)
    pc = clouds[0]
    names = [f[0] for f in pc.fields]
    assert names == ["x", "y", "z", "intensity", "ring", "time"]
    np.testing.assert_array_equal(pc.field("x"), scans[0].xyz[:, 0])
    rel = pc.field("time")
    np.testing.assert_allclose(
        rel, np.linspace(0, 0.1, len(scans[0].xyz), dtype=np.float32))


def test_run_slam_on_rosbag(tmp_path, capsys):
    """End-to-end: a real ROS1 .bag (written by our own spec-correct
    writer) replays through run_slam --bag directly."""
    import json

    from msf_loam_tpu.dataio import synthetic
    from msf_loam_tpu.apps.run_slam import main

    world = synthetic.World.corridor(seed=0, size=12.0)
    w = rosbag.RosbagWriter()
    for i in range(5):
        p = np.array([0.25 * i, 0.0, 0.0])
        xyz, ring = synthetic.simulate_scan(world, p, np.eye(3), n_rings=16,
                                            pts_per_ring=720, noise=0.003,
                                            seed=i)
        w.add_scan(ScanMsg(time=0.1 * i, xyz=xyz, ring=ring))
        w.add_odom(OdomMsg(time=0.1 * i, t=p,
                           q_wxyz=np.array([1.0, 0, 0, 0])))
    path = os.path.join(tmp_path, "drive.bag")
    w.save(path)
    rc = main(["--bag", path, "--n_rings", "16", "--eval", "--quiet",
               "--output_dir", str(tmp_path)])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["frames"] == 5
    assert out["ate_rmse_m"] < 0.08, out
