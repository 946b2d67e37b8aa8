"""Build a byte-exact NSH-style ROS1 ``.bag`` fixture (VERDICT r3 next #6).

The reference's primary input is a rosbag of /velodyne_points
(sensor_msgs/PointCloud2 with ``ring``/``time`` fields, CW ring order —
``scripts/validate_velodyne_cloud_in_bag.py``), /imu (400 Hz) and an
/odometry_gt stream (``msf_loam_node.cc:448-467``, README.md:51-55). This
script synthesizes the NSH capture's shape — a handheld VLP-16 walk
through the indoor-outdoor campus world with motion-distorted scans and a
genuine courtyard-loop revisit — and writes it as a REAL ROS1 2.0 bag via
dataio/rosbag.RosbagWriter, so the full CLI ingests it exactly like the
reference ingests NSH.

``validate_bag()`` re-implements the reference validation script's
semantics (time field present; rings ordered by vertical angle; CW point
order per ring) against our own reader, proving day-one compatibility.

Usage:  python scripts/make_nsh_bag.py OUT.bag [--frames 210]
"""

import argparse

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def courtyard_lap():
    """A closed lap inside the NSH campus courtyard (+ a short tail past
    the start so the proximity detector has a revisit)."""
    return np.array([[40.0, 4.0], [52.0, 4.0], [52.0, 14.0],
                     [40.0, 14.0], [40.0, 4.0], [46.0, 4.0]])


def build_nsh_bag(out_path: str, frames: int = 230, rings: int = 16,
                  pts_per_ring: int = 900, speed: float = 1.8,
                  imu_rate: float = 400.0, scan_dt: float = 0.1,
                  seed: int = 0, compression: str = "bz2",
                  chunk_msgs: int = 0, drop_scan_every: int = 0,
                  disorder: bool = False) -> dict:
    """Build the NSH-style fixture bag. Robustness knobs (r5, VERDICT #8):
    ``chunk_msgs`` writes a real multi-chunk bag; ``drop_scan_every=k``
    drops every k-th scan message (driver frame loss); ``disorder`` swaps
    adjacent record pairs and saves WITHOUT time-sorting, producing
    genuinely out-of-order record stamps (network reordering) that the
    npz conversion must heal."""
    from msf_loam_tpu.dataio import synthetic
    from msf_loam_tpu.dataio.npz_bag import ImuMsg, OdomMsg, ScanMsg
    from msf_loam_tpu.dataio.preprocess import compute_relative_time
    from msf_loam_tpu.dataio.rosbag import RosbagWriter

    world = synthetic.World.nsh_campus(seed=seed)
    path = synthetic.VehiclePath.from_waypoints(courtyard_lap(),
                                                turn_radius=2.0)
    times = np.arange(frames) * scan_dt
    need = speed * times[-1]
    if need > path.total_length:
        raise SystemExit(f"route too short: need {need:.0f} m, "
                         f"have {path.total_length:.0f} m")
    st = synthetic.drive_states(path, speed, times)

    # bag timeline starts at t0 so the IMU warm-up precedes the first scan
    t0 = 2.0
    w = RosbagWriter()
    imu_t, imu_a, imu_g = synthetic.synthetic_imu(
        path, speed, -1.0, times[-1] + scan_dt + 0.2, rate=imu_rate,
        accel_noise=0.02, gyro_noise=0.002, seed=seed)
    for j in range(len(imu_t)):
        w.add_imu(ImuMsg(time=t0 + imu_t[j], acc=imu_a[j], gyr=imu_g[j]))

    rng = np.random.default_rng(seed)
    for i in range(frames):
        p, R = st["p"][i], st["R"][i]
        xyz, ring = synthetic.simulate_scan(
            world, p, R, n_rings=rings, pts_per_ring=pts_per_ring,
            fov_up=15.0, fov_down=-15.0, max_range=80.0, noise=0.004,
            seed=1000 + i, linear_vel=st["v_world"][i],
            yaw_rate=float(st["yaw_rate"][i]))
        # the velodyne driver stamps per-point time from azimuth — same
        # derivation as our reader-side recomputation
        rel = compute_relative_time(xyz, ring, scan_period=scan_dt)
        w.add_scan(ScanMsg(time=t0 + times[i], xyz=xyz,
                           ring=ring.astype(np.int32)), rel_time=rel)
        from msf_loam_tpu.core.se3 import matrix_to_quat
        q = np.asarray(matrix_to_quat(R.astype(np.float32)), np.float64)
        w.add_odom(OdomMsg(time=t0 + times[i], t=p.astype(np.float64),
                           q_wxyz=q))
    if drop_scan_every:
        # drop every k-th SCAN message (topic conn 1 == /velodyne_points,
        # first add_* call above was IMU so scan conn id is dynamic — drop
        # by payload type via the connection map)
        scan_cid = w._topic_conn["/velodyne_points"]
        kept, si = [], 0
        for m in w._msgs:
            if m[1] == scan_cid:
                si += 1
                if si % drop_scan_every == 0:
                    continue
            kept.append(m)
        w._msgs = kept
    if disorder:
        for j in range(0, len(w._msgs) - 1, 7):
            w._msgs[j], w._msgs[j + 1] = w._msgs[j + 1], w._msgs[j]
        w.save(out_path, compression=compression, chunk_msgs=chunk_msgs,
               sort=False)
    else:
        w.save(out_path, compression=compression, chunk_msgs=chunk_msgs)
    dist = float(np.linalg.norm(np.diff(st["p"], axis=0), axis=1).sum())
    n_scans = frames - (frames // drop_scan_every if drop_scan_every else 0)
    return {"frames": n_scans, "imu_msgs": len(imu_t),
            "route_m": round(dist, 1), "bytes": os.path.getsize(out_path)}


def validate_bag(bag_path: str, max_scans: int = 3) -> dict:
    """The reference's validate_velodyne_cloud_in_bag.py semantics
    (/root/reference/scripts/validate_velodyne_cloud_in_bag.py:12-14):
      1. field 'time' exists;
      2. ring id increases with vertical angle;
      3. points within each ring are in CW order.
    Raises AssertionError on violation; returns stats."""
    from msf_loam_tpu.dataio.rosbag import PointCloud2, read_messages

    checked = 0
    for topic, _t, raw in read_messages(bag_path, raw=True):
        if topic != "/velodyne_points" or checked >= max_scans:
            continue
        pc = PointCloud2(raw)
        names = [f[0] for f in pc.fields]
        assert "time" in names, f"missing 'time' field (have {names})"
        assert "ring" in names, f"missing 'ring' field (have {names})"
        scan = pc.to_scan()
        xyz, ring = scan.xyz, scan.ring
        # 2. ring ordered by vertical angle
        vert = np.degrees(np.arctan2(xyz[:, 2],
                                     np.linalg.norm(xyz[:, :2], axis=1)))
        mean_v = [vert[ring == r].mean() for r in np.unique(ring)
                  if (ring == r).any()]
        assert all(a < b for a, b in zip(mean_v, mean_v[1:])), \
            "ring id not ordered by vertical angle"
        # 3. CW order per ring: azimuth -atan2(y,x) increases (mod 2pi)
        for r in np.unique(ring)[:4]:
            az = -np.arctan2(xyz[ring == r, 1], xyz[ring == r, 0])
            d = np.diff(np.unwrap(az))
            frac_cw = float((d > 0).mean())
            assert frac_cw > 0.98, f"ring {r} not CW ({frac_cw:.2f})"
        checked += 1
    assert checked > 0, "no /velodyne_points messages found"
    return {"scans_checked": checked}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("out")
    ap.add_argument("--frames", type=int, default=230)
    ap.add_argument("--validate", action="store_true")
    args = ap.parse_args(argv)
    import json
    info = build_nsh_bag(args.out, frames=args.frames)
    if args.validate:
        info.update(validate_bag(args.out))
    print(json.dumps(info))
    return 0


if __name__ == "__main__":
    sys.exit(main())
