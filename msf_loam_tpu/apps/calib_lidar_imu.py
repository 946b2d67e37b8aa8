"""Offline LiDAR-IMU extrinsic rotation calibration CLI.

The ``calib_lidar_imu`` executable analog
(``/root/reference/src/calib_lidar_imu.cc:9-62``): loads a recorded
trajectory+IMU artifact (the pbstream analog written by run_slam), forms
per-pair lidar rotation deltas and gyro-integrated IMU deltas (every k-th
odometry pair, 10 ms integration steps), and runs the hand-eye SVD solve.

Usage:
  python -m msf_loam_tpu.apps.calib_lidar_imu --trajectory traj.npz
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--trajectory", required=True,
                    help="npz with times/rotation_wxyz and imu_* arrays")
    ap.add_argument("--stride", type=int, default=3,
                    help="use every k-th odometry pair (calib_lidar_imu.cc:27)")
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from msf_loam_tpu.core.se3 import quat_conjugate, quat_multiply
    from msf_loam_tpu.dataio.artifacts import load_trajectory
    from msf_loam_tpu.imu.extrinsic_calib import (
        calibrate_extrinsic_rotation, integrate_gyro_rotation)

    if args.trajectory.endswith(".pbstream"):
        from msf_loam_tpu import proto as pbcodec
        data = pbcodec.read_pbstream(args.trajectory)
    else:
        data = load_trajectory(args.trajectory)
    times = data["times"]
    q = data["rotation_wxyz"]
    if "imu_times" not in data:
        print("error: trajectory artifact has no IMU record", file=sys.stderr)
        return 2
    imu_t = data["imu_times"]
    imu_gyr = data["imu_angular_velocity"]

    dq_lidar, dq_imu = [], []
    for i in range(0, len(times) - args.stride, args.stride):
        j = i + args.stride
        ql = quat_multiply(quat_conjugate(jnp.asarray(q[i])), jnp.asarray(q[j]))
        # gyro integration over [t_i, t_j] (10 ms steps in the reference;
        # here: the actual IMU samples in range)
        sel = (imu_t >= times[i]) & (imu_t < times[j])
        if sel.sum() < 2:
            continue
        ts = imu_t[sel]
        dts = np.diff(ts, prepend=times[i]).astype(np.float32)
        qi = integrate_gyro_rotation(
            jnp.asarray(imu_gyr[sel], dtype=jnp.float32),
            jnp.asarray(dts), jnp.ones(len(ts), bool))
        dq_lidar.append(np.asarray(ql))
        dq_imu.append(np.asarray(qi))

    if len(dq_lidar) < 10:
        print(json.dumps({"converged": False,
                          "reason": f"only {len(dq_lidar)} pairs"}))
        return 1

    out = calibrate_extrinsic_rotation(
        jnp.asarray(np.asarray(dq_lidar, np.float32)),
        jnp.asarray(np.asarray(dq_imu, np.float32)),
        jnp.ones(len(dq_lidar), bool))
    result = {
        "converged": bool(out.converged),
        "q_ric_wxyz": [round(float(x), 6) for x in np.asarray(out.q_ric)],
        "sigma_gate": round(float(out.singular_gate), 4),
        "n_pairs": len(dq_lidar),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
