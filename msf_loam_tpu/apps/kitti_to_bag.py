"""KITTI sequence -> npz bag converter CLI.

The ``kitti_helper`` executable analog
(``/root/reference/src/slam/kitti_helper.cc:34-173``): converts a KITTI
odometry sequence into the npz bag format replayed by ``run_slam --bag``,
optionally synthesizing a consistent IMU stream from the ground-truth poses
(KITTI odometry has no IMU) and re-stamping scans with a simulated driver
latency (``scripts/preprocess_bag_file.py`` analog).

Usage:
  python -m msf_loam_tpu.apps.kitti_to_bag --kitti_root DIR --sequence 00 \
      --output seq00.npz [--imu_rate 400] [--latency 0.02] [--max_frames N]
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--kitti_root", required=True)
    ap.add_argument("--sequence", default="00")
    ap.add_argument("--output", required=True)
    ap.add_argument("--n_rings", type=int, default=64)
    ap.add_argument("--max_frames", type=int, default=None)
    ap.add_argument("--imu_rate", type=float, default=0.0,
                    help="synthesize IMU at this rate from GT poses")
    ap.add_argument("--latency", type=float, default=0.0,
                    help="re-stamp scans with simulated driver latency (s)")
    args = ap.parse_args(argv)

    from msf_loam_tpu.dataio.npz_bag import Bag, bag_from_kitti

    bag_from_kitti(args.kitti_root, args.sequence, args.output,
                   n_rings=args.n_rings, max_frames=args.max_frames,
                   imu_rate=args.imu_rate, latency=args.latency)
    bag = Bag(args.output)
    print(json.dumps({"output": args.output, "scans": bag.n_scans}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
