"""Stream a bag (npz or ROS1) — or synthetic selftest frames — to a
``run_slam --listen`` consumer over the dataio/stream.py socket protocol.

The producer paces messages on the wall clock like a live sensor (the
consumer sheds scans when it falls behind); --speed scales the clock.

Usage:
  python scripts/stream_producer.py --addr 127.0.0.1:7777 --bag run.npz
  python scripts/stream_producer.py --addr unix:/tmp/msf.sock --selftest \
      --frames 20 [--speed 4]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


class _SelftestBag:
    """Synthetic corridor drive as a replayable message source (matches
    run_slam --selftest geometry, with gt odometry messages)."""

    def __init__(self, frames: int, n_rings: int = 16,
                 pts_per_ring: int = 1800, warmup_static: int = 0,
                 step: float = 0.25):
        self.frames = frames
        self.n_rings = n_rings
        self.pts = pts_per_ring
        self.warmup = warmup_static
        self.step = step

    def replay(self):
        from msf_loam_tpu.dataio import synthetic
        from msf_loam_tpu.dataio.npz_bag import OdomMsg, ScanMsg

        world = synthetic.World.corridor(seed=0, size=12.0)
        for i in range(self.frames):
            # optionally hold still for the first warmup frames (a real
            # deployment brings the vehicle up while jit compiles)
            j = max(0, i - self.warmup)
            t = np.array([self.step * j, 0.1 * np.sin(0.2 * j), 0.0])
            yaw = 0.02 * j
            c, s = np.cos(yaw), np.sin(yaw)
            R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
            xyz, ring = synthetic.simulate_scan(
                world, t, R, n_rings=self.n_rings, pts_per_ring=self.pts,
                noise=0.004, seed=i)
            yield OdomMsg(time=0.1 * i, t=t.astype(np.float32),
                          q_wxyz=np.array([1.0, 0, 0, 0], np.float32))
            yield ScanMsg(time=0.1 * i, xyz=xyz.astype(np.float32),
                          ring=ring.astype(np.int32))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--addr", required=True)
    ap.add_argument("--bag", help="npz bag to stream")
    ap.add_argument("--selftest", action="store_true",
                    help="stream synthetic corridor frames instead")
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--warmup_static", type=int, default=0,
                    help="hold the selftest platform still for the first "
                         "N frames (lets the consumer jit-compile without "
                         "losing track)")
    ap.add_argument("--step", type=float, default=0.25,
                    help="selftest translation per frame (m)")
    ap.add_argument("--speed", type=float, default=1.0)
    ap.add_argument("--burst", action="store_true",
                    help="no pacing: send as fast as the socket takes "
                         "(deliberate backpressure for shedding tests)")
    args = ap.parse_args(argv)

    from msf_loam_tpu.dataio.stream import stream_bag

    if args.selftest:
        bag = _SelftestBag(args.frames, warmup_static=args.warmup_static,
                           step=args.step)
    elif args.bag:
        from msf_loam_tpu.dataio.npz_bag import Bag
        bag = Bag(args.bag)
    else:
        ap.error("--bag or --selftest required")
    n = stream_bag(bag, args.addr, speed=args.speed,
                   realtime=not args.burst)
    print(f"streamed {n} messages to {args.addr}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
