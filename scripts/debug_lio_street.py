"""Diagnose the street-scale LIO divergence: run the lio config over the
cached street sim and dump per-frame estimate vs ground truth, velocity,
and correspondence counts (dev tool).

Run:  python scripts/debug_lio_street.py [--frames 200] [--no_imu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from scripts.kitti_eval import DT, SPEED, load_frame, simulate_cached


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--sim_frames", type=int, default=600)
    ap.add_argument("--rings", type=int, default=64)
    ap.add_argument("--pts", type=int, default=1800)
    ap.add_argument("--blocks", type=int, default=5)
    ap.add_argument("--route", default="tour")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--noise", type=float, default=0.01)
    ap.add_argument("--distorted", action="store_true", default=True)
    ap.add_argument("--cache_dir", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".cache", "kitti_sim"))
    ap.add_argument("--sim_workers", type=int, default=4)
    ap.add_argument("--tight", type=int, default=1,
                    help="1: tight IMU factor in the GN; 0: presolve+deskew only")
    ap.add_argument("--imu_weight", type=float, default=None)
    ap.add_argument("--grav_refine", type=int, default=None,
                    help="gravity re-solve period (0 disables)")
    args = ap.parse_args()

    # alias onto the kitti_eval cache key (frames is part of the key)
    class A:
        pass
    a = A()
    for k, v in vars(args).items():
        setattr(a, k, v)
    a.frames = args.sim_frames
    cache, st, path = simulate_cached(a)
    gt_t = st["p"]

    from msf_loam_tpu.config import (FeatureConfig, ImuConfig, MappingConfig,
                                     MsfLoamConfig, OdometryConfig)
    from msf_loam_tpu.dataio import preprocess, synthetic
    from msf_loam_tpu.slam.pipeline import SlamPipeline

    fcfg = FeatureConfig(max_points_per_ring=2048, max_less_flat=8192)
    cfg = MsfLoamConfig(
        features=fcfg,
        odometry=OdometryConfig(motion_deskew=True),
        mapping=MappingConfig(map_table_size=1 << 15, max_query_points=4096),
        imu=ImuConfig(init_frames=30, warmup_msgs=50,
                      tight_coupling=bool(args.tight),
                      **({"imu_factor_weight": args.imu_weight}
                         if args.imu_weight is not None else {}),
                      **({"grav_refine_period": args.grav_refine}
                         if args.grav_refine is not None else {})))
    pipe = SlamPipeline(cfg)
    tt, acc, gyr = synthetic.synthetic_imu(
        path, SPEED, -0.5, args.frames * DT + 0.3, rate=400.0, accel=2.0)
    j = 0
    for i in range(args.frames):
        xyz, ring = load_frame(cache, i)
        img = preprocess.preprocess_scan(xyz, ring, fcfg,
                                         num_rings=args.rings)
        ts = DT * i
        while j < len(tt) and tt[j] <= ts + DT:
            pipe.add_imu(tt[j], acc[j], gyr[j])
            j += 1
        res = pipe.process_ring_image(img, ts)
        tr = pipe.trajectory()
        est = tr[-1, 1:4]
        err = np.linalg.norm(est - gt_t[i])
        m = pipe.metrics()
        extra = ""
        if hasattr(pipe, "velocity") and pipe.velocity is not None:
            v = np.asarray(pipe.velocity)
            g = np.asarray(pipe.gravity)
            extra = (f" v=[{v[0]:7.2f} {v[1]:7.2f} {v[2]:7.2f}]"
                     f" g=[{g[0]:6.3f} {g[1]:6.3f} {g[2]:7.3f}]")
        print(f"f{i:4d} err={err:9.3f} est=[{est[0]:8.2f} {est[1]:8.2f} "
              f"{est[2]:7.2f}] gt=[{gt_t[i][0]:8.2f} {gt_t[i][1]:8.2f} "
              f"{gt_t[i][2]:7.2f}] init={pipe.is_initialized}"
              f" ok={res.ok} nc={res.n_correspondences:.0f}"
              f"{extra} {m if i % 25 == 0 else ''}", flush=True)


if __name__ == "__main__":
    main()
