"""Controlled experiment: does undistort_from_motion with the TRUE motion
land a distorted scan's features on world geometry? Isolates the deskew
math + rel_time chain from the SLAM feedback loops (dev tool)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from msf_loam_tpu.config import FeatureConfig, MappingConfig
from msf_loam_tpu.core.se3 import Pose, matrix_to_quat
from msf_loam_tpu.dataio import preprocess, synthetic
from msf_loam_tpu.imu import deskew as deskew_mod
from msf_loam_tpu.ops import features
from msf_loam_tpu.slam.pipeline import downsample_features

FCFG = FeatureConfig(max_points_per_ring=2048, max_less_flat=4096)
WORLD = synthetic.World.corridor(seed=0, size=12.0)

V0 = np.array([1.2, 0.4, 0.0])
YAW_RATE = 0.25
T = 0.1


def pose_at(t):
    yaw = YAW_RATE * t
    c, s = np.cos(yaw), np.sin(yaw)
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
    return V0 * t, R


def plane_dist(world_pts, mask):
    d = np.full(len(world_pts), np.inf)
    for pl in WORLD.planes:
        d = np.minimum(d, np.abs((world_pts - pl.point) @ pl.normal))
    return d[np.asarray(mask)]


def main():
    t = 1.0
    p0, R0 = pose_at(t)
    p1, R1 = pose_at(t + T)
    xyz, ring = synthetic.simulate_scan(
        WORLD, p0, R0, n_rings=16, pts_per_ring=1800, noise=0.0,
        seed=0, linear_vel=V0, yaw_rate=YAW_RATE)
    img = preprocess.preprocess_scan(xyz, ring, FCFG, num_rings=16)
    feats = features.extract_features(img, jnp.float32(t), FCFG)

    surf_ds = downsample_features(feats.surf_less_flat, 0.4, 2048)
    mask = np.asarray(surf_ds.mask)

    # true step pose: curr(t+T) start in curr(t) start frame
    R_rel = R0.T @ R1
    t_rel = R0.T @ (p1 - p0)
    step = Pose(jnp.asarray(t_rel, jnp.float32),
                matrix_to_quat(jnp.asarray(R_rel, jnp.float32)))

    world_pose = Pose(jnp.asarray(p0, jnp.float32),
                      matrix_to_quat(jnp.asarray(R0, jnp.float32)))

    raw_w = np.asarray(surf_ds.transform(world_pose).xyz)
    d_raw = plane_dist(raw_w, mask)

    fixed = deskew_mod.undistort_from_motion(surf_ds, step, T)
    fix_w = np.asarray(fixed.transform(world_pose).xyz)
    d_fix = plane_dist(fix_w, mask)

    rt = np.asarray(surf_ds.rel_time)[np.asarray(mask)]
    print(f"n={mask.sum()}  rel_time range [{rt.min():.4f}, {rt.max():.4f}]")
    print(f"raw   : median {np.median(d_raw):.4f}  p90 {np.percentile(d_raw, 90):.4f}  max {d_raw.max():.4f}")
    print(f"deskew: median {np.median(d_fix):.4f}  p90 {np.percentile(d_fix, 90):.4f}  max {d_fix.max():.4f}")

    # per-rel-time-bucket error (is the error growing with s? sign issue?)
    for lo in np.arange(0, 1.0, 0.25):
        sel = (rt >= lo * T) & (rt < (lo + 0.25) * T)
        if sel.sum():
            print(f"  s in [{lo:.2f},{lo+0.25:.2f}): raw {np.median(d_raw[sel]):.4f}  "
                  f"deskew {np.median(d_fix[sel]):.4f}  (n={sel.sum()})")


if __name__ == "__main__":
    main()
