"""Dump the mapping plane-residual distribution at the TRUE pose for a
true-deskewed distorted scan vs an undistorted scan, correlated with
rel_time / wall identity (dev tool)."""

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
from msf_loam_tpu.slam import mapping, voxel_map
from msf_loam_tpu.slam.pipeline import downsample_features

FCFG = FeatureConfig(max_points_per_ring=2048, max_less_flat=4096)
WORLD = synthetic.World.corridor(seed=0, size=12.0)
MCFG = MappingConfig(map_table_size=1 << 13, max_query_points=2048)

A = np.array([2.0, 0.0, 0.0])
V_0 = np.array([1.0, 0.0, 0.0])
T = 0.1


def pose_at(t):
    return V_0 * t + 0.5 * A * t * t, np.eye(3)


def vel_at(t):
    return V_0 + A * t


def np_pose(p, R=np.eye(3)):
    return Pose(jnp.asarray(p, jnp.float32),
                matrix_to_quat(jnp.asarray(R, jnp.float32)))


def build(distort):
    corner_map = voxel_map.create_map(
        MCFG.map_table_size, MCFG.map_cell_capacity, MCFG.map_cell_size,
        MCFG.line_resolution)
    surf_map = voxel_map.create_map(
        MCFG.map_table_size, MCFG.map_cell_capacity, MCFG.map_cell_size,
        MCFG.plane_resolution)
    p_first, _ = pose_at(1.0)
    out = None
    for i in range(3):
        ts = 1.0 + i * T
        p, R = pose_at(ts)
        kw = dict(linear_vel=vel_at(ts), yaw_rate=0.0) if distort else {}
        xyz, ring = synthetic.simulate_scan(
            WORLD, p, R, n_rings=16, pts_per_ring=900, noise=0.004,
            seed=i, **kw)
        img = preprocess.preprocess_scan(xyz, ring, FCFG, num_rings=16)
        feats = features.extract_features(img, jnp.float32(ts), FCFG)
        c_ds = downsample_features(feats.corner_less_sharp,
                                   MCFG.line_resolution, MCFG.max_query_points)
        s_ds = downsample_features(feats.surf_less_flat,
                                   MCFG.plane_resolution, MCFG.max_query_points)
        if distort:
            step = np_pose(vel_at(ts) * T)
            c_ds = deskew_mod.undistort_from_motion(c_ds, step, T)
            s_ds = deskew_mod.undistort_from_motion(s_ds, step, T)
        wp = np_pose(p - p_first)
        if i < 2:
            cw = c_ds.transform(wp)
            sw = s_ds.transform(wp)
            corner_map = voxel_map.insert(corner_map, cw.xyz, cw.mask)
            surf_map = voxel_map.insert(surf_map, sw.xyz, sw.mask)
        else:
            out = (c_ds, s_ds, wp)
    return corner_map, surf_map, out


def analyze(tag, distort):
    corner_map, surf_map, (c_ds, s_ds, true_pose) = build(distort)
    corr = mapping._associate(corner_map, surf_map, c_ds, s_ds, true_pose,
                              MCFG)
    pw = np.asarray(true_pose.apply(s_ds.xyz))
    c = np.asarray(corr.plane_c)
    n = np.asarray(corr.plane_n)
    v = np.asarray(corr.plane_valid)
    r = np.abs(((pw - c) * n).sum(1))[v]
    pts = pw[v]
    rt = np.asarray(s_ds.rel_time)[v]
    print(f"[{tag}] n={v.sum()} residuals: median={np.median(r):.4f} "
          f"mean={r.mean():.4f} p90={np.percentile(r, 90):.4f} "
          f"p99={np.percentile(r, 99):.4f} max={r.max():.4f}")
    big = r > 0.05
    print(f"  big(>5cm): {big.sum()} ({100 * big.mean():.1f}%)  "
          f"rel_time of big: med={np.median(rt[big]) if big.any() else 0:.3f} "
          f"vs all: {np.median(rt):.3f}")
    if big.any():
        bp = pts[big]
        print(f"  big pts z: med={np.median(bp[:, 2]):.2f}  "
              f"|x|: med={np.median(np.abs(bp[:, 0])):.2f}  "
              f"|y|: med={np.median(np.abs(bp[:, 1])):.2f}")
        # signed residual along x-normal: do big residuals push -x?
        sr = ((pts - c) * n).sum(1)[... ] if False else None
    sgn = ((pw[v] - c[v]) * n[v]).sum(1)
    nx = n[v][:, 0]
    mask_xn = np.abs(nx) > 0.7
    print(f"  x-normal planes: {mask_xn.sum()}; signed resid med="
          f"{np.median(sgn[mask_xn]) if mask_xn.any() else 0:+.4f}")


if __name__ == "__main__":
    analyze("undistorted", distort=False)
    analyze("true-deskewed", distort=True)
