"""Open-loop matcher gain: build a clean map from TRUE-deskewed scans at
TRUE poses, then match a scan deskewed with a perturbed prior (delta on the
step translation) and measure d(pose error)/d(delta) (dev tool)."""

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


DISTORT = os.environ.get("MSF_DBG_DISTORT", "1") == "1"


def make_scan(i):
    ts = 1.0 + i * T
    p, R = pose_at(ts)
    kw = dict(linear_vel=vel_at(ts), yaw_rate=0.0) if DISTORT else {}
    xyz, ring = synthetic.simulate_scan(
        WORLD, p, R, n_rings=16, pts_per_ring=900, noise=0.004,
        seed=i, **kw)
    img = preprocess.preprocess_scan(xyz, ring, FCFG, num_rings=16)
    feats = features.extract_features(img, jnp.float32(ts), FCFG)
    return feats, p, R


def np_pose(p, R=np.eye(3)):
    return Pose(jnp.asarray(p, jnp.float32),
                matrix_to_quat(jnp.asarray(R, jnp.float32)))


def main():
    corner_map = voxel_map.create_map(
        MCFG.map_table_size, MCFG.map_cell_capacity, MCFG.map_cell_size,
        MCFG.line_resolution)
    surf_map = voxel_map.create_map(
        MCFG.map_table_size, MCFG.map_cell_capacity, MCFG.map_cell_size,
        MCFG.plane_resolution)
    p_first, _ = pose_at(1.0)

    for i in range(2):
        feats, p, R = make_scan(i)
        ts = 1.0 + i * T
        c_ds = downsample_features(feats.corner_less_sharp,
                                   MCFG.line_resolution, MCFG.max_query_points)
        s_ds = downsample_features(feats.surf_less_flat,
                                   MCFG.plane_resolution, MCFG.max_query_points)
        if DISTORT:
            true_step = np_pose(vel_at(ts) * T)   # R=I; within-scan motion
            c_ds = deskew_mod.undistort_from_motion(c_ds, true_step, T)
            s_ds = deskew_mod.undistort_from_motion(s_ds, true_step, T)
        wp = np_pose(p - p_first)
        cw = c_ds.transform(wp)
        sw = s_ds.transform(wp)
        corner_map = voxel_map.insert(corner_map, cw.xyz, cw.mask)
        surf_map = voxel_map.insert(surf_map, sw.xyz, sw.mask)

    def world_plane_dist(pts, mask=None):
        pts = np.asarray(pts).reshape(-1, 3)
        if mask is not None:
            pts = pts[np.asarray(mask).reshape(-1)]
        pts = pts[np.isfinite(pts).all(1) & (np.abs(pts).max(1) < 1e5)]
        d = np.full(len(pts), np.inf)
        for pl in WORLD.planes:
            d = np.minimum(d, np.abs((pts - pl.point) @ pl.normal))
        return d

    # map cleanliness: stored surf points vs true world planes
    occ = np.asarray(surf_map.count) > 0
    stored = np.asarray(surf_map.points)[occ]          # (slots, cap, 3)?
    cnt = np.asarray(surf_map.count)[occ]
    flat = []
    for row, c in zip(stored, cnt):
        flat.append(row[:int(c)])
    flat = np.concatenate(flat, 0)
    dm = world_plane_dist(flat)
    print(f"map surf pts: n={len(dm)} median={np.median(dm):.4f} "
          f"p90={np.percentile(dm, 90):.4f} p99={np.percentile(dm, 99):.4f}")

    # match frame 2 with prior perturbed by delta along x
    feats, p, R = make_scan(2)
    ts = 1.0 + 2 * T
    c_ds0 = downsample_features(feats.corner_less_sharp,
                                MCFG.line_resolution, MCFG.max_query_points)
    s_ds0 = downsample_features(feats.surf_less_flat,
                                MCFG.plane_resolution, MCFG.max_query_points)
    gt_rel = p - p_first
    guess = np_pose(gt_rel)
    for delta in ([0.0, 0.01, 0.03, -0.01, -0.03, 0.1] if DISTORT else [0.0]):
        if DISTORT:
            step = np_pose(vel_at(ts) * T + np.array([delta, 0, 0]))
            c_ds = deskew_mod.undistort_from_motion(c_ds0, step, T)
            s_ds = deskew_mod.undistort_from_motion(s_ds0, step, T)
        else:
            c_ds, s_ds = c_ds0, s_ds0
        if os.environ.get("MSF_DBG_NO_EDGES") == "1":
            c_ds = c_ds._replace(mask=jnp.zeros_like(c_ds.mask))
        dq = world_plane_dist(s_ds.transform(guess).xyz, s_ds.mask)
        res = mapping.match_scan2map(corner_map, surf_map, c_ds, s_ds,
                                     guess, MCFG)
        err = np.asarray(res.pose.t) - gt_rel
        print(f"  query surf dist: median={np.median(dq):.4f} "
              f"p90={np.percentile(dq, 90):.4f} p99={np.percentile(dq, 99):.4f}")
        gain = err[0] / delta if delta else float("nan")
        print(f"delta={delta:+.3f}: err=[{err[0]:+.4f} {err[1]:+.4f} "
              f"{err[2]:+.4f}] gain_x={gain:+.1f} ne={int(res.n_edge)} "
              f"np={int(res.n_plane)} ok={bool(res.ok)} cost={float(res.cost):.4f}")


if __name__ == "__main__":
    main()
