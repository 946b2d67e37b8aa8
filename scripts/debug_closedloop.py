"""Instrument the accelerating-init scenario from
tests/test_lio_pipeline.py::test_accelerating_init_gravity_with_motion_deskew:
per-frame odometry-step error vs truth, mapped-pose error, velocity,
gravity tilt (dev tool)."""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from msf_loam_tpu.config import (FeatureConfig, ImuConfig, MappingConfig,
                                 MsfLoamConfig)
from msf_loam_tpu.dataio import preprocess, synthetic
from msf_loam_tpu.ops import features
from msf_loam_tpu.slam.pipeline import SlamPipeline

FCFG = FeatureConfig(max_points_per_ring=2048, max_less_flat=4096)
WORLD = synthetic.World.corridor(seed=0, size=12.0)
G = np.array([0.0, 0.0, 9.81])
IMU_HZ = 400
FRAME_DT = 0.1

A = np.array([2.0, 0.0, 0.0])
V_0 = np.array([1.0, 0.0, 0.0])


def pose_at(t):
    return V_0 * t + 0.5 * A * t * t, np.eye(3)


def config(init_frames=6):
    return MsfLoamConfig(
        features=FCFG,
        mapping=MappingConfig(map_table_size=1 << 13, max_query_points=2048),
        imu=ImuConfig(init_frames=init_frames, warmup_msgs=10,
                      max_imu_samples=64),
    )


def run(deskew, no_skip=False):
    print(f"=== motion_deskew={deskew} no_skip={no_skip} ===")
    from msf_loam_tpu.slam import mapping as mapping_mod
    if not hasattr(mapping_mod, "_orig_msm"):
        mapping_mod._orig_msm = mapping_mod.match_scan2map

    def wrapped(cm, sm, sc, ss, pose0, mcfg):
        res = mapping_mod._orig_msm(cm, sm, sc, ss, pose0, mcfg)
        g = np.asarray(pose0.t)
        r = np.asarray(res.pose.t)
        print(f"    MAP guess=[{g[0]:8.4f} {g[1]:7.4f}] -> "
              f"sol=[{r[0]:8.4f} {r[1]:7.4f}] d={np.linalg.norm(r - g):.4f} "
              f"ne={int(res.n_edge)} np={int(res.n_plane)} "
              f"ok={bool(res.ok)} cost={float(res.cost):.5f}")
        return res

    mapping_mod.match_scan2map = wrapped
    cfg = config()
    cfg = dataclasses.replace(cfg, odometry=dataclasses.replace(
        cfg.odometry, motion_deskew=deskew))
    cfg_noskip = dataclasses.replace(cfg, odometry=dataclasses.replace(
        cfg.odometry, motion_deskew=False))
    pipe = SlamPipeline(cfg)
    if no_skip:
        pipe.cfg = cfg_noskip  # frame 0 only: disable the insert skip
    t = 0.5
    while t < 1.0 + 9 * FRAME_DT + 0.2:
        _, R = pose_at(t)
        pipe.add_imu(t, R.T @ (A + G), np.zeros(3))
        t += 1.0 / IMU_HZ
    p_first, _ = pose_at(1.0)
    prev_gt = None
    for i in range(9):
        ts = 1.0 + i * FRAME_DT
        p, R = pose_at(ts)
        xyz, ring = synthetic.simulate_scan(
            WORLD, p, R, n_rings=16, pts_per_ring=900, noise=0.004,
            seed=i, linear_vel=V_0 + A * ts, yaw_rate=0.0)
        img = preprocess.preprocess_scan(xyz, ring, FCFG, num_rings=16)
        feats = features.extract_features(img, jnp.float32(ts), FCFG)
        pipe.process_scan(feats)
        if no_skip and i == 0:
            pipe.cfg = cfg  # restore deskew config after frame 0
        gt_rel = p - p_first
        est = np.asarray(pipe.pose_map.t)
        c2l = np.asarray(pipe.pose_curr2last.t)
        true_step = (p - prev_gt) if prev_gt is not None else np.zeros(3)
        prev_gt = p
        v = np.asarray(pipe.velocity)
        g = np.asarray(pipe.gravity)
        map_pts = int(pipe.surf_map.total_points())
        print(f"f{i}: map_err={est - gt_rel} "
              f"c2l={c2l[0]:.4f} true_step={true_step[0]:.4f} "
              f"v={v[0]:6.3f} (gt {V_0[0] + A[0] * ts:5.2f}) "
              f"g=[{g[0]:7.4f} {g[1]:7.4f} {g[2]:7.3f}] "
              f"init={pipe.is_initialized} surf_map={map_pts}")
    sin = np.linalg.norm(np.cross(g, G)) / (np.linalg.norm(g) * 9.81)
    print(f"tilt sin={sin:.4f} ({np.degrees(np.arcsin(sin)):.2f} deg)")


if __name__ == "__main__":
    run(deskew=True)
    run(deskew=True, no_skip=True)
