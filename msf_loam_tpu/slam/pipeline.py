"""The per-frame SLAM pipeline: odometry -> mapping -> map insert.

Host-side orchestration of the jitted stages, mirroring the reference's
``LaserOdometry`` (``laser_odometry.cc:69-95``) and ``LaserMapping::Run``
(``laser_mapping.cc:138-258``) including the odom->map transform
bookkeeping (``TransformAssociateToMap``/``TransformUpdate``,
``laser_mapping.h:55-61``). Where the reference pipelines odometry and
mapping across two threads with a queue, the TPU build runs them as
sequential device programs per frame (the queue becomes program order; the
real-time drop policy is handled by the caller).

The IMU-coupled paths (deskew, estimator, gravity init) are wired in via
``imu_state`` once an ``ImuBuffer`` is provided — see msf_loam_tpu/imu/.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from msf_loam_tpu.config import MsfLoamConfig
from msf_loam_tpu.core.pointcloud import PointBatch, ScanFeatures
from msf_loam_tpu.core.se3 import Pose
from msf_loam_tpu.core.timing import StageTimers
from msf_loam_tpu.ops.voxel import voxel_downsample_masked
from msf_loam_tpu.slam import mapping, odometry, voxel_map

Array = jax.Array
import functools


@functools.partial(jax.jit, static_argnames=("capacity",))
def downsample_features(pb: PointBatch, leaf: float, capacity: int) -> PointBatch:
    """Voxel-thin a feature cloud and compact to a fixed query budget
    (FilterLessFlatLessCornerFeature, laser_mapping.cc:340-364)."""
    keep = voxel_downsample_masked(pb.xyz, pb.mask, leaf)
    order = jnp.argsort(~keep, stable=True)[:capacity]
    return PointBatch(
        xyz=pb.xyz[order], rel_time=pb.rel_time[order],
        ring=pb.ring[order], mask=keep[order],
    )


@dataclasses.dataclass
class FrameResult:
    time: float
    odom_pose: Pose    # odometry-frame pose (pose_scan2world_)
    map_pose: Pose     # mapping-frame pose (pose_map_scan2world_)
    n_correspondences: float
    ok: bool


class SlamPipeline:
    """Stateful frame-by-frame SLAM driver (single trajectory)."""

    def __init__(self, config: MsfLoamConfig, timers: Optional[StageTimers] = None):
        self.cfg = config
        self.timers = timers or StageTimers()
        mc = config.mapping
        self.corner_map = voxel_map.create_map(
            mc.map_table_size, mc.map_cell_capacity, mc.map_cell_size,
            mc.line_resolution)
        self.surf_map = voxel_map.create_map(
            mc.map_table_size, mc.map_cell_capacity, mc.map_cell_size,
            mc.plane_resolution)
        self.pose_odom = Pose.identity()       # pose_scan2world_ (odometry frame)
        self.pose_curr2last = Pose.identity()  # warm start (constant velocity)
        self.pose_odom2map = Pose.identity()   # pose_odom2map_
        self.pose_map = Pose.identity()        # pose_map_scan2world_
        self.prev_scan: Optional[ScanFeatures] = None
        self.results: List[FrameResult] = []
        self.frame_idx = 0

    # ------------------------------------------------------------------
    def process_scan(self, scan: ScanFeatures) -> FrameResult:
        cfg = self.cfg
        with self.timers.stage("ODO", "scan-to-scan"):
            if self.prev_scan is None:
                odom_ok = True
                n_corr = 0.0
            else:
                out = odometry.match_scan2scan(
                    self.prev_scan, scan, self.pose_curr2last, cfg.odometry)
                odom_ok = bool(out.ok)
                n_corr = float(out.n_correspondences)
                if odom_ok:
                    self.pose_curr2last = out.pose_curr2last
                self.pose_odom = self.pose_odom.compose(self.pose_curr2last)

        with self.timers.stage("MAP", "downsample"):
            corner_ds = downsample_features(
                scan.corner_less_sharp, cfg.mapping.line_resolution,
                cfg.mapping.max_query_points)
            surf_ds = downsample_features(
                scan.surf_less_flat, cfg.mapping.plane_resolution,
                cfg.mapping.max_query_points)

        with self.timers.stage("MAP", "scan-to-map"):
            # TransformAssociateToMap (laser_mapping.h:55)
            pose_guess = self.pose_odom2map.compose(self.pose_odom)
            mres = mapping.match_scan2map(
                self.corner_map, self.surf_map, corner_ds, surf_ds,
                pose_guess, cfg.mapping)
            self.pose_map = mres.pose if bool(mres.ok) else pose_guess
            # TransformUpdate (laser_mapping.h:59)
            self.pose_odom2map = self.pose_map.compose(self.pose_odom.inverse())

        with self.timers.stage("MAP", "insert"):
            corner_w = corner_ds.transform(self.pose_map)
            surf_w = surf_ds.transform(self.pose_map)
            self.corner_map = voxel_map.insert(
                self.corner_map, corner_w.xyz, corner_w.mask)
            self.surf_map = voxel_map.insert(
                self.surf_map, surf_w.xyz, surf_w.mask)

        self.prev_scan = scan
        self.frame_idx += 1
        res = FrameResult(
            time=float(scan.time), odom_pose=self.pose_odom,
            map_pose=self.pose_map, n_correspondences=n_corr, ok=odom_ok)
        self.results.append(res)
        return res

    # ------------------------------------------------------------------
    def trajectory(self) -> np.ndarray:
        """(N, 8) array [time, t(3), q(wxyz)] of mapping-frame poses."""
        rows = []
        for r in self.results:
            rows.append(np.concatenate([
                [r.time], np.asarray(r.map_pose.t), np.asarray(r.map_pose.q)]))
        return np.asarray(rows)


def ate_rmse(est_t: np.ndarray, gt_t: np.ndarray, align: bool = True) -> float:
    """Absolute trajectory error RMSE after optional SE(3) Umeyama alignment
    (the standard KITTI/TUM ATE metric used for the BASELINE.json targets)."""
    assert est_t.shape == gt_t.shape
    if align:
        mu_e, mu_g = est_t.mean(0), gt_t.mean(0)
        E, G = est_t - mu_e, gt_t - mu_g
        W = G.T @ E
        U, _, Vt = np.linalg.svd(W)
        S = np.eye(3)
        if np.linalg.det(U @ Vt) < 0:
            S[2, 2] = -1
        R = U @ S @ Vt
        t = mu_g - R @ mu_e
        est_t = est_t @ R.T + t
    err = est_t - gt_t
    return float(np.sqrt((err ** 2).sum(axis=1).mean()))
