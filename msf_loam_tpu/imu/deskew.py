"""Scan undistortion from IMU preintegration.

Vectorized analog of ``ScanUndistortionUtils::DoUndistort`` and the
per-point ``GetDeltaQP`` interpolation
(``/root/reference/src/slam/imu_fusion/scan_undistortion.cc:22-56``), plus
the post-init full deskew with velocity/gravity terms inlined in the
mapping loop (``laser_mapping.cc:197-211``).
"""

from __future__ import annotations

import jax

from msf_loam_tpu.core.pointcloud import PointBatch, ScanFeatures
from msf_loam_tpu.core.se3 import Pose, quat_conjugate, quat_rotate
from msf_loam_tpu.imu.preintegration import Preintegration, interpolate_delta
from msf_loam_tpu.ops.icp_residuals import DeskewTerms

Array = jax.Array


def deskew_terms(pre: Preintegration, rel_time: Array, gravity: Array) -> DeskewTerms:
    """Per-point (delta_p, delta_q, dt) for the tightly-coupled factors."""
    dp, dq = interpolate_delta(pre, rel_time)
    return DeskewTerms(delta_p=dp, delta_q=dq, dt=rel_time, gravity=gravity)


@jax.jit
def undistort_rotation_only(pb: PointBatch, pre: Preintegration) -> PointBatch:
    """Pre-init deskew: rotate each point by its interpolated delta_q
    (UndistortScanInternal, scan_undistortion.cc:5-18)."""
    _, dq = interpolate_delta(pre, pb.rel_time)
    return pb._replace(xyz=quat_rotate(dq, pb.xyz))


@jax.jit
def undistort_full(pb: PointBatch, pre: Preintegration, pose: Pose,
                   velocity: Array, gravity: Array) -> PointBatch:
    """Post-init deskew with velocity and gravity compensation
    (laser_mapping.cc:198-211):
      p' = dq p + R^T (v dt - 0.5 g dt^2) + dp
    """
    dp, dq = interpolate_delta(pre, pb.rel_time)
    dt = pb.rel_time[:, None]
    world_term = velocity[None, :] * dt - 0.5 * gravity[None, :] * dt * dt
    body_term = quat_rotate(quat_conjugate(pose.q), world_term)
    new_xyz = quat_rotate(dq, pb.xyz) + body_term + dp
    return pb._replace(xyz=new_xyz)


def undistort_scan_rotation_only(scan: ScanFeatures, pre: Preintegration) -> ScanFeatures:
    """Apply rotation-only deskew to all five clouds
    (ScanUndistortionUtils::DoUndistort, scan_undistortion.cc:44-56)."""
    return scan._replace(
        full=undistort_rotation_only(scan.full, pre),
        corner_sharp=undistort_rotation_only(scan.corner_sharp, pre),
        corner_less_sharp=undistort_rotation_only(scan.corner_less_sharp, pre),
        surf_flat=undistort_rotation_only(scan.surf_flat, pre),
        surf_less_flat=undistort_rotation_only(scan.surf_less_flat, pre),
    )


def undistort_scan_full(scan: ScanFeatures, pre: Preintegration, pose: Pose,
                        velocity: Array, gravity: Array) -> ScanFeatures:
    """Full deskew of all five clouds (laser_mapping.cc:206-210)."""
    f = lambda pb: undistort_full(pb, pre, pose, velocity, gravity)
    return scan._replace(
        full=f(scan.full),
        corner_sharp=f(scan.corner_sharp),
        corner_less_sharp=f(scan.corner_less_sharp),
        surf_flat=f(scan.surf_flat),
        surf_less_flat=f(scan.surf_less_flat),
    )
