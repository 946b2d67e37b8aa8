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


def undistort_from_motion(pb: PointBatch, pose_c2l: Pose, frame_dt: float,
                          translation_only: bool = False) -> PointBatch:
    """Motion deskew from the scan-to-scan odometry estimate — the classic
    LOAM TransformToStart reprojection, no IMU required.

    Assuming constant velocity over the frame interval, the capture pose at
    rel-time dt is interp(identity -> pose_c2l, s) with s = dt/frame_dt, so
    the scan-start-frame point is
      p' = slerp(I, q_c2l, s) p + s t_c2l.
    The reference leaves lidar-only scans distorted (its DISTORTION flag
    is off, odometry_scan_matcher.cc); on an accelerating platform the
    residual distortion biases every mapped pose by ~0.5 v T, which the
    gravity/velocity init then misreads as a tilted gravity (measured:
    1.3 deg tilt -> 0.23 m/s^2 phantom lateral acceleration at street
    scale). Reprojecting with the odometry motion removes the bias at the
    source for both the pure-lidar and the pre-init LIO paths.

    translation_only=True skips the slerp when an IMU gyro deskew already
    removed the rotational part (pipeline pre-init path).
    """
    import jax.numpy as jnp

    s = jnp.clip(pb.rel_time / frame_dt, 0.0, 1.0)
    if translation_only:
        xyz = pb.xyz
    else:
        from msf_loam_tpu.core.se3 import quat_slerp
        ident = jnp.zeros_like(pose_c2l.q).at[0].set(1.0)
        q = quat_slerp(ident[None, :], pose_c2l.q[None, :], s[:, None])
        xyz = quat_rotate(q, pb.xyz)
    return pb._replace(xyz=xyz + s[:, None] * pose_c2l.t[None, :])


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
