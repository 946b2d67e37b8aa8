"""LiDAR-IMU extrinsic rotation calibration (hand-eye on SO(3)).

Batched redesign of ``InitialEXRotation::CalibrationExRotation``
(``/root/reference/src/slam/imu_fusion/initial_ex_rotation.cc:19-68``) and
the ``calib_lidar_imu`` offline tool (``calib_lidar_imu.cc:9-62``): for
frame-pair rotations (dq_lidar_k, dq_imu_k) satisfying
dq_lidar ⊗ q_ric = q_ric ⊗ dq_imu, stack the 4x4 blocks
huber_k * (L(dq_lidar_k) - R(dq_imu_k)) and take the right-singular vector
of the smallest singular value. The growing-window refinement becomes one
weighted batched solve per iteration (the Huber weights depend on the
current estimate, so iterate a couple of times like the reference's
per-frame re-entry)."""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from msf_loam_tpu.core.se3 import (quat_conjugate, quat_left, quat_multiply,
                                   quat_normalize, quat_right)

Array = jax.Array


class CalibResult(NamedTuple):
    q_ric: Array          # (4,) wxyz lidar->imu rotation
    singular_gate: Array  # () second-smallest singular value
    converged: Array      # () bool — sigma[1] > gate (initial_ex_rotation.cc:63)


def _angular_distance_deg(q1: Array, q2: Array) -> Array:
    d = quat_multiply(quat_conjugate(q1), q2)
    w = jnp.clip(jnp.abs(d[..., 0]), -1.0, 1.0)
    return jnp.degrees(2.0 * jnp.arccos(w))


@functools.partial(jax.jit, static_argnames=("iterations",))
def calibrate_extrinsic_rotation(dq_lidar: Array, dq_imu: Array, valid: Array,
                                 sigma_gate: float = 0.25,
                                 huber_deg: float = 5.0,
                                 iterations: int = 3) -> CalibResult:
    """Estimate the lidar->imu rotation from paired frame deltas.

    Args:
      dq_lidar: (N, 4) wxyz per-pair lidar rotations.
      dq_imu:   (N, 4) wxyz per-pair gyro-integrated rotations.
      valid:    (N,) bool.
    """
    L = quat_left(dq_lidar)    # (N, 4, 4)
    R = quat_right(dq_imu)
    q_ric = jnp.array([1.0, 0.0, 0.0, 0.0])
    sigma1 = jnp.float32(0.0)

    for _ in range(iterations):
        # Huber weights by angular disagreement under the current estimate
        pred = quat_multiply(quat_multiply(q_ric, dq_imu),
                             quat_conjugate(q_ric))
        ang = _angular_distance_deg(dq_lidar, pred)
        huber = jnp.where(ang > huber_deg, huber_deg / jnp.maximum(ang, 1e-9), 1.0)
        w = jnp.where(valid, huber, 0.0)

        A = (L - R) * w[:, None, None]          # (N, 4, 4)
        A2 = A.reshape(-1, 4)
        # right-singular vector of the smallest singular value
        _, s, Vt = jnp.linalg.svd(A2, full_matrices=False)
        q_ric = quat_normalize(Vt[3])
        q_ric = jnp.where(q_ric[0] < 0, -q_ric, q_ric)
        sigma1 = s[2]  # second-smallest of the 4 singular values

    n_valid = jnp.sum(valid.astype(jnp.int32))
    return CalibResult(
        q_ric=q_ric,
        singular_gate=sigma1,
        converged=(n_valid >= 10) & (sigma1 > sigma_gate),
    )


def integrate_gyro_rotation(gyr: Array, dts: Array, valid: Array) -> Array:
    """Gyro-only delta rotation over a window — the 10 ms-step integration
    in calib_lidar_imu.cc:42-47. Returns (4,) wxyz."""
    from msf_loam_tpu.core.se3 import quat_exp

    def step(q, inp):
        w, dt, ok = inp
        dq = quat_exp(w * dt)
        q2 = quat_normalize(quat_multiply(q, dq))
        return jnp.where(ok, q2, q), None

    q0 = jnp.array([1.0, 0.0, 0.0, 0.0])
    q, _ = jax.lax.scan(step, q0, (gyr, dts, valid))
    return q
