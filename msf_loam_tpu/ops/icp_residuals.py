"""Point-to-line / point-to-plane residuals with analytic Jacobians,
evaluated for ALL correspondences at once.

The batched replacement for the reference's per-correspondence Ceres cost
functions (``/root/reference/src/slam/local/scan_matching/lidar_factor.cc``):

* ``LidarEdgeFactorSE3``   (lidar_factor.cc:7-24):   r = N x (R p + t - C)
* ``LidarPlaneFactorSE3``  (lidar_factor.cc:26-44):  r = N . (R p + t - C)
* deskew variants (+velocity/gravity terms and d/dv Jacobians,
  lidar_factor.cc:46-100).

Conventions match ``core.se3.Pose.retract``: tangent is [dt, dtheta] with
q <- q * exp(dtheta), so d(R p)/dtheta = -R skew(p) — identical to the
reference's Jacobian blocks.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from msf_loam_tpu.core.se3 import Pose, quat_to_matrix, skew

Array = jax.Array


class ResidualBlocks(NamedTuple):
    """A batch of residual blocks for the GN solver.

    r: (N, R) residuals; J: (N, R, D) Jacobians wrt the D-dim state;
    valid: (N,) bool. R is the per-block residual dim (3 edge / 1 plane).
    """

    r: Array
    J: Array
    valid: Array


def edge_residuals(pose: Pose, points: Array, line_c: Array, line_n: Array,
                   valid: Array, state_dim: int = 6) -> ResidualBlocks:
    """Point-to-line: r = N x (R p + t - C), J analytic.

    Mirrors LidarEdgeFactorSE3::Evaluate (lidar_factor.cc:7-24):
      dr/dt     = skew(N)
      dr/dtheta = -skew(N) @ R @ skew(p)
    """
    R = quat_to_matrix(pose.q)
    p_w = points @ R.T + pose.t
    Nx = skew(line_n)                     # (N, 3, 3)
    r = jnp.einsum("nij,nj->ni", Nx, p_w - line_c)
    J_t = Nx
    J_th = -jnp.einsum("nij,jk,nkl->nil", Nx, R, skew(points))
    J = jnp.concatenate([J_t, J_th], axis=-1)  # (N, 3, 6)
    if state_dim > 6:
        J = jnp.pad(J, ((0, 0), (0, 0), (0, state_dim - 6)))
    return ResidualBlocks(r, J, valid)


def plane_residuals(pose: Pose, points: Array, plane_c: Array, plane_n: Array,
                    valid: Array, state_dim: int = 6) -> ResidualBlocks:
    """Point-to-plane: r = N . (R p + t - C), J analytic.

    Mirrors LidarPlaneFactorSE3::Evaluate (lidar_factor.cc:26-44).
    """
    R = quat_to_matrix(pose.q)
    p_w = points @ R.T + pose.t
    r = jnp.sum(plane_n * (p_w - plane_c), axis=-1)[:, None]  # (N, 1)
    J_t = plane_n[:, None, :]  # (N, 1, 3)
    J_th = -jnp.einsum("ni,ij,njk->nk", plane_n, R, skew(points))[:, None, :]
    J = jnp.concatenate([J_t, J_th], axis=-1)
    if state_dim > 6:
        J = jnp.pad(J, ((0, 0), (0, 0), (0, state_dim - 6)))
    return ResidualBlocks(r, J, valid)


class DeskewTerms(NamedTuple):
    """Per-point IMU deskew inputs for the tightly-coupled factors:
    delta_p/delta_q from preintegration interpolated at the point's
    rel-time, plus dt and gravity (lidar_factor.cc:46-100)."""

    delta_p: Array  # (N, 3)
    delta_q: Array  # (N, 4) wxyz
    dt: Array       # (N,)
    gravity: Array  # (3,)


def edge_residuals_deskew(pose: Pose, velocity: Array, points: Array,
                          line_c: Array, line_n: Array, valid: Array,
                          dk: DeskewTerms) -> ResidualBlocks:
    """Deskew-aware point-to-line over a 9-dim state [dt, dtheta, dv].

    r = N x (R (dq p + dp) + v dt - 0.5 G dt^2 + t - C)
    (LidarEdgeFactorDeskewSE3::Evaluate, lidar_factor.cc:46-72; the
    reference's 9-dim second block uses only its velocity rows.)
    """
    R = quat_to_matrix(pose.q)
    from msf_loam_tpu.core.se3 import quat_rotate

    p_local = quat_rotate(dk.delta_q, points) + dk.delta_p   # (N, 3)
    dt = dk.dt[:, None]
    p_w = p_local @ R.T + velocity[None, :] * dt \
        - 0.5 * dk.gravity[None, :] * dt * dt + pose.t
    Nx = skew(line_n)
    r = jnp.einsum("nij,nj->ni", Nx, p_w - line_c)
    J_t = Nx
    J_th = -jnp.einsum("nij,jk,nkl->nil", Nx, R, skew(p_local))
    J_v = Nx * dt[..., None]  # dr/dv = skew(N) * dt (lidar_factor.cc:67)
    J = jnp.concatenate([J_t, J_th, J_v], axis=-1)  # (N, 3, 9)
    return ResidualBlocks(r, J, valid)


def plane_residuals_deskew(pose: Pose, velocity: Array, points: Array,
                           plane_c: Array, plane_n: Array, valid: Array,
                           dk: DeskewTerms) -> ResidualBlocks:
    """Deskew-aware point-to-plane over [dt, dtheta, dv]
    (LidarPlaneFactorDeskewSE3::Evaluate, lidar_factor.cc:74-100)."""
    R = quat_to_matrix(pose.q)
    from msf_loam_tpu.core.se3 import quat_rotate

    p_local = quat_rotate(dk.delta_q, points) + dk.delta_p
    dt = dk.dt[:, None]
    p_w = p_local @ R.T + velocity[None, :] * dt \
        - 0.5 * dk.gravity[None, :] * dt * dt + pose.t
    r = jnp.sum(plane_n * (p_w - plane_c), axis=-1)[:, None]
    J_t = plane_n[:, None, :]
    J_th = -jnp.einsum("ni,ij,njk->nk", plane_n, R, skew(p_local))[:, None, :]
    J_v = plane_n[:, None, :] * dt[:, None, :]  # (lidar_factor.cc:95)
    J = jnp.concatenate([J_t, J_th, J_v], axis=-1)  # (N, 1, 9)
    return ResidualBlocks(r, J, valid)
