"""Online IMU bias estimation over a window of mapped states.

The reference carries full bias machinery (15x15 preintegration Jacobians,
bias-corrected residuals, repropagation on update —
``/root/reference/src/slam/imu_fusion/integration_base.cc:36-50,155-185``)
but pins both biases to zero in every solve (the SubsetParameterization at
``mapping_scan_matcher.cc:46``). This module exercises that machinery: a
small Gauss-Newton over the last W mapped frames solving for ONE shared
(ba, bg) plus per-frame velocities, with the lidar-mapped poses held fixed
(they are cm-accurate — the same anchoring trick as the gravity/velocity
init, ``estimator.cc:56-111``).

Residuals are the preintegration factor's (r_p, r_q, r_v) rows whitened by
the 15x15 sqrt-information; the shared-bias Jacobian column is the sum of
the factor's bias_i and bias_j columns (the bias-walk rows then cancel
exactly). A weak zero-mean prior keeps the accel bias from absorbing any
residual gravity-direction error over short windows.

"Repropagation on update" happens at frame granularity for free: every
window preintegration is rebuilt from raw buffered samples with the
current bias as linearization point (imu/buffer.py + preintegration.py),
and in-window corrections ride the first-order bias Jacobians exactly like
``integration_base.cc:155-185``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from msf_loam_tpu.config import ImuConfig
from msf_loam_tpu.core.se3 import Pose
from msf_loam_tpu.imu import imu_factor as imu_factor_mod
from msf_loam_tpu.imu.preintegration import Preintegration

Array = jax.Array


class BiasSolveResult(NamedTuple):
    ba: Array          # (3,)
    bg: Array          # (3,)
    velocities: Array  # (W+1, 3) refined per-frame velocities
    cost: Array        # () final weighted cost


@functools.partial(jax.jit, static_argnames=("cfg", "n_iters"))
def solve_bias_window(poses_t: Array, poses_q: Array, vels0: Array,
                      pres: Preintegration, pair_valid: Array,
                      gravity: Array, ba0: Array, bg0: Array,
                      cfg: ImuConfig, n_iters: int = 8) -> BiasSolveResult:
    """GN solve for shared (ba, bg) + velocities over W+1 anchored frames.

    Args:
      poses_t/poses_q: (W+1, 3)/(W+1, 4) mapped poses (FIXED anchors).
      vels0: (W+1, 3) initial velocities.
      pres: stacked per-pair Preintegration pytree with leading axis W.
      pair_valid: (W,) bool — pairs with a usable IMU window.
      gravity: (3,). ba0/bg0: current estimates (warm start).
    """
    W1 = poses_t.shape[0]
    # hoisted: the whitening matrices depend only on the (fixed) windows,
    # and jacfwd through the GN scan would otherwise repeat the 15x15
    # inverse + Cholesky per pair per iteration
    sq_infos = jax.vmap(
        lambda p: imu_factor_mod.sqrt_information(p, cfg.sqrt_info_scale)
    )(pres)

    def residuals(params):
        ba, bg, vels = params

        def pair(pre, i):
            si = imu_factor_mod.ImuState(
                pose=Pose(poses_t[i], poses_q[i]), v=vels[i], ba=ba, bg=bg)
            sj = imu_factor_mod.ImuState(
                pose=Pose(poses_t[i + 1], poses_q[i + 1]), v=vels[i + 1],
                ba=ba, bg=bg)
            r, _ = imu_factor_mod.imu_factor_full(
                pre, si, sj, gravity, info_scale=cfg.sqrt_info_scale,
                sqrt_info=sq_infos[i])
            return r

        r_pairs = jax.vmap(pair, in_axes=(0, 0))(
            pres, jnp.arange(W1 - 1))                      # (W, 15)
        r_pairs = jnp.where(pair_valid[:, None], r_pairs, 0.0)
        # weak zero-mean priors (keep ba out of the gravity null space;
        # velocities tied to their lidar-tracked seeds). Whitened with the
        # same info_scale convention as the factor rows (imu_factor.cc:43)
        # so prior/data balance is sigma-meaningful.
        k = cfg.sqrt_info_scale
        r_prior = jnp.concatenate([
            (k / cfg.bias_prior_acc_sigma) * ba,
            (k / cfg.bias_prior_gyr_sigma) * bg,
            ((k / cfg.bias_vel_prior_sigma) * (vels - vels0)).reshape(-1),
        ])
        return jnp.concatenate([r_pairs.reshape(-1), r_prior])

    flat0, unravel = ravel_pytree((ba0, bg0, vels0))

    def res_flat(x):
        return residuals(unravel(x))

    def gn_step(x, _):
        r = res_flat(x)
        J = jax.jacfwd(res_flat)(x)
        H = J.T @ J
        g = J.T @ r
        H = H + 1e-6 * jnp.diag(jnp.maximum(jnp.diag(H), 1.0))
        L, low = jax.scipy.linalg.cho_factor(H, lower=True)
        dx = jax.scipy.linalg.cho_solve((L, low), g)
        dx = jnp.where(jnp.all(jnp.isfinite(dx)), dx, 0.0)
        return x - dx, jnp.sum(r * r)

    x, costs = jax.lax.scan(gn_step, flat0, None, length=n_iters)
    ba, bg, vels = unravel(x)
    # hard sanity clamps: a diverged solve must never poison the filter
    ba = jnp.clip(ba, -cfg.bias_max_acc, cfg.bias_max_acc)
    bg = jnp.clip(bg, -cfg.bias_max_gyr, cfg.bias_max_gyr)
    ok = jnp.all(jnp.isfinite(jnp.concatenate([ba, bg, vels.reshape(-1)])))
    ba = jnp.where(ok, ba, ba0)
    bg = jnp.where(ok, bg, bg0)
    vels = jnp.where(ok, vels, vels0)
    return BiasSolveResult(ba=ba, bg=bg, velocities=vels, cost=costs[-1])
