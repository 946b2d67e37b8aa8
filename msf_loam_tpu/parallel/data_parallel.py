"""Data-parallel Gauss-Newton: residual blocks sharded over devices,
normal equations reduced with psum.

The "data parallelism over points/residuals" plank of SURVEY.md §2.9: the
per-correspondence work of the scan matchers (the reference's serial loops
at odometry_scan_matcher.cc:81-258) shards over the mesh ``data`` axis and
the 6x6/9x9 normal equations come back via one ``psum`` — the Hessian-block
reduction named in BASELINE.json's north star.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from msf_loam_tpu.core.se3 import Pose
from msf_loam_tpu.ops import gauss_newton as gn
from msf_loam_tpu.ops import icp_residuals as icp

Array = jax.Array


@functools.lru_cache(maxsize=64)
def _dp_gn_program(mesh: Mesh, n_iters: int, huber_delta: float):
    """Jitted DP-GN program, cached per (mesh, schedule)."""

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(), P("data", None), P("data", None),
                  P("data", None), P("data")),
        out_specs=(P(), P()),
    )
    def _run(t0, q0, pts, c, n, v):
        pose = Pose(t0, q0)

        def step(p, _):
            blocks = icp.plane_residuals(p, pts, c, n, v)
            w = gn.huber_weights(blocks, huber_delta)
            H, g, cost, n_in = gn.accumulate_normal_eqs([blocks], [w], 6)
            H = jax.lax.psum(H, "data")
            g = jax.lax.psum(g, "data")
            n_in = jax.lax.psum(n_in, "data")
            H = H + 1e-4 * jnp.diag(jnp.maximum(jnp.diag(H), 1.0))
            dx = -jnp.linalg.solve(H, g)
            dx = jnp.where(n_in >= 3, dx, 0.0)
            return p.retract(dx), None

        pose, _ = jax.lax.scan(step, pose, None, length=n_iters)
        return pose.t, pose.q

    return _run


def dp_gauss_newton_plane(mesh: Mesh, pose0: Pose, points: Array, plane_c: Array,
                          plane_n: Array, valid: Array, n_iters: int,
                          huber_delta: float = 0.1) -> Pose:
    """Distributed point-to-plane GN: correspondences sharded over 'data'.

    Every device evaluates residuals/Jacobians for its shard; H and g are
    psum'd; the 6x6 solve and retraction run replicated on all devices
    (identical results, zero extra comm).
    """
    fn = _dp_gn_program(mesh, n_iters, huber_delta)
    t, q = fn(pose0.t, pose0.q, points, plane_c, plane_n, valid)
    return Pose(t, q)
