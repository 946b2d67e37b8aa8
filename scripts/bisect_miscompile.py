"""Bisect the sharded-solve-under-jit miscompilation: grow the jitted
region feature by feature until the distributed Woodbury solve diverges
from its eager result.

Run: env JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= \
     XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python scripts/bisect_miscompile.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import functools

import jax
import jax.numpy as jnp
import numpy as np

from msf_loam_tpu.parallel import mesh as mesh_mod
from msf_loam_tpu.parallel.distributed_ba import distributed_woodbury_solve
from msf_loam_tpu.slam import posegraph
from scripts.repro_miscompile import build_problem


def max_err(a, b):
    return float(jnp.max(jnp.abs(a - b)))


def main():
    mesh = mesh_mod.make_mesh(n_map=1, n_data=8)
    poses0, data, loops, cfg = build_problem()
    N = poses0.t.shape[0]
    L = loops.idx_i.shape[0]
    m = 6 * L
    solver = functools.partial(distributed_woodbury_solve, mesh)

    rel_val, rel_jac, gps_val, gps_jac = posegraph._make_factor_fns(cfg)

    def assemble(poses):
        D, U, b = posegraph._assemble_chain(poses, data, cfg, N,
                                            rel_val, rel_jac, gps_val,
                                            gps_jac)
        loop_fn = lambda di, dj, pi, pj, meas: posegraph._rel_residual(
            di, dj, pi, pj, meas, cfg.rel_sigma_r, cfg.rel_sigma_t)
        loop_val = jax.vmap(loop_fn, in_axes=(0, 0, 0, 0, 0))
        loop_jac = jax.vmap(jax.jacrev(loop_fn, argnums=(0, 1)),
                            in_axes=(0, 0, 0, 0, 0))
        li = jax.tree.map(lambda a: a[loops.idx_i], poses)
        lj = jax.tree.map(lambda a: a[loops.idx_j], poses)
        zl = jnp.zeros((L, 6))
        r = loop_val(zl, zl, li, lj, loops.meas)
        (Li, Lj) = loop_jac(zl, zl, li, lj, loops.meas)
        w = posegraph._huber_w(r, cfg.huber_delta) * loops.valid
        oh_i = jax.nn.one_hot(loops.idx_i, N, dtype=jnp.float32)
        oh_j = jax.nn.one_hot(loops.idx_j, N, dtype=jnp.float32)
        wLi = Li * w[:, None, None]
        wLj = Lj * w[:, None, None]
        b = b + jnp.einsum("ln,li->ni", oh_i,
                           jnp.einsum("lri,lr->li", wLi, r))
        b = b + jnp.einsum("ln,li->ni", oh_j,
                           jnp.einsum("lri,lr->li", wLj, r))
        sq = jnp.sqrt(w)[:, None, None]
        Wi = jnp.swapaxes(Li * sq, 1, 2)
        Wj = jnp.swapaxes(Lj * sq, 1, 2)
        W = (jnp.einsum("ln,lam->nalm", oh_i, Wi)
             + jnp.einsum("ln,lam->nalm", oh_j, Wj)).reshape(N, 6, m)
        return D, U, -b, W

    # ground truth: everything eager
    D0, U0, b0, W0 = assemble(poses0)
    x_eager = solver(D0, U0, b0, W0)

    results = {}

    # A: solver alone under jit, operands precomputed
    xA = jax.jit(lambda D, U, b, W: solver(D, U, b, W))(D0, U0, b0, W0)
    results["A solver alone under jit"] = max_err(xA, x_eager)

    # B: assembly inside jit, solve inside jit
    xB = jax.jit(lambda p: solver(*assemble(p)))(poses0)
    results["B assemble+solve under jit"] = max_err(xB, x_eager)

    # C: assembly inside jit, return operands, solve eagerly
    DC, UC, bC, WC = jax.jit(assemble)(poses0)
    results["C operands via jit (D)"] = max_err(DC, D0)
    results["C operands via jit (U)"] = max_err(UC, U0)
    results["C operands via jit (b)"] = max_err(bC, b0)
    results["C operands via jit (W)"] = max_err(WC, W0)
    xC = solver(DC, UC, bC, WC)
    results["C jit-operands, eager solve"] = max_err(xC, x_eager)

    # D: solve + retract under jit
    xD = jax.jit(lambda p, D, U, b, W: p.retract(solver(D, U, b, W)))(
        poses0, D0, U0, b0, W0)
    results["D solve+retract under jit"] = max_err(xD.t,
                                                   poses0.retract(x_eager).t)

    for k, v in results.items():
        flag = "  <-- BAD" if v > 1e-3 else ""
        print(f"{k:40s} {v:.3e}{flag}")


if __name__ == "__main__":
    main()
