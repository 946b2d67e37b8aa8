"""Distributed pose-graph bundle adjustment via Schur complement.

The BASELINE.json config-5 component: the trajectory's chain-structured
pose graph (see ``slam.posegraph``) is partitioned into contiguous segments
across the mesh ``data`` axis. Each GN iteration:

1. every device assembles its segment's block-tridiagonal system;
2. eliminates its interior poses, condensing the chain onto its two
   endpoint poses (a ``lax.scan`` Schur complement — fill-in for a chain is
   only (first, last));
3. the tiny separator system (2 poses per segment, itself block-tridiagonal)
   is all-gathered over ICI and solved identically on every device;
4. interior poses back-substitute locally in parallel.

The result is EXACT — same update as the single-device solver — with
O(N/D) sequential work per device plus an O(D)-sized replicated solve.
No reference analog (single-process, SURVEY.md §2.9); factor semantics are
gps_fusion.cc:27-97.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

Array = jax.Array


def _condense_chain(D: Array, U: Array, b: Array):
    """Eliminate interior nodes of one chain segment.

    Args:
      D: (L, 6, 6) diagonal blocks; U: (L-1, 6, 6) couplings; b: (L, 6).
    Returns:
      (S00, S0e, See, b0, be): condensed 2-node system on (first, last),
      plus per-step residues needed for back-substitution:
      (S0k_seq (L-2, 6, 6), Skk_seq (L-2, 6, 6), bk_seq (L-2, 6)).
    """
    L = D.shape[0]
    if L == 2:
        empty = 0.0 * D[:0]
        return (D[0], U[0], D[1], b[0], b[1],
                empty, empty, 0.0 * b[:0])

    def step(carry, inp):
        S00, S0k, Skk, b0, bk = carry
        D_next, U_k, b_next = inp
        # eliminate node k (coupled to 0 via S0k, to k+1 via U_k)
        Skk_inv_S0kT = jnp.linalg.solve(Skk, S0k.T)     # Skk^-1 S0k^T
        Skk_inv_Uk = jnp.linalg.solve(Skk, U_k)
        Skk_inv_bk = jnp.linalg.solve(Skk, bk)
        S00_new = S00 - S0k @ Skk_inv_S0kT
        S0k_new = -S0k @ Skk_inv_Uk
        Skk_new = D_next - U_k.T @ Skk_inv_Uk
        b0_new = b0 - S0k @ Skk_inv_bk
        bk_new = b_next - U_k.T @ Skk_inv_bk
        return (S00_new, S0k_new, Skk_new, b0_new, bk_new), (S0k, Skk, bk)

    init = (D[0], U[0], D[1], b[0], b[1])
    (S00, S0e, See, b0, be), (S0k_seq, Skk_seq, bk_seq) = jax.lax.scan(
        step, init, (D[2:], U[1:], b[2:]))
    return S00, S0e, See, b0, be, S0k_seq, Skk_seq, bk_seq


def _backsub_chain(S0k_seq: Array, Skk_seq: Array, bk_seq: Array,
                   U: Array, x0: Array, xe: Array, L: int) -> Array:
    """Recover interior nodes given endpoint solutions.

    Node k (1..L-2) satisfies (at its elimination step):
      Skk x_k = bk - S0k^T x0 - U_k x_{k+1}
    solved in reverse order (x_{L-1} = xe known).
    """
    if L == 2:
        return jnp.stack([x0, xe])

    def step(x_next, inp):
        S0k, Skk, bk, U_k = inp
        x_k = jnp.linalg.solve(Skk, bk - S0k.T @ x0 - U_k @ x_next)
        return x_k, x_k

    # elimination step i handled node i+1 with U_{i+1}; reverse over i
    _, xs = jax.lax.scan(step, xe, (S0k_seq, Skk_seq, bk_seq, U[1:]),
                         reverse=True)
    return jnp.concatenate([x0[None], xs, xe[None]], axis=0)


@functools.lru_cache(maxsize=64)
def _solve_program(mesh: Mesh, multi: bool = False):
    """Jitted distributed solve, cached per mesh (stable identity ->
    jax compile-cache hits instead of a recompile per call).

    ``multi=True`` solves m simultaneous right-hand sides B (N, 6, m) —
    the same condensation/back-substitution algebra with matrix residues
    (used by the Woodbury loop-closure correction, posegraph.py)."""
    b_spec = P("data", None, None) if multi else P("data", None)

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P("data", None, None), P("data", None, None), b_spec),
        out_specs=b_spec,
        # VMA check ON: a check_vma=False version of this program
        # MISCOMPILED silently when inlined into an enclosing lax.scan
        # (constant scan inits were typed axis-invariant while the data was
        # varying). The solvers now derive inits from their operands, so
        # the program is VMA-clean and the checker guards regressions.
    )
    def _solve(D_seg, U_seg, b_seg):
        return _sharded_solve_body(D_seg, U_seg, b_seg, multi)

    return _solve


def _sharded_solve_body(D_seg, U_seg, b_seg, multi):
    """The per-device Schur solve (runs INSIDE shard_map on the 'data'
    axis): condense the local segment, all-gather + solve the separator
    system replicated, back-substitute interiors locally."""
    # shard_map gives the local block with leading dim L
    Dl, Ul, bl = D_seg, U_seg[:-1], b_seg        # Ul: intra-segment
    U_bound = U_seg[-1]                           # to next segment
    S00, S0e, See, b0, be, S0k_seq, Skk_seq, bk_seq = _condense_chain(
        Dl, Ul, bl)

    # separator system over 2 nodes/segment: (first_s, last_s) chained
    # by condensed S0e and boundary couplings U_bound
    sep_D = jax.lax.all_gather(jnp.stack([S00, See]), "data")   # (D,2,6,6)
    sep_U1 = jax.lax.all_gather(S0e, "data")                    # (D,6,6)
    sep_Ub = jax.lax.all_gather(U_bound, "data")                # (D,6,6)
    sep_b = jax.lax.all_gather(jnp.stack([b0, be]), "data")     # (D,2,6)
    n_seg = sep_D.shape[0]
    Dg = sep_D.reshape(2 * n_seg, 6, 6)
    bg = sep_b.reshape((2 * n_seg,) + sep_b.shape[2:])
    # off-diagonals alternate: within-segment S0e, then boundary U
    # (zeros derived from gathered data so they carry its varying type)
    Ug = jnp.repeat(0.0 * sep_U1[:1], 2 * n_seg - 1, axis=0)
    Ug = Ug.at[0::2].set(sep_U1)
    Ug = Ug.at[1::2].set(sep_Ub[:-1])

    from msf_loam_tpu.slam.posegraph import (solve_block_tridiag,
                                             solve_block_tridiag_multi)
    sep_solver = solve_block_tridiag_multi if multi else solve_block_tridiag
    xg = sep_solver(Dg, Ug, bg)                   # (2D, 6[, m]) replicated

    s = jax.lax.axis_index("data")
    x0 = xg[2 * s]
    xe = xg[2 * s + 1]
    # account for the boundary coupling to neighbors in the local rhs:
    # interior back-substitution only needs x0, xe (chain structure)
    return _backsub_chain(S0k_seq, Skk_seq, bk_seq, Ul, x0, xe, Dl.shape[0])


def distributed_tridiag_solve(mesh: Mesh, D: Array, U: Array, b: Array) -> Array:
    """Exact block-tridiagonal solve with segments sharded over 'data'.

    Args:
      D: (N, 6, 6), U: (N-1, 6, 6), b: (N, 6); N divisible by n_devices,
      segment length >= 2.
    """
    N = D.shape[0]
    n_dev = mesh.shape["data"]
    L = N // n_dev
    assert L >= 2, "segments must hold at least 2 poses"
    # pad U to length N so it shards evenly; U_pad[i] couples i and i+1,
    # the segment-local slice U_pad[sL : sL+L-1] is intra-segment, and
    # U_pad[sL+L-1] is the boundary coupling to the next segment.
    U_pad = jnp.concatenate([U, jnp.zeros((1, 6, 6))], axis=0)
    return _solve_program(mesh)(D, U_pad, b)


def distributed_tridiag_solve_multi(mesh: Mesh, D: Array, U: Array,
                                    B: Array) -> Array:
    """Multi-RHS variant: B (N, 6, m) -> X (N, 6, m), exact (the Woodbury
    ``Z = T^-1 W`` solve of the distributed loop-closure pose graph)."""
    N = D.shape[0]
    n_dev = mesh.shape["data"]
    assert N // n_dev >= 2, "segments must hold at least 2 poses"
    U_pad = jnp.concatenate([U, jnp.zeros((1, 6, 6))], axis=0)
    return _solve_program(mesh, multi=True)(D, U_pad, B)


@functools.lru_cache(maxsize=64)
def _woodbury_program(mesh: Mesh):
    """Jitted distributed Woodbury solve x = (T + W W^T)^-1 b, fully inside
    ONE shard_map program.

    The combination y − Z S⁻¹ Wᵀy must NOT be assembled from separate
    shard_map results on the outside: with check_vma disabled, mixing
    sharded solver outputs with replicated operands inside an enclosing
    ``lax.scan`` miscompiles silently (observed; the VMA check exists for
    exactly this). Inside the program the cross-segment reductions are
    explicit ``psum``s, so the semantics are unambiguous:

      [y | Z] = T⁻¹ [b | W]   (one condensation, m+1 right-hand sides)
      S = I + Σ_seg W_segᵀ Z_seg   (psum -> replicated 6L x 6L)
      x_seg = y_seg − Z_seg S⁻¹ (Σ_seg W_segᵀ y_seg)
    """

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P("data", None, None), P("data", None, None),
                  P("data", None), P("data", None, None)),
        out_specs=P("data", None),
    )
    def _solve(D_seg, U_seg, b_seg, W_seg):
        B = jnp.concatenate([b_seg[..., None], W_seg], axis=-1)
        X = _sharded_solve_body(D_seg, U_seg, B, multi=True)
        y_seg, Z_seg = X[..., 0], X[..., 1:]
        m = W_seg.shape[-1]
        S = jnp.eye(m) + jax.lax.psum(
            jnp.einsum("nim,nik->mk", W_seg, Z_seg), "data")
        Wty = jax.lax.psum(jnp.einsum("nim,ni->m", W_seg, y_seg), "data")
        c = jnp.linalg.solve(S, Wty)
        return y_seg - jnp.einsum("nim,m->ni", Z_seg, c)

    return _solve


def distributed_woodbury_solve(mesh: Mesh, D: Array, U: Array, b: Array,
                               W: Array) -> Array:
    """Exact distributed solve of (tridiag(U^T, D, U) + W W^T) x = b.

    W (N, 6, m) stacks the weighted loop-closure Jacobian columns
    (slam.posegraph.optimize_with_loops_distributed)."""
    N = D.shape[0]
    n_dev = mesh.shape["data"]
    assert N // n_dev >= 2, "segments must hold at least 2 poses"
    U_pad = jnp.concatenate([U, jnp.zeros((1, 6, 6))], axis=0)
    return _woodbury_program(mesh)(D, U_pad, b, W)
