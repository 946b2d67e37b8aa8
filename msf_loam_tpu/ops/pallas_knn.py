"""Pallas TPU kernel: fused brute-force k-NN.

The hot correspondence-search op (the reference burns its frame budget in
KD-tree builds + per-point queries, odometry_scan_matcher.cc:57-61,
mapping_scan_matcher.cc:66-73). The XLA path (``ops.knn``) materializes
Q x chunk distance tiles in HBM between matmul and top-k; this kernel keeps
everything in VMEM: each grid step computes one (BQ x BM) distance tile on
the MXU and folds it into a running per-query top-k scratch, so HBM traffic
is just Q*3 + M*3 reads and Q*k writes — speed-of-light for the op.

Grid: (query_blocks, ref_chunks); the ref-chunk axis is innermost and
sequential, scratch persists across it (flash-attention-style online
reduction). k is compile-time static; the top-k update uses k rounds of
(min, equality-argmin, mask) — no sort, no argmin primitive.

Falls back to interpreter mode off-TPU so CPU tests run the same code.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_INF = 3.0e38  # python float: pallas kernels must not capture traced constants


def _knn_kernel(q_ref, rt_ref, rpen_ref, out_d_ref, out_i_ref,
                d_scratch, i_scratch, *, k: int, bm: int):
    j = pl.program_id(1)
    nc = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        d_scratch[:] = jnp.full_like(d_scratch, _INF)
        i_scratch[:] = jnp.full_like(i_scratch, -1)

    q = q_ref[:]                      # (BQ, 3)
    rt = rt_ref[:]                    # (3, BM) — refs pre-transposed
    rpen = rpen_ref[:]                # (1, BM) — +inf marks invalid refs
    # d2 via pure VPU broadcasting ((BQ,1) - (1,BM))^2 summed over axes;
    # a (BQ,3)@(3,BM) MXU matmul is useless at K=3 and the tiny-K path
    # miscompiles under Mosaic.
    d2 = rpen
    for ax in range(3):
        diff = q[:, ax:ax + 1] - rt[ax:ax + 1, :]
        d2 = d2 + diff * diff
    d2 = jnp.minimum(d2, _INF)

    base = j * bm
    lane = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)

    # fold the k smallest of this tile into the running top-k
    for _ in range(k):
        row_min = jnp.min(d2, axis=1, keepdims=True)            # (BQ, 1)
        is_min = d2 <= row_min                                   # ties ok
        am = jnp.min(jnp.where(is_min, lane, jnp.int32(2 ** 30)),
                     axis=1, keepdims=True)                      # (BQ, 1)
        # replace the current worst top-k slot where the tile min is better
        worst = jnp.max(d_scratch[:], axis=1, keepdims=True)
        kidx = jax.lax.broadcasted_iota(jnp.int32, d_scratch.shape, 1)
        is_worst = d_scratch[:] >= worst
        first_worst = jnp.min(jnp.where(is_worst, kidx, jnp.int32(2 ** 30)),
                              axis=1, keepdims=True)
        take = (row_min < worst)                                 # (BQ, 1)
        sel = (kidx == first_worst) & take
        d_scratch[:] = jnp.where(sel, row_min, d_scratch[:])
        i_scratch[:] = jnp.where(sel, base + am, i_scratch[:])
        # mask the consumed element out of the tile
        d2 = jnp.where(lane == am, _INF, d2)

    @pl.when(j == nc - 1)
    def _emit():
        # ascending order within the k results
        d = d_scratch[:]
        i = i_scratch[:]
        kidx2 = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
        out_d = jnp.full_like(d, _INF)
        out_i = jnp.full_like(i, -1)
        dd = d
        for slot in range(d.shape[1]):
            m = jnp.min(dd, axis=1, keepdims=True)
            is_m = dd <= m
            am2 = jnp.min(jnp.where(is_m, kidx2, jnp.int32(2 ** 30)),
                          axis=1, keepdims=True)
            val_i = jnp.sum(jnp.where(kidx2 == am2, i, 0), axis=1,
                            keepdims=True)
            out_d = jnp.where(kidx2 == slot, m, out_d)
            out_i = jnp.where(kidx2 == slot, val_i, out_i)
            dd = jnp.where(kidx2 == am2, _INF, dd)
        out_d_ref[:] = jnp.where(out_d >= _INF * 0.5, _INF, out_d)
        out_i_ref[:] = jnp.where(out_d >= _INF * 0.5, -1, out_i)


@functools.partial(jax.jit, static_argnames=("k", "bq", "bm", "interpret"))
def knn_pallas(query: Array, ref: Array, ref_mask: Array, k: int = 8,
               bq: int = 256, bm: int = 2048,
               interpret: bool = False) -> Tuple[Array, Array]:
    """Fused k-NN: (Q,3) queries vs (M,3) masked refs -> (d2, idx) (Q,k).

    Same contract as ``ops.knn.knn`` (invalid refs never returned; empty
    slots have d2=+inf, idx=-1).
    """
    Q, M = query.shape[0], ref.shape[0]
    q_pad = (-Q) % bq
    m_pad = (-M) % bm
    qp = jnp.pad(query.astype(jnp.float32), ((0, q_pad), (0, 0)))
    rp = jnp.pad(ref.astype(jnp.float32), ((0, m_pad), (0, 0)))
    mp = jnp.pad(ref_mask, (0, m_pad))
    rt = rp.T                                      # (3, Mp) lane-major refs
    rpen = jnp.where(mp, 0.0, _INF)[None, :]       # (1, Mp) invalid penalty

    nq = qp.shape[0] // bq
    nc = rp.shape[0] // bm

    out_d, out_i = pl.pallas_call(
        functools.partial(_knn_kernel, k=k, bm=bm),
        grid=(nq, nc),
        in_specs=[
            pl.BlockSpec((bq, 3), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, bm), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bq, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((qp.shape[0], k), jnp.float32),
            jax.ShapeDtypeStruct((qp.shape[0], k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, k), jnp.float32),
            pltpu.VMEM((bq, k), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qp, rt, rpen)
    return out_d[:Q], out_i[:Q]


def knn_auto(query: Array, ref: Array, ref_mask: Array, k: int = 8,
             **kw) -> Tuple[Array, Array]:
    """Pallas kernel on TPU; XLA blockwise fallback elsewhere."""
    platform = jax.devices()[0].platform
    if platform == "tpu":
        return knn_pallas(query, ref, ref_mask, k=k, **kw)
    from msf_loam_tpu.ops.knn import knn as knn_xla
    return knn_xla(query, jnp.ones(query.shape[0], bool), ref, ref_mask, k=k)
