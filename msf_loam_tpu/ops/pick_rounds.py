"""Pallas TPU kernel: ALL feature pick rounds in one pass.

``ops.features._pick_rounds`` runs the reference's per-(ring,sector)
greedy feature picks (msf_loam_node.cc:251-344) as XLA rounds: each round
re-reads the (R, W) score/suppression planes from HBM, pays a TopK custom
call (~0.35 ms at 64x6x2048), and re-materializes the (R, S*T, W)
suppression broadcast. At HDL-64 scale the 9 rounds (2 sharp + 3
less-sharp + 4 flat) cost ~2.5 ms/frame — the single largest stage of the
fused pipeline (scripts/profile_features.py).

This kernel keeps the ring rows RESIDENT IN VMEM and runs every round of
all three phases back to back: per-sector top-T via iterated
masked-argmax (bit-identical tie semantics to ``lax.top_k`` — ties
surface in ascending index order), the within-round pairwise dominance
test, and the +/-neighbor_suppress gap-chain suppression update, with the
suppression mask carried in registers between phases. HBM traffic is ONE
read of the four (R, W) planes (corner score, flat score, sector id, gap
prefix) and the picks/suppression outputs.

Semantics are EXACTLY ``_pick_rounds`` composed as in
``features.extract_features`` (sharp -> less-sharp -> flat with chained
suppression); tests/test_pick_rounds.py pins bit-equality of every pick
slot and the suppression plane against the XLA path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_BIG = 1.0e18      # matches features._BIG (python float: kernels must not
                   # capture traced constants)


def _round(score, suppressed, sector_i, cb0_i, w_iota, *, S, T, nsup, W):
    """One pick round over a (Rb, W) block. Returns (new_suppressed,
    picks [list of (Rb, 1) int32 W-indices or -1, col p = s*T + t])."""
    avail0 = jnp.where(suppressed, -_BIG, score)
    fi, fv, fok, fcb = [], [], [], []
    for s in range(S):
        avail = jnp.where(sector_i == s, avail0, -_BIG)
        for _t in range(T):
            m = jnp.max(avail, axis=1, keepdims=True)            # (Rb, 1)
            is_m = avail >= m
            idx = jnp.min(jnp.where(is_m, w_iota, W), axis=1,
                          keepdims=True)                          # (Rb, 1)
            cb = jnp.min(jnp.where(w_iota == idx, cb0_i, 2 ** 30),
                         axis=1, keepdims=True)
            fi.append(idx)
            fv.append(m)
            # i1 concatenation is an invalid vreg cast in Mosaic — carry
            # validity as f32 0/1 and re-threshold after the concat
            fok.append(jnp.where(m > -_BIG * 0.5, 1.0, 0.0))
            fcb.append(cb)
            avail = jnp.where(w_iota == idx, -_BIG, avail)
    ST = S * T
    # column p = s*T + t — the (R, S, T) flattening of the XLA path
    FI = jnp.concatenate(fi, axis=1)                              # (Rb, ST)
    FV = jnp.concatenate(fv, axis=1)
    FOK = jnp.concatenate(fok, axis=1) > 0.5
    FCB = jnp.concatenate(fcb, axis=1)
    dom = jnp.zeros_like(FOK)
    for q in range(ST):
        fvq, fiq = FV[:, q:q + 1], FI[:, q:q + 1]
        fcbq, fokq = FCB[:, q:q + 1], FOK[:, q:q + 1]
        di = jnp.abs(FI - fiq)
        near = (di > 0) & (di <= nsup)
        better = (fvq > FV) | ((fvq == FV) & (fiq < FI))
        dom = dom | (near & (FCB == fcbq) & better & fokq)
    keep = FOK & ~dom
    for p in range(ST):
        kp, fip = keep[:, p:p + 1], FI[:, p:p + 1]
        fcbp = FCB[:, p:p + 1]
        hit = kp & (jnp.abs(w_iota - fip) <= nsup) & (cb0_i == fcbp)
        suppressed = suppressed | hit
    picks = [jnp.where(keep[:, p:p + 1], FI[:, p:p + 1], -1)
             for p in range(ST)]
    return suppressed, picks


def _pick_kernel(score_c_ref, score_f_ref, sector_ref, cb0_ref, sup0_ref,
                 picks_ref, sup_ref, *,
                 S, nsup, n_sharp, n_rest, rest_T, n_flat, PC, W):
    Rb = score_c_ref.shape[0]
    w_iota = jax.lax.broadcasted_iota(jnp.int32, (Rb, W), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (Rb, PC), 1)
    sector_i = sector_ref[:]
    cb0_i = cb0_ref[:]
    sc = score_c_ref[:]
    sf = score_f_ref[:]
    suppressed = sup0_ref[:] > 0

    acc = jnp.full((Rb, PC), -1, jnp.int32)
    col = 0

    def emit(acc, picks, col0, T):
        # round picks land at columns col0 + t*S + s (the (T, R, S)
        # round-major layout of the XLA path, p = s*T + t -> t*S + s)
        for p, v in enumerate(picks):
            s, t = p // T, p % T
            acc = jnp.where(lane == col0 + t * S + s, v, acc)
        return acc

    # phase 1: sharp corner picks, T=1 exact rounds
    for _ in range(n_sharp):
        suppressed, picks = _round(sc, suppressed, sector_i, cb0_i, w_iota,
                                   S=S, T=1, nsup=nsup, W=W)
        acc = emit(acc, picks, col, 1)
        col += S
    # phase 2: less-sharp bulk picks, T=rest_T rounds
    for _ in range(-(-n_rest // rest_T)):
        suppressed, picks = _round(sc, suppressed, sector_i, cb0_i, w_iota,
                                   S=S, T=rest_T, nsup=nsup, W=W)
        acc = emit(acc, picks, col, rest_T)
        col += S * rest_T
    # less_flat consumes the suppression AFTER the corner phases
    sup_ref[:] = suppressed.astype(jnp.int32)
    # phase 3: flat picks (min-curvature: score_f is already negated),
    # T=1 exact rounds, chained suppression, output suppression unused
    for _ in range(n_flat):
        suppressed, picks = _round(sf, suppressed, sector_i, cb0_i, w_iota,
                                   S=S, T=1, nsup=nsup, W=W)
        acc = emit(acc, picks, col, 1)
        col += S
    picks_ref[:] = acc


@functools.partial(
    jax.jit, static_argnames=("S", "nsup", "n_sharp", "n_rest", "rest_T",
                              "n_flat", "rb", "interpret"))
def pick_rounds_pallas(score_corner: Array, score_flat: Array,
                       sector: Array, cb0: Array, *,
                       S: int, nsup: int, n_sharp: int, n_rest: int,
                       rest_T: int, n_flat: int, rb: int = 8,
                       interpret: bool = None
                       ) -> Tuple[Array, Array, Array]:
    """All feature pick rounds fused.

    Args:
      score_corner: (R, W) f32 — gated max-curvature score (-_BIG where
        unpickable), exactly features._pick_rounds' ``score``.
      score_flat: (R, W) f32 — gated MIN-curvature score (already negated).
      sector: (R, W) int32 sector id (-1 ineligible).
      cb0: (R, W) int32 exclusive prefix count of broken gap links.

    Returns:
      corner_picks: (n_sharp + ceil(n_rest/rest_T)*rest_T, R, S) int32
      flat_picks:   (n_flat, R, S) int32
      suppressed:   (R, W) bool — after the corner phases (what the
        less-flat mask consumes in extract_features).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    R, W = score_corner.shape
    n_rest_rounds = -(-n_rest // rest_T)
    nc = n_sharp + n_rest_rounds * rest_T          # corner pick slots
    n_cols = (nc + n_flat) * S
    PC = -(-n_cols // 128) * 128                   # pad pick lanes
    pad_r = (-R) % rb
    padded = R + pad_r

    def prep(a, fill):
        return jnp.pad(a, ((0, pad_r), (0, 0)), constant_values=fill)

    sup0 = jnp.zeros((padded, W), jnp.int32)
    picks, sup = pl.pallas_call(
        functools.partial(_pick_kernel, S=S, nsup=nsup, n_sharp=n_sharp,
                          n_rest=n_rest, rest_T=rest_T, n_flat=n_flat,
                          PC=PC, W=W),
        grid=(padded // rb,),
        in_specs=[
            pl.BlockSpec((rb, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rb, PC), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((padded, PC), jnp.int32),
            jax.ShapeDtypeStruct((padded, W), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(prep(score_corner, -_BIG), prep(score_flat, -_BIG),
      prep(sector, -1), prep(cb0, 0), sup0)

    picks = picks[:R, :n_cols].reshape(R, nc + n_flat, S)
    picks = jnp.transpose(picks, (1, 0, 2))              # (NT, R, S)
    return picks[:nc], picks[nc:], sup[:R] > 0
