"""Pallas TPU kernel: fused scan-to-scan correspondence reductions.

``slam.odometry`` builds its correspondences from an exact (N, M) squared
distance matrix (_corr_d2). As XLA that matrix MATERIALIZES in HBM
(23-50 MB at HDL-64 scale) and every selection — nearest neighbor a,
ring-windowed nearest b/c, the approx_min_k candidate pass — re-reads it;
measured ~2 ms/frame at 64-ring, second-largest stage of the fused frame
(scripts/profile_fused_ablate.py).

This kernel never touches HBM with the matrix: the whole reference cloud
(M x,y,z,ring planes — <=130 KB) rides in VMEM, each grid block computes
a (Nb, M) distance tile in registers/VMEM, and ALL reductions fuse over
it in one pass:

  - a:    global (min, first-argmin) — the unrestricted nearest neighbor;
  - ring_a = ref.ring[a_idx], recovered with a lane-select reduction;
  - c:    (min, argmin) over the different-nearby-ring window
          (0 < |ring - ring_a| <= nearby_scan) — the reference's
          cross-scan-line walk (odometry_scan_matcher.cc:95-141,186-232);
  - K binned candidate minima ((min, argmin) per M/K contiguous chunk) —
    the approx_min_k-class candidate pool the plane supports select from
    (same recall character: one survivor per bin).

HBM traffic: queries in, (Nb, 1+1+K) selections out. The b-pick, plane
fits and residual gates stay XLA over the tiny (N, K) pool.

Precision: the kernel also FIXES a TPU-specific accuracy deficiency of
the XLA path — on TPU the matmul in _corr_d2's |q|^2+|r|^2-2 q.r
expansion runs in bf16 by default, injecting ~+-0.25 m^2 of distance
error at corridor ranges — enough to flip ~75% of nearest-neighbor
picks between near-equidistant surface candidates on real scans
(measured while verifying this kernel). The kernel's
direct (dx^2+dy^2+dz^2) form is exact f32.

tests/test_odo_corr.py pins the kernel (interpreter mode) against the
XLA reductions; scripts/verify_pick_rounds_tpu.py-style device check in
scripts/verify_odo_corr_tpu.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_INF = 3.0e38


def _odo_corr_kernel(q_ref, rx_ref, ry_ref, rz_ref, rring_ref,
                     a_ref, c_ref, cand_ref, d2_scratch, *,
                     K: int, nearby: float, M: int, NCH: int,
                     cache_d2: bool = True):
    """Chunked over M so VMEM temporaries stay (Nb, M/NCH) — a full
    (256, 8192) f32 tile chain blows the ~16 MB VMEM budget (the first
    draft SIGABRT'd the Mosaic compiler). Distances are computed once per
    chunk in phase A and parked in a (Nb, M) VMEM scratch for phase C
    (with Nb=64 that is 2 MB); with NCH == K each chunk IS one candidate
    bin."""
    Nb = q_ref.shape[0]
    B = M // NCH
    qx, qy, qz = q_ref[:, 0:1], q_ref[:, 1:2], q_ref[:, 2:3]
    iota = jax.lax.broadcasted_iota(jnp.int32, (Nb, B), 1)

    def local_min(d2c, ch):
        v = jnp.min(d2c, axis=1, keepdims=True)
        li = jnp.min(jnp.where(d2c <= v, iota, B), axis=1, keepdims=True)
        return v, li + ch * B, li

    # phase A: distances + global nearest (+ per-bin candidates when
    # NCH == K)
    a_d2 = jnp.full((Nb, 1), _INF, jnp.float32)
    a_idx = jnp.full((Nb, 1), M, jnp.int32)
    for ch in range(NCH):
        dx = rx_ref[0:1, ch * B:(ch + 1) * B] - qx       # (Nb, B)
        dy = ry_ref[0:1, ch * B:(ch + 1) * B] - qy
        dz = rz_ref[0:1, ch * B:(ch + 1) * B] - qz
        d2c = dx * dx + dy * dy + dz * dz
        if cache_d2:
            d2_scratch[:, ch * B:(ch + 1) * B] = d2c
        v, gi, li = local_min(d2c, ch)
        if K:
            cand_ref[:, ch:ch + 1] = v
            cand_ref[:, K + ch:K + ch + 1] = gi.astype(jnp.float32)
            # ring of the per-bin argmin (exact lane select at li) — saves
            # the consumer's 24k-element ref.ring[cand_idx] gather
            # (~174 us/round at 64-ring, xprof r5)
            rr = jnp.min(jnp.where(
                iota == li, rring_ref[0:1, ch * B:(ch + 1) * B], _INF),
                axis=1, keepdims=True)
            cand_ref[:, 2 * K + ch:2 * K + ch + 1] = rr
        # strict < keeps the earlier chunk on ties == global first-argmin
        upd = v < a_d2
        a_d2 = jnp.where(upd, v, a_d2)
        a_idx = jnp.where(upd, gi, a_idx)

    # phase B: ring of the nearest (lane-select reduction per chunk)
    ring_a = jnp.full((Nb, 1), _INF, jnp.float32)
    for ch in range(NCH):
        sel = (iota + ch * B) == a_idx
        r = jnp.min(jnp.where(sel, rring_ref[0:1, ch * B:(ch + 1) * B],
                              _INF), axis=1, keepdims=True)
        ring_a = jnp.minimum(ring_a, r)

    # phase C: nearest on a different nearby ring (cached distances)
    c_d2 = jnp.full((Nb, 1), _INF, jnp.float32)
    c_idx = jnp.full((Nb, 1), M, jnp.int32)
    for ch in range(NCH):
        ring_c = rring_ref[0:1, ch * B:(ch + 1) * B]
        dr = jnp.abs(ring_c - ring_a)
        if cache_d2:
            d2r = d2_scratch[:, ch * B:(ch + 1) * B]
        else:
            # recompute: trades 2 reads+1 write of the (Nb, M) scratch for
            # 8 VPU ops — measured A/B via scripts/bench_odo_kernel.py
            dxr = rx_ref[0:1, ch * B:(ch + 1) * B] - qx
            dyr = ry_ref[0:1, ch * B:(ch + 1) * B] - qy
            dzr = rz_ref[0:1, ch * B:(ch + 1) * B] - qz
            d2r = dxr * dxr + dyr * dyr + dzr * dzr
        d2w = jnp.where((dr > 0.0) & (dr <= nearby), d2r, _INF)
        v, gi, _ = local_min(d2w, ch)
        upd = v < c_d2
        c_d2 = jnp.where(upd, v, c_d2)
        c_idx = jnp.where(upd, gi, c_idx)

    a_ref[:, 0:1] = a_d2
    a_ref[:, 1:2] = a_idx.astype(jnp.float32)
    a_ref[:, 2:3] = ring_a
    c_ref[:, 0:1] = c_d2
    c_ref[:, 1:2] = c_idx.astype(jnp.float32)


class OdoCorr(NamedTuple):
    a_d2: Array      # (N,)
    a_idx: Array     # (N,) int32
    a_ring: Array    # (N,) int32 ring of the nearest neighbor
    c_d2: Array      # (N,) nearest different-nearby-ring
    c_idx: Array     # (N,) int32
    cand_d2: Array   # (N, K) per-bin minima (K=0 -> (N, 0))
    cand_idx: Array  # (N, K) int32
    cand_ring: Array  # (N, K) int32 ring per bin candidate


@functools.partial(jax.jit,
                   static_argnames=("K", "nearby", "nb", "interpret",
                                    "cache_d2"))
def odo_corr_pallas(q_world: Array, ref_xyz: Array, ref_mask: Array,
                    ref_ring: Array, *, K: int = 16, nearby: float = 2.5,
                    nb: int = 256, interpret: bool = None,
                    cache_d2: bool = True) -> OdoCorr:
    """Fused correspondence reductions for one query cloud against one
    reference cloud (see module docstring).

    Args:
      q_world: (N, 3) query points in the reference frame.
      ref_xyz/ref_mask/ref_ring: the reference cloud; masked points are
        pushed to a far sentinel so every window naturally excludes them.
      K: candidate bins (0 = skip the pool — the edge path).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    N = q_world.shape[0]
    pad_n = (-N) % nb
    q = jnp.pad(q_world.astype(jnp.float32), ((0, pad_n), (0, 0)))
    npad = N + pad_n
    # pad M so the K bins divide evenly (pads read as masked-far points)
    pad_m = (-ref_xyz.shape[0]) % (K * 128 if K else 128)
    rxyz = jnp.where(ref_mask[:, None], ref_xyz.astype(jnp.float32), 1e9)
    rxyz = jnp.pad(rxyz, ((0, pad_m), (0, 0)), constant_values=1e9)
    M = rxyz.shape[0]
    rx = rxyz[:, 0].reshape(1, M)
    ry = rxyz[:, 1].reshape(1, M)
    rz = rxyz[:, 2].reshape(1, M)
    # masked ref rings sit far outside every window so c never picks them
    rring = jnp.where(ref_mask, ref_ring.astype(jnp.float32), 1e6)
    rring = jnp.pad(rring, (0, pad_m),
                    constant_values=1e6).reshape(1, M)

    kc = max(K, 1)
    a, c, cand = pl.pallas_call(
        functools.partial(_odo_corr_kernel, K=K, nearby=nearby, M=M,
                          NCH=K if K else 16, cache_d2=cache_d2),
        grid=(npad // nb,),
        in_specs=[
            pl.BlockSpec((nb, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((nb, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 3 * kc), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((npad, 3), jnp.float32),
            jax.ShapeDtypeStruct((npad, 2), jnp.float32),
            jax.ShapeDtypeStruct((npad, 3 * kc), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((nb, M if cache_d2 else 8),
                                   jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(q, rx, ry, rz, rring)
    return OdoCorr(
        a_d2=a[:N, 0], a_idx=a[:N, 1].astype(jnp.int32),
        a_ring=a[:N, 2].astype(jnp.int32),
        c_d2=c[:N, 0], c_idx=c[:N, 1].astype(jnp.int32),
        cand_d2=cand[:N, :K], cand_idx=cand[:N, K:2 * K].astype(jnp.int32),
        cand_ring=cand[:N, 2 * K:3 * K].astype(jnp.int32),
    )
