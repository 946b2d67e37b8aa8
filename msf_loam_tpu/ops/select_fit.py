"""Pallas TPU kernel: fused kNN selection + line/plane fit over gathered
candidate slabs.

The scan-to-map matcher's per-round work (the reference's 5-NN + covariance
eigenfits, mapping_scan_matcher.cc:125-220) is, on TPU, a chain of
memory-bound passes over the (N, C=8*capacity) candidate set: distance
compute, k masked mins, k-NN weight mask, weighted moments (x2 for the
two-scale plane fallback), and per-point residual checks — measured ~5
full HBM reads of the candidates per re-association round
(scripts/profile_batch.py, match = 54% of the batched frame). This kernel
performs the ENTIRE selection + fit in one pass: each grid block loads a
(Rb, C) tile of candidate coordinates into VMEM once and computes

  - top-k squared distances within the strict radius (ascending),
  - the 0/1 k-NN weight mask,
  - weighted centered second moments in QUERY-RELATIVE coordinates
    (better-conditioned than the absolute-coordinate centering of the XLA
    path: |p - q| <= cell_size vs |p| ~ trajectory extent),
  - a closed-form symmetric 3x3 eigensolve (same trigonometric method and
    ordering as ops.fitting.eigh3x3),
  - mode "line":   direction = largest eigenvector, eig-ratio gate;
  - mode "plane":  normal = smallest eigenvector, max-residual + spread
    gates (fitting.fit_planes_weighted);
  - mode "plane2": the two-scale fallback (fitting.fit_planes_two_scale_
    weighted): strict fit, else wide-radius moments fit with the
    near-neighborhood-on-plane admission check,

so HBM traffic per round is exactly one read of the candidates. Invalid
candidates are encoded positionally (coords pushed to _BIG at gather time)
instead of a separate mask plane — 25% less traffic.

Falls back to the existing XLA ops off-TPU (slam/mapping.py keeps that
path); interpret=True runs the kernel on CPU for tests.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_INF = 3.0e38     # python floats: kernels must not capture traced constants
_BIG = 1.0e9      # "invalid candidate" coordinate sentinel (BIG^2*3 < _INF)


def _eig3(sxx, syy, szz, sxy, sxz, syz):
    """Eigenvalues (descending) of symmetric 3x3, elementwise over (Rb, 1)
    scalar planes — the trigonometric method of ops.fitting.eigh3x3."""
    p1 = sxy * sxy + sxz * sxz + syz * syz
    qm = (sxx + syy + szz) / 3.0
    p2 = ((sxx - qm) ** 2 + (syy - qm) ** 2 + (szz - qm) ** 2 + 2.0 * p1)
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-30))
    b00, b11, b22 = (sxx - qm) / p, (syy - qm) / p, (szz - qm) / p
    b01, b02, b12 = sxy / p, sxz / p, syz / p
    detb = (b00 * (b11 * b22 - b12 * b12)
            - b01 * (b01 * b22 - b12 * b02)
            + b02 * (b01 * b12 - b11 * b02))
    r = jnp.clip(detb / 2.0, -1.0, 1.0)
    # Mosaic lowers no inverse trig; c = cos(acos(r)/3) is the largest
    # root of 4c^3 - 3c = r on [0.5, 1] — Newton from c=1 (f convex there,
    # monotone convergence; clamp covers the r=-1 double root).
    c = jnp.ones_like(r)
    for _ in range(8):
        c = c - (4.0 * c * c * c - 3.0 * c - r) / jnp.maximum(
            12.0 * c * c - 3.0, 1e-6)
        c = jnp.clip(c, 0.5, 1.0)
    s = jnp.sqrt(jnp.maximum(1.0 - c * c, 0.0))          # sin(acos(r)/3)
    w0 = qm + 2.0 * p * c
    w2 = qm + 2.0 * p * (-0.5 * c - 0.8660254037844386 * s)
    w1 = 3.0 * qm - w0 - w2
    # near-diagonal: eigenvalues are the sorted diagonal
    d0 = jnp.maximum(jnp.maximum(sxx, syy), szz)
    d2_ = jnp.minimum(jnp.minimum(sxx, syy), szz)
    d1 = sxx + syy + szz - d0 - d2_
    is_diag = p1 < 1e-12
    w0 = jnp.where(is_diag, d0, w0)
    w1 = jnp.where(is_diag, d1, w1)
    w2 = jnp.where(is_diag, d2_, w2)
    return w0, w1, w2


def _eigvec(sxx, syy, szz, sxy, sxz, syz, wj, wk):
    """Unit eigenvector for the remaining eigenvalue of symmetric A, via
    the dominant column of (A - wj I)(A - wk I) — fitting.eigh3x3's
    construction, elementwise. Falls back to e_x when degenerate."""
    a = [[sxx - wj, sxy, sxz],
         [sxy, syy - wj, syz],
         [sxz, syz, szz - wj]]
    b = [[sxx - wk, sxy, sxz],
         [sxy, syy - wk, syz],
         [sxz, syz, szz - wk]]
    m = [[sum(a[i][t] * b[t][j] for t in range(3)) for j in range(3)]
         for i in range(3)]
    n0 = m[0][0] ** 2 + m[1][0] ** 2 + m[2][0] ** 2
    n1 = m[0][1] ** 2 + m[1][1] ** 2 + m[2][1] ** 2
    n2 = m[0][2] ** 2 + m[1][2] ** 2 + m[2][2] ** 2
    pick0 = (n0 >= n1) & (n0 >= n2)
    pick1 = (~pick0) & (n1 >= n2)
    v = [jnp.where(pick0, m[i][0], jnp.where(pick1, m[i][1], m[i][2]))
         for i in range(3)]
    nrm2 = v[0] ** 2 + v[1] ** 2 + v[2] ** 2
    nrm = jnp.sqrt(jnp.maximum(nrm2, 1e-60))
    ok = nrm2 > 1e-40
    vx = jnp.where(ok, v[0] / nrm, 1.0)
    vy = jnp.where(ok, v[1] / nrm, 0.0)
    vz = jnp.where(ok, v[2] / nrm, 0.0)
    return vx, vy, vz


def _moments(w, dx, dy, dz, prods=None):
    """Weighted count, mean and CENTERED (unnormalized) second moments of
    query-relative candidate coordinates. Reductions along lanes (C).

    With ``prods`` (the shared raw products (xx, yy, zz, xy, xz, yz),
    already computed for the distance pass), the centered moments come
    from the raw ones algebraically (S = sum w p p^T - cnt m m^T): the
    two-scale plane mode then shares ONE product set between its strict
    and wide weightings instead of recomputing centered products per set
    (~30% of the kernel's candidate-wide passes — the r4 #2 headroom).
    Conditioning: query-relative coords are bounded by the gather radius
    (|d| <= 2 cells), so the raw-vs-centered cancellation costs well
    under 8 of 24 mantissa bits — centers/normals agree with the
    centered form to ~1e-5 (tests/test_select_fit tolerances)."""
    cnt = jnp.sum(w, axis=1, keepdims=True)
    cd = 1.0 / jnp.maximum(cnt, 1.0)
    mx = jnp.sum(w * dx, axis=1, keepdims=True) * cd
    my = jnp.sum(w * dy, axis=1, keepdims=True) * cd
    mz = jnp.sum(w * dz, axis=1, keepdims=True) * cd
    if prods is None:
        rx, ry, rz = dx - mx, dy - my, dz - mz
        sxx = jnp.sum(w * rx * rx, axis=1, keepdims=True)
        syy = jnp.sum(w * ry * ry, axis=1, keepdims=True)
        szz = jnp.sum(w * rz * rz, axis=1, keepdims=True)
        sxy = jnp.sum(w * rx * ry, axis=1, keepdims=True)
        sxz = jnp.sum(w * rx * rz, axis=1, keepdims=True)
        syz = jnp.sum(w * ry * rz, axis=1, keepdims=True)
    else:
        xx, yy, zz, xy, xz, yz = prods
        sxx = jnp.sum(w * xx, axis=1, keepdims=True) - cnt * mx * mx
        syy = jnp.sum(w * yy, axis=1, keepdims=True) - cnt * my * my
        szz = jnp.sum(w * zz, axis=1, keepdims=True) - cnt * mz * mz
        sxy = jnp.sum(w * xy, axis=1, keepdims=True) - cnt * mx * my
        sxz = jnp.sum(w * xz, axis=1, keepdims=True) - cnt * mx * mz
        syz = jnp.sum(w * yz, axis=1, keepdims=True) - cnt * my * mz
    return cnt, (mx, my, mz), (sxx, syy, szz, sxy, sxz, syz)


def _plane_fit(w, dx, dy, dz, min_count, tol, cond_frac, prods=None):
    """fit_planes_weighted in-register: (valid, center_rel, normal)."""
    cnt, (mx, my, mz), s = _moments(w, dx, dy, dz, prods)
    w0, w1, _ = _eig3(*s)
    nx, ny, nz = _eigvec(*s, w0, w1)          # smallest eigenvector
    resid = jnp.abs(nx * (dx - mx) + ny * (dy - my) + nz * (dz - mz)) * w
    maxres = jnp.max(resid, axis=1, keepdims=True)
    valid = ((cnt >= min_count) & (maxres <= tol) & (w1 > cond_frac * w0))
    return valid, (mx, my, mz), (nx, ny, nz), maxres


def _select_fit_kernel(scal_ref, q_ref, x_ref, y_ref, z_ref,
                       d2k_ref, cen_ref, nrm_ref, val_ref, *,
                       k: int, mode: str, min_count: int, min_wide: int,
                       eig_ratio: float, tol: float, cond_frac: float):
    _select_fit_core(scal_ref, q_ref, x_ref[:], y_ref[:], z_ref[:],
                     d2k_ref, cen_ref, nrm_ref, val_ref, k=k, mode=mode,
                     min_count=min_count, min_wide=min_wide,
                     eig_ratio=eig_ratio, tol=tol, cond_frac=cond_frac)


def _select_fit_kernel_rows(scal_ref, q_ref, xyz_ref,
                            d2k_ref, cen_ref, nrm_ref, val_ref, *,
                            k: int, mode: str, min_count: int, min_wide: int,
                            eig_ratio: float, tol: float, cond_frac: float):
    """Row-layout variant: candidates arrive as (Rb, 3C) rows with planar
    [x*C | y*C | z*C] packing (the grouped two-level gather's native
    output) — three 128-aligned static lane slices replace the XLA-side
    (Q,3,C)->(3,Q,C) transpose (~160 us/frame at 64-ring, xprof r5)."""
    C = xyz_ref.shape[1] // 3
    _select_fit_core(scal_ref, q_ref, xyz_ref[:, 0:C], xyz_ref[:, C:2 * C],
                     xyz_ref[:, 2 * C:3 * C],
                     d2k_ref, cen_ref, nrm_ref, val_ref, k=k, mode=mode,
                     min_count=min_count, min_wide=min_wide,
                     eig_ratio=eig_ratio, tol=tol, cond_frac=cond_frac)


def _select_fit_core(scal_ref, q_ref, x, y, z,
                     d2k_ref, cen_ref, nrm_ref, val_ref, *,
                     k: int, mode: str, min_count: int, min_wide: int,
                     eig_ratio: float, tol: float, cond_frac: float):
    r2s = scal_ref[0, 0]
    r2w = scal_ref[0, 1]
    qx, qy, qz = q_ref[:, 0:1], q_ref[:, 1:2], q_ref[:, 2:3]
    dx = x - qx                                         # (Rb, C)
    dy = y - qy
    dz = z - qz
    # MEASURED AND REJECTED (r5): sharing raw products (xx..yz) across
    # the distance pass and BOTH two-scale moment sets via the raw-moment
    # identity (_moments(prods=...)) cuts ~12 candidate-wide passes on
    # paper, but benched neutral-to-slower on device (16-ring 309.6/310.5
    # -> 295.0/305.6 across runs): six extra (Rb, C) temporaries stay
    # live across the whole kernel and the added VMEM pressure offsets
    # the saved passes. Kept as the prods= option for narrower blocks.
    prods = None
    d2 = dx * dx + dy * dy + dz * dz
    d2s = jnp.where(d2 <= r2s, d2, _INF)

    # k sequential masked mins (ascending top-k, tie semantics of
    # voxel_map.select_knn_weights: every element == the running min is
    # consumed at once)
    kidx = jax.lax.broadcasted_iota(jnp.int32, (d2s.shape[0], k), 1)
    cur = d2s
    d2k = jnp.full((d2s.shape[0], k), _INF, jnp.float32)
    v = None
    for i in range(k):
        v = jnp.min(cur, axis=1, keepdims=True)
        d2k = jnp.where(kidx == i, v, d2k)
        cur = jnp.where(cur <= v, _INF, cur)
    kth = v                                              # (Rb, 1)
    w = jnp.where((d2s <= kth) & (d2s < _INF * 0.5), 1.0, 0.0)

    if mode == "line":
        cnt, (mx, my, mz), s = _moments(w, dx, dy, dz, prods)
        w0, w1, w2 = _eig3(*s)
        nx, ny, nz = _eigvec(*s, w1, w2)                 # largest eigvec
        valid = (cnt >= min_count) & (w0 > eig_ratio * w1)
        cen = (mx, my, mz)
        nrm = (nx, ny, nz)
    elif mode == "plane":
        valid, cen, nrm, _ = _plane_fit(w, dx, dy, dz, min_count, tol,
                                        cond_frac, prods)
    else:  # plane2 — two-scale fallback
        nvalid, ncen, nnrm, _ = _plane_fit(w, dx, dy, dz, min_count, tol,
                                           cond_frac, prods)
        ww = jnp.where(d2 <= r2w, 1.0, 0.0)
        cntw, (wmx, wmy, wmz), sw = _moments(ww, dx, dy, dz, prods)
        v0, v1, _ = _eig3(*sw)
        wnx, wny, wnz = _eigvec(*sw, v0, v1)
        rr = jnp.abs(wnx * (dx - wmx) + wny * (dy - wmy) + wnz * (dz - wmz))
        res_w = jnp.max(rr * ww, axis=1, keepdims=True)
        res_n = jnp.max(rr * w, axis=1, keepdims=True)
        fb_ok = ((cntw >= min_wide) & (v1 > cond_frac * v0)
                 & (res_w <= tol) & (res_n <= tol))
        use_fb = (~nvalid) & fb_ok
        cen = tuple(jnp.where(use_fb, a, b) for a, b in zip(
            (wmx, wmy, wmz), ncen))
        nrm = tuple(jnp.where(use_fb, a, b) for a, b in zip(
            (wnx, wny, wnz), nnrm))
        valid = nvalid | use_fb

    d2k_ref[:] = d2k
    cen_ref[:, 0:1] = cen[0] + qx                        # back to world
    cen_ref[:, 1:2] = cen[1] + qy
    cen_ref[:, 2:3] = cen[2] + qz
    nrm_ref[:, 0:1] = nrm[0]
    nrm_ref[:, 1:2] = nrm[1]
    nrm_ref[:, 2:3] = nrm[2]
    val_ref[:] = valid.astype(jnp.float32)


class SelectFit(NamedTuple):
    d2: Array        # (N, k) ascending squared distances (strict radius)
    center: Array    # (N, 3) fit centroid (world frame)
    normal: Array    # (N, 3) line direction / plane normal
    valid: Array     # (N,) bool — fit passed its gates


@functools.partial(
    jax.jit, static_argnames=("k", "mode", "min_count", "min_wide",
                              "eig_ratio", "tol", "cond_frac", "rb",
                              "interpret"))
def select_fit_pallas(cand_planar: Array, query: Array, r2_strict: Array,
                      r2_wide: Array, *, k: int = 5, mode: str = "plane2",
                      min_count: int = 5, min_wide: int = 5,
                      eig_ratio: float = 3.0, tol: float = 0.2,
                      cond_frac: float = 0.05, rb: int = 256,
                      interpret: bool = None) -> SelectFit:
    """Fused selection + fit over planar candidates.

    Args:
      cand_planar: (3, N, C) f32 candidate coordinates; INVALID candidates
        must carry coords >= _BIG (see planar gather helpers).
      query: (N, 3) f32 world-frame query points.
      r2_strict / r2_wide: scalar squared radii (traced ok — SMEM operand).
      interpret: None = auto (interpreter off-TPU so CPU tests/forced-on
        configs run the same kernel code).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    rows_layout = cand_planar.ndim == 2        # (N, 3C) planar-packed rows
    if rows_layout:
        N, C3 = cand_planar.shape
        C = C3 // 3
    else:
        _, N, C = cand_planar.shape
    pad = (-N) % rb
    q = jnp.pad(query.astype(jnp.float32), ((0, pad), (0, 0)))
    if rows_layout:
        xyz = jnp.pad(cand_planar, ((0, pad), (0, 0)), constant_values=_BIG)
    else:
        x = jnp.pad(cand_planar[0], ((0, pad), (0, 0)), constant_values=_BIG)
        y = jnp.pad(cand_planar[1], ((0, pad), (0, 0)), constant_values=_BIG)
        z = jnp.pad(cand_planar[2], ((0, pad), (0, 0)), constant_values=_BIG)
    npad = N + pad
    scal = jnp.stack([jnp.asarray(r2_strict, jnp.float32),
                      jnp.asarray(r2_wide, jnp.float32)]).reshape(1, 2)

    if rows_layout:
        kern = functools.partial(_select_fit_kernel_rows, k=k, mode=mode,
                                 min_count=min_count, min_wide=min_wide,
                                 eig_ratio=eig_ratio, tol=tol,
                                 cond_frac=cond_frac)
        cand_specs = [pl.BlockSpec((rb, 3 * C), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)]
        cand_ops = (xyz,)
    else:
        kern = functools.partial(_select_fit_kernel, k=k, mode=mode,
                                 min_count=min_count, min_wide=min_wide,
                                 eig_ratio=eig_ratio, tol=tol,
                                 cond_frac=cond_frac)
        cand_specs = [pl.BlockSpec((rb, C), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)] * 3
        cand_ops = (x, y, z)

    d2k, cen, nrm, val = pl.pallas_call(
        kern,
        grid=(npad // rb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((rb, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + cand_specs,
        out_specs=[
            pl.BlockSpec((rb, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((npad, k), jnp.float32),
            jax.ShapeDtypeStruct((npad, 3), jnp.float32),
            jax.ShapeDtypeStruct((npad, 3), jnp.float32),
            jax.ShapeDtypeStruct((npad, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(scal, q, *cand_ops)
    return SelectFit(d2=d2k[:N], center=cen[:N], normal=nrm[:N],
                     valid=val[:N, 0] > 0.5)
