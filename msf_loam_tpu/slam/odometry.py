"""Scan-to-scan odometry matching (the LOAM frontend).

TPU-native redesign of ``OdometryScanMatcher::MatchScan2Scan``
(``/root/reference/src/slam/local/scan_matching/odometry_scan_matcher.cc:43-285``):
the per-point KD-tree + ring-window searches become one batched kNN
(``ops.knn``) followed by masked candidate selection, and the 2x(6-iter)
Ceres schedule becomes 2 re-association rounds around a 6-iteration batched
Gauss-Newton (``ops.gauss_newton``) — all inside one jit.

Correspondence rules mirror the reference:
* edge: nearest less-sharp point a (gate d^2 < 25), plus nearest point b on
  a DIFFERENT ring within +/-2.5 rings (odometry_scan_matcher.cc:86-141);
  factor is point-to-line through (a, normalize(a-b));
* plane: nearest less-flat point a, nearest b on the SAME ring, nearest c
  on a different nearby ring (odometry_scan_matcher.cc:172-232); factor is
  point-to-plane through the (a,b,c) triangle.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from msf_loam_tpu.config import OdometryConfig
from msf_loam_tpu.core.pointcloud import PointBatch, ScanFeatures
from msf_loam_tpu.core.se3 import Pose
from msf_loam_tpu.ops import gauss_newton as gn
from msf_loam_tpu.ops import icp_residuals as icp
from msf_loam_tpu.ops import knn as knn_ops

Array = jax.Array

_K = 8  # kNN candidates fetched per query (selection happens among these)


def _knn(q_world, q_mask, ref_xyz, ref_mask):
    """kNN backend: fused Pallas kernel on TPU, XLA blockwise elsewhere
    (scan-vs-scan scale, where fused brute force wins — see ops/pallas_knn)."""
    if jax.devices()[0].platform == "tpu":
        from msf_loam_tpu.ops.pallas_knn import knn_pallas
        return knn_pallas(q_world, ref_xyz, ref_mask, k=_K, bq=256, bm=2048)
    return knn_ops.knn(q_world, q_mask, ref_xyz, ref_mask, k=_K)


class EdgeCorrespondences(NamedTuple):
    points: Array   # (N, 3) sensor-frame query points
    line_c: Array   # (N, 3)
    line_n: Array   # (N, 3)
    valid: Array    # (N,)


class PlaneCorrespondences(NamedTuple):
    points: Array
    plane_c: Array
    plane_n: Array
    valid: Array


def find_edge_correspondences(query: PointBatch, ref: PointBatch, pose: Pose,
                              cfg: OdometryConfig) -> EdgeCorrespondences:
    q_world = pose.apply(query.xyz)
    d2, idx = _knn(q_world, query.mask, ref.masked_xyz(), ref.mask)
    cand_xyz = knn_ops.gather_neighbors(ref.xyz, idx)            # (N, K, 3)
    cand_ring = jnp.where(idx >= 0, ref.ring[jnp.maximum(idx, 0)], -1)

    a_ok = (d2[:, 0] < cfg.dist_sq_threshold) & query.mask
    ring_a = cand_ring[:, 0]

    # b: nearest candidate on a different, nearby ring
    diff_ring = (cand_ring != ring_a[:, None]) & (cand_ring >= 0)
    near_ring = jnp.abs(cand_ring - ring_a[:, None]).astype(jnp.float32) <= cfg.nearby_scan
    b_mask = diff_ring & near_ring & (d2 < cfg.dist_sq_threshold)
    b_d2 = jnp.where(b_mask, d2, jnp.inf)
    b_sel = jnp.argmin(b_d2, axis=1)
    b_ok = jnp.isfinite(jnp.min(b_d2, axis=1))
    b_xyz = jnp.take_along_axis(cand_xyz, b_sel[:, None, None], axis=1)[:, 0]

    a_xyz = cand_xyz[:, 0]
    direction = a_xyz - b_xyz
    nrm = jnp.linalg.norm(direction, axis=-1, keepdims=True)
    line_n = direction / jnp.maximum(nrm, 1e-12)
    valid = a_ok & b_ok & (nrm[:, 0] > 1e-6)
    return EdgeCorrespondences(query.xyz, a_xyz, line_n, valid)


def find_plane_correspondences(query: PointBatch, ref: PointBatch, pose: Pose,
                               cfg: OdometryConfig) -> PlaneCorrespondences:
    q_world = pose.apply(query.xyz)
    d2, idx = _knn(q_world, query.mask, ref.masked_xyz(), ref.mask)
    cand_xyz = knn_ops.gather_neighbors(ref.xyz, idx)
    cand_ring = jnp.where(idx >= 0, ref.ring[jnp.maximum(idx, 0)], -1)

    a_ok = (d2[:, 0] < cfg.dist_sq_threshold) & query.mask
    ring_a = cand_ring[:, 0]
    gate = d2 < cfg.dist_sq_threshold
    not_first = jnp.arange(_K)[None, :] > 0

    # b: same ring, not the anchor itself
    b_mask = (cand_ring == ring_a[:, None]) & not_first & gate
    b_d2 = jnp.where(b_mask, d2, jnp.inf)
    b_sel = jnp.argmin(b_d2, axis=1)
    b_ok = jnp.isfinite(jnp.min(b_d2, axis=1))
    b_xyz = jnp.take_along_axis(cand_xyz, b_sel[:, None, None], axis=1)[:, 0]

    # c: different nearby ring
    c_mask = (cand_ring != ring_a[:, None]) & (cand_ring >= 0) & gate & (
        jnp.abs(cand_ring - ring_a[:, None]).astype(jnp.float32) <= cfg.nearby_scan)
    c_d2 = jnp.where(c_mask, d2, jnp.inf)
    c_sel = jnp.argmin(c_d2, axis=1)
    c_ok = jnp.isfinite(jnp.min(c_d2, axis=1))
    c_xyz = jnp.take_along_axis(cand_xyz, c_sel[:, None, None], axis=1)[:, 0]

    a_xyz = cand_xyz[:, 0]
    center = (a_xyz + b_xyz + c_xyz) / 3.0
    nvec = jnp.cross(a_xyz - b_xyz, a_xyz - c_xyz)
    nrm = jnp.linalg.norm(nvec, axis=-1, keepdims=True)
    normal = nvec / jnp.maximum(nrm, 1e-12)
    valid = a_ok & b_ok & c_ok & (nrm[:, 0] > 1e-9)
    return PlaneCorrespondences(query.xyz, center, normal, valid)


class OdometryResult(NamedTuple):
    pose_curr2last: Pose
    n_correspondences: Array  # ()
    ok: Array                 # () bool — enough correspondences found
    cost: Array


@functools.partial(jax.jit, static_argnames=("cfg",))
def match_scan2scan(scan_last: ScanFeatures, scan_curr: ScanFeatures,
                    pose0: Pose, cfg: OdometryConfig) -> OdometryResult:
    """Estimate pose_curr2last by matching curr's sharp/flat features
    against last's less-sharp/less-flat clouds."""
    pose = pose0
    n_corr = jnp.float32(0.0)
    cost = jnp.float32(0.0)
    for _ in range(cfg.outer_rounds):
        edges = find_edge_correspondences(
            scan_curr.corner_sharp, scan_last.corner_less_sharp, pose, cfg)
        planes = find_plane_correspondences(
            scan_curr.surf_flat, scan_last.surf_less_flat, pose, cfg)
        n_corr = (jnp.sum(edges.valid.astype(jnp.float32))
                  + jnp.sum(planes.valid.astype(jnp.float32)))

        def build(p, v):
            eb = icp.edge_residuals(p, edges.points, edges.line_c, edges.line_n,
                                    edges.valid)
            pb = icp.plane_residuals(p, planes.points, planes.plane_c,
                                     planes.plane_n, planes.valid)
            return [eb, pb], [gn.huber_weights(eb, cfg.huber_delta),
                              gn.huber_weights(pb, cfg.huber_delta)]

        out = gn.gauss_newton(build, pose, jnp.zeros(3, jnp.float32),
                              n_iters=cfg.gn_iterations)
        # keep the previous estimate if this round found too few matches
        ok_round = n_corr >= cfg.min_correspondences
        pose = jax.tree.map(lambda new, old: jnp.where(ok_round, new, old),
                            out.pose, pose)
        cost = out.cost

    return OdometryResult(
        pose_curr2last=pose,
        n_correspondences=n_corr,
        ok=n_corr >= cfg.min_correspondences,
        cost=cost,
    )
