"""Loop closure: proximity detection + exact loop-factor optimization.

The reference ships an EMPTY loop-closure module: ``SparsePoseGraph`` is a
ctor/dtor-only stub (``/root/reference/src/slam/loop_closure/
sparse_pose_graph.{h,cc}``) and scan-context loop closure is a README TODO
(README.md:70-73). Its ``PoseGraphEdgeFactor`` is a RelativePoseFactor with
an identity base (pose_graph_factor.h:10-19).

This build goes past the stub and closes the loop for real:

* detection — keyframe position proximity with an index-gap guard and
  non-max suppression (host-side numpy; runs once per optimization, not in
  the hot path);
* relative-pose measurement — the existing batched scan-to-scan GN matcher
  re-targeted at the detected keyframe pair (``slam.odometry``), seeded by
  the current trajectory estimate;
* optimization — ``posegraph.optimize_with_loops``: the loop edges enter
  the chain Gauss-Newton as rank-6 Woodbury corrections to the
  block-Thomas solve, so the result is EXACT (no approximation over the
  stub's intended Ceres sparse solve) and stays one fused XLA program.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np

import jax.numpy as jnp

from msf_loam_tpu.config import MsfLoamConfig, PoseGraphConfig
from msf_loam_tpu.core.se3 import Pose
from msf_loam_tpu.slam import posegraph


@dataclasses.dataclass
class LoopEdge:
    frame_i: int
    frame_j: int
    rel_t: np.ndarray   # (3,) measured translation i->j
    rel_q: np.ndarray   # (4,) wxyz measured rotation i->j
    sigma_r: float = 0.01
    sigma_t: float = 0.1


def detect_loops(positions: np.ndarray, max_dist: float = 3.0,
                 min_index_gap: int = 20, max_loops: int = 8,
                 suppress_gap: int = 10) -> List[Tuple[int, int]]:
    """Proximity loop candidates: pairs (i, j) with ``j - i >= min_index_gap``
    and ``||p_i - p_j|| < max_dist``, greedily picked closest-first with
    non-max suppression so one revisit contributes one edge.

    positions: (N, 3) trajectory estimate (drifted is fine — max_dist
    bounds the detectable drift, like any radius-based place recognition).
    """
    pos = np.asarray(positions, np.float64)
    n = pos.shape[0]
    if n < min_index_gap + 2:
        return []
    d = np.linalg.norm(pos[:, None, :] - pos[None, :, :], axis=-1)
    ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    cand = (jj - ii >= min_index_gap) & (d < max_dist)
    order = np.argsort(d[cand])
    ci, cj = ii[cand][order], jj[cand][order]
    picked: List[Tuple[int, int]] = []
    for i, j in zip(ci, cj):
        if len(picked) >= max_loops:
            break
        if any(abs(i - pi) < suppress_gap and abs(j - pj) < suppress_gap
               for pi, pj in picked):
            continue
        picked.append((int(i), int(j)))
    return picked


def match_loop_pair(feats_i, feats_j, pose_i: Pose, pose_j: Pose,
                    cfg: MsfLoamConfig, guess: Optional[Pose] = None):
    """Measure the relative pose i->j by scan-matching keyframe j's features
    against keyframe i's, seeded with the current estimate.

    Returns (rel_pose i->j, ok). Reuses the odometry matcher — a loop edge
    is the same edge/plane alignment problem as a scan-to-scan step, just
    between distant frames (so the seed comes from the trajectory, not
    constant velocity). ``guess`` overrides the trajectory-derived seed —
    scan-context detection passes its appearance-based yaw here, which
    stays valid under arbitrary drift."""
    from msf_loam_tpu.slam import odometry

    if guess is None:
        # match_scan2scan estimates curr(j)-to-last(i): p_i = T · p_j
        guess = pose_i.inverse().compose(pose_j)
    result = odometry.match_scan2scan(feats_i, feats_j, guess, cfg.odometry)
    return result.pose_curr2last, result.ok


def match_loop_pair_submap(neighbors, feats_j, guess: Pose,
                           cfg: MsfLoamConfig,
                           table_size: int = 1 << 12,
                           cell_capacity: int = 16):
    """Measure the loop relative pose by registering keyframe j against a
    SUBMAP built from keyframe i and its neighbors (expressed in i's
    frame) — the scan-to-map machinery re-targeted at a local window, for
    edges tighter than single-scan matching when the revisit viewpoint
    differs.

    neighbors: list of (ScanFeatures, Pose) where the pose maps that
    keyframe's sensor frame into keyframe i's frame ((identity for i
    itself). Returns (rel pose i->j, ok)."""
    from msf_loam_tpu.slam import mapping, voxel_map
    from msf_loam_tpu.slam.pipeline import downsample_features

    mc = cfg.mapping
    cmap = voxel_map.create_map(table_size, cell_capacity, mc.map_cell_size,
                                mc.line_resolution)
    smap = voxel_map.create_map(table_size, cell_capacity, mc.map_cell_size,
                                mc.plane_resolution)
    for feats, rel in neighbors:
        cw = feats.corner_less_sharp.transform(rel)
        sw = feats.surf_less_flat.transform(rel)
        cmap = voxel_map.insert(cmap, cw.xyz, cw.mask)
        smap = voxel_map.insert(smap, sw.xyz, sw.mask)
    corner_ds = downsample_features(feats_j.corner_less_sharp,
                                    mc.line_resolution,
                                    mc.corner_query_points)
    surf_ds = downsample_features(feats_j.surf_less_flat,
                                  mc.plane_resolution, mc.max_query_points)
    res = mapping.match_scan2map(cmap, smap, corner_ds, surf_ds, guess, mc)
    return res.pose, res.ok


class SparsePoseGraph:
    """Keyframe pose graph with loop edges — the working version of the
    reference's stub (sparse_pose_graph.h:8-13): ``add_edge`` collects loop
    constraints; ``optimize`` folds them into the trajectory exactly."""

    def __init__(self, pad_loops: int = 8) -> None:
        self.edges: List[LoopEdge] = []
        self.pad_loops = pad_loops

    def add_edge(self, edge: LoopEdge) -> None:
        self.edges.append(edge)

    def optimize(self, poses: Pose, data: posegraph.PoseGraphData,
                 cfg: Optional[PoseGraphConfig] = None,
                 n_iters: int = 10) -> posegraph.PoseGraphResult:
        """Chain + GPS + collected loop edges, exact Woodbury GN solve."""
        cfg = cfg or PoseGraphConfig()
        n_pad = max(self.pad_loops, len(self.edges))
        if self.edges:
            meas = Pose(
                t=jnp.asarray(np.stack([e.rel_t for e in self.edges]),
                              jnp.float32),
                q=jnp.asarray(np.stack([e.rel_q for e in self.edges]),
                              jnp.float32))
            loops = posegraph.LoopFactors.pad(
                np.asarray([e.frame_i for e in self.edges], np.int32),
                np.asarray([e.frame_j for e in self.edges], np.int32),
                meas, to_l=n_pad)
        else:
            loops = posegraph.LoopFactors.pad(
                np.zeros(0, np.int32), np.zeros(0, np.int32),
                Pose(t=jnp.zeros((0, 3)), q=jnp.zeros((0, 4))), to_l=n_pad)
        return posegraph.optimize_with_loops(poses, data, loops, cfg,
                                             n_iters=n_iters)
