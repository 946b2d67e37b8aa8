"""Loop closure — deliberate stub, mirroring the reference.

The reference ships an EMPTY loop-closure module: ``SparsePoseGraph`` is a
ctor/dtor-only stub (``/root/reference/src/slam/loop_closure/
sparse_pose_graph.{h,cc}``) and scan-context loop closure is a README TODO
(README.md:70-73). Its ``PoseGraphEdgeFactor`` is a RelativePoseFactor with
an identity base (pose_graph_factor.h:10-19) — which our
``slam.posegraph.RelativePoseFactor`` residual already implements (a loop
edge is a relative-pose constraint between non-consecutive keyframes).

This module keeps the same surface so a future detector can slot in:
``SparsePoseGraph.add_edge`` collects loop constraints; extending the
block-tridiagonal solver to general sparse edges (e.g. via preconditioned
CG on the same factor machinery) is the designated follow-up.
"""

from __future__ import annotations

import dataclasses
from typing import List

import numpy as np


@dataclasses.dataclass
class LoopEdge:
    frame_i: int
    frame_j: int
    rel_t: np.ndarray   # (3,) measured translation i->j
    rel_q: np.ndarray   # (4,) wxyz measured rotation i->j
    sigma_r: float = 0.01
    sigma_t: float = 0.1


class SparsePoseGraph:
    """Stub (parity with sparse_pose_graph.h:8-13): collects loop edges;
    optimization over non-chain edges is not yet implemented — exactly the
    reference's state."""

    def __init__(self) -> None:
        self.edges: List[LoopEdge] = []

    def add_edge(self, edge: LoopEdge) -> None:
        self.edges.append(edge)

    def optimize(self) -> None:  # pragma: no cover - stub
        raise NotImplementedError(
            "loop-closure optimization is a stub in the reference "
            "(sparse_pose_graph.cc) and in this build; loop edges are "
            "collected but not yet folded into the trajectory")
