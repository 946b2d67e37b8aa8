"""Host-side scan ingestion: invalid-point removal, per-point relative time,
ring grouping into fixed-shape RingImages.

Numpy re-design of the reference's ingest passes
(``RemoveInvalidPointsFromCloud`` msf_loam_node.cc:85-111,
``ComputeRelaTimeForEachPoint`` msf_loam_node.cc:128-156, ring concatenation
msf_loam_node.cc:176-195). Runs on host because it is I/O-adjacent and
shape-changing; the output feeds the jitted device pipeline.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from msf_loam_tpu.config import FeatureConfig
from msf_loam_tpu.core.pointcloud import RingImage


def remove_invalid_points(xyz: np.ndarray, min_range: float,
                          extra: Optional[Tuple[np.ndarray, ...]] = None):
    """Drop non-finite points and points closer than min_range
    (msf_loam_node.cc:96-103)."""
    finite = np.isfinite(xyz).all(axis=1)
    rng = np.linalg.norm(xyz, axis=1) >= min_range
    keep = finite & rng
    if extra is None:
        return xyz[keep]
    return (xyz[keep],) + tuple(a[keep] for a in extra)


def compute_relative_time(xyz: np.ndarray, ring: np.ndarray,
                          scan_period: float = 0.1,
                          margin: float = np.pi / 12) -> np.ndarray:
    """Per-point relative time from azimuth unwrap (msf_loam_node.cc:128-156).

    Rings rotate clockwise; ori = -atan2(y, x); angle relative to the first
    point of the scan, then unwrapped per ring in array (= emission) order.

    Noise robustness matters more than it looks: position noise jitters the
    azimuth of points in the first column to just BEFORE ``start_ori``. A
    plain ``mod 2pi`` maps those to ~2pi, and a running-max unwrap then
    shifts the ENTIRE rest of that ring by +2pi — half the rings end up with
    rel_time off by a full scan period, which poisons any deskew consumer
    (measured: median rel_time 0.116 on a 0.1 s scan, 15% of mapping
    residuals >5 cm on a perfectly deskewed cloud). Two defenses:

    * the mod window is shifted by ``margin`` so near-start jitter lands at
      ~0 (slightly negative, clamped) instead of ~2pi;
    * a wrap is only declared on a genuine ~2pi azimuth drop
      (run_max - rel > pi), and is sticky for the rest of the ring. Points
      genuinely captured in the last ``margin`` of the sweep land negative
      too, but their array position (end of ring) puts them after the
      running max, so the drop test restores them to ~2pi correctly.
    """
    if len(xyz) == 0:
        return np.zeros((0,), np.float32)
    start_ori = -np.arctan2(xyz[0, 1], xyz[0, 0])
    ori = -np.arctan2(xyz[:, 1], xyz[:, 0])
    rel = np.mod(ori - start_ori + margin, 2 * np.pi) - margin
    out = rel.copy()
    for r in np.unique(ring):
        sel = ring == r
        rr = rel[sel]
        run_max_before = np.concatenate([[-np.inf], np.maximum.accumulate(rr)[:-1]])
        wrapped = np.maximum.accumulate((run_max_before - rr) > np.pi)
        out[sel] = rr + 2 * np.pi * wrapped
    out = np.maximum(out, 0.0)
    return (out / (2 * np.pi) * scan_period).astype(np.float32)


def build_ring_image(xyz: np.ndarray, ring: np.ndarray, rel_time: np.ndarray,
                     num_rings: int, width: int) -> RingImage:
    """Group points by ring (order-preserving, like the per-ring push_back at
    msf_loam_node.cc:154) into a front-packed (R, W) image."""
    import jax.numpy as jnp

    out_xyz = np.zeros((num_rings, width, 3), np.float32)
    out_t = np.zeros((num_rings, width), np.float32)
    out_m = np.zeros((num_rings, width), bool)
    for r in range(num_rings):
        sel = np.flatnonzero(ring == r)[:width]
        k = len(sel)
        out_xyz[r, :k] = xyz[sel]
        out_t[r, :k] = rel_time[sel]
        out_m[r, :k] = True
    return RingImage(jnp.asarray(out_xyz), jnp.asarray(out_t), jnp.asarray(out_m))


def preprocess_scan(xyz: np.ndarray, ring: np.ndarray, cfg: FeatureConfig,
                    num_rings: int, rel_time: Optional[np.ndarray] = None) -> RingImage:
    """Full host ingest: invalid removal -> rel time -> ring image."""
    xyz, ring = remove_invalid_points(xyz, cfg.min_range, (ring,))
    if rel_time is None:
        rel_time = compute_relative_time(xyz, ring, cfg.scan_period)
    return build_ring_image(xyz, ring, rel_time, num_rings, cfg.max_points_per_ring)


def infer_rings_from_elevation(xyz: np.ndarray, num_rings: int = 64,
                               fov_up: float = 2.0, fov_down: float = -24.8) -> np.ndarray:
    """Ring index from elevation angle for datasets without a ring field
    (KITTI HDL-64E: +2 .. -24.8 degrees). Mirrors what the reference's
    `kitti_helper` leaves as a TODO (kitti_helper.cc:152)."""
    d = np.linalg.norm(xyz[:, :2], axis=1)
    elev = np.degrees(np.arctan2(xyz[:, 2], d))
    frac = (fov_up - elev) / (fov_up - fov_down)
    ring = np.clip(np.round(frac * (num_rings - 1)), 0, num_rings - 1)
    return ring.astype(np.int32)
