"""Scan stream validation + latency re-stamping.

Analogs of the reference's data-sanity scripts:
* ``validate_scan`` — the checks of
  ``scripts/validate_velodyne_cloud_in_bag.py:1-16`` (per-point time field
  present and in-range, ring ids in range, clockwise azimuth ordering);
* ``restamp_latency`` — ``scripts/preprocess_bag_file.py:34-46``'s 20 ms
  driver-latency simulation (shift scan timestamps to the capture end).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np


def validate_scan(xyz: np.ndarray, ring: np.ndarray,
                  rel_time: np.ndarray = None, n_rings: int = 128,
                  scan_period: float = 0.1) -> Dict[str, object]:
    """Returns {ok: bool, errors: [str]} for one scan."""
    errors: List[str] = []
    if not np.isfinite(xyz).all():
        errors.append("non-finite coordinates present")
    if ring.min(initial=0) < 0 or ring.max(initial=0) >= n_rings:
        errors.append(f"ring ids outside [0, {n_rings})")
    if rel_time is not None:
        if rel_time.min(initial=0.0) < 0:
            errors.append("negative relative time")
        if rel_time.max(initial=0.0) > 2 * scan_period:
            errors.append(f"relative time exceeds 2x scan period "
                          f"({rel_time.max():.4f})")
        # per-ring monotonicity (points are expected in firing order)
        for r in np.unique(ring):
            rt = rel_time[ring == r]
            if len(rt) > 1 and (np.diff(rt) < -1e-6).any():
                errors.append(f"ring {r}: relative time not monotonic")
                break
    # clockwise ordering: azimuth of the first few points should decrease
    # (ori = -atan2(y, x) increases), per msf_loam_node.cc:139
    if len(xyz) > 100:
        ori = -np.arctan2(xyz[:100, 1], xyz[:100, 0])
        unwrapped = np.unwrap(ori)
        if unwrapped[-1] < unwrapped[0]:
            errors.append("points not in clockwise firing order")
    return {"ok": not errors, "errors": errors}


def restamp_latency(scan_times: np.ndarray, latency: float = 0.02) -> np.ndarray:
    """Shift scan timestamps by a simulated driver latency
    (preprocess_bag_file.py:34-46 adds ~20 ms to emulate real drivers)."""
    return scan_times + latency
