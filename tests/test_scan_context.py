"""Scan-context place recognition: descriptor invariances, yaw recovery,
appearance-based loop detection where proximity detection cannot work."""

import jax.numpy as jnp
import numpy as np

from msf_loam_tpu.dataio import synthetic
from msf_loam_tpu.slam import scan_context as sc

WORLD = synthetic.World.corridor(seed=0, size=14.0)


def _scan(p, yaw, seed):
    c, s = np.cos(yaw), np.sin(yaw)
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
    xyz, _ = synthetic.simulate_scan(WORLD, np.asarray(p, np.float64), R,
                                     n_rings=16, pts_per_ring=1800,
                                     noise=0.004, seed=seed)
    return jnp.asarray(xyz), jnp.ones(xyz.shape[0], bool)


def test_descriptor_matches_same_place():
    d0 = sc.compute_descriptor(*_scan([0, 0, 0], 0.0, 0))
    d1 = sc.compute_descriptor(*_scan([0, 0, 0], 0.0, 1))  # new noise draw
    dist, shift = sc.shifted_distances(d0, d1[None])
    assert float(dist[0]) < 0.02
    assert int(shift[0]) == 0


def test_descriptor_yaw_invariant_and_recovers_yaw():
    yaw_true = np.deg2rad(48.0)
    d0 = sc.compute_descriptor(*_scan([0, 0, 0], 0.0, 0))
    dy = sc.compute_descriptor(*_scan([0, 0, 0], yaw_true, 2))
    dist, _ = sc.shifted_distances(d0, dy[None])
    assert float(dist[0]) < 0.05, "rotation broke the match"

    descs = np.stack([np.asarray(d0), np.asarray(dy)])
    loops = sc.detect_loops_scan_context(descs, min_index_gap=1,
                                         max_dist=0.2)
    assert loops and loops[0][:2] == (0, 1)
    yaw_est = loops[0][2]
    # one sector = 6 degrees of quantization
    assert abs(yaw_est - yaw_true) < np.deg2rad(9.0), np.rad2deg(yaw_est)


def test_descriptor_separates_places():
    d0 = sc.compute_descriptor(*_scan([0, 0, 0], 0.0, 0))
    dfar = sc.compute_descriptor(*_scan([4, 2, 0], 0.0, 3))
    dist, _ = sc.shifted_distances(d0, dfar[None])
    assert float(dist[0]) > 0.3


def test_detect_survives_arbitrary_drift():
    """The killer case for proximity detection: the revisit's ESTIMATED
    position is far from the original (drift), but appearance matches."""
    n = 12
    descs = []
    for i in range(n):
        # frames 0..10 march down the corridor; frame 11 revisits frame 0's
        # place with a 90-degree heading change
        if i < n - 1:
            p, yaw, seed = [0.6 * i, 0.0, 0.0], 0.0, i
        else:
            p, yaw, seed = [0.0, 0.0, 0.0], np.pi / 2, 100
        descs.append(np.asarray(sc.compute_descriptor(*_scan(p, yaw, seed))))
    loops = sc.detect_loops_scan_context(np.stack(descs), min_index_gap=8,
                                         max_dist=0.2, max_loops=2)
    assert any(i == 0 and j == n - 1 for i, j, _ in loops), loops
    hit = [l for l in loops if l[0] == 0 and l[1] == n - 1][0]
    assert abs(hit[2] - np.pi / 2) < np.deg2rad(9.0)

    # ring-key prescreen: exact same detections with a wide budget, and
    # the revisit survives a tight budget (ring keys are yaw-invariant)
    wide = sc.detect_loops_scan_context(np.stack(descs), min_index_gap=8,
                                        max_dist=0.2, max_loops=2,
                                        prescreen=n - 1)
    assert wide == loops
    tight = sc.detect_loops_scan_context(np.stack(descs), min_index_gap=8,
                                         max_dist=0.2, max_loops=2,
                                         prescreen=3)
    assert any(i == 0 and j == n - 1 for i, j, _ in tight), tight


def test_prescreen_budget_spent_on_admissible_pairs():
    """Temporally adjacent keyframes have near-identical ring keys; without
    masking |i-j| < min_index_gap before top_k they eat the whole candidate
    budget and a genuine revisit is silently prescreened out. With the mask
    even a budget of 1 per query must keep the revisit."""
    n = 30
    descs = []
    for i in range(n):
        if i < n - 1:
            p, yaw, seed = [0.25 * i, 0.0, 0.0], 0.0, i  # dense, slow march
        else:
            p, yaw, seed = [0.0, 0.0, 0.0], 0.0, 200     # revisit frame 0
        descs.append(np.asarray(sc.compute_descriptor(*_scan(p, yaw, seed))))
    loops = sc.detect_loops_scan_context(np.stack(descs), min_index_gap=20,
                                         max_dist=0.2, max_loops=2,
                                         prescreen=1)
    assert any(j == n - 1 for _, j, _ in loops), loops
