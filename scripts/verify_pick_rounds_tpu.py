"""Verify the compiled Pallas pick-rounds kernel on REAL TPU against the
XLA rounds (interpret=True is not sufficient — Mosaic has miscompiled
subtly before; see CLAUDE.md). Prints PASS/FAIL per scenario.

Run (real TPU):  python scripts/verify_pick_rounds_tpu.py
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from msf_loam_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    from msf_loam_tpu.config import FeatureConfig
    from msf_loam_tpu.dataio import preprocess, synthetic
    from msf_loam_tpu.ops import features as F

    print(f"platform: {jax.devices()[0].platform}")
    world = synthetic.World.corridor(seed=0, size=12.0)
    fails = 0
    for n_rings, seed, yaw in ((16, 0, 0.3), (64, 1, 1.1), (12, 2, 0.0)):
        cfg = FeatureConfig(max_points_per_ring=2048)
        c, s = np.cos(yaw), np.sin(yaw)
        R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
        xyz, ring = synthetic.simulate_scan(
            world, np.array([1.0, 0.4, 0.0]), R, n_rings=n_rings,
            pts_per_ring=1800, noise=0.004, seed=seed)
        img = preprocess.preprocess_scan(xyz, ring, cfg, num_rings=n_rings)
        curv, eligible = F.compute_curvature(img.xyz, img.mask, cfg)
        n_valid = jnp.sum(img.mask.astype(jnp.int32), axis=1)
        sector = F.assign_sectors(eligible, n_valid, cfg)
        gap = F._gap_sq(img.xyz)
        pickable = eligible & ~F.unreliable_mask(img.xyz, img.mask, cfg)
        gate = F.corner_gate_array(curv, eligible, sector, cfg)
        args = (curv, pickable, sector, gap, gate)
        want = F.run_pick_rounds(*args, dataclasses.replace(
            cfg, fused_picks="off"))
        got = F.run_pick_rounds(*args, dataclasses.replace(
            cfg, fused_picks="on"))
        names = ("corner_picks", "flat_picks", "suppressed")
        for name, w, g in zip(names, want, got):
            w, g = np.asarray(w), np.asarray(g)
            if not np.array_equal(w, g):
                n_bad = int((w != g).sum())
                print(f"FAIL rings={n_rings} {name}: {n_bad}/{w.size} "
                      f"mismatches")
                fails += 1
            else:
                print(f"PASS rings={n_rings} {name} ({w.size} elems)")
    if fails:
        print(f"FAILED ({fails})")
        return 1
    print("ALL PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
