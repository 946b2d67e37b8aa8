"""Decompose extract_features device time at HDL-64 scale (dev tool).

Each sub-stage is timed as its own fused on-device scan loop with a
data-dependent perturbation so XLA cannot hoist it.

Run:  MSF_BENCH_RINGS=64 python scripts/profile_features.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_RINGS = int(os.environ.get("MSF_BENCH_RINGS", "64"))
PTS = int(os.environ.get("MSF_BENCH_PTS", "1800"))
N_ITERS = 30


def main():
    import jax
    import jax.numpy as jnp

    from msf_loam_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    from msf_loam_tpu.config import FeatureConfig
    from msf_loam_tpu.dataio import preprocess, synthetic
    from msf_loam_tpu.ops import features as F
    from msf_loam_tpu.ops.voxel import voxel_downsample_compact_idx

    fcfg = FeatureConfig(max_points_per_ring=2048, max_less_flat=8192)
    world = synthetic.World.corridor(seed=0, size=14.0)
    xyz, ring = synthetic.simulate_scan(world, np.zeros(3), np.eye(3),
                                        n_rings=N_RINGS, pts_per_ring=PTS,
                                        noise=0.004)
    img = preprocess.preprocess_scan(xyz, ring, fcfg, num_rings=N_RINGS)
    print(f"platform: {jax.devices()[0].platform}  rings={N_RINGS}")

    R, W, _ = img.xyz.shape

    def timeit(name, step):
        @jax.jit
        def run(x0):
            def body(c, _):
                out = step(img.xyz + c * 1e-9)
                return out * 0.0 + c, out
            c, outs = jax.lax.scan(body, x0, None, length=N_ITERS)
            return outs.sum() + c.sum()

        run(jnp.zeros(())).block_until_ready()
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            v = run(jnp.zeros(()))
        v.block_until_ready()
        ms = (time.perf_counter() - t0) / (reps * N_ITERS) * 1e3
        print(f"{name:<34} {ms:7.3f} ms/frame")

    def prep(x):
        curv, eligible = F.compute_curvature(x, img.mask, fcfg)
        n_valid = jnp.sum(img.mask.astype(jnp.int32), axis=1)
        sector = F.assign_sectors(eligible, n_valid, fcfg)
        gap = F._gap_sq(x)
        pickable = eligible & ~F.unreliable_mask(x, img.mask, fcfg)
        return curv, eligible, sector, gap, pickable

    timeit("curvature+sector+gap+veil", lambda x: sum(
        a.sum().astype(jnp.float32) for a in prep(x)))

    def picks_only(x, which):
        curv, eligible, sector, gap, pickable = prep(x)
        # shared production helper — the profiled sub-stage uses the exact
        # (R, S, W) layout extract_features uses (advisor r2 finding)
        gate_arr = F.corner_gate_array(curv, eligible, sector, fcfg)
        corner_gate = lambda c: c > gate_arr
        acc = jnp.float32(0)
        sharp_picks, suppressed = F._pick_rounds(
            curv, pickable, sector, gap, fcfg,
            n_total=fcfg.sharp_per_sector, maximize=True,
            curv_gate=corner_gate, picks_per_round=1)
        if which == "sharp":
            return sharp_picks.sum().astype(jnp.float32)
        rest_picks, suppressed = F._pick_rounds(
            curv, pickable, sector, gap, fcfg,
            n_total=fcfg.less_sharp_per_sector - fcfg.sharp_per_sector,
            maximize=True, curv_gate=corner_gate, picks_per_round=6,
            suppressed0=suppressed)
        if which == "rest":
            return (sharp_picks.sum() + rest_picks.sum()).astype(jnp.float32)
        flat_picks, _ = F._pick_rounds(
            curv, pickable, sector, gap, fcfg,
            n_total=fcfg.flat_per_sector, maximize=False,
            curv_gate=lambda c: c < fcfg.curvature_threshold,
            picks_per_round=1, suppressed0=suppressed)
        return (sharp_picks.sum() + rest_picks.sum()
                + flat_picks.sum()).astype(jnp.float32)

    timeit("+ sharp picks (2 rounds T=1)", lambda x: picks_only(x, "sharp"))
    timeit("+ less-sharp (3 rounds T=6)", lambda x: picks_only(x, "rest"))
    timeit("+ flat picks (4 rounds T=1)", lambda x: picks_only(x, "flat"))

    def lf_compact(x):
        curv, eligible, sector, gap, pickable = prep(x)
        lf_idx, lf_valid = voxel_downsample_compact_idx(
            x.reshape(-1, 3), eligible.reshape(-1), fcfg.less_flat_leaf,
            fcfg.max_less_flat)
        return lf_idx.sum().astype(jnp.float32) + lf_valid.sum()

    timeit("lessflat compact (131k argsort)", lf_compact)

    timeit("extract_features (whole)", lambda x: jax.tree_util.tree_reduce(
        lambda a, b: a + b.sum().astype(jnp.float32),
        F.extract_features(
            type(img)(xyz=x, rel_time=img.rel_time, mask=img.mask),
            jnp.float32(0.0), fcfg),
        jnp.float32(0)))


if __name__ == "__main__":
    main()
