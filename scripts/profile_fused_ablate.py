"""Ablation profile of the fused bench frame: remove ONE stage at a time
from the exact bench.py frame_step and measure the steady-state delta.

Isolated per-stage loops (profile_stages_fused.py) under-report because
XLA hoists more out of a single-stage scan than it can out of the real
composed frame; this script attributes the REAL fused cost.

Run:  MSF_BENCH_RINGS=64 python scripts/profile_fused_ablate.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_RINGS = int(os.environ.get("MSF_BENCH_RINGS", "64"))
PTS = int(os.environ.get("MSF_BENCH_PTS", "1800"))
N_FRAMES = 30


def main():
    import jax
    import jax.numpy as jnp

    from msf_loam_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    from msf_loam_tpu.config import (FeatureConfig, MappingConfig,
                                     OdometryConfig)
    from msf_loam_tpu.core.se3 import Pose
    from msf_loam_tpu.dataio import preprocess, synthetic
    from msf_loam_tpu.ops import features as feat_mod
    from msf_loam_tpu.slam import mapping, odometry, voxel_map
    from msf_loam_tpu.slam.pipeline import downsample_features

    fcfg = FeatureConfig(max_points_per_ring=2048, max_less_flat=8192)
    mcfg = MappingConfig(map_table_size=1 << 15, map_cell_capacity=32,
                         max_query_points=4096)
    ocfg = OdometryConfig()

    world = synthetic.World.corridor(seed=0, size=14.0)
    xyz, ring = synthetic.simulate_scan(world, np.zeros(3), np.eye(3),
                                        n_rings=N_RINGS, pts_per_ring=PTS,
                                        noise=0.004)
    img = preprocess.preprocess_scan(xyz, ring, fcfg, num_rings=N_RINGS)
    print(f"platform: {jax.devices()[0].platform}  rings={N_RINGS}")

    def make_runner(skip):
        def frame_step(carry, xs):
            cmap, smap, prev_feats, pose_c2l, pose_w = carry
            feats = feat_mod.extract_features(img, jnp.float32(0.0), fcfg)
            if "odo" in skip:
                pose_w = pose_w.compose(pose_c2l)
            else:
                odo = odometry.match_scan2scan(prev_feats, feats, pose_c2l,
                                               ocfg)
                pose_c2l = odo.pose_curr2last
                pose_w = pose_w.compose(pose_c2l)
            corner_ds = downsample_features(feats.corner_less_sharp,
                                            mcfg.line_resolution,
                                            mcfg.max_query_points)
            surf_ds = downsample_features(feats.surf_less_flat,
                                          mcfg.plane_resolution,
                                          mcfg.max_query_points)
            if "m2m" in skip:
                pose = pose_w
                cost = jnp.float32(0.0)
            else:
                mres = mapping.match_scan2map(cmap, smap, corner_ds, surf_ds,
                                              pose_w, mcfg)
                pose = mres.pose
                cost = mres.cost
            if "insert" not in skip:
                cw = corner_ds.transform(pose)
                sw = surf_ds.transform(pose)
                cmap = voxel_map.insert(cmap, cw.xyz, cw.mask)
                smap = voxel_map.insert(smap, sw.xyz, sw.mask)
            if "carryfeats" in skip:
                nxt = prev_feats
            else:
                nxt = feats.strip_full()
            return (cmap, smap, nxt, pose_c2l, pose), cost

        @jax.jit
        def run(cmap, smap):
            feats0 = feat_mod.extract_features(img, jnp.float32(0.0), fcfg)
            carry = (cmap, smap, feats0.strip_full(), Pose.identity(),
                     Pose.identity())
            carry, costs = jax.lax.scan(frame_step, carry, None,
                                        length=N_FRAMES)
            # keep every stage live: fold the final carry into the output so
            # XLA cannot dead-code-eliminate ablated variants
            cmap, smap, feats, pc2l, pw = carry
            keep = (costs.sum() + cmap.count.sum() + smap.count.sum()
                    + feats.corner_less_sharp.xyz.sum() + pc2l.t.sum()
                    + pw.t.sum())
            return costs + keep

        return run

    cmap0 = voxel_map.create_map(mcfg.map_table_size, mcfg.map_cell_capacity,
                                 mcfg.map_cell_size, mcfg.line_resolution)
    smap0 = voxel_map.create_map(mcfg.map_table_size, mcfg.map_cell_capacity,
                                 mcfg.map_cell_size, mcfg.plane_resolution)

    variants = [
        ("full", ()),
        ("no odometry", ("odo",)),
        ("no scan2map", ("m2m",)),
        ("no insert", ("insert",)),
        ("no feats-carry", ("carryfeats",)),
        ("only features+ds", ("odo", "m2m", "insert")),
    ]
    base = None
    for name, skip in variants:
        run = make_runner(frozenset(skip))
        run(cmap0, smap0).block_until_ready()
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            c = run(cmap0, smap0)
        c.block_until_ready()
        ms = (time.perf_counter() - t0) / (reps * N_FRAMES) * 1e3
        if base is None:
            base = ms
        print(f"{name:<22} {ms:7.3f} ms/frame  (delta {base - ms:+7.3f})")


if __name__ == "__main__":
    main()
