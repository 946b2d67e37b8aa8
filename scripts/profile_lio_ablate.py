"""Ablation profile of the fused LIO frame (bench.run_lio_mode's exact
program): remove ONE sub-stage at a time and measure the steady-state
delta — where do the ~5.8 ms/frame between lidar-only (241 scans/s) and
tightly-coupled LIO (101 scans/s) go?

Run (real TPU):  python scripts/profile_lio_ablate.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_FRAMES = 30


def main():
    import jax
    import jax.numpy as jnp

    from msf_loam_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    import bench as bench_mod
    from msf_loam_tpu.config import (FeatureConfig, ImuConfig, MappingConfig,
                                     MsfLoamConfig)
    from msf_loam_tpu.core.se3 import Pose
    from msf_loam_tpu.ops import features as feat_mod
    from msf_loam_tpu.slam import voxel_map
    from msf_loam_tpu.slam.pipeline import lio_frame_core

    n_rings = int(os.environ.get("MSF_BENCH_RINGS", "16"))
    base_cfg = MsfLoamConfig(
        features=FeatureConfig(max_points_per_ring=2048, max_less_flat=8192),
        mapping=MappingConfig(map_table_size=1 << 15, map_cell_capacity=32,
                              max_query_points=4096,
                              max_corner_query_points=1024),
        imu=ImuConfig(tight_coupling=True))
    _, _, _, imgs = bench_mod.build_inputs(n_rings, 1800, N_FRAMES + 1)
    print(f"platform: {jax.devices()[0].platform}  rings={n_rings}")

    g = jnp.asarray(base_cfg.imu.gravity, jnp.float32)
    nw = 40
    dts = jnp.full((nw,), 0.0025, jnp.float32)
    accs = jnp.tile(g[None, :], (nw, 1))
    gyrs = jnp.zeros((nw, 3), jnp.float32)
    ones = jnp.ones(nw, bool)
    img0 = jax.tree.map(lambda a: a[0], imgs)
    imgs_rest = jax.tree.map(lambda a: a[1:], imgs)

    def run_variant(name, cfg, nw_eff=nw, skip_deskew_insert=False):
        mc = cfg.mapping
        cmap = voxel_map.create_map(mc.map_table_size, mc.map_cell_capacity,
                                    mc.map_cell_size, mc.line_resolution)
        smap = voxel_map.create_map(mc.map_table_size, mc.map_cell_capacity,
                                    mc.map_cell_size, mc.plane_resolution)
        feats0 = feat_mod.extract_features(img0, jnp.float32(0.0),
                                           cfg.features)
        d = dts[:nw_eff]
        a = accs[:nw_eff]
        gy = gyrs[:nw_eff]
        v = ones[:nw_eff]

        def frame(carry, img_t):
            cmap, smap, prev_scan, c2l, odom, o2m, p, q, vel = carry
            out = lio_frame_core(
                cfg, cmap, smap, prev_scan, img_t, jnp.float32(0.1),
                c2l, odom, o2m, jnp.asarray(False),
                d, a, gy, v, d, a, gy, v, p, q, vel, g)
            (cmap, smap, c2l, odom, o2m, pose_map, vel, _, _, scan) = out
            return (cmap, smap, scan, c2l, odom, o2m,
                    pose_map.t, pose_map.q, vel), pose_map.t

        @jax.jit
        def run(cmap, smap, imgs_rest):
            carry = (cmap, smap, feats0, Pose.identity(), Pose.identity(),
                     Pose.identity(), jnp.zeros(3),
                     jnp.asarray([1.0, 0, 0, 0], jnp.float32), jnp.zeros(3))
            _, ts = jax.lax.scan(frame, carry, imgs_rest)
            return ts

        run(cmap, smap, imgs_rest).block_until_ready()
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            ts = run(cmap, smap, imgs_rest)
        ts.block_until_ready()
        dt_ms = (time.perf_counter() - t0) / (reps * N_FRAMES) * 1e3
        print(f"{name:<40} {dt_ms:7.3f} ms/frame")
        return dt_ms

    import dataclasses
    full = run_variant("full lio (tight, nw=40)", base_cfg)
    run_variant("loose coupling (deskew GN, no IMU factor)",
                dataclasses.replace(base_cfg, imu=dataclasses.replace(
                    base_cfg.imu, tight_coupling=False)))
    run_variant("imu window nw=8 (preint cost probe)", base_cfg, nw_eff=8)
    run_variant("gn_iterations=3",
                dataclasses.replace(base_cfg, mapping=dataclasses.replace(
                    base_cfg.mapping, gn_iterations=3)))
    run_variant("outer_rounds=1",
                dataclasses.replace(base_cfg, mapping=dataclasses.replace(
                    base_cfg.mapping, outer_rounds=1)))
    print(f"(lidar-only fused reference: ~4.15 ms/frame at 241 scans/s)")


if __name__ == "__main__":
    main()
