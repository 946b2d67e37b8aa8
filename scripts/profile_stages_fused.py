"""Per-stage device timing via fused on-device lax.scan loops.

Microbenchmarks over the axon tunnel are noise (dispatch pipelining); the
only trustworthy per-stage signal is a scan that repeats ONE stage on
device many times. Each stage's input is perturbed by a tiny function of
the previous iteration's output so XLA cannot hoist the loop-invariant
computation out of the scan.

Run (real TPU):  python scripts/profile_stages_fused.py
Ring count:      MSF_BENCH_RINGS=64 python scripts/profile_stages_fused.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_RINGS = int(os.environ.get("MSF_BENCH_RINGS", "16"))
PTS = int(os.environ.get("MSF_BENCH_PTS", "1800"))
N_ITERS = 30


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
    print(f"platform: {jax.devices()[0].platform}  rings={N_RINGS} pts={PTS}")

    feats0 = jax.jit(lambda im: feat_mod.extract_features(
        im, jnp.float32(0.0), fcfg))(img)
    corner0 = downsample_features(feats0.corner_less_sharp,
                                  mcfg.line_resolution, mcfg.max_query_points)
    surf0 = downsample_features(feats0.surf_less_flat,
                                mcfg.plane_resolution, mcfg.max_query_points)

    m = voxel_map.create_map(mcfg.map_table_size, mcfg.map_cell_capacity,
                             mcfg.map_cell_size, mcfg.plane_resolution)
    big = jnp.asarray(np.random.default_rng(0).uniform(
        -20, 20, size=(120000, 3)).astype(np.float32))
    m = voxel_map.insert(m, big, jnp.ones(big.shape[0], bool))
    jax.block_until_ready(m)

    def scan_time(name, body, init_carry):
        """body(carry) -> (carry, tiny_scalar). Times N_ITERS fused reps."""

        @jax.jit
        def run(carry):
            def step(c, _):
                c2, s = body(c)
                return c2, s
            c, ss = jax.lax.scan(step, carry, None, length=N_ITERS)
            return ss

        out = run(init_carry)            # compile + warm
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = run(init_carry)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / (reps * N_ITERS) * 1e3
        print(f"{name:42s} {dt:8.3f} ms/frame")
        return dt

    eps = jnp.float32(1e-37)

    # 1. feature extraction (anti-hoist: shift img by eps*acc)
    def feat_body(carry):
        im_xyz, acc = carry
        im = img._replace(xyz=im_xyz)
        f = feat_mod.extract_features(im, jnp.float32(0.0), fcfg)
        s = jnp.sum(f.corner_sharp.xyz) * eps
        return (im_xyz + s, acc + s), s
    t_feat = scan_time("extract_features", feat_body, (img.xyz, jnp.float32(0)))

    # 2. odometry
    def odo_body(carry):
        pose, acc = carry
        o = odometry.match_scan2scan(feats0, feats0, pose, ocfg)
        s = jnp.sum(o.pose_curr2last.t) * eps
        return (Pose(t=pose.t + s, q=pose.q), acc + s), s
    t_odo = scan_time("match_scan2scan", odo_body,
                      (Pose.identity(), jnp.float32(0)))

    # 3. downsample (both feature types)
    def ds_body(carry):
        x, acc = carry
        c = downsample_features(
            feats0.corner_less_sharp._replace(
                xyz=feats0.corner_less_sharp.xyz + x),
            mcfg.line_resolution, mcfg.max_query_points)
        sf = downsample_features(
            feats0.surf_less_flat._replace(xyz=feats0.surf_less_flat.xyz + x),
            mcfg.plane_resolution, mcfg.max_query_points)
        s = (jnp.sum(c.xyz[0]) + jnp.sum(sf.xyz[0])) * eps
        return (x + s, acc), s
    t_ds = scan_time("downsample x2", ds_body,
                     (jnp.float32(0), jnp.float32(0)))

    # 4. one kNN query round (4096 queries vs the big map)
    def q_body(carry):
        x, acc = carry
        d2, nx, val = voxel_map.query_knn(m, surf0.xyz + x, surf0.mask, k=5)
        s = jnp.sum(d2[0]) * eps
        return (x + s, acc), s
    t_q = scan_time("query_knn 4096 (one call)", q_body,
                    (jnp.float32(0), jnp.float32(0)))

    # 5. full scan-to-map matcher (2 rounds x (2 queries + fits + GN6))
    def m2m_body(carry):
        pose, acc = carry
        r = mapping.match_scan2map(m, m, corner0, surf0, pose, mcfg)
        s = jnp.sum(r.pose.t) * eps
        return (Pose(t=pose.t + s, q=pose.q), acc), s
    t_m2m = scan_time("match_scan2map (2 rounds)", m2m_body,
                      (Pose.identity(), jnp.float32(0)))

    # 6. map insert x2
    def ins_body(carry):
        mm, x = carry
        mm2 = voxel_map.insert(mm, surf0.xyz + x, surf0.mask)
        s = jnp.sum(mm2.count) * 0
        return (mm2, x + jnp.float32(0) * s), x
    t_ins = scan_time("map insert 4096", ins_body, (m, jnp.float32(0)))

    total = t_feat + t_odo + t_ds + t_m2m + 2 * t_ins
    print(f"{'sum (feat+odo+ds+m2m+2*insert)':42s} {total:8.3f} ms/frame "
          f"-> {1e3 / total:.1f} scans/s")


if __name__ == "__main__":
    main()
