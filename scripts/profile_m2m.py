"""Decompose match_scan2map device time at mapping scale (dev tool).

Times, each as its own fused on-device scan loop:
  m2m fallback=on   — production config (two-radius surf query + 2-scale fit)
  m2m fallback=off  — strict 5-NN only (round-1 configuration)
  associate only    — queries + fits, no GN
  gn only           — 2x 6-iter GN on fixed correspondences

Run:  MSF_BENCH_RINGS=64 python scripts/profile_m2m.py
"""

import dataclasses
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

    from msf_loam_tpu.config import FeatureConfig, MappingConfig
    from msf_loam_tpu.core.se3 import Pose
    from msf_loam_tpu.dataio import preprocess, synthetic
    from msf_loam_tpu.ops import features as feat_mod
    from msf_loam_tpu.ops import gauss_newton as gn
    from msf_loam_tpu.ops import icp_residuals as icp
    from msf_loam_tpu.slam import mapping, voxel_map
    from msf_loam_tpu.slam.pipeline import downsample_features

    fcfg = FeatureConfig(max_points_per_ring=2048, max_less_flat=8192)
    mcfg = MappingConfig(map_table_size=1 << 15, map_cell_capacity=32,
                         max_query_points=4096)
    world = synthetic.World.corridor(seed=0, size=14.0)
    xyz, ring = synthetic.simulate_scan(world, np.zeros(3), np.eye(3),
                                        n_rings=N_RINGS, pts_per_ring=PTS,
                                        noise=0.004)
    img = preprocess.preprocess_scan(xyz, ring, fcfg, num_rings=N_RINGS)
    print(f"platform: {jax.devices()[0].platform}  rings={N_RINGS}")

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
    eps = jnp.float32(1e-37)

    def scan_time(name, body, init):
        @jax.jit
        def run(c0):
            return jax.lax.scan(lambda c, _: body(c), c0, None,
                                length=N_ITERS)[1]
        out = run(init); jax.block_until_ready(out)
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = run(init)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / (reps * N_ITERS) * 1e3
        print(f"{name:34s} {dt:8.3f} ms/frame", flush=True)
        return dt

    for name, cfg in (
        ("m2m fallback=on (2 rounds)", mcfg),
        ("m2m fallback=off (2 rounds)",
         dataclasses.replace(mcfg, plane_fallback=False)),
        ("m2m fallback=on (1 round)",
         dataclasses.replace(mcfg, outer_rounds=1)),
    ):
        def body(carry, cfg=cfg):
            pose, acc = carry
            r = mapping.match_scan2map(m, m, corner0, surf0, pose, cfg)
            s = jnp.sum(r.pose.t) * eps
            return (Pose(t=pose.t + s, q=pose.q), acc), s
        scan_time(name, body, (Pose.identity(), jnp.float32(0)))

    # associate only (fallback on)
    def assoc_body(carry):
        x, acc = carry
        corr = mapping._associate(m, m, corner0, surf0,
                                  Pose(t=x, q=Pose.identity().q), mcfg)
        s = jnp.sum(corr.plane_c[0]) * eps
        return (x + s, acc), s
    scan_time("associate only (1 round)", assoc_body,
              (jnp.zeros(3), jnp.float32(0)))

    # GN only on fixed correspondences
    corr0 = jax.jit(lambda: mapping._associate(
        m, m, corner0, surf0, Pose.identity(), mcfg))()
    jax.block_until_ready(corr0)

    def gn_body(carry):
        pose, acc = carry

        def build(p, v):
            eb = icp.edge_residuals(p, corr0.edge_points, corr0.edge_c,
                                    corr0.edge_n, corr0.edge_valid)
            pb = icp.plane_residuals(p, corr0.plane_points, corr0.plane_c,
                                     corr0.plane_n, corr0.plane_valid)
            return [eb, pb], [gn.huber_weights(eb, mcfg.huber_delta),
                              gn.huber_weights(pb, mcfg.huber_delta)]
        out = gn.gauss_newton(build, pose, jnp.zeros(3, jnp.float32),
                              n_iters=mcfg.gn_iterations)
        s = jnp.sum(out.pose.t) * eps
        return (Pose(t=pose.t + s, q=pose.q), acc), s
    scan_time("GN6 only (1x)", gn_body, (Pose.identity(), jnp.float32(0)))


if __name__ == "__main__":
    main()
