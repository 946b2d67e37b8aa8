"""Decompose scan-to-scan odometry device time (dev tool).

Times, each as its own fused on-device loop with an evolving pose so
nothing hoists: full match_scan2scan, the two correspondence finders,
and the GN solve on fixed correspondences.

Run:  MSF_BENCH_RINGS=64 python scripts/profile_odometry.py
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

    from msf_loam_tpu.config import FeatureConfig, OdometryConfig
    from msf_loam_tpu.core.se3 import Pose
    from msf_loam_tpu.dataio import preprocess, synthetic
    from msf_loam_tpu.ops import features as feat_mod
    from msf_loam_tpu.ops import gauss_newton as gn
    from msf_loam_tpu.ops import icp_residuals as icp
    from msf_loam_tpu.slam import odometry

    fcfg = FeatureConfig(max_points_per_ring=2048, max_less_flat=8192)
    ocfg = OdometryConfig()
    world = synthetic.World.corridor(seed=0, size=14.0)

    def feats_at(x):
        xyz, ring = synthetic.simulate_scan(
            world, np.array([x, 0.0, 0.0]), np.eye(3), n_rings=N_RINGS,
            pts_per_ring=PTS, noise=0.004, seed=int(x * 10))
        img = preprocess.preprocess_scan(xyz, ring, fcfg, num_rings=N_RINGS)
        return jax.jit(lambda im: feat_mod.extract_features(
            im, jnp.float32(0.0), fcfg))(img)

    prev, curr = feats_at(0.0), feats_at(0.3)
    print(f"platform: {jax.devices()[0].platform}  rings={N_RINGS}  "
          f"sharp={int(np.asarray(curr.corner_sharp.mask).sum())} "
          f"less_sharp={int(np.asarray(prev.corner_less_sharp.mask).sum())} "
          f"flat={int(np.asarray(curr.surf_flat.mask).sum())} "
          f"less_flat={int(np.asarray(prev.surf_less_flat.mask).sum())}")
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
        print(f"{name:36s} {dt:8.3f} ms/frame", flush=True)
        return dt

    def full_body(carry):
        pose, acc = carry
        o = odometry.match_scan2scan(prev, curr, pose, ocfg)
        s = jnp.sum(o.pose_curr2last.t) * eps
        return (Pose(t=pose.t + s, q=pose.q), acc + s), s
    scan_time("match_scan2scan (2 rounds)", full_body,
              (Pose.identity(), jnp.float32(0)))

    def edge_body(carry):
        pose, acc = carry
        e = odometry.find_edge_correspondences(
            curr.corner_sharp, prev.corner_less_sharp, pose, ocfg)
        s = jnp.sum(e.line_c[0]) * eps
        return (Pose(t=pose.t + s, q=pose.q), acc + s), s
    scan_time("find_edge_correspondences (1x)", edge_body,
              (Pose.identity(), jnp.float32(0)))

    def plane_body(carry):
        pose, acc = carry
        p = odometry.find_plane_correspondences(
            curr.surf_flat, prev.surf_less_flat, pose, ocfg)
        s = jnp.sum(p.plane_c[0]) * eps
        return (Pose(t=pose.t + s, q=pose.q), acc + s), s
    scan_time("find_plane_correspondences (1x)", plane_body,
              (Pose.identity(), jnp.float32(0)))

    edges = jax.jit(lambda: odometry.find_edge_correspondences(
        curr.corner_sharp, prev.corner_less_sharp, Pose.identity(), ocfg))()
    planes = jax.jit(lambda: odometry.find_plane_correspondences(
        curr.surf_flat, prev.surf_less_flat, Pose.identity(), ocfg))()
    jax.block_until_ready((edges, planes))

    def gn_body(carry):
        pose, acc = carry

        def build(p, v):
            eb = icp.edge_residuals(p, edges.points, edges.line_c,
                                    edges.line_n, edges.valid)
            pb = icp.plane_residuals(p, planes.points, planes.plane_c,
                                     planes.plane_n, planes.valid)
            return [eb, pb], [gn.huber_weights(eb, ocfg.huber_delta),
                              gn.huber_weights(pb, ocfg.huber_delta)]
        out = gn.gauss_newton(build, pose, jnp.zeros(3, jnp.float32),
                              n_iters=ocfg.gn_iterations)
        s = jnp.sum(out.pose.t) * eps
        return (Pose(t=pose.t + s, q=pose.q), acc + s), s
    scan_time("GN6 only (1x)", gn_body, (Pose.identity(), jnp.float32(0)))


if __name__ == "__main__":
    main()
