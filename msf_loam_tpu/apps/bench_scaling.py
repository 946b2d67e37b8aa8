"""Multi-device scaling benchmark: sharded mapping + distributed BA.

Reports frames/s scaling efficiency at 1, 2, .., N devices — the
BASELINE.json config-5 metric (map-block partition + distributed
Schur-complement BA). On a machine without a pod slice, run with
``XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu``
for a simulated-ICI functional measurement; on real hardware the same
harness exercises ICI collectives.

Usage:
  python -m msf_loam_tpu.apps.bench_scaling [--devices 1 2 4 8]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def bench_one(n_devices: int, n_iters: int = 3) -> float:
    """One distributed 'mapping step': sharded-map insert + query + DP GN +
    distributed pose-graph solve. Returns steps/s."""
    import jax
    import jax.numpy as jnp

    from msf_loam_tpu.core.se3 import Pose
    from msf_loam_tpu.parallel import (data_parallel, distributed_ba,
                                       mesh as mesh_mod, sharded_map)

    rng = np.random.default_rng(0)
    mesh_map = mesh_mod.make_mesh(n_map=n_devices, n_data=1,
                                  devices=jax.devices()[:n_devices])
    mesh_data = mesh_mod.make_mesh(n_map=1, n_data=n_devices,
                                   devices=jax.devices()[:n_devices])

    H = 1 << 11
    m = sharded_map.create_sharded_map(mesh_map, H, 16, 2.0, 0.4)
    pts = jnp.asarray(rng.uniform(-20, 20, size=(2048, 3)).astype(np.float32))
    q = jnp.asarray(rng.uniform(-18, 18, size=(512, 3)).astype(np.float32))
    qmask = jnp.ones(512, bool)

    n_corr = 256 * n_devices
    normals = rng.normal(size=(n_corr, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    pw = rng.normal(size=(n_corr, 3)).astype(np.float32) * 5

    N_pose = 8 * n_devices
    D = rng.normal(size=(N_pose, 6, 6)).astype(np.float32)
    D = np.einsum("nij,nkj->nik", D, D) + 8 * np.eye(6, dtype=np.float32)
    U = (rng.normal(size=(N_pose - 1, 6, 6)) * 0.2).astype(np.float32)
    b = rng.normal(size=(N_pose, 6)).astype(np.float32)

    def step(mm):
        mm = sharded_map.sharded_insert(mesh_map, mm, pts, jnp.ones(2048, bool))
        d2, xyz, valid = sharded_map.sharded_query_knn(mesh_map, mm, q, qmask)
        pose = data_parallel.dp_gauss_newton_plane(
            mesh_data, Pose.identity(), jnp.asarray(pw), jnp.asarray(pw),
            jnp.asarray(normals), jnp.ones(n_corr, bool), n_iters=3)
        x = distributed_ba.distributed_tridiag_solve(
            mesh_data, jnp.asarray(D), jnp.asarray(U), jnp.asarray(b))
        return mm, d2, pose, x

    out = step(m)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    mm = m
    for _ in range(n_iters):
        mm, d2, pose, x = step(mm)
    jax.block_until_ready((d2, pose, x))
    return n_iters / (time.perf_counter() - t0)


def bench_pipeline(n_devices: int, n_frames: int = 6,
                   rings: int = 16, pts: int = 900) -> float:
    """Full sharded-pipeline frames/s (extract + odometry + sharded map
    insert/query + mapping GN per frame) at a FIXED workload — strong
    scaling over the map axis. Returns frames/s."""
    import jax
    import jax.numpy as jnp

    from msf_loam_tpu.config import (FeatureConfig, MappingConfig,
                                     MsfLoamConfig)
    from msf_loam_tpu.dataio import preprocess, synthetic
    from msf_loam_tpu.parallel import mesh as mesh_mod
    from msf_loam_tpu.parallel.sharded_pipeline import ShardedSlamPipeline

    H = ((1 << 14) // n_devices) * n_devices
    cfg = MsfLoamConfig(
        features=FeatureConfig(max_points_per_ring=1024, max_less_flat=4096),
        mapping=MappingConfig(map_table_size=H, map_cell_capacity=32,
                              max_query_points=2048))
    mesh = mesh_mod.make_mesh(n_map=n_devices, n_data=1,
                              devices=jax.devices()[:n_devices])
    world = synthetic.World.corridor(seed=0, size=14.0)
    imgs = []
    for i in range(n_frames):
        xyz, ring = synthetic.simulate_scan(
            world, np.array([0.15 * i, 0.05 * i, 0.0]), np.eye(3),
            n_rings=rings, pts_per_ring=pts, noise=0.004, seed=i)
        imgs.append(preprocess.preprocess_scan(xyz, ring, cfg.features,
                                               num_rings=rings))

    def run_once():
        pipe = ShardedSlamPipeline(cfg, mesh)
        for i, img in enumerate(imgs):
            res = pipe.process_ring_image(img, 0.1 * i)
        jax.block_until_ready(res.map_pose.t)

    run_once()  # compile
    t0 = time.perf_counter()
    reps = 2
    for _ in range(reps):
        run_once()
    return n_frames * reps / (time.perf_counter() - t0)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--devices", type=int, nargs="+", default=None)
    ap.add_argument("--pipeline", action="store_true",
                    help="also bench full sharded-pipeline frames/s "
                         "(strong scaling) at each device count")
    ap.add_argument("--json", default=None)
    args = ap.parse_args(argv)

    import os

    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    avail = len(jax.devices())
    # default to the scaling endpoints; each mesh size compiles ~8 programs
    sizes = args.devices or [d for d in (1, avail) if d <= avail]
    results = {}
    for n in sizes:
        sps = bench_one(n)
        results[n] = sps
    base = results[sizes[0]] * sizes[0]
    out = {
        "platform": jax.devices()[0].platform,
        "steps_per_sec": {str(n): round(results[n], 2) for n in sizes},
        # work per step scales with devices (weak scaling):
        "scaling_efficiency": {
            str(n): round(results[n] * n / base, 3) for n in sizes},
    }
    if args.pipeline:
        fps = {n: bench_pipeline(n) for n in sizes}
        fbase = fps[sizes[0]]
        out["pipeline_frames_per_sec"] = {
            str(n): round(fps[n], 2) for n in sizes}
        # fixed workload split over more devices (strong scaling)
        out["pipeline_strong_efficiency"] = {
            str(n): round(fps[n] / (fbase * n / sizes[0]), 3) for n in sizes}
    print(json.dumps(out))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
