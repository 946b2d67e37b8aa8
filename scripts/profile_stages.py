"""Per-stage TPU timing of the frame pipeline (dev tool)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, *args, n=10, name=""):
    out = fn(*args)
    import jax
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:36s} {dt:8.2f} ms")
    return out


def main():
    import jax
    import jax.numpy as jnp

    from msf_loam_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    from msf_loam_tpu.config import FeatureConfig, MappingConfig, OdometryConfig
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
                                        n_rings=16, pts_per_ring=1800,
                                        noise=0.004)
    img = preprocess.preprocess_scan(xyz, ring, fcfg, num_rings=16)
    print("platform:", jax.devices()[0].platform)

    extract = jax.jit(lambda im: feat_mod.extract_features(im, jnp.float32(0.0), fcfg))
    feats = timeit(extract, img, name="extract_features")

    odo = jax.jit(lambda a, b: odometry.match_scan2scan(a, b, Pose.identity(), ocfg))
    timeit(odo, feats, feats, name="match_scan2scan (2x6 GN + knn)")

    ds = jax.jit(lambda pb: downsample_features(pb, 0.4, mcfg.max_query_points))
    corner_ds = timeit(ds, feats.corner_less_sharp, name="downsample corner")
    surf_ds = ds(feats.surf_less_flat)

    m = voxel_map.create_map(mcfg.map_table_size, mcfg.map_cell_capacity,
                             mcfg.map_cell_size, mcfg.plane_resolution)
    big = jnp.asarray(np.random.default_rng(0).uniform(-20, 20, size=(60000, 3)
                                                       ).astype(np.float32))
    m = voxel_map.insert(m, big, jnp.ones(big.shape[0], bool))

    q = jax.jit(lambda mm, pb: voxel_map.query_knn(mm, pb.xyz, pb.mask, k=5))
    timeit(q, m, surf_ds, name="map query_knn 4096x(27x32)")

    ins = jax.jit(lambda mm, pb: voxel_map.insert(mm, pb.xyz, pb.mask))
    timeit(ins, m, surf_ds, name="map insert 4096")

    m2m = jax.jit(lambda cm, sm, c, s: mapping.match_scan2map(
        cm, sm, c, s, Pose.identity(), mcfg))
    timeit(m2m, m, m, corner_ds, surf_ds, name="match_scan2map (2 rounds)")


if __name__ == "__main__":
    main()
