"""Capture an xprof trace of one fused bench frame and print the top ops
by device time (dev tool — jax.profiler.ProfileData parser, no tensorboard).

Run:  MSF_BENCH_RINGS=64 python scripts/trace_ops.py [m2m|frame|extract|odo]
"""

import glob
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_RINGS = int(os.environ.get("MSF_BENCH_RINGS", "64"))
PTS = int(os.environ.get("MSF_BENCH_PTS", "1800"))
N_ITERS = 10


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "m2m"
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
                         max_query_points=4096,
                         max_corner_query_points=1024 if N_RINGS <= 32
                         else 2048)
    ocfg = OdometryConfig()
    world = synthetic.World.corridor(seed=0, size=14.0)
    xyz, ring = synthetic.simulate_scan(world, np.zeros(3), np.eye(3),
                                        n_rings=N_RINGS, pts_per_ring=PTS,
                                        noise=0.004)
    img = preprocess.preprocess_scan(xyz, ring, fcfg, num_rings=N_RINGS)
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

    if which == "m2m":
        def body(carry, _):
            pose, acc = carry
            r = mapping.match_scan2map(m, m, corner0, surf0, pose, mcfg)
            s = jnp.sum(r.pose.t) * eps
            return (Pose(t=pose.t + s, q=pose.q), acc), s
        init = (Pose.identity(), jnp.float32(0))
    elif which == "frame":
        # the bench.py frame_step verbatim: feat + odo + 2x downsample +
        # m2m + 2x insert, map state threaded through the scan
        # (r5: grouped two-level gather, like bench run_single)
        from msf_loam_tpu.slam.pipeline import downsample_features_grouped
        ocfg_f = ocfg

        def body(carry, _):
            cmap, smap, prev_feats, pose_c2l, pose_w = carry
            feats = feat_mod.extract_features(img, jnp.float32(0.0), fcfg)
            odo = odometry.match_scan2scan(prev_feats, feats, pose_c2l, ocfg_f)
            pose_w = pose_w.compose(odo.pose_curr2last)
            if mapping.use_grouped_gather(mcfg):
                corner_ds, corner_groups = downsample_features_grouped(
                    feats.corner_less_sharp, mcfg.line_resolution,
                    mcfg.corner_query_points,
                    pose_w.apply(feats.corner_less_sharp.xyz),
                    mcfg.map_cell_size, mcfg.gather_groups)
                surf_ds, surf_groups = downsample_features_grouped(
                    feats.surf_less_flat, mcfg.plane_resolution,
                    mcfg.max_query_points,
                    pose_w.apply(feats.surf_less_flat.xyz),
                    mcfg.map_cell_size, mcfg.gather_groups)
            else:
                corner_groups = surf_groups = None
                corner_ds = downsample_features(feats.corner_less_sharp,
                                                mcfg.line_resolution,
                                                mcfg.corner_query_points)
                surf_ds = downsample_features(feats.surf_less_flat,
                                              mcfg.plane_resolution,
                                              mcfg.max_query_points)
            mres = mapping.match_scan2map(cmap, smap, corner_ds, surf_ds,
                                          pose_w, mcfg,
                                          corner_groups=corner_groups,
                                          surf_groups=surf_groups)
            cw = corner_ds.transform(mres.pose)
            sw = surf_ds.transform(mres.pose)
            cmap = voxel_map.insert(cmap, cw.xyz, cw.mask)
            smap = voxel_map.insert(smap, sw.xyz, sw.mask)
            return (cmap, smap, feats, odo.pose_curr2last, mres.pose), mres.cost
        init = (m, m, feats0, Pose.identity(), Pose.identity())
    elif which == "extract":
        def body(carry, _):
            x, acc = carry
            f = feat_mod.extract_features(img._replace(xyz=img.xyz + x),
                                          jnp.float32(0.0), fcfg)
            s = jnp.sum(f.corner_sharp.xyz) * eps
            return (x + s, acc), s
        init = (jnp.float32(0), jnp.float32(0))
    elif which == "odo":
        def body(carry, _):
            pose, acc = carry
            o = odometry.match_scan2scan(feats0, feats0, pose, ocfg)
            s = jnp.sum(o.pose_curr2last.t) * eps
            return (Pose(t=pose.t + s, q=pose.q), acc), s
        init = (Pose.identity(), jnp.float32(0))
    else:
        raise SystemExit(f"unknown target {which}")

    @jax.jit
    def run(c0):
        return jax.lax.scan(body, c0, None, length=N_ITERS)[1]

    out = run(init); jax.block_until_ready(out)

    trace_dir = f"/tmp/xtrace_{which}"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        out = run(init)
        jax.block_until_ready(out)

    # parse the xplane proto: aggregate device op durations
    paths = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    assert paths, f"no trace under {trace_dir}"
    pd = jax.profiler.ProfileData.from_file(paths[0])
    tot = defaultdict(float)
    cnt = defaultdict(int)
    for plane in pd.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        for line in plane.lines:
            if "XLA Ops" not in line.name and "Ops" not in line.name:
                continue
            for ev in line.events:
                name = ev.name
                tot[name] += ev.duration_ns / 1e3
                cnt[name] += 1
    items = sorted(tot.items(), key=lambda kv: -kv[1])
    total = sum(tot.values())
    print(f"== {which}: {total/1e3:.2f} ms device total over {N_ITERS} iters "
          f"({total/1e3/N_ITERS:.3f} ms/iter)")
    for name, us in items[:120]:
        print(f"{us/N_ITERS:9.1f} us/iter  x{cnt[name]//N_ITERS:<4d} {name[:110]}")


if __name__ == "__main__":
    main()
