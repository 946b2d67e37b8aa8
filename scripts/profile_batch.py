"""Stage-ablation profile of the batched (B-sequence) pipeline on TPU.

The only trustworthy perf signal is the fused on-device loop (CLAUDE.md),
so each variant is a full lax.scan over T frames with stages REMOVED, and
stage cost = time(full) - time(without stage).

  python scripts/profile_batch.py            # real TPU
  env JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python scripts/profile_batch.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

B = int(os.environ.get("PB_B", "8"))
T = int(os.environ.get("PB_T", "10"))
N_RINGS = 16
PTS = 1800


def main():
    import jax
    import jax.numpy as jnp

    from msf_loam_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    from bench import build_inputs
    from msf_loam_tpu.config import (FeatureConfig, MappingConfig,
                                     MsfLoamConfig, OdometryConfig)
    from msf_loam_tpu.core.pointcloud import RingImage
    from msf_loam_tpu.core.se3 import Pose
    from msf_loam_tpu.ops import features as feat_mod
    from msf_loam_tpu.slam import batch_pipeline, odometry
    from msf_loam_tpu.slam.batch_pipeline import (BatchState,
                                                  _batched_map_match,
                                                  _fused_insert)
    from msf_loam_tpu.slam.pipeline import downsample_features

    cfg = MsfLoamConfig(
        features=FeatureConfig(max_points_per_ring=2048, max_less_flat=8192),
        odometry=OdometryConfig(
            plane_corr=os.environ.get("PB_PLANE", "fit"),
            plane_support_extra=int(os.environ.get("PB_EXTRA", "4"))),
        mapping=MappingConfig(map_table_size=int(os.environ.get("PB_H", str(1 << 14))),
                              map_cell_capacity=int(os.environ.get("PB_CAP", "32")),
                              max_query_points=int(os.environ.get("PB_Q", "4096"))),
    )
    _, _, _, imgs = build_inputs(N_RINGS, PTS, T)
    tile = lambda a: jnp.broadcast_to(a[:, None], (T, B) + a.shape[1:])
    ring_images = RingImage(xyz=tile(imgs.xyz), rel_time=tile(imgs.rel_time),
                            mask=tile(imgs.mask))

    H = cfg.mapping.map_table_size
    fc, oc, mc = cfg.features, cfg.odometry, cfg.mapping

    def frame_fn(stages, state, img_t):
        feats = state.prev_feats
        if "feat" in stages:
            # MUST mirror batch_pipeline._frame_fn (vmapped extraction —
            # the flatten-lanes extract_features_batched was measured and
            # rejected there); a drifted profiler misattributes stage cost.
            feats = jax.vmap(lambda im: feat_mod.extract_features(
                im, jnp.float32(0.0), fc))(img_t).strip_full()
        pose_c2l = state.pose_c2l
        if "odo" in stages:
            odo = jax.vmap(
                lambda a, b, p: odometry.match_scan2scan(a, b, p, oc))(
                state.prev_feats, feats, state.pose_c2l)
            pose_c2l = odo.pose_curr2last
        pose_odom = state.pose_odom.compose(pose_c2l)
        corner_ds = jax.vmap(lambda pb: downsample_features(
            pb, mc.line_resolution, mc.max_query_points))(
            feats.corner_less_sharp)
        surf_ds = jax.vmap(lambda pb: downsample_features(
            pb, mc.plane_resolution, mc.max_query_points))(
            feats.surf_less_flat)
        guess = state.pose_o2m.compose(pose_odom)
        pose_map = guess
        if "match" in stages:
            pose_map, _ = _batched_map_match(
                state.corner_map, state.surf_map, H, corner_ds, surf_ds,
                guess, cfg)
        corner_map, surf_map = state.corner_map, state.surf_map
        if "insert" in stages:
            apply_b = jax.vmap(lambda p, x: p.apply(x))
            cw = apply_b(pose_map, corner_ds.xyz)
            sw = apply_b(pose_map, surf_ds.xyz)
            corner_map = _fused_insert(corner_map, H, cw, corner_ds.mask)
            surf_map = _fused_insert(surf_map, H, sw, surf_ds.mask)
        return BatchState(corner_map=corner_map, surf_map=surf_map,
                          prev_feats=feats, pose_c2l=pose_c2l,
                          pose_odom=pose_odom, pose_o2m=state.pose_o2m,
                          frame_idx=state.frame_idx + 1), pose_map.t

    @functools.partial(jax.jit, static_argnames=("stages",),
                       donate_argnums=(1,))
    def run(stages, state, ring_images):
        return jax.lax.scan(functools.partial(frame_fn, stages), state,
                            ring_images)

    variants = [
        ("full", ("feat", "odo", "match", "insert")),
        ("-feat", ("odo", "match", "insert")),
        ("-odo", ("feat", "match", "insert")),
        ("-match", ("feat", "odo", "insert")),
        ("-insert", ("feat", "odo", "match")),
        ("feat only", ("feat",)),
        ("odo only", ("feat", "odo")),
    ]
    only = os.environ.get("PB_VARIANTS", "")
    if only:
        names = [s.strip() for s in only.split(",")]
        variants = [v for v in variants if v[0] in names]
    results = {}
    for name, stages in variants:
        state = batch_pipeline.init_batch_state(cfg, B, n_rings=N_RINGS)
        st, ts = run(stages, state, ring_images)
        jax.block_until_ready(ts)
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            state = batch_pipeline.init_batch_state(cfg, B, n_rings=N_RINGS)
            st, ts = run(stages, state, ring_images)
        jax.block_until_ready(ts)
        dt = (time.perf_counter() - t0) / reps
        results[name] = dt
        print(f"{name:>10}: {dt*1000:7.1f} ms for {T}x{B} frames "
              f"({T*B/dt:6.1f} scans/s aggregate)", flush=True)
    if "full" in results:
        full = results["full"]
        for name in ("-feat", "-odo", "-match", "-insert"):
            if name in results:
                print(f"stage {name[1:]:>7}: "
                      f"{1000*(full-results[name]):7.1f} ms "
                      f"({100*(full-results[name])/full:4.1f}%)")


if __name__ == "__main__":
    main()
