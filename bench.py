"""Benchmark: full per-frame SLAM compute throughput on one chip.

Measures the fused device pipeline per frame — LOAM feature extraction
(curvature + greedy picks), scan-to-scan odometry GN, hash-grid scan-to-map
GN (5-NN + line/plane fits), and map insert — on realistic VLP-16 shapes
(16 rings x 1800 pts @ 10 Hz). The whole frame is ONE jitted program;
frames are iterated with ``lax.scan`` on device so host/tunnel latency is
excluded from the steady-state number.

Adversarial validity (VERDICT r2): every frame is a DISTINCT scan captured
along a moving trajectory (1.5 m/s, 11 deg/s yaw) through the synthetic
world, threaded through the scan as ``xs`` — so feature extraction is not
loop-invariant, the map genuinely grows (leaf dedup can't no-op inserts),
and odometry recovers real motion from an identity-adjacent warm start.

Baseline: the reference's real-time design point is 10 scans/s (10 Hz
lidar, <100 ms/stage budget — BASELINE.md); it publishes no faster number.
``vs_baseline`` is therefore measured scans/s / 10.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import hashlib
import json
import os as _os
import sys
import time

import numpy as np

N_FRAMES = 30          # frames per timed scan (device-side loop)
# default: VLP-16 shapes; MSF_BENCH_RINGS=64 benches HDL-64/KITTI scale
N_RINGS = int(_os.environ.get("MSF_BENCH_RINGS", "16"))
PTS_PER_RING = int(_os.environ.get("MSF_BENCH_PTS", "1800"))
BASELINE_SCANS_PER_SEC = 10.0
_CACHE_DIR = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                           ".cache", "bench_scans")


def _bench_trajectory(n):
    """Ground-vehicle arc inside the corridor world: distinct pose per
    frame (1.5 m/s, 0.2 rad/s yaw) at 10 Hz."""
    dt, speed, yaw_rate = 0.1, 1.5, 0.2
    ps, Rs = [], []
    p = np.zeros(3)
    yaw = 0.0
    for _ in range(n):
        c, s = np.cos(yaw), np.sin(yaw)
        Rs.append(np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]]))
        ps.append(p.copy())
        p = p + np.array([c, s, 0.0]) * speed * dt
        yaw += yaw_rate * dt
    return np.asarray(ps), np.asarray(Rs)


def make_scans(n_frames, n_rings, pts_per_ring):
    """n_frames DISTINCT scans along the bench trajectory (disk-cached:
    the numpy ray-caster costs ~0.1 s/frame and never changes)."""
    from msf_loam_tpu.dataio import synthetic

    key = hashlib.sha1(
        f"v1:{n_frames}:{n_rings}:{pts_per_ring}".encode()).hexdigest()[:12]
    path = _os.path.join(_CACHE_DIR, f"scans_{key}.npz")
    if _os.path.exists(path):
        blob = np.load(path)
        return blob["xyz"], blob["ring"]
    world = synthetic.World.corridor(seed=0, size=14.0)
    ps, Rs = _bench_trajectory(n_frames)
    xyzs, rings = [], []
    for i in range(n_frames):
        xyz, ring = synthetic.simulate_scan(
            world, ps[i], Rs[i], n_rings=n_rings, pts_per_ring=pts_per_ring,
            noise=0.004, seed=100 + i)
        xyzs.append(xyz)
        rings.append(ring.astype(np.uint8))
    xyz = np.stack(xyzs)
    ring = np.stack(rings)
    _os.makedirs(_CACHE_DIR, exist_ok=True)
    np.savez_compressed(path, xyz=xyz, ring=ring)
    return xyz, ring


def build_inputs(n_rings=None, pts_per_ring=None, n_frames=None):
    import jax
    import jax.numpy as jnp

    from msf_loam_tpu.config import FeatureConfig, MappingConfig, OdometryConfig
    from msf_loam_tpu.dataio import preprocess

    n_rings = n_rings or N_RINGS
    pts_per_ring = pts_per_ring or PTS_PER_RING
    n_frames = n_frames or (N_FRAMES + 1)

    fcfg = FeatureConfig(max_points_per_ring=2048, max_less_flat=8192)
    # corner budget 1024: the 16-ring bench world yields ~540 valid corner
    # queries per frame (measured), so the shared 4096 budget made the
    # corner-side octant gather + fused selection/fit ~72% padding. At
    # 64-ring the deduped corner count peaks at 1041 over the bench
    # trajectory (measured) — budget 2048 so no frame silently truncates.
    mcfg = MappingConfig(map_table_size=1 << 15, map_cell_capacity=32,
                         max_query_points=4096,
                         max_corner_query_points=1024 if n_rings <= 32
                         else 2048)
    ocfg = OdometryConfig()

    xyz, ring = make_scans(n_frames, n_rings, pts_per_ring)
    imgs = [preprocess.preprocess_scan(xyz[i], ring[i].astype(np.int32), fcfg,
                                       num_rings=n_rings)
            for i in range(n_frames)]
    # stack into one RingImage with a leading frame axis (the lax.scan xs)
    imgs = jax.tree.map(lambda *xs: jnp.stack(xs), *imgs)
    return fcfg, mcfg, ocfg, imgs


def run_single(n_rings, pts_per_ring, n_frames=N_FRAMES, n_reps=3):
    """Steady-state single-stream scans/s at the given sensor shape."""
    import jax
    import jax.numpy as jnp

    fcfg, mcfg, ocfg, imgs = build_inputs(n_rings, pts_per_ring, n_frames + 1)

    from msf_loam_tpu.core.se3 import Pose
    from msf_loam_tpu.ops import features as feat_mod
    from msf_loam_tpu.slam import mapping, odometry, voxel_map
    from msf_loam_tpu.slam.pipeline import (downsample_features,
                                            downsample_features_grouped)

    corner_map = voxel_map.create_map(mcfg.map_table_size,
                                      mcfg.map_cell_capacity,
                                      mcfg.map_cell_size, mcfg.line_resolution)
    surf_map = voxel_map.create_map(mcfg.map_table_size, mcfg.map_cell_capacity,
                                    mcfg.map_cell_size, mcfg.plane_resolution)

    def frame_step(carry, img_t):
        cmap, smap, prev_feats, pose_c2l, pose_w = carry
        feats = feat_mod.extract_features(img_t, jnp.float32(0.0), fcfg)
        odo = odometry.match_scan2scan(prev_feats, feats, pose_c2l, ocfg)
        pose_w = pose_w.compose(odo.pose_curr2last)
        if mapping.use_grouped_gather(mcfg):
            # grouped two-level octant gather (r5): queries grouped by
            # base cell at the matcher's query transform, same as
            # pipeline._frame_core
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
        # carry only what the next frame's odometry reads — threading the
        # full-res cloud through the scan carry costs a multi-MB copy/frame
        return (cmap, smap, feats.strip_full(), odo.pose_curr2last,
                mres.pose), mres.cost

    img0 = jax.tree.map(lambda a: a[0], imgs)
    imgs_rest = jax.tree.map(lambda a: a[1:], imgs)

    @jax.jit
    def run_frames(cmap, smap, imgs_rest):
        feats0 = feat_mod.extract_features(img0, jnp.float32(0.0), fcfg)
        carry = (cmap, smap, feats0.strip_full(), Pose.identity(),
                 Pose.identity())
        carry, costs = jax.lax.scan(frame_step, carry, imgs_rest)
        return costs

    # warm-up / compile
    t0 = time.perf_counter()
    costs = run_frames(corner_map, surf_map, imgs_rest)
    costs.block_until_ready()
    compile_and_first = time.perf_counter() - t0

    # steady state (single stream)
    t0 = time.perf_counter()
    for _ in range(n_reps):
        costs = run_frames(corner_map, surf_map, imgs_rest)
    costs.block_until_ready()
    elapsed = time.perf_counter() - t0
    return (n_frames * n_reps) / elapsed, compile_and_first


def main():
    import jax

    # persistent compilation cache: first-ever compile of the fused frame
    # program is minutes over the remote-TPU tunnel; subsequent runs load
    # from cache in seconds
    from msf_loam_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    single_sps, compile_and_first = run_single(N_RINGS, PTS_PER_RING)

    # secondary shape report (64-ring KITTI scale) unless already primary;
    # never lets a failure or long compile kill the contract line
    sps64 = None
    if N_RINGS != 64 and _os.environ.get("MSF_BENCH_64", "1") == "1":
        try:
            sps64, _ = run_single(64, PTS_PER_RING)
        except Exception as e:  # pragma: no cover
            print(f"# 64-ring pass failed: {e}", file=sys.stderr)

    # batched throughput mode: B independent trajectories per chip
    # (slam/batch_pipeline) — the production serving configuration; its
    # aggregate beats single-stream (259 vs 232 scans/s, round 3), so it
    # runs by default and the contract line reports the max of the two.
    # Skip with MSF_BENCH_BATCHED=0.
    if _os.environ.get("MSF_BENCH_BATCHED", "1") == "1":
        batched_sps, batch = run_batched_mode()
    else:
        batched_sps, batch = 0.0, 0

    # tightly-coupled LIO mode: times fused_lio_frame (preintegration +
    # IMU pre-solve + deskew GN + full deskew + insert) — the flagship
    # Multi-Sensor-Fusion configuration, reported alongside the lidar-only
    # number by default (VERDICT r3 next #2). MSF_BENCH_LIO=0 skips;
    # MSF_BENCH_LIO=only makes it the contract headline.
    lio_sps = None
    lio_env = _os.environ.get("MSF_BENCH_LIO", "1")
    if lio_env != "0":
        try:
            lio_sps = run_lio_mode()
        except Exception as e:  # pragma: no cover
            print(f"# lio pass failed: {e}", file=sys.stderr)
    if lio_env == "only" and lio_sps:
        single_sps, batched_sps = lio_sps, 0.0

    scans_per_sec = max(single_sps, batched_sps)
    result = {
        "metric": "scans_per_sec_per_chip",
        "value": round(scans_per_sec, 2),
        "unit": "scans/s",
        "vs_baseline": round(scans_per_sec / BASELINE_SCANS_PER_SEC, 2),
    }
    print(json.dumps(result))
    extra = f", 64-ring: {sps64:.1f} scans/s" if sps64 else ""
    extra += f", lio: {lio_sps:.1f} scans/s" if lio_sps else ""
    print(f"# single-stream ({N_RINGS}-ring): {single_sps:.1f} scans/s"
          f"{extra}, batched (B={batch}): {batched_sps:.1f} scans/s, "
          f"compile+first: {compile_and_first:.1f}s, "
          f"platform: {jax.devices()[0].platform}", file=sys.stderr)

    if _os.environ.get("MSF_BENCH_ROOFLINE", "0") == "1":
        import roofline
        roofline.report(N_RINGS, PTS_PER_RING, file=sys.stderr)


def run_lio_mode(n_frames=N_FRAMES, n_reps=3):
    """Steady-state throughput of the tightly-coupled post-init frame
    (slam.pipeline.lio_frame_core) with a realistic 40-sample IMU window
    per frame, iterated in one on-device lax.scan over DISTINCT scans."""
    import jax
    import jax.numpy as jnp

    from msf_loam_tpu.config import (FeatureConfig, ImuConfig, MappingConfig,
                                     MsfLoamConfig)
    from msf_loam_tpu.core.se3 import Pose
    from msf_loam_tpu.ops import features as feat_mod
    from msf_loam_tpu.slam import voxel_map
    from msf_loam_tpu.slam.pipeline import lio_frame_core

    cfg = MsfLoamConfig(
        features=FeatureConfig(max_points_per_ring=2048, max_less_flat=8192),
        mapping=MappingConfig(map_table_size=1 << 15, map_cell_capacity=32,
                              max_query_points=4096,
                              max_corner_query_points=1024 if N_RINGS <= 32
                              else 2048),
        imu=ImuConfig(tight_coupling=True))
    _, _, _, imgs = build_inputs(N_RINGS, PTS_PER_RING, n_frames + 1)
    mc = cfg.mapping
    cmap = voxel_map.create_map(mc.map_table_size, mc.map_cell_capacity,
                                mc.map_cell_size, mc.line_resolution)
    smap = voxel_map.create_map(mc.map_table_size, mc.map_cell_capacity,
                                mc.map_cell_size, mc.plane_resolution)
    g = jnp.asarray(cfg.imu.gravity, jnp.float32)
    nw = 40                                   # 400 Hz IMU @ 10 Hz lidar
    dts = jnp.full((nw,), 0.0025, jnp.float32)
    accs = jnp.tile(g[None, :], (nw, 1))
    gyrs = jnp.zeros((nw, 3), jnp.float32)
    ones = jnp.ones(nw, bool)
    img0 = jax.tree.map(lambda a: a[0], imgs)
    imgs_rest = jax.tree.map(lambda a: a[1:], imgs)
    feats0 = feat_mod.extract_features(img0, jnp.float32(0.0), cfg.features)

    def frame(carry, img_t):
        cmap, smap, prev_scan, c2l, odom, o2m, p, q, v = carry
        out = lio_frame_core(
            cfg, cmap, smap, prev_scan, img_t, jnp.float32(0.1),
            c2l, odom, o2m, jnp.asarray(False),
            dts, accs, gyrs, ones, dts, accs, gyrs, ones, p, q, v, g)
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

    run(cmap, smap, imgs_rest).block_until_ready()  # compile + warm
    t0 = time.perf_counter()
    for _ in range(n_reps):
        ts = run(cmap, smap, imgs_rest)
    ts.block_until_ready()
    return (n_frames * n_reps) / (time.perf_counter() - t0)


def run_batched_mode(batch=None, n_frames=N_FRAMES, n_reps=3):
    """Throughput with B concurrent trajectories in one device program.
    Each lane consumes the same per-frame DISTINCT scan stream (lanes keep
    independent maps/poses; aggregate throughput is what's measured).
    Measurement protocol mirrors ``run_single`` (n_reps timed repetitions
    of an on-device ``lax.scan``) so the two numbers are comparable —
    the earlier single-shot timing under-reported batched throughput ~10%
    (dispatch + state-init overhead on one 0.4 s call)."""
    import jax
    import jax.numpy as jnp

    from msf_loam_tpu.config import (FeatureConfig, MappingConfig,
                                     MsfLoamConfig)
    from msf_loam_tpu.core.pointcloud import RingImage
    from msf_loam_tpu.slam import batch_pipeline

    # per-lane table sized so the FUSED table is B * H = 32768 slots —
    # exactly the single-stream bench's table: same per-chip map memory,
    # packed B ways. Gather locality over the fused table is the batched
    # matcher's bottleneck (measured: per-lane tables of 1<<14 / 1<<13 /
    # 1<<12 give 200 / 200 / 215 scans/s aggregate); accuracy at 1<<12 is
    # pinned by test_batch_pipeline's batch-vs-dense trajectory check.
    batch = batch or int(_os.environ.get("MSF_BATCH_B", "8"))
    if batch < 1:
        raise SystemExit("MSF_BATCH_B must be >= 1 "
                         "(use MSF_BENCH_BATCHED=0 to skip batched mode)")
    cfg = MsfLoamConfig(
        features=FeatureConfig(max_points_per_ring=2048, max_less_flat=8192),
        mapping=MappingConfig(map_table_size=(1 << 15) // batch,
                              map_cell_capacity=32,
                              max_query_points=4096,
                              max_corner_query_points=1024,
                              # equal protocol with run_single, whose loop
                              # has no eviction pass either; on the 30-frame
                              # bench trajectory the 100 m horizon never
                              # drops a point anyway (eviction correctness:
                              # test_batch_pipeline serving-config test)
                              map_evict_period=0),
    )
    _, _, _, imgs = build_inputs(N_RINGS, PTS_PER_RING, n_frames)
    tile = lambda a: jnp.broadcast_to(a[:, None], (n_frames, batch) + a.shape[1:])
    ring_images = RingImage(xyz=tile(imgs.xyz), rel_time=tile(imgs.rel_time),
                            mask=tile(imgs.mask))
    state = batch_pipeline.init_batch_state(cfg, batch, n_rings=N_RINGS)
    state, poses = batch_pipeline.run_batch(cfg, state, ring_images)
    jax.block_until_ready(poses)
    t0 = time.perf_counter()
    for _ in range(n_reps):
        state = batch_pipeline.init_batch_state(cfg, batch, n_rings=N_RINGS)
        state, poses = batch_pipeline.run_batch(cfg, state, ring_images)
    jax.block_until_ready(poses)
    dt = time.perf_counter() - t0
    return (n_frames * batch * n_reps) / dt, batch


if __name__ == "__main__":
    main()
