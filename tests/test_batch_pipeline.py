"""Batched multi-sequence pipeline: B trajectories tracked in one program."""

import jax
import jax.numpy as jnp
import numpy as np

from msf_loam_tpu.config import (FeatureConfig, MappingConfig, MsfLoamConfig,
                                 OdometryConfig)
from msf_loam_tpu.core.pointcloud import RingImage
from msf_loam_tpu.dataio import preprocess, synthetic
from msf_loam_tpu.slam import batch_pipeline
from msf_loam_tpu.slam.pipeline import ate_rmse

FCFG = FeatureConfig(max_points_per_ring=1024, max_less_flat=4096)
CFG = MsfLoamConfig(
    features=FCFG,
    mapping=MappingConfig(map_table_size=1 << 12, map_cell_capacity=16,
                          max_query_points=1024),
)


def _make_batch(T=5, B=2, distort=False):
    """B worlds, T frames each, distinct trajectories."""
    imgs, gts = [], []
    for b in range(B):
        world = synthetic.World.corridor(seed=b, size=12.0)
        step = np.array([0.25, 0.05 * (b + 1), 0.0])
        kw = dict(linear_vel=step / 0.1) if distort else {}
        seq_imgs, seq_gt = [], []
        for i in range(T):
            t = step * i
            xyz, ring = synthetic.simulate_scan(world, t, np.eye(3),
                                                n_rings=16, pts_per_ring=900,
                                                noise=0.004, seed=10 * b + i,
                                                **kw)
            img = preprocess.preprocess_scan(xyz, ring, FCFG, num_rings=16)
            seq_imgs.append(img)
            seq_gt.append(t)
        imgs.append(seq_imgs)
        gts.append(seq_gt)
    # stack to (T, B, ...)
    stack = lambda f: jnp.stack(
        [jnp.stack([f(imgs[b][t]) for b in range(B)]) for t in range(T)])
    ring_images = RingImage(
        xyz=stack(lambda im: im.xyz),
        rel_time=stack(lambda im: im.rel_time),
        mask=stack(lambda im: im.mask),
    )
    return ring_images, np.asarray(gts)  # gts: (B, T, 3)


def test_batch_tracks_two_trajectories():
    T, B = 5, 2
    ring_images, gts = _make_batch(T, B)
    state = batch_pipeline.init_batch_state(CFG, B, n_rings=16)
    state, poses = batch_pipeline.run_batch(CFG, state, ring_images)
    est = np.asarray(poses.t)  # (T, B, 3)
    for b in range(B):
        err = ate_rmse(est[:, b], gts[b], align=False)
        assert err < 0.08, f"seq {b}: ATE {err:.3f}"
    assert int(state.frame_idx) == T


def test_fused_insert_no_cross_sequence_suppression():
    """Two sequences inserting into the SAME world voxel must both land:
    leaf-dedup runs in a per-sequence (salted) namespace, so sequence 0's
    point may never suppress sequence 1's insert (regression test)."""
    from msf_loam_tpu.slam import voxel_map

    B, H, P = 2, 1 << 8, 8
    fused = voxel_map.create_map(B * H, P, cell_size=2.0, leaf=0.2)
    # identical coordinates for both sequences -> same leaf voxel key
    pt = jnp.asarray([[0.55, 0.55, 0.55]], jnp.float32)
    xyz = jnp.broadcast_to(pt, (B, 1, 3))
    mask = jnp.ones((B, 1), bool)
    fused = batch_pipeline._fused_insert(fused, H, xyz, mask)

    query = jnp.broadcast_to(pt, (B, 1, 3))
    d2, nn_xyz, valid = batch_pipeline._fused_query(
        fused, H, query, jnp.ones((B, 1), bool), k=1)
    for b in range(B):
        assert bool(valid[b, 0, 0]), f"seq {b}: insert was suppressed"
        np.testing.assert_allclose(np.asarray(nn_xyz[b, 0, 0]),
                                   np.asarray(pt[0]), atol=1e-6)

    # and the point landed only in the owner's slot range
    counts = np.asarray(fused.count)
    assert counts[:H].sum() == 1 and counts[H:].sum() == 1


def test_batch_motion_deskew_tracks_distorted():
    """Batched lanes over motion-DISTORTED scans with motion_deskew on:
    the _frame_core parity path (deskew from each lane's odometry step +
    frame-0 insert skip) must keep per-lane tracking accurate."""
    import dataclasses

    cfg = dataclasses.replace(CFG, odometry=dataclasses.replace(
        CFG.odometry, motion_deskew=True))
    T, B = 5, 2
    ring_images, gts = _make_batch(T, B, distort=True)
    state = batch_pipeline.init_batch_state(cfg, B, n_rings=16)
    state, poses = batch_pipeline.run_batch(cfg, state, ring_images)
    est = np.asarray(poses.t)
    for b in range(B):
        err = ate_rmse(est[:, b], gts[b], align=False)
        assert err < 0.1, f"seq {b}: ATE {err:.3f}"


def test_batch_matches_single_pipeline_roughly():
    """Batched path should land near the sequential SlamPipeline result."""
    from msf_loam_tpu.ops import features as feat_mod
    from msf_loam_tpu.slam.pipeline import SlamPipeline

    T = 4
    ring_images, gts = _make_batch(T, 1)
    state = batch_pipeline.init_batch_state(CFG, 1, n_rings=16)
    state, poses = batch_pipeline.run_batch(CFG, state, ring_images)
    batched_final = np.asarray(poses.t)[-1, 0]

    pipe = SlamPipeline(CFG)
    for t in range(T):
        img = RingImage(xyz=ring_images.xyz[t, 0],
                        rel_time=ring_images.rel_time[t, 0],
                        mask=ring_images.mask[t, 0])
        feats = feat_mod.extract_features(img, jnp.float32(0.1 * t), CFG.features)
        pipe.process_scan(feats)
    seq_final = np.asarray(pipe.pose_map.t)
    np.testing.assert_allclose(batched_final, seq_final, atol=0.02)


def test_batch_serving_config_long_trajectory_with_eviction():
    """ADVICE r3 #4: the 'batched beats single-stream' serving claim runs
    4096-slot per-lane tables; on longer scenes those fill and collisions
    degrade kNN unless the batched pipeline evicts like the dense one
    does. Drive a 9 m trajectory (3x the short toy checks) at the serving
    table size with an 8 m eviction horizon and assert per-lane tracking
    holds AND table occupancy stays bounded. (A/B measured: no eviction
    0.016/0.019 ATE @13355 pts; 6 m horizon evicts live geometry
    0.082/0.146; 8 m holds 0.046/0.050 @5433 pts.)"""
    import dataclasses

    T, B = 30, 2
    cfg = dataclasses.replace(
        CFG, mapping=dataclasses.replace(
            CFG.mapping, map_table_size=1 << 12, map_cell_capacity=32,
            map_evict_period=8, map_evict_radius=8.0))
    imgs, gts = [], []
    for b in range(B):
        world = synthetic.World.corridor(seed=b, size=12.0)
        step = np.array([0.3, 0.03 * (b + 1), 0.0])
        seq_imgs, seq_gt = [], []
        for i in range(T):
            t = step * i
            xyz, ring = synthetic.simulate_scan(world, t, np.eye(3),
                                                n_rings=16, pts_per_ring=900,
                                                noise=0.004, seed=10 * b + i)
            seq_imgs.append(preprocess.preprocess_scan(xyz, ring, FCFG,
                                                       num_rings=16))
            seq_gt.append(t)
        imgs.append(seq_imgs)
        gts.append(seq_gt)
    stack = lambda f: jnp.stack(
        [jnp.stack([f(imgs[b][t]) for b in range(B)]) for t in range(T)])
    ring_images = RingImage(xyz=stack(lambda im: im.xyz),
                            rel_time=stack(lambda im: im.rel_time),
                            mask=stack(lambda im: im.mask))
    state = batch_pipeline.init_batch_state(cfg, B, n_rings=16)
    state, poses = batch_pipeline.run_batch(cfg, state, ring_images)
    est = np.asarray(poses.t)
    for b in range(B):
        err = ate_rmse(est[:, b], np.asarray(gts[b]), align=False)
        assert err < 0.10, f"seq {b}: ATE {err:.3f}"
    # eviction bounded the tables: the horizon on a 9 m run must have
    # dropped the tail (no-eviction occupancy measured ~13.4k points)
    from msf_loam_tpu.slam import voxel_map as vm
    total = int(state.surf_map.total_points())
    H = cfg.mapping.map_table_size * B
    assert total < 9000, total
