"""Multi-device tests on the 8-virtual-CPU mesh: sharded map == dense map,
data-parallel GN == single-device GN, distributed BA == exact solve."""

import jax
import jax.numpy as jnp
import numpy as np

from msf_loam_tpu.core.se3 import Pose, quat_exp, quat_rotate
from msf_loam_tpu.parallel import data_parallel, distributed_ba, mesh as mesh_mod
from msf_loam_tpu.parallel import sharded_map
from msf_loam_tpu.slam import posegraph, voxel_map

RNG = np.random.default_rng(31)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_map_matches_dense():
    mesh = mesh_mod.make_mesh(n_map=8, n_data=1)
    H, P_, cell, leaf = 1 << 12, 16, 2.0, 0.2
    pts = RNG.uniform(-10, 10, size=(3000, 3)).astype(np.float32)
    mask = np.ones(3000, bool)

    dense = voxel_map.create_map(H, P_, cell, leaf)
    dense = voxel_map.insert(dense, jnp.asarray(pts), jnp.asarray(mask))

    shard = sharded_map.create_sharded_map(mesh, H, P_, cell, leaf)
    shard = sharded_map.sharded_insert(mesh, shard, jnp.asarray(pts),
                                       jnp.asarray(mask))
    assert int(shard.count.sum()) == int(dense.count.sum())

    q = RNG.uniform(-9, 9, size=(128, 3)).astype(np.float32)
    d2_d, xyz_d, val_d = voxel_map.query_knn(dense, jnp.asarray(q),
                                             jnp.ones(128, bool), k=5)
    d2_s, xyz_s, val_s = sharded_map.sharded_query_knn(
        mesh, shard, jnp.asarray(q), jnp.ones(128, bool), k=5)
    np.testing.assert_allclose(np.asarray(d2_s), np.asarray(d2_d),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(val_s), np.asarray(val_d))


def test_dp_gauss_newton_matches_single_device():
    mesh = mesh_mod.make_mesh(n_map=1, n_data=8)
    n = 800
    true_pose = Pose(
        t=jnp.asarray(RNG.normal(size=3).astype(np.float32)) * 0.4,
        q=quat_exp(jnp.asarray(RNG.normal(size=3).astype(np.float32)) * 0.15))
    normals = RNG.normal(size=(n, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    pw = RNG.normal(size=(n, 3)).astype(np.float32) * 5
    inv = true_pose.inverse()
    ps = np.asarray(jax.vmap(lambda x: quat_rotate(inv.q, x) + inv.t)(
        jnp.asarray(pw)))

    out = data_parallel.dp_gauss_newton_plane(
        mesh, Pose.identity(), jnp.asarray(ps), jnp.asarray(pw),
        jnp.asarray(normals), jnp.ones(n, bool), n_iters=8)
    np.testing.assert_allclose(np.asarray(out.t), np.asarray(true_pose.t),
                               atol=2e-3)
    assert abs(float(jnp.sum(out.q * true_pose.q))) > 0.99999


def test_distributed_tridiag_matches_exact():
    mesh = mesh_mod.make_mesh(n_map=1, n_data=8)
    N = 64  # 8 segments x 8 poses
    D = RNG.normal(size=(N, 6, 6)).astype(np.float32)
    D = np.einsum("nij,nkj->nik", D, D) + 8 * np.eye(6, dtype=np.float32)
    U = (RNG.normal(size=(N - 1, 6, 6)) * 0.3).astype(np.float32)
    b = RNG.normal(size=(N, 6)).astype(np.float32)

    want = posegraph.solve_block_tridiag(jnp.asarray(D), jnp.asarray(U),
                                         jnp.asarray(b))
    got = distributed_ba.distributed_tridiag_solve(
        mesh, jnp.asarray(D), jnp.asarray(U), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-2, atol=5e-3)


def test_distributed_tridiag_short_segments():
    mesh = mesh_mod.make_mesh(n_map=1, n_data=8)
    N = 16  # segments of length 2 (endpoint-only, no interior)
    D = np.stack([np.eye(6, dtype=np.float32) * 4 for _ in range(N)])
    U = np.stack([np.eye(6, dtype=np.float32) * 0.5 for _ in range(N - 1)])
    b = RNG.normal(size=(N, 6)).astype(np.float32)
    want = posegraph.solve_block_tridiag(jnp.asarray(D), jnp.asarray(U),
                                         jnp.asarray(b))
    got = distributed_ba.distributed_tridiag_solve(
        mesh, jnp.asarray(D), jnp.asarray(U), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=1e-4)


def test_distributed_tridiag_multi_rhs_matches_exact():
    mesh = mesh_mod.make_mesh(n_map=1, n_data=8)
    N, m = 32, 12
    D = RNG.normal(size=(N, 6, 6)).astype(np.float32)
    D = np.einsum("nij,nkj->nik", D, D) + 8 * np.eye(6, dtype=np.float32)
    U = (RNG.normal(size=(N - 1, 6, 6)) * 0.3).astype(np.float32)
    B = RNG.normal(size=(N, 6, m)).astype(np.float32)

    want = posegraph.solve_block_tridiag_multi(
        jnp.asarray(D), jnp.asarray(U), jnp.asarray(B))
    got = distributed_ba.distributed_tridiag_solve_multi(
        mesh, jnp.asarray(D), jnp.asarray(U), jnp.asarray(B))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-2, atol=5e-3)


def test_distributed_loop_posegraph_matches_single_device():
    """Config-5 + loop closure: the distributed Woodbury solve lands on the
    same trajectory as the single-device one."""
    from tests.test_loop_closure import _drift_loop_problem

    from msf_loam_tpu.config import PoseGraphConfig
    from msf_loam_tpu.core.se3 import quat_multiply, quat_rotate

    gt, poses0, data = _drift_loop_problem(N=40)
    N = gt.t.shape[0]
    qi_inv = posegraph.quat_conjugate(gt.q[0])
    meas = Pose(
        t=quat_rotate(qi_inv, gt.t[N - 1] - gt.t[0])[None],
        q=posegraph.quat_normalize(quat_multiply(qi_inv, gt.q[N - 1]))[None])
    loops = posegraph.LoopFactors.pad(
        np.array([0]), np.array([N - 1]), meas, to_l=4)
    data = data._replace(gps_xyz=gt.t[:1],
                         gps_valid=jnp.ones(1, bool))
    cfg = PoseGraphConfig()

    mesh = mesh_mod.make_mesh(n_map=1, n_data=8)   # 40 -> 8 segments of 5
    # production path: the GN loop is one lax.scan with the shard_map
    # Schur/Woodbury solve inlined. This composition miscompiled in round 1
    # (scatter-add assembly mispartitioned at shard boundaries — see
    # scripts/xla_scatter_shardmap_repro.py); the scatter-free
    # _assemble_chain fixed it, and this test pins the fix.
    out_d = posegraph.optimize_with_loops_distributed(
        mesh, poses0, data, loops, cfg, n_iters=6)
    out_s = posegraph.optimize_with_loops(poses0, data, loops, cfg,
                                          n_iters=6)
    np.testing.assert_allclose(np.asarray(out_d.poses.t),
                               np.asarray(out_s.poses.t), atol=5e-3)
    drift1 = float(jnp.linalg.norm(out_d.poses.t[-1] - gt.t[-1]))
    drift0 = float(jnp.linalg.norm(poses0.t[-1] - gt.t[-1]))
    assert drift1 < 0.15 * drift0

    # the whole optimization inside one explicit jit must also agree
    out_j = jax.jit(
        lambda p, d, l: posegraph.optimize_with_loops_distributed(
            mesh, p, d, l, cfg, 6))(poses0, data, loops)
    np.testing.assert_allclose(np.asarray(out_j.poses.t),
                               np.asarray(out_s.poses.t), atol=5e-3)


def test_sharded_pipeline_matches_dense():
    """End-to-end config-5: the sharded-map pipeline must track the same
    trajectory as the single-device pipeline (queries are exact) — on
    motion-DISTORTED scans with motion_deskew on, so the sharded deskew +
    frame-0 insert-skip parity is covered too."""
    import dataclasses

    import jax.numpy as jnp

    from msf_loam_tpu.config import FeatureConfig, MappingConfig, MsfLoamConfig
    from msf_loam_tpu.dataio import preprocess, synthetic
    from msf_loam_tpu.ops import features as feat_mod
    from msf_loam_tpu.parallel.sharded_pipeline import ShardedSlamPipeline
    from msf_loam_tpu.slam.pipeline import SlamPipeline

    fcfg = FeatureConfig(max_points_per_ring=1024, max_less_flat=4096)
    cfg = MsfLoamConfig(
        features=fcfg,
        mapping=MappingConfig(map_table_size=1 << 12, map_cell_capacity=16,
                              max_query_points=1024))
    cfg = dataclasses.replace(cfg, odometry=dataclasses.replace(
        cfg.odometry, motion_deskew=True))
    world = synthetic.World.corridor(seed=0, size=12.0)
    scans = []
    for i in range(4):
        t = np.array([0.25 * i, 0.05 * i, 0.0])
        xyz, ring = synthetic.simulate_scan(world, t, np.eye(3), n_rings=16,
                                            pts_per_ring=900, noise=0.004,
                                            seed=i, linear_vel=[2.5, 0.5, 0.0])
        img = preprocess.preprocess_scan(xyz, ring, fcfg, 16)
        scans.append(feat_mod.extract_features(img, jnp.float32(0.1 * i), fcfg))

    mesh = mesh_mod.make_mesh(n_map=8, n_data=1)
    sp = ShardedSlamPipeline(cfg, mesh)
    dp = SlamPipeline(cfg)
    for s in scans:
        sp.process_scan(s)
        dp.process_scan(s)

    np.testing.assert_allclose(np.asarray(sp.pose_map.t),
                               np.asarray(dp.pose_map.t), atol=5e-3)
    # float-tolerance pose differences shift a few points across leaf-voxel
    # boundaries; totals must agree to a fraction of a percent
    a, b = int(sp.corner_map.count.sum()), int(dp.corner_map.count.sum())
    assert abs(a - b) <= max(5, 0.005 * b), (a, b)


def test_distributed_posegraph_matches_single_device():
    """Config-5 applied to the real GPS-fusion graph: distributed-solve GN
    must match the single-device optimizer."""
    from msf_loam_tpu.config import PoseGraphConfig
    from tests.test_posegraph import _make_trajectory

    cfg = PoseGraphConfig()
    n = 64  # 8 segments x 8 poses
    ts, gt, est = _make_trajectory(n, drift=0.02)
    data = posegraph.build_graph_data(
        jnp.asarray(ts, dtype=jnp.float32), est,
        gps_times=jnp.asarray(ts[::8], dtype=jnp.float32),
        gps_xyz=gt.t[::8], gps_valid=jnp.ones(len(ts[::8]), bool))
    out_single = posegraph.optimize(est, data, cfg, n_iters=8)
    mesh = mesh_mod.make_mesh(n_map=1, n_data=8)
    out_dist = posegraph.optimize_distributed(mesh, est, data, cfg, n_iters=8)
    np.testing.assert_allclose(np.asarray(out_dist.poses.t),
                               np.asarray(out_single.poses.t), atol=2e-3)


def test_sharded_evict_matches_dense():
    mesh = mesh_mod.make_mesh(n_map=8, n_data=1)
    H, P_, cell, leaf = 1 << 12, 16, 2.0, 0.2
    near = RNG.uniform(-8, 8, size=(500, 3)).astype(np.float32)
    far = (RNG.uniform(-8, 8, size=(500, 3)) + 400.0).astype(np.float32)
    pts = np.concatenate([near, far]).astype(np.float32)
    mask = np.ones(1000, bool)

    dense = voxel_map.create_map(H, P_, cell, leaf)
    dense = voxel_map.insert(dense, jnp.asarray(pts), jnp.asarray(mask))
    dense = voxel_map.evict_far(dense, jnp.zeros(3), radius=100.0)

    shard = sharded_map.create_sharded_map(mesh, H, P_, cell, leaf)
    shard = sharded_map.sharded_insert(mesh, shard, jnp.asarray(pts),
                                       jnp.asarray(mask))
    shard = sharded_map.sharded_evict_far(mesh, shard, jnp.zeros(3), 100.0)
    assert int(shard.count.sum()) == int(dense.count.sum())

    q = RNG.uniform(-7, 7, size=(64, 3)).astype(np.float32)
    d2_d, _, val_d = voxel_map.query_knn(dense, jnp.asarray(q),
                                         jnp.ones(64, bool), k=5)
    d2_s, _, val_s = sharded_map.sharded_query_knn(
        mesh, shard, jnp.asarray(q), jnp.ones(64, bool), k=5)
    np.testing.assert_allclose(np.asarray(d2_s), np.asarray(d2_d),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(val_s), np.asarray(val_d))


def test_sharded_map_rejects_indivisible_table():
    mesh = mesh_mod.make_mesh(n_map=8, n_data=1)
    import pytest
    with pytest.raises(ValueError, match="map_table_size"):
        sharded_map.create_sharded_map(mesh, 4097, 16, 2.0, 0.2)


def test_sharded_lio_frame_matches_single_device():
    """One tightly-coupled LIO frame with sharded maps must produce the
    same mapped pose (and map totals) as the single-device fused frame."""
    import jax.numpy as jnp

    from msf_loam_tpu.config import FeatureConfig, MappingConfig, MsfLoamConfig
    from msf_loam_tpu.dataio import preprocess, synthetic
    from msf_loam_tpu.ops import features as feat_mod
    from msf_loam_tpu.parallel import sharded_map
    from msf_loam_tpu.parallel.sharded_pipeline import sharded_lio_frame
    from msf_loam_tpu.slam import voxel_map
    from msf_loam_tpu.slam.pipeline import fused_lio_frame

    fcfg = FeatureConfig(max_points_per_ring=1024, max_less_flat=4096)
    cfg = MsfLoamConfig(
        features=fcfg,
        mapping=MappingConfig(map_table_size=1 << 12, map_cell_capacity=16,
                              max_query_points=1024))
    mc = cfg.mapping
    world = synthetic.World.corridor(seed=0, size=12.0)
    imgs = []
    for i in range(2):
        xyz, ring = synthetic.simulate_scan(
            world, np.array([0.2 * i, 0.0, 0.0]), np.eye(3), n_rings=16,
            pts_per_ring=900, noise=0.004, seed=i)
        imgs.append(preprocess.preprocess_scan(xyz, ring, fcfg, 16))
    prev_scan = feat_mod.extract_features(imgs[0], jnp.float32(0.0), fcfg)

    # seed both map states with frame-0 features (world frame = identity)
    corner0 = prev_scan.corner_less_sharp
    surf0 = prev_scan.surf_less_flat

    g = jnp.asarray(cfg.imu.gravity, jnp.float32)
    nw = 8
    dts = jnp.full((nw,), 0.0125, jnp.float32)
    accs = jnp.tile(g[None, :], (nw, 1))
    gyrs = jnp.zeros((nw, 3), jnp.float32)
    ones = jnp.ones(nw, bool)
    common = (prev_scan, imgs[1], jnp.float32(0.1), Pose.identity(),
              Pose.identity(), Pose.identity(), jnp.asarray(False),
              dts, accs, gyrs, ones, dts, accs, gyrs, ones,
              jnp.zeros(3), jnp.asarray([1.0, 0, 0, 0], jnp.float32),
              jnp.zeros(3), g)

    cm = voxel_map.create_map(mc.map_table_size, mc.map_cell_capacity,
                              mc.map_cell_size, mc.line_resolution)
    sm = voxel_map.create_map(mc.map_table_size, mc.map_cell_capacity,
                              mc.map_cell_size, mc.plane_resolution)
    cm = voxel_map.insert(cm, corner0.xyz, corner0.mask)
    sm = voxel_map.insert(sm, surf0.xyz, surf0.mask)
    dense = fused_lio_frame(cfg, cm, sm, *common)

    mesh = mesh_mod.make_mesh(n_map=8, n_data=1)
    scm = sharded_map.create_sharded_map(mesh, mc.map_table_size,
                                         mc.map_cell_capacity,
                                         mc.map_cell_size, mc.line_resolution)
    ssm = sharded_map.create_sharded_map(mesh, mc.map_table_size,
                                         mc.map_cell_capacity,
                                         mc.map_cell_size, mc.plane_resolution)
    scm = sharded_map.sharded_insert(mesh, scm, corner0.xyz, corner0.mask)
    ssm = sharded_map.sharded_insert(mesh, ssm, surf0.xyz, surf0.mask)
    shard = sharded_lio_frame(mesh, cfg, scm, ssm, *common)

    np.testing.assert_allclose(np.asarray(shard[5].t),
                               np.asarray(dense[5].t), atol=5e-3)
    # the dense path uses the cached-candidate matcher, the sharded path
    # exact per-round queries: mm-scale pose differences shift a few points
    # across leaf-voxel boundaries, so totals agree to ~1%, not exactly
    a = int(shard[0].count.sum()) + int(shard[1].count.sum())
    b = int(dense[0].count.sum()) + int(dense[1].count.sum())
    assert abs(a - b) <= max(5, 0.01 * b), (a, b)
