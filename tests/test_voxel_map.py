"""Voxel hash map: insert/query semantics vs brute force, leaf dedup,
slab overflow, incremental growth."""

import jax.numpy as jnp
import numpy as np

from msf_loam_tpu.slam import voxel_map

RNG = np.random.default_rng(21)


def _new_map():
    return voxel_map.create_map(table_size=1 << 12, slab_capacity=32,
                                cell_size=2.0, leaf=0.2)


def test_insert_then_query_finds_nearest():
    m = _new_map()
    pts = RNG.uniform(-10, 10, size=(2000, 3)).astype(np.float32)
    m = voxel_map.insert(m, jnp.asarray(pts), jnp.ones(2000, bool))

    q = RNG.uniform(-9, 9, size=(64, 3)).astype(np.float32)
    d2, nxyz, valid = voxel_map.query_knn(m, jnp.asarray(q), jnp.ones(64, bool), k=5)
    d2, nxyz, valid = np.asarray(d2), np.asarray(nxyz), np.asarray(valid)

    # compare against brute-force over the points actually stored in the map
    stored = np.asarray(m.points).reshape(-1, 3)
    occ = (np.arange(m.slab_capacity)[None, :] < np.asarray(m.count)[:, None]).reshape(-1)
    stored = stored[occ]
    for i in range(64):
        bf = np.sort(((stored - q[i]) ** 2).sum(1))[:5]
        # within-cell-neighborhood neighbors must match brute force whenever
        # the true NN is within one cell (cell 2.0 >> typical NN dist here)
        if valid[i, 0] and bf[0] < 1.0:
            np.testing.assert_allclose(d2[i, 0], bf[0], rtol=1e-3, atol=1e-4)


def test_leaf_dedup_on_insert():
    m = _new_map()
    # 100 copies of nearly the same point (placed mid-voxel) -> one stored
    center = np.array([0.1, 0.1, 0.1])
    pts = (center + RNG.normal(size=(100, 3)) * 0.001).astype(np.float32)
    m = voxel_map.insert(m, jnp.asarray(pts), jnp.ones(100, bool))
    assert int(m.total_points()) == 1


def test_dedup_across_inserts():
    m = _new_map()
    pts = RNG.uniform(-5, 5, size=(500, 3)).astype(np.float32)
    m = voxel_map.insert(m, jnp.asarray(pts), jnp.ones(500, bool))
    n1 = int(m.total_points())
    # inserting the same points again must not grow the map
    m = voxel_map.insert(m, jnp.asarray(pts), jnp.ones(500, bool))
    assert int(m.total_points()) == n1


def test_masked_points_not_inserted():
    m = _new_map()
    pts = RNG.uniform(-5, 5, size=(100, 3)).astype(np.float32)
    mask = np.zeros(100, bool)
    mask[:10] = True
    m = voxel_map.insert(m, jnp.asarray(pts), jnp.asarray(mask))
    assert int(m.total_points()) <= 10


def test_slab_overflow_drops_not_corrupts():
    m = voxel_map.create_map(table_size=8, slab_capacity=4, cell_size=100.0,
                             leaf=0.01)
    # all points in one cell, far more than capacity
    pts = RNG.uniform(-1, 1, size=(100, 3)).astype(np.float32)
    m = voxel_map.insert(m, jnp.asarray(pts), jnp.ones(100, bool))
    assert int(m.count.max()) <= 4
    d2, nxyz, valid = voxel_map.query_knn(m, jnp.zeros((1, 3)), jnp.ones(1, bool), k=4)
    assert bool(valid[0, 0])


def test_query_empty_map():
    m = _new_map()
    d2, nxyz, valid = voxel_map.query_knn(m, jnp.zeros((4, 3)), jnp.ones(4, bool), k=5)
    assert not np.asarray(valid).any()


def test_neighbors_across_cell_boundary():
    m = _new_map()
    # two points in adjacent cells, query between them
    pts = np.array([[1.99, 0, 0], [2.01, 0, 0]], np.float32)
    m = voxel_map.insert(m, jnp.asarray(pts), jnp.ones(2, bool))
    d2, nxyz, valid = voxel_map.query_knn(m, jnp.asarray([[2.0, 0, 0]]),
                                          jnp.ones(1, bool), k=2)
    assert bool(valid[0, 0]) and bool(valid[0, 1])
    np.testing.assert_allclose(np.asarray(d2[0]).sum(), 2 * 0.01 ** 2, atol=1e-5)


def test_evict_far_releases_distant_cells():
    m = _new_map()
    near = RNG.uniform(-5, 5, size=(200, 3)).astype(np.float32)
    far = (RNG.uniform(-5, 5, size=(200, 3)) + 500.0).astype(np.float32)
    m = voxel_map.insert(m, jnp.asarray(near), jnp.ones(200, bool))
    m = voxel_map.insert(m, jnp.asarray(far), jnp.ones(200, bool))
    total_before = int(m.total_points())
    m = voxel_map.evict_far(m, jnp.zeros(3), radius=100.0)
    total_after = int(m.total_points())
    assert total_after < total_before
    # near points still queryable, far gone
    d2, _, valid = voxel_map.query_knn(m, jnp.asarray(near[:8]),
                                       jnp.ones(8, bool), k=1)
    assert bool(np.asarray(valid).any())
    d2, _, valid = voxel_map.query_knn(m, jnp.asarray(far[:8]),
                                       jnp.ones(8, bool), k=1)
    assert not bool(np.asarray(valid).any())
    # released slots are reusable
    m = voxel_map.insert(m, jnp.asarray(far[:50]), jnp.ones(50, bool))
    d2, _, valid = voxel_map.query_knn(m, jnp.asarray(far[:8]),
                                       jnp.ones(8, bool), k=1)
    assert bool(np.asarray(valid).any())


def test_evict_far_is_collision_proof():
    # Tiny table so far and near points are guaranteed to share slots via
    # hash collisions: per-POINT eviction must keep every near point and
    # drop every far one regardless of slab cohabitation.
    m = voxel_map.create_map(table_size=8, slab_capacity=64,
                             cell_size=2.0, leaf=0.2)
    near = RNG.uniform(-5, 5, size=(40, 3)).astype(np.float32)
    far = (RNG.uniform(-5, 5, size=(40, 3)) + 500.0).astype(np.float32)
    m = voxel_map.insert(m, jnp.asarray(far), jnp.ones(40, bool))
    m = voxel_map.insert(m, jnp.asarray(near), jnp.ones(40, bool))
    stored_before = _stored(m)
    n_near_before = int((np.linalg.norm(stored_before, axis=1) < 100).sum())
    m = voxel_map.evict_far(m, jnp.zeros(3), radius=100.0)
    stored = _stored(m)
    dist = np.linalg.norm(stored, axis=1)
    assert (dist <= 100.0).all()                       # all far points gone
    assert (dist < 100.0).sum() == n_near_before       # no near point lost


def _stored(m):
    pts = np.asarray(m.points).reshape(-1, 3)
    occ = (np.arange(m.slab_capacity)[None, :]
           < np.asarray(m.count)[:, None]).reshape(-1)
    return pts[occ]


def test_evicted_slabs_stay_queryable_and_insertable():
    m = voxel_map.create_map(table_size=8, slab_capacity=64,
                             cell_size=2.0, leaf=0.2)
    near = RNG.uniform(-3, 3, size=(30, 3)).astype(np.float32)
    far = (RNG.uniform(-3, 3, size=(30, 3)) + 300.0).astype(np.float32)
    m = voxel_map.insert(m, jnp.asarray(far), jnp.ones(30, bool))
    m = voxel_map.insert(m, jnp.asarray(near), jnp.ones(30, bool))
    m = voxel_map.evict_far(m, jnp.zeros(3), radius=100.0)
    # near survivors answer queries
    _, _, valid = voxel_map.query_knn(m, jnp.asarray(near[:8]),
                                      jnp.ones(8, bool), k=1)
    assert bool(np.asarray(valid).any())
    # compacted slabs accept new inserts and dedup still works (leaf keys
    # beyond the compacted count were invalidated)
    m2 = voxel_map.insert(m, jnp.asarray(near), jnp.ones(30, bool))
    assert int(m2.total_points()) == int(m.total_points())  # all dups
    m3 = voxel_map.insert(m, jnp.asarray(far[:10]), jnp.ones(10, bool))
    assert int(m3.total_points()) > int(m.total_points())


def test_query_knn_2r_strict_matches_query_knn_and_wide_superset():
    """The strict half of the two-radius query must be bit-identical to
    query_knn; the wide half must (a) contain every strict hit and (b)
    find cross-ring points outside the strict radius but within cell_size."""
    m = _new_map()
    pts = RNG.uniform(-10, 10, size=(3000, 3)).astype(np.float32)
    m = voxel_map.insert(m, jnp.asarray(pts), jnp.ones(3000, bool))
    q = RNG.uniform(-9, 9, size=(64, 3)).astype(np.float32)
    qm = jnp.ones(64, bool)

    d2_ref, xyz_ref, v_ref = voxel_map.query_knn(m, jnp.asarray(q), qm, k=5)
    d2, xyz, v, d2w, xyzw, vw = voxel_map.query_knn_2r(
        m, jnp.asarray(q), qm, k=5, k2=16)
    np.testing.assert_array_equal(np.asarray(d2), np.asarray(d2_ref))
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))

    for i in range(64):
        strict = set(map(tuple, np.asarray(xyz[i])[np.asarray(v[i])].tolist()))
        wide = set(map(tuple, np.asarray(xyzw[i])[np.asarray(vw[i])].tolist()))
        nw = int(np.asarray(vw[i]).sum())
        assert nw == 16 or strict <= wide  # superset unless k2 overflowed
    # wide reaches beyond the strict radius
    r2 = (m.cell_size * 0.5) ** 2
    dw = np.asarray(d2w)[np.asarray(vw)]
    assert (dw > r2).any() and (dw <= m.cell_size ** 2 + 1e-5).all()


def test_empty_coord_tail_invariant():
    """Unoccupied slab entries hold EMPTY_COORD through create/insert/evict
    (the planar gather for the fused selection kernel relies on it)."""
    import numpy as np

    from msf_loam_tpu.slam.voxel_map import (EMPTY_COORD, create_map,
                                             evict_far, insert)

    rng = np.random.default_rng(0)
    m = create_map(256, 8, 2.0, 0.4)

    def check(vm):
        occ = np.arange(vm.slab_capacity)[None, :] < np.asarray(vm.count)[:, None]
        tails = np.asarray(vm.points)[~occ]
        assert tails.size == 0 or bool((tails == EMPTY_COORD).all())

    check(m)
    for step in range(3):
        pts = jnp.asarray(rng.uniform(-30, 30, (500, 3)).astype(np.float32))
        mask = jnp.asarray(rng.uniform(size=500) > 0.2)
        m = insert(m, pts, mask)
        check(m)
        m = evict_far(m, jnp.zeros(3), radius=18.0)
        check(m)
    assert int(m.total_points()) > 0


def test_gather_planar_matches_dense():
    """gather_candidates_planar == gather_candidates with the sentinel
    encoding (same slots, same occupancy semantics)."""
    import numpy as np

    from msf_loam_tpu.slam.voxel_map import (EMPTY_COORD, create_map,
                                             gather_candidates,
                                             gather_candidates_planar, insert)

    rng = np.random.default_rng(1)
    m = create_map(512, 8, 2.0, 0.4)
    pts = jnp.asarray(rng.uniform(-20, 20, (800, 3)).astype(np.float32))
    m = insert(m, pts, jnp.ones(800, bool))

    q = jnp.asarray(rng.uniform(-20, 20, (64, 3)).astype(np.float32))
    qmask = jnp.ones(64, bool)
    cand, valid = gather_candidates(m, q, qmask)
    planar = gather_candidates_planar(m, q, qmask)
    dense_from_planar = jnp.transpose(planar, (1, 2, 0))   # (Q, 8P, 3)
    got_valid = np.asarray(dense_from_planar[..., 0]) < EMPTY_COORD * 0.5
    assert np.array_equal(got_valid, np.asarray(valid))
    np.testing.assert_array_equal(
        np.asarray(dense_from_planar)[np.asarray(valid)],
        np.asarray(cand)[np.asarray(valid)])


def test_gather_planar_2l_bit_identical():
    """Two-level gather == one-level planar gather (bit-exact) when the
    unique-slot count fits the compact budget."""
    import numpy as np

    from msf_loam_tpu.slam.voxel_map import (create_map,
                                             gather_candidates_planar,
                                             gather_candidates_planar_2l,
                                             insert)

    rng = np.random.default_rng(3)
    m = create_map(1 << 12, 8, 2.0, 0.4)
    pts = jnp.asarray(rng.uniform(-30, 30, (4000, 3)).astype(np.float32))
    m = insert(m, pts, jnp.ones(4000, bool))

    q = jnp.asarray(rng.uniform(-30, 30, (256, 3)).astype(np.float32))
    qmask = jnp.ones(256, bool)
    one = gather_candidates_planar(m, q, qmask)
    two = gather_candidates_planar_2l(m, q, qmask, u_max=2048)
    np.testing.assert_array_equal(np.asarray(one), np.asarray(two))


def test_gather_planar_2l_overflow_drops_not_aliases():
    """When unique slots exceed u_max - 1, overflowed candidates become
    EMPTY_COORD (dropped) — never another cell's points."""
    import numpy as np

    from msf_loam_tpu.slam.voxel_map import (EMPTY_COORD, create_map,
                                             gather_candidates_planar,
                                             gather_candidates_planar_2l,
                                             insert)

    rng = np.random.default_rng(4)
    m = create_map(1 << 12, 8, 2.0, 0.4)
    pts = jnp.asarray(rng.uniform(-40, 40, (6000, 3)).astype(np.float32))
    m = insert(m, pts, jnp.ones(6000, bool))

    q = jnp.asarray(rng.uniform(-40, 40, (512, 3)).astype(np.float32))
    qmask = jnp.ones(512, bool)
    one = np.asarray(gather_candidates_planar(m, q, qmask))
    two = np.asarray(gather_candidates_planar_2l(m, q, qmask, u_max=64))
    # every two-level entry is either the one-level value or the sentinel
    dropped = two[0] >= EMPTY_COORD * 0.5
    assert dropped.any()          # the tiny budget must actually overflow
    # dropped entries carry the sentinel in ALL THREE coords (table
    # invariant), everything else is bit-identical to the one-level gather
    assert (two[:, dropped] >= EMPTY_COORD * 0.5).all()
    same = (two == one).all(axis=0)
    assert np.all(same | dropped)


def test_grouped_gather_bit_identical():
    """Grouped two-level gather == one-level planar gather (bit-exact) for
    every valid query whose group fits the budget; overflow/invalid
    queries see only the EMPTY_COORD sentinel."""
    import numpy as np

    from msf_loam_tpu.core.pointcloud import PointBatch
    from msf_loam_tpu.core.se3 import Pose, quat_exp
    from msf_loam_tpu.slam.pipeline import downsample_features_grouped
    from msf_loam_tpu.slam.voxel_map import (EMPTY_COORD, create_map,
                                             gather_candidates_planar,
                                             gather_candidates_planar_grouped,
                                             insert)

    rng = np.random.default_rng(7)
    # clustered points (scan-like): grouped gather targets spatial locality
    centers = rng.uniform(-20, 20, size=(30, 3)).astype(np.float32)
    pts = (centers[rng.integers(0, 30, 12000)]
           + rng.normal(0, 1.0, (12000, 3))).astype(np.float32)
    m = create_map(1 << 13, 16, 2.0, 0.4)
    m = insert(m, jnp.asarray(pts), jnp.ones(len(pts), bool))

    n = 6000
    qpts = (centers[rng.integers(0, 30, n)]
            + rng.normal(0, 1.0, (n, 3))).astype(np.float32)
    mask = rng.random(n) < 0.9
    pb = PointBatch(xyz=jnp.asarray(qpts), rel_time=jnp.zeros(n),
                    ring=jnp.zeros(n, jnp.int32), mask=jnp.asarray(mask))
    pose = Pose(t=jnp.asarray([0.3, -0.2, 0.1], jnp.float32),
                q=quat_exp(jnp.asarray([0.02, 0.0, 0.05], jnp.float32)))
    G = 1024
    ds, groups = downsample_features_grouped(
        pb, 0.4, 2048, pose.apply(pb.xyz), 2.0, G)
    gid = np.asarray(groups.gid)
    val = np.asarray(ds.mask)
    assert (np.diff(gid[val]) >= 0).all()      # grouped order

    qw = pose.apply(ds.xyz)
    one = np.asarray(gather_candidates_planar(m, qw, ds.mask))
    two = np.asarray(
        gather_candidates_planar_grouped(m, qw, groups.gid, groups.rep_pos))
    ok_rows = val & (gid < G - 1)
    assert ok_rows.sum() > 1000
    np.testing.assert_array_equal(two[:, ok_rows, :], one[:, ok_rows, :])
    drop_rows = ~ok_rows
    if drop_rows.any():
        assert (two[:, drop_rows, :] >= EMPTY_COORD * 0.5).all()


def test_grouped_gather_overflow_drops_not_aliases():
    """A tiny group budget must drop candidates (sentinel), never alias
    another group's slabs."""
    import numpy as np

    from msf_loam_tpu.core.pointcloud import PointBatch
    from msf_loam_tpu.core.se3 import Pose
    from msf_loam_tpu.slam.pipeline import downsample_features_grouped
    from msf_loam_tpu.slam.voxel_map import (EMPTY_COORD, create_map,
                                             gather_candidates_planar,
                                             gather_candidates_planar_grouped,
                                             insert)

    rng = np.random.default_rng(8)
    pts = rng.uniform(-30, 30, size=(8000, 3)).astype(np.float32)
    m = create_map(1 << 12, 8, 2.0, 0.4)
    m = insert(m, jnp.asarray(pts), jnp.ones(len(pts), bool))

    n = 4096
    qpts = rng.uniform(-30, 30, size=(n, 3)).astype(np.float32)
    pb = PointBatch(xyz=jnp.asarray(qpts), rel_time=jnp.zeros(n),
                    ring=jnp.zeros(n, jnp.int32), mask=jnp.ones(n, bool))
    pose = Pose.identity()
    G = 64                                     # deliberately tiny
    ds, groups = downsample_features_grouped(
        pb, 0.4, 1024, pose.apply(pb.xyz), 2.0, G)
    gid = np.asarray(groups.gid)
    val = np.asarray(ds.mask)
    assert (val & (gid == G - 1)).any()        # budget actually overflows

    qw = pose.apply(ds.xyz)
    one = np.asarray(gather_candidates_planar(m, qw, ds.mask))
    two = np.asarray(
        gather_candidates_planar_grouped(m, qw, groups.gid, groups.rep_pos))
    dropped = (two[0] >= EMPTY_COORD * 0.5) & (two[1] >= EMPTY_COORD * 0.5) \
        & (two[2] >= EMPTY_COORD * 0.5)
    same = (two == one).all(axis=0)
    assert np.all(same | dropped)
