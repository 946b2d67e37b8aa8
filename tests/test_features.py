"""Feature-extraction kernel tests: curvature numerics against a direct
python port of the reference formula, selection budgets, and behavior on a
synthetic scan (corners land on poles, flats land on walls)."""

import jax.numpy as jnp
import numpy as np

from msf_loam_tpu.config import FeatureConfig
from msf_loam_tpu.core.pointcloud import RingImage
from msf_loam_tpu.dataio import preprocess, synthetic
from msf_loam_tpu.ops import features

CFG = FeatureConfig(max_points_per_ring=1024, max_less_flat=4096)


def _reference_curvature(xyz_row, n_valid):
    """Direct translation of msf_loam_node.cc:213-236 for one ring."""
    curv = np.zeros(len(xyz_row))
    for i in range(5, n_valid - 5):
        # msf_loam_node.cc:214-234: ten +1 neighbor taps and a -10 center tap
        d = -11 * xyz_row[i] + xyz_row[i - 5:i + 6].sum(axis=0)
        curv[i] = (d ** 2).sum()
    return curv


def test_curvature_matches_reference_formula():
    rng = np.random.default_rng(1)
    n = 200
    xyz = np.zeros((2, 256, 3), np.float32)
    mask = np.zeros((2, 256), bool)
    for r in range(2):
        xyz[r, :n] = rng.normal(size=(n, 3))
        mask[r, :n] = True
    curv, eligible = features.compute_curvature(jnp.asarray(xyz), jnp.asarray(mask), CFG)
    curv = np.asarray(curv)
    eligible = np.asarray(eligible)
    for r in range(2):
        want = _reference_curvature(xyz[r], n)
        got = np.where(eligible[r], curv[r], 0.0)
        np.testing.assert_allclose(got[5:n - 5], want[5:n - 5], rtol=1e-4, atol=1e-4)
        assert not eligible[r, :5].any() and not eligible[r, n - 5:].any()


def test_sector_assignment_covers_all_sectors():
    mask = np.zeros((1, 256), bool)
    mask[0, :200] = True
    xyz = np.zeros((1, 256, 3), np.float32)
    curv, eligible = features.compute_curvature(jnp.asarray(xyz), jnp.asarray(mask), CFG)
    sector = np.asarray(features.assign_sectors(eligible, jnp.asarray([200]), CFG))
    assert set(sector[0][np.asarray(eligible[0])]) == set(range(6))
    assert (sector[0][~np.asarray(eligible[0])] == -1).all()


def _make_scan(pose_t=np.zeros(3), yaw=0.0, seed=0):
    world = synthetic.World.corridor(seed=seed, size=12.0)
    c, s = np.cos(yaw), np.sin(yaw)
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
    xyz, ring = synthetic.simulate_scan(world, pose_t, R, n_rings=16, pts_per_ring=1800)
    return preprocess.preprocess_scan(xyz, ring, CFG, num_rings=16)


def test_extract_features_budgets_and_masks():
    img = _make_scan()
    feats = features.extract_features(img, jnp.float32(0.0), CFG)
    n_sharp = int(feats.corner_sharp.count())
    n_less_sharp = int(feats.corner_less_sharp.count())
    n_flat = int(feats.surf_flat.count())
    n_less_flat = int(feats.surf_less_flat.count())
    # budgets: <= per-sector caps * 16 rings * 6 sectors
    assert 0 < n_sharp <= 16 * 6 * 2
    assert n_sharp <= n_less_sharp <= 16 * 6 * 20
    assert 0 < n_flat <= 16 * 6 * 4
    assert n_less_flat > n_flat  # less-flat is the big surf cloud
    # sharp picks are a subset of less-sharp picks (reference pushes sharp
    # into both clouds, msf_loam_node.cc:278-280)
    sharp_set = {tuple(p) for p in np.asarray(feats.corner_sharp.xyz)[np.asarray(feats.corner_sharp.mask)]}
    ls_set = {tuple(p) for p in np.asarray(feats.corner_less_sharp.xyz)[np.asarray(feats.corner_less_sharp.mask)]}
    assert sharp_set <= ls_set


def test_corner_features_have_high_curvature():
    img = _make_scan()
    curv, eligible = features.compute_curvature(img.xyz, img.mask, CFG)
    feats = features.extract_features(img, jnp.float32(0.0), CFG)
    curv = np.asarray(curv)

    # map each sharp point back to its ring-image position and check curvature
    xyz_img = np.asarray(img.xyz)
    sharp_xyz = np.asarray(feats.corner_sharp.xyz)[np.asarray(feats.corner_sharp.mask)]
    sharp_rings = np.asarray(feats.corner_sharp.ring)[np.asarray(feats.corner_sharp.mask)]
    for p, r in zip(sharp_xyz[:20], sharp_rings[:20]):
        row = xyz_img[r]
        idx = np.argmin(np.linalg.norm(row - p, axis=1))
        assert curv[r, idx] > 0.1


def test_flat_features_lie_on_planes():
    img = _make_scan()
    feats = features.extract_features(img, jnp.float32(0.0), CFG)
    flat_xyz = np.asarray(feats.surf_flat.xyz)[np.asarray(feats.surf_flat.mask)]
    world = synthetic.World.corridor(seed=0, size=12.0)
    # each flat point should be within 5 cm of some world plane
    dists = []
    for p in flat_xyz:
        d = min(abs((p - pl.point) @ pl.normal) for pl in world.planes)
        dists.append(d)
    assert np.median(dists) < 0.05


def test_no_adjacent_picks_within_suppression_window():
    img = _make_scan()
    feats = features.extract_features(img, jnp.float32(0.0), CFG)
    # sharp picks on the same ring must be > 1 index apart unless a gap break
    # occurred; weaker invariant: no two *identical* picks
    m = np.asarray(feats.corner_sharp.mask)
    pts = np.asarray(feats.corner_sharp.xyz)[m]
    assert len(np.unique(pts.round(6), axis=0)) == len(pts)


def test_relative_time_unwrap():
    # points on one ring, CW from +x axis: rel time grows linearly 0 -> 0.1
    n = 360
    ang = -np.linspace(0, 2 * np.pi, n, endpoint=False)
    xyz = np.stack([np.cos(ang), np.sin(ang), np.zeros(n)], axis=1) * 10.0
    ring = np.zeros(n, np.int32)
    rel = preprocess.compute_relative_time(xyz, ring, 0.1)
    assert rel[0] == 0.0
    assert np.all(np.diff(rel) > 0)
    np.testing.assert_allclose(rel[-1], 0.1 * (n - 1) / n, atol=1e-5)


def test_per_ring_less_flat_salt_partitions_voxels():
    # two points in the SAME world voxel on different rings: the global
    # filter keeps one, the per-ring filter (reference semantics, one
    # VoxelGrid per scan line — msf_loam_node.cc:347-348) keeps both
    from msf_loam_tpu.ops.voxel import voxel_downsample_masked
    xyz = jnp.asarray([[0.03, 0.02, 0.01], [0.05, 0.04, 0.03],
                       [3.0, 3.0, 3.0]], jnp.float32)
    mask = jnp.ones(3, bool)
    ring = jnp.asarray([0, 1, 0], jnp.int32)
    keep_global = voxel_downsample_masked(xyz, mask, 0.2)
    keep_ring = voxel_downsample_masked(xyz, mask, 0.2, salt=ring)
    assert int(keep_global.sum()) == 2
    assert int(keep_ring.sum()) == 3


def test_extract_features_batched_lane_independent():
    # flatten-lanes batched extraction (batch_pipeline's path): each lane's
    # output must depend ONLY on that lane's scan — permuting lanes must
    # permute outputs bit-for-bit. (Bitwise equality against vmapped
    # extract_features is NOT required: the two compile to different
    # programs whose float reassociation flips picks at curvature ties;
    # end-to-end equivalence vs the dense pipeline is pinned at trajectory
    # level in test_batch_pipeline.)
    import jax

    imgs = [_make_scan(pose_t=np.array([0.3 * i, 0.1 * i, 0.0]),
                       yaw=0.07 * i, seed=i) for i in range(3)]
    img_b = jax.tree.map(lambda *xs: jnp.stack(xs), *imgs)
    perm = [2, 0, 1]
    img_p = jax.tree.map(lambda a: a[np.asarray(perm)], img_b)

    out_b = features.extract_features_batched(img_b, jnp.float32(0.0), CFG)
    out_p = features.extract_features_batched(img_p, jnp.float32(0.0), CFG)

    for name in ("corner_sharp", "corner_less_sharp", "surf_flat",
                 "surf_less_flat", "full"):
        r, g = getattr(out_b, name), getattr(out_p, name)
        for field in ("xyz", "rel_time", "ring", "mask"):
            np.testing.assert_array_equal(
                np.asarray(getattr(r, field))[np.asarray(perm)],
                np.asarray(getattr(g, field)), err_msg=f"{name}.{field}")

    # budget/shape parity with the vmapped form (leaf shapes must agree so
    # batch_pipeline state threading is unchanged)
    ref = jax.vmap(lambda im: features.extract_features(
        im, jnp.float32(0.0), CFG))(img_b)
    for name in ("corner_sharp", "corner_less_sharp", "surf_flat",
                 "surf_less_flat", "full"):
        r, g = getattr(ref, name), getattr(out_b, name)
        assert r.xyz.shape == g.xyz.shape, name
        assert r.mask.shape == g.mask.shape, name
        # pick budgets land within a hair of the vmapped path (tie flips
        # only): valid counts per lane match within 2%
        rc = np.asarray(jnp.sum(r.mask, axis=1), np.float64)
        gc = np.asarray(jnp.sum(g.mask, axis=1), np.float64)
        np.testing.assert_allclose(gc, rc, rtol=0.02, err_msg=name)
