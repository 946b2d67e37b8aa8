"""Street-grid world, vehicle paths, drift metrics, and the feature/fit
hardening that urban geometry forced (all found on the KITTI-style eval):

* float32 plane fits on absolute coords were ill-conditioned far from the
  origin (tilted ground normals) — fit_planes is now centered TLS;
* near-collinear neighbor clusters (one ring arc on the ground) gave
  arbitrary plane normals — spread-conditioning gate;
* occlusion veils / parallel beams must not anchor corner features
  (LOAM RSS'14 §5.1, absent in the A-LOAM-derived reference);
* sectors seeing only smooth ground must not promote range-noise spikes
  to corners — sector-adaptive curvature gate.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from msf_loam_tpu.config import FeatureConfig
from msf_loam_tpu.dataio import preprocess, synthetic
from msf_loam_tpu.ops import features as feat_mod
from msf_loam_tpu.ops import fitting

RNG = np.random.default_rng(7)


# ---------------------------------------------------------------------- fits

def test_fit_planes_far_from_origin_ground_normal():
    """Regression: a ground patch 30 m out must fit normal ~z in float32
    (the old n.x=-1 adjugate solve returned arbitrary tilted normals)."""
    base = np.array([15.8, -26.9, -1.8])
    pts = base + np.concatenate(
        [RNG.uniform(-0.5, 0.5, size=(5, 2)), RNG.normal(0, 0.01, (5, 1))],
        axis=1)
    out = fitting.fit_planes(jnp.asarray(pts[None].astype(np.float32)),
                             jnp.ones((1, 5), bool))
    assert bool(out.valid[0])
    assert abs(float(out.normal[0, 2])) > 0.99


def test_fit_planes_rejects_collinear_arc():
    """A single ring arc on the ground (sagitta ~mm over a 1 m chord) spans
    only 1D — its "plane" normal is arbitrary and must be gated out."""
    theta = np.linspace(-0.017, 0.017, 5)  # ~1 m chord at r=30
    pts = np.stack([30 * np.cos(theta), 30 * np.sin(theta),
                    np.full(5, -1.8)], axis=1)
    pts += RNG.normal(0, 0.005, pts.shape)
    out = fitting.fit_planes(jnp.asarray(pts[None].astype(np.float32)),
                             jnp.ones((1, 5), bool))
    assert not bool(out.valid[0])


# ------------------------------------------------------------------ features

def _ring_image_from_ranges(r, cfg):
    """One ring in the x/y plane with given per-azimuth ranges."""
    n = len(r)
    az = np.linspace(0, 0.5, n)
    xyz = np.stack([r * np.cos(az), r * np.sin(az), np.zeros(n)], axis=1)
    return preprocess.preprocess_scan(
        xyz.astype(np.float32), np.zeros(n, np.int32), cfg, num_rings=1)


def test_unreliable_mask_blocks_occlusion_veil():
    cfg = FeatureConfig(max_points_per_ring=256, max_less_flat=256)
    r = np.full(120, 10.0)
    r[60:] = 25.0  # occluder ends -> far surface (veil side)
    img = _ring_image_from_ranges(r, cfg)
    bad = feat_mod.unreliable_mask(img.xyz, img.mask, cfg)
    bad = np.asarray(bad)[0]
    # far-side points right after the jump are blocked
    assert bad[60:66].all()
    # near-side points before the jump stay pickable
    assert not bad[50:55].any()
    # deep into the far surface it is reliable again
    assert not bad[80:90].any()


def test_adaptive_gate_rejects_noise_ground_corners():
    """A smooth-ground-only scan with cm noise must yield (almost) no
    corner picks: every 'edge' there is a noise spike."""
    cfg = FeatureConfig(max_points_per_ring=1024, max_less_flat=4096)
    world = synthetic.World(
        planes=[synthetic.Plane(np.array([0.0, 0.0, -1.8]),
                                np.array([0.0, 0.0, 1.0]), 500.0)],
        poles=[])
    xyz, ring = synthetic.simulate_scan(world, np.zeros(3), np.eye(3),
                                        n_rings=8, pts_per_ring=900,
                                        fov_up=-2.0, fov_down=-24.0,
                                        noise=0.01, seed=3)
    img = preprocess.preprocess_scan(xyz, ring, cfg, num_rings=8)
    f = feat_mod.extract_features(img, jnp.float32(0.0), cfg)
    n_corner = int(f.corner_less_sharp.mask.sum())
    # budget is 8*6*20=960; without the adaptive gate this was ~40% full
    assert n_corner <= 20, n_corner


def test_street_scene_keeps_real_corners():
    cfg = FeatureConfig(max_points_per_ring=1024, max_less_flat=8192)
    world = synthetic.World.street_grid(seed=0, n_blocks=2)
    xyz, ring = synthetic.simulate_scan(world, np.array([0.0, 0.0, 0.0]),
                                        np.eye(3), n_rings=16,
                                        pts_per_ring=900, fov_up=2.0,
                                        fov_down=-24.8, noise=0.01, seed=0)
    img = preprocess.preprocess_scan(xyz, ring, cfg, num_rings=16)
    f = feat_mod.extract_features(img, jnp.float32(0.0), cfg)
    X = np.asarray(f.corner_less_sharp.xyz)
    m = np.asarray(f.corner_less_sharp.mask)
    assert m.sum() >= 20  # poles + facade joints survive the gates
    # and they are predominantly above ground (structure, not noise)
    assert (X[m][:, 2] > -1.5).mean() > 0.6


# ------------------------------------------------------- paths / imu / drift

def test_vehicle_path_continuity_and_imu_consistency():
    wps = synthetic.street_route(n_blocks=3)
    path = synthetic.VehiclePath.from_waypoints(wps, turn_radius=8.0)
    s = np.linspace(0, path.total_length, 8000)
    pos, yaw, kap = path.state(s)
    gaps = np.linalg.norm(np.diff(pos, axis=0), axis=1)
    ds = s[1] - s[0]
    assert gaps.max() < ds * 1.05  # no jumps: arclength parameterization
    # gyro integration reproduces path yaw
    tt, acc, gyr = synthetic.synthetic_imu(path, 10.0, 0.0, 60.0, rate=400.0,
                                           accel=2.0)
    yaw_int = np.cumsum(gyr[:, 2]) / 400.0
    st = synthetic.drive_states(path, 10.0, tt, accel=2.0)
    _, yaw_p, _ = path.state(synthetic.speed_profile(tt, 10.0, 2.0)[0])
    err = np.abs(yaw_int + yaw_p[0] - np.unwrap(yaw_p))
    assert np.degrees(err.max()) < 0.5
    # specific force norm: gravity +- (tangential ramp, centripetal v^2/r)
    a = np.linalg.norm(acc, axis=1)
    assert a.min() > 9.0 and a.max() < np.hypot(9.81, 12.5) + 0.5


def test_speed_profile_ramp():
    t = np.array([0.0, 1.0, 5.0, 10.0])
    s, v, at = synthetic.speed_profile(t, 10.0, 2.0)
    np.testing.assert_allclose(v, [0.0, 2.0, 10.0, 10.0])
    np.testing.assert_allclose(s, [0.0, 1.0, 25.0, 75.0])
    np.testing.assert_allclose(at, [2.0, 2.0, 0.0, 0.0])


def test_kitti_drift_zero_and_known():
    from msf_loam_tpu.apps.evaluate import kitti_drift
    n = 500
    gt_t = np.stack([np.arange(n, dtype=float), np.zeros(n), np.zeros(n)], 1)
    gt_R = np.broadcast_to(np.eye(3), (n, 3, 3))
    out = kitti_drift(gt_t, gt_t, gt_R, gt_R)
    assert out["segments"] > 0
    assert out["t_pct"] == 0.0 and out["r_deg_per_100m"] == 0.0
    # 1% along-track scale error -> 1% translation drift
    est_t = gt_t * 1.01
    out = kitti_drift(est_t, gt_t, gt_R, gt_R)
    assert abs(out["t_pct"] - 1.0) < 0.05
    assert out["r_deg_per_100m"] < 1e-6


def test_street_grid_world_composition():
    w = synthetic.World.street_grid(seed=1, n_blocks=3)
    assert len(w.rects) >= 3 * 3 * 4 * 2  # >= 2 segments per facade
    assert len(w.poles) > 50
    culled = w.cull(np.array([0.0, 0.0, 0.0]), 80.0)
    assert len(culled.rects) < len(w.rects)
    assert len(culled.poles) < len(w.poles)


# --------------------------------------------- odometry bias fixes (round 3)

def _street_pair(i, noise=0.01):
    """Two consecutive street-world scans at 10 m/s with GT step."""
    from msf_loam_tpu.core.se3 import Pose

    world = synthetic.World.street_grid(seed=0, n_blocks=3)
    p0 = np.array([40.0 + 1.0 * i, 8.0, 0.0])
    p1 = p0 + np.array([1.0, 0.0, 0.0])
    fcfg = FeatureConfig(max_points_per_ring=2048, max_less_flat=8192)
    feats = []
    for k, p in enumerate((p0, p1)):
        xyz, ring = synthetic.simulate_scan(
            world, p, np.eye(3), n_rings=64, pts_per_ring=1800,
            fov_up=2.0, fov_down=-24.8, max_range=80.0, noise=noise,
            seed=500 + 2 * i + k)
        img = preprocess.preprocess_scan(xyz, ring, fcfg, num_rings=64)
        feats.append(feat_mod.extract_features(img, jnp.float32(0.0), fcfg))
    gt = Pose(t=jnp.asarray([1.0, 0, 0], jnp.float32),
              q=jnp.asarray([1.0, 0, 0, 0], jnp.float32))
    return feats[0], feats[1], gt


def test_odometry_plane_fit_kills_noise_bias():
    """Regression for the round-2 systematic odometry drift (VERDICT item
    1): with 1 cm scan noise the 3-point triangle construction produced a
    ~-2 cm/frame forward and ~-0.03 deg/frame yaw bias (noise-coupled
    plane normals + newly-revealed-surface mismatches). The default config
    (5+4-point TLS plane supports + round-scheduled residual gate) must
    recover the GT step to millimeters/centidegrees on street geometry."""
    from msf_loam_tpu.config import OdometryConfig
    from msf_loam_tpu.slam import odometry

    errs = []
    for i in range(3):
        last, curr, gt = _street_pair(i)
        out = odometry.match_scan2scan(last, curr, gt, OdometryConfig())
        dt = np.asarray(out.pose_curr2last.t) - np.array([1.0, 0, 0])
        q = np.asarray(out.pose_curr2last.q)
        yaw = np.degrees(2 * np.arctan2(q[3], q[0]))
        errs.append((dt[0], dt[1], yaw))
    errs = np.asarray(errs)
    # per-pair accuracy (not just mean): the old construction failed at
    # -0.02 m dx / -0.034 deg yaw SYSTEMATIC (every pair the same sign)
    assert np.all(np.abs(errs[:, 0]) < 0.02), errs   # dx per pair
    assert np.abs(errs[:, 0].mean()) < 0.012, errs   # dx bias
    assert np.abs(errs[:, 2].mean()) < 0.03, errs    # yaw bias (deg)


def test_residual_gate_rejects_revealed_surface():
    """A query 2 m above the matched ground support (the newly-revealed
    facade-bottom failure) must be gated out by corr_max_resid, and kept
    when the gate is disabled."""
    import dataclasses

    from msf_loam_tpu.config import OdometryConfig
    from msf_loam_tpu.core.pointcloud import PointBatch
    from msf_loam_tpu.core.se3 import Pose
    from msf_loam_tpu.slam import odometry

    rng = np.random.default_rng(3)
    # ref: ground plane patch, two rings
    n = 64
    ref_xyz = np.concatenate([
        np.stack([np.linspace(4, 7, n), rng.uniform(-0.4, 0.4, n),
                  np.full(n, -1.8)], axis=1),
        np.stack([np.linspace(4, 7, n), rng.uniform(0.5, 1.2, n),
                  np.full(n, -1.8)], axis=1)])
    ref = PointBatch(
        xyz=jnp.asarray(ref_xyz, jnp.float32),
        rel_time=jnp.zeros(2 * n, jnp.float32),
        ring=jnp.concatenate([jnp.full(n, 3), jnp.full(n, 4)]).astype(jnp.int32),
        mask=jnp.ones(2 * n, bool))
    # queries: one true ground point, one "revealed facade bottom" 2 m up
    q = PointBatch(
        xyz=jnp.asarray([[5.5, 0.2, -1.8], [5.5, 0.6, 0.2]], jnp.float32),
        rel_time=jnp.zeros(2, jnp.float32),
        ring=jnp.asarray([3, 3], jnp.int32),
        mask=jnp.ones(2, bool))
    cfg = OdometryConfig()
    out = odometry.find_plane_correspondences_fit(q, ref, Pose.identity(), cfg)
    assert bool(out.valid[0]) and not bool(out.valid[1])
    loose = dataclasses.replace(cfg, corr_max_resid=0.0)
    out2 = odometry.find_plane_correspondences_fit(q, ref, Pose.identity(),
                                                   loose)
    assert bool(out2.valid[0]) and bool(out2.valid[1])
