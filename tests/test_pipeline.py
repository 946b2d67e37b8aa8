"""End-to-end pipeline: odometry+mapping over a synthetic trajectory with
ATE bound — the golden-trajectory harness SURVEY.md §4 calls for."""

import jax.numpy as jnp
import numpy as np

from msf_loam_tpu.config import FeatureConfig, MappingConfig, MsfLoamConfig
from msf_loam_tpu.dataio import preprocess, synthetic
from msf_loam_tpu.ops import features
from msf_loam_tpu.slam.pipeline import SlamPipeline, ate_rmse

FCFG = FeatureConfig(max_points_per_ring=2048, max_less_flat=4096)
WORLD = synthetic.World.corridor(seed=0, size=12.0)


def _config():
    return MsfLoamConfig(
        features=FCFG,
        mapping=MappingConfig(map_table_size=1 << 13, max_query_points=2048),
    )


def _trajectory(n_frames):
    """Gentle arc through the corridor."""
    poses = []
    for i in range(n_frames):
        yaw = 0.02 * i
        c, s = np.cos(yaw), np.sin(yaw)
        R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
        t = np.array([0.25 * i, 0.3 * np.sin(0.1 * i), 0.0])
        poses.append((t, R))
    return poses


def _scan_features(t, R, time):
    xyz, ring = synthetic.simulate_scan(WORLD, t, R, n_rings=16,
                                        pts_per_ring=1800, noise=0.005, seed=3)
    img = preprocess.preprocess_scan(xyz, ring, FCFG, num_rings=16)
    return features.extract_features(img, jnp.float32(time), FCFG)


def test_pipeline_tracks_synthetic_trajectory():
    n = 10
    poses = _trajectory(n)
    pipe = SlamPipeline(_config())
    for i, (t, R) in enumerate(poses):
        scan = _scan_features(t, R, 0.1 * i)
        pipe.process_scan(scan)

    traj = pipe.trajectory()
    est_t = traj[:, 1:4]
    gt_t = np.asarray([p[0] for p in poses])
    err = ate_rmse(est_t, gt_t, align=False)
    assert err < 0.05, f"ATE {err:.3f} m too high"


def test_mapping_beats_pure_odometry():
    """Scan-to-map should not drift worse than raw odometry accumulation."""
    n = 8
    poses = _trajectory(n)
    pipe = SlamPipeline(_config())
    for i, (t, R) in enumerate(poses):
        pipe.process_scan(_scan_features(t, R, 0.1 * i))
    traj = pipe.trajectory()
    gt_t = np.asarray([p[0] for p in poses])
    map_err = ate_rmse(traj[:, 1:4], gt_t, align=False)
    odo_t = np.asarray([np.asarray(r.odom_pose.t) for r in pipe.results])
    odo_err = ate_rmse(odo_t, gt_t, align=False)
    assert map_err <= odo_err + 0.02


def test_ate_alignment():
    rng = np.random.default_rng(5)
    gt = rng.normal(size=(50, 3))
    # a rigidly transformed copy should align to ~zero error
    from scipy.spatial.transform import Rotation
    R = Rotation.from_rotvec([0.1, 0.2, 0.3]).as_matrix()
    est = gt @ R.T + np.array([1.0, 2.0, 3.0])
    assert ate_rmse(est, gt, align=True) < 1e-6
    assert ate_rmse(est, gt, align=False) > 1.0


def test_degenerate_hallway_does_not_blow_up():
    """A two-wall corridor leaves one direction unobservable; the damped GN
    + watchdog must keep poses finite (reference would just CHECK-abort)."""
    world = synthetic.World(
        planes=[
            synthetic.Plane(np.array([0.0, 5.0, 0.0]), np.array([0.0, -1.0, 0.0]), 200.0),
            synthetic.Plane(np.array([0.0, -5.0, 0.0]), np.array([0.0, 1.0, 0.0]), 200.0),
        ],
        poles=[])
    pipe = SlamPipeline(_config())
    for i in range(4):
        t = np.array([0.3 * i, 0.0, 0.0])
        xyz, ring = synthetic.simulate_scan(world, t, np.eye(3), n_rings=16,
                                            pts_per_ring=1800, noise=0.004,
                                            seed=i)
        img = preprocess.preprocess_scan(xyz, ring, FCFG, num_rings=16)
        feats = features.extract_features(img, jnp.float32(0.1 * i), FCFG)
        res = pipe.process_scan(feats)
        assert np.isfinite(np.asarray(res.map_pose.t)).all()
        assert np.isfinite(np.asarray(res.map_pose.q)).all()


def test_pipeline_metrics():
    pipe = SlamPipeline(_config())
    pipe.process_scan(_scan_features(*_trajectory(1)[0], 0.0))
    m = pipe.metrics()
    assert m["frames"] == 1
    assert m["map_points"]["surf"] > 0
    assert "stages" in m


def test_pipeline_deterministic():
    """Two identical runs must produce bit-identical trajectories (jit
    determinism — a serving requirement the reference cannot offer with
    Ceres threading)."""
    def run():
        pipe = SlamPipeline(_config())
        for i, (t, R) in enumerate(_trajectory(4)):
            pipe.process_scan(_scan_features(t, R, 0.1 * i))
        return pipe.trajectory()

    a, b = run(), run()
    np.testing.assert_array_equal(a, b)
