"""Fused odometry-correspondence kernel (ops/odo_corr.py) vs the XLA
reductions (interpreter mode on CPU — same kernel code as TPU; device
check: scripts/verify_odo_corr_tpu.py)."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from msf_loam_tpu.config import FeatureConfig, OdometryConfig
from msf_loam_tpu.core.se3 import Pose
from msf_loam_tpu.dataio import preprocess, synthetic
from msf_loam_tpu.ops import features
from msf_loam_tpu.ops.odo_corr import odo_corr_pallas
from msf_loam_tpu.slam import odometry

WORLD = synthetic.World.corridor(seed=0, size=12.0)
FCFG = FeatureConfig(max_points_per_ring=2048)


def _scan(t, seed):
    xyz, ring = synthetic.simulate_scan(
        WORLD, np.asarray(t, float), np.eye(3), n_rings=16,
        pts_per_ring=1800, noise=0.004, seed=seed)
    img = preprocess.preprocess_scan(xyz, ring, FCFG, num_rings=16)
    return features.extract_features(img, jnp.float32(0.0), FCFG)


def test_reductions_match_xla():
    prev = _scan([0, 0, 0], 0)
    curr = _scan([0.25, 0.05, 0], 1)
    ref = prev.surf_less_flat
    q_world = curr.surf_flat.xyz
    K, nearby = 16, 2.5

    oc = odo_corr_pallas(q_world, ref.masked_xyz(), ref.mask, ref.ring,
                         K=K, nearby=nearby, interpret=True)

    # XLA reference reductions (the pre-kernel _corr_d2 pipeline)
    d2 = np.asarray(odometry._corr_d2(
        q_world, jnp.ones(q_world.shape[0], bool), ref))
    a_sel = d2.argmin(1)
    np.testing.assert_array_equal(np.asarray(oc.a_idx), a_sel)
    # the kernel computes (dx^2+dy^2+dz^2) directly; the XLA path uses the
    # cancellation-prone |q|^2+|r|^2-2qr expansion — values differ ~1e-4
    # at corridor ranges (the kernel is the more accurate form)
    np.testing.assert_allclose(np.asarray(oc.a_d2), d2.min(1),
                               rtol=1e-3, atol=2e-3)
    ring = np.asarray(ref.ring)
    dr = np.abs(ring[None, :] - ring[a_sel][:, None]).astype(np.float32)
    c_d2 = np.where((dr > 0) & (dr <= nearby), d2, np.inf)
    finite = np.isfinite(c_d2.min(1))
    np.testing.assert_array_equal(np.asarray(oc.c_idx)[finite],
                                  c_d2.argmin(1)[finite])
    # binned candidate pool: per contiguous M/K chunk minima
    M = d2.shape[1]
    pad = (-M) % (K * 128)
    d2p = np.pad(d2, ((0, 0), (0, pad)), constant_values=1e18)
    B = d2p.shape[1] // K
    binmin = d2p.reshape(-1, K, B)
    want_idx = binmin.argmin(2) + np.arange(K)[None, :] * B
    got_idx = np.asarray(oc.cand_idx)
    real = np.asarray(oc.cand_d2) < 1e17
    np.testing.assert_array_equal(got_idx[real], want_idx[real])
    # kernel-emitted rings == gathered rings at the kernel's own indices
    np.testing.assert_array_equal(np.asarray(oc.a_ring), ring[a_sel])
    np.testing.assert_array_equal(np.asarray(oc.cand_ring)[real],
                                  ring[got_idx[real]])


def test_match_scan2scan_fused_close_to_xla():
    """End-to-end odometry with the fused kernel must land within mm of
    the XLA path (pools differ slightly: exact bins vs approx_min_k)."""
    prev = _scan([0, 0, 0], 0)
    curr = _scan([0.25, 0.05, 0], 1)
    base = OdometryConfig()
    out_x = odometry.match_scan2scan(
        prev, curr, Pose.identity(),
        dataclasses.replace(base, fused_corr="off"))
    out_f = odometry.match_scan2scan(
        prev, curr, Pose.identity(),
        dataclasses.replace(base, fused_corr="on"))
    assert bool(out_f.ok)
    # pools differ (exact bins vs approx_min_k) so poses differ by mm;
    # both must land near truth, and fused must not be worse
    np.testing.assert_allclose(np.asarray(out_f.pose_curr2last.t),
                               np.asarray(out_x.pose_curr2last.t),
                               atol=0.02)
    truth = np.array([0.25, 0.05, 0.0])
    err_f = np.linalg.norm(np.asarray(out_f.pose_curr2last.t) - truth)
    err_x = np.linalg.norm(np.asarray(out_x.pose_curr2last.t) - truth)
    assert err_f < 0.02, err_f
    assert err_f < err_x + 5e-3, (err_f, err_x)
