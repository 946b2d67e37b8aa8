"""Pallas fused kNN kernel vs exact brute force (interpreter mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from msf_loam_tpu.ops import pallas_knn

RNG = np.random.default_rng(41)


def _bruteforce(q, r, rmask, k):
    d = ((q[:, None, :] - r[None, :, :]) ** 2).sum(-1)
    d[:, ~rmask] = np.inf
    idx = np.argsort(d, axis=1)[:, :k]
    dd = np.take_along_axis(d, idx, axis=1)
    idx = np.where(np.isinf(dd), -1, idx)
    return dd, idx


@pytest.mark.parametrize("Q,M,k", [(64, 300, 5), (100, 2500, 8), (17, 33, 3)])
def test_pallas_knn_matches_bruteforce(Q, M, k):
    q = (RNG.uniform(-5, 5, size=(Q, 3))).astype(np.float32)
    r = (RNG.uniform(-5, 5, size=(M, 3))).astype(np.float32)
    rmask = RNG.uniform(size=M) > 0.1
    d2, idx = pallas_knn.knn_pallas(jnp.asarray(q), jnp.asarray(r),
                                    jnp.asarray(rmask), k=k, bq=32, bm=128,
                                    interpret=True)
    want_d, want_i = _bruteforce(q, r, rmask, k)
    d2, idx = np.asarray(d2), np.asarray(idx)
    np.testing.assert_allclose(
        np.where(np.isinf(want_d), 1e30, want_d),
        np.where(d2 > 1e37, 1e30, d2), rtol=1e-3, atol=1e-3)
    # indices must point at equally-near refs (ties allowed)
    for qi in range(Q):
        for kk in range(k):
            if want_i[qi, kk] < 0:
                assert idx[qi, kk] < 0
            else:
                got = idx[qi, kk]
                assert got >= 0 and rmask[got]
                dd = ((q[qi] - r[got]) ** 2).sum()
                np.testing.assert_allclose(dd, want_d[qi, kk],
                                           rtol=1e-3, atol=1e-3)


def test_pallas_knn_no_duplicate_indices():
    q = RNG.uniform(-2, 2, size=(16, 3)).astype(np.float32)
    r = RNG.uniform(-2, 2, size=(64, 3)).astype(np.float32)
    d2, idx = pallas_knn.knn_pallas(jnp.asarray(q), jnp.asarray(r),
                                    jnp.ones(64, bool), k=5, bq=16, bm=32,
                                    interpret=True)
    idx = np.asarray(idx)
    for row in idx:
        valid = row[row >= 0]
        assert len(np.unique(valid)) == len(valid), row


def test_pallas_knn_ascending_distances():
    q = RNG.uniform(-2, 2, size=(8, 3)).astype(np.float32)
    r = RNG.uniform(-2, 2, size=(128, 3)).astype(np.float32)
    d2, _ = pallas_knn.knn_pallas(jnp.asarray(q), jnp.asarray(r),
                                  jnp.ones(128, bool), k=5, bq=8, bm=64,
                                  interpret=True)
    d2 = np.asarray(d2)
    assert (np.diff(d2, axis=1) >= -1e-5).all()


def test_knn_auto_cpu_fallback():
    q = RNG.uniform(-2, 2, size=(10, 3)).astype(np.float32)
    r = RNG.uniform(-2, 2, size=(50, 3)).astype(np.float32)
    d2, idx = pallas_knn.knn_auto(jnp.asarray(q), jnp.asarray(r),
                                  jnp.ones(50, bool), k=4)
    want_d, _ = _bruteforce(q, r, np.ones(50, bool), 4)
    np.testing.assert_allclose(np.asarray(d2), want_d, rtol=1e-3, atol=1e-4)
