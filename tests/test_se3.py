"""Property tests for the SE(3)/quaternion core.

Modeled on the reference's only real unit test — Qleft/Qright property
checks on random unit quaternions (utility_test.cc:8-34) — extended to the
full algebra.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msf_loam_tpu.core import se3
from msf_loam_tpu.core.se3 import Pose

RNG = np.random.default_rng(0)


def random_quat(shape=()):
    q = RNG.normal(size=shape + (4,)).astype(np.float32)
    return se3.quat_normalize(jnp.asarray(q))


def test_quat_multiply_matches_matrix_product():
    q1, q2 = random_quat((16,)), random_quat((16,))
    R = se3.quat_to_matrix(se3.quat_multiply(q1, q2))
    R12 = se3.quat_to_matrix(q1) @ se3.quat_to_matrix(q2)
    np.testing.assert_allclose(R, R12, atol=1e-5)


def test_qleft_qright_property():
    # quat_multiply(q, p) == Qleft(q) @ p  and  == Qright(p) @ q
    q, p = random_quat((8,)), random_quat((8,))
    qp = se3.quat_multiply(q, p)
    via_left = jnp.einsum("...ij,...j->...i", se3.quat_left(q), p)
    via_right = jnp.einsum("...ij,...j->...i", se3.quat_right(p), q)
    np.testing.assert_allclose(qp, via_left, atol=1e-6)
    np.testing.assert_allclose(qp, via_right, atol=1e-6)


def test_quat_rotate_matches_matrix():
    q = random_quat((8,))
    v = jnp.asarray(RNG.normal(size=(8, 3)).astype(np.float32))
    np.testing.assert_allclose(
        se3.quat_rotate(q, v),
        jnp.einsum("...ij,...j->...i", se3.quat_to_matrix(q), v),
        atol=1e-5,
    )


def test_exp_log_roundtrip():
    theta = jnp.asarray(RNG.normal(size=(32, 3)).astype(np.float32)) * 0.5
    np.testing.assert_allclose(se3.quat_log(se3.quat_exp(theta)), theta, atol=1e-5)
    # tiny angles hit the Taylor branch
    tiny = theta * 1e-8
    np.testing.assert_allclose(se3.quat_log(se3.quat_exp(tiny)), tiny, atol=1e-10)


def test_matrix_quat_roundtrip():
    q = random_quat((64,))
    q2 = se3.matrix_to_quat(se3.quat_to_matrix(q))
    # q and -q are the same rotation
    dot = jnp.abs(jnp.sum(q * q2, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_slerp_endpoints_and_midpoint():
    q0, q1 = random_quat(()), random_quat(())
    np.testing.assert_allclose(se3.quat_slerp(q0, q1, 0.0), q0, atol=1e-5)
    d = jnp.abs(jnp.sum(se3.quat_slerp(q0, q1, 1.0) * q1))
    np.testing.assert_allclose(d, 1.0, atol=1e-5)
    # midpoint is equidistant
    qm = se3.quat_slerp(q0, q1, 0.5)
    a0 = jnp.linalg.norm(se3.quat_log(se3.quat_multiply(se3.quat_conjugate(q0), qm)))
    a1 = jnp.linalg.norm(se3.quat_log(se3.quat_multiply(se3.quat_conjugate(qm), q1)))
    np.testing.assert_allclose(a0, a1, atol=1e-4)


def test_from_two_vectors():
    a = jnp.asarray(RNG.normal(size=(16, 3)).astype(np.float32))
    b = jnp.asarray(RNG.normal(size=(16, 3)).astype(np.float32))
    q = se3.quat_from_two_vectors(a, b)
    a_rot = se3.quat_rotate(q, a / jnp.linalg.norm(a, axis=-1, keepdims=True))
    b_unit = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
    np.testing.assert_allclose(a_rot, b_unit, atol=1e-5)


def test_pose_compose_inverse():
    t = jnp.asarray(RNG.normal(size=(8, 3)).astype(np.float32))
    p = Pose(t=t, q=random_quat((8,)))
    ident = p.compose(p.inverse())
    np.testing.assert_allclose(ident.t, 0.0, atol=1e-5)
    np.testing.assert_allclose(jnp.abs(ident.q[..., 0]), 1.0, atol=1e-5)


def test_pose_apply_consistency():
    p = Pose(t=jnp.asarray(RNG.normal(size=(3,)).astype(np.float32)), q=random_quat(()))
    pts = jnp.asarray(RNG.normal(size=(100, 3)).astype(np.float32))
    out_mat = p.apply(pts)  # matmul path
    out_vec = jax.vmap(lambda x: se3.quat_rotate(p.q, x) + p.t)(pts)
    np.testing.assert_allclose(out_mat, out_vec, atol=1e-5)


def test_pose_retract_local_roundtrip():
    p = Pose(t=jnp.asarray(RNG.normal(size=(3,)).astype(np.float32)), q=random_quat(()))
    delta = jnp.asarray(RNG.normal(size=(6,)).astype(np.float32)) * 0.3
    p2 = p.retract(delta)
    np.testing.assert_allclose(p.local(p2), delta, atol=1e-5)


def test_vec7_roundtrip():
    p = Pose(t=jnp.asarray(RNG.normal(size=(3,)).astype(np.float32)), q=random_quat(()))
    p2 = Pose.from_vec7(p.to_vec7())
    np.testing.assert_allclose(p.t, p2.t, atol=1e-6)
    np.testing.assert_allclose(p.q, p2.q, atol=1e-6)


def test_matrix_roundtrip():
    p = Pose(t=jnp.asarray(RNG.normal(size=(8, 3)).astype(np.float32)), q=random_quat((8,)))
    p2 = Pose.from_matrix(p.matrix())
    np.testing.assert_allclose(p.t, p2.t, atol=1e-5)
    dot = jnp.abs(jnp.sum(p.q * p2.q, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_jit_compatible():
    f = jax.jit(lambda p, d: p.retract(d).to_vec7())
    p = Pose.identity()
    out = f(p, jnp.ones((6,)) * 0.1)
    assert out.shape == (7,)
