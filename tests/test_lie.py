import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ground_fusion2_tpu.core import lie


def random_quats(rng, n):
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    q[q[:, 0] < 0] *= -1
    return jnp.asarray(q, dtype=jnp.float32)


def test_quat_mul_matches_matrix_product(rng):
    qa, qb = random_quats(rng, 16), random_quats(rng, 16)
    Rab = lie.quat_to_mat(lie.quat_mul(qa, qb))
    RaRb = lie.quat_to_mat(qa) @ lie.quat_to_mat(qb)
    np.testing.assert_allclose(Rab, RaRb, atol=1e-5)


def test_quat_rotate_matches_matrix(rng):
    q = random_quats(rng, 16)
    v = jnp.asarray(rng.normal(size=(16, 3)), dtype=jnp.float32)
    np.testing.assert_allclose(
        lie.quat_rotate(q, v),
        jnp.einsum("nij,nj->ni", lie.quat_to_mat(q), v),
        atol=1e-5,
    )


def test_mat_quat_roundtrip(rng):
    q = random_quats(rng, 64)
    q2 = lie.mat_to_quat(lie.quat_to_mat(q))
    np.testing.assert_allclose(q, q2, atol=1e-5)


def test_exp_log_roundtrip(rng):
    phi = rng.normal(size=(32, 3))
    # keep |phi| < pi: log returns the principal branch
    phi = phi / np.linalg.norm(phi, axis=-1, keepdims=True) * rng.uniform(0, 3.0, size=(32, 1))
    phi = jnp.asarray(phi, dtype=jnp.float32)
    np.testing.assert_allclose(lie.quat_log(lie.quat_exp(phi)), phi, atol=1e-4)
    # small angles
    phi_small = jnp.asarray(rng.normal(size=(32, 3)) * 1e-6, dtype=jnp.float32)
    np.testing.assert_allclose(lie.quat_log(lie.quat_exp(phi_small)), phi_small, atol=1e-9)


def test_so3_exp_rodrigues():
    phi = jnp.array([0.0, 0.0, np.pi / 2], dtype=jnp.float32)
    R = lie.so3_exp(phi)
    expect = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=np.float32)
    np.testing.assert_allclose(R, expect, atol=1e-6)


def test_left_jacobian_definition(rng):
    # exp(phi + J_l(phi)^-1 is hard; check exp((phi + dphi)) ~= exp((J_l dphi)) exp(phi)
    phi = jnp.asarray(rng.normal(size=3) * 0.8, dtype=jnp.float32)
    dphi = jnp.asarray(rng.normal(size=3) * 1e-4, dtype=jnp.float32)
    lhs = lie.so3_exp(phi + dphi)
    Jl = lie.so3_left_jacobian(phi)
    rhs = lie.so3_exp(Jl @ dphi) @ lie.so3_exp(phi)
    np.testing.assert_allclose(lhs, rhs, atol=1e-6)


def test_right_jacobian_inv(rng):
    phi = jnp.asarray(rng.normal(size=(8, 3)) * 0.9, dtype=jnp.float32)
    Jr = lie.so3_right_jacobian(phi)
    Jri = lie.so3_right_jacobian_inv(phi)
    eye = jnp.broadcast_to(jnp.eye(3), (8, 3, 3))
    np.testing.assert_allclose(Jr @ Jri, eye, atol=1e-5)


def test_slerp_endpoints_and_midpoint(rng):
    q0, q1 = random_quats(rng, 8), random_quats(rng, 8)
    np.testing.assert_allclose(lie.quat_slerp(q0, q1, 0.0), q0, atol=1e-5)
    d = jnp.abs(jnp.sum(lie.quat_slerp(q0, q1, 1.0) * q1, axis=-1))
    np.testing.assert_allclose(d, 1.0, atol=1e-5)
    # midpoint is equidistant
    qm = lie.quat_slerp(q0, q1, 0.5)
    a0 = jnp.linalg.norm(lie.quat_boxminus(qm, q0), axis=-1)
    a1 = jnp.linalg.norm(lie.quat_boxminus(qm, q1), axis=-1)
    np.testing.assert_allclose(a0, a1, atol=1e-4)


def test_se3_compose_inverse(rng):
    q = random_quats(rng, 8)
    t = jnp.asarray(rng.normal(size=(8, 3)), dtype=jnp.float32)
    qi, ti = lie.se3_inverse(q, t)
    qc, tc = lie.se3_compose(q, t, qi, ti)
    np.testing.assert_allclose(qc[:, 0], 1.0, atol=1e-5)
    np.testing.assert_allclose(tc, 0.0, atol=1e-5)


def test_gravity_align():
    g = jnp.array([0.3, -0.2, -9.8], dtype=jnp.float32)
    R = lie.gravity_align(-g)  # accel measures -g when static
    aligned = R @ (-g)
    np.testing.assert_allclose(aligned[:2], 0.0, atol=1e-5)
    assert aligned[2] > 9.0
    # zero yaw
    ypr = lie.mat_to_ypr(R)
    np.testing.assert_allclose(ypr[0], 0.0, atol=1e-5)


def test_ypr_roundtrip(rng):
    ypr = jnp.asarray(rng.uniform(-1.0, 1.0, size=(8, 3)), dtype=jnp.float32)
    np.testing.assert_allclose(lie.mat_to_ypr(lie.ypr_to_mat(ypr)), ypr, atol=1e-5)


def test_boxplus_boxminus(rng):
    q = random_quats(rng, 8)
    d = jnp.asarray(rng.normal(size=(8, 3)) * 0.3, dtype=jnp.float32)
    q2 = lie.quat_boxplus(q, d)
    np.testing.assert_allclose(lie.quat_boxminus(q2, q), d, atol=1e-5)


def test_jit_and_grad():
    f = jax.jit(lambda phi: jnp.sum(lie.quat_rotate(lie.quat_exp(phi), jnp.ones(3))))
    g = jax.grad(f)(jnp.array([0.1, -0.2, 0.3], dtype=jnp.float32))
    assert np.all(np.isfinite(g))
    g0 = jax.grad(f)(jnp.zeros(3, dtype=jnp.float32))
    assert np.all(np.isfinite(g0))
