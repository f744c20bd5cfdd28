"""Closed-form 3x3 symmetric eigensolver vs numpy (the plane-fit hot path)."""

import numpy as np
import jax.numpy as jnp

from ground_fusion2_tpu.core.eig3 import sym_eig3_smallest, sym_eigvals3


def _random_sym(rng, n, scale=1.0):
    M = rng.normal(size=(n, 3, 3)).astype(np.float32) * scale
    return (M + M.transpose(0, 2, 1)) / 2


def test_eigvals_match_numpy(rng):
    A = _random_sym(rng, 512)
    ours = np.asarray(sym_eigvals3(jnp.asarray(A)))
    ref = np.linalg.eigvalsh(A)
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_eigvals_small_scale(rng):
    # plane-fit covariances are ~1e-2 m^2 entries
    A = _random_sym(rng, 512, scale=1e-2)
    ours = np.asarray(sym_eigvals3(jnp.asarray(A)))
    ref = np.linalg.eigvalsh(A)
    np.testing.assert_allclose(ours, ref, atol=2e-7)


def test_smallest_eigenvector(rng):
    A = _random_sym(rng, 512)
    evals, v = sym_eig3_smallest(jnp.asarray(A))
    evals, v = np.asarray(evals), np.asarray(v)
    ref_w, ref_V = np.linalg.eigh(A)
    # well-separated spectra only (degenerate ones are gated by a2D=0)
    sep = (ref_w[:, 1] - ref_w[:, 0]) > 1e-2
    dot = np.abs(np.sum(v * ref_V[..., 0], axis=-1))
    assert sep.sum() > 400
    np.testing.assert_array_less(0.9999, dot[sep] + 1e-12)


def test_isotropic_and_planar():
    # isotropic: equal eigenvalues, any unit vector is fine (no NaN)
    A = jnp.tile(jnp.eye(3)[None] * 2.0, (4, 1, 1))
    evals, v = sym_eig3_smallest(A)
    np.testing.assert_allclose(np.asarray(evals), 2.0, atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(v), axis=-1), 1.0,
                               atol=1e-5)
    # exact plane: normal recovered
    rng = np.random.default_rng(1)
    pts = np.zeros((64, 3), np.float32)
    pts[:, :2] = rng.uniform(-1, 1, size=(64, 2))
    cov = (pts - pts.mean(0)).T @ (pts - pts.mean(0)) / 64
    evals, v = sym_eig3_smallest(jnp.asarray(cov[None]))
    assert abs(float(v[0, 2])) > 0.9999
