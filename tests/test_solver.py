import numpy as np
import jax
import jax.numpy as jnp

from ground_fusion2_tpu.solver.gauss_newton import (
    LMResult, lm_solve, normal_equations, schur_reduce,
)
from ground_fusion2_tpu.solver.marginalize import MargPrior, marginalize, shift_prior


def test_lm_linear_least_squares(rng):
    # quadratic problem: LM must land on the closed-form solution
    D, M = 12, 40
    A = jnp.asarray(rng.normal(size=(M, D)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(M,)), jnp.float32)

    def res(delta):
        return A @ delta - b, jnp.ones((M,), jnp.float32)

    out = lm_solve(res, D, max_iters=4)
    x_star = np.linalg.lstsq(np.asarray(A), np.asarray(b), rcond=None)[0]
    np.testing.assert_allclose(out.delta, x_star, atol=1e-3)
    assert out.cost < out.cost0


def test_lm_rosenbrock_descends():
    def res(delta):
        x, y = delta[0] - 1.0, delta[1]  # start at (-1, 0)... shift so 0 is start
        r = jnp.stack([10.0 * (y - x * x), 1.0 - x])
        return r, jnp.ones((2,), jnp.float32)

    out = lm_solve(res, 2, max_iters=25)
    assert out.cost < 1e-3 * out.cost0


def test_lm_free_mask_pins_dims(rng):
    D, M = 6, 20
    A = jnp.asarray(rng.normal(size=(M, D)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(M,)), jnp.float32)

    def res(delta):
        return A @ delta - b, jnp.ones((M,), jnp.float32)

    mask = jnp.asarray([1, 1, 0, 1, 0, 1], jnp.float32)
    out = lm_solve(res, D, max_iters=6, free_mask=mask)
    np.testing.assert_allclose(out.delta[2], 0.0, atol=1e-7)
    np.testing.assert_allclose(out.delta[4], 0.0, atol=1e-7)


def test_lm_zero_weight_residuals_ignored(rng):
    D, M = 4, 30
    A = jnp.asarray(rng.normal(size=(M, D)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(M,)), jnp.float32)
    w = jnp.asarray((np.arange(M) < 20).astype(np.float32))

    def res_masked(delta):
        return A @ delta - b, w

    def res_trunc(delta):
        return A[:20] @ delta - b[:20], jnp.ones((20,), jnp.float32)

    out_m = lm_solve(res_masked, D, max_iters=4)
    out_t = lm_solve(res_trunc, D, max_iters=4)
    np.testing.assert_allclose(out_m.delta, out_t.delta, atol=5e-4)


def test_schur_reduce_matches_direct(rng):
    D, keep = 10, 6
    A = rng.normal(size=(30, D))
    H = jnp.asarray(A.T @ A, jnp.float32)
    g = jnp.asarray(rng.normal(size=(D,)), jnp.float32)
    Hr, gr = schur_reduce(H, g, keep)
    # direct solve of the full system vs reduced system for the kept block
    x_full = np.linalg.solve(np.asarray(H), -np.asarray(g))
    x_kept = np.linalg.solve(np.asarray(Hr), -np.asarray(gr))
    np.testing.assert_allclose(x_kept, x_full[:keep], rtol=1e-3, atol=1e-4)


def test_marginalize_equals_conditioning(rng):
    # Gaussian marginalization sanity: minimizing the prior over kept dims
    # must give the same minimizer as solving the full system then reading
    # kept dims.
    D = 8
    A = rng.normal(size=(40, D))
    H = jnp.asarray(A.T @ A, jnp.float32)
    g = jnp.asarray(rng.normal(size=(D,)), jnp.float32)
    keep = np.array([0, 1, 2, 5, 6])
    drop = np.array([3, 4, 7])
    prior = marginalize(H, g, keep, drop)
    # minimize 0.5||sqrt_J dx + r0||^2 -> dx* = -(JᵀJ)⁻¹ Jᵀ r0
    Js, r0 = np.asarray(prior.sqrt_J), np.asarray(prior.r0)
    dx_star = np.linalg.lstsq(Js, -r0, rcond=None)[0]
    x_full = np.linalg.solve(np.asarray(H), -np.asarray(g))
    np.testing.assert_allclose(dx_star, x_full[keep], rtol=1e-3, atol=1e-4)


def test_marginalize_handles_rank_deficiency(rng):
    # unobserved dropped dim (zero row/col) must not produce NaNs
    D = 6
    A = rng.normal(size=(20, D))
    A[:, 4] = 0.0  # dim 4 unobserved
    H = jnp.asarray(A.T @ A, jnp.float32)
    g = jnp.asarray(rng.normal(size=(D,)) * 0.1, jnp.float32)
    g = g.at[4].set(0.0)
    prior = marginalize(H, g, np.array([0, 1, 2]), np.array([3, 4, 5]))
    assert bool(jnp.all(jnp.isfinite(prior.sqrt_J)))
    assert bool(jnp.all(jnp.isfinite(prior.r0)))


def test_shift_prior_permutation(rng):
    D = 5
    A = rng.normal(size=(20, D))
    H = jnp.asarray(A.T @ A, jnp.float32)
    g = jnp.asarray(rng.normal(size=(D,)), jnp.float32)
    prior = marginalize(H, g, np.array([0, 1, 2, 3]), np.array([4]))
    # new layout: old kept dims [0,1,2,3] -> new positions [2,3,0,1], new_dim 6
    shifted = shift_prior(prior, np.array([2, 3, 0, 1]), 6)
    dx_old = jnp.asarray(rng.normal(size=(4,)), jnp.float32)
    dx_new = jnp.zeros((6,), jnp.float32)
    dx_new = dx_new.at[jnp.asarray([2, 3, 0, 1])].set(dx_old)
    r_old, _ = prior.residual(dx_old)
    r_new, _ = shifted.residual(dx_new)
    np.testing.assert_allclose(r_new[: r_old.shape[0]], r_old, atol=1e-5)


def test_empty_prior_zero_weight():
    p = MargPrior.empty(7)
    r, w = p.residual(jnp.ones(7, jnp.float32))
    np.testing.assert_allclose(w, 0.0)
