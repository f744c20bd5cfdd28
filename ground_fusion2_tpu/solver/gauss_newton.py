"""Dense masked Gauss-Newton / Levenberg-Marquardt in tangent space.

TPU-first replacement for Ceres (reference ``estimator.cpp:3364-3379``
DENSE_SCHUR + DOGLEG): the whole sliding window's tangent space is a few
hundred dimensions, so we materialize the dense per-residual Jacobian with
``jax.jacfwd`` and assemble the normal equations with one MXU matmul
``H = JᵀWJ`` — no sparse bookkeeping, no scatter. Rank-deficient directions
(masked-out states, unobserved landmarks) are handled by zeroing Jacobian
columns and unit-diagonal augmentation, so one compiled program serves every
gating configuration (stationary freeze, fixed extrinsics, dropped wheel
factors, ...).

The residual callback contract:

    residual_fn(delta: [D]) -> (r: [M], w: [M])

where ``delta`` is the tangent-space perturbation at the current
linearization point (the caller closes over the state and applies its own
retraction), ``r`` the stacked residuals already scaled by sqrt-information,
and ``w`` per-residual nonnegative weights (0 = masked-out residual; robust
IRLS weights go here). The solve is exactly least squares on ``w ⊙ r``.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class LMResult(NamedTuple):
    delta: jax.Array        # [D] accumulated tangent update
    cost: jax.Array         # final robust cost 0.5 * ||w r||^2
    cost0: jax.Array        # initial cost
    H: jax.Array            # [D, D] Gauss-Newton Hessian at the final iterate
    g: jax.Array            # [D] gradient Jᵀ W r at the final iterate
    lam: jax.Array          # final damping
    n_iters: jax.Array


def _linearize(residual_fn, delta):
    """Dense J at ``delta`` plus residuals/weights there."""
    r, w = residual_fn(delta)
    J = jax.jacfwd(lambda d: residual_fn(d)[0])(delta)
    return r, w, J


def normal_equations(residual_fn: Callable, delta: jax.Array):
    """(H, g, cost) of the weighted least-squares problem at ``delta``."""
    r, w, J = _linearize(residual_fn, delta)
    Jw = J * w[:, None]
    rw = r * w
    H = Jw.T @ Jw
    g = Jw.T @ rw
    cost = 0.5 * jnp.sum(rw * rw)
    return H, g, cost


def _solve_damped(H, g, lam, free_mask):
    """Solve (H + lam*diag(H) + I_masked) dx = -g with masked dims pinned."""
    D = H.shape[0]
    dtype = H.dtype
    if free_mask is None:
        free_mask = jnp.ones((D,), dtype=dtype)
    fm = free_mask.astype(dtype)
    # zero rows/cols of fixed dims, unit diagonal there
    Hm = H * fm[:, None] * fm[None, :]
    diag = jnp.diagonal(Hm)
    damped = Hm + jnp.diag(lam * jnp.maximum(diag, 1e-8) + (1.0 - fm))
    gm = g * fm
    # Jacobi equilibration: keeps the f32 Cholesky stable when information
    # spans many orders of magnitude (bias-walk vs pose dims)
    d = jnp.sqrt(jnp.maximum(jnp.diagonal(damped), 1e-12))
    d_inv = 1.0 / d
    Hs = damped * d_inv[:, None] * d_inv[None, :]
    L = jax.scipy.linalg.cho_factor(Hs, lower=True)
    dx = -d_inv * jax.scipy.linalg.cho_solve(L, gm * d_inv)
    return dx * fm


@partial(jax.jit, static_argnames=(
    "residual_fn", "dim", "max_iters", "inner_tries", "dtype"))
def lm_solve(
    residual_fn: Callable,
    dim: int,
    max_iters: int = 8,
    inner_tries: int = 1,
    free_mask: jax.Array | None = None,
    init_lambda: float = 1e-4,
    lambda_up: float = 10.0,
    lambda_down: float = 0.3,
    dtype=jnp.float32,
) -> LMResult:
    """Levenberg-Marquardt on ``residual_fn`` starting from delta = 0.

    ``max_iters`` outer linearizations (the reference budget is 8,
    ``m3dgr.yaml:108``); each accepts or rejects a damped step by true-cost
    comparison. Fixed trip count — rejected steps simply raise lambda, so the
    compiled program has static shape. ``free_mask`` ([D] of {0,1}) pins
    tangent dimensions (SetParameterBlockConstant equivalent).
    """
    del inner_tries  # single try per linearization keeps the loop compact
    delta0 = jnp.zeros((dim,), dtype=dtype)

    def cost_at(delta):
        r, w = residual_fn(delta)
        rw = r * w
        # keep the scan carry dtype-stable even when the residuals run at a
        # different precision (e.g. f64 measurement runs)
        return (0.5 * jnp.sum(rw * rw)).astype(dtype)

    def body(carry, _):
        delta, lam, cost = carry
        H, g, _ = normal_equations(residual_fn, delta)
        dx = _solve_damped(H, g, lam, free_mask).astype(dtype)
        new_delta = delta + dx
        new_cost = cost_at(new_delta)
        accept = new_cost < cost
        delta = jnp.where(accept, new_delta, delta)
        cost_out = jnp.where(accept, new_cost, cost)
        lam = jnp.where(accept, jnp.maximum(lam * lambda_down, 1e-9),
                        jnp.minimum(lam * lambda_up, 1e6))
        return (delta, lam, cost_out), None

    cost0 = cost_at(delta0)
    (delta, lam, cost), _ = jax.lax.scan(
        body, (delta0, jnp.asarray(init_lambda, dtype), cost0), None,
        length=max_iters,
    )
    H, g, _ = normal_equations(residual_fn, delta)
    return LMResult(delta, cost, cost0, H, g, lam,
                    jnp.asarray(max_iters, jnp.int32))


def schur_reduce(H, g, keep: int):
    """Eliminate the trailing block of the normal equations.

    Partition ``H = [[Hkk, Hkl], [Hlk, Hll]]`` with ``keep`` leading dims;
    returns the reduced system on the kept block:
      H' = Hkk − Hkl Hll⁻¹ Hlk,   g' = gk − Hkl Hll⁻¹ gl.

    Used (a) to eliminate landmark inverse-depths before cross-device psum in
    distributed BA, (b) as the core of marginalization. ``Hll`` is regularized
    by a tiny diagonal so unobserved landmarks (zero rows) are harmless.
    """
    Hkk = H[:keep, :keep]
    Hkl = H[:keep, keep:]
    Hll = H[keep:, keep:]
    gk = g[:keep]
    gl = g[keep:]
    nl = Hll.shape[0]
    Hll = Hll + jnp.eye(nl, dtype=H.dtype) * 1e-8
    L = jax.scipy.linalg.cho_factor(Hll, lower=True)
    Hll_inv_Hlk = jax.scipy.linalg.cho_solve(L, Hkl.T)
    Hll_inv_gl = jax.scipy.linalg.cho_solve(L, gl)
    return Hkk - Hkl @ Hll_inv_Hlk, gk - Hkl @ Hll_inv_gl
