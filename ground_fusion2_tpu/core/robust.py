"""Robust loss functions as IRLS weights.

The reference uses Ceres ``HuberLoss(1.0)`` for projection/GNSS factors
(``estimator.cpp:2959``), ``CauchyLoss`` in places, and a hand-rolled
``TruncatedLoss`` for CT-ICP (``lio/src/liw/lidarFactor.h:619``). In a
Gauss-Newton/LM solver the standard trick is iteratively-reweighted least
squares: scale each residual block by ``sqrt(rho'(s))`` where ``s = ||r||^2``.
These functions return that weight; they broadcast over batches and are safe
at ``s = 0``.
"""

from __future__ import annotations

import jax.numpy as jnp


def huber_weight(sq_norm, delta: float = 1.0):
    """sqrt(rho'(s)) for the Huber loss with threshold ``delta`` (on ||r||)."""
    s = jnp.maximum(sq_norm, 1e-12)
    r = jnp.sqrt(s)
    return jnp.where(r <= delta, 1.0, jnp.sqrt(delta / r))


def cauchy_weight(sq_norm, c: float = 1.0):
    return 1.0 / jnp.sqrt(1.0 + sq_norm / (c * c))


def truncated_weight(sq_norm, sigma: float):
    """Truncated-quadratic weight (reference ``TruncatedLoss``): zero beyond
    ``sigma^2``, quadratic taper inside."""
    s2 = sigma * sigma
    inside = sq_norm <= s2
    w = jnp.where(inside, (1.0 - sq_norm / s2), 0.0)
    return jnp.where(inside, w, 0.0)


def geman_mcclure_weight(sq_norm, sigma: float = 1.0):
    s2 = sigma * sigma
    return s2 / (s2 + sq_norm)
