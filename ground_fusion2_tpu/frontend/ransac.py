"""Fundamental-matrix RANSAC outlier rejection, fully batched.

The reference rejects KLT tracks with ``cv::findFundamentalMat(RANSAC,
F_THRESHOLD=1px)`` between the previous and current undistorted points
(``feature_tracker.cpp:711`` rejectWithF). The sequential
hypothesize-and-verify loop becomes a fixed-K batch on device: K 8-point
hypotheses are sampled, solved, and scored in parallel (one vmapped SVD),
and the best hypothesis's Sampson inliers survive — no data-dependent
control flow, same contract.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _eight_point(pts1: jax.Array, pts2: jax.Array) -> jax.Array:
    """Normalized 8-point algorithm on one sample set [8, 2] x2 -> F [3,3]."""
    def hartley(p):
        c = jnp.mean(p, axis=0)
        d = jnp.mean(jnp.linalg.norm(p - c, axis=1)) + 1e-9
        s = jnp.sqrt(2.0) / d
        T = jnp.array([[s, 0, -s * c[0]], [0, s, -s * c[1]], [0, 0, 1.0]],
                      p.dtype)
        ph = jnp.concatenate([p, jnp.ones_like(p[:, :1])], axis=1)
        return (T @ ph.T).T, T

    p1, T1 = hartley(pts1)
    p2, T2 = hartley(pts2)
    x1, y1 = p1[:, 0], p1[:, 1]
    x2, y2 = p2[:, 0], p2[:, 1]
    A = jnp.stack([x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1,
                   jnp.ones_like(x1)], axis=1)              # [8, 9]
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    Fn = Vt[-1].reshape(3, 3)
    # enforce rank 2
    U, S, Vt2 = jnp.linalg.svd(Fn)
    Fn = (U * S.at[2].set(0.0)[None, :]) @ Vt2
    return T2.T @ Fn @ T1


def _sampson(F: jax.Array, pts1: jax.Array, pts2: jax.Array) -> jax.Array:
    """Sampson distance squared for each correspondence. [N]"""
    ones = jnp.ones_like(pts1[:, :1])
    x1 = jnp.concatenate([pts1, ones], axis=1)              # [N, 3]
    x2 = jnp.concatenate([pts2, ones], axis=1)
    Fx1 = x1 @ F.T                                           # [N, 3]
    Ftx2 = x2 @ F
    e = jnp.sum(x2 * Fx1, axis=1)
    denom = Fx1[:, 0] ** 2 + Fx1[:, 1] ** 2 + Ftx2[:, 0] ** 2 + Ftx2[:, 1] ** 2
    return e * e / jnp.maximum(denom, 1e-12)


@partial(jax.jit, static_argnums=(4,))
def ransac_f_reject(pts1: jax.Array, pts2: jax.Array, valid: jax.Array,
                    key: jax.Array, hypotheses: int = 64,
                    thresh: float = 1.0 / 460.0) -> jax.Array:
    """Batched F-matrix RANSAC. pts1/pts2 [F, 2] (normalized plane), valid
    [F] {0,1}. Returns the surviving mask [F] (subset of ``valid``).

    With < 12 valid correspondences the geometry is under-determined — the
    input mask is returned unchanged (reference behaviour: rejectWithF is a
    no-op for tiny sets).
    """
    Fn = pts1.shape[0]
    n_valid = jnp.sum(valid)

    # sample 8 distinct valid indices per hypothesis (Gumbel top-k over the
    # valid mask: adding log(mask) sends dead slots to -inf)
    g = jax.random.gumbel(key, (hypotheses, Fn)) + jnp.log(
        jnp.maximum(valid, 1e-30))[None, :]
    _, idx = jax.lax.top_k(g, 8)                             # [K, 8]

    def solve(one_idx):
        return _eight_point(pts1[one_idx], pts2[one_idx])

    Fs = jax.vmap(solve)(idx)                                # [K, 3, 3]
    d2 = jax.vmap(lambda Fm: _sampson(Fm, pts1, pts2))(Fs)   # [K, F]
    inl = (d2 < thresh * thresh) & (valid > 0)[None, :]
    scores = jnp.sum(inl, axis=1)
    best = jnp.argmax(scores)
    keep = inl[best].astype(valid.dtype)
    return jnp.where(n_valid >= 12, keep, valid)
