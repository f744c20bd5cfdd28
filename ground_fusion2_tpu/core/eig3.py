"""Closed-form symmetric 3x3 eigendecomposition, batched.

``jnp.linalg.eigh`` on ``[N, 3, 3]`` batches lowers to an iterative Jacobi
solver — measured at ~4.5 ms per 2048-batch on a TPU v5e, and the CT-ICP
plane fit calls it once per outer iteration.  For 3x3 symmetric matrices
the spectrum has a closed form (trigonometric solution of the depressed
cubic; Eberly, "A Robust Eigensolver for 3x3 Symmetric Matrices"), and the
eigenvector of an isolated eigenvalue falls out of Cayley-Hamilton:
``(A - λ1 I)(A - λ2 I)`` has column space equal to the λ0 eigenspace.

Everything here is elementwise/VPU work — no iteration, no data-dependent
control flow — so a [N] batch is one fused kernel.
"""

from __future__ import annotations

import jax.numpy as jnp


def sym_eigvals3(A: jnp.ndarray) -> jnp.ndarray:
    """Eigenvalues of symmetric ``A`` [..., 3, 3], ascending [..., 3]."""
    q = jnp.trace(A, axis1=-2, axis2=-1) / 3.0
    B = A - q[..., None, None] * jnp.eye(3, dtype=A.dtype)
    p2 = jnp.sum(B * B, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 0.0))
    p_safe = jnp.maximum(p, 1e-20)
    C = B / p_safe[..., None, None]
    r = 0.5 * jnp.linalg.det(C)
    r = jnp.clip(r, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    e_hi = q + 2.0 * p * jnp.cos(phi)
    e_lo = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e_mid = 3.0 * q - e_hi - e_lo
    return jnp.stack([e_lo, e_mid, e_hi], axis=-1)


def sym_eig3_smallest(A: jnp.ndarray):
    """(eigenvalues ascending [..., 3], unit eigenvector of the smallest
    [..., 3]) for symmetric ``A``.

    When the two smallest eigenvalues coincide the eigenvector is not
    unique; the returned vector degrades gracefully (callers gate on the
    eigenvalue gap — e.g. the a2D planarity weight is ~0 exactly there).
    """
    evals = sym_eigvals3(A)
    e0, e1, e2 = evals[..., 0], evals[..., 1], evals[..., 2]
    I = jnp.eye(3, dtype=A.dtype)
    # columns of (A - e2 I)(A - e1 I) span the e0 eigenspace
    M = (A - e2[..., None, None] * I) @ (A - e1[..., None, None] * I)
    n2 = jnp.sum(M * M, axis=-2)                     # column squared norms
    best = jnp.argmax(n2, axis=-1)
    v = jnp.take_along_axis(M, best[..., None, None], axis=-1)[..., 0]
    nv = jnp.linalg.norm(v, axis=-1, keepdims=True)
    fallback = jnp.zeros_like(v).at[..., 2].set(1.0)
    v = jnp.where(nv > 1e-20, v / jnp.maximum(nv, 1e-20), fallback)
    return evals, v
