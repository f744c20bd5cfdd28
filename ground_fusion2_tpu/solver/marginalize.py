"""Dense marginalization prior (Schur complement + eigen square root).

Replaces the reference's ``MarginalizationInfo``/``MarginalizationFactor``
(``vins_estimator/src/factor/marginalization_factor.cpp``): when the oldest
frame leaves the window, every factor touching it is linearized, its states
(and the landmarks it anchors) are eliminated by Schur complement, and the
resulting dense (H*, g*) over the kept states is converted to a square-root
factor so it can re-enter the next solve as an ordinary residual block:

    H* = V S Vᵀ  (eigh, S clamped ≥ 0)
    sqrt_J = √S Vᵀ,    r0 = (√S)⁻¹ Vᵀ g*
    r_prior(dx) = sqrt_J dx + r0   ⇒   ½‖r‖² = ½ dxᵀH*dx + g*ᵀdx + const

First-estimate-Jacobian consistency comes from evaluating ``dx`` as the
boxminus of the current state from the stored linearization snapshot.

Everything here is static-shape: the caller passes *static* keep/drop index
arrays (the window layout is fixed), so the permutation bakes into the
compiled program — the reference's pointer-keyed ``addr_shift`` dance
(``estimator.cpp:3610-3640``) becomes a constant gather.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class MargPrior(NamedTuple):
    """Square-root prior over the kept tangent dims.

    ``sqrt_J`` [K, K], ``r0`` [K], plus ``valid`` so the first window (no
    prior yet) runs the same compiled program with weight 0.
    """

    sqrt_J: jax.Array
    r0: jax.Array
    valid: jax.Array  # scalar {0,1}

    @staticmethod
    def empty(k: int, dtype=jnp.float32) -> "MargPrior":
        return MargPrior(
            jnp.zeros((k, k), dtype), jnp.zeros((k,), dtype),
            jnp.zeros((), dtype),
        )

    def residual(self, dx_kept: jax.Array):
        """Residuals given current-minus-linearization tangent of kept dims."""
        r = self.sqrt_J @ dx_kept + self.r0
        w = jnp.broadcast_to(self.valid, r.shape)
        return r, w


def marginalize(
    H: jax.Array,
    g: jax.Array,
    keep_idx: np.ndarray,
    drop_idx: np.ndarray,
    eig_floor: float = 1e-8,
) -> MargPrior:
    """Schur-marginalize ``drop_idx`` dims of (H, g); return prior on keep.

    ``keep_idx``/``drop_idx`` are static (numpy) index arrays into the tangent
    layout that (H, g) was assembled in. The returned prior's dx ordering is
    ``keep_idx`` order.
    """
    keep_idx = np.asarray(keep_idx)
    drop_idx = np.asarray(drop_idx)
    perm = np.concatenate([keep_idx, drop_idx])
    k = keep_idx.shape[0]

    Hp = H[np.ix_(perm, perm)]
    gp = g[perm]

    Hkk = Hp[:k, :k]
    Hkd = Hp[:k, k:]
    Hdd = Hp[k:, k:]
    nd = Hdd.shape[0]
    # Jacobi equilibration: information spans ~1e8 (bias-walk vs pose dims);
    # f32 eigh has absolute error ~ ||H||*eps, which destroys the soft
    # directions unless each dim is scaled to unit diagonal first.
    dd = jnp.sqrt(jnp.maximum(jnp.diagonal(Hdd), eig_floor))
    Dd_inv = 1.0 / dd
    Hdd_s = Hdd * Dd_inv[:, None] * Dd_inv[None, :]
    wd, Vd = jnp.linalg.eigh(0.5 * (Hdd_s + Hdd_s.T))
    inv_wd = jnp.where(wd > 1e-6, 1.0 / jnp.maximum(wd, 1e-6), 0.0)
    # Hdd^+ = D^-1 (V S^+ V^T) D^-1
    Hdd_inv = (Dd_inv[:, None] * (Vd * inv_wd[None, :]) @ Vd.T) * Dd_inv[None, :]

    Hs = Hkk - Hkd @ Hdd_inv @ Hkd.T
    gs = gp[:k] - Hkd @ (Hdd_inv @ gp[k:])

    Hs = 0.5 * (Hs + Hs.T)
    dk = jnp.sqrt(jnp.maximum(jnp.diagonal(Hs), eig_floor))
    Dk_inv = 1.0 / dk
    Hs_s = Hs * Dk_inv[:, None] * Dk_inv[None, :]
    w, V = jnp.linalg.eigh(Hs_s)
    w_pos = jnp.maximum(w, 0.0)
    s = jnp.sqrt(w_pos)
    s_inv = jnp.where(w > 1e-6, 1.0 / jnp.maximum(s, 1e-3), 0.0)
    # H* = D (V S V^T) D  =>  sqrt_J = sqrt(S) V^T D ;  r0 solves J^T r0 = g*
    sqrt_J = s[:, None] * (V.T * dk[None, :])
    r0 = s_inv * (V.T @ (Dk_inv * gs))
    return MargPrior(sqrt_J, r0, jnp.ones((), H.dtype))


def shift_prior(prior: MargPrior, old_to_new: np.ndarray, new_dim: int) -> MargPrior:
    """Re-index a prior's kept dims into a new layout (window slide).

    ``old_to_new[i]`` = column in the new layout for prior dim ``i``; −1 drops
    the dim (its column is zeroed — used when a kept state later becomes
    untracked). Returns a prior whose dx is in new-layout order, padded to
    ``new_dim`` rows for a fixed-shape residual stack.
    """
    old_to_new = np.asarray(old_to_new)
    k_old = prior.sqrt_J.shape[1]
    assert old_to_new.shape[0] == k_old
    # scatter columns into the new layout
    P = np.zeros((k_old, new_dim), dtype=np.float32)
    for i, j in enumerate(old_to_new):
        if j >= 0:
            P[i, j] = 1.0
    sqrt_J_new = prior.sqrt_J @ jnp.asarray(P)
    # pad rows to new_dim (rows beyond k_old are zero → weightless residuals)
    pad = new_dim - sqrt_J_new.shape[0]
    if pad > 0:
        sqrt_J_new = jnp.concatenate(
            [sqrt_J_new, jnp.zeros((pad, new_dim), sqrt_J_new.dtype)], axis=0)
        r0 = jnp.concatenate([prior.r0, jnp.zeros((pad,), prior.r0.dtype)])
    else:
        r0 = prior.r0
    return MargPrior(sqrt_J_new, r0, prior.valid)
