"""18-state error-state Kalman filter (p, v, R, bg, ba, g) — jitted.

Rebuild of the reference ESKF (``lio/src/algo/eskf.hpp:28-260``): nominal
state propagated by IMU midpoint integration, error-state covariance by the
first-order transition; SE(3) observation from the ICP result fuses with a
Kalman update and injects the error into the nominal state.

All steps are pure functions over a :class:`EskfState` pytree; the per-scan
IMU batch propagates in one ``lax.scan``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie

# error-state ordering: [δp(0:3), δv(3:6), δθ(6:9), δbg(9:12), δba(12:15), δg(15:18)]
DIM = 18


class EskfOptions(NamedTuple):
    gyr_var: float = 1e-4          # reference gyro_var_^2 style discrete vars
    acc_var: float = 1e-2
    bias_gyr_var: float = 1e-8
    bias_acc_var: float = 1e-6
    g_norm: float = 9.81


class EskfState(NamedTuple):
    p: jax.Array    # [3]
    v: jax.Array    # [3]
    q: jax.Array    # [4]
    bg: jax.Array   # [3]
    ba: jax.Array   # [3]
    g: jax.Array    # [3] gravity vector in world (≈ [0,0,-9.81])
    cov: jax.Array  # [18,18]

    @staticmethod
    def initial(g_norm=9.81, dtype=jnp.float32) -> "EskfState":
        return EskfState(
            p=jnp.zeros(3, dtype), v=jnp.zeros(3, dtype),
            q=lie.quat_identity(dtype=dtype),
            bg=jnp.zeros(3, dtype), ba=jnp.zeros(3, dtype),
            g=jnp.asarray([0.0, 0.0, -g_norm], dtype),
            cov=jnp.eye(DIM, dtype=dtype) * 1e-4)


def predict_step(s: EskfState, acc: jax.Array, gyr: jax.Array, dt,
                 opt: EskfOptions) -> EskfState:
    """One IMU sample propagation (reference ``ESKF::Predict``)."""
    dtype = s.p.dtype
    acc_c = acc - s.ba
    gyr_c = gyr - s.bg
    R = lie.quat_to_mat(s.q)
    a_world = R @ acc_c + s.g

    p1 = s.p + s.v * dt + 0.5 * a_world * dt * dt
    v1 = s.v + a_world * dt
    q1 = lie.quat_normalize(lie.quat_mul(s.q, lie.quat_exp(gyr_c * dt)))

    I3 = jnp.eye(3, dtype=dtype)
    F = jnp.eye(DIM, dtype=dtype)
    F = F.at[0:3, 3:6].set(I3 * dt)
    F = F.at[3:6, 6:9].set(-R @ lie.hat(acc_c) * dt)
    F = F.at[3:6, 12:15].set(-R * dt)
    F = F.at[3:6, 15:18].set(I3 * dt)
    F = F.at[6:9, 6:9].set(lie.so3_exp(-gyr_c * dt))
    F = F.at[6:9, 9:12].set(-I3 * dt)

    qdiag = jnp.concatenate([
        jnp.zeros(3, dtype),
        jnp.full((3,), opt.acc_var, dtype) * dt * dt,
        jnp.full((3,), opt.gyr_var, dtype) * dt * dt,
        jnp.full((3,), opt.bias_gyr_var, dtype) * dt,
        jnp.full((3,), opt.bias_acc_var, dtype) * dt,
        jnp.zeros(3, dtype),
    ])
    cov1 = F @ s.cov @ F.T + jnp.diag(qdiag)
    return s._replace(p=p1, v=v1, q=q1, cov=cov1)


def predict_batch(s: EskfState, acc: jax.Array, gyr: jax.Array,
                  dt: jax.Array, mask: jax.Array, opt: EskfOptions):
    """Propagate through [N] samples (masked), returning final state and the
    per-sample nominal trajectory (for undistortion).

    Parallel-in-N formulation (a sequential ``lax.scan`` of 18x18 steps
    measured ~170 ms on a remote TPU; this runs in ~1 ms):

    * the orientation chain q_{i+1} = q_i ⊗ exp(ω_i dt_i) is a prefix
      product — ``associative_scan`` over quaternion multiplication;
    * velocity/position are prefix sums of the (now batched) world-frame
      accelerations;
    * the covariance update cov ↦ F cov Fᵀ + Q composes associatively:
      (F₂, Q₂) ∘ (F₁, Q₁) = (F₂F₁, F₂Q₁F₂ᵀ + Q₂), so the [N] per-sample
      transitions reduce in log depth of batched 18x18 matmuls.

    Identical discretization to :func:`predict_step` (same F, same Q),
    modulo fp reassociation and per-step quaternion renormalization.
    """
    dtype = s.p.dtype
    N = dt.shape[0]
    m = mask.astype(dtype)
    d = dt * m                                         # masked step = no-op

    acc_c = acc[:N] - s.ba[None]                       # [N, 3]
    gyr_c = gyr[:N] - s.bg[None]

    # --- orientation prefix chain --------------------------------------
    dq = lie.quat_exp(gyr_c * d[:, None])              # [N, 4]
    q_incl = lie.quat_normalize(
        lie.quat_mul(s.q[None], jax.lax.associative_scan(lie.quat_mul, dq)))
    q_excl = jnp.concatenate([s.q[None], q_incl[:-1]], axis=0)  # q at step start

    # --- velocity / position prefix sums -------------------------------
    a_world = lie.quat_rotate(q_excl, acc_c) + s.g[None]        # [N, 3]
    dv = a_world * d[:, None]
    v_incl = s.v[None] + jnp.cumsum(dv, axis=0)
    v_excl = jnp.concatenate([s.v[None], v_incl[:-1]], axis=0)
    dp = v_excl * d[:, None] + 0.5 * a_world * d[:, None] ** 2
    p_incl = s.p[None] + jnp.cumsum(dp, axis=0)

    # --- covariance: associative composition of (F, Q) -----------------
    I3 = jnp.eye(3, dtype=dtype)
    R = lie.quat_to_mat(q_excl)                        # [N, 3, 3]
    F = jnp.tile(jnp.eye(DIM, dtype=dtype)[None], (N, 1, 1))
    dN = d[:, None, None]
    F = F.at[:, 0:3, 3:6].set(I3[None] * dN)
    F = F.at[:, 3:6, 6:9].set(-jnp.einsum(
        "nij,njk->nik", R, jax.vmap(lie.hat)(acc_c)) * dN)
    F = F.at[:, 3:6, 12:15].set(-R * dN)
    F = F.at[:, 3:6, 15:18].set(I3[None] * dN)
    F = F.at[:, 6:9, 6:9].set(jax.vmap(lie.so3_exp)(-gyr_c * d[:, None]))
    F = F.at[:, 6:9, 9:12].set(-I3[None] * dN)

    qd = jnp.concatenate([
        jnp.zeros((N, 3), dtype),
        jnp.full((N, 3), opt.acc_var, dtype) * d[:, None] ** 2,
        jnp.full((N, 3), opt.gyr_var, dtype) * d[:, None] ** 2,
        jnp.full((N, 3), opt.bias_gyr_var, dtype) * d[:, None],
        jnp.full((N, 3), opt.bias_acc_var, dtype) * d[:, None],
        jnp.zeros((N, 3), dtype),
    ], axis=-1)
    Q = jax.vmap(jnp.diag)(qd)                         # [N, 18, 18]

    def combine(a, b):
        """Apply transition a then b: later ∘ earlier (scan is in step
        order, so b is the later sample)."""
        Fa, Qa = a
        Fb, Qb = b
        return Fb @ Fa, Fb @ Qa @ jnp.swapaxes(Fb, -1, -2) + Qb

    F_tot, Q_tot = jax.tree.map(
        lambda x: x[-1], jax.lax.associative_scan(combine, (F, Q), axis=0))
    cov1 = F_tot @ s.cov @ F_tot.T + Q_tot

    s_out = s._replace(p=p_incl[-1], v=v_incl[-1], q=q_incl[-1], cov=cov1)
    return s_out, (p_incl, q_incl, v_incl)


def observe_se3(s: EskfState, p_obs: jax.Array, q_obs: jax.Array,
                trans_noise: float = 1e-2, ang_noise: float = 1e-2
                ) -> EskfState:
    """Fuse an SE(3) pose observation (reference ``ObserveSE3``)."""
    dtype = s.p.dtype
    H = jnp.zeros((6, DIM), dtype)
    H = H.at[0:3, 0:3].set(jnp.eye(3, dtype=dtype))
    H = H.at[3:6, 6:9].set(jnp.eye(3, dtype=dtype))

    noise = jnp.diag(jnp.concatenate([
        jnp.full((3,), trans_noise**2, dtype),
        jnp.full((3,), ang_noise**2, dtype)]))
    S = H @ s.cov @ H.T + noise
    K = s.cov @ H.T @ jnp.linalg.inv(S)

    innov = jnp.concatenate([
        p_obs - s.p,
        lie.quat_boxminus(q_obs, s.q),
    ])
    dx = K @ innov
    cov1 = (jnp.eye(DIM, dtype=dtype) - K @ H) @ s.cov

    return EskfState(
        p=s.p + dx[0:3],
        v=s.v + dx[3:6],
        q=lie.quat_boxplus(s.q, dx[6:9]),
        bg=s.bg + dx[9:12],
        ba=s.ba + dx[12:15],
        g=s.g + dx[15:18],
        cov=cov1)
