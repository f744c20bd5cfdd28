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
    per-sample nominal trajectory (for undistortion)."""
    def step(carry, inp):
        a, g, d, m = inp
        s1 = predict_step(carry, a, g, d * m, opt)
        return s1, (s1.p, s1.q, s1.v)

    s_out, traj = jax.lax.scan(step, s, (acc, gyr, dt, mask.astype(s.p.dtype)))
    return s_out, traj


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
