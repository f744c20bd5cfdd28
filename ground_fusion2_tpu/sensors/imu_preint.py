"""IMU preintegration as a single ``lax.scan`` — TPU-native replacement for the
reference's per-sample C++ loop (``vins_estimator/src/factor/integration_base.h``).

Model (midpoint rule, VINS-Mono lineage):
  un_acc_0 = R(dq_k) (a_k - ba)
  w        = 0.5 (g_k + g_{k+1}) - bg
  dq_{k+1} = dq_k ⊗ exp(w dt)
  un_acc_1 = R(dq_{k+1}) (a_{k+1} - ba)
  acc      = 0.5 (un_acc_0 + un_acc_1)
  dp_{k+1} = dp_k + dv_k dt + 0.5 acc dt^2
  dv_{k+1} = dv_k + acc dt

Error-state order: [δp(0:3), δθ(3:6), δv(6:9), δba(9:12), δbg(12:15)].
Per step the 15×15 transition F and 15×18 noise map V propagate the
covariance ``P ← F P Fᵀ + V Q Vᵀ`` and the bias Jacobian ``J ← F J`` used for
first-order bias correction at evaluation time (no repropagation on device;
the reference repropagates on large bias deltas — we expose
:func:`preintegrate` as a pure function so a re-scan is just calling it again).

Fixed shapes: every preintegration interval carries ``MAX_IMU_PER_FRAME``
samples with a validity mask; masked samples are zero-dt no-ops, so one
compiled scan serves every frame.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie


class ImuNoise(NamedTuple):
    """Continuous-time noise densities (match reference YAML keys
    ``acc_n, gyr_n, acc_w, gyr_w``)."""

    acc_n: float = 0.1
    gyr_n: float = 0.01
    acc_w: float = 0.001
    gyr_w: float = 0.0001


class ImuPreint(NamedTuple):
    """Result of preintegrating one interval. All fields broadcast over batch."""

    dp: jax.Array        # [..., 3]
    dq: jax.Array        # [..., 4]
    dv: jax.Array        # [..., 3]
    cov: jax.Array       # [..., 15, 15]
    jac: jax.Array       # [..., 15, 15]  d(delta)/d(linearization-point error)
    sum_dt: jax.Array    # [...]
    ba: jax.Array        # [..., 3] linearization-point accel bias
    bg: jax.Array        # [..., 3] linearization-point gyro bias


def _step(carry, inp, Q):
    dp, dq, dv, cov, J = carry
    acc0, gyr0, acc1, gyr1, dt = inp
    dtype = dp.dtype

    w = 0.5 * (gyr0 + gyr1)
    dq1 = lie.quat_normalize(lie.quat_mul(dq, lie.quat_exp(w * dt)))
    R0 = lie.quat_to_mat(dq)
    R1 = lie.quat_to_mat(dq1)
    un_acc_0 = R0 @ acc0
    un_acc_1 = R1 @ acc1
    acc = 0.5 * (un_acc_0 + un_acc_1)
    dp1 = dp + dv * dt + 0.5 * acc * dt * dt
    dv1 = dv + acc * dt

    # --- error-state transition -------------------------------------------
    I3 = jnp.eye(3, dtype=dtype)
    A0 = lie.hat(acc0)   # [a_k - ba]x (inputs arrive bias-corrected)
    A1 = lie.hat(acc1)
    Wx = lie.hat(w)
    Rw = I3 - Wx * dt    # first-order exp(-w dt)

    F = jnp.zeros((15, 15), dtype=dtype)
    F = F.at[0:3, 0:3].set(I3)
    F = F.at[0:3, 3:6].set(-0.25 * dt * dt * (R0 @ A0 + R1 @ A1 @ Rw))
    F = F.at[0:3, 6:9].set(I3 * dt)
    F = F.at[0:3, 9:12].set(-0.25 * (R0 + R1) * dt * dt)
    F = F.at[0:3, 12:15].set(0.25 * (R1 @ A1) * dt * dt * dt)
    F = F.at[3:6, 3:6].set(Rw)
    F = F.at[3:6, 12:15].set(-I3 * dt)
    F = F.at[6:9, 3:6].set(-0.5 * dt * (R0 @ A0 + R1 @ A1 @ Rw))
    F = F.at[6:9, 6:9].set(I3)
    F = F.at[6:9, 9:12].set(-0.5 * (R0 + R1) * dt)
    F = F.at[6:9, 12:15].set(0.5 * (R1 @ A1) * dt * dt)
    F = F.at[9:12, 9:12].set(I3)
    F = F.at[12:15, 12:15].set(I3)

    # noise order: [na0, nw0, na1, nw1, nba, nbg]
    V = jnp.zeros((15, 18), dtype=dtype)
    V = V.at[0:3, 0:3].set(0.25 * R0 * dt * dt)
    V = V.at[0:3, 3:6].set(-0.125 * (R1 @ A1) * dt * dt * dt)
    V = V.at[0:3, 6:9].set(0.25 * R1 * dt * dt)
    V = V.at[0:3, 9:12].set(-0.125 * (R1 @ A1) * dt * dt * dt)
    V = V.at[3:6, 3:6].set(0.5 * I3 * dt)
    V = V.at[3:6, 9:12].set(0.5 * I3 * dt)
    V = V.at[6:9, 0:3].set(0.5 * R0 * dt)
    V = V.at[6:9, 3:6].set(-0.25 * (R1 @ A1) * dt * dt)
    V = V.at[6:9, 6:9].set(0.5 * R1 * dt)
    V = V.at[6:9, 9:12].set(-0.25 * (R1 @ A1) * dt * dt)
    V = V.at[9:12, 12:15].set(I3 * dt)
    V = V.at[12:15, 15:18].set(I3 * dt)

    cov1 = F @ cov @ F.T + V @ (Q * dt_safe_scale(dt)) @ V.T
    J1 = F @ J
    return (dp1, dq1, dv1, cov1, J1), None


def dt_safe_scale(dt):
    """The reference uses discrete per-sample sigmas directly (noise already
    includes the rate); identity hook kept for continuous-time scaling."""
    return 1.0


def preintegrate(
    acc: jax.Array,
    gyr: jax.Array,
    dt: jax.Array,
    ba: jax.Array,
    bg: jax.Array,
    noise: ImuNoise,
    mask: jax.Array | None = None,
) -> ImuPreint:
    """Preintegrate an interval of IMU samples.

    Args:
      acc, gyr: [N+1, 3] raw samples (endpoints included).
      dt:       [N] sample spacings.
      ba, bg:   [3] linearization-point biases.
      noise:    continuous noise densities (discrete sigmas, reference style).
      mask:     [N] validity of each interval; masked steps are no-ops.

    Returns a :class:`ImuPreint` (fp32 or input dtype).
    """
    dtype = acc.dtype
    n = dt.shape[0]
    if mask is None:
        mask = jnp.ones((n,), dtype=dtype)
    dt = dt * mask.astype(dtype)

    acc_c = acc - ba
    gyr_c = gyr - bg

    q = jnp.array(
        [noise.acc_n**2] * 3 + [noise.gyr_n**2] * 3 + [noise.acc_n**2] * 3
        + [noise.gyr_n**2] * 3 + [noise.acc_w**2] * 3 + [noise.gyr_w**2] * 3,
        dtype=dtype,
    )
    Q = jnp.diag(q)

    # ---- parallel-in-N formulation --------------------------------------
    # The sequential scan costs N dependent 15x15 matmul steps; on TPU the
    # chain reassociates: the orientation is a quaternion prefix product,
    # kinematics are prefix sums, and the covariance/Jacobian updates
    # P ← F P Fᵀ + V Q Vᵀ, J ← F J compose associatively:
    #   (F₂, Q₂) ∘ (F₁, Q₁) = (F₂F₁, F₂Q₁F₂ᵀ + Q₂)
    # With P₀ = 0 and J₀ = I the interval totals are just (F_tot, Q_tot).
    # Same discretization as :func:`_step`, modulo fp reassociation and
    # per-step quaternion renormalization.
    N = n
    w = 0.5 * (gyr_c[:-1] + gyr_c[1:])                     # [N, 3]
    dqs = lie.quat_exp(w * dt[:, None])
    dq_incl = lie.quat_normalize(
        jax.lax.associative_scan(lie.quat_mul, dqs))       # dq after step i
    dq_excl = jnp.concatenate(
        [lie.quat_identity((1,), dtype), dq_incl[:-1]], axis=0)
    R0 = lie.quat_to_mat(dq_excl)                          # [N, 3, 3]
    R1 = lie.quat_to_mat(dq_incl)
    un0 = jnp.einsum("nij,nj->ni", R0, acc_c[:-1])
    un1 = jnp.einsum("nij,nj->ni", R1, acc_c[1:])
    acc_m = 0.5 * (un0 + un1)
    dvs = acc_m * dt[:, None]
    dv_incl = jnp.cumsum(dvs, axis=0)
    dv_excl = jnp.concatenate([jnp.zeros((1, 3), dtype), dv_incl[:-1]])
    dps = dv_excl * dt[:, None] + 0.5 * acc_m * dt[:, None] ** 2
    dp_incl = jnp.cumsum(dps, axis=0)

    # batched error-state transition / noise map (same blocks as _step)
    I3 = jnp.eye(3, dtype=dtype)[None]
    hat = jax.vmap(lie.hat)
    A0 = hat(acc_c[:-1])
    A1 = hat(acc_c[1:])
    Wx = hat(w)
    dtN = dt[:, None, None]
    Rw = I3 - Wx * dtN
    R0A0 = R0 @ A0
    R1A1 = R1 @ A1
    F = jnp.zeros((N, 15, 15), dtype)
    F = F.at[:, 0:3, 0:3].set(I3)
    F = F.at[:, 0:3, 3:6].set(-0.25 * dtN * dtN * (R0A0 + R1A1 @ Rw))
    F = F.at[:, 0:3, 6:9].set(I3 * dtN)
    F = F.at[:, 0:3, 9:12].set(-0.25 * (R0 + R1) * dtN * dtN)
    F = F.at[:, 0:3, 12:15].set(0.25 * R1A1 * dtN ** 3)
    F = F.at[:, 3:6, 3:6].set(Rw)
    F = F.at[:, 3:6, 12:15].set(-I3 * dtN)
    F = F.at[:, 6:9, 3:6].set(-0.5 * dtN * (R0A0 + R1A1 @ Rw))
    F = F.at[:, 6:9, 6:9].set(I3)
    F = F.at[:, 6:9, 9:12].set(-0.5 * (R0 + R1) * dtN)
    F = F.at[:, 6:9, 12:15].set(0.5 * R1A1 * dtN * dtN)
    F = F.at[:, 9:12, 9:12].set(I3)
    F = F.at[:, 12:15, 12:15].set(I3)

    V = jnp.zeros((N, 15, 18), dtype)
    V = V.at[:, 0:3, 0:3].set(0.25 * R0 * dtN * dtN)
    V = V.at[:, 0:3, 3:6].set(-0.125 * R1A1 * dtN ** 3)
    V = V.at[:, 0:3, 6:9].set(0.25 * R1 * dtN * dtN)
    V = V.at[:, 0:3, 9:12].set(-0.125 * R1A1 * dtN ** 3)
    V = V.at[:, 3:6, 3:6].set(0.5 * I3 * dtN)
    V = V.at[:, 3:6, 9:12].set(0.5 * I3 * dtN)
    V = V.at[:, 6:9, 0:3].set(0.5 * R0 * dtN)
    V = V.at[:, 6:9, 3:6].set(-0.25 * R1A1 * dtN * dtN)
    V = V.at[:, 6:9, 6:9].set(0.5 * R1 * dtN)
    V = V.at[:, 6:9, 9:12].set(-0.25 * R1A1 * dtN * dtN)
    V = V.at[:, 9:12, 12:15].set(I3 * dtN)
    V = V.at[:, 12:15, 15:18].set(I3 * dtN)
    Qs = jnp.einsum("nij,j,nkj->nik", V, q, V)             # V Q Vᵀ per step

    def combine(a, b):
        Fa, Qa = a
        Fb, Qb = b
        return Fb @ Fa, Fb @ Qa @ jnp.swapaxes(Fb, -1, -2) + Qb

    F_tot, Q_tot = jax.tree.map(
        lambda x: x[-1], jax.lax.associative_scan(combine, (F, Qs), axis=0))
    return ImuPreint(dp_incl[-1], dq_incl[-1], dv_incl[-1], Q_tot, F_tot,
                     jnp.sum(dt), ba, bg)


def preintegrate_sequential(
    acc: jax.Array,
    gyr: jax.Array,
    dt: jax.Array,
    ba: jax.Array,
    bg: jax.Array,
    noise: ImuNoise,
    mask: jax.Array | None = None,
) -> ImuPreint:
    """Reference sequential scan (kept as the parity oracle for tests)."""
    dtype = acc.dtype
    n = dt.shape[0]
    if mask is None:
        mask = jnp.ones((n,), dtype=dtype)
    dt = dt * mask.astype(dtype)
    acc_c = acc - ba
    gyr_c = gyr - bg
    q = jnp.array(
        [noise.acc_n**2] * 3 + [noise.gyr_n**2] * 3 + [noise.acc_n**2] * 3
        + [noise.gyr_n**2] * 3 + [noise.acc_w**2] * 3 + [noise.gyr_w**2] * 3,
        dtype=dtype,
    )
    Q = jnp.diag(q)
    init = (
        jnp.zeros(3, dtype),
        lie.quat_identity(dtype=dtype),
        jnp.zeros(3, dtype),
        jnp.zeros((15, 15), dtype),
        jnp.eye(15, dtype=dtype),
    )
    inputs = (acc_c[:-1], gyr_c[:-1], acc_c[1:], gyr_c[1:], dt)
    (dp, dq, dv, cov, J), _ = jax.lax.scan(
        lambda c, x: _step(c, x, Q), init, inputs
    )
    return ImuPreint(dp, dq, dv, cov, J, jnp.sum(dt), ba, bg)


def bias_corrected(pre: ImuPreint, ba: jax.Array, bg: jax.Array):
    """First-order corrected (dp, dq, dv) at new biases (ba, bg).

    Mirrors the evaluation-time correction in the reference IMU factor
    (``imu_factor.h:21`` evaluate): uses the preintegrated Jacobian blocks
    instead of repropagating.
    """
    dba = ba - pre.ba
    dbg = bg - pre.bg
    J = pre.jac
    mv = lambda M, v: jnp.einsum("...ij,...j->...i", M, v)
    dp = pre.dp + mv(J[..., 0:3, 9:12], dba) + mv(J[..., 0:3, 12:15], dbg)
    dv = pre.dv + mv(J[..., 6:9, 9:12], dba) + mv(J[..., 6:9, 12:15], dbg)
    dq = lie.quat_mul(pre.dq, lie.quat_exp(mv(J[..., 3:6, 12:15], dbg)))
    return dp, lie.quat_normalize(dq), dv


def propagate_state(p, q, v, ba, bg, g_world, acc, gyr, dt, mask=None):
    """Direct midpoint state propagation at IMU rate (the reference's
    ``fastPredictIMU``, ``estimator.cpp:4076``): integrates world-frame pose
    and velocity forward through a sample buffer. Used for IMU-rate odometry
    output and the LIO's external pose feed.

    acc, gyr: [N+1, 3]; dt: [N]. Returns final (p, q, v).
    """
    dtype = p.dtype
    if mask is not None:
        dt = dt * mask.astype(dtype)

    # parallel-in-N (see preintegrate): quaternion prefix chain + cumsums
    w = 0.5 * (gyr[:-1] + gyr[1:]) - bg[None]
    dqs = lie.quat_exp(w * dt[:, None])
    q_incl = lie.quat_normalize(
        lie.quat_mul(q[None], jax.lax.associative_scan(lie.quat_mul, dqs)))
    q_excl = jnp.concatenate([q[None], q_incl[:-1]], axis=0)
    un0 = lie.quat_rotate(q_excl, acc[:-1] - ba[None]) + g_world[None]
    un1 = lie.quat_rotate(q_incl, acc[1:] - ba[None]) + g_world[None]
    acc_m = 0.5 * (un0 + un1)
    v_incl = v[None] + jnp.cumsum(acc_m * dt[:, None], axis=0)
    v_excl = jnp.concatenate([v[None], v_incl[:-1]], axis=0)
    p_incl = p[None] + jnp.cumsum(
        v_excl * dt[:, None] + 0.5 * acc_m * dt[:, None] ** 2, axis=0)
    return p_incl[-1], q_incl[-1], v_incl[-1]
