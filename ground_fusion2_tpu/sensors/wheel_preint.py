"""Wheel-odometer preintegration (planar velocity + gyro with intrinsic
scales), as one ``lax.scan`` — replaces the reference's
``vins_estimator/src/factor/wheel_integration_base.h``.

Model: body-frame wheel velocity measurements ``vel`` scaled per-axis by
``Sv = diag(sx, sy, 1)``, angular rate ``gyr`` scaled by ``sw`` (the estimator
feeds IMU gyro here — the reference replaces wheel yaw rate with IMU gyro in
``rosNodeTest.cpp:96-204``). Preintegrated quantities between frames i, j:

  un_vel_0 = R(dq_k) Sv vel_k
  w        = 0.5 sw (g_k + g_{k+1})
  dq_{k+1} = dq_k ⊗ exp(w dt)
  un_vel_1 = R(dq_{k+1}) Sv vel_{k+1}
  dp_{k+1} = dp_k + 0.5 (un_vel_0 + un_vel_1) dt

Error state: [δp(0:3), δθ(3:6)]; measurement noise [nv0, nw0, nv1, nw1].
The 6×3 intrinsic Jacobian d(dp,dθ)/d(sx,sy,sw) accumulates alongside and is
used for first-order intrinsic/time-offset correction at factor evaluation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie


class WheelNoise(NamedTuple):
    vel_n: float = 0.1   # reference VEL_N_wheel
    gyr_n: float = 0.01  # reference GYR_N_wheel


class WheelPreint(NamedTuple):
    dp: jax.Array        # [..., 3]
    dq: jax.Array        # [..., 4]
    cov: jax.Array       # [..., 6, 6]
    jac_ix: jax.Array    # [..., 6, 3] d(dp, dθ)/d(sx, sy, sw)
    sum_dt: jax.Array
    sx: jax.Array
    sy: jax.Array
    sw: jax.Array
    # endpoint measurements, needed for the factor's td correction
    vel_begin: jax.Array  # [..., 3] first velocity sample
    gyr_begin: jax.Array  # [..., 3] first gyro sample
    vel_end: jax.Array    # [..., 3] last (valid) velocity sample
    gyr_end: jax.Array    # [..., 3] last (valid) gyro sample


def preintegrate_wheel(
    vel: jax.Array,
    gyr: jax.Array,
    dt: jax.Array,
    sx,
    sy,
    sw,
    noise: WheelNoise,
    mask: jax.Array | None = None,
) -> WheelPreint:
    """vel, gyr: [N+1, 3]; dt: [N]; mask: [N] validity of each interval."""
    dtype = vel.dtype
    n = dt.shape[0]
    if mask is None:
        mask = jnp.ones((n,), dtype=dtype)
    maskf = mask.astype(dtype)
    dt = dt * maskf

    sx = jnp.asarray(sx, dtype)
    sy = jnp.asarray(sy, dtype)
    sw = jnp.asarray(sw, dtype)
    Sv = jnp.diag(jnp.stack([sx, sy, jnp.asarray(1.0, dtype)]))
    I3 = jnp.eye(3, dtype=dtype)

    qn = jnp.array([noise.vel_n**2] * 3 + [noise.gyr_n**2] * 3
                   + [noise.vel_n**2] * 3 + [noise.gyr_n**2] * 3, dtype=dtype)
    Q = jnp.diag(qn)

    def step(carry, inp):
        dp, dq, cov, Jix = carry
        v0, g0, v1, g1, dt = inp

        w = 0.5 * sw * (g0 + g1)
        phi = w * dt
        dq1 = lie.quat_normalize(lie.quat_mul(dq, lie.quat_exp(phi)))
        R0 = lie.quat_to_mat(dq)
        R1 = lie.quat_to_mat(dq1)
        Rd = lie.quat_to_mat(lie.quat_exp(phi))  # step rotation
        sv0 = Sv @ v0
        sv1 = Sv @ v1
        dp1 = dp + 0.5 * (R0 @ sv0 + R1 @ sv1) * dt

        # error-state transition [δp, δθ]
        F = jnp.zeros((6, 6), dtype=dtype)
        F = F.at[0:3, 0:3].set(I3)
        F = F.at[0:3, 3:6].set(-0.5 * dt * (R0 @ lie.hat(sv0) + R1 @ lie.hat(sv1) @ Rd.T))
        F = F.at[3:6, 3:6].set(Rd.T)

        Jr = lie.so3_right_jacobian(phi)
        V = jnp.zeros((6, 12), dtype=dtype)
        V = V.at[0:3, 0:3].set(0.5 * dt * R0 @ Sv)
        V = V.at[0:3, 3:6].set(-0.25 * dt * dt * R1 @ lie.hat(sv1) @ Jr)
        V = V.at[0:3, 6:9].set(0.5 * dt * R1 @ Sv)
        V = V.at[0:3, 9:12].set(-0.25 * dt * dt * R1 @ lie.hat(sv1) @ Jr)
        V = V.at[3:6, 3:6].set(0.5 * Jr * sw * dt)
        V = V.at[3:6, 9:12].set(0.5 * Jr * sw * dt)

        cov1 = F @ cov @ F.T + V @ Q @ V.T

        # intrinsic Jacobian accumulation (reference jacobian.block updates)
        e1 = jnp.array([1.0, 0.0, 0.0], dtype)
        e2 = jnp.array([0.0, 1.0, 0.0], dtype)
        dp_dsx = Jix[0:3, 0] + 0.5 * dt * (R0 @ (e1 * v0) + R1 @ (e1 * v1))
        dp_dsy = Jix[0:3, 1] + 0.5 * dt * (R0 @ (e2 * v0) + R1 @ (e2 * v1))
        dr_dsw_last = Jix[3:6, 2]
        dr_dsw = dr_dsw_last + Jr @ (0.5 * (g0 + g1) * dt)
        dp_dsw = Jix[0:3, 2] + 0.5 * dt * (
            R0 @ lie.hat(dr_dsw_last) @ sv0 + R1 @ lie.hat(dr_dsw) @ sv1
        )
        Jix1 = jnp.zeros((6, 3), dtype=dtype)
        Jix1 = Jix1.at[0:3, 0].set(dp_dsx)
        Jix1 = Jix1.at[0:3, 1].set(dp_dsy)
        Jix1 = Jix1.at[0:3, 2].set(dp_dsw)
        Jix1 = Jix1.at[3:6, 2].set(dr_dsw)

        return (dp1, dq1, cov1, Jix1), None

    # ---- parallel-in-N formulation (same recipe as imu_preint) ----------
    # orientation = quaternion prefix product; dp and the intrinsic
    # Jacobian columns unroll to prefix sums once the orientation chain is
    # known (dp_dsw's recursion is affine in dr_dsw, whose own prefix is a
    # plain cumsum); covariance composes associatively via (F, VQVᵀ).
    del step  # sequential body kept above for readability/reference
    N = n
    v0, v1 = vel[:-1], vel[1:]
    g0, g1 = gyr[:-1], gyr[1:]
    w = 0.5 * sw * (g0 + g1)                               # [N, 3]
    phi = w * dt[:, None]
    dq_steps = lie.quat_exp(phi)
    dq_incl = lie.quat_normalize(
        jax.lax.associative_scan(lie.quat_mul, dq_steps))
    dq_excl = jnp.concatenate(
        [lie.quat_identity((1,), dtype), dq_incl[:-1]], axis=0)
    R0 = lie.quat_to_mat(dq_excl)
    R1 = lie.quat_to_mat(dq_incl)
    Rd = lie.quat_to_mat(dq_steps)
    mv = lambda M, x: jnp.einsum("nij,nj->ni", M, x)
    sdiag = jnp.stack([sx, sy, jnp.asarray(1.0, dtype)])[None]
    sv0 = v0 * sdiag
    sv1 = v1 * sdiag
    dtN = dt[:, None]
    dp_incl = jnp.cumsum(0.5 * (mv(R0, sv0) + mv(R1, sv1)) * dtN, axis=0)

    hat = jax.vmap(lie.hat)
    dtM = dt[:, None, None]
    F = jnp.zeros((N, 6, 6), dtype)
    F = F.at[:, 0:3, 0:3].set(I3[None])
    F = F.at[:, 0:3, 3:6].set(
        -0.5 * dtM * (R0 @ hat(sv0) + R1 @ hat(sv1)
                      @ jnp.swapaxes(Rd, -1, -2)))
    F = F.at[:, 3:6, 3:6].set(jnp.swapaxes(Rd, -1, -2))

    Jr = jax.vmap(lie.so3_right_jacobian)(phi)
    SvN = Sv[None]
    V = jnp.zeros((N, 6, 12), dtype)
    V = V.at[:, 0:3, 0:3].set(0.5 * dtM * R0 @ SvN)
    V = V.at[:, 0:3, 3:6].set(-0.25 * dtM * dtM * R1 @ hat(sv1) @ Jr)
    V = V.at[:, 0:3, 6:9].set(0.5 * dtM * R1 @ SvN)
    V = V.at[:, 0:3, 9:12].set(-0.25 * dtM * dtM * R1 @ hat(sv1) @ Jr)
    V = V.at[:, 3:6, 3:6].set(0.5 * Jr * sw * dtM)
    V = V.at[:, 3:6, 9:12].set(0.5 * Jr * sw * dtM)
    Qs = jnp.einsum("nij,j,nkj->nik", V, qn, V)

    def combine(a, b):
        Fa, Qa = a
        Fb, Qb = b
        return Fb @ Fa, Fb @ Qa @ jnp.swapaxes(Fb, -1, -2) + Qb

    F_tot, cov = jax.tree.map(
        lambda x: x[-1],
        jax.lax.associative_scan(combine, (F, Qs), axis=0))

    e1 = jnp.array([1.0, 0.0, 0.0], dtype)[None]
    e2 = jnp.array([0.0, 1.0, 0.0], dtype)[None]
    dp_dsx = jnp.cumsum(
        0.5 * dtN * (mv(R0, e1 * v0) + mv(R1, e1 * v1)), axis=0)[-1]
    dp_dsy = jnp.cumsum(
        0.5 * dtN * (mv(R0, e2 * v0) + mv(R1, e2 * v1)), axis=0)[-1]
    c = mv(Jr, 0.5 * (g0 + g1) * dtN)
    dr_incl = jnp.cumsum(c, axis=0)
    dr_excl = jnp.concatenate([jnp.zeros((1, 3), dtype), dr_incl[:-1]])
    dp_dsw = jnp.cumsum(
        0.5 * dtN * (mv(R0 @ hat(dr_excl), sv0)
                     + mv(R1 @ hat(dr_incl), sv1)), axis=0)[-1]
    Jix = jnp.zeros((6, 3), dtype)
    Jix = Jix.at[0:3, 0].set(dp_dsx)
    Jix = Jix.at[0:3, 1].set(dp_dsy)
    Jix = Jix.at[0:3, 2].set(dp_dsw)
    Jix = Jix.at[3:6, 2].set(dr_incl[-1])

    # last valid endpoint sample (mask may end early)
    idx_last = jnp.maximum(jnp.sum(mask.astype(jnp.int32)), 0)
    vel_end = vel[idx_last]
    gyr_end = gyr[idx_last]
    return WheelPreint(
        dp_incl[-1], dq_incl[-1], cov, Jix, jnp.sum(dt), sx, sy, sw,
        vel[0], gyr[0], vel_end, gyr_end,
    )


def intrinsic_corrected(pre: WheelPreint, sx, sy, sw):
    """First-order corrected (dp, dq) at new intrinsics via the accumulated
    6×3 Jacobian (reference ``evaluate`` corrected_delta_{p,q})."""
    ds = jnp.stack([sx - pre.sx, sy - pre.sy, sw - pre.sw], axis=-1)
    ds = jnp.broadcast_to(ds, (*pre.dp.shape[:-1], 3))
    mv = lambda M, v: jnp.einsum("...ij,...j->...i", M, v)
    dp = pre.dp + mv(pre.jac_ix[..., 0:3, :], ds)
    dq = lie.quat_mul(pre.dq, lie.quat_exp(mv(pre.jac_ix[..., 3:6, :], ds)))
    return dp, lie.quat_normalize(dq)
