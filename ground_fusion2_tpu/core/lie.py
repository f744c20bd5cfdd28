"""SO(3)/SE(3) Lie-group operations, batched and jit-friendly.

Conventions
-----------
* Quaternions are Hamilton convention, stored ``[w, x, y, z]`` (matches the
  reference's Eigen usage, e.g. ``Ground-Fusion++/vins_estimator/src/utility/utility.h:203``).
* All functions broadcast over arbitrary leading batch dimensions; the group
  element lives in the last axis (4 for quaternions, (3,3) for matrices).
* Small-angle branches use Taylor expansions selected with ``jnp.where`` so the
  whole module is differentiable and traceable (no data-dependent Python
  control flow — everything compiles to one XLA program).

This replaces the reference's scattered Eigen/Sophus helpers
(``lio/thirdparty/sophus``, ``vins_estimator/src/utility/utility.h``) with one
vectorized implementation designed for the TPU VPU: every op is a handful of
fused elementwise lanes over ``[..., 3/4]`` arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


# ---------------------------------------------------------------------------
# so(3) basics
# ---------------------------------------------------------------------------

def hat(w: jax.Array) -> jax.Array:
    """Skew-symmetric matrix of ``w``: ``hat(w) @ v == cross(w, v)``.

    w: [..., 3] -> [..., 3, 3]
    """
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jax.Array) -> jax.Array:
    """Inverse of :func:`hat`. [..., 3, 3] -> [..., 3]."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


# ---------------------------------------------------------------------------
# Quaternions [w, x, y, z]
# ---------------------------------------------------------------------------

def quat_identity(shape=(), dtype=jnp.float32) -> jax.Array:
    q = jnp.zeros((*shape, 4), dtype=dtype)
    return q.at[..., 0].set(1.0)


def quat_mul(q: jax.Array, r: jax.Array) -> jax.Array:
    """Hamilton product q ⊗ r. [..., 4] x [..., 4] -> [..., 4]."""
    qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    rw, rx, ry, rz = r[..., 0], r[..., 1], r[..., 2], r[..., 3]
    return jnp.stack(
        [
            qw * rw - qx * rx - qy * ry - qz * rz,
            qw * rx + qx * rw + qy * rz - qz * ry,
            qw * ry - qx * rz + qy * rw + qz * rx,
            qw * rz + qx * ry - qy * rx + qz * rw,
        ],
        axis=-1,
    )


def quat_conj(q: jax.Array) -> jax.Array:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_inv(q: jax.Array) -> jax.Array:
    """Inverse of a (unit) quaternion."""
    return quat_conj(q) / jnp.sum(q * q, axis=-1, keepdims=True)


def quat_normalize(q: jax.Array) -> jax.Array:
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    q = q / jnp.maximum(n, _EPS)
    # canonicalize sign (w >= 0) so log/boxminus stay in the principal branch
    return jnp.where(q[..., :1] < 0, -q, q)


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector(s) v by unit quaternion(s) q: R(q) @ v.

    Uses the 15-mul ``v + 2 w (u x v) + 2 u x (u x v)`` form (no matrix).
    """
    u = q[..., 1:]
    w = q[..., :1]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_to_mat(q: jax.Array) -> jax.Array:
    """Unit quaternion -> rotation matrix. [..., 4] -> [..., 3, 3]."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
        ],
        axis=-2,
    )


def mat_to_quat(R: jax.Array) -> jax.Array:
    """Rotation matrix -> unit quaternion (Shepperd's branch-free variant).

    Computes all four candidate quaternions and selects the numerically best
    with ``where`` — branchless, batched, differentiable a.e.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # four candidates, each scaled by 4*component^2 (always >= 0)
    qw = jnp.stack([1 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1 - m00 - m11 + m22], axis=-1)

    diag = jnp.stack([1 + tr, 1 + m00 - m11 - m22, 1 - m00 + m11 - m22,
                      1 - m00 - m11 + m22], axis=-1)
    best = jnp.argmax(diag, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # [..., 4cand, 4]
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, -1), axis=-2)
    return quat_normalize(q[..., 0, :])


def quat_exp(phi: jax.Array) -> jax.Array:
    """so(3) tangent -> unit quaternion: exp([0, phi/2]).

    phi: [..., 3] rotation vector (angle*axis).
    """
    theta2 = jnp.sum(phi * phi, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    half = 0.5 * theta
    small = theta2 < _EPS
    # sin(t/2)/t with Taylor fallback 1/2 - t^2/48
    k = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(half) / theta)
    w = jnp.where(small, 1.0 - theta2 / 8.0, jnp.cos(half))
    return jnp.concatenate([w, k * phi], axis=-1)


def quat_log(q: jax.Array) -> jax.Array:
    """Unit quaternion -> rotation vector (principal branch, |phi| <= pi)."""
    q = quat_normalize(q)
    w = q[..., :1]
    u = q[..., 1:]
    un2 = jnp.sum(u * u, axis=-1, keepdims=True)
    un = jnp.sqrt(jnp.maximum(un2, _EPS * _EPS))
    angle = 2.0 * jnp.arctan2(un, w)
    small = un2 < _EPS
    k = jnp.where(small, 2.0 / jnp.maximum(w, _EPS), angle / un)
    return k * u


def quat_slerp(q0: jax.Array, q1: jax.Array, t) -> jax.Array:
    """Spherical interpolation between unit quaternions (shortest arc).

    ``t`` broadcasts: scalar or [...] against [..., 4] quats. Used by the
    CT-ICP continuous-time pose model (reference ``lidarodom.cpp:509-532``).
    """
    t = jnp.asarray(t, dtype=q0.dtype)[..., None]
    d = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(d < 0, -q1, q1)
    d = jnp.abs(d)
    d = jnp.clip(d, -1.0, 1.0)
    theta = jnp.arccos(d)
    sin_theta = jnp.sin(theta)
    small = sin_theta < 1e-5
    w0 = jnp.where(small, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.where(small, 1.0, sin_theta))
    w1 = jnp.where(small, t, jnp.sin(t * theta) / jnp.where(small, 1.0, sin_theta))
    return quat_normalize(w0 * q0 + w1 * q1)


def quat_boxplus(q: jax.Array, dphi: jax.Array) -> jax.Array:
    """Right-multiplicative update q ⊗ exp(dphi) (local perturbation)."""
    return quat_normalize(quat_mul(q, quat_exp(dphi)))


def quat_boxminus(q1: jax.Array, q0: jax.Array) -> jax.Array:
    """log(q0^{-1} ⊗ q1): tangent taking q0 to q1 in the local frame."""
    return quat_log(quat_mul(quat_conj(q0), q1))


# ---------------------------------------------------------------------------
# SO(3) matrix exp/log and Jacobians
# ---------------------------------------------------------------------------

def so3_exp(phi: jax.Array) -> jax.Array:
    """Rodrigues: rotation vector -> rotation matrix, [..., 3] -> [..., 3, 3]."""
    return quat_to_mat(quat_exp(phi))


def so3_log(R: jax.Array) -> jax.Array:
    return quat_log(mat_to_quat(R))


def so3_left_jacobian(phi: jax.Array) -> jax.Array:
    """Left Jacobian J_l of SO(3): exp((phi+dphi)^) ≈ exp(J_l dphi ^) exp(phi^)."""
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    small = theta2 < _EPS
    A = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    B = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (theta2 * theta))
    W = hat(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), W.shape)
    return eye + A[..., None, None] * W + B[..., None, None] * (W @ W)


def so3_right_jacobian(phi: jax.Array) -> jax.Array:
    """Right Jacobian J_r(phi) = J_l(-phi)."""
    return so3_left_jacobian(-phi)


def so3_right_jacobian_inv(phi: jax.Array) -> jax.Array:
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    small = theta2 < _EPS
    half = 0.5 * theta
    cot = jnp.cos(half) / jnp.where(small, 1.0, jnp.sin(half))
    K = jnp.where(small, 1.0 / 12.0 + theta2 / 720.0,
                  (1.0 / theta2) - cot / (2.0 * jnp.where(small, 1.0, theta)))
    W = hat(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), W.shape)
    return eye + 0.5 * W + K[..., None, None] * (W @ W)


# ---------------------------------------------------------------------------
# SE(3) as (q, t) pairs
# ---------------------------------------------------------------------------

def se3_compose(qa, ta, qb, tb):
    """(qa,ta) * (qb,tb): apply b then a."""
    return quat_mul(qa, qb), quat_rotate(qa, tb) + ta


def se3_inverse(q, t):
    qi = quat_conj(q)
    return qi, -quat_rotate(qi, t)


def se3_apply(q, t, p):
    """Transform point(s) p by (q, t)."""
    return quat_rotate(q, p) + t


def se3_relative(qa, ta, qb, tb):
    """a^{-1} * b."""
    qi, ti = se3_inverse(qa, ta)
    return se3_compose(qi, ti, qb, tb)


# ---------------------------------------------------------------------------
# Euler helpers (yaw-pitch-roll, Z-Y-X, degrees-free)
# ---------------------------------------------------------------------------

def quat_yaw(q: jax.Array) -> jax.Array:
    """Yaw (rotation about world z) of q, radians."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))


def quat_from_yaw(yaw: jax.Array) -> jax.Array:
    half = 0.5 * yaw
    z = jnp.zeros_like(half)
    return jnp.stack([jnp.cos(half), z, z, jnp.sin(half)], axis=-1)


def mat_to_ypr(R: jax.Array) -> jax.Array:
    """Rotation matrix -> [yaw, pitch, roll] (reference ``utility.h`` R2ypr)."""
    yaw = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    pitch = jnp.arcsin(jnp.clip(-R[..., 2, 0], -1.0, 1.0))
    roll = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    return jnp.stack([yaw, pitch, roll], axis=-1)


def ypr_to_mat(ypr: jax.Array) -> jax.Array:
    y, p, r = ypr[..., 0], ypr[..., 1], ypr[..., 2]
    cy, sy = jnp.cos(y), jnp.sin(y)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cr, sr = jnp.cos(r), jnp.sin(r)
    Rz = jnp.stack([jnp.stack([cy, -sy, jnp.zeros_like(cy)], -1),
                    jnp.stack([sy, cy, jnp.zeros_like(cy)], -1),
                    jnp.stack([jnp.zeros_like(cy), jnp.zeros_like(cy), jnp.ones_like(cy)], -1)], -2)
    Ry = jnp.stack([jnp.stack([cp, jnp.zeros_like(cp), sp], -1),
                    jnp.stack([jnp.zeros_like(cp), jnp.ones_like(cp), jnp.zeros_like(cp)], -1),
                    jnp.stack([-sp, jnp.zeros_like(cp), cp], -1)], -2)
    Rx = jnp.stack([jnp.stack([jnp.ones_like(cr), jnp.zeros_like(cr), jnp.zeros_like(cr)], -1),
                    jnp.stack([jnp.zeros_like(cr), cr, -sr], -1),
                    jnp.stack([jnp.zeros_like(cr), sr, cr], -1)], -2)
    return Rz @ Ry @ Rx


def gravity_align(g_world: jax.Array, dtype=None) -> jax.Array:
    """Rotation matrix taking ``g_world`` to ``[0, 0, |g|]`` with zero yaw.

    Mirrors ``Utility::g2R`` (reference ``utility.h``) / the LIO's
    ``computeGravityAlignment`` (``lidarodom.cpp:802-809``): align gravity to
    +z then remove the induced yaw.
    """
    g = g_world / jnp.linalg.norm(g_world, axis=-1, keepdims=True)
    ez = jnp.zeros_like(g).at[..., 2].set(1.0)
    axis = jnp.cross(g, ez)
    s = jnp.linalg.norm(axis, axis=-1, keepdims=True)
    c = jnp.sum(g * ez, axis=-1, keepdims=True)
    angle = jnp.arctan2(s, c)
    axis = axis / jnp.maximum(s, _EPS)
    R0 = so3_exp(axis * angle)
    yaw = mat_to_ypr(R0)[..., 0]
    return so3_exp(jnp.stack([jnp.zeros_like(yaw), jnp.zeros_like(yaw), -yaw], -1)) @ R0
