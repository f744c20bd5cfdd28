"""Residual blocks of the sliding-window VIO problem — pure, batched functions.

Each factor is a function of the :class:`~ground_fusion2_tpu.vio.state.WindowState`
and fixed-shape measurement arrays, returning (residuals, weights) already
scaled by sqrt-information. Jacobians come from ``jax.jacfwd`` over the
window's tangent delta (see ``solver/gauss_newton.py``) — there are no
hand-written Jacobians to maintain, unlike the reference's ~3.5 kLoC of
analytic Ceres ``SizedCostFunction``s (``vins_estimator/src/factor/``).

Semantics mirror (with citations):
  * projection 2-frame-1-camera with td correction and inverse-depth
    landmarks — ``projectionTwoFrameOneCamFactor.h:21``
  * IMU preintegration factor — ``imu_factor.h:21`` (evaluate)
  * wheel preintegration factor with sx/sy/sw + td — ``wheel_factor.h:21``
  * plane (planar-motion) prior — ``plane_factor.h:21`` (simplified: wheel
    frame z / roll / pitch consistency)
  * pose anchor — ``pose_anchor_factor.h:10``

Conventions: world gravity vector ``g_world`` ≈ (0,0,−9.81); normalized-plane
feature coordinates (z = 1) with scalar inverse depth along the anchor ray.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie, robust
from ..sensors.imu_preint import ImuPreint, bias_corrected
from ..sensors.wheel_preint import WheelPreint, intrinsic_corrected
from ..vio.state import WindowState


class FeatureTable(NamedTuple):
    """Fixed-capacity per-window feature observations.

    F feature slots × W frames; everything masked by ``obs_valid``.
    """

    ray: jax.Array         # [F, W, 2] normalized-plane (x, y) observation
    vel: jax.Array         # [F, W, 2] normalized-plane velocity (for td)
    obs_valid: jax.Array   # [F, W] {0,1}
    anchor: jax.Array      # [F] int32 anchor frame index
    track_valid: jax.Array # [F] {0,1} slot in use
    depth_fixed: jax.Array # [F] {0,1} rho frozen from RGB-D (estimate_flag==1)


def _gather_frame(arr: jax.Array, idx: jax.Array) -> jax.Array:
    """arr: [F, W, ...], idx: [F] -> [F, ...] (per-feature anchor gather)."""
    return jnp.take_along_axis(
        arr, idx[:, None, None].astype(jnp.int32), axis=1
    )[:, 0] if arr.ndim == 3 else jnp.take_along_axis(
        arr, idx[:, None].astype(jnp.int32), axis=1)[:, 0]


def projection_residuals(
    x: WindowState,
    feats: FeatureTable,
    sqrt_info: float,
    huber_delta: float = 1.0,
    min_depth: float = 0.05,
):
    """Reprojection residuals anchor→observation for every (feature, frame).

    Returns r: [F, W, 2], w: [F, W]. The anchor frame contributes weight 0
    (its residual is identically zero by construction).
    """
    F, W, _ = feats.ray.shape
    dtype = feats.ray.dtype

    # td-corrected observations: pt_td = pt - td * vel  (reference applies
    # (td - td_cur) * velocity on the normalized plane)
    ray_td = feats.ray - x.td * feats.vel                       # [F, W, 2]

    anchor = feats.anchor.astype(jnp.int32)
    ray_i = _gather_frame(ray_td, anchor)                        # [F, 2]
    pt_i = jnp.concatenate([ray_i, jnp.ones((F, 1), dtype)], -1)  # [F, 3]

    depth_i = 1.0 / jnp.maximum(x.rho, 1e-3)                     # [F]
    p_ci = pt_i * depth_i[:, None]

    # anchor camera -> world
    q_wi = x.q[anchor]                                           # [F, 4]
    p_wi = x.p[anchor]
    p_imu_i = lie.quat_rotate(x.qic[None], p_ci) + x.tic[None]
    p_w = lie.quat_rotate(q_wi, p_imu_i) + p_wi                  # [F, 3]

    # world -> every frame's camera
    q_inv = lie.quat_conj(x.q)                                   # [W, 4]
    p_imu_j = lie.quat_rotate(q_inv[None], p_w[:, None] - x.p[None])  # [F, W, 3]
    qic_inv = lie.quat_conj(x.qic)
    p_cj = lie.quat_rotate(qic_inv[None, None], p_imu_j - x.tic[None, None])

    z = p_cj[..., 2]
    z_safe = jnp.where(jnp.abs(z) > min_depth, z, min_depth)
    pred = p_cj[..., :2] / z_safe[..., None]                     # [F, W, 2]
    r = (pred - ray_td) * sqrt_info

    not_anchor = jnp.arange(W)[None, :] != anchor[:, None]
    w = (
        feats.obs_valid
        * not_anchor.astype(dtype)
        * feats.track_valid[:, None]
        * (z > min_depth).astype(dtype)
    )
    # robust IRLS weight on the (already sqrt-info-scaled) residual norm,
    # matching Ceres HuberLoss(1.0) on the scaled residual
    sqn = jnp.sum(r * r, axis=-1)
    w = w * robust.huber_weight(sqn, huber_delta)
    return r, jnp.repeat(w[..., None], 2, axis=-1)


def imu_sqrt_info(cov: jax.Array) -> jax.Array:
    """S with SᵀS = cov⁻¹ via S = L⁻¹, cov = L Lᵀ. cov: [..., n, n]."""
    n = cov.shape[-1]
    covr = cov + jnp.eye(n, dtype=cov.dtype) * 1e-10
    L = jnp.linalg.cholesky(covr)
    eye = jnp.broadcast_to(jnp.eye(n, dtype=cov.dtype), covr.shape)
    return jax.scipy.linalg.solve_triangular(L, eye, lower=True)


def imu_residuals(
    x: WindowState,
    pre: ImuPreint,          # batched [W-1]
    sqrt_info: jax.Array,    # [W-1, 15, 15] precomputed (state-independent)
    g_world: jax.Array,
    valid: jax.Array,        # [W-1]
):
    """15-dim preintegration residual between consecutive frames.

    Mirrors the reference IMU factor evaluate (``imu_factor.h``): position /
    orientation / velocity consistency vs bias-corrected deltas + bias walk.
    """
    W = x.p.shape[0]
    p_i, q_i, v_i = x.p[:-1], x.q[:-1], x.v[:-1]
    p_j, q_j, v_j = x.p[1:], x.q[1:], x.v[1:]
    ba_i, bg_i = x.ba[:-1], x.bg[:-1]
    ba_j, bg_j = x.ba[1:], x.bg[1:]
    dt = pre.sum_dt[:, None]

    dp_c, dq_c, dv_c = bias_corrected(pre, ba_i, bg_i)

    qi_inv = lie.quat_conj(q_i)
    r_p = lie.quat_rotate(
        qi_inv, p_j - p_i - v_i * dt - 0.5 * g_world[None] * dt * dt) - dp_c
    r_th = lie.quat_boxminus(lie.quat_mul(qi_inv, q_j), dq_c)
    r_v = lie.quat_rotate(qi_inv, v_j - v_i - g_world[None] * dt) - dv_c
    r_ba = ba_j - ba_i
    r_bg = bg_j - bg_i

    r = jnp.concatenate([r_p, r_th, r_v, r_ba, r_bg], axis=-1)   # [W-1, 15]
    r = jnp.einsum("nij,nj->ni", sqrt_info, r)
    w = jnp.repeat(valid[:, None].astype(r.dtype), 15, axis=-1)
    return r, w


def wheel_residuals(
    x: WindowState,
    pre: WheelPreint,        # batched [W-1]
    sqrt_info: jax.Array,    # [W-1, 6, 6]
    valid: jax.Array,        # [W-1] (0 when wheelanomaly drops the factor)
    td_wheel: jax.Array | None = None,
):
    """6-dim wheel preintegration residual between consecutive frames
    (reference ``wheel_integration_base.h`` evaluate): relative wheel-frame
    motion vs intrinsic- and time-offset-corrected preintegrated deltas."""
    p_i, q_i = x.p[:-1], x.q[:-1]
    p_j, q_j = x.p[1:], x.q[1:]
    dtype = p_i.dtype
    n = p_i.shape[0]

    dp_c, dq_c = intrinsic_corrected(pre, x.six, x.siy, x.siw)

    if td_wheel is None:
        td_wheel = jnp.zeros((), dtype)
    dtd = jnp.broadcast_to(td_wheel, (n,))[:, None]
    sv = jnp.stack([x.six, x.siy, jnp.asarray(1.0, dtype)])
    # time-offset correction using endpoint gyro/vel samples
    q_t0 = lie.quat_exp(x.siw * pre.gyr_begin * dtd)
    q_t1 = lie.quat_exp(-x.siw * pre.gyr_end * dtd)
    dq_t = lie.quat_mul(q_t0, lie.quat_mul(dq_c, q_t1))
    dp_t = lie.quat_rotate(
        q_t0,
        sv[None] * pre.vel_begin * dtd + dp_c
        - lie.quat_rotate(dq_c, sv[None] * pre.vel_end * dtd),
    )

    # relative wheel-frame motion from the window states
    q_wi = lie.quat_mul(q_i, x.qio[None])
    q_wj = lie.quat_mul(q_j, x.qio[None])
    t_wi = lie.quat_rotate(q_i, x.tio[None]) + p_i
    t_wj = lie.quat_rotate(q_j, x.tio[None]) + p_j
    r_p = lie.quat_rotate(lie.quat_conj(q_wi), t_wj - t_wi) - dp_t
    r_th = lie.quat_boxminus(lie.quat_mul(lie.quat_conj(q_wi), q_wj), dq_t)

    r = jnp.concatenate([r_p, r_th], axis=-1)                    # [W-1, 6]
    r = jnp.einsum("nij,nj->ni", sqrt_info, r)
    w = jnp.repeat(valid[:, None].astype(dtype), 6, axis=-1)
    return r, w


def plane_residuals(x: WindowState, weight: float, valid: jax.Array):
    """Planar-motion prior (simplified ``plane_factor.h``): the wheel frame
    should stay at constant height with zero roll/pitch relative to frame 0's
    wheel frame. Residual [W-1, 3]: (δz, δroll, δpitch) of each frame's wheel
    pose w.r.t. frame 0."""
    q_w = lie.quat_mul(x.q, x.qio[None])
    t_w = lie.quat_rotate(x.q, x.tio[None]) + x.p
    q0_inv = lie.quat_conj(q_w[0])
    rel_q = lie.quat_mul(q0_inv[None], q_w[1:])
    rel_t = lie.quat_rotate(q0_inv[None], t_w[1:] - t_w[0][None])
    ypr = lie.mat_to_ypr(lie.quat_to_mat(rel_q))
    r = jnp.stack([rel_t[:, 2], ypr[:, 1], ypr[:, 2]], axis=-1) * weight
    # valid may be a scalar gate ({0,1}) or a per-frame [W-1] mask
    v = jnp.asarray(valid, r.dtype) * jnp.ones((r.shape[0],), r.dtype)
    w = jnp.repeat(v[:, None], 3, axis=-1)
    return r, w


def posvel_residuals(x: WindowState, frame_dt: jax.Array, weight: float,
                     valid: jax.Array):
    """Position-velocity consistency between consecutive frames (reference
    ``PosVelFactor <3,7,7,9,9>``, ``factor/pos_vel_factor.cpp``):
    p_{k+1} = p_k + 0.5 (v_k + v_{k+1}) dt — a soft kinematic tie used when
    IMU quality is poor. frame_dt: [W-1]."""
    dt = frame_dt[:, None]
    r = (x.p[1:] - x.p[:-1] - 0.5 * (x.v[1:] + x.v[:-1]) * dt) * weight
    w = jnp.repeat(valid[:, None].astype(r.dtype), 3, axis=-1)
    return r, w


def motion_residuals(x: WindowState, weight: float, valid: jax.Array):
    """Non-holonomic ground-vehicle constraint (the functional form of the
    reference's MotionFactor ``<2,7,7,9,3>`` — its shipped body is vestigial
    with ``use_motion: 0``): the wheel-frame lateral and vertical velocity
    components are ~0 for a wheeled robot. Residual [W, 2] through the wheel
    extrinsic."""
    q_wo = lie.quat_mul(x.q, x.qio[None])
    v_body = lie.quat_rotate(lie.quat_conj(q_wo), x.v)
    r = v_body[:, 1:3] * weight
    w = jnp.repeat(valid[:, None].astype(r.dtype), 2, axis=-1)
    return r, w


def stereo_projection_residuals(
    x: WindowState,
    feats: FeatureTable,
    ray2: jax.Array,        # [F, W, 2] right-camera normalized obs
    valid2: jax.Array,      # [F, W]
    sqrt_info: float,
    huber_delta: float = 1.0,
    min_depth: float = 0.05,
):
    """Second-camera reprojection (the reference's 2F2C/1F2C factors,
    ``projectionTwoFrameTwoCamFactor.h`` / ``projectionOneFrameTwoCamFactor.h``):
    landmarks anchored in camera 1 reproject into camera 2 at every observing
    frame — same-frame observations give the 1F2C (pure-extrinsic) residual,
    cross-frame give 2F2C. Returns r [F, W, 2], w [F, W, 2]."""
    F, W, _ = feats.ray.shape
    dtype = feats.ray.dtype

    anchor = feats.anchor.astype(jnp.int32)
    ray_i = _gather_frame(feats.ray, anchor)
    pt_i = jnp.concatenate([ray_i, jnp.ones((F, 1), dtype)], -1)
    depth_i = 1.0 / jnp.maximum(x.rho, 1e-3)
    p_ci = pt_i * depth_i[:, None]

    q_wi = x.q[anchor]
    p_wi = x.p[anchor]
    p_imu_i = lie.quat_rotate(x.qic[None], p_ci) + x.tic[None]
    p_w = lie.quat_rotate(q_wi, p_imu_i) + p_wi

    q_inv = lie.quat_conj(x.q)
    p_imu_j = lie.quat_rotate(q_inv[None], p_w[:, None] - x.p[None])
    qic2_inv = lie.quat_conj(x.qic2)
    p_c2 = lie.quat_rotate(qic2_inv[None, None], p_imu_j - x.tic2[None, None])

    z = p_c2[..., 2]
    z_safe = jnp.where(jnp.abs(z) > min_depth, z, min_depth)
    pred = p_c2[..., :2] / z_safe[..., None]
    r = (pred - ray2) * sqrt_info
    w = (valid2 * feats.track_valid[:, None] * (z > min_depth).astype(dtype))
    sqn = jnp.sum(r * r, axis=-1)
    w = w * robust.huber_weight(sqn, huber_delta)
    return r, jnp.repeat(w[..., None], 2, axis=-1)


def pose_anchor_residuals(
    x: WindowState, frame: int, p_ref: jax.Array, q_ref: jax.Array,
    weight: float, valid: jax.Array,
):
    """6-dim anchor pinning frame ``frame`` to (p_ref, q_ref)
    (reference ``PoseAnchorFactor``)."""
    r_p = (x.p[frame] - p_ref) * weight
    r_th = lie.quat_boxminus(x.q[frame], q_ref) * weight
    r = jnp.concatenate([r_p, r_th])
    w = jnp.broadcast_to(valid.astype(r.dtype), r.shape)
    return r, w
