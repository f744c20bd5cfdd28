"""Dynamic (in-motion) initialization.

The reference initializes a moving estimator with monocular/depth-seeded SfM
+ visual-inertial alignment (``estimator.cpp:1610-1903`` initialStructure,
``initial/initial_sfm.cpp`` constructWithDepth, ``initial_aligment.cpp``
solveGyroscopeBias/LinearAlignment/RefineGravity). With RGB-D depth the
scale is observable directly, so the TPU build replaces the 5-point + BA
SfM with a closed-form depth-seeded pipeline:

  1. per consecutive window pair: 3D-3D Kabsch on co-observed depth-valid
     features (one trimmed re-fit for outliers) -> camera relative pose
     chain (the constructWithDepth role);
  2. gyro bias: linear solve matching preintegrated rotations against the
     vision chain via the preintegration bias Jacobian (solveGyroscopeBias);
  3. gravity + per-frame velocity: linear least squares from the
     preintegrated dp/dv constraints, then gravity-norm-constrained
     refinement (LinearAlignment + RefineGravity, scale fixed at 1);
  4. rotate everything into the gravity-aligned world frame.

All steps are small dense solves on a handful of 3-vectors — orchestrated
host-side (init runs once), with the re-preintegration on device.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..core import lie
from ..sensors.imu_preint import preintegrate


class DynamicInit(NamedTuple):
    p: np.ndarray      # [W, 3] body positions, world frame (frame 0 at origin)
    q: np.ndarray      # [W, 4]
    v: np.ndarray      # [W, 3]
    bg: np.ndarray     # [3]
    g_b0: np.ndarray   # [3] gravity in the first body frame (diagnostic)
    n_pairs: int


def _kabsch(src: np.ndarray, dst: np.ndarray):
    """R, t with dst ≈ R src + t (least squares)."""
    c_s = src.mean(axis=0)
    c_d = dst.mean(axis=0)
    H = (dst - c_d).T @ (src - c_s)
    U, _, Vt = np.linalg.svd(H)
    S = np.eye(3)
    if np.linalg.det(U @ Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    t = c_d - R @ c_s
    return R, t


def _pair_pose(fw, k: int, min_matches: int = 8, trim: float = 0.08):
    """T_{ck <- ck+1} from depth-valid co-observations; None if degenerate."""
    ray = np.asarray(fw.ray)
    depth = np.asarray(fw.depth)
    ov = np.asarray(fw.obs_valid)
    m = ((ov[:, k] > 0) & (ov[:, k + 1] > 0)
         & (depth[:, k] > 0) & (depth[:, k + 1] > 0)
         & (np.asarray(fw.track_valid) > 0))
    if m.sum() < min_matches:
        return None
    def lift(col):
        uv = ray[m][:, col]
        z = depth[m][:, col]
        return np.concatenate([uv * z[:, None], z[:, None]], axis=1)
    p0 = lift(k)
    p1 = lift(k + 1)
    R, t = _kabsch(p1, p0)          # p0 ≈ R p1 + t  =>  T_{ck<-ck+1}
    res = np.linalg.norm(p0 - (p1 @ R.T + t), axis=1)
    keep = res < max(trim, 3.0 * np.median(res) + 1e-6)
    if keep.sum() < min_matches:
        return None
    R, t = _kabsch(p1[keep], p0[keep])
    return R, t, int(keep.sum())


def _solve_gyro_bias(q_rel_body: np.ndarray, pres) -> np.ndarray:
    """solveGyroscopeBias (``initial_aligment.cpp``): linear LSQ on the
    rotation mismatch via the preintegration d(theta)/d(bg) Jacobian."""
    A = np.zeros((3, 3))
    b = np.zeros(3)
    for k in range(q_rel_body.shape[0]):
        J = np.asarray(pres.jac[k][3:6, 12:15])
        q_pre = np.asarray(pres.dq[k])
        q_vis = q_rel_body[k]
        # residual: 2 * vec(q_pre^{-1} ⊗ q_vis)
        q_err = np.asarray(lie.quat_mul(
            lie.quat_conj(jnp.asarray(q_pre)), jnp.asarray(q_vis)))
        r = 2.0 * q_err[1:4] * np.sign(q_err[0])
        A += J.T @ J
        b += J.T @ r
    return np.linalg.solve(A + 1e-8 * np.eye(3), b)


def _linear_alignment(p_b0: np.ndarray, R_b0: np.ndarray, pres, g_norm: float):
    """LinearAlignment with scale fixed (RGB-D): solve per-frame world(b0)
    velocities + gravity, then refine gravity on its 2-sphere tangent."""
    W = p_b0.shape[0]
    n_x = 3 * W + 3

    def solve(g_fix=None, bases=None):
        dim_g = 3 if g_fix is None else 2
        A = np.zeros((6 * (W - 1), 3 * W + dim_g))
        b = np.zeros(6 * (W - 1))
        for k in range(W - 1):
            dt = float(pres.sum_dt[k])
            if dt <= 0:
                continue
            Rk = R_b0[k]                     # R_{b0 <- bk}
            RkT = Rk.T
            row = 6 * k
            dp = np.asarray(pres.dp[k])
            dv = np.asarray(pres.dv[k])
            rhs_p = RkT @ (p_b0[k + 1] - p_b0[k])
            rhs_v = np.zeros(3)
            A[row:row + 3, 3 * k:3 * k + 3] = -RkT * dt
            A[row + 3:row + 6, 3 * k:3 * k + 3] = -RkT
            A[row + 3:row + 6, 3 * (k + 1):3 * (k + 1) + 3] = RkT
            if g_fix is None:
                A[row:row + 3, 3 * W:] = -0.5 * dt * dt * RkT
                A[row + 3:row + 6, 3 * W:] = -dt * RkT
            else:
                A[row:row + 3, 3 * W:] = -0.5 * dt * dt * RkT @ bases
                A[row + 3:row + 6, 3 * W:] = -dt * RkT @ bases
                # the fixed part of g moves to the right-hand side:
                # dp = RkT dP - dt RkT v_k - 0.5 dt^2 RkT (g_fix + B w)
                rhs_p -= 0.5 * dt * dt * RkT @ g_fix
                rhs_v -= dt * RkT @ g_fix
            b[row:row + 3] = dp - rhs_p
            b[row + 3:row + 6] = dv - rhs_v
        x, *_ = np.linalg.lstsq(A, b, rcond=None)
        resid = A @ x - b
        return x, float(np.sqrt(np.mean(resid ** 2)))

    x, _ = solve()
    g = x[3 * W:]
    # RefineGravity: constrain |g| = g_norm, iterate on the tangent basis
    for _ in range(4):
        gn = g / (np.linalg.norm(g) + 1e-12) * g_norm
        up = gn / g_norm
        tmp = np.array([1.0, 0, 0]) if abs(up[0]) < 0.9 else np.array([0, 1.0, 0])
        b1 = np.cross(up, tmp); b1 /= np.linalg.norm(b1)
        b2 = np.cross(up, b1)
        bases = np.stack([b1, b2], axis=1)
        x, rms = solve(g_fix=gn, bases=bases)
        g = gn + bases @ x[3 * W:]
    v = x[:3 * W].reshape(W, 3)
    return v, g / (np.linalg.norm(g) + 1e-12) * g_norm, rms


def try_dynamic_init(fw, bufs, imu_noise, tic, ric, g_norm: float,
                     min_pairs: int | None = None,
                     max_align_rms: float = 0.35) -> DynamicInit | None:
    """Attempt in-motion initialization from a full window.

    ``fw``: FeatureWindow; ``bufs``: the estimator's interval sample buffers;
    ``tic``/``ric``: camera-IMU extrinsic. Returns None if the visual chain
    or the alignment is not trustworthy (the caller defers to a later tick,
    exactly like the reference's initialStructure failure path).
    """
    W = np.asarray(fw.ray).shape[1]
    if min_pairs is None:
        min_pairs = W - 1

    # ---- 1. visual relative-pose chain (camera frames) -------------------
    rels = []
    for k in range(W - 1):
        r = _pair_pose(fw, k)
        if r is None:
            return None
        rels.append(r)
    if len(rels) < min_pairs:
        return None

    R_c = [np.eye(3)]    # R_{c0 <- ck}
    t_c = [np.zeros(3)]
    for (R, t, _) in rels:
        R_c.append(R_c[-1] @ R)
        t_c.append(R_c[-2] @ t + t_c[-1])

    # ---- body-frame chain: T_b0<-bk = T_bc T_c0<-ck T_bc^{-1} -------------
    ric = np.asarray(ric, np.float64)
    tic = np.asarray(tic, np.float64)
    R_b0, p_b0, q_rel = [], [], []
    for k in range(W):
        Rb = ric @ R_c[k] @ ric.T
        pb = ric @ t_c[k] + tic - Rb @ tic
        R_b0.append(Rb)
        p_b0.append(pb)
    R_b0 = np.stack(R_b0)
    p_b0 = np.stack(p_b0)

    # ---- 2. gyro bias ------------------------------------------------------
    def preint_all(bg):
        import jax
        pre = jax.vmap(lambda a, g, d, m: preintegrate(
            a, g, d, jnp.zeros(3), jnp.asarray(bg, jnp.float32), imu_noise,
            mask=m))(jnp.asarray(bufs.acc), jnp.asarray(bufs.gyr),
                     jnp.asarray(bufs.dt), jnp.asarray(bufs.mask))
        return pre

    bg = np.zeros(3)
    for _ in range(2):
        pres = preint_all(bg)
        q_rel = np.stack([
            np.asarray(lie.mat_to_quat(jnp.asarray(
                (R_b0[k].T @ R_b0[k + 1]), jnp.float32)))
            for k in range(W - 1)])
        bg = bg + _solve_gyro_bias(q_rel, pres)
    pres = preint_all(bg)

    # ---- 3. gravity + velocities ------------------------------------------
    v_b0, g_b0, rms = _linear_alignment(p_b0, R_b0, pres, g_norm)
    if rms > max_align_rms or not np.isfinite(g_b0).all():
        return None

    # ---- 4. world alignment -------------------------------------------------
    R_w_b0 = np.asarray(lie.gravity_align(jnp.asarray(-g_b0, jnp.float32)),
                        np.float64)
    p = (R_w_b0 @ p_b0.T).T
    v = (R_w_b0 @ v_b0.T).T
    q = np.stack([
        np.asarray(lie.mat_to_quat(jnp.asarray(R_w_b0 @ R_b0[k], jnp.float32)))
        for k in range(W)])
    return DynamicInit(p=p.astype(np.float32), q=q.astype(np.float32),
                       v=v.astype(np.float32), bg=bg.astype(np.float32),
                       g_b0=g_b0.astype(np.float32), n_pairs=len(rels))
