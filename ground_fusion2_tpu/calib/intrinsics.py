"""Chessboard intrinsic calibration (Zhang's method + jitted LM refinement).

Rebuild of the reference's ``Calibrations`` executable
(``camera_models/CMakeLists.txt:36``; chessboard intrinsic calibration in
``camera_models/src/chessboard`` + ``CameraCalibration.cc``): given per-view
chessboard corner observations, estimate pinhole intrinsics + radial-
tangential distortion.

Pipeline: per-view DLT homographies → Zhang closed-form K init → per-view
pose extraction → one batched LM over (fx fy cx cy k1 k2 p1 p2 + V×6 poses)
minimizing reprojection in pixels — the refinement is a single fixed-shape
jitted solve (all views in parallel), not camodocal's per-view Ceres loop.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import lie
from ..solver.gauss_newton import lm_solve


class CalibResult(NamedTuple):
    fx: float
    fy: float
    cx: float
    cy: float
    k1: float
    k2: float
    p1: float
    p2: float
    rms_px: float
    rvecs: np.ndarray   # [V, 3]
    tvecs: np.ndarray   # [V, 3]


def homography_dlt(obj_xy: np.ndarray, img_uv: np.ndarray) -> np.ndarray:
    """Plane->image homography via normalized DLT. obj_xy [N,2], img_uv [N,2]."""
    def norm_T(p):
        c = p.mean(axis=0)
        s = np.sqrt(2.0) / (np.mean(np.linalg.norm(p - c, axis=1)) + 1e-12)
        return np.array([[s, 0, -s * c[0]], [0, s, -s * c[1]], [0, 0, 1.0]])

    To, Ti = norm_T(obj_xy), norm_T(img_uv)
    o = np.concatenate([obj_xy, np.ones((len(obj_xy), 1))], 1) @ To.T
    i = np.concatenate([img_uv, np.ones((len(img_uv), 1))], 1) @ Ti.T
    A = []
    for (X, Y, _), (u, v, _) in zip(o, i):
        A.append([-X, -Y, -1, 0, 0, 0, u * X, u * Y, u])
        A.append([0, 0, 0, -X, -Y, -1, v * X, v * Y, v])
    _, _, Vt = np.linalg.svd(np.asarray(A))
    H = Vt[-1].reshape(3, 3)
    H = np.linalg.inv(Ti) @ H @ To
    return H / H[2, 2]


def _v_ij(H, i, j):
    return np.array([
        H[0, i] * H[0, j],
        H[0, i] * H[1, j] + H[1, i] * H[0, j],
        H[1, i] * H[1, j],
        H[2, i] * H[0, j] + H[0, i] * H[2, j],
        H[2, i] * H[1, j] + H[1, i] * H[2, j],
        H[2, i] * H[2, j],
    ])


def zhang_intrinsics(Hs: list[np.ndarray]) -> tuple[float, float, float, float]:
    """Closed-form K from >= 3 homographies (Zhang 2000, zero skew)."""
    V = []
    for H in Hs:
        V.append(_v_ij(H, 0, 1))
        V.append(_v_ij(H, 0, 0) - _v_ij(H, 1, 1))
    _, _, Vt = np.linalg.svd(np.asarray(V))
    b11, b12, b22, b13, b23, b33 = Vt[-1]
    cy = (b12 * b13 - b11 * b23) / (b11 * b22 - b12 * b12)
    lam = b33 - (b13 * b13 + cy * (b12 * b13 - b11 * b23)) / b11
    fx = np.sqrt(abs(lam / b11))
    fy = np.sqrt(abs(lam * b11 / (b11 * b22 - b12 * b12)))
    cx = -b13 * fx * fx / lam
    return float(fx), float(fy), float(cx), float(cy)


def _pose_from_homography(H, K):
    Kinv = np.linalg.inv(K)
    h1, h2, h3 = (Kinv @ H).T
    s = 1.0 / np.linalg.norm(h1)
    r1, r2 = s * h1, s * h2
    r3 = np.cross(r1, r2)
    R = np.stack([r1, r2, r3], axis=1)
    U, _, Vt = np.linalg.svd(R)
    R = U @ Vt
    if np.linalg.det(R) < 0:
        R = -R
    t = s * h3
    if t[2] < 0:
        R[:, :2] *= -1
        t = -t
    return R, t


def _project_all(params, obj3, V, N):
    """params: [8 + V*6]; obj3 [N, 3] board points (z=0). -> [V, N, 2] px."""
    fx, fy, cx, cy, k1, k2, p1, p2 = params[:8]
    pose = params[8:].reshape(V, 6)
    Rv = lie.quat_to_mat(lie.quat_exp(pose[:, 3:]))
    p_c = jnp.einsum("vij,nj->vni", Rv, obj3) + pose[:, None, :3]
    z = jnp.maximum(p_c[..., 2], 1e-3)
    x = p_c[..., 0] / z
    y = p_c[..., 1] / z
    r2 = x * x + y * y
    rad = 1.0 + k1 * r2 + k2 * r2 * r2
    xd = x * rad + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yd = y * rad + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    return jnp.stack([fx * xd + cx, fy * yd + cy], axis=-1)


def _project_all_full(params, obj3, V, N):
    """params: [12 + V*6] (fx fy cx cy k1..k6 p1 p2 + poses) -> [V, N, 2]
    through the full rational model (camodocal PinholeFullCamera)."""
    from ..core.cameras import PinholeFull
    cam = PinholeFull(*params[:12])
    pose = params[12:].reshape(V, 6)
    Rv = lie.quat_to_mat(lie.quat_exp(pose[:, 3:]))
    p_c = jnp.einsum("vij,nj->vni", Rv, obj3) + pose[:, None, :3]
    z = jnp.maximum(p_c[..., 2], 1e-3)
    xy = p_c[..., :2] / z[..., None]
    xyd = cam.distort(xy)
    return jnp.stack([cam.fx * xyd[..., 0] + cam.cx,
                      cam.fy * xyd[..., 1] + cam.cy], axis=-1)


class CalibFullResult(NamedTuple):
    fx: float
    fy: float
    cx: float
    cy: float
    k: np.ndarray       # [6] k1..k6
    p1: float
    p2: float
    rms_px: float


def calibrate_pinhole_full(obj_xy: np.ndarray, img_uv: np.ndarray,
                           iters: int = 40) -> CalibFullResult:
    """Full-rational-model calibration (camodocal ``PinholeFullCamera``):
    Zhang closed-form init + one batched jitted LM over
    (fx fy cx cy k1..k6 p1 p2 + V×6 poses)."""
    V, N, _ = img_uv.shape
    Hs = [homography_dlt(obj_xy, img_uv[v]) for v in range(V)]
    fx, fy, cx, cy = zhang_intrinsics(Hs)
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
    poses = np.zeros((V, 6), np.float64)
    for v in range(V):
        R, t = _pose_from_homography(Hs[v], K)
        poses[v, :3] = t
        poses[v, 3:] = np.asarray(lie.quat_log(lie.mat_to_quat(
            jnp.asarray(R, jnp.float32))))

    obj3 = jnp.asarray(
        np.concatenate([obj_xy, np.zeros((N, 1))], 1), jnp.float32)
    uv = jnp.asarray(img_uv, jnp.float32)
    x0 = jnp.asarray(np.concatenate(
        [[fx, fy, cx, cy], np.zeros(8), poses.reshape(-1)]), jnp.float32)

    def residuals(delta):
        r = (_project_all_full(x0 + delta, obj3, V, N) - uv).reshape(-1)
        return r, jnp.ones_like(r)

    out = lm_solve(residuals, int(x0.shape[0]), max_iters=iters)
    params = np.asarray(x0 + out.delta, np.float64)
    r_fin = np.asarray(_project_all_full(jnp.asarray(params, jnp.float32),
                                         obj3, V, N)) - img_uv
    rms = float(np.sqrt(np.mean(np.sum(r_fin ** 2, axis=-1))))
    return CalibFullResult(
        fx=params[0], fy=params[1], cx=params[2], cy=params[3],
        k=params[4:10], p1=params[10], p2=params[11], rms_px=rms)


def calibrate_pinhole(obj_xy: np.ndarray, img_uv: np.ndarray,
                      iters: int = 30) -> CalibResult:
    """Calibrate from V chessboard views.

    obj_xy: [N, 2] board-plane corner coordinates (metres);
    img_uv: [V, N, 2] detected pixel corners. Returns :class:`CalibResult`.
    """
    V, N, _ = img_uv.shape
    Hs = [homography_dlt(obj_xy, img_uv[v]) for v in range(V)]
    fx, fy, cx, cy = zhang_intrinsics(Hs)
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
    poses = np.zeros((V, 6), np.float64)
    for v in range(V):
        R, t = _pose_from_homography(Hs[v], K)
        poses[v, :3] = t
        poses[v, 3:] = np.asarray(lie.quat_log(lie.mat_to_quat(
            jnp.asarray(R, jnp.float32))))

    obj3 = jnp.asarray(
        np.concatenate([obj_xy, np.zeros((N, 1))], 1), jnp.float32)
    uv = jnp.asarray(img_uv, jnp.float32)
    x0 = jnp.asarray(np.concatenate(
        [[fx, fy, cx, cy, 0, 0, 0, 0], poses.reshape(-1)]), jnp.float32)

    def residuals(delta):
        r = (_project_all(x0 + delta, obj3, V, N) - uv).reshape(-1)
        return r, jnp.ones_like(r)

    out = lm_solve(residuals, int(x0.shape[0]), max_iters=iters)
    params = np.asarray(x0 + out.delta, np.float64)
    r_fin = np.asarray(_project_all(jnp.asarray(params, jnp.float32),
                                    obj3, V, N)) - img_uv
    rms = float(np.sqrt(np.mean(np.sum(r_fin ** 2, axis=-1))))
    pose = params[8:].reshape(V, 6)
    return CalibResult(
        fx=params[0], fy=params[1], cx=params[2], cy=params[3],
        k1=params[4], k2=params[5], p1=params[6], p2=params[7],
        rms_px=rms, rvecs=pose[:, 3:], tvecs=pose[:, :3])
