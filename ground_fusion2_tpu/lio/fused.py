"""Fused LIO tick: the whole scan pipeline in ONE compiled device step.

Round-3 measurement: the host-orchestrated scan tick
(:meth:`~.odometry.LidarOdometry.process_scan`) runs ~6 separate jitted
dispatches per sweep (ESKF predict, CT-ICP, observe, insert, evict,
recenter) plus several scalar readbacks — on a remote-tunnel TPU each
round trip costs ~25 ms, so the tick ran at ~1.5 Hz while the reference
LIO is real-time at 10 Hz on a CPU (``lidarodom.cpp:219-257``).

This module applies the same cure as the fused camera tick
(``vio/fused.py``): the entire sweep

    ESKF predict (masked scan over IMU samples) → keypoint selection →
    CT-ICP against the voxel map → SE(3) observe (three-way select on
    degeneracy/external validity) → degeneracy switch state machine →
    map recenter (lax.cond) → insert → far-point evict (lax.cond)

is one jitted program over a device-resident :class:`LioCarry`.  The
switch state machine (``lidarodom.cpp:313-437``) — previously host Python
branching on a read-back ``degenerate`` flag — becomes pure ``jnp.where``
select logic over carry scalars, so no readback gates the next dispatch.
Per tick the host sends ONE packed f32 buffer (scan + IMU chunk +
external pose) and reads back ONE small record.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import lie
from . import ct_icp as ci
from . import eskf as ekf
from . import voxel_map as vm

# fixed IMU samples per sweep (200 Hz IMU / 10 Hz scans = 20; headroom x2)
MAX_IMU_PER_SCAN = 48

# sentinel code sorting invalid points last in the spatial subsample
_CODE_SENTINEL = np.int32(0x7FFFFFFF)


def _subsample_codes(pts, cell: float, valid):
    """Spatial-hash cell code per point (int32, sign bit cleared); invalid
    points get the sentinel so they sort last. Identical arithmetic on
    host (numpy) and device (jnp) — the legacy/fused equivalence tests
    rely on bit-exact agreement."""
    xp = jnp if isinstance(pts, jax.Array) else np
    ijk = xp.floor(pts * (1.0 / cell)).astype(xp.int32)
    h = (ijk[..., 0] * xp.int32(73856093)
         ^ ijk[..., 1] * xp.int32(19349663)
         ^ ijk[..., 2] * xp.int32(83492791)) & xp.int32(0x7FFFFFFE)
    return xp.where(valid, h, _CODE_SENTINEL)


class LioStatics(NamedTuple):
    """Hashable static config for the jitted tick."""

    map_cfg: vm.VoxelMapConfig
    icp_cfg: ci.CtIcpConfig
    eskf_opt: ekf.EskfOptions
    max_keypoints: int
    evict_every: int = 20
    recenter_margin: float = 0.5
    keypoint_cell: float = 0.05    # spatial subsample grid (reference
                                   # subSampleFrame 0.05, main_eskf.cpp:89)


class SwitchCarry(NamedTuple):
    """Device-resident switch state (``lidarodom.h:190-227`` flags)."""

    was_degenerate: jax.Array    # [] f32 bool
    has_entered: jax.Array       # [] f32 bool
    q_off: jax.Array             # [4]
    t_off: jax.Array             # [3]
    q_fused: jax.Array           # [4]
    t_fused: jax.Array           # [3]
    last_q_lo: jax.Array         # [4]
    last_t_lo: jax.Array         # [3]
    last_q_ext: jax.Array        # [4]
    last_t_ext: jax.Array        # [3]

    @staticmethod
    def initial(q0, t0, q_ext, t_ext, dtype=jnp.float32) -> "SwitchCarry":
        f = lambda x: jnp.asarray(x, dtype)
        return SwitchCarry(
            was_degenerate=jnp.zeros((), dtype),
            has_entered=jnp.zeros((), dtype),
            q_off=jnp.asarray([1.0, 0, 0, 0], dtype),
            t_off=jnp.zeros((3,), dtype),
            q_fused=f(q0), t_fused=f(t0),
            last_q_lo=f(q0), last_t_lo=f(t0),
            last_q_ext=f(q_ext), last_t_ext=f(t_ext))


class LioCarry(NamedTuple):
    eskf: ekf.EskfState
    vmap: vm.VoxelMap
    sw: SwitchCarry
    frame_idx: jax.Array         # [] int32


def _latch_offset(q_from, t_from, q_to, t_to):
    """Offset such that from ⊕ off == to (the reference's decoupled
    composition: R = R_from R_off, t = t_from + t_off)."""
    return lie.quat_mul(lie.quat_conj(q_from), q_to), t_to - t_from


def _compose_offset(q_base, t_base, q_off, t_off):
    return lie.quat_mul(q_base, q_off), t_base + t_off


def _switch_step(sw: SwitchCarry, degenerate, q_lo, t_lo,
                 q_ext_in, t_ext_in, ext_valid):
    """Traced form of the four-branch switch block
    (``lidarodom.cpp:313-437``); returns (sw', switched_code) where the
    code is 0 = none, 1 = to_vio, 2 = to_lio."""
    deg = degenerate.astype(jnp.float32)
    was = sw.was_degenerate
    entering = deg * (1.0 - was)
    exiting = (1.0 - deg) * was

    # current external pose (falls back to the last seen one)
    q_ext = jnp.where(ext_valid > 0, q_ext_in, sw.last_q_ext)
    t_ext = jnp.where(ext_valid > 0, t_ext_in, sw.last_t_ext)

    # latch candidates: on entering, ext ⊕ off == fused; on exiting,
    # lio ⊕ off == fused (trajectory C0-continuity)
    q_off_e, t_off_e = _latch_offset(sw.last_q_ext, sw.last_t_ext,
                                     sw.q_fused, sw.t_fused)
    q_off_x, t_off_x = _latch_offset(sw.last_q_lo, sw.last_t_lo,
                                     sw.q_fused, sw.t_fused)
    q_off = jnp.where(entering > 0, q_off_e,
                      jnp.where(exiting > 0, q_off_x, sw.q_off))
    t_off = jnp.where(entering > 0, t_off_e,
                      jnp.where(exiting > 0, t_off_x, sw.t_off))
    has_entered = jnp.maximum(sw.has_entered, deg)

    q_f_ext, t_f_ext = _compose_offset(q_ext, t_ext, q_off, t_off)
    q_f_lio_off, t_f_lio_off = _compose_offset(q_lo, t_lo, q_off, t_off)
    q_f_lio = jnp.where(has_entered > 0, q_f_lio_off, q_lo)
    t_f_lio = jnp.where(has_entered > 0, t_f_lio_off, t_lo)
    q_fused = jnp.where(deg > 0, q_f_ext, q_f_lio)
    t_fused = jnp.where(deg > 0, t_f_ext, t_f_lio)

    code = entering * 1.0 + exiting * 2.0
    sw2 = SwitchCarry(
        was_degenerate=deg, has_entered=has_entered,
        q_off=q_off, t_off=t_off, q_fused=q_fused, t_fused=t_fused,
        last_q_lo=q_lo, last_t_lo=t_lo,
        last_q_ext=q_ext, last_t_ext=t_ext)
    return sw2, code


def scan_layout(n_scan: int):
    """f32 element counts of the packed scan buffer."""
    M = MAX_IMU_PER_SCAN
    # pts[N,3] alpha[N] mask[N] | acc[M+1,3] gyr[M+1,3] dt[M] smask[M]
    # | ext_p[3] ext_q[4] ext_valid n_real
    return n_scan * 5 + (M + 1) * 6 + 2 * M + 9


def pack_scan(pts, alpha, mask, acc, gyr, dts, ext_p, ext_q, ext_valid,
              n_scan: int):
    """Host-side: one sweep's inputs into ONE f32 buffer (a remote-TPU
    tunnel charges latency per transferred array — pay it once).

    Variable-length inputs are subsampled (``linspace``) or zero-padded to
    the fixed shapes; ``n_real`` preserves the true point count so the
    device keypoint selection matches the host ``_keypoints`` stride."""
    M = MAX_IMU_PER_SCAN
    n = pts.shape[0]
    if n > n_scan:
        idx = np.linspace(0, n - 1, n_scan).astype(np.int64)
        pts, alpha, mask = pts[idx], alpha[idx], mask[idx]
        n_real = n_scan
    else:
        pad = n_scan - n
        pts = np.concatenate([pts, np.zeros((pad, 3), np.float32)])
        alpha = np.concatenate([alpha, np.zeros((pad,), np.float32)])
        mask = np.concatenate([mask, np.zeros((pad,), np.float32)])
        n_real = n
    k = min(len(dts), M)
    accp = np.zeros((M + 1, 3), np.float32)
    gyrp = np.zeros((M + 1, 3), np.float32)
    dtp = np.zeros((M,), np.float32)
    smp = np.zeros((M,), np.float32)
    accp[:k + 1] = acc[:k + 1]
    gyrp[:k + 1] = gyr[:k + 1]
    dtp[:k] = dts[:k]
    smp[:k] = 1.0
    return np.concatenate([
        np.asarray(pts, np.float32).reshape(-1),
        np.asarray(alpha, np.float32), np.asarray(mask, np.float32),
        accp.reshape(-1), gyrp.reshape(-1), dtp, smp,
        np.asarray(ext_p, np.float32), np.asarray(ext_q, np.float32),
        np.asarray([ext_valid, float(n_real)], np.float32),
    ])


@partial(jax.jit, static_argnums=(0, 1))
def lidar_tick(s: LioStatics, n_scan: int, carry: LioCarry, buf):
    """One full sweep — ESKF predict → CT-ICP → observe → switch → map
    update — as a single compiled program.

    Returns (carry', record [20] f32, world cloud [N, 3], cloud mask [N]).
    Record layout: p_fused[0:3] q_fused[3:7] p_lio[7:10] q_lio[10:14]
    degenerate[14] switched[15] n_corr[16] sigma[17:20].
    """
    M = MAX_IMU_PER_SCAN
    N = n_scan
    o = 0
    pts = buf[o:o + N * 3].reshape(N, 3); o += N * 3
    alpha = buf[o:o + N]; o += N
    mask = buf[o:o + N]; o += N
    acc = buf[o:o + (M + 1) * 3].reshape(M + 1, 3); o += (M + 1) * 3
    gyr = buf[o:o + (M + 1) * 3].reshape(M + 1, 3); o += (M + 1) * 3
    dts = buf[o:o + M]; o += M
    smask = buf[o:o + M]; o += M
    ext_p = buf[o:o + 3]; o += 3
    ext_q = buf[o:o + 4]; o += 4
    ext_valid = buf[o]
    n_real = buf[o + 1].astype(jnp.int32)

    # --- ESKF predict through the sweep (masked scan) -------------------
    q_begin, t_begin = carry.eskf.q, carry.eskf.p
    s_pred, _ = ekf.predict_batch(carry.eskf, acc[:M], gyr[:M], dts, smask,
                                  s.eskf_opt)

    # --- keypoint selection: SPATIAL grid subsample ---------------------
    # One point per keypoint_cell voxel (reference subSampleFrame 0.05 m,
    # main_eskf.cpp:58,89) — the round-4 index stride over-weighted dense
    # nearby returns on range-skewed scans exactly when the degeneracy SVD
    # needs balanced geometry (VERDICT r4 item 7). Sorted-hash first-point-
    # per-cell: no gathers into a hash table, one argsort.
    K = s.max_keypoints
    valid_pt = (mask > 0) & (jnp.arange(N) < n_real)
    code = _subsample_codes(pts, s.keypoint_cell, valid_pt)
    order = jnp.argsort(code)                     # stable: ties by index
    sc = code[order]
    first = jnp.concatenate(
        [jnp.ones((1,), bool), sc[1:] != sc[:-1]]) & (sc < _CODE_SENTINEL)
    sel = jnp.argsort(~first, stable=True)[:K]    # firsts to the front
    take = order[sel]
    kp = pts[take]
    ka = alpha[take]
    km = mask[take] * first[sel]

    # --- CT-ICP ----------------------------------------------------------
    pose0 = ci.CtPose(q_begin=q_begin, t_begin=t_begin,
                      q_end=s_pred.q, t_end=s_pred.p)
    res = ci.ct_icp(pose0, kp, ka, km, s.icp_cfg, s.map_cfg, carry.vmap,
                    pred=pose0)
    deg = res.degenerate
    q_lo, t_lo = res.pose.q_end, res.pose.t_end

    # --- ESKF SE(3) observe: three-way select ---------------------------
    # (reference ObserveSE3(pose_lo, 1e-2, 1e-2) when healthy; anchor to
    # the external pose when degenerate; skip when neither applies)
    s_obs_lio = ekf.observe_se3(s_pred, t_lo, q_lo, 1e-2, 1e-2)
    s_obs_ext = ekf.observe_se3(s_pred, ext_p, ext_q, 1e-1, 1e-1)
    use_lio = (~deg).astype(jnp.float32)
    use_ext = deg.astype(jnp.float32) * ext_valid

    def sel(a, b, c):
        w = jnp.reshape(use_lio, (1,) * a.ndim)
        u = jnp.reshape(use_ext, (1,) * a.ndim)
        return w * a + u * b + (1.0 - w - u) * c
    eskf_new = jax.tree.map(sel, s_obs_lio, s_obs_ext, s_pred)

    # --- switch state machine -------------------------------------------
    sw, switched = _switch_step(carry.sw, deg, q_lo, t_lo,
                                ext_q, ext_p, ext_valid)

    # --- map update at the raw LIO pose ----------------------------------
    vmap = carry.vmap
    half_extent = vm.HALF * s.map_cfg.voxel_size
    need_rc = jnp.max(jnp.abs(t_lo - vmap.origin)) \
        > s.recenter_margin * half_extent
    vmap = jax.lax.cond(
        need_rc, lambda m: vm.recenter(m, t_lo, s.map_cfg),
        lambda m: m, vmap)

    pose_f = ci.CtPose(q_begin=res.pose.q_begin, t_begin=res.pose.t_begin,
                       q_end=q_lo, t_end=t_lo)
    p_w = ci.transform_points(pose_f, pts, alpha)
    vmap = vm.insert(vmap, p_w, mask, s.map_cfg, center=t_lo)
    vmap = jax.lax.cond(
        carry.frame_idx % s.evict_every == 0,
        lambda m: vm.evict_far(m, t_lo, s.map_cfg), lambda m: m, vmap)

    carry2 = LioCarry(eskf=eskf_new, vmap=vmap, sw=sw,
                      frame_idx=carry.frame_idx + 1)
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    rec = jnp.concatenate([
        sw.t_fused, sw.q_fused, t_lo, q_lo,
        jnp.stack([f32(deg), switched, f32(res.n_corr)]),
        res.sigma.astype(jnp.float32),
    ])
    return carry2, rec, p_w, mask


class LioRecord(NamedTuple):
    p_fused: np.ndarray
    q_fused: np.ndarray
    p_lio: np.ndarray
    q_lio: np.ndarray
    degenerate: bool
    switched: str
    n_corr: int
    sigma: np.ndarray

    @staticmethod
    def unpack(vec: np.ndarray) -> "LioRecord":
        code = int(round(float(vec[15])))
        return LioRecord(
            p_fused=vec[0:3], q_fused=vec[3:7],
            p_lio=vec[7:10], q_lio=vec[10:14],
            degenerate=bool(vec[14] > 0.5),
            switched={0: "", 1: "to_vio", 2: "to_lio"}[code],
            n_corr=int(vec[16]), sigma=vec[17:20])
