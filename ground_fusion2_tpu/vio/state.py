"""Sliding-window state: fixed-shape pytree + static tangent layout.

The reference scatters window state across ``Estimator`` members and Ceres
parameter blocks (``estimator.h:87-368``); here it is one NamedTuple of
fixed-shape arrays (W = WINDOW+1 frames, F landmark slots with validity
masks) so the whole estimator tick is a single compiled program.

Tangent-space layout (one flat [D] delta vector; all indices static):

    poses       W × 6   (δp world, δθ right-local)
    speedbias   W × 9   (δv, δba, δbg)
    cam extr    6       (δt_ic, δθ_ic)
    td          1
    wheel extr  6       (δt_io, δθ_io)
    wheel intr  3       (δsx, δsy, δsw)
    landmarks   F × 1   (δ inverse depth in anchor frame)

The layout object also provides the static index arrays used for
marginalization (frame-0 block) and the window-shift re-indexing map.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import lie

WINDOW = 10          # keyframes (reference parameters.h:24)
NUM_FRAMES = WINDOW + 1


class WindowState(NamedTuple):
    p: jax.Array    # [W, 3] IMU position in world
    q: jax.Array    # [W, 4] IMU orientation (Hamilton wxyz)
    v: jax.Array    # [W, 3]
    ba: jax.Array   # [W, 3]
    bg: jax.Array   # [W, 3]
    tic: jax.Array  # [3] camera-IMU translation
    qic: jax.Array  # [4]
    td: jax.Array   # [] camera-IMU time offset
    tio: jax.Array  # [3] wheel-IMU translation
    qio: jax.Array  # [4]
    six: jax.Array  # [] wheel intrinsic sx
    siy: jax.Array  # [] wheel intrinsic sy
    siw: jax.Array  # [] wheel intrinsic sw
    tic2: jax.Array  # [3] second-camera (stereo) extrinsic
    qic2: jax.Array  # [4]
    # GNSS states (reference para_rcv_dt / para_rcv_ddt / para_yaw_enu_local
    # / para_anc_ecef) — present always, optimized only when GNSS is enabled
    gdt: jax.Array       # [W, 4] per-constellation receiver clock bias (m)
    gddt: jax.Array      # [W] receiver clock drift (m/s)
    gyaw: jax.Array      # [] ENU yaw of the local world frame
    ganchor: jax.Array   # [3] ENU offset of the local origin relative to the
                         # host-side prereduction anchor (0 after alignment)
    rho: jax.Array  # [F] landmark inverse depth (anchor-frame)

    @staticmethod
    def identity(num_feats: int, dtype=jnp.float32) -> "WindowState":
        W = NUM_FRAMES
        one = jnp.asarray(1.0, dtype)
        return WindowState(
            p=jnp.zeros((W, 3), dtype),
            q=lie.quat_identity((W,), dtype),
            v=jnp.zeros((W, 3), dtype),
            ba=jnp.zeros((W, 3), dtype),
            bg=jnp.zeros((W, 3), dtype),
            tic=jnp.zeros((3,), dtype),
            qic=lie.quat_identity((), dtype),
            td=jnp.zeros((), dtype),
            tio=jnp.zeros((3,), dtype),
            qio=lie.quat_identity((), dtype),
            six=one, siy=one, siw=one,
            tic2=jnp.zeros((3,), dtype),
            qic2=lie.quat_identity((), dtype),
            gdt=jnp.zeros((W, 4), dtype),
            gddt=jnp.zeros((W,), dtype),
            gyaw=jnp.zeros((), dtype),
            ganchor=jnp.zeros((3,), dtype),
            rho=jnp.full((num_feats,), 0.2, dtype),
        )


class WindowLayout:
    """Static tangent-space index map for a (W frames, F landmarks) window."""

    def __init__(self, num_feats: int, num_frames: int = NUM_FRAMES):
        self.W = num_frames
        self.F = num_feats
        o = 0
        self.pose_off = o; o += self.W * 6
        self.sb_off = o; o += self.W * 9
        self.cam_off = o; o += 6
        self.td_off = o; o += 1
        self.wext_off = o; o += 6
        self.wint_off = o; o += 3
        self.cam2_off = o; o += 6
        self.gdt_off = o; o += self.W * 4
        self.gddt_off = o; o += self.W
        self.gyaw_off = o; o += 1
        self.ganchor_off = o; o += 3
        self.frame_dim = o          # dims before landmarks
        self.rho_off = o; o += num_feats
        self.dim = o

    # --- slicing helpers (static) -------------------------------------
    def pose_slice(self, delta):
        return delta[self.pose_off:self.pose_off + self.W * 6].reshape(self.W, 6)

    def sb_slice(self, delta):
        return delta[self.sb_off:self.sb_off + self.W * 9].reshape(self.W, 9)

    def retract(self, x: WindowState, delta: jax.Array) -> WindowState:
        dp6 = self.pose_slice(delta)
        dsb = self.sb_slice(delta)
        dcam = delta[self.cam_off:self.cam_off + 6]
        dtd = delta[self.td_off]
        dwex = delta[self.wext_off:self.wext_off + 6]
        dwin = delta[self.wint_off:self.wint_off + 3]
        dcam2 = delta[self.cam2_off:self.cam2_off + 6]
        dgdt = delta[self.gdt_off:self.gdt_off + self.W * 4].reshape(self.W, 4)
        dgddt = delta[self.gddt_off:self.gddt_off + self.W]
        dgyaw = delta[self.gyaw_off]
        dganc = delta[self.ganchor_off:self.ganchor_off + 3]
        drho = delta[self.rho_off:self.rho_off + self.F]
        return WindowState(
            p=x.p + dp6[:, 0:3],
            q=lie.quat_boxplus(x.q, dp6[:, 3:6]),
            v=x.v + dsb[:, 0:3],
            ba=x.ba + dsb[:, 3:6],
            bg=x.bg + dsb[:, 6:9],
            tic=x.tic + dcam[0:3],
            qic=lie.quat_boxplus(x.qic, dcam[3:6]),
            td=x.td + dtd,
            tio=x.tio + dwex[0:3],
            qio=lie.quat_boxplus(x.qio, dwex[3:6]),
            six=x.six + dwin[0],
            siy=x.siy + dwin[1],
            siw=x.siw + dwin[2],
            tic2=x.tic2 + dcam2[0:3],
            qic2=lie.quat_boxplus(x.qic2, dcam2[3:6]),
            gdt=x.gdt + dgdt,
            gddt=x.gddt + dgddt,
            gyaw=x.gyaw + dgyaw,
            ganchor=x.ganchor + dganc,
            rho=x.rho + drho,
        )

    def boxminus_frames(self, x: WindowState, x0: WindowState) -> jax.Array:
        """Tangent of frame states (x ⊟ x0) in layout order, landmarks
        excluded — used to evaluate the marginalization prior."""
        dp = (x.p - x0.p).reshape(-1)
        dth = lie.quat_boxminus(x.q, x0.q).reshape(-1)
        pose = jnp.stack([(x.p - x0.p), lie.quat_boxminus(x.q, x0.q)], axis=1)
        pose = pose.reshape(-1)  # [W, 2, 3] -> interleaved p, theta per frame
        sb = jnp.concatenate([x.v - x0.v, x.ba - x0.ba, x.bg - x0.bg], axis=1)
        sb = sb.reshape(-1)
        out = jnp.concatenate([
            pose,
            sb,
            x.tic - x0.tic,
            lie.quat_boxminus(x.qic, x0.qic),
            (x.td - x0.td)[None],
            x.tio - x0.tio,
            lie.quat_boxminus(x.qio, x0.qio),
            jnp.stack([x.six - x0.six, x.siy - x0.siy, x.siw - x0.siw]),
            x.tic2 - x0.tic2,
            lie.quat_boxminus(x.qic2, x0.qic2),
            (x.gdt - x0.gdt).reshape(-1),
            x.gddt - x0.gddt,
            (x.gyaw - x0.gyaw)[None],
            x.ganchor - x0.ganchor,
        ])
        return out

    # --- marginalization index sets (static numpy) --------------------
    def frame0_drop_indices(self) -> np.ndarray:
        """Tangent dims of frame 0 (pose + speedbias + GNSS clocks):
        dropped at MARGIN_OLD."""
        pose0 = np.arange(self.pose_off, self.pose_off + 6)
        sb0 = np.arange(self.sb_off, self.sb_off + 9)
        gdt0 = np.arange(self.gdt_off, self.gdt_off + 4)
        gddt0 = np.arange(self.gddt_off, self.gddt_off + 1)
        return np.concatenate([pose0, sb0, gdt0, gddt0])

    def frame_keep_indices(self) -> np.ndarray:
        """All frame dims except frame 0 (prior support after MARGIN_OLD)."""
        keep = []
        keep.append(np.arange(self.pose_off + 6, self.pose_off + self.W * 6))
        keep.append(np.arange(self.sb_off + 9, self.sb_off + self.W * 9))
        keep.append(np.arange(self.cam_off, self.gdt_off))
        keep.append(np.arange(self.gdt_off + 4, self.gdt_off + self.W * 4))
        keep.append(np.arange(self.gddt_off + 1, self.gddt_off + self.W))
        keep.append(np.arange(self.gyaw_off, self.frame_dim))
        return np.concatenate(keep)

    def shift_map_after_marg_old(self) -> np.ndarray:
        """old_to_new map for the kept dims of :func:`frame_keep_indices`:
        frame k (k ≥ 1) moves to slot k − 1; shared states stay."""
        out = []
        for k in range(1, self.W):
            out.append(np.arange(self.pose_off + (k - 1) * 6,
                                 self.pose_off + k * 6))
        for k in range(1, self.W):
            out.append(np.arange(self.sb_off + (k - 1) * 9,
                                 self.sb_off + k * 9))
        out.append(np.arange(self.cam_off, self.gdt_off))
        for k in range(1, self.W):
            out.append(np.arange(self.gdt_off + (k - 1) * 4,
                                 self.gdt_off + k * 4))
        out.append(np.arange(self.gddt_off, self.gddt_off + self.W - 1))
        out.append(np.arange(self.gyaw_off, self.frame_dim))
        return np.concatenate(out)

    def free_mask(
        self,
        fix_extrinsic: bool = True,
        fix_td: bool = True,
        fix_wheel: bool = True,
        fix_wheel_intrinsic: bool | None = None,
        fix_wheel_extrinsic: bool | None = None,
        wheel_extrinsic_type: int = 3,
        landmark_mask: jax.Array | None = None,
        frame_mask: jax.Array | None = None,
        fix_first_pose: bool = False,
        use_gnss: bool = False,
        fix_yaw: bool = True,
        fix_anchor: bool = True,
        extrinsic_type: int = 0,
        fix_cam2: bool = True,
        dtype=jnp.float32,
    ) -> jax.Array:
        """Build the [D] {0,1} mask of optimizable dims.

        ``landmark_mask`` [F]: 1 = optimize inverse depth (0 for empty slots
        and RGB-D depth-frozen features, reference estimate_flag==1).
        ``frame_mask`` [W]: 0 freezes a frame's pose+speedbias (stationary
        freeze, reference ``estimator.cpp:3294-3324``).
        ``extrinsic_type``: which extrinsic dims stay free when estimating
        (reference ``extrinsic_type``, m3dgr.yaml:41-45 / pose-subset local
        parameterizations): 0 all, 1 translation only, 2 rotation only,
        3 no z (planar motion leaves t_z unobservable), 4 translation-xy only.
        """
        m = np.ones((self.dim,), dtype=np.float32)
        if fix_extrinsic:
            m[self.cam_off:self.cam_off + 6] = 0
        else:
            if extrinsic_type == 1:      # only translation
                m[self.cam_off + 3:self.cam_off + 6] = 0
            elif extrinsic_type == 2:    # only rotation
                m[self.cam_off:self.cam_off + 3] = 0
            elif extrinsic_type == 3:    # no z
                m[self.cam_off + 2] = 0
            elif extrinsic_type == 4:    # no rotation, no z
                m[self.cam_off + 2:self.cam_off + 6] = 0
        if fix_td:
            m[self.td_off] = 0
        # wheel calibration states: split intrinsic (sx sy sw, reference
        # ESTIMATE_INTRINSIC_WHEEL) from extrinsic (t_io q_io, reference
        # ESTIMATE_EXTRINSIC_WHEEL, estimator.cpp:2387-2598); ``fix_wheel``
        # is the both-together default
        fwe = fix_wheel if fix_wheel_extrinsic is None else fix_wheel_extrinsic
        fwi = fix_wheel if fix_wheel_intrinsic is None else fix_wheel_intrinsic
        if fwe:
            m[self.wext_off:self.wext_off + 6] = 0
        else:
            # subset per WHEEL_EXT_ADJ_TYPE (reference extrinsic_type_wheel,
            # parameters.cpp:286-306): same encoding as the camera's
            # extrinsic_type; default 3 (no z — planar rigs leave the wheel
            # z-offset unobservable)
            if wheel_extrinsic_type == 1:      # translation only
                m[self.wext_off + 3:self.wext_off + 6] = 0
            elif wheel_extrinsic_type == 2:    # rotation only
                m[self.wext_off:self.wext_off + 3] = 0
            elif wheel_extrinsic_type == 3:    # no z
                m[self.wext_off + 2] = 0
            elif wheel_extrinsic_type == 4:    # no rotation, no z
                m[self.wext_off + 2:self.wext_off + 6] = 0
        if fwi:
            m[self.wint_off:self.wint_off + 3] = 0
        if fix_cam2:
            m[self.cam2_off:self.cam2_off + 6] = 0
        if not use_gnss:
            m[self.gdt_off:self.frame_dim] = 0
        else:
            # yaw/anchor refined only during GNSS-VI alignment (reference
            # fixes them once gnss_ready, and always under low speed).
            # In-window yaw refinement is weakly observable (a ~1 m window
            # arc vs metre-level pseudorange noise) — velocity matching is
            # the reliable yaw source, so yaw stays fixed by default.
            if fix_yaw:
                m[self.gyaw_off] = 0
            if fix_anchor:
                m[self.ganchor_off:self.ganchor_off + 3] = 0
        mask = jnp.asarray(m, dtype)
        if frame_mask is not None:
            fm = frame_mask.astype(dtype)
            pose_m = jnp.repeat(fm, 6)
            sb_m = jnp.repeat(fm, 9)
            mask = mask.at[self.pose_off:self.pose_off + self.W * 6].mul(pose_m)
            mask = mask.at[self.sb_off:self.sb_off + self.W * 9].mul(sb_m)
        if fix_first_pose:
            mask = mask.at[self.pose_off:self.pose_off + 6].set(0.0)
        if landmark_mask is not None:
            mask = mask.at[self.rho_off:self.rho_off + self.F].set(
                landmark_mask.astype(dtype))
        return mask
