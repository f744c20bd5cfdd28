"""Window optimization problem: compose factors → one LM solve → marg prior.

This is the TPU equivalent of the reference's ``Estimator::optimization``
(``estimator.cpp:2951-3698``): build every factor's residuals over the
current window, run damped Gauss-Newton in the fixed tangent layout, then
Schur-marginalize the oldest frame into the dense prior. The whole thing is
one jitted function of fixed-shape arrays; all gating (wheel anomaly,
stationary freeze, GNSS low-speed, depth-frozen landmarks) enters as {0,1}
masks, never as Python control flow.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..factors import vio_factors as fac
from ..gnss.factors import GnssTable, gnss_residuals
from ..sensors.imu_preint import ImuPreint
from ..sensors.wheel_preint import WheelPreint
from ..solver.gauss_newton import lm_solve, normal_equations
from ..solver.marginalize import MargPrior, marginalize, shift_prior
from .state import NUM_FRAMES, WindowLayout, WindowState


class VioConfig(NamedTuple):
    num_feats: int = 150              # reference max_cnt (m3dgr.yaml:100)
    proj_sqrt_info: float = 460.0 / 1.5  # FOCAL/1.5 (reference sqrt_info)
    huber_delta: float = 1.0
    max_iters: int = 8                # reference NUM_ITERATIONS
    use_wheel: bool = False
    use_plane: bool = False
    plane_weight: float = 10.0
    use_stereo: bool = False          # 2F2C/1F2C second-camera factors
    use_motion: bool = False          # non-holonomic + pos-vel kinematic ties
    motion_weight: float = 5.0
    posvel_weight: float = 10.0
    estimate_extrinsic: bool = False
    extrinsic_type: int = 0           # reference m3dgr.yaml:41-45 (3 = no z)
    estimate_td: bool = False
    # online wheel calibration (reference ESTIMATE_INTRINSIC_WHEEL /
    # ESTIMATE_EXTRINSIC_WHEEL, parameters.h:32, estimator.cpp:2387-2598)
    estimate_wheel_intrinsic: bool = False
    estimate_wheel_extrinsic: bool = False
    wheel_extrinsic_type: int = 3     # reference extrinsic_type_wheel
    use_gnss: bool = False
    refine_gnss_alignment: bool = False   # anchor free (during VI align)
    refine_gnss_yaw: bool = False         # yaw free (observability caveat:
                                          # needs a long window arc)
    g_norm: float = 9.81


class VioMeasurements(NamedTuple):
    """Everything the window solve consumes, fixed shapes."""

    feats: fac.FeatureTable
    imu: ImuPreint           # batched [W-1]
    imu_valid: jax.Array     # [W-1]
    imu_sqrt_info: jax.Array  # [W-1, 15, 15]
    wheel: WheelPreint       # batched [W-1]
    wheel_valid: jax.Array   # [W-1] (gated by anomaly detector)
    wheel_sqrt_info: jax.Array  # [W-1, 6, 6]
    plane_valid: jax.Array   # [] scalar gate
    stationary: jax.Array    # [] scalar: freeze whole window
    gnss: GnssTable          # prereduced GNSS observations
    gnss_enabled: jax.Array  # [] scalar: gnss_ready && !lowspeed
    prior: MargPrior         # over frame dims (layout.frame_dim)
    prior_state: WindowState  # linearization snapshot for the prior
    # optional second-camera (stereo) observations; None when mono
    stereo_ray: jax.Array | None = None    # [F, W, 2]
    stereo_valid: jax.Array | None = None  # [F, W]
    frame_dt: jax.Array | None = None      # [W-1] for the pos-vel tie


def build_residual_fn(
    x0: WindowState,
    meas: VioMeasurements,
    layout: WindowLayout,
    cfg: VioConfig,
):
    g_world = jnp.asarray([0.0, 0.0, -cfg.g_norm], x0.p.dtype)

    def residual_fn(delta):
        x = layout.retract(x0, delta)
        r_proj, w_proj = fac.projection_residuals(
            x, meas.feats, cfg.proj_sqrt_info, cfg.huber_delta)
        r_imu, w_imu = fac.imu_residuals(
            x, meas.imu, meas.imu_sqrt_info, g_world, meas.imu_valid)
        parts_r = [r_proj.reshape(-1), r_imu.reshape(-1)]
        parts_w = [w_proj.reshape(-1), w_imu.reshape(-1)]

        if cfg.use_wheel:
            r_whl, w_whl = fac.wheel_residuals(
                x, meas.wheel, meas.wheel_sqrt_info, meas.wheel_valid)
            parts_r.append(r_whl.reshape(-1))
            parts_w.append(w_whl.reshape(-1))
        if cfg.use_plane:
            r_pl, w_pl = fac.plane_residuals(
                x, cfg.plane_weight, meas.plane_valid)
            parts_r.append(r_pl.reshape(-1))
            parts_w.append(w_pl.reshape(-1))
        if cfg.use_gnss:
            r_g, w_g = gnss_residuals(x, meas.gnss, meas.gnss_enabled)
            parts_r.append(r_g)
            parts_w.append(w_g)
        if cfg.use_stereo:
            r_s, w_s = fac.stereo_projection_residuals(
                x, meas.feats, meas.stereo_ray, meas.stereo_valid,
                cfg.proj_sqrt_info, cfg.huber_delta)
            parts_r.append(r_s.reshape(-1))
            parts_w.append(w_s.reshape(-1))
        if cfg.use_motion:
            ones_w = jnp.ones((layout.W,), x.p.dtype)
            r_m, w_m = fac.motion_residuals(x, cfg.motion_weight, ones_w)
            parts_r.append(r_m.reshape(-1))
            parts_w.append(w_m.reshape(-1))
            fdt = meas.frame_dt if meas.frame_dt is not None \
                else jnp.full((layout.W - 1,), 0.1, x.p.dtype)
            r_pv, w_pv = fac.posvel_residuals(
                x, fdt, cfg.posvel_weight, jnp.ones((layout.W - 1,), x.p.dtype))
            parts_r.append(r_pv.reshape(-1))
            parts_w.append(w_pv.reshape(-1))

        # marginalization prior over frame dims
        dx_frames = layout.boxminus_frames(x, meas.prior_state)
        r_pr, w_pr = meas.prior.residual(dx_frames)
        parts_r.append(r_pr)
        parts_w.append(w_pr)

        return jnp.concatenate(parts_r), jnp.concatenate(parts_w)

    return residual_fn


class SolveResult(NamedTuple):
    state: WindowState
    cost: jax.Array
    cost0: jax.Array
    H: jax.Array
    g: jax.Array


@partial(jax.jit, static_argnums=(2, 3))
def solve_window(
    x0: WindowState,
    meas: VioMeasurements,
    layout: WindowLayout,
    cfg: VioConfig,
) -> SolveResult:
    """One full window optimization (the per-frame solve)."""
    residual_fn = build_residual_fn(x0, meas, layout, cfg)

    landmark_mask = (
        meas.feats.track_valid
        * (1.0 - meas.feats.depth_fixed)
        * (jnp.sum(meas.feats.obs_valid, axis=1) >= 2)
    )
    # stationary ⇒ freeze all frame poses/speedbias (reference
    # estimator.cpp:3294-3324); always gauge-fix frame 0 unless prior holds it
    frame_mask = jnp.where(
        meas.stationary > 0,
        jnp.zeros((layout.W,), x0.p.dtype),
        jnp.ones((layout.W,), x0.p.dtype),
    )
    free = layout.free_mask(
        fix_extrinsic=not cfg.estimate_extrinsic,
        fix_td=not cfg.estimate_td,
        fix_wheel_intrinsic=not (cfg.use_wheel
                                 and cfg.estimate_wheel_intrinsic),
        fix_wheel_extrinsic=not (cfg.use_wheel
                                 and cfg.estimate_wheel_extrinsic),
        wheel_extrinsic_type=cfg.wheel_extrinsic_type,
        landmark_mask=landmark_mask,
        frame_mask=frame_mask,
        fix_first_pose=False,
        use_gnss=cfg.use_gnss,
        fix_yaw=not cfg.refine_gnss_yaw,
        fix_anchor=not cfg.refine_gnss_alignment,
        extrinsic_type=cfg.extrinsic_type,
    )
    # gauge: if neither a prior nor active GNSS anchors the window, pin
    # frame-0 pose (GNSS observes absolute position/yaw, so pinning would
    # fight it)
    anchored = (meas.prior.valid > 0) | (meas.gnss_enabled > 0
                                         if cfg.use_gnss else False)
    pose0 = jnp.zeros_like(free).at[layout.pose_off:layout.pose_off + 6].set(1.0)
    free = jnp.where(anchored, free, free * (1.0 - pose0))

    out = lm_solve(residual_fn, layout.dim, cfg.max_iters, free_mask=free,
                   dtype=x0.p.dtype)
    x_new = layout.retract(x0, out.delta)
    return SolveResult(x_new, out.cost, out.cost0, out.H, out.g)


@partial(jax.jit, static_argnums=(2, 3))
def marginalize_oldest(
    x: WindowState,
    meas: VioMeasurements,
    layout: WindowLayout,
    cfg: VioConfig,
) -> MargPrior:
    """Build the next window's prior by marginalizing frame 0 (MARGIN_OLD).

    Relinearizes the factors that touch frame 0 at the solved state (the
    reference marginalizes the same subset, ``estimator.cpp:3394-3697``),
    eliminates landmarks anchored at frame 0 and frame 0's pose/speedbias,
    and returns the shifted prior over the new layout.
    """
    # Only factors touching frame 0 should enter: mask observations so the
    # projection block keeps features anchored at frame 0, plus IMU/wheel
    # factor 0, plus the current prior.
    feats0 = meas.feats._replace(
        track_valid=meas.feats.track_valid
        * (meas.feats.anchor == 0).astype(meas.feats.track_valid.dtype))
    imu_valid0 = meas.imu_valid * jnp.asarray(
        [1.0] + [0.0] * (layout.W - 2), meas.imu_valid.dtype)
    wheel_valid0 = meas.wheel_valid * jnp.asarray(
        [1.0] + [0.0] * (layout.W - 2), meas.wheel_valid.dtype)
    meas0 = meas._replace(
        feats=feats0, imu_valid=imu_valid0, wheel_valid=wheel_valid0)

    residual_fn = build_residual_fn(x, meas0, layout, cfg)
    H, g, _ = normal_equations(residual_fn, jnp.zeros((layout.dim,), x.p.dtype))

    # dims the solver holds fixed (extrinsics/td/wheel) must carry no prior
    # information — zero their rows/cols so the prior can't couple through
    # never-updated states.
    fixed = layout.free_mask(
        fix_extrinsic=not cfg.estimate_extrinsic,
        fix_td=not cfg.estimate_td,
        fix_wheel_intrinsic=not (cfg.use_wheel
                                 and cfg.estimate_wheel_intrinsic),
        fix_wheel_extrinsic=not (cfg.use_wheel
                                 and cfg.estimate_wheel_extrinsic),
        wheel_extrinsic_type=cfg.wheel_extrinsic_type,
        use_gnss=cfg.use_gnss,
        fix_yaw=True, fix_anchor=True,
        extrinsic_type=cfg.extrinsic_type)
    H = H * fixed[:, None] * fixed[None, :]
    g = g * fixed

    # drop: frame-0 pose+speedbias and ALL landmark dims (features anchored
    # elsewhere have zero rows here, so dropping them is a no-op but keeps
    # the prior's support static).
    drop = np.concatenate([
        layout.frame0_drop_indices(),
        np.arange(layout.rho_off, layout.rho_off + layout.F),
    ])
    keep = layout.frame_keep_indices()
    prior = marginalize(H, g, keep, drop)
    # shift frame k → k-1 in the next window's layout; prior dims are the
    # frame dims only
    old_to_new = _keep_to_frame_positions(layout)
    return shift_prior(prior, old_to_new, layout.frame_dim)


def _keep_to_frame_positions(layout: WindowLayout) -> np.ndarray:
    """Map each kept dim (frame_keep_indices order) to its post-slide
    position inside the frame-dim block [0, frame_dim)."""
    shifted = layout.shift_map_after_marg_old()
    return shifted  # already expressed as absolute positions < frame_dim


def marginalize_second_newest(prior: MargPrior, layout: WindowLayout
                              ) -> MargPrior:
    """SECOND_NEW slide: drop frame W-2's dims from the existing prior only
    (the reference marginalizes just the prior's dependence for
    MARGIN_SECOND_NEW, ``estimator.cpp:3394-3697``). Pure function of the
    prior — jit-safe, all index maps static."""
    dx0 = jnp.zeros((layout.frame_dim,), jnp.float32)

    def res_fn(delta):
        rr = prior.sqrt_J @ delta[: layout.frame_dim] + prior.r0
        return rr, jnp.broadcast_to(prior.valid, rr.shape)

    H, g, _ = normal_equations(res_fn, dx0)
    W_ = layout.W
    sec = W_ - 2
    drop = np.concatenate([
        np.arange(layout.pose_off + sec * 6, layout.pose_off + (sec + 1) * 6),
        np.arange(layout.sb_off + sec * 9, layout.sb_off + (sec + 1) * 9),
        np.arange(layout.gdt_off + sec * 4, layout.gdt_off + (sec + 1) * 4),
        np.arange(layout.gddt_off + sec, layout.gddt_off + sec + 1),
    ])
    keep = np.setdiff1d(np.arange(layout.frame_dim), drop)
    out_prior = marginalize(H, g, keep, drop)
    # kept dims map: frames < W-2 stay; frame W-1 -> W-2 slot. The same
    # shift applies to per-frame GNSS clock dims (gdt/gddt); shared dims
    # (extrinsics/td/wheel/cam2/yaw/anchor) map identically.

    def frame_block(off, width):
        segs = []
        for k in range(W_):
            if k == sec:
                continue
            tgt = k if k < sec else k - 1
            segs.append(np.arange(off + tgt * width,
                                  off + (tgt + 1) * width))
        return segs

    out = []
    out += frame_block(layout.pose_off, 6)
    out += frame_block(layout.sb_off, 9)
    out.append(np.arange(layout.cam_off, layout.gdt_off))
    out += frame_block(layout.gdt_off, 4)
    out += frame_block(layout.gddt_off, 1)
    out.append(np.arange(layout.gyaw_off, layout.frame_dim))
    old_to_new = np.concatenate(out)
    return shift_prior(out_prior, old_to_new, layout.frame_dim)
