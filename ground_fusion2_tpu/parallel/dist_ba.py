"""Distributed sliding-window BA: landmark-sharded Schur reduction over a mesh.

The reference has no multi-device story (its "distribution" is ROS pub/sub,
SURVEY.md §5.8); this module is the TPU-native scaling path mandated by
BASELINE.json: shard the landmark/feature axis across devices, eliminate each
landmark's scalar inverse depth locally in closed form, and ``psum`` the
reduced frame-dim normal equations over the mesh — the distributed
Schur-complement BA of the north star.

Design:
  * mesh axis ``"f"``: feature shards (per-device slices of the [F] axis);
    frame states replicated.
  * per shard: dense Jacobian of its features' reprojection residuals w.r.t.
    the frame tangent (jacfwd, [Fs, W, 2, Dframe]) + the scalar landmark
    derivative; per-feature Schur reduction is a rank-1 correction.
  * ``psum`` over ``"f"`` yields the exact reduced (H', g') of the full
    problem on every device; frame update solved replicated; landmark
    back-substitution local to each shard.

One GN iteration == one compiled SPMD program; collectives ride ICI.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..factors import vio_factors as fac
from ..vio.problem import VioConfig, VioMeasurements
from ..vio.state import WindowLayout, WindowState


def _frame_retract(layout: WindowLayout, x: WindowState, delta_f: jax.Array,
                   rho: jax.Array) -> WindowState:
    """Retract frame dims only (delta_f: [frame_dim]) with explicit rho."""
    full = jnp.concatenate([delta_f, jnp.zeros((layout.F,), delta_f.dtype)])
    x2 = layout.retract(x, full)
    return x2._replace(rho=rho)


def shard_residuals(x: WindowState, feats: fac.FeatureTable, layout,
                    cfg: VioConfig, delta_f, rho):
    """Projection residuals of this shard's features at (delta_f, rho)."""
    x2 = _frame_retract(layout, x, delta_f, rho)
    r, w = fac.projection_residuals(x2, feats, cfg.proj_sqrt_info,
                                    cfg.huber_delta)
    return r, w


def reduced_normal_equations(x, feats, layout, cfg, axis_name="f", lam=0.0):
    """Per-shard reduced (H', g') over frame dims with landmarks eliminated.

    Returns psum'd (H', g') — identical on every device — plus the per-shard
    back-substitution operators (S_rr [Fs], g_r [Fs], G_rf [Fs, Dframe]).
    """
    Df = layout.frame_dim
    zero_f = jnp.zeros((Df,), x.p.dtype)

    def r_of_frames(df):
        r, w = shard_residuals(x, feats, layout, cfg, df, x.rho)
        return (r * jax.lax.stop_gradient(w)).reshape(-1)

    def r_of_rho(rho):
        r, w = shard_residuals(x, feats, layout, cfg, zero_f, rho)
        return (r * jax.lax.stop_gradient(w)).reshape(-1)

    r0, w0 = shard_residuals(x, feats, layout, cfg, zero_f, x.rho)
    rw = (r0 * w0).reshape(-1)                       # [Fs*W*2]
    Jf = jax.jacfwd(r_of_frames)(zero_f)             # [Fs*W*2, Df]
    # landmark jacobian: block-diagonal — jvp per unit rho basis would be
    # [M, Fs]; instead get the diagonal via one jvp with ones and per-feature
    # masking (each residual row depends on exactly one rho).
    Fs = feats.ray.shape[0]
    _, Jr_flat = jax.jvp(r_of_rho, (x.rho,), (jnp.ones_like(x.rho),))
    Jr = Jr_flat.reshape(Fs, -1)                     # [Fs, W*2] rows per feat
    # depth-fixed landmarks stay pinned (reference estimate_flag==1): no
    # elimination, no back-substitution — zero their landmark derivative
    nobs = jnp.sum(feats.obs_valid, axis=1)
    rho_free = (feats.track_valid * (1.0 - feats.depth_fixed)
                * (nobs >= 2).astype(Jr.dtype))
    Jr = Jr * rho_free[:, None]

    Jf_ = Jf.reshape(Fs, -1, Df)                     # [Fs, W*2, Df]
    rw_ = rw.reshape(Fs, -1)                         # [Fs, W*2]

    # Square-root Schur: project each feature's residual block onto the
    # orthogonal complement of its landmark direction q = Jr/|Jr|. This
    # avoids the catastrophic f32 cancellation of the textbook
    # H_ff − G S⁻¹ Gᵀ form (terms ~1e6 cancelling to ~1e0).
    S_rr = jnp.einsum("fm,fm->f", Jr, Jr)            # scalar per landmark
    g_r = jnp.einsum("fm,fm->f", Jr, rw_)
    G_rf = jnp.einsum("fm,fmi->fi", Jr, Jf_)         # [Fs, Df]
    # LM damping on the landmark block: S -> S(1+lam), matching the damped
    # full system — the undamped back-substitution otherwise overshoots rho
    # at small lambda and the LM loop thrashes accept/reject.
    S_d = S_rr * (1.0 + lam)
    inv_S = jnp.where(S_rr > 1e-8, 1.0 / jnp.maximum(S_d, 1e-8), 0.0)

    # projection with the DAMPED landmark block: P = I - Jr inv(S_d) Jr^T
    # (no longer an orthogonal projection when lam>0; exact Schur of the
    # damped system). Computed in the stable subtract-the-projection form.
    coef = jnp.einsum("fm,fmi->fi", Jr, Jf_) * inv_S[:, None]     # [Fs, Df]
    coef_r = jnp.einsum("fm,fm->f", Jr, rw_) * inv_S              # [Fs]
    Jf_proj = Jf_ - Jr[:, :, None] * coef[:, None, :]
    r_proj = rw_ - Jr * coef_r[:, None]

    # H' = Jf^T (I - Jr S^-1 Jr^T) Jf; using the one-sided projected forms
    # keeps the big cancellation inside per-feature [W*2]-sized dots.
    H_red = jnp.einsum("fmi,fmj->ij", Jf_, Jf_proj)
    H_red = 0.5 * (H_red + H_red.T)
    g_red = jnp.einsum("fmi,fm->i", Jf_, r_proj)

    # full (pre-reduction) frame-block diagonal, for joint-solve-equivalent
    # LM damping downstream
    diag_full = jnp.einsum("fmi,fmi->i", Jf_, Jf_)

    H_red = jax.lax.psum(H_red, axis_name)
    g_red = jax.lax.psum(g_red, axis_name)
    diag_full = jax.lax.psum(diag_full, axis_name)
    return H_red, g_red, (S_rr, inv_S, g_r, G_rf, diag_full)


def _dense_residuals(x, meas: VioMeasurements, layout, cfg, delta_f):
    """Replicated (IMU + wheel + plane + GNSS + prior) residual stack over
    frame dims — the full non-projection factor set of ``solve_window``."""
    from ..gnss.factors import gnss_residuals

    x2 = _frame_retract(layout, x, delta_f, x.rho)
    g_world = jnp.asarray([0.0, 0.0, -cfg.g_norm], x.p.dtype)
    r_imu, w_imu = fac.imu_residuals(
        x2, meas.imu, meas.imu_sqrt_info, g_world, meas.imu_valid)
    parts_r = [r_imu.reshape(-1)]
    parts_w = [w_imu.reshape(-1)]
    if cfg.use_wheel:
        r_w, w_w = fac.wheel_residuals(
            x2, meas.wheel, meas.wheel_sqrt_info, meas.wheel_valid)
        parts_r.append(r_w.reshape(-1))
        parts_w.append(w_w.reshape(-1))
    if cfg.use_plane:
        r_pl, w_pl = fac.plane_residuals(x2, cfg.plane_weight, meas.plane_valid)
        parts_r.append(r_pl.reshape(-1))
        parts_w.append(w_pl.reshape(-1))
    if cfg.use_gnss:
        r_g, w_g = gnss_residuals(x2, meas.gnss, meas.gnss_enabled)
        parts_r.append(r_g)
        parts_w.append(w_g)
    dxf = layout.boxminus_frames(x2, meas.prior_state)
    r_p, w_p = meas.prior.residual(dxf)
    parts_r.append(r_p)
    parts_w.append(w_p)
    return jnp.concatenate(parts_r), jnp.concatenate(parts_w)


def total_cost(x, meas, layout, cfg, axis_name="f"):
    """Exact total cost at x: psum of the shard's projection cost + the
    replicated dense-block cost (divided by the axis size since every
    device computes the same dense part)."""
    r_p, w_p = shard_residuals(
        x, meas.feats, layout, cfg,
        jnp.zeros((layout.frame_dim,), x.p.dtype), x.rho)
    c_proj = 0.5 * jnp.sum((r_p * w_p) ** 2)
    r_d, w_d = _dense_residuals(
        x, meas, layout, cfg, jnp.zeros((layout.frame_dim,), x.p.dtype))
    c_dense = 0.5 * jnp.sum((r_d * w_d) ** 2) / jax.lax.psum(
        jnp.ones(()), axis_name)
    return jax.lax.psum(c_proj + c_dense, axis_name)


def gn_step(x: WindowState, meas: VioMeasurements, layout: WindowLayout,
            cfg: VioConfig, lam=1e-4, axis_name: str = "f"):
    """One distributed damped GN step. Runs inside shard_map: ``meas.feats``
    sharded on the feature axis, everything else replicated."""
    Df = layout.frame_dim
    dtype = x.p.dtype

    H_red, g_red, (S_rr, inv_S, g_r, G_rf, diag_full) = reduced_normal_equations(
        x, meas.feats, layout, cfg, axis_name, lam=lam)

    # replicated factor blocks (IMU/wheel/prior)
    zero_f = jnp.zeros((Df,), dtype)

    def rfn(df):
        r, w = _dense_residuals(x, meas, layout, cfg, df)
        return r * jax.lax.stop_gradient(w)

    r_d = rfn(zero_f)
    J_d = jax.jacfwd(rfn)(zero_f)
    H = H_red + J_d.T @ J_d
    g = g_red + J_d.T @ r_d

    # gauge + fixed-dim handling mirrors solve_window exactly
    base = layout.free_mask(
        fix_extrinsic=not cfg.estimate_extrinsic,
        fix_td=not cfg.estimate_td,
        fix_wheel=True,
        use_gnss=cfg.use_gnss,
        fix_yaw=not cfg.refine_gnss_yaw,
        fix_anchor=not cfg.refine_gnss_alignment,
        dtype=dtype)[:Df]
    pose0 = jnp.zeros((Df,), dtype).at[layout.pose_off:layout.pose_off + 6].set(1.0)
    anchored = (meas.prior.valid > 0) | (
        (meas.gnss_enabled > 0) if cfg.use_gnss else False)
    free = jnp.where(anchored, base, base * (1.0 - pose0))
    Hm = H * free[:, None] * free[None, :]
    # damp with the FULL (unreduced) frame diagonal — matches the joint
    # damped solve exactly, so the distributed LM follows the same path as
    # the single-device solver
    diag = (diag_full + jnp.diagonal(J_d.T @ J_d)) * free
    damped = Hm + jnp.diag(lam * jnp.maximum(diag, 1e-8) + (1.0 - free))
    d = jnp.sqrt(jnp.maximum(jnp.diagonal(damped), 1e-12))
    d_inv = 1.0 / d
    Hs = damped * d_inv[:, None] * d_inv[None, :]
    L = jax.scipy.linalg.cho_factor(Hs, lower=True)
    df = -(d_inv * jax.scipy.linalg.cho_solve(L, (g * free) * d_inv)) * free

    # landmark back-substitution (local to the shard)
    drho = -inv_S * (g_r + G_rf @ df)
    new_rho = x.rho + drho
    x_new = _frame_retract(layout, x, df, new_rho)
    return x_new, jnp.sum(r_d * r_d)


def make_distributed_solver(mesh: Mesh, layout: WindowLayout, cfg: VioConfig,
                            iters: int = 4, axis_name: str = "f"):
    """Build a pjit-compiled distributed window solver over ``mesh``.

    Feature-axis leaves of the measurements/state are sharded along
    ``axis_name``; everything else replicated. Returns a function
    (x, meas) -> (x', cost) with sharded-in/sharded-out semantics.
    """
    from jax.experimental.shard_map import shard_map

    n_shard = mesh.shape[axis_name]
    assert layout.F % n_shard == 0, "feature count must divide the mesh axis"
    local_layout = WindowLayout(layout.F // n_shard)

    feat_spec = fac.FeatureTable(
        ray=P(axis_name), vel=P(axis_name), obs_valid=P(axis_name),
        anchor=P(axis_name), track_valid=P(axis_name), depth_fixed=P(axis_name))
    state_spec = jax.tree.map(lambda _: P(), WindowState.identity(1))
    state_spec = state_spec._replace(rho=P(axis_name))
    meas_spec = jax.tree.map(lambda _: P(), _example_meas_spec())
    meas_spec = meas_spec._replace(feats=feat_spec)

    @partial(shard_map, mesh=mesh,
             in_specs=(state_spec, meas_spec),
             out_specs=(state_spec, P()),
             check_rep=False)
    def solve(x, meas):
        c0 = total_cost(x, meas, local_layout, cfg, axis_name)

        def body(carry, _):
            x, lam, cost = carry
            x_cand, _ = gn_step(x, meas, local_layout, cfg, lam=lam,
                                axis_name=axis_name)
            c_cand = total_cost(x_cand, meas, local_layout, cfg, axis_name)
            accept = c_cand < cost
            x_new = jax.tree.map(
                lambda a, b: jnp.where(accept, a, b), x_cand, x)
            cost_new = jnp.where(accept, c_cand, cost)
            lam_new = jnp.where(accept, jnp.maximum(lam * 0.3, 1e-9),
                                jnp.minimum(lam * 10.0, 1e6))
            return (x_new, lam_new, cost_new), None

        (x_out, _, cost), _ = jax.lax.scan(
            body, (x, jnp.asarray(1e-4, x.p.dtype), c0), None, length=iters)
        return x_out, cost

    return jax.jit(solve)


def _example_meas_spec():
    """Build a VioMeasurements pytree of the right structure for spec mapping."""
    from ..sensors.imu_preint import ImuPreint
    from ..sensors.wheel_preint import WheelPreint
    from ..solver.marginalize import MargPrior

    from ..gnss.factors import GnssTable

    z = jnp.zeros(())
    imu = ImuPreint(z, z, z, z, z, z, z, z)
    whl = WheelPreint(z, z, z, z, z, z, z, z, z, z, z, z)
    n_state = len(WindowState._fields)
    n_gnss = len(GnssTable._fields)
    return VioMeasurements(
        feats=None, imu=imu, imu_valid=z, imu_sqrt_info=z,
        wheel=whl, wheel_valid=z, wheel_sqrt_info=z,
        plane_valid=z, stationary=z,
        gnss=GnssTable(*([z] * n_gnss)), gnss_enabled=z,
        prior=MargPrior(z, z, z), prior_state=WindowState(*([z] * n_state)))
