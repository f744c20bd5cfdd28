"""Synthetic sliding-window BA: perturb ground truth, solve, recover."""

import numpy as np
import jax
import jax.numpy as jnp

from ground_fusion2_tpu.core import lie
from ground_fusion2_tpu.data import synthetic as sim
from ground_fusion2_tpu.factors.vio_factors import FeatureTable, imu_sqrt_info
from ground_fusion2_tpu.sensors.imu_preint import ImuNoise, preintegrate
from ground_fusion2_tpu.sensors.wheel_preint import WheelNoise, preintegrate_wheel
from ground_fusion2_tpu.solver.marginalize import MargPrior
from ground_fusion2_tpu.gnss.factors import GnssTable
from ground_fusion2_tpu.vio.problem import (
    VioConfig, VioMeasurements, marginalize_oldest, solve_window,
)
from ground_fusion2_tpu.vio.state import NUM_FRAMES, WindowLayout, WindowState

F_SLOTS = 64
KF_DT = 0.4
IMU_RATE = 200.0
SPP = int(KF_DT * IMU_RATE)  # imu samples per keyframe interval


def build_window(seed=0, perturb=True, pix_noise=0.0, imu_noise=False,
                 td_true=0.0, depth_fix_all=False, with_stereo=False,
                 stereo_baseline=0.05):
    rng = np.random.default_rng(seed)
    traj = sim.make_planar_trajectory(duration=10.0, yaw_rate=0.4, wobble=0.05)
    lms = sim.make_landmarks(traj, n=400, seed=seed)
    cam = sim.CameraSim()

    W = NUM_FRAMES
    kf_idx = [int(i * SPP) for i in range(W)]

    # --- camera observations -> feature table -------------------------
    # td simulation: observations are taken at t + td_true (the image clock
    # lags the IMU clock); the factor's td state must absorb it.
    td_samples = int(round(td_true * IMU_RATE))
    obs_uv = np.zeros((W, lms.pts.shape[0], 2))
    obs_z = np.zeros((W, lms.pts.shape[0]))
    obs_ok = np.zeros((W, lms.pts.shape[0]), dtype=bool)
    obs_vel = np.zeros((W, lms.pts.shape[0], 2))
    for k, i in enumerate(kf_idx):
        io = min(i + td_samples, traj.t.shape[0] - 2)
        uv, z, ok = cam.observe(traj.p[io], traj.q[io], lms.pts,
                                noise=pix_noise, rng=rng)
        uv1, _, ok1 = cam.observe(traj.p[io + 1], traj.q[io + 1], lms.pts)
        obs_uv[k], obs_z[k], obs_ok[k] = uv, z, ok & ok1
        obs_vel[k] = (uv1 - uv) * IMU_RATE     # normalized-plane velocity

    n_obs = obs_ok.sum(axis=0)
    good = np.where(n_obs >= 4)[0]
    rng.shuffle(good)
    chosen = good[:F_SLOTS]

    ray = np.zeros((F_SLOTS, W, 2), np.float32)
    vel = np.zeros((F_SLOTS, W, 2), np.float32)
    ovalid = np.zeros((F_SLOTS, W), np.float32)
    anchor = np.zeros((F_SLOTS,), np.int32)
    tvalid = np.zeros((F_SLOTS,), np.float32)
    dfixed = np.zeros((F_SLOTS,), np.float32)
    rho_true = np.full((F_SLOTS,), 0.2, np.float32)
    for s, li in enumerate(chosen):
        frames = np.where(obs_ok[:, li])[0]
        anchor[s] = frames[0]
        tvalid[s] = 1.0
        ray[s, frames] = obs_uv[frames, li]
        vel[s, frames] = obs_vel[frames, li]
        ovalid[s, frames] = 1.0
        rho_true[s] = 1.0 / obs_z[frames[0], li]
        if depth_fix_all:
            dfixed[s] = 1.0

    feats = FeatureTable(
        ray=jnp.asarray(ray), vel=jnp.asarray(vel),
        obs_valid=jnp.asarray(ovalid), anchor=jnp.asarray(anchor),
        track_valid=jnp.asarray(tvalid), depth_fixed=jnp.asarray(dfixed),
    )

    # --- IMU preintegration per interval ------------------------------
    if imu_noise:
        acc, gyr = sim.add_imu_noise(traj, rng)
    else:
        acc, gyr = traj.acc_body, traj.gyr_body
    accs = np.stack([acc[kf_idx[k]:kf_idx[k] + SPP + 1] for k in range(W - 1)])
    gyrs = np.stack([gyr[kf_idx[k]:kf_idx[k] + SPP + 1] for k in range(W - 1)])
    dts = np.full((W - 1, SPP), 1.0 / IMU_RATE, np.float32)
    z3 = jnp.zeros((W - 1, 3), jnp.float32)
    pre = jax.vmap(lambda a, g, d, ba, bg: preintegrate(
        a, g, d, ba, bg, ImuNoise(acc_n=0.05, gyr_n=0.005)))(
        jnp.asarray(accs, jnp.float32), jnp.asarray(gyrs, jnp.float32),
        jnp.asarray(dts), z3, z3)
    sinfo = imu_sqrt_info(pre.cov)

    # --- wheel preintegration (perfect) -------------------------------
    wvel = sim.wheel_velocity_body(traj)
    wvels = np.stack([wvel[kf_idx[k]:kf_idx[k] + SPP + 1] for k in range(W - 1)])
    wpre = jax.vmap(lambda v, g, d: preintegrate_wheel(
        v, g, d, 1.0, 1.0, 1.0, WheelNoise(vel_n=0.05, gyr_n=0.005)))(
        jnp.asarray(wvels, jnp.float32), jnp.asarray(gyrs, jnp.float32),
        jnp.asarray(dts))
    wsinfo = imu_sqrt_info(wpre.cov)

    # --- states --------------------------------------------------------
    p_t = traj.p[kf_idx].astype(np.float32)
    q_t = traj.q[kf_idx].astype(np.float32)
    v_t = traj.v[kf_idx].astype(np.float32)
    x_true = WindowState.identity(F_SLOTS)._replace(
        p=jnp.asarray(p_t), q=jnp.asarray(q_t), v=jnp.asarray(v_t),
        qic=jnp.asarray(lie.mat_to_quat(jnp.asarray(cam.ric, jnp.float32))),
        tic=jnp.asarray(cam.tic, jnp.float32),
        rho=jnp.asarray(rho_true),
    )
    if perturb:
        x0 = x_true._replace(
            p=x_true.p + jnp.asarray(rng.normal(scale=0.05, size=(W, 3)), jnp.float32),
            q=lie.quat_boxplus(x_true.q, jnp.asarray(
                rng.normal(scale=0.02, size=(W, 3)), jnp.float32)),
            v=x_true.v + jnp.asarray(rng.normal(scale=0.05, size=(W, 3)), jnp.float32),
            rho=x_true.rho * jnp.asarray(
                1.0 + rng.normal(scale=0.1, size=(F_SLOTS,)), jnp.float32),
        )
        # keep frame-0 pose at truth: it is the gauge anchor
        x0 = x0._replace(p=x0.p.at[0].set(x_true.p[0]),
                         q=x0.q.at[0].set(x_true.q[0]))
    else:
        x0 = x_true

    # --- optional second camera (stereo) -------------------------------
    stereo_ray = None
    stereo_valid = None
    if with_stereo:
        tic2 = cam.tic + cam.ric @ np.array([stereo_baseline, 0.0, 0.0])
        stereo_ray = np.zeros((F_SLOTS, W, 2), np.float32)
        stereo_valid = np.zeros((F_SLOTS, W), np.float32)
        for s, li in enumerate(chosen):
            l_w = lms.pts[li]
            for k, i in enumerate(kf_idx):
                if not ovalid[s, k]:
                    continue
                R_wb = sim._quat_to_mat(traj.q[i])
                p_c2 = cam.ric.T @ (R_wb.T @ (l_w - traj.p[i]) - tic2)
                if p_c2[2] > 0.3:
                    stereo_ray[s, k] = p_c2[:2] / p_c2[2]
                    stereo_valid[s, k] = 1.0
        x_stereo_tic2 = tic2

    layout = WindowLayout(F_SLOTS)
    meas = VioMeasurements(
        feats=feats,
        imu=pre, imu_valid=jnp.ones((W - 1,), jnp.float32), imu_sqrt_info=sinfo,
        wheel=wpre, wheel_valid=jnp.ones((W - 1,), jnp.float32),
        wheel_sqrt_info=wsinfo,
        plane_valid=jnp.zeros(()), stationary=jnp.zeros(()),
        gnss=GnssTable.empty(11), gnss_enabled=jnp.zeros(()),
        prior=MargPrior.empty(layout.frame_dim),
        prior_state=x0,
        stereo_ray=None if stereo_ray is None else jnp.asarray(stereo_ray),
        stereo_valid=None if stereo_valid is None else jnp.asarray(stereo_valid),
        frame_dt=jnp.full((W - 1,), KF_DT, jnp.float32),
    )
    if with_stereo:
        tic2j = jnp.asarray(x_stereo_tic2, jnp.float32)
        x_true = x_true._replace(tic2=tic2j, qic2=x_true.qic)
        x0 = x0._replace(tic2=tic2j, qic2=x_true.qic)
        meas = meas._replace(prior_state=x0)
    return x_true, x0, meas, layout


def test_window_ba_recovers_truth():
    x_true, x0, meas, layout = build_window(perturb=True)
    cfg = VioConfig(num_feats=F_SLOTS)
    out = solve_window(x0, meas, layout, cfg)
    assert out.cost < 1e-3 * out.cost0, (out.cost0, out.cost)
    p_err = np.linalg.norm(np.asarray(out.state.p - x_true.p), axis=-1)
    assert p_err.max() < 0.01, p_err
    th_err = np.linalg.norm(
        np.asarray(lie.quat_boxminus(out.state.q, x_true.q)), axis=-1)
    assert th_err.max() < 0.005, th_err
    v_err = np.linalg.norm(np.asarray(out.state.v - x_true.v), axis=-1)
    assert v_err.max() < 0.02, v_err


def test_window_ba_at_truth_stays():
    x_true, x0, meas, layout = build_window(perturb=False)
    cfg = VioConfig(num_feats=F_SLOTS)
    out = solve_window(x0, meas, layout, cfg)
    p_drift = np.linalg.norm(np.asarray(out.state.p - x_true.p), axis=-1)
    assert p_drift.max() < 2e-3


def test_window_ba_with_wheel_factor():
    x_true, x0, meas, layout = build_window(perturb=True)
    cfg = VioConfig(num_feats=F_SLOTS, use_wheel=True)
    out = solve_window(x0, meas, layout, cfg)
    p_err = np.linalg.norm(np.asarray(out.state.p - x_true.p), axis=-1)
    assert p_err.max() < 0.02, p_err


def test_window_ba_noisy_measurements():
    x_true, x0, meas, layout = build_window(perturb=True, pix_noise=1.5 / 460.0,
                                            imu_noise=True)
    cfg = VioConfig(num_feats=F_SLOTS)
    out = solve_window(x0, meas, layout, cfg)
    p_err = np.linalg.norm(np.asarray(out.state.p - x_true.p), axis=-1)
    assert p_err.max() < 0.15, p_err


def test_stationary_freeze_keeps_states():
    x_true, x0, meas, layout = build_window(perturb=True)
    meas = meas._replace(stationary=jnp.ones(()))
    cfg = VioConfig(num_feats=F_SLOTS)
    out = solve_window(x0, meas, layout, cfg)
    np.testing.assert_allclose(np.asarray(out.state.p), np.asarray(x0.p), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.state.v), np.asarray(x0.v), atol=1e-6)


def test_window_ba_stereo_factors():
    """2F2C/1F2C second-camera factors: residuals vanish at truth and the
    perturbed window still converges with them enabled."""
    x_true, x0, meas, layout = build_window(perturb=True, with_stereo=True)
    from ground_fusion2_tpu.factors.vio_factors import stereo_projection_residuals
    r, w = stereo_projection_residuals(
        x_true, meas.feats, meas.stereo_ray, meas.stereo_valid, 460.0 / 1.5)
    c_true = float(jnp.sum((r * w) ** 2))
    assert c_true < 1e-3, c_true

    cfg = VioConfig(num_feats=F_SLOTS, use_stereo=True)
    out = solve_window(x0, meas, layout, cfg)
    p_err = np.linalg.norm(np.asarray(out.state.p - x_true.p), axis=-1)
    assert p_err.max() < 0.01, p_err


def test_window_ba_motion_factors():
    """Non-holonomic + pos-vel ties hold on a planar trajectory (lateral
    body velocity ~0) and don't degrade the solve."""
    x_true, x0, meas, layout = build_window(perturb=True)
    cfg = VioConfig(num_feats=F_SLOTS, use_motion=True, motion_weight=2.0)
    out = solve_window(x0, meas, layout, cfg)
    p_err = np.linalg.norm(np.asarray(out.state.p - x_true.p), axis=-1)
    assert p_err.max() < 0.02, p_err


def test_outlier_mask_kills_bad_landmark():
    """Per-landmark outlier removal (reference removeOutlier): a landmark
    with a corrupted depth must be flagged; healthy tracks survive."""
    from ground_fusion2_tpu.vio import feature_window as fwin

    x_true, x0, meas, layout = build_window(perturb=False)
    f = meas.feats
    fw = fwin.FeatureWindow(
        ray=f.ray, vel=f.vel, depth=jnp.zeros_like(f.obs_valid),
        obs_valid=f.obs_valid, anchor=f.anchor, track_valid=f.track_valid,
        depth_fixed=f.depth_fixed)
    x_bad = x_true._replace(rho=x_true.rho.at[5].mul(2.0).at[11].mul(0.5))
    keep = np.asarray(fwin.outlier_mask(fw, x_bad, px_thresh=6.0))
    assert keep[5] == 0.0 and keep[11] == 0.0
    others = np.delete(np.arange(F_SLOTS), [5, 11])
    live = np.asarray(f.track_valid)[others] > 0
    assert keep[others][live].min() == 1.0


def test_marginalization_prior_constrains():
    x_true, x0, meas, layout = build_window(perturb=True)
    cfg = VioConfig(num_feats=F_SLOTS)
    out = solve_window(x0, meas, layout, cfg)
    prior = marginalize_oldest(out.state, meas, layout, cfg)
    assert bool(prior.valid > 0)
    assert bool(jnp.all(jnp.isfinite(prior.sqrt_J)))
    # prior must penalize moving the (shifted) kept frames away from the
    # solved linearization point
    x_lin = out.state
    dx0 = layout.boxminus_frames(x_lin, x_lin)
    r0, w0 = prior.residual(dx0)
    x_moved = x_lin._replace(p=x_lin.p + 0.05)
    # frame k of the next window corresponds to old frame k+1... evaluating
    # at the same layout: moving all positions must raise the prior cost
    dx1 = layout.boxminus_frames(x_moved, x_lin)
    r1, w1 = prior.residual(dx1)
    c0 = float(jnp.sum((r0 * w0) ** 2))
    c1 = float(jnp.sum((r1 * w1) ** 2))
    assert c1 > c0 + 1e-3, (c0, c1)
