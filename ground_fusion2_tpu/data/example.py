"""Self-contained example problem builder (used by bench.py and
__graft_entry__.py): a synthetic 11-frame window with features + IMU + wheel
measurements, no external data needed."""

from __future__ import annotations

import numpy as np

from ..core import lie
from ..factors.vio_factors import FeatureTable, imu_sqrt_info
from ..sensors.imu_preint import ImuNoise, preintegrate
from ..sensors.wheel_preint import WheelNoise, preintegrate_wheel
from ..solver.marginalize import MargPrior
from ..gnss.factors import GnssTable
from ..vio.problem import VioConfig, VioMeasurements
from ..vio.state import NUM_FRAMES, WindowLayout, WindowState
from . import synthetic as sim


def make_example_window(num_feats: int = 96, imu_per_interval: int = 40,
                        seed: int = 0, perturb: float = 0.03,
                        wheel_scale: float = 1.0):
    """Build (x_true, x0, meas, layout, cfg) for a synthetic window.

    ``wheel_scale``: multiply the wheel velocity samples before
    preintegration (injects an intrinsic miscalibration for the online
    wheel-calibration tests, reference ESTIMATE_INTRINSIC_WHEEL)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    kf_dt = imu_per_interval / 200.0
    W = NUM_FRAMES
    traj = sim.make_planar_trajectory(
        duration=kf_dt * (W + 1), imu_rate=200.0, yaw_rate=0.4, wobble=0.05,
        ramp_time=1e-3)
    lms = sim.make_landmarks(traj, n=max(4 * num_feats, 256), seed=seed)
    cam = sim.CameraSim()
    kf_idx = [i * imu_per_interval for i in range(W)]

    L = lms.pts.shape[0]
    obs_uv = np.zeros((W, L, 2))
    obs_z = np.zeros((W, L))
    obs_ok = np.zeros((W, L), dtype=bool)
    for k, i in enumerate(kf_idx):
        obs_uv[k], obs_z[k], obs_ok[k] = cam.observe(traj.p[i], traj.q[i], lms.pts)

    good = np.where(obs_ok.sum(axis=0) >= 4)[0]
    rng.shuffle(good)
    chosen = good[:num_feats]
    F = num_feats
    ray = np.zeros((F, W, 2), np.float32)
    ovalid = np.zeros((F, W), np.float32)
    anchor = np.zeros((F,), np.int32)
    tvalid = np.zeros((F,), np.float32)
    rho_true = np.full((F,), 0.2, np.float32)
    for s, li in enumerate(chosen):
        frames = np.where(obs_ok[:, li])[0]
        anchor[s] = frames[0]
        tvalid[s] = 1.0
        ray[s, frames] = obs_uv[frames, li]
        ovalid[s, frames] = 1.0
        rho_true[s] = 1.0 / obs_z[frames[0], li]

    feats = FeatureTable(
        ray=jnp.asarray(ray), vel=jnp.zeros((F, W, 2), jnp.float32),
        obs_valid=jnp.asarray(ovalid), anchor=jnp.asarray(anchor),
        track_valid=jnp.asarray(tvalid),
        depth_fixed=jnp.zeros((F,), jnp.float32))

    n = imu_per_interval
    accs = np.stack([traj.acc_body[kf_idx[k]:kf_idx[k] + n + 1] for k in range(W - 1)])
    gyrs = np.stack([traj.gyr_body[kf_idx[k]:kf_idx[k] + n + 1] for k in range(W - 1)])
    dts = np.full((W - 1, n), 1.0 / 200.0, np.float32)
    z3 = jnp.zeros((W - 1, 3), jnp.float32)
    pre = jax.vmap(lambda a, g, d, b1, b2: preintegrate(
        a, g, d, b1, b2, ImuNoise(acc_n=0.05, gyr_n=0.005)))(
        jnp.asarray(accs, jnp.float32), jnp.asarray(gyrs, jnp.float32),
        jnp.asarray(dts), z3, z3)
    sinfo = imu_sqrt_info(pre.cov)

    wvel = sim.wheel_velocity_body(traj) * wheel_scale
    wvels = np.stack([wvel[kf_idx[k]:kf_idx[k] + n + 1] for k in range(W - 1)])
    wpre = jax.vmap(lambda v, g, d: preintegrate_wheel(
        v, g, d, 1.0, 1.0, 1.0, WheelNoise(vel_n=0.05, gyr_n=0.005)))(
        jnp.asarray(wvels, jnp.float32), jnp.asarray(gyrs, jnp.float32),
        jnp.asarray(dts))
    wsinfo = imu_sqrt_info(wpre.cov)

    x_true = WindowState.identity(F)._replace(
        p=jnp.asarray(traj.p[kf_idx], jnp.float32),
        q=jnp.asarray(traj.q[kf_idx], jnp.float32),
        v=jnp.asarray(traj.v[kf_idx], jnp.float32),
        qic=lie.mat_to_quat(jnp.asarray(cam.ric, jnp.float32)),
        tic=jnp.asarray(cam.tic, jnp.float32),
        rho=jnp.asarray(rho_true))

    if perturb > 0:
        x0 = x_true._replace(
            p=x_true.p + jnp.asarray(rng.normal(scale=perturb, size=(W, 3)), jnp.float32),
            q=lie.quat_boxplus(x_true.q, jnp.asarray(
                rng.normal(scale=perturb / 2, size=(W, 3)), jnp.float32)),
            v=x_true.v + jnp.asarray(rng.normal(scale=perturb, size=(W, 3)), jnp.float32),
            rho=x_true.rho * jnp.asarray(
                1.0 + rng.normal(scale=0.1, size=(F,)), jnp.float32))
        x0 = x0._replace(p=x0.p.at[0].set(x_true.p[0]),
                         q=x0.q.at[0].set(x_true.q[0]))
    else:
        x0 = x_true

    layout = WindowLayout(F)
    meas = VioMeasurements(
        feats=feats,
        imu=pre, imu_valid=jnp.ones((W - 1,), jnp.float32), imu_sqrt_info=sinfo,
        wheel=wpre, wheel_valid=jnp.ones((W - 1,), jnp.float32),
        wheel_sqrt_info=wsinfo,
        plane_valid=jnp.zeros(()), stationary=jnp.zeros(()),
        gnss=GnssTable.empty(11), gnss_enabled=jnp.zeros(()),
        prior=MargPrior.empty(layout.frame_dim),
        prior_state=x0)
    cfg = VioConfig(num_feats=F)
    return x_true, x0, meas, layout, cfg
