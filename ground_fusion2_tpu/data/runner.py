"""Synthetic-sequence runner: feeds the simulator into the VIO estimator.

The equivalent of the reference's rosbag-replay system test
(``README.md:146-231``) with the simulator as the bag.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..vio.estimator import EstimatorConfig, VioEstimator
from ..vio import feature_window as fwin
from . import synthetic as sim


@dataclass
class SequenceResult:
    t: np.ndarray
    est_p: np.ndarray
    est_q: np.ndarray
    gt_p: np.ndarray
    gt_q: np.ndarray
    outputs: list


def run_synthetic_sequence(
    duration: float = 20.0,
    frame_rate: float = 10.0,
    imu_rate: float = 200.0,
    speed: float = 1.0,
    yaw_rate: float = 0.4,
    pix_noise: float = 0.0,
    imu_noise: bool = False,
    depth_prob: float = 1.0,
    use_wheel: bool = False,
    use_gnss: bool = False,
    gnss_yaw: float = 0.0,
    gnss_rate: float = 2.0,
    gnss_outage: tuple | None = None,   # (t0, t1): no epochs in this span
    num_feats: int = 96,
    num_landmarks: int = 600,
    seed: int = 0,
    static_time: float = 1.5,
    ramp_time: float = 1.0,
    cfg: EstimatorConfig | None = None,
    fused: bool = False,
) -> SequenceResult:
    rng = np.random.default_rng(seed)
    traj = sim.make_planar_trajectory(
        duration=duration, imu_rate=imu_rate, speed=speed, yaw_rate=yaw_rate,
        wobble=0.03, static_time=static_time, ramp_time=ramp_time)
    lms = sim.make_landmarks(traj, n=num_landmarks, seed=seed)
    cam = sim.CameraSim()
    tracker = sim.SimTracker(num_feats, lms.pts, cam, pix_noise=pix_noise,
                             seed=seed)
    if imu_noise:
        acc, gyr = sim.add_imu_noise(traj, rng)
    else:
        acc, gyr = traj.acc_body, traj.gyr_body
    wvel = sim.wheel_velocity_body(traj)

    if cfg is None:
        cfg = EstimatorConfig(num_feats=num_feats, use_wheel=use_wheel,
                              use_gnss=use_gnss)
    if fused:
        from ..core.cameras import Pinhole
        from ..frontend.tracker import TrackerConfig
        from ..vio.fused import FusedVio
        est = FusedVio(cfg, TrackerConfig(num_slots=num_feats),
                       Pinhole.create(460.0, 460.0, 320.0, 240.0),
                       tic=cam.tic, ric=cam.ric)
    else:
        est = VioEstimator(cfg, tic=cam.tic, ric=cam.ric)

    gsim = None
    if use_gnss:
        from ..gnss.sim import GnssSim
        gsim = GnssSim(psr_noise=0.5, dopp_noise=0.05, seed=seed)
        Rz = np.array([[np.cos(gnss_yaw), -np.sin(gnss_yaw), 0],
                       [np.sin(gnss_yaw), np.cos(gnss_yaw), 0],
                       [0, 0, 1.0]])

    spf = int(imu_rate / frame_rate)   # imu samples per frame
    n_frames = int(duration * frame_rate) - 1
    outputs = []
    gt_p, gt_q, est_p, est_q, ts = [], [], [], [], []
    for k in range(n_frames):
        i0, i1 = k * spf, (k + 1) * spf
        t = traj.t[i1]
        ray, vel, depth, alive, fresh = tracker.track(t, traj.p[i1], traj.q[i1])
        import jax.numpy as jnp
        obs = fwin.FrameObs(
            ray=jnp.asarray(ray), vel=jnp.asarray(vel),
            depth=jnp.asarray(depth * (rng.uniform(size=depth.shape) < depth_prob)),
            alive=jnp.asarray(alive), fresh=jnp.asarray(fresh))
        imu_chunk = (acc[i0:i1 + 1], gyr[i0:i1 + 1],
                     np.full((spf,), 1.0 / imu_rate, np.float32))
        gnss_meas = None
        in_outage = (gnss_outage is not None
                     and gnss_outage[0] <= t <= gnss_outage[1])
        if gsim is not None and not in_outage \
                and k % max(1, int(frame_rate / gnss_rate)) == 0:
            # clock bias must INTEGRATE the advertised drift — a constant
            # bias with nonzero drift makes psr and dopp disagree and the
            # clock-evolution factor drags position systematically
            gnss_meas = gsim.measurements(
                t=50.0 + t, enu_pos=Rz @ traj.p[i1], enu_vel=Rz @ traj.v[i1],
                clk_bias=5.0 + 0.5 * t, clk_drift=0.5)
        if fused:
            out = est.process_obs(t, obs, imu_chunk,
                                  wheel_vel=wvel[i0:i1 + 1],
                                  gnss_meas=gnss_meas)
        else:
            out = est.process_frame(t, obs, imu_chunk,
                                    wheel_vel=wvel[i0:i1 + 1],
                                    gnss_meas=gnss_meas)
        outputs.append(out)
        ts.append(t)
        est_p.append(out.p); est_q.append(out.q)
        gt_p.append(traj.p[i1]); gt_q.append(traj.q[i1])

    return SequenceResult(
        t=np.array(ts), est_p=np.array(est_p), est_q=np.array(est_q),
        gt_p=np.array(gt_p), gt_q=np.array(gt_q), outputs=outputs)
