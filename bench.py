"""Benchmark: full-pipeline frames/s + solver throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Primary metric = the complete camera tick — CLAHE + Shi-Tomasi/KLT on real
640x480 rendered frames + IMU re-preintegration + 11-frame window solve +
marginalization — i.e. what the reference's vins_node does per processed
image at ~10 Hz on an x86 desktop (images every 2nd frame,
``estimator.cpp:226``; solver budget 0.04 s, ``m3dgr.yaml:108-109``).
Extras report the LIO tick (ESKF + CT-ICP + map insert vs the reference's
~10 Hz LiDAR cadence) and the bare window-solve rate.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench_solver():
    from ground_fusion2_tpu.data.example import make_example_window
    from ground_fusion2_tpu.vio.problem import marginalize_oldest, solve_window

    x_true, x0, meas, layout, cfg = make_example_window(num_feats=96)
    out = solve_window(x0, meas, layout, cfg)
    prior = marginalize_oldest(out.state, meas, layout, cfg)
    jax.block_until_ready((out.state.p, prior.sqrt_J))
    n = 50
    t0 = time.perf_counter()
    for _ in range(n):
        out = solve_window(x0, meas, layout, cfg)
        prior = marginalize_oldest(out.state, meas, layout, cfg)
    jax.block_until_ready((out.state.p, prior.sqrt_J))
    return n / (time.perf_counter() - t0)


def bench_pipeline(n_frames=24, num_feats=96):
    """Complete camera tick on rendered 640x480 frames."""
    from ground_fusion2_tpu.core.cameras import Pinhole
    from ground_fusion2_tpu.data import synthetic as sim
    from ground_fusion2_tpu.data.render import SceneRenderer, make_room_scene
    from ground_fusion2_tpu.frontend.tracker import FeatureTracker, TrackerConfig
    from ground_fusion2_tpu.vio.estimator import EstimatorConfig, VioEstimator

    fx = fy = 607.8
    cx, cy = 328.8, 245.5
    rects = make_room_scene(seed=0)
    rend = SceneRenderer(rects, fx, fy, cx, cy, 640, 480)
    cam = Pinhole.create(fx, fy, cx, cy)
    ric = np.array([[0, 0, 1.0], [-1, 0, 0], [0, -1, 0]])

    traj = sim.make_planar_trajectory(duration=n_frames * 0.1 + 2.0,
                                      speed=0.8, yaw_rate=0.3,
                                      static_time=0.8, ramp_time=0.5)
    spf = 20   # imu samples per frame at 200 Hz / 10 fps
    frames = []
    for k in range(n_frames):
        i = (k + 1) * spf
        R_wb = np.asarray(sim._quat_to_mat(traj.q[i]))
        p_wb = traj.p[i] + [0, 0, 0.4]
        gray, depth = rend.render(p_wb + R_wb @ np.zeros(3), R_wb @ ric)
        imu = (traj.acc_body[i - spf:i + 1].astype(np.float32),
               traj.gyr_body[i - spf:i + 1].astype(np.float32),
               np.full((spf,), 0.005, np.float32))
        frames.append((traj.t[i], jnp.asarray(gray), jnp.asarray(depth), imu))

    def run_once():
        tracker = FeatureTracker(TrackerConfig(
            num_slots=num_feats, equalize=True, use_ransac=True, focal=fx,
            depth_range=(0.1, 20.0)), cam)
        est = VioEstimator(EstimatorConfig(num_feats=num_feats),
                           tic=np.zeros(3), ric=ric)
        for (t, g, d, imu) in frames:
            obs = tracker.track(t, g, d)
            out = est.process_frame(t, obs, imu)
        return out

    run_once()                      # compile + warm every branch
    t0 = time.perf_counter()
    out = run_once()
    dt = (time.perf_counter() - t0) / n_frames
    return 1.0 / dt


def bench_lio(n_scans=20):
    """LIO tick: ESKF predict + CT-ICP + switch + map insert."""
    from ground_fusion2_tpu.data import synthetic as sim
    from ground_fusion2_tpu.lio.odometry import LidarOdometry, LioConfig

    lidar = sim.LidarSim.room(n_rays=4096, noise=0.005, seed=0)
    traj = sim.make_planar_trajectory(duration=n_scans * 0.1 + 1.5,
                                      speed=0.6, yaw_rate=0.3,
                                      static_time=0.6, ramp_time=0.5)
    spf = 20
    rng = np.random.default_rng(0)
    scans = []
    for k in range(n_scans):
        i0, i1 = k * spf, (k + 1) * spf
        pts, alpha, valid = lidar.scan(traj.p[i0], traj.q[i0],
                                       traj.p[i1], traj.q[i1], rng=rng)
        imu = (traj.acc_body[i0:i1 + 1].astype(np.float32),
               traj.gyr_body[i0:i1 + 1].astype(np.float32),
               np.full((spf,), 0.005, np.float32))
        scans.append((traj.t[i1], pts, alpha, valid, imu))

    def run_once():
        lio = LidarOdometry(LioConfig())
        for (t, pts, alpha, valid, imu) in scans:
            lio.process_scan(t, pts, alpha, valid, imu)

    run_once()
    t0 = time.perf_counter()
    run_once()
    return n_scans / (time.perf_counter() - t0)


def main():
    pipeline_fps = bench_pipeline()
    lio_fps = bench_lio()
    solver_fps = bench_solver()
    baseline_pipeline = 10.0   # reference CPU cadence (~10 Hz processed images)
    print(json.dumps({
        "metric": "pipeline_frames_per_s_per_chip",
        "value": round(pipeline_fps, 2),
        "unit": "camera ticks/s (CLAHE+KLT+RANSAC 640x480 + preint + "
                "11-frame solve + marginalization)",
        "vs_baseline": round(pipeline_fps / baseline_pipeline, 2),
        "lio_ticks_per_s": round(lio_fps, 2),
        "window_solves_per_s": round(solver_fps, 2),
        "solver_vs_ceres_budget": round(solver_fps / 25.0, 2),
    }))


if __name__ == "__main__":
    main()
