"""The FULL GroundFusion system through the fused single-dispatch camera
tick (VERDICT r3 item 1): trajectory equality with the legacy backend, and
keyframe fan-out (pose graph) reading from the fused record stream."""

import numpy as np
import jax.numpy as jnp
import pytest

from ground_fusion2_tpu.data import synthetic as sim
from ground_fusion2_tpu.lio import voxel_map as vm
from ground_fusion2_tpu.lio.ct_icp import CtIcpConfig
from ground_fusion2_tpu.lio.odometry import LioConfig
from ground_fusion2_tpu.system import GroundFusion, SystemConfig
from ground_fusion2_tpu.vio import feature_window as fwin
from ground_fusion2_tpu.vio.estimator import EstimatorConfig


def _drive(gf, duration=6.0, imu_rate=200.0, cam_rate=10.0, seed=0,
           noisy=True):
    traj = sim.make_planar_trajectory(
        duration=duration, imu_rate=imu_rate, speed=0.8, yaw_rate=0.2,
        static_time=1.2, ramp_time=0.5)
    traj.p[:, 2] += 1.0
    rng = np.random.default_rng(seed)
    lms = sim.make_landmarks(traj, n=500, seed=seed)
    cam = sim.CameraSim()
    tracker = sim.SimTracker(64, lms.pts, cam,
                             pix_noise=0.5 / 460.0 if noisy else 0.0,
                             seed=seed)
    lidar = sim.LidarSim.room(x=(-4, 12), y=(-5, 5), n_rays=2048, seed=1)
    if noisy:
        acc, gyr = sim.add_imu_noise(traj, rng)
    else:
        acc, gyr = traj.acc_body, traj.gyr_body
    wvel = sim.wheel_velocity_body(traj)
    spf = int(imu_rate / cam_rate)
    n = int(duration * cam_rate) - 1
    outs = []
    for k in range(n):
        i0, i1 = k * spf, (k + 1) * spf
        t = traj.t[i1]
        imu = (acc[i0:i1 + 1], gyr[i0:i1 + 1],
               np.full((spf,), 1.0 / imu_rate, np.float32))
        ray, vel, depth, alive, fresh = tracker.track(
            t, traj.p[i1], traj.q[i1])
        obs = fwin.FrameObs(ray=jnp.asarray(ray), vel=jnp.asarray(vel),
                            depth=jnp.asarray(depth),
                            alive=jnp.asarray(alive),
                            fresh=jnp.asarray(fresh))
        o = gf.process_camera(t, obs, imu, wheel_vel=wvel[i0:i1 + 1])
        pts, alpha, valid = lidar.scan(traj.p[i0], traj.q[i0],
                                       traj.p[i1], traj.q[i1], rng=rng)
        gf.process_lidar(t, pts, alpha, valid, imu)
        if o is not None:
            outs.append(o)
    tail = gf.flush()
    if tail is not None:
        outs.append(tail)
    return outs, traj


def _cfg(backend, pipelined=False):
    return SystemConfig(
        vio=EstimatorConfig(num_feats=64),
        lio=LioConfig(map_cfg=vm.VoxelMapConfig(capacity=1 << 15),
                      icp_cfg=CtIcpConfig(outer_iters=4),
                      static_init_samples=100),
        vio_backend=backend, vio_pipelined=pipelined)


@pytest.mark.slow
def test_system_fused_matches_legacy():
    """Clean sequence (the test_fused_matches_legacy_clean pattern: noise
    makes the comparison chaotic) through the FULL system."""
    cam = sim.CameraSim()
    outs_f, traj = _drive(GroundFusion(_cfg("fused"), tic=cam.tic,
                                       ric=cam.ric), noisy=False)
    outs_l, _ = _drive(GroundFusion(_cfg("legacy"), tic=cam.tic,
                                    ric=cam.ric), noisy=False)
    assert len(outs_f) == len(outs_l)
    for a, b in zip(outs_f, outs_l):
        if a.initialized and b.initialized:
            np.testing.assert_allclose(a.p, b.p, atol=5e-3)
            assert a.is_keyframe == b.is_keyframe


@pytest.mark.slow
def test_system_fused_pipelined_full_stack():
    """Fused VIO (pipelined) + fused LIO + loop closure keyframe fan-out in
    one system — the bench configuration as the PRODUCT configuration."""
    from ground_fusion2_tpu.data.render import SceneRenderer, make_room_scene

    cam = sim.CameraSim()
    cfg = _cfg("fused", pipelined=True)
    cfg.use_loop_closure = True
    gf = GroundFusion(cfg, tic=cam.tic, ric=cam.ric)

    # drive with synthetic obs + rendered keyframe images for the BRIEF path
    duration, imu_rate, cam_rate = 6.0, 200.0, 10.0
    traj = sim.make_planar_trajectory(
        duration=duration, imu_rate=imu_rate, speed=0.8, yaw_rate=0.2,
        static_time=1.2, ramp_time=0.5)
    traj.p[:, 2] += 1.0
    rng = np.random.default_rng(0)
    lms = sim.make_landmarks(traj, n=500, seed=0)
    tracker = sim.SimTracker(64, lms.pts, cam, pix_noise=0.5 / 460.0, seed=0)
    rend = SceneRenderer(make_room_scene(seed=0), 460.0, 460.0, 320.0, 240.0,
                         640, 480)
    acc, gyr = sim.add_imu_noise(traj, rng)
    spf = int(imu_rate / cam_rate)
    n_kf = 0
    outs = []
    for k in range(int(duration * cam_rate) - 1):
        i0, i1 = k * spf, (k + 1) * spf
        t = traj.t[i1]
        imu = (acc[i0:i1 + 1], gyr[i0:i1 + 1],
               np.full((spf,), 1.0 / imu_rate, np.float32))
        ray, vel, depth, alive, fresh = tracker.track(
            t, traj.p[i1], traj.q[i1])
        obs = fwin.FrameObs(ray=jnp.asarray(ray), vel=jnp.asarray(vel),
                            depth=jnp.asarray(depth),
                            alive=jnp.asarray(alive),
                            fresh=jnp.asarray(fresh))
        R_wb = np.asarray(sim._quat_to_mat(traj.q[i1]))
        gray, depth_img = rend.render(traj.p[i1] + [0, 0, 0.4],
                                      R_wb @ np.asarray(cam.ric))
        o = gf.process_camera(t, obs, imu, img=gray, depth_img=depth_img)
        if o is not None:
            outs.append(o)
            n_kf += int(o.is_keyframe and o.initialized)
    tail = gf.flush()
    if tail is not None:
        outs.append(tail)
        n_kf += int(tail.is_keyframe and tail.initialized)
    # pipelined: every tick's output eventually surfaced
    assert len(outs) == int(duration * cam_rate) - 1
    assert n_kf >= 3
    # keyframe fan-out reached the pose graph from the fused record stream
    assert gf.pg is not None and gf.pg.n >= n_kf - 1, (gf.pg.n, n_kf)
    assert any(o.initialized for o in outs)
