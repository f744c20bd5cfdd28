"""Full LVIO system test (BASELINE config 3): camera + IMU + LiDAR with the
degeneracy switch — the corridor blinds the LiDAR while the camera keeps
tracking, so the fused pose must follow VIO through the corridor."""

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


@pytest.mark.slow
def test_full_lvio_corridor():
    duration, imu_rate, cam_rate, scan_rate = 10.0, 200.0, 10.0, 10.0
    # wobble: a perfectly straight, vibration-free trajectory leaves the
    # IMU biases unobservable and the estimate bistable under fp dust
    # (either backend can land in a slow-drift basin); real ground robots
    # always carry this much motion texture
    traj = sim.make_planar_trajectory(
        duration=duration, imu_rate=imu_rate, speed=0.8, yaw_rate=0.0,
        wobble=0.03, static_time=1.2, ramp_time=0.5)
    traj.p[:, 2] += 1.0
    rng = np.random.default_rng(0)

    lms = sim.make_landmarks(traj, n=500, seed=0)
    cam = sim.CameraSim()
    tracker = sim.SimTracker(64, lms.pts, cam, pix_noise=0.5 / 460.0, seed=0)
    lidar = sim.LidarSim.corridor(y=(-2, 2), z=(0, 3), n_rays=2048, seed=1)
    acc, gyr = sim.add_imu_noise(traj, rng)
    wvel = sim.wheel_velocity_body(traj)

    cfg = SystemConfig(
        vio=EstimatorConfig(num_feats=64),
        lio=LioConfig(map_cfg=vm.VoxelMapConfig(capacity=1 << 15),
                      icp_cfg=CtIcpConfig(outer_iters=5),
                      static_init_samples=int(0.5 * imu_rate)))
    gf = GroundFusion(cfg, tic=cam.tic, ric=cam.ric)

    spf = int(imu_rate / cam_rate)
    n = int(duration * cam_rate) - 1
    fused, gt = [], []
    for k in range(n):
        i0, i1 = k * spf, (k + 1) * spf
        t = traj.t[i1]
        imu = (acc[i0:i1 + 1], gyr[i0:i1 + 1],
               np.full((spf,), 1.0 / imu_rate, np.float32))
        # camera tick
        ray, vel, depth, alive, fresh = tracker.track(t, traj.p[i1], traj.q[i1])
        obs = fwin.FrameObs(ray=jnp.asarray(ray), vel=jnp.asarray(vel),
                            depth=jnp.asarray(depth), alive=jnp.asarray(alive),
                            fresh=jnp.asarray(fresh))
        gf.process_camera(t, obs, imu, wheel_vel=wvel[i0:i1 + 1])
        # lidar tick
        pts, alpha, valid = lidar.scan(traj.p[i0], traj.q[i0],
                                       traj.p[i1], traj.q[i1], rng=rng)
        out = gf.process_lidar(t, pts, alpha, valid, imu)
        if out is not None:
            fused.append(out)
            gt.append(traj.p[i1].copy())

    assert len(fused) > 40
    n_deg = sum(o.degenerate for o in fused)
    assert n_deg > len(fused) // 2, "corridor should be LiDAR-degenerate"
    assert any(o.switched == "to_vio" for o in fused)

    # fused trajectory (VIO authority) should track the ground truth; VIO
    # world == GT frame here (starts at GT origin after static init)
    off = gt[0] - fused[0].p_fused
    errs = [np.linalg.norm(o.p_fused + off - g) for o, g in zip(fused, gt)]
    assert max(errs[5:]) < 0.25, max(errs[5:])
    # continuity
    jumps = [np.linalg.norm(a.p_fused - b.p_fused)
             for a, b in zip(fused[1:], fused[:-1])]
    assert max(jumps) < 0.3, max(jumps)
