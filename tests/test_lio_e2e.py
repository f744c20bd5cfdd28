"""End-to-end LIO: room tracking + corridor degeneracy switch (config 3)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ground_fusion2_tpu.core import lie
from ground_fusion2_tpu.data import synthetic as sim
from ground_fusion2_tpu.lio import voxel_map as vm
from ground_fusion2_tpu.lio.ct_icp import CtIcpConfig
from ground_fusion2_tpu.lio.odometry import LidarOdometry, LioConfig


def drive_sequence(lidar, duration=6.0, scan_rate=10.0, imu_rate=200.0,
                   speed=0.5, yaw_rate=0.0, z=1.0, external="truth",
                   ext_noise=0.0, seed=0):
    """Robot drives +x at constant speed after a 1 s static prefix."""
    traj = sim.make_planar_trajectory(
        duration=duration, imu_rate=imu_rate, speed=speed, yaw_rate=yaw_rate,
        static_time=1.0, ramp_time=0.5)
    traj.p[:, 2] += z
    rng = np.random.default_rng(seed)

    cfg = LioConfig(
        map_cfg=vm.VoxelMapConfig(capacity=1 << 16, max_range=50.0),
        icp_cfg=CtIcpConfig(outer_iters=5),
        static_init_samples=int(0.5 * imu_rate))
    lo = LidarOdometry(cfg)

    spf = int(imu_rate / scan_rate)
    outs, gt = [], []
    n_scans = int(duration * scan_rate) - 1
    for k in range(n_scans):
        i0, i1 = k * spf, (k + 1) * spf
        pts, alpha, valid = lidar.scan(
            traj.p[i0], traj.q[i0], traj.p[i1], traj.q[i1], rng=rng)
        imu = (traj.acc_body[i0:i1 + 1], traj.gyr_body[i0:i1 + 1],
               np.full((spf,), 1.0 / imu_rate, np.float32))
        if external == "truth":
            ext = (traj.p[i1] + rng.normal(scale=ext_noise, size=3),
                   traj.q[i1])
        else:
            ext = None
        out = lo.process_scan(traj.t[i1], pts, alpha, valid, imu,
                              external_pose=ext)
        if out is not None:
            outs.append(out)
            gt.append((traj.p[i1].copy(), traj.q[i1].copy()))
    return lo, outs, gt


@pytest.mark.slow
def test_lio_room_tracking():
    lidar = sim.LidarSim.room(x=(-4, 12), y=(-5, 5), n_rays=2048, seed=0)
    lo, outs, gt = drive_sequence(lidar, duration=6.0, speed=0.8,
                                  external=None)
    assert len(outs) > 30
    off = gt[0][0] - outs[0].p_lio
    errs = [np.linalg.norm(o.p_lio + off - g[0]) for o, g in zip(outs, gt)]
    assert not any(o.degenerate for o in outs[2:])
    assert max(errs) < 0.06, max(errs)


@pytest.mark.slow
def test_lio_corridor_switch():
    # corridor along x: degenerate; external (VIO) pose takes over and the
    # fused trajectory stays continuous and accurate
    lidar = sim.LidarSim.corridor(y=(-2, 2), z=(0, 3), n_rays=2048, seed=1)
    lo, outs, gt = drive_sequence(lidar, duration=6.0, speed=0.8,
                                  external="truth", ext_noise=0.002)
    assert len(outs) > 30
    n_deg = sum(o.degenerate for o in outs)
    assert n_deg > len(outs) // 2, f"corridor should be degenerate ({n_deg})"
    assert any(o.switched == "to_vio" for o in outs)
    # fused pose follows the external (truth) trajectory (external is in
    # the GT frame, so no origin offset here once switched)
    errs = [np.linalg.norm(o.p_fused - g[0])
            for o, g in list(zip(outs, gt))[-20:]]
    assert max(errs) < 0.15, max(errs)
    # continuity: consecutive fused poses never jump
    jumps = [np.linalg.norm(a.p_fused - b.p_fused)
             for a, b in zip(outs[1:], outs[:-1])]
    assert max(jumps) < 0.25, max(jumps)


@pytest.mark.slow
def test_lio_long_trajectory_recenters():
    """>60 m of travel at 0.2 m voxels pushes the pose past the recentering
    margin (0.5 * 102.4 m half-extent); the map must re-key and tracking
    must survive with no map loss (VoxelMap.recenter; the reference's
    unbounded-extent analog is lasermap_fov_segment)."""
    from ground_fusion2_tpu.data.render import RectLidar, make_long_hall_scene

    rects = make_long_hall_scene(length=90.0, pillar_every=6.0)
    lidar = RectLidar(rects, n_rays=2048, noise=0.005, seed=0)
    cfg = LioConfig(
        map_cfg=vm.VoxelMapConfig(capacity=1 << 15, max_range=40.0),
        icp_cfg=CtIcpConfig(outer_iters=5),
        static_init_samples=int(0.5 * 200))
    lo = LidarOdometry(cfg)
    # manufacture the boundary crossing quickly: drive fast (6 m/s)
    traj = sim.make_planar_trajectory(duration=13.0, imu_rate=200.0,
                                      speed=6.0, yaw_rate=0.0,
                                      static_time=1.0, ramp_time=1.0)
    traj.p[:, 2] += 1.0
    rng = np.random.default_rng(0)
    spf = 20
    outs, gt = [], []
    for k in range(int(13.0 * 10) - 1):
        i0, i1 = k * spf, (k + 1) * spf
        pts, alpha, valid = lidar.scan(traj.p[i0], traj.q[i0],
                                       traj.p[i1], traj.q[i1], rng=rng)
        imu = (traj.acc_body[i0:i1 + 1], traj.gyr_body[i0:i1 + 1],
               np.full((spf,), 0.005, np.float32))
        out = lo.process_scan(traj.t[i1], pts, alpha, valid, imu)
        if out is not None:
            outs.append(out)
            gt.append(traj.p[i1].copy())
    assert gt[-1][0] > 60.0, "trajectory too short to cross the margin"
    assert float(np.asarray(lo.vmap.origin)[0]) > 10.0, \
        "recentering never fired"
    off = gt[0] - outs[0].p_lio
    errs = np.array([np.linalg.norm(o.p_lio + off - g)
                     for o, g in zip(outs, gt)])
    # no map loss at the recenter: consecutive-scan error increments stay
    # small (a lost map makes ICP jump metres within a scan or two)
    incr = np.abs(np.diff(errs))
    assert incr.max() < 0.3, f"per-scan jump {incr.max():.2f} m"
    # drift bounded over the full 70+ m at 6 m/s (deg-stretch dead reckoning
    # contributes; the point is survival across the re-key, not cm accuracy)
    assert errs[-1] < 3.0, errs[-1]


@pytest.mark.slow
def test_lio_switch_back_continuity():
    # room -> corridor -> room: switch to VIO inside the corridor segment
    # and back to LIO when geometry returns; fused stays continuous.
    class SegmentedLidar:
        def __init__(self):
            self.room = sim.LidarSim.room(x=(-4, 14), y=(-5, 5), n_rays=2048)
            self.corr = sim.LidarSim.corridor(y=(-2, 2), n_rays=2048)

        def scan(self, p0, q0, p1, q1, rng=None):
            # corridor between x = 3 and x = 6 (no end walls visible)
            if 1.5 < p0[0] < 4.0:
                return self.corr.scan(p0, q0, p1, q1, rng=rng)
            return self.room.scan(p0, q0, p1, q1, rng=rng)

    lo, outs, gt = drive_sequence(SegmentedLidar(), duration=9.0, speed=0.8,
                                  external="truth", ext_noise=0.002)
    states = [o.degenerate for o in outs]
    assert any(states), "corridor segment should degenerate"
    assert any(o.switched == "to_vio" for o in outs)
    assert any(o.switched == "to_lio" for o in outs)
    # continuity: the switch latches keep the fused trajectory from jumping
    # (up to one frame of LIO re-registration motion after exiting, an
    # artifact the reference shares — fused = lo ⊕ latched offset)
    jumps = [np.linalg.norm(a.p_fused - b.p_fused)
             for a, b in zip(outs[1:], outs[:-1])]
    assert max(jumps) < 0.8, max(jumps)
    off = gt[0][0] - outs[0].p_fused
    errs = [np.linalg.norm(o.p_fused + off - g[0]) for o, g in zip(outs, gt)]
    # absolute accuracy through a degenerate stretch with map-frame drift is
    # bounded but not tight — the corridor contributes pure dead reckoning
    assert errs[-1] < 3.0, errs[-1]
