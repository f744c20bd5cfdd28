"""Real-data entry point: TLV log → full GroundFusion drive → ATE
(VERDICT r3 item 7; the reference's rosbag-replay evaluation flow,
README.md:146-189, as one offline command)."""

import sys
import pathlib

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "tools"))

from ground_fusion2_tpu.data import synthetic as sim
from ground_fusion2_tpu.data.render import SceneRenderer, make_room_scene
from ground_fusion2_tpu.runtime import native_bindings as nb


def _write_sequence_log(path, duration=5.0, imu_rate=200.0,
                        cam_rate=10.0, scan_rate=10.0, seed=0):
    """Full-sensor log: IMU + wheel + color/depth + lidar cloud + GT."""
    fx = fy = 460.0
    cx, cy = 320.0, 240.0
    rend = SceneRenderer(make_room_scene(seed=seed), fx, fy, cx, cy,
                        640, 480)
    ric = np.array([[0, 0, 1.0], [-1, 0, 0], [0, -1, 0]])
    traj = sim.make_planar_trajectory(
        duration=duration, imu_rate=imu_rate, speed=0.8, yaw_rate=0.2,
        static_time=1.0, ramp_time=0.5)
    traj.p[:, 2] += 1.0
    lidar = sim.LidarSim.room(x=(-4, 12), y=(-5, 5), n_rays=2048, seed=seed)
    wvel = sim.wheel_velocity_body(traj)
    rng = np.random.default_rng(seed)

    w = nb.LogWriter(str(path))
    n = traj.acc_body.shape[0]
    spf_cam = int(imu_rate / cam_rate)
    spf_scan = int(imu_rate / scan_rate)
    for i in range(n):
        t = traj.t[i]
        w.write(nb.REC_IMU, t, np.concatenate(
            [traj.acc_body[i], traj.gyr_body[i]]).astype(np.float32))
        if i % 4 == 0:
            w.write(nb.REC_WHEEL, t, wvel[i].astype(np.float32))
        if i % 20 == 0:
            w.write(nb.REC_GT, t, np.concatenate(
                [traj.p[i], traj.q[i]]).astype(np.float32))
        if i > 0 and i % spf_cam == 0:
            R_wb = np.asarray(sim._quat_to_mat(traj.q[i]))
            gray, depth = rend.render(traj.p[i] + [0, 0, 0.4], R_wb @ ric)
            g8 = np.clip(np.asarray(gray) * 255, 0, 255).astype(np.uint8)
            hdr = np.asarray([480, 640], np.uint32).view(np.uint8)
            w.write(nb.REC_IMAGE, t, np.concatenate([hdr, g8.reshape(-1)]))
            dmm = np.clip(np.asarray(depth) * 1e3, 0,
                          65535).astype(np.uint16)
            w.write(nb.REC_DEPTH, t, np.concatenate(
                [hdr, dmm.reshape(-1).view(np.uint8)]))
        if i >= spf_scan and i % spf_scan == 0:
            pts, alpha, valid = lidar.scan(
                traj.p[i - spf_scan], traj.q[i - spf_scan],
                traj.p[i], traj.q[i], rng=rng)
            pts = pts[valid > 0.5]
            alpha_v = alpha[valid > 0.5]
            xyzt = np.concatenate(
                [pts, alpha_v[:, None]], axis=1).astype(np.float32)
            hdr = np.asarray([xyzt.shape[0]], np.uint32).view(np.uint8)
            w.write(nb.REC_CLOUD, t, np.concatenate(
                [hdr, xyzt.reshape(-1).view(np.uint8)]))
    w.close()
    return traj


@pytest.mark.slow
def test_run_from_log_end_to_end(tmp_path):
    """One command: log in, TUM + ATE out, through EVERY stage (fused
    camera tick + fused LIO + switch), on a full-sensor synthetic log."""
    from run_from_log import run_log

    log = tmp_path / "seq.gf2log"
    _write_sequence_log(log, duration=5.0)
    summary = run_log(str(log), str(tmp_path / "out"), every=1)
    assert summary["frames"] >= 30, summary
    assert summary["scans"] >= 30, summary
    assert "ate_rmse" in summary, summary
    assert summary["ate_rmse"] < 0.5, summary
    assert (tmp_path / "out" / "fused.tum").exists()
    assert (tmp_path / "out" / "gt.tum").exists()
    # TUM files parse and are time-ordered
    fused = np.loadtxt(tmp_path / "out" / "fused.tum")
    assert fused.shape[1] == 8 and np.all(np.diff(fused[:, 0]) > 0)
