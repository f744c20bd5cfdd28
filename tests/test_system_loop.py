"""System-level wiring of loop closure + global fusion (VERDICT r2 #4).

The reference runs dense_map and global_fusion as nodes fed by the
estimator's keyframe/odometry streams (``pose_graph_node.cpp:903-932``,
``globalOptNode.cpp:125-140``). These tests drive the SAME streams through
``GroundFusion``: real rendered keyframe images + real FeatureTracker
corners + real PoseGraph/GlobalFusion, with a scripted odometry source that
injects known drift (the VIO itself is e2e-tested elsewhere; here the
subject is the system fan-out and the drift-corrected published
trajectory)."""

import numpy as np
import pytest

import jax.numpy as jnp

from ground_fusion2_tpu.core import lie
from ground_fusion2_tpu.system import GroundFusion, SystemConfig
from ground_fusion2_tpu.vio.estimator import EstimatorConfig, VioOutput
from ground_fusion2_tpu.vio import feature_window as fwin


class ScriptedVio:
    """Stands in for VioEstimator: emits a prescribed pose per tick."""

    def __init__(self, poses):
        self.poses = poses   # list of (p, q, is_keyframe)
        self.k = 0

    def process_frame(self, t, obs, imu, wheel_vel=None, gnss_meas=None):
        p, q, kf = self.poses[self.k]
        self.k += 1
        return VioOutput(t=t, p=np.asarray(p, np.float32),
                         q=np.asarray(q, np.float32),
                         v=np.zeros(3, np.float32), initialized=True,
                         is_keyframe=kf, stationary=False,
                         wheel_anomaly=False, tracked=50, cost=0.0)


def _circle_keyframes(n=60, radius=1.2, drift_yaw_total=0.10,
                      drift_p_total=(0.18, -0.12, 0.0)):
    """Ground-truth poses around a closed circle + odometry with linearly
    accumulating yaw AND translation drift (classic loop-closure
    scenario — the translation term keeps the endpoint error nonzero on
    the closed circle)."""
    gt, drifted = [], []
    dpv = np.asarray(drift_p_total)
    for k in range(n):
        th = 2 * np.pi * k / (n - 1)
        p = np.array([radius * np.sin(th), radius * (1 - np.cos(th)), 0.4])
        yaw = th
        q = np.asarray(lie.quat_from_yaw(jnp.asarray(yaw, jnp.float32)))
        gt.append((p, q))
        a = k / (n - 1)
        dy = drift_yaw_total * a
        Rz = np.array([[np.cos(dy), -np.sin(dy), 0],
                       [np.sin(dy), np.cos(dy), 0], [0, 0, 1.0]])
        qd = np.asarray(lie.quat_from_yaw(jnp.asarray(yaw + dy, jnp.float32)))
        drifted.append((Rz @ p + a * dpv, qd))
    return gt, drifted


@pytest.mark.slow
def test_loop_closure_corrects_published_trajectory():
    from ground_fusion2_tpu.core.cameras import Pinhole
    from ground_fusion2_tpu.data.render import SceneRenderer, make_room_scene
    from ground_fusion2_tpu.frontend.tracker import FeatureTracker, TrackerConfig
    from ground_fusion2_tpu.posegraph.pose_graph import PoseGraphConfig

    fx = fy = 160.0
    cx, cy = 128.0, 96.0
    rend = SceneRenderer(make_room_scene(seed=0), fx, fy, cx, cy, 256, 192)
    cam = Pinhole.create(fx, fy, cx, cy)
    ric = np.array([[0, 0, 1.0], [-1, 0, 0], [0, -1, 0]])

    gt, drifted = _circle_keyframes(n=60, drift_yaw_total=0.10)
    pg_cfg = PoseGraphConfig(num_feats=64, skip_recent=25, sim_thresh=0.6,
                             ric=ric, tic=np.zeros(3))
    cfg = SystemConfig(vio=EstimatorConfig(num_feats=64), use_lidar=False,
                       use_loop_closure=True, pose_graph=pg_cfg,
                       cam_intr=(fx, fy, cx, cy))
    gf = GroundFusion(cfg, tic=np.zeros(3), ric=ric)
    gf.vio = ScriptedVio([(p, q, True) for p, q in drifted])

    tracker = FeatureTracker(TrackerConfig(num_slots=64, cell=24, focal=fx,
                                           depth_range=(0.1, 30.0)), cam)
    imu = (np.zeros((3, 3), np.float32), np.zeros((3, 3), np.float32),
           np.full((2,), 0.05, np.float32))
    for k, (p_gt, q_gt) in enumerate(gt):
        # render at the TRUE pose (the world is what it is); odometry drifts
        R_wb = np.asarray(lie.quat_to_mat(jnp.asarray(q_gt, jnp.float32)))
        gray, depth = rend.render(p_gt, R_wb @ ric)
        obs = tracker.track(0.1 * k, jnp.asarray(gray), jnp.asarray(depth))
        gf.process_camera(0.1 * k, obs, imu, img=gray, depth_img=depth)

    events = [ev["kind"] for ev in gf.telemetry.events
              if ev["kind"].startswith("loop_closed")]
    assert events, "no loop closed through the system path"
    # the drift correction must pull the published endpoint back toward GT:
    # raw odometry ends displaced; corrected must be strictly closer.
    p_end_raw = drifted[-1][0]
    p_end_gt = gt[-1][0]
    p_end_pub = gf.trajectory[-1].p
    err_raw = np.linalg.norm(p_end_raw - p_end_gt)
    err_pub = np.linalg.norm(p_end_pub - p_end_gt)
    assert err_pub < 0.6 * err_raw, (
        f"published {err_pub:.3f} vs raw {err_raw:.3f}")


@pytest.mark.slow
def test_pose_graph_save_and_relocalize(tmp_path):
    """Save a graph, reload it into a fresh system, and relocalize: new
    keyframes in the same place must loop against the LOADED keyframes
    (reference load_previous_pose_graph, m3dgr.yaml:150-152)."""
    from ground_fusion2_tpu.core.cameras import Pinhole
    from ground_fusion2_tpu.data.render import SceneRenderer, make_room_scene
    from ground_fusion2_tpu.frontend.tracker import FeatureTracker, TrackerConfig
    from ground_fusion2_tpu.posegraph.pose_graph import PoseGraphConfig

    fx = fy = 160.0
    cx, cy = 128.0, 96.0
    rend = SceneRenderer(make_room_scene(seed=0), fx, fy, cx, cy, 256, 192)
    cam = Pinhole.create(fx, fy, cx, cy)
    ric = np.array([[0, 0, 1.0], [-1, 0, 0], [0, -1, 0]])
    gt, _ = _circle_keyframes(n=40, drift_yaw_total=0.0)
    pg_cfg = PoseGraphConfig(num_feats=64, skip_recent=5, sim_thresh=0.6,
                             ric=ric, tic=np.zeros(3))
    imu = (np.zeros((3, 3), np.float32), np.zeros((3, 3), np.float32),
           np.full((2,), 0.05, np.float32))

    def drive(gf, poses_odom, poses_render, tracker):
        for k, ((p_o, q_o), (p_r, q_r)) in enumerate(
                zip(poses_odom, poses_render)):
            R_wb = np.asarray(lie.quat_to_mat(jnp.asarray(q_r, jnp.float32)))
            gray, depth = rend.render(p_r, R_wb @ ric)
            obs = tracker.track(0.1 * k, jnp.asarray(gray),
                                jnp.asarray(depth))
            gf.process_camera(0.1 * k, obs, imu, img=gray, depth_img=depth)

    # session 1: map the circle, save the graph
    cfg1 = SystemConfig(vio=EstimatorConfig(num_feats=64), use_lidar=False,
                        use_loop_closure=True, pose_graph=pg_cfg,
                        cam_intr=(fx, fy, cx, cy))
    gf1 = GroundFusion(cfg1, tic=np.zeros(3), ric=ric)
    gf1.vio = ScriptedVio([(p, q, True) for p, q in gt])
    drive(gf1, gt, gt,
          FeatureTracker(TrackerConfig(num_slots=64, cell=24, focal=fx,
                                       depth_range=(0.1, 30.0)), cam))
    path = str(tmp_path / "graph.npz")
    gf1.save_pose_graph(path)
    n_loaded = gf1.pg.n

    # session 2: same place, but odometry offset by a translation
    offset = np.array([0.25, -0.15, 0.0], np.float32)
    cfg2 = SystemConfig(vio=EstimatorConfig(num_feats=64), use_lidar=False,
                        use_loop_closure=True, pose_graph=pg_cfg,
                        load_pose_graph=path, cam_intr=(fx, fy, cx, cy))
    gf2 = GroundFusion(cfg2, tic=np.zeros(3), ric=ric)
    assert gf2.pg.n == n_loaded
    revisit = gt[:12]
    gf2.vio = ScriptedVio([(p + offset, q, True) for p, q in revisit])
    drive(gf2, [(p + offset, q) for p, q in revisit], revisit,
          FeatureTracker(TrackerConfig(num_slots=64, cell=24, focal=fx,
                                       depth_range=(0.1, 30.0)), cam))
    events = [ev["kind"] for ev in gf2.telemetry.events
              if ev["kind"].startswith("loop_closed")]
    assert events, "no relocalization loop against the loaded graph"
    # published endpoint must be pulled toward the map frame (offset removed)
    p_pub = gf2.trajectory[-1].p
    p_gt = revisit[-1][0]
    err_raw = np.linalg.norm(offset)
    err_pub = np.linalg.norm(p_pub - p_gt)
    assert err_pub < 0.6 * err_raw, (
        f"relocalized error {err_pub:.3f} vs offset {err_raw:.3f}")


def test_global_fusion_wiring_gps_anchors():
    """GPS-ENU anchors through the system keyframe path must pull the
    globally fused trajectory onto the anchors despite odometry drift
    (reference globalOptNode topology)."""
    gt, drifted = _circle_keyframes(n=30, drift_yaw_total=0.15)
    cfg = SystemConfig(vio=EstimatorConfig(num_feats=64), use_lidar=False,
                       use_global_fusion=True, global_every=5)
    gf = GroundFusion(cfg)
    gf.vio = ScriptedVio([(p, q, True) for p, q in drifted])
    imu = (np.zeros((3, 3), np.float32), np.zeros((3, 3), np.float32),
           np.full((2,), 0.05, np.float32))
    obs = fwin.FrameObs(
        ray=jnp.zeros((64, 2)), vel=jnp.zeros((64, 2)),
        depth=jnp.zeros((64,)), alive=jnp.zeros((64,)),
        fresh=jnp.zeros((64,)))
    for k, (p_gt, _q) in enumerate(gt):
        gf.process_camera(0.1 * k, obs, imu, gps_enu=p_gt, gps_std=0.05)
    gfu = gf.gfusion
    assert gfu is not None and gfu.n == len(gt)
    gfu.optimize()
    p_opt = np.asarray(gfu.graph.p[: gfu.n])
    err = np.linalg.norm(p_opt - np.asarray([p for p, _ in gt]), axis=1)
    raw_err = np.linalg.norm(
        np.asarray([p for p, _ in drifted]) - np.asarray([p for p, _ in gt]),
        axis=1)
    assert err.mean() < 0.3 * max(raw_err.mean(), 1e-6), (
        f"global fusion err {err.mean():.3f} vs raw {raw_err.mean():.3f}")
