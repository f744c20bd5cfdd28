"""GroundFusion: the full resilient multi-sensor system.

The single-process equivalent of the reference's launch topology
(``lio/launch/run_m3dgr.launch``: vins_node + groundfusion2_eskf +
ImMesh): the VIO estimator consumes camera/IMU/wheel/GNSS, publishes
IMU-rate propagated poses; the LIO consumes LiDAR/IMU plus that external
pose stream and runs the degeneracy-aware switch; the fused pose is the
system output (the reference's ``/laser_pose``). ROS topics become direct
function calls on host ring buffers; each subsystem's device code stays its
own compiled program.

Optional: loop-closure pose graph (dense_map) fed by VIO keyframes, global
GNSS anchoring (global_fusion) fed by VIO odometry + LLA fixes.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple

import numpy as np

from .core import lie
from .lio.odometry import LidarOdometry, LioConfig
from .vio.estimator import EstimatorConfig, VioEstimator, VioOutput
from .vio import feature_window as fwin


@dataclass
class SystemConfig:
    vio: EstimatorConfig = field(default_factory=EstimatorConfig)
    lio: LioConfig = field(default_factory=LioConfig)
    use_lidar: bool = True


class FusedOutput(NamedTuple):
    t: float
    p: np.ndarray          # fused pose (switch output when LiDAR on)
    q: np.ndarray
    p_vio: np.ndarray | None
    degenerate: bool
    switched: str
    source: str            # "lio", "vio", "fused"


class GroundFusion:
    """Feed sensors; read fused poses.

    The inter-subsystem handoff mirrors the reference exactly: the VIO's
    IMU-rate propagated pose (``/vins/odometry/imu_propagate_ros``) is the
    LIO's external fallback; the LIO's switch decides authority.
    """

    def __init__(self, cfg: SystemConfig, tic=None, ric=None):
        from .runtime.telemetry import Telemetry

        self.cfg = cfg
        self._tic, self._ric = tic, ric
        self.vio = VioEstimator(cfg.vio, tic=tic, ric=ric)
        self.lio = LidarOdometry(cfg.lio) if cfg.use_lidar else None
        self.latest_vio: VioOutput | None = None
        self.trajectory: list[FusedOutput] = []
        self.telemetry = Telemetry()

    def restart(self):
        """External estimator restart (the reference's ``/vins_restart``
        topic, ``rosNodeTest.cpp:621-636``): rebuild both estimators from
        scratch; the telemetry/trajectory history is preserved."""
        self.vio = VioEstimator(self.cfg.vio, tic=self._tic, ric=self._ric)
        self.lio = LidarOdometry(self.cfg.lio) if self.cfg.use_lidar else None
        self.latest_vio = None
        self.telemetry.event(self.trajectory[-1].t if self.trajectory
                             else 0.0, "restart")

    # -- sensor inputs --------------------------------------------------
    def process_camera(self, t: float, obs: fwin.FrameObs, imu_chunk,
                       wheel_vel=None, gnss_meas=None) -> VioOutput:
        out = self.vio.process_frame(t, obs, imu_chunk, wheel_vel=wheel_vel,
                                     gnss_meas=gnss_meas)
        self.latest_vio = out
        tm = self.telemetry
        if out.initialized:
            tm.pose("vio", t, out.p, out.q)
        tm.tick(t, tracked=out.tracked, cost=out.cost,
                stationary=out.stationary, wheel_anomaly=out.wheel_anomaly,
                keyframe=out.is_keyframe, initialized=out.initialized)
        if out.rebooted:
            tm.event(t, "vio_reboot")
        if out.stationary:
            tm.event(t, "stationary")
        if self.lio is None and out.initialized:
            self.trajectory.append(FusedOutput(
                t=t, p=out.p, q=out.q, p_vio=out.p,
                degenerate=False, switched="", source="vio"))
        return out

    def process_lidar(self, t: float, pts_body, alpha, mask, imu_chunk):
        """One sweep; uses the latest VIO pose as the external stream."""
        if self.lio is None:
            return None
        ext = None
        if self.latest_vio is not None and self.latest_vio.initialized:
            ext = (self.latest_vio.p, self.latest_vio.q)
        out = self.lio.process_scan(t, pts_body, alpha, mask, imu_chunk,
                                    external_pose=ext)
        if out is not None:
            tm = self.telemetry
            tm.pose("lio_raw", t, out.p_lio, out.q_lio)
            tm.pose("fused", t, out.p_fused, out.q_fused)
            tm.tick(t, degenerate=out.degenerate, icp_corr=out.n_corr)
            if out.switched:
                tm.event(t, f"switch_{out.switched}")
            self.trajectory.append(FusedOutput(
                t=t, p=out.p_fused, q=out.q_fused,
                p_vio=None if ext is None else np.asarray(ext[0]),
                degenerate=out.degenerate, switched=out.switched,
                source="fused"))
        return out

    # -- outputs ---------------------------------------------------------
    def save_trajectory_tum(self, path: str):
        """TUM format: t x y z qx qy qz qw (the reference's CSV writers,
        ``visualization.cpp:370``)."""
        with open(path, "w") as f:
            for o in self.trajectory:
                q = o.q
                f.write(f"{o.t:.6f} {o.p[0]:.6f} {o.p[1]:.6f} {o.p[2]:.6f} "
                        f"{q[1]:.6f} {q[2]:.6f} {q[3]:.6f} {q[0]:.6f}\n")

    def save_telemetry(self, out_dir: str):
        """Write every pose stream (TUM), tick statistics (JSONL), events,
        and the printStatistics-style summary to ``out_dir``."""
        self.telemetry.save(out_dir)
