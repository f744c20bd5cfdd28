"""Unified YAML configuration (one source of truth).

The reference splits configuration across three styles with duplicated
extrinsics (OpenCV-YAML for VINS, yaml-cpp+gflags for LIO, rosparam for mesh
— SURVEY.md §5.6); here one YAML file configures the whole system. Keys
mirror the reference's names (``config/realsense/m3dgr.yaml``,
``lio/config/m3dgr.yaml``) so a reference user can port a dataset config
mechanically.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path

import numpy as np
import yaml

from ..lio.ct_icp import CtIcpConfig
from ..lio.odometry import LioConfig
from ..lio.voxel_map import VoxelMapConfig
from ..sensors.imu_preint import ImuNoise
from ..sensors.wheel_preint import WheelNoise
from ..vio.estimator import EstimatorConfig
from ..vio.problem import VioConfig


@dataclass
class SystemYamlConfig:
    """Parsed full-system configuration."""

    estimator: EstimatorConfig
    lio: LioConfig
    cam_intrinsics: dict
    tic: np.ndarray
    ric: np.ndarray
    t_il: np.ndarray        # lidar->imu extrinsic
    r_il: np.ndarray
    t_io: np.ndarray        # wheel->imu extrinsic (reference body_T_wheel)
    r_io: np.ndarray
    use_lidar: bool
    use_gnss: bool
    use_wheel: bool
    lidar_type: object      # data.cloud_convert.LidarType (decoder select)
    raw: dict

    def make_camera(self):
        """Build the camera object named by ``camera.model`` (the reference
        routes this through camodocal's ``model_type`` YAML key). Returns
        ``None`` for an undistorted pinhole — the system builds an ideal
        pinhole from ``cam_intrinsics`` in that case."""
        ci = self.cam_intrinsics
        model = str(ci.get("model", "pinhole")).lower()
        intr = (ci.get("fx", 460.0), ci.get("fy", 460.0),
                ci.get("cx", 320.0), ci.get("cy", 240.0))
        if model == "equidistant":
            from ..core.cameras import Equidistant
            return Equidistant.create(
                *intr, k2=ci.get("k2", 0.0), k3=ci.get("k3", 0.0),
                k4=ci.get("k4", 0.0), k5=ci.get("k5", 0.0))
        if model == "mei":
            from ..core.cameras import Mei
            return Mei.create(
                ci.get("xi", 1.0), *intr,
                k1=ci.get("k1", 0.0), k2=ci.get("k2", 0.0),
                p1=ci.get("p1", 0.0), p2=ci.get("p2", 0.0))
        if model == "pinhole_full":
            from ..core.cameras import PinholeFull
            return PinholeFull.create(
                *intr, **{k: ci.get(k, 0.0)
                          for k in ("k1", "k2", "k3", "k4", "k5", "k6",
                                    "p1", "p2")})
        if model != "pinhole":
            raise ValueError(f"unknown camera.model: {model!r}")
        if any(ci.get(k) for k in ("k1", "k2", "p1", "p2")):
            from ..core.cameras import Pinhole
            return Pinhole.create(
                *intr, k1=ci.get("k1", 0.0), k2=ci.get("k2", 0.0),
                p1=ci.get("p1", 0.0), p2=ci.get("p2", 0.0))
        return None

    def make_tracker(self):
        """TrackerConfig wired from the camera block: ``depth_range``
        (reference depth_threshold gate, ``feature_manager.cpp:753``),
        ``equalize`` (CLAHE, ``rosNodeTest.cpp:271-276``) and the focal
        length used to scale the pixel-space RANSAC/outlier thresholds."""
        from ..frontend.tracker import TrackerConfig
        ci = self.cam_intrinsics
        dr = ci.get("depth_range", (0.1, 7.0))
        return TrackerConfig(
            num_slots=self.estimator.num_feats,
            depth_range=(float(dr[0]), float(dr[1])),
            equalize=bool(ci.get("equalize", 0)),
            focal=float(ci.get("fx", 460.0)))


def load_config(path: str | Path) -> SystemYamlConfig:
    raw = yaml.safe_load(Path(path).read_text())

    imu = raw.get("imu", {})
    imu_noise = ImuNoise(
        acc_n=imu.get("acc_n", 0.1), gyr_n=imu.get("gyr_n", 0.01),
        acc_w=imu.get("acc_w", 0.001), gyr_w=imu.get("gyr_w", 0.0001))
    wheel = raw.get("wheel", {})
    wheel_noise = WheelNoise(vel_n=wheel.get("vel_n", 0.1),
                             gyr_n=wheel.get("gyr_n", 0.01))

    cam = raw.get("camera", {})
    fx = cam.get("fx", 460.0)
    est_raw = raw.get("estimator", {})
    use_wheel = bool(raw.get("wheel_enable", 0))
    use_gnss = bool(raw.get("gnss_enable", 0))
    vio = VioConfig(
        num_feats=est_raw.get("max_cnt", 96),
        proj_sqrt_info=fx / 1.5,
        max_iters=est_raw.get("max_num_iterations", 8),
        use_wheel=use_wheel,
        use_gnss=use_gnss,
        # plane / motion factors fire per config (reference use_plane /
        # use_motion YAML keys, estimator.cpp:3214-3238)
        use_plane=bool(est_raw.get("plane", 0)),
        use_motion=bool(est_raw.get("use_motion", 0)),
        estimate_extrinsic=bool(est_raw.get("estimate_extrinsic", 0)),
        extrinsic_type=int(est_raw.get("extrinsic_type", 3)),
        estimate_td=bool(est_raw.get("estimate_td", 0)),
        # reference estimate_wheel_intrinsic / estimate_wheel_extrinsic
        # (parameters.cpp:243,314)
        estimate_wheel_intrinsic=bool(
            est_raw.get("estimate_wheel_intrinsic", 0)),
        estimate_wheel_extrinsic=bool(
            est_raw.get("estimate_wheel_extrinsic", 0)),
        wheel_extrinsic_type=int(est_raw.get("extrinsic_type_wheel", 3)),
        g_norm=raw.get("g_norm", 9.81))
    estimator = EstimatorConfig(
        num_feats=vio.num_feats, vio=vio,
        imu_noise=imu_noise, wheel_noise=wheel_noise,
        min_parallax=est_raw.get("keyframe_parallax", 10.0) / fx,
        use_wheel=use_wheel, use_gnss=use_gnss,
        g_norm=raw.get("g_norm", 9.81))

    lio_raw = raw.get("lio", {})
    lio = LioConfig(
        map_cfg=VoxelMapConfig(
            voxel_size=lio_raw.get("size_voxel_map", 0.2),
            max_per_voxel=lio_raw.get("max_num_points_in_voxel", 20),
            max_range=lio_raw.get("max_distance", 80.0)),
        icp_cfg=CtIcpConfig(
            outer_iters=lio_raw.get("num_iters_icp", 5),
            deg_sigma_min=lio_raw.get("deg_sigma_min", 7.0),
            deg_sigma_mean=lio_raw.get("deg_sigma_mean", 10.0),
            # reference thres_translation_norm / thres_orientation_norm
            # (lio/config/m3dgr.yaml:53-54)
            conv_trans=lio_raw.get("thres_translation_norm", 0.01),
            conv_rot_deg=lio_raw.get("thres_orientation_norm", 0.1)),
        max_keypoints=lio_raw.get("max_num_residuals", 2048),
        # spatial keypoint subsample grid (reference subSampleFrame 0.05,
        # main_eskf.cpp:89; hardcoded there, a key here)
        keypoint_cell=lio_raw.get("sub_sample", 0.05),
        g_norm=raw.get("g_norm", 9.81))

    def mat(key, default):
        v = raw.get(key)
        return np.asarray(v, np.float64).reshape(default.shape) \
            if v is not None else default

    tic = mat("extrinsic_t_cam_imu", np.zeros(3))
    ric = mat("extrinsic_r_cam_imu", np.eye(3))
    t_il = mat("extrinsic_t_lidar_imu", np.zeros(3))
    r_il = mat("extrinsic_r_lidar_imu", np.eye(3))
    t_io = mat("extrinsic_t_wheel_imu", np.zeros(3))
    r_io = mat("extrinsic_r_wheel_imu", np.eye(3))

    return SystemYamlConfig(
        estimator=estimator, lio=lio,
        cam_intrinsics=cam, tic=tic, ric=ric, t_il=t_il, r_il=r_il,
        t_io=t_io, r_io=r_io,
        use_lidar=bool(raw.get("lidar_enable", 1)),
        # accepted at top level or nested under lio: (mirrors the reference's
        # lio/config/*.yaml preprocess.lidar_type placement)
        lidar_type=_lidar_type(lio_raw.get("lidar_type",
                                           raw.get("lidar_type", "avia"))),
        use_gnss=use_gnss, use_wheel=use_wheel, raw=raw)

def _lidar_type(name):
    """YAML ``lidar_type`` -> cloud decoder (reference lio config key
    ``preprocess/lidar_type``: 1-AVIA 2-velodyne 3-ouster 4-robosense
    5-pandar; names accepted too)."""
    from ..data.cloud_convert import LidarType
    if isinstance(name, int):
        return LidarType(name)
    return {"avia": LidarType.AVIA, "velodyne": LidarType.VELO32,
            "ouster": LidarType.OUST64, "robosense": LidarType.ROBOSENSE16,
            "pandar": LidarType.PANDAR}[str(name).lower()]
