"""Dataset config portfolio: every shipped YAML loads into a consistent
system configuration (the reference ships one YAML per dataset under
``config/realsense/*.yaml``; ours mirror their real calibration values)."""

import glob

import numpy as np
import pytest

from ground_fusion2_tpu.config.loader import load_config

CONFIGS = sorted(glob.glob("configs/*.yaml"))


def test_portfolio_nonempty():
    assert len(CONFIGS) >= 3


@pytest.mark.parametrize("path", CONFIGS)
def test_config_loads_and_is_consistent(path):
    cfg = load_config(path)
    # rotations are orthonormal
    for R in (cfg.ric, cfg.r_il, cfg.r_io):
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-3)
        assert np.linalg.det(R) > 0.9
    assert 9.5 < cfg.estimator.g_norm < 10.0
    assert cfg.cam_intrinsics["fx"] > 100
    assert cfg.estimator.vio.num_feats > 0
    # flags propagate
    assert cfg.estimator.use_wheel == cfg.use_wheel
    assert cfg.estimator.vio.use_gnss == cfg.use_gnss


def test_m3dgr_wheel_extrinsic_reaches_state():
    """The body_T_wheel rotation must land in the estimator state (round-3
    regression: it was parsed but never consumed)."""
    import jax.numpy as jnp
    from ground_fusion2_tpu.core import lie
    from ground_fusion2_tpu.vio.estimator import VioEstimator

    cfg = load_config("configs/m3dgr.yaml")
    est = VioEstimator(cfg.estimator, tic=cfg.tic, ric=cfg.ric,
                       tio=cfg.t_io, rio=cfg.r_io)
    R = np.asarray(lie.quat_to_mat(est.state.qio))
    np.testing.assert_allclose(R, cfg.r_io, atol=1e-5)
    np.testing.assert_allclose(np.asarray(est.state.tio), cfg.t_io,
                               atol=1e-6)


def test_avia_config_routes_degeneracy_thresholds():
    """The AVIA variant (reference lidarodom.cpp:845-848 commented
    sigma_min < 4) must reach CtIcpConfig, and the AVIA decoder/extrinsics
    must differ from the MID360 config."""
    from ground_fusion2_tpu.config.loader import load_config
    from ground_fusion2_tpu.data.cloud_convert import LidarType

    avia = load_config("configs/m3dgr_avia.yaml")
    mid = load_config("configs/m3dgr.yaml")
    assert avia.lio.icp_cfg.deg_sigma_min == 4.0
    assert mid.lio.icp_cfg.deg_sigma_min == 7.0
    assert avia.lidar_type == LidarType.AVIA
    assert not np.allclose(avia.t_il, mid.t_il)
    # same robot/camera otherwise
    np.testing.assert_allclose(avia.tic, mid.tic)


def test_m2dgr_config():
    from ground_fusion2_tpu.config.loader import load_config
    from ground_fusion2_tpu.data.cloud_convert import LidarType

    cfg = load_config("configs/m2dgr.yaml")
    assert cfg.lidar_type == LidarType.VELO32
    assert not cfg.use_wheel            # m2dgr.yaml: wheel: 0
    assert not cfg.estimator.vio.use_wheel
    assert abs(cfg.cam_intrinsics["fx"] - 605.687407) < 1e-3
    assert abs(cfg.t_il[0] - 0.27255) < 1e-6


def test_nested_lidar_type_routes_decoder():
    """lidar_type nested under lio: (the reference's lio/config placement)
    must reach the decoder select — m2dgrp is a VLP-16 rig, not AVIA."""
    from ground_fusion2_tpu.data.cloud_convert import LidarType

    cfg = load_config("configs/m2dgrp.yaml")
    assert cfg.lidar_type == LidarType.VELO32   # lio.lidar_type: 2


def test_idc_config():
    """IDC rig: camera+IMU+wheel, no lidar, distorted pinhole
    (reference config/realsense/idc_rs.yaml + idc_cam.yaml)."""
    cfg = load_config("configs/idc.yaml")
    assert not cfg.use_lidar
    assert cfg.use_wheel
    assert abs(cfg.cam_intrinsics["fx"] - 620.9727790937) < 1e-6
    assert abs(cfg.cam_intrinsics["k1"] - 0.148657493) < 1e-6
    # calibrated (non-axis-aligned) camera mount must survive the load
    assert abs(cfg.ric[0, 0] - 0.99957087) < 1e-8


def test_idc_distortion_reaches_camera_object():
    """run_from_log must build a radtan Pinhole for distorted rigs so the
    fused tick undistorts through it (not an ideal-pinhole fallback)."""
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).parent.parent / "tools"))
    from run_from_log import system_config_from_yaml

    cfg, tic, ric = system_config_from_yaml("configs/idc.yaml")
    assert cfg.cam is not None
    assert abs(float(cfg.cam.k1) - 0.148657493) < 1e-6
    assert abs(float(cfg.cam.fx) - 620.9727791) < 1e-4
    # undistorted rigs keep the None default (ideal pinhole built in-system)
    cfg2, _, _ = system_config_from_yaml("configs/m3dgr.yaml")
    assert cfg2.cam is None


def test_m3dgr_sim_config():
    """Isaac-Sim variant (reference config/realsense/m3dgr_sim.yaml):
    velodyne lidar at +0.1 m z, ideal pinhole, hi-noise sim IMU."""
    from ground_fusion2_tpu.data.cloud_convert import LidarType

    cfg = load_config("configs/m3dgr_sim.yaml")
    assert cfg.lidar_type == LidarType.VELO32
    assert abs(cfg.t_il[2] - 0.1) < 1e-9
    assert abs(cfg.cam_intrinsics["fx"] - 554.2562255859375) < 1e-9
    assert cfg.estimator.imu_noise.acc_n > 0.1   # sim IMU is noisy
