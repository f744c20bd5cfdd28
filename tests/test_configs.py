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
