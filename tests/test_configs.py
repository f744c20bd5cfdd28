"""Dataset config portfolio: every shipped YAML loads into a consistent
system configuration (the reference ships one YAML per dataset under
``config/realsense/*.yaml``; ours mirror their real calibration values)."""

import glob
from pathlib import Path

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


def _load_run_from_log():
    """Import tools/run_from_log.py without mutating sys.path."""
    import importlib.util
    from pathlib import Path
    path = Path(__file__).parent.parent / "tools" / "run_from_log.py"
    spec = importlib.util.spec_from_file_location("_run_from_log", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_idc_distortion_reaches_camera_object():
    """run_from_log must build a radtan Pinhole for distorted rigs so the
    fused tick undistorts through it (not an ideal-pinhole fallback)."""
    system_config_from_yaml = _load_run_from_log().system_config_from_yaml

    cfg, tic, ric = system_config_from_yaml("configs/idc.yaml")
    assert cfg.cam is not None
    assert abs(float(cfg.cam.k1) - 0.148657493) < 1e-6
    assert abs(float(cfg.cam.fx) - 620.9727791) < 1e-4
    # undistorted rigs keep the None default (ideal pinhole built in-system)
    cfg2, _, _ = system_config_from_yaml("configs/m3dgr.yaml")
    assert cfg2.cam is None


def test_equidistant_model_routing():
    """A ``model: equidistant`` rig (hilti22) must get a Kannala-Brandt
    camera — NOT a radtan Pinhole misreading k2 as a radtan coefficient
    (round-4 advisor finding)."""
    from ground_fusion2_tpu.core.cameras import Equidistant

    system_config_from_yaml = _load_run_from_log().system_config_from_yaml
    cfg, _, _ = system_config_from_yaml("configs/hilti22.yaml")
    assert isinstance(cfg.cam, Equidistant)
    assert abs(float(cfg.cam.k2) - (-0.03696737352869157)) < 1e-8  # f32
    assert not hasattr(cfg.cam, "k1")


def test_tracker_wired_from_camera_block():
    """camera.depth_range / equalize / fx must reach the tracker config
    (reference depth_threshold + equalize YAML keys)."""
    cfg = load_config("configs/idc.yaml")
    tr = cfg.make_tracker()
    assert tr.depth_range == (0.1, 3.0)          # idc depth_threshold: 3
    assert tr.equalize is False
    assert abs(tr.focal - 620.97277909374247) < 1e-6
    tr2 = load_config("configs/m3dgr.yaml").make_tracker()
    assert tr2.num_slots == load_config("configs/m3dgr.yaml").estimator.num_feats


def test_m3dgr_sim_config():
    """Isaac-Sim variant (reference config/realsense/m3dgr_sim.yaml):
    velodyne lidar at +0.1 m z, ideal pinhole, hi-noise sim IMU."""
    from ground_fusion2_tpu.data.cloud_convert import LidarType

    cfg = load_config("configs/m3dgr_sim.yaml")
    assert cfg.lidar_type == LidarType.VELO32
    assert abs(cfg.t_il[2] - 0.1) < 1e-9
    assert abs(cfg.cam_intrinsics["fx"] - 554.2562255859375) < 1e-9
    assert cfg.estimator.imu_noise.acc_n > 0.1   # sim IMU is noisy


# -- config parity audit vs the reference's shipped YAMLs (VERDICT r4
# item 9): every audited flag must equal the reference's value or be
# listed under a `divergences:` block with a justification. -------------

_REF_DIR = Path("/root/reference/Ground-Fusion++/config/realsense")

# our config -> reference config
_PARITY_PAIRS = {
    "configs/m3dgr.yaml": "m3dgr.yaml",
    "configs/m3dgr_avia.yaml": "m3dgr.yaml",     # avia shares the vins yaml
    "configs/m2dgr.yaml": "m2dgr.yaml",
    "configs/m2dgrp.yaml": "m2dgrp.yaml",
    "configs/idc.yaml": "idc_rs.yaml",
    "configs/hilti22.yaml": "HILTI22.yaml",
    "configs/groundchallenge.yaml": "groundchallenge.yaml",
    "configs/m3dgr_sim.yaml": "m3dgr_sim.yaml",
}


def _ref_scalars(path):
    """Tolerant scalar extraction from the reference's OpenCV-YAML (the
    %YAML:1.0 directive and !!opencv-matrix tags break safe_load)."""
    import re
    out = {}
    for line in Path(path).read_text().splitlines():
        m = re.match(r"^(\w+):\s*([-+]?[\d.eE]+)\s*(#.*)?$", line)
        if m:
            out[m.group(1)] = float(m.group(2))
    return out


def _audit_rows(ours_path):
    """(key, ours_value, ref_key, ref_value) rows for the audited flags."""
    import yaml as _yaml
    ours = _yaml.safe_load(Path(ours_path).read_text())
    est = ours.get("estimator", {})
    cam = ours.get("camera", {})
    dr = cam.get("depth_range")
    return {
        "wheel_enable": (ours.get("wheel_enable", 0), "wheel"),
        "gnss_enable": (ours.get("gnss_enable", 0), "gnss_enable"),
        "plane": (est.get("plane", 0), "plane"),
        "use_motion": (est.get("use_motion", 0), "use_motion"),
        "equalize": (cam.get("equalize", 0), "equalize"),
        "max_cnt": (est.get("max_cnt", 150), "max_cnt"),
        "max_num_iterations": (est.get("max_num_iterations", 8),
                               "max_num_iterations"),
        "keyframe_parallax": (est.get("keyframe_parallax", 10.0),
                              "keyframe_parallax"),
        "estimate_extrinsic": (est.get("estimate_extrinsic", 0),
                               "estimate_extrinsic"),
        "estimate_td": (est.get("estimate_td", 0), "estimate_td"),
        "depth_threshold": (dr[1] if dr else None, "depth_threshold"),
    }, ours.get("divergences", {})


@pytest.mark.parametrize("ours_path", sorted(_PARITY_PAIRS))
def test_config_parity_vs_reference(ours_path):
    ref_path = _REF_DIR / _PARITY_PAIRS[ours_path]
    if not ref_path.exists():
        pytest.skip(f"reference config missing: {ref_path}")
    ref = _ref_scalars(ref_path)
    rows, divergences = _audit_rows(ours_path)
    mismatches = []
    for key, (ours_v, ref_key) in rows.items():
        if ref_key not in ref or ours_v is None:
            continue
        if float(ours_v) != float(ref[ref_key]):
            if key in divergences and str(divergences[key]).strip():
                continue    # documented divergence: accepted
            mismatches.append((key, ours_v, ref[ref_key]))
    assert not mismatches, (
        f"{ours_path}: undocumented flag divergences vs "
        f"{ref_path.name}: {mismatches} — match the reference or add a "
        f"justified entry under `divergences:`")
