"""Config loader, profiler, dataset log, mesh export."""

import numpy as np
import jax.numpy as jnp
import pytest

from ground_fusion2_tpu.config.loader import load_config
from ground_fusion2_tpu.utils.profiling import Timer


def test_config_loader():
    cfg = load_config("configs/m3dgr.yaml")
    assert cfg.estimator.num_feats == 150
    assert cfg.estimator.use_wheel is True
    assert cfg.use_gnss is False
    assert cfg.lio.map_cfg.voxel_size == 0.2
    assert cfg.lio.max_keypoints == 2000
    # real M3DGR body_T_cam0 (reference config/realsense/m3dgr.yaml:46-53)
    np.testing.assert_allclose(
        cfg.ric,
        [[0.99957087, 0.00215313, 0.02921355],
         [-0.00192891, 0.99996848, -0.00770122],
         [-0.02922921, 0.00764156, 0.99954353]])
    np.testing.assert_allclose(
        cfg.tic, [0.03668114, -0.00477653, 0.0316039])
    # real lidar extrinsic (reference lio/config/m3dgr.yaml:15-18)
    np.testing.assert_allclose(
        cfg.t_il, [-0.00349766, -0.417688, 0.198242])
    assert abs(cfg.estimator.vio.proj_sqrt_info - 607.79772949218 / 1.5) < 1e-6


def test_timer_evaluate():
    t = Timer()
    out = t.evaluate(lambda: jnp.ones(16).sum(), "sum")
    assert float(out) == 16.0
    with t.time("block"):
        _ = sum(range(1000))
    s = t.summary()
    assert "sum" in s and "block" in s


def test_dataset_log_roundtrip(tmp_path):
    try:
        from ground_fusion2_tpu.runtime.native_bindings import _ensure_built
        _ensure_built()
    except Exception as e:
        pytest.skip(f"native unavailable: {e}")
    from ground_fusion2_tpu.data import synthetic as sim
    from ground_fusion2_tpu.data.dataset import read_log, write_synthetic_log

    traj = sim.make_planar_trajectory(duration=1.0)
    wvel = sim.wheel_velocity_body(traj)
    clouds = [(0.5, np.random.default_rng(0).normal(
        size=(100, 4)).astype(np.float32))]
    path = str(tmp_path / "seq.gf2log")
    write_synthetic_log(path, traj, traj.acc_body, traj.gyr_body, wvel,
                        clouds=clouds)

    from ground_fusion2_tpu.runtime import native_bindings as nb
    n_imu = n_cloud = n_gt = 0
    for ty, t, payload in read_log(path):
        if ty == nb.REC_IMU:
            n_imu += 1
            acc, gyr = payload
            assert acc.shape == (3,)
        elif ty == nb.REC_CLOUD:
            n_cloud += 1
            assert payload.shape == (100, 4)
        elif ty == nb.REC_GT:
            n_gt += 1
    assert n_imu == traj.t.shape[0]
    assert n_cloud == 1
    assert n_gt == n_imu


def test_voxel_mesh_export(tmp_path, rng):
    from ground_fusion2_tpu.lio import voxel_map as vm
    from ground_fusion2_tpu.mesh.export import (
        export_pointcloud_ply, export_voxel_mesh_ply)

    cfg = vm.VoxelMapConfig(capacity=1 << 12)
    m = vm.VoxelMap.empty(cfg)
    # a flat floor patch: occupied voxels form a plane
    xy = rng.uniform(-2, 2, size=(2000, 2))
    pts = jnp.asarray(np.column_stack([xy, np.zeros(2000)]), jnp.float32)
    m = vm.insert(m, pts, jnp.ones((2000,)), cfg)

    ply1 = str(tmp_path / "cloud.ply")
    export_pointcloud_ply(ply1, np.asarray(m.pts[:100]))
    assert open(ply1).readline().strip() == "ply"

    ply2 = str(tmp_path / "mesh.ply")
    nv, nf = export_voxel_mesh_ply(ply2, m, cfg)
    assert nf > 100  # a 4x4 m floor at 0.2 m voxels: ~400 top faces
    txt = open(ply2).read()
    assert "element face" in txt
