"""LVX container round-trip + canonical-sweep replay (data/lvx.py).

Mirrors the reference driver's lvx replay surface
(``livox_ros_driver/livox_ros_driver/lvx_file.h``, ``lds_lvx.cpp``)."""

import numpy as np

from ground_fusion2_tpu.data.lvx import (
    LvxDevice, lvx_sweeps, read_lvx, write_lvx_sweeps)


def _ring(n, r, t):
    th = np.linspace(0, 2 * np.pi, n, endpoint=False) + 0.3 * t
    return np.stack([r * np.cos(th), r * np.sin(th),
                     0.1 * np.sin(3 * th)], axis=1).astype(np.float32)


def test_lvx_round_trip_points_and_imu(tmp_path):
    path = tmp_path / "seq.lvx"
    sweeps_in = []
    for k in range(3):
        t0 = 10.0 + 0.1 * k
        xyz = _ring(500, 4.0 + k, t0)
        refl = np.full(len(xyz), 30 + k, np.float32)
        sweeps_in.append((t0, xyz, refl))
    imu_in = [(10.0 + 0.005 * j, np.array([0.01, -0.02, 0.3]),
               np.array([0.0, 0.0, 1.0])) for j in range(60)]
    write_lvx_sweeps(path, sweeps_in, imu_in)

    sweeps, imu = lvx_sweeps(path, sweep_dt=0.1)
    assert len(sweeps) == 3
    for (t0, xyz_in, refl_in), (xyz, alpha, inten, t_end) in zip(
            sweeps_in, sweeps):
        # mm quantization; zero-padded tail points are blind-filtered out
        assert xyz.shape == xyz_in.shape
        # contiguous chunks + stable time sort preserve point order
        np.testing.assert_allclose(xyz, xyz_in, atol=5e-4)
        assert np.all(inten == refl_in[0])
        assert 0.0 <= alpha.min() and alpha.max() <= 1.0
        assert alpha.max() > 0.5           # spread across the sweep
        assert abs(t_end - (t0 + 0.1 * 23 / 24)) < 1e-6
    assert len(imu) == 60
    np.testing.assert_allclose(imu[0][1], [0.01, -0.02, 0.3], atol=1e-6)
    np.testing.assert_allclose(imu[0][2], [0.0, 0.0, 1.0], atol=1e-6)


def test_lvx_device_extrinsic_applied(tmp_path):
    path = tmp_path / "ext.lvx"
    dev = LvxDevice(extrinsic_enable=1, rpy_deg=(0.0, 0.0, 90.0),
                    xyz=(1.0, 0.0, 0.0))
    xyz = np.array([[2.0, 0.0, 0.0], [0.0, 3.0, 0.5]], np.float32)
    write_lvx_sweeps(path, [(5.0, xyz, np.array([10.0, 10.0]))],
                     device=dev, pkgs_per_sweep=1)
    sweeps, _ = lvx_sweeps(path, apply_extrinsic=True)
    got = sweeps[0][0]
    # yaw 90 deg: (x, y, z) -> (-y, x, z), then translate by (1, 0, 0)
    exp = np.array([[1.0, 2.0, 0.0], [-2.0, 0.0, 0.5]], np.float32)
    np.testing.assert_allclose(got, exp, atol=5e-4)


def test_lvx_rejects_garbage(tmp_path):
    p = tmp_path / "bad.lvx"
    p.write_bytes(b"not an lvx file at all" * 4)
    try:
        read_lvx(p)
        assert False, "expected ValueError"
    except ValueError:
        pass
