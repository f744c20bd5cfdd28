"""Per-vendor cloud decoding (reference cloud_convert.cc handlers)."""

import numpy as np

from ground_fusion2_tpu.data.cloud_convert import (
    CloudConvert, CloudConvertConfig, LidarType)


def _ring(n=100, r=5.0):
    th = np.linspace(0, 2 * np.pi, n, endpoint=False)
    return (r * np.cos(th)).astype(np.float32), \
        (r * np.sin(th)).astype(np.float32), np.zeros(n, np.float32)


def test_avia_decode_tag_filter_and_time():
    n = 100
    x, y, z = _ring(n)
    arr = np.zeros(n, dtype=[("x", "f4"), ("y", "f4"), ("z", "f4"),
                             ("reflectivity", "u1"), ("offset_time", "u4"),
                             ("tag", "u1"), ("line", "u1")])
    arr["x"], arr["y"], arr["z"] = x, y, z
    arr["offset_time"] = (np.arange(n) * 1e6).astype(np.uint32)  # 1 ms steps
    arr["tag"] = 0
    arr["tag"][10:20] = 0x30    # multi-return tag bits -> dropped
    cc = CloudConvert(CloudConvertConfig(lidar_type=LidarType.AVIA))
    xyz, alpha, inten, t_end = cc.process(arr, t_header=100.0)
    assert xyz.shape[0] == n - 10
    assert alpha.min() == 0.0 and alpha.max() == 1.0
    assert (np.diff(alpha) >= 0).all()
    assert abs(t_end - (100.0 + (n - 1) * 1e-3)) < 1e-6


def test_velodyne_decode_with_time_field():
    n = 64
    x, y, z = _ring(n)
    arr = np.zeros(n, dtype=[("x", "f4"), ("y", "f4"), ("z", "f4"),
                             ("intensity", "f4"), ("time", "f4")])
    arr["x"], arr["y"], arr["z"] = x, y, z
    arr["time"] = np.linspace(0, 0.1, n).astype(np.float32)
    cc = CloudConvert(CloudConvertConfig(lidar_type=LidarType.VELO32))
    xyz, alpha, inten, t_end = cc.process(arr, t_header=5.0)
    assert abs(t_end - 5.1) < 1e-3
    assert (np.diff(alpha) >= 0).all()


def test_velodyne_azimuth_fallback():
    n = 64
    x, y, z = _ring(n)
    arr = np.zeros(n, dtype=[("x", "f4"), ("y", "f4"), ("z", "f4"),
                             ("intensity", "f4")])
    # clockwise sweep: decreasing yaw
    arr["x"], arr["y"], arr["z"] = x[::-1], y[::-1], z[::-1]
    cc = CloudConvert(CloudConvertConfig(lidar_type=LidarType.VELO32,
                                         scan_rate=10.0))
    xyz, alpha, inten, t_end = cc.process(arr, t_header=0.0)
    assert xyz.shape[0] == n
    assert (np.diff(alpha) >= 0).all()


def test_ouster_robosense_pandar_decode():
    n = 32
    x, y, z = _ring(n)
    oust = np.zeros(n, dtype=[("x", "f4"), ("y", "f4"), ("z", "f4"),
                              ("intensity", "f4"), ("t", "u4")])
    oust["x"], oust["y"], oust["z"] = x, y, z
    oust["t"] = (np.arange(n) * 1e6).astype(np.uint32)
    cc = CloudConvert(CloudConvertConfig(lidar_type=LidarType.OUST64))
    xyz, alpha, _, t_end = cc.process(oust, 1.0)
    assert xyz.shape[0] == n and alpha.max() == 1.0

    for ty in (LidarType.ROBOSENSE16, LidarType.PANDAR):
        rs = np.zeros(n, dtype=[("x", "f4"), ("y", "f4"), ("z", "f4"),
                                ("intensity", "f4"), ("timestamp", "f8")])
        rs["x"], rs["y"], rs["z"] = x, y, z
        rs["timestamp"] = 1700000000.0 + np.arange(n) * 1e-3
        cc = CloudConvert(CloudConvertConfig(lidar_type=ty))
        xyz, alpha, _, t_end = cc.process(rs, 1700000000.0)
        assert xyz.shape[0] == n
        assert abs(t_end - (1700000000.0 + (n - 1) * 1e-3)) < 1e-5


def test_blind_and_decimation():
    n = 100
    x, y, z = _ring(n, r=5.0)
    x[:10] = 0.01; y[:10] = 0.0   # inside blind radius
    arr = np.zeros(n, dtype=[("x", "f4"), ("y", "f4"), ("z", "f4"),
                             ("intensity", "f4"), ("time", "f4")])
    arr["x"], arr["y"], arr["z"] = x, y, z
    arr["time"] = np.linspace(0, 0.1, n).astype(np.float32)
    cc = CloudConvert(CloudConvertConfig(lidar_type=LidarType.VELO32,
                                         blind=0.5, point_filter_num=2))
    xyz, alpha, _, _ = cc.process(arr, 0.0)
    assert xyz.shape[0] == (n - 10) // 2
    assert (np.linalg.norm(xyz, axis=1) > 0.5).all()
