"""Native C++ runtime: sync, subsample, dataset log."""

import numpy as np
import pytest

from ground_fusion2_tpu.runtime import native_bindings as nb


@pytest.fixture(scope="module")
def lib():
    try:
        return nb._ensure_built()
    except Exception as e:  # g++ missing etc.
        pytest.skip(f"native build unavailable: {e}")


def test_sync_camera_groups(lib):
    s = nb.MeasurementSync()
    # IMU at 100 Hz, camera at 10 Hz, depth 1 ms after color
    for i in range(101):
        t = i * 0.01
        s.push_imu(t, [0, 0, 9.81], [0, 0, 0.1])
        s.push_wheel(t, [1.0, 0, 0])
    for k in range(1, 10):
        t = k * 0.1
        s.push_color(t, 100 + k)
        s.push_depth(t + 0.001, 200 + k)

    groups = []
    while True:
        g = s.pop_camera()
        if g is None:
            break
        groups.append(g)
    assert len(groups) == 9
    t, cid, did, acc, gyr, whl, ts = groups[0]
    assert abs(t - 0.1) < 1e-9 and cid == 101 and did == 201
    assert acc.shape[0] >= 10
    np.testing.assert_allclose(acc[0], [0, 0, 9.81], atol=1e-6)
    np.testing.assert_allclose(whl[0], [1, 0, 0], atol=1e-6)
    # consecutive groups: imu chunks are contiguous in time
    t1, _, _, acc1, _, _, ts1 = groups[1]
    assert ts1[0] > ts[-2] - 1e-9


def test_sync_depth_tolerance(lib):
    s = nb.MeasurementSync(depth_tol=0.003)
    for i in range(30):
        s.push_imu(i * 0.01, [0, 0, 9.81], [0, 0, 0])
    s.push_color(0.1, 1)
    s.push_depth(0.2, 2)   # too far: no depth partner
    g = s.pop_camera()
    assert g is not None
    assert g[2] == -1      # depth id missing


def test_grid_subsample(lib, rng):
    # 1000 points in a 1 m cube, 0.5 m voxel -> ≤ 27 cells
    xyz = rng.uniform(0, 1, size=(1000, 3)).astype(np.float32)
    times = rng.uniform(0, 0.1, size=(1000,)).astype(np.float32)
    idx = nb.grid_subsample(xyz, times, 0.5)
    assert 4 <= idx.shape[0] <= 27
    # time-sorted
    assert np.all(np.diff(times[idx]) >= 0)


def test_log_roundtrip(lib, tmp_path):
    path = str(tmp_path / "seq.gf2log")
    w = nb.LogWriter(path)
    imu = np.array([0.1, 0.2, 9.8, 0.01, 0.02, 0.03], np.float32)
    w.write(nb.REC_IMU, 1.5, imu)
    cloud = np.arange(12, dtype=np.float32)
    w.write(nb.REC_CLOUD, 2.0, cloud)
    w.close()

    r = nb.LogReader(path)
    ty, t, payload = r.read()
    assert ty == nb.REC_IMU and abs(t - 1.5) < 1e-12
    np.testing.assert_allclose(np.frombuffer(payload, np.float32), imu)
    ty2, t2, payload2 = r.read()
    assert ty2 == nb.REC_CLOUD and abs(t2 - 2.0) < 1e-12
    np.testing.assert_allclose(np.frombuffer(payload2, np.float32), cloud)
    assert r.read() is None
    r.close()
