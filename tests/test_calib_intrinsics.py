"""Chessboard intrinsic calibration (reference Calibrations executable)."""

import numpy as np

from ground_fusion2_tpu.calib.intrinsics import calibrate_pinhole


def _synthesize_views(fx=610.0, fy=608.0, cx=320.0, cy=240.0,
                      k1=-0.05, k2=0.01, n_views=8, seed=0):
    """Render chessboard corner observations from known intrinsics/poses."""
    rng = np.random.default_rng(seed)
    gx, gy = np.meshgrid(np.arange(7), np.arange(5))
    obj = np.stack([gx.reshape(-1) * 0.03, gy.reshape(-1) * 0.03], -1)
    obj_c = obj - obj.mean(axis=0)
    N = obj.shape[0]
    uv = np.zeros((n_views, N, 2))
    for v in range(n_views):
        # board at ~0.5 m with random tilt
        ang = rng.uniform(-0.4, 0.4, 3)
        cth = np.cos(np.linalg.norm(ang)); K_ = np.linalg.norm(ang) + 1e-9
        w = ang / K_
        Wx = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
        R = np.eye(3) + np.sin(K_) * Wx + (1 - np.cos(K_)) * Wx @ Wx
        t = np.array([rng.uniform(-0.05, 0.05), rng.uniform(-0.05, 0.05),
                      rng.uniform(0.4, 0.7)])
        p3 = np.concatenate([obj_c, np.zeros((N, 1))], 1) @ R.T + t
        x = p3[:, 0] / p3[:, 2]
        y = p3[:, 1] / p3[:, 2]
        r2 = x * x + y * y
        rad = 1 + k1 * r2 + k2 * r2 * r2
        uv[v, :, 0] = fx * x * rad + cx
        uv[v, :, 1] = fy * y * rad + cy
    return obj_c, uv


def test_calibration_recovers_intrinsics():
    obj, uv = _synthesize_views()
    res = calibrate_pinhole(obj, uv)
    assert abs(res.fx - 610.0) < 2.0, res.fx
    assert abs(res.fy - 608.0) < 2.0, res.fy
    assert abs(res.cx - 320.0) < 2.0, res.cx
    assert abs(res.cy - 240.0) < 2.0, res.cy
    assert abs(res.k1 - (-0.05)) < 0.01, res.k1
    assert res.rms_px < 0.1, res.rms_px


def test_calibration_with_pixel_noise():
    rng = np.random.default_rng(1)
    obj, uv = _synthesize_views(seed=2)
    uv = uv + rng.normal(scale=0.3, size=uv.shape)
    res = calibrate_pinhole(obj, uv)
    assert abs(res.fx - 610.0) < 8.0, res.fx
    assert abs(res.cx - 320.0) < 8.0, res.cx
    assert res.rms_px < 0.6, res.rms_px
