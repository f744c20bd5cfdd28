"""End-to-end VIO on synthetic sequences: the BASELINE config-1 slice."""

import numpy as np
import pytest

from ground_fusion2_tpu.data.runner import run_synthetic_sequence
from ground_fusion2_tpu.eval.metrics import ate_rmse


@pytest.mark.slow
def test_vio_e2e_clean():
    res = run_synthetic_sequence(duration=9.0, pix_noise=0.0, imu_noise=False)
    # skip the un-initialized prefix
    init = [i for i, o in enumerate(res.outputs) if o.initialized]
    assert len(init) > 40, "estimator never initialized"
    s = init[0]
    ate = ate_rmse(res.est_p[s:], res.gt_p[s:], align=False)
    assert ate < 0.05, f"ATE {ate:.3f} m"


@pytest.mark.slow
def test_vio_e2e_noisy():
    res = run_synthetic_sequence(duration=9.0, pix_noise=1.0 / 460.0,
                                 imu_noise=True, seed=3)
    init = [i for i, o in enumerate(res.outputs) if o.initialized]
    assert len(init) > 40
    s = init[0]
    ate = ate_rmse(res.est_p[s:], res.gt_p[s:], align=False)
    assert ate < 0.15, f"ATE {ate:.3f} m"


@pytest.mark.slow
def test_vio_e2e_dynamic_init():
    """In-motion start (speed ramps from t=0, no static prefix): the dynamic
    initializer (depth-seeded Kabsch + VI alignment, reference
    ``estimator.cpp:1610-1903``) must bootstrap and converge."""
    res = run_synthetic_sequence(duration=10.0, pix_noise=0.5 / 460.0,
                                 imu_noise=True, seed=7,
                                 static_time=0.0, ramp_time=0.4)
    init = [i for i, o in enumerate(res.outputs) if o.initialized]
    assert init, "dynamic init never fired"
    assert init[0] < 25, f"init too late: frame {init[0]}"
    s = init[0]
    ate = ate_rmse(res.est_p[s:], res.gt_p[s:], align=True)
    assert ate < 0.10, f"ATE {ate:.3f} m"


@pytest.mark.slow
def test_vio_e2e_stationary_start_no_drift():
    res = run_synthetic_sequence(duration=8.0, speed=0.0, yaw_rate=0.0,
                                 pix_noise=0.5 / 460.0, imu_noise=True, seed=5)
    init = [i for i, o in enumerate(res.outputs) if o.initialized]
    if not init:
        pytest.skip("no init on all-static sequence (excitation gate)")
    s = init[0]
    drift = np.linalg.norm(res.est_p[s:], axis=1).max()
    assert drift < 0.05, f"stationary drift {drift:.3f} m"
