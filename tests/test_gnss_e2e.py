"""End-to-end GNSS-VI: alignment + tightly-coupled window (config 4)."""

import numpy as np
import pytest

from ground_fusion2_tpu.data.runner import run_synthetic_sequence


@pytest.mark.slow
def test_gnss_vi_alignment_and_tracking():
    yaw_true = 0.3
    res = run_synthetic_sequence(
        duration=14.0, pix_noise=0.5 / 460.0, imu_noise=True,
        use_gnss=True, gnss_yaw=yaw_true, seed=7)
    est = res.outputs
    init = [i for i, o in enumerate(est) if o.initialized]
    assert init, "no init"

    # reach inside the estimator via the last outputs: check the sequence
    # completed with bounded local error
    s = init[0]
    from ground_fusion2_tpu.eval.metrics import ate_rmse
    ate = ate_rmse(res.est_p[s:], res.gt_p[s:], align=False)
    assert ate < 0.3, ate


@pytest.mark.slow
def test_gnss_alignment_recovers_yaw():
    from ground_fusion2_tpu.data import runner as R
    from ground_fusion2_tpu.vio.estimator import EstimatorConfig, VioEstimator

    yaw_true = 0.25
    captured = {}

    # run and capture the estimator's internal alignment
    import ground_fusion2_tpu.data.runner as runner_mod
    orig_init = VioEstimator.__init__

    def patched(self, *a, **k):
        orig_init(self, *a, **k)
        captured["est"] = self

    VioEstimator.__init__ = patched
    try:
        R.run_synthetic_sequence(
            duration=12.0, use_gnss=True, gnss_yaw=yaw_true, seed=8)
    finally:
        VioEstimator.__init__ = orig_init

    est = captured["est"]
    assert est.gnss_ready, "GNSS-VI alignment never completed"
    yaw_est = float(est.state.gyaw)
    assert abs(yaw_est - yaw_true) < 0.05, yaw_est
