"""GNSS in the fused single-dispatch camera tick (VERDICT r3 item 4).

The reference integrates GNSS psr/dopp + clock factors in the one
estimator loop (``estimator.cpp:3239-3292``); the fused tick carries the
prereduced [W, S] epoch table on device, writes one row per tick and
slides it with the window.
"""

import numpy as np
import pytest

from ground_fusion2_tpu.data.runner import run_synthetic_sequence
from ground_fusion2_tpu.eval.metrics import ate_rmse


@pytest.mark.slow
def test_gnss_tight_through_fused_tick():
    """Config-4 e2e through FusedVio: alignment completes, the device-side
    table feeds the solve, tracking stays absolute-accurate."""
    yaw_true = 0.3
    res = run_synthetic_sequence(
        duration=14.0, pix_noise=0.5 / 460.0, imu_noise=True,
        use_gnss=True, gnss_yaw=yaw_true, seed=7, fused=True)
    est = res.outputs
    init = [i for i, o in enumerate(est) if o is not None and o.initialized]
    assert init, "no init"
    s = init[0]
    ate = ate_rmse(res.est_p[s:], res.gt_p[s:], align=False)
    assert ate < 0.3, ate


@pytest.mark.slow
def test_gnss_fused_matches_legacy_accuracy():
    """Same sequence through FusedVio and VioEstimator: both must reach
    the same accuracy class (trajectories differ slightly because the
    fused path samples alignment epochs from tick records)."""
    kw = dict(duration=12.0, pix_noise=0.3 / 460.0, use_gnss=True,
              gnss_yaw=0.2, seed=3)
    res_l = run_synthetic_sequence(fused=False, **kw)
    res_f = run_synthetic_sequence(fused=True, **kw)
    s = max(i for i in range(len(res_l.outputs))
            if not res_l.outputs[i].initialized) + 1
    ate_l = ate_rmse(res_l.est_p[s:], res_l.gt_p[s:], align=False)
    ate_f = ate_rmse(res_f.est_p[s:], res_f.gt_p[s:], align=False)
    assert ate_l < 0.3, ate_l
    assert ate_f < 0.3, ate_f
    # fused is within 2x of legacy (not bit-equal: alignment epoch timing)
    assert ate_f < max(2.0 * ate_l, 0.15), (ate_f, ate_l)


@pytest.mark.slow
def test_gnss_fused_alignment_recovers_yaw():
    from ground_fusion2_tpu.vio.fused import FusedVio

    yaw_true = 0.25
    captured = {}
    orig_init = FusedVio.__init__

    def patched(self, *a, **k):
        orig_init(self, *a, **k)
        captured["est"] = self

    FusedVio.__init__ = patched
    try:
        run_synthetic_sequence(duration=12.0, use_gnss=True,
                               gnss_yaw=yaw_true, seed=8, fused=True)
    finally:
        FusedVio.__init__ = orig_init

    est = captured["est"]
    assert est.legacy.gnss_ready, "GNSS-VI alignment never completed"
    yaw_est = float(np.asarray(est.carry.state.gyaw))
    assert abs(yaw_est - yaw_true) < 0.05, yaw_est
