"""Telemetry recorder + GroundFusion restart hook."""

import json

import numpy as np

from ground_fusion2_tpu.runtime.telemetry import Telemetry


def test_telemetry_record_and_save(tmp_path):
    tm = Telemetry()
    for k in range(20):
        t = 0.1 * k
        tm.pose("vio", t, [k * 0.1, 0, 0], [1, 0, 0, 0])
        tm.tick(t, tracked=90 + k % 3, cost=450.0, stationary=False)
    tm.pose("fused", 1.0, [1, 2, 3], [1, 0, 0, 0])
    tm.event(0.5, "switch_to_vio", reason="degenerate")
    tm.event(0.9, "switch_to_lio")
    out = tmp_path / "telemetry"
    tm.save(str(out))

    rows = (out / "vio.tum").read_text().strip().split("\n")
    assert len(rows) == 20
    assert len(rows[0].split()) == 8
    stats = [json.loads(l) for l in (out / "stats.jsonl").read_text().split("\n") if l]
    assert stats[0]["tracked"] == 90
    summary = json.loads((out / "summary.json").read_text())
    assert summary["streams"]["vio"] == 20
    assert summary["events"]["switch_to_vio"] == 1
    assert abs(summary["tracked"]["mean"] - np.mean([90 + k % 3 for k in range(20)])) < 1e-6


def test_system_restart_hook():
    from ground_fusion2_tpu.system import GroundFusion, SystemConfig
    from ground_fusion2_tpu.vio.estimator import EstimatorConfig

    gf = GroundFusion(SystemConfig(vio=EstimatorConfig(num_feats=16),
                                   use_lidar=False))
    v0 = gf.vio
    gf.restart()
    assert gf.vio is not v0
    assert not gf.vio.initialized
    assert gf.telemetry.counters["restart"] == 1
