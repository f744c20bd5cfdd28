#!/usr/bin/env python
"""Weak-scaling measurement of the distributed BA paths.

BASELINE north star: >= 70 % weak-scaling efficiency of distributed
(keyframe/map-block sharded) bundle adjustment at >= 2 hosts. Real
multi-chip hardware is not reachable from CI, so this measures the same
SPMD programs on a virtual host-platform device mesh (the collectives and
sharding are identical; absolute times differ, the *scaling ratio* is the
signal — per-device problem size held constant while devices grow).

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python tools/bench_weak_scaling.py

Prints one JSON line per device count + a summary line.
"""

import json
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags
                               + " --xla_force_host_platform_device_count=8")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax                                                    # noqa: E402
import numpy as np                                            # noqa: E402
from jax.sharding import Mesh                                 # noqa: E402


def bench_mapping(devices, ks_per_dev=16, lpk=64, halo=3, iters=3, reps=5):
    """Keyframe-sharded mapping BA, fixed per-device block."""
    from ground_fusion2_tpu.parallel.dist_mapping import (
        make_mapping_problem, make_mapping_solver)

    results = {}
    for d in devices:
        K = ks_per_dev * d
        prob, _ = make_mapping_problem(K, lpk, halo, seed=0, perturb=0.03)
        mesh = Mesh(np.array(jax.devices()[:d]), ("k",))
        solver = make_mapping_solver(mesh, K, halo, iters=iters)
        out = solver(prob)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = solver(prob)
        jax.block_until_ready(out)
        results[d] = (time.perf_counter() - t0) / reps
    return results


def bench_window(devices, feats_per_dev=32, reps=5):
    """Landmark-sharded window BA, fixed per-device feature block."""
    from ground_fusion2_tpu.data.example import make_example_window
    from ground_fusion2_tpu.parallel.dist_ba import make_distributed_solver
    from ground_fusion2_tpu.vio.state import WindowLayout

    results = {}
    for d in devices:
        F = feats_per_dev * d
        x_true, x0, meas, layout, cfg = make_example_window(num_feats=F)
        mesh = Mesh(np.array(jax.devices()[:d]), ("f",))
        solver = make_distributed_solver(mesh, WindowLayout(F), cfg, iters=4)
        out = solver(x0, meas)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = solver(x0, meas)
        jax.block_until_ready(out)
        results[d] = (time.perf_counter() - t0) / reps
    return results


def main():
    n_dev = len(jax.devices())
    devices = [d for d in (1, 2, 4, 8) if d <= n_dev]
    report = {"n_devices_available": n_dev, "platform": jax.devices()[0].platform}

    tm = bench_mapping(devices)
    report["mapping_ba"] = {
        str(d): {"s_per_solve": round(t, 4),
                 "weak_efficiency": round(tm[1] / t, 3)}
        for d, t in tm.items()}

    tw = bench_window(devices)
    report["window_ba"] = {
        str(d): {"s_per_solve": round(t, 4),
                 "weak_efficiency": round(tw[1] / t, 3)}
        for d, t in tw.items()}

    dmax = max(devices)
    report["summary"] = {
        "mapping_weak_eff_at_max": round(tm[1] / tm[dmax], 3),
        "window_weak_eff_at_max": round(tw[1] / tw[dmax], 3),
        "target": 0.70,
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
