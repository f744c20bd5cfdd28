#!/usr/bin/env python
"""Weak-scaling measurement of the distributed BA paths.

BASELINE north star: >= 70 % weak-scaling efficiency of distributed
(keyframe/map-block sharded) bundle adjustment at >= 2 hosts. Real
multi-chip hardware is not reachable from CI; this runs the same SPMD
programs on a virtual host-platform device mesh and reports TWO signals:

* **per-device FLOPs from XLA cost analysis** — the compiler's own count of
  the work one device executes. Constant per-device FLOPs as devices grow is
  the weak-scaling property the program must have; on real ICI the remaining
  cost is the collectives, which are latency-bound at these sizes. This is
  hardware-independent and the primary number.
* **wall clock** — recorded for completeness, but on this CI machine all
  virtual devices share 2 physical cores, so wall time necessarily grows
  ~linearly with the device count regardless of program quality; it is NOT
  a scaling signal here (the driver's real-chip bench covers single-chip
  speed; multi-chip wall clock needs a pod).

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/bench_weak_scaling.py

Prints one JSON report.
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

# the environment's sitecustomize force-registers a remote TPU platform via
# jax.config — the env var alone is not enough (see tests/conftest.py)
try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

import numpy as np                                            # noqa: E402
from jax.sharding import Mesh                                 # noqa: E402


def _flops_per_device(compiled) -> float:
    """XLA cost analysis: FLOPs of ONE device's program (SPMD: identical)."""
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("flops", float("nan")))


def bench_mapping(devices, ks_per_dev=8, lpk=128, halo=3, iters=3, reps=3):
    """Keyframe-sharded mapping BA, fixed per-device block."""
    from ground_fusion2_tpu.parallel.dist_mapping import (
        make_mapping_problem, make_mapping_solver)

    results = {}
    for d in devices:
        K = ks_per_dev * d
        prob, _ = make_mapping_problem(K, lpk, halo, seed=0, perturb=0.03)
        mesh = Mesh(np.array(jax.devices()[:d]), ("k",))
        solver = make_mapping_solver(mesh, K, halo, iters=iters)
        compiled = solver.lower(prob).compile()
        out = compiled(prob)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = compiled(prob)
        jax.block_until_ready(out)
        results[d] = ((time.perf_counter() - t0) / reps,
                      _flops_per_device(compiled))
    return results


def bench_window(devices, feats_per_dev=32, reps=3):
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
        compiled = solver.lower(x0, meas).compile()
        out = compiled(x0, meas)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = compiled(x0, meas)
        jax.block_until_ready(out)
        results[d] = ((time.perf_counter() - t0) / reps,
                      _flops_per_device(compiled))
    return results


def main():
    n_dev = len(jax.devices())
    devices = [d for d in (1, 2, 4, 8) if d <= n_dev]
    report = {"n_devices_available": n_dev,
              "platform": jax.devices()[0].platform,
              "note": ("wall clock on this host is core-bound (all virtual "
                       "devices share the physical cores); per-device FLOPs "
                       "is the scaling signal")}

    def fmt(res):
        f1 = res[1][1]
        return {str(d): {
            "s_per_solve": round(t, 4),
            "flops_per_device": f,
            "flop_weak_efficiency": round(f1 / f, 3) if f == f else None,
        } for d, (t, f) in res.items()}

    tm = bench_mapping(devices)
    tw = bench_window(devices)
    report["mapping_ba"] = fmt(tm)
    report["window_ba"] = fmt(tw)
    dmax = max(devices)
    report["summary"] = {
        "mapping_flop_weak_eff_at_max": round(tm[1][1] / tm[dmax][1], 3),
        "window_flop_weak_eff_at_max": round(tw[1][1] / tw[dmax][1], 3),
        "target": 0.70,
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
