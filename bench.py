"""Benchmark: sliding-window BA solve rate on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference's per-frame optimization budget is 0.04 s (8 Ceres iterations,
DENSE_SCHUR, ``config/realsense/m3dgr.yaml:108-109``) on an x86 desktop —
i.e. 25 window-solves/s. We measure the same workload shape (11-frame
window, 96 landmark slots, IMU+projection factors, 8 LM iterations,
marginalization included every solve) on one TPU chip.
"""

import json
import time

import jax


def main():
    from ground_fusion2_tpu.data.example import make_example_window
    from ground_fusion2_tpu.vio.problem import marginalize_oldest, solve_window

    x_true, x0, meas, layout, cfg = make_example_window(num_feats=96)

    # warm up / compile
    out = solve_window(x0, meas, layout, cfg)
    prior = marginalize_oldest(out.state, meas, layout, cfg)
    jax.block_until_ready((out.state.p, prior.sqrt_J))

    n = 50
    t0 = time.perf_counter()
    for _ in range(n):
        out = solve_window(x0, meas, layout, cfg)
        prior = marginalize_oldest(out.state, meas, layout, cfg)
    jax.block_until_ready((out.state.p, prior.sqrt_J))
    dt = (time.perf_counter() - t0) / n

    fps = 1.0 / dt
    baseline_fps = 25.0  # reference max_solver_time 0.04 s
    print(json.dumps({
        "metric": "window_solves_per_s_per_chip",
        "value": round(fps, 2),
        "unit": "solve/s (11-frame window + marginalization, 8 LM iters)",
        "vs_baseline": round(fps / baseline_fps, 2),
    }))


if __name__ == "__main__":
    main()
