#!/usr/bin/env python
"""Measure the accuracy cost of f32 vs f64 on the window solve.

SURVEY §7 said "start f64, selectively f32 — measure, don't guess"; the
framework runs f32 (TPU-native) with Jacobi equilibration in the
marginalization. This tool quantifies what that choice costs: the same
perturbed window (noisy measurements) is solved in f32 and f64 and the
recovered states are compared against each other and against truth.

    python tools/measure_f32_cost.py      # prints one JSON line
"""

import json
import sys
from pathlib import Path

import jax

jax.config.update("jax_enable_x64", True)
try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp                                       # noqa: E402
import numpy as np                                            # noqa: E402


def cast(tree, dtype):
    def c(a):
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating):
            return jnp.asarray(a, dtype)
        return a
    return jax.tree.map(c, tree)


def main():
    from ground_fusion2_tpu.data.example import make_example_window
    from ground_fusion2_tpu.vio.problem import (
        VioConfig, marginalize_oldest, solve_window)

    x_true, x0, meas, layout, cfg = make_example_window(
        num_feats=64, perturb=0.05)

    out = {}
    sols = {}
    for name, dt in (("f32", jnp.float32), ("f64", jnp.float64)):
        x = cast(x0, dt)
        m = cast(meas, dt)
        m = m._replace(prior_state=x)
        res = solve_window(x, m, layout, cfg)
        prior = marginalize_oldest(res.state, m, layout, cfg)
        sols[name] = res.state
        p_err = np.linalg.norm(
            np.asarray(res.state.p, np.float64) - np.asarray(x_true.p),
            axis=-1)
        out[name] = {
            "cost": float(res.cost),
            "pose_err_max_m": round(float(p_err.max()), 6),
            "pose_err_rms_m": round(float(np.sqrt((p_err ** 2).mean())), 6),
            "prior_finite": bool(jnp.all(jnp.isfinite(prior.sqrt_J))),
        }

    d = np.linalg.norm(
        np.asarray(sols["f32"].p, np.float64)
        - np.asarray(sols["f64"].p, np.float64), axis=-1)
    out["f32_vs_f64_pose_diff_max_m"] = round(float(d.max()), 6)
    out["verdict"] = ("f32 adequate" if d.max() < 0.2 * max(
        out["f64"]["pose_err_rms_m"], 1e-6) or d.max() < 2e-3
        else "f32 costs accuracy — investigate")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
