"""Distributed BA on the virtual 8-device CPU mesh: must match single-device."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).parent))
from test_window_ba import build_window, F_SLOTS

from ground_fusion2_tpu.core import lie
from ground_fusion2_tpu.parallel.dist_ba import make_distributed_solver
from ground_fusion2_tpu.vio.problem import VioConfig, solve_window


@pytest.mark.slow
def test_distributed_ba_matches_truth():
    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = Mesh(np.array(devices[:8]), ("f",))
    x_true, x0, meas, layout = build_window(perturb=True)
    cfg = VioConfig(num_feats=F_SLOTS)
    solver = make_distributed_solver(mesh, layout, cfg, iters=8)
    x_out, cost = solver(x0, meas)
    # cold start from 5 cm / 1.5 deg perturbation: the distributed LM
    # converges into a soft valley ~1.5 cm from truth (f32 step accuracy);
    # warm starts (the production regime) stay at the optimum — see below.
    p_err = np.linalg.norm(np.asarray(x_out.p - x_true.p), axis=-1)
    assert p_err.max() < 0.02, p_err
    th_err = np.linalg.norm(
        np.asarray(lie.quat_boxminus(x_out.q, x_true.q)), axis=-1)
    assert th_err.max() < 0.01, th_err
    # re-solving from the result may continue the slow descent but must
    # not jump away
    x_again, _ = solver(x_out, meas)
    moved = np.linalg.norm(np.asarray(x_again.p - x_out.p), axis=-1)
    assert moved.max() < 5e-3, moved


@pytest.mark.slow
def test_distributed_matches_single_device():
    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = Mesh(np.array(devices[:8]), ("f",))
    x_true, x0, meas, layout = build_window(perturb=True)
    cfg = VioConfig(num_feats=F_SLOTS)
    solver = make_distributed_solver(mesh, layout, cfg, iters=8)
    x_dist, _ = solver(x0, meas)
    x_single = solve_window(x0, meas, layout, cfg).state
    # both near truth → near each other
    d = np.linalg.norm(np.asarray(x_dist.p - x_single.p), axis=-1)
    assert d.max() < 0.02, d
    # warm-started from the single-device optimum, dist must stay there
    x_stay, _ = solver(x_single, meas)
    moved = np.linalg.norm(np.asarray(x_stay.p - x_single.p), axis=-1)
    assert moved.max() < 1e-4, moved
