"""Keyframe-sharded mapping BA: correctness vs single-device + convergence."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from ground_fusion2_tpu.parallel.dist_mapping import (
    make_mapping_problem, make_mapping_solver)

K, LPK, HALO = 32, 24, 3


@pytest.fixture(scope="module")
def problem():
    prob, gt = make_mapping_problem(K, LPK, HALO, seed=1, pix_noise=0.0,
                                    perturb=0.05)
    return prob, gt


def _solve(prob, n_dev, iters=6):
    devs = np.array(jax.devices()[:n_dev])
    mesh = Mesh(devs, ("k",))
    solver = make_mapping_solver(mesh, K, HALO, iters=iters)
    return solver(prob)


def test_mapping_ba_converges_single_device(problem):
    prob, (gt_p, gt_q, gt_rho) = problem
    p, q, rho, cost = _solve(prob, 1)
    # perturbed start: 5 cm pose noise; converged poses must be ~mm
    err = np.linalg.norm(np.asarray(p) - gt_p, axis=1)
    assert err.max() < 0.01, f"max pose err {err.max():.4f}"
    assert float(cost) < 1e-4


def test_mapping_ba_multi_device_matches(problem):
    prob, gt = problem
    n = min(8, len(jax.devices()))
    if n < 2:
        pytest.skip("needs multiple devices")
    p1, q1, rho1, c1 = _solve(prob, 1)
    p8, q8, rho8, c8 = _solve(prob, n)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p8), atol=5e-3)
    np.testing.assert_allclose(np.asarray(rho1), np.asarray(rho8), atol=5e-3)
    assert abs(float(c1) - float(c8)) < 1e-3 * max(float(c1), 1.0)


def test_mapping_ba_noisy_observations():
    """With 1 px observation noise an open 32-kf chain drifts ~0.1 m in the
    absolute frame (random walk from kf0); the *relative* structure must be
    centimetric."""
    prob, (gt_p, _, _) = make_mapping_problem(K, LPK, HALO, seed=2,
                                              pix_noise=1.0 / 460.0,
                                              perturb=0.05)
    p, q, rho, cost = _solve(prob, 1)
    p = np.asarray(p)
    rel_est = np.diff(p, axis=0)
    rel_gt = np.diff(gt_p, axis=0)
    rel_err = np.linalg.norm(rel_est - rel_gt, axis=1)
    assert rel_err.max() < 0.04, f"max relative err {rel_err.max():.4f}"
    err = np.linalg.norm(p - gt_p, axis=1)
    assert err.max() < 0.25, f"max abs err {err.max():.4f}"
