"""Online wheel intrinsic calibration (reference ESTIMATE_INTRINSIC_WHEEL,
parameters.h:32, estimator.cpp:2387-2598; VERDICT r4 item 6)."""

import jax
import jax.numpy as jnp
import numpy as np

from ground_fusion2_tpu.data.example import make_example_window
from ground_fusion2_tpu.sensors.wheel_preint import (WheelNoise,
                                                     preintegrate_wheel)
from ground_fusion2_tpu.factors.vio_factors import imu_sqrt_info
from ground_fusion2_tpu.vio.problem import solve_window


SCALE_ERR = 1.02       # wheel reports 2 % too fast


def _problem_with_scaled_wheel(seed=3, wheel_scale=SCALE_ERR):
    """Example window whose wheel preintegration was built from velocity
    samples scaled by ``wheel_scale`` (an injected intrinsic
    miscalibration), with RGB-D depth-seeded landmarks.

    Depth-fixing matters: on a monocular window with free biases a 2 %
    wheel-scale error is near-unobservable (the solver absorbs it into a
    joint trajectory/bias rescale — measured six drift < 0.4 %); the
    reference's RGB-D depth (estimate_flag=1 features) pins the visual
    scale, which is exactly the regime Ground-Fusion runs wheel
    calibration in."""
    x_true, x0, meas, layout, cfg = make_example_window(
        num_feats=64, seed=seed, perturb=0.02, wheel_scale=wheel_scale)
    meas = meas._replace(
        feats=meas.feats._replace(depth_fixed=meas.feats.track_valid))
    x0 = x0._replace(rho=x_true.rho)
    return x_true, x0, meas, layout, cfg


def test_wheel_intrinsic_recovered():
    """Freeing sx/sy/sw must recover the injected 2 % scale error to within
    0.5 % (converged six ~= 1/1.02)."""
    x_true, x0, meas, layout, cfg = _problem_with_scaled_wheel()
    cfg = cfg._replace(use_wheel=True, estimate_wheel_intrinsic=True,
                       max_iters=12)
    out = solve_window(x0, meas, layout, cfg)
    six = float(out.state.six)
    target = 1.0 / SCALE_ERR
    assert abs(six - target) < 0.005, f"six={six:.4f} target={target:.4f}"
    # siy is weakly excited on a mostly-forward drive — bounded, not exact
    assert abs(float(out.state.siy) - 1.0) < 0.05
    # pose accuracy must not be destroyed by the extra dofs
    err = np.linalg.norm(np.asarray(out.state.p - x_true.p), axis=1)
    assert err.max() < 0.01


def test_wheel_intrinsic_fixed_by_default():
    """Flag off: six/siy/siw stay exactly 1 (no regression path)."""
    x_true, x0, meas, layout, cfg = _problem_with_scaled_wheel()
    cfg = cfg._replace(use_wheel=True)
    out = solve_window(x0, meas, layout, cfg)
    assert float(out.state.six) == 1.0
    assert float(out.state.siy) == 1.0
    assert float(out.state.siw) == 1.0


def test_wheel_extrinsic_rotation_recovered():
    """Freeing the wheel extrinsic must pull a 2-degree yaw mount error
    back (reference ESTIMATE_EXTRINSIC_WHEEL)."""
    from ground_fusion2_tpu.core import lie
    x_true, x0, meas, layout, cfg = _problem_with_scaled_wheel(
        seed=4, wheel_scale=1.0)
    # true mount identity; start the state with a 2-degree yaw error
    dq = lie.quat_exp(jnp.asarray([0.0, 0.0, np.deg2rad(2.0)], jnp.float32))
    x0 = x0._replace(qio=dq)
    # rotation-only subset (reference ADJUST_WHEEL_ROTATION): on a planar
    # drive the mount yaw and the lever arm are jointly ambiguous in one
    # window, so the reference exposes the subset switch
    cfg = cfg._replace(use_wheel=True, estimate_wheel_extrinsic=True,
                       wheel_extrinsic_type=2, max_iters=12)
    out = solve_window(x0, meas, layout, cfg)
    ang = 2 * np.arccos(min(1.0, abs(float(out.state.qio[0]))))
    assert ang < np.deg2rad(0.7), f"residual mount error {np.rad2deg(ang)}"
