"""Tightly-coupled GNSS factors in the sliding window."""

import numpy as np
import jax.numpy as jnp
import pytest

import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).parent))
from test_window_ba import build_window, F_SLOTS

from ground_fusion2_tpu.gnss.factors import (
    MAX_SATS, GnssTable, prepare_frame_obs,
)
from ground_fusion2_tpu.gnss.sim import GnssSim
from ground_fusion2_tpu.vio.problem import VioConfig, solve_window
from ground_fusion2_tpu.vio.state import NUM_FRAMES


def attach_gnss(meas, x_true, sim, yaw=0.0, noise=True):
    """Build a GnssTable for the window's true poses (local frame == ENU
    rotated by -yaw: enu = Rz(yaw) p_local)."""
    W = NUM_FRAMES
    Rz = np.array([[np.cos(yaw), -np.sin(yaw), 0],
                   [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1.0]])
    u = np.zeros((W, MAX_SATS, 3), np.float32)
    r0 = np.zeros((W, MAX_SATS), np.float32)
    d0 = np.zeros((W, MAX_SATS), np.float32)
    oh = np.zeros((W, MAX_SATS, 4), np.float32)
    ps = np.ones((W, MAX_SATS), np.float32)
    ds = np.ones((W, MAX_SATS), np.float32)
    va = np.zeros((W, MAX_SATS), np.float32)
    for k in range(W):
        enu_p = Rz @ np.asarray(x_true.p[k])
        enu_v = Rz @ np.asarray(x_true.v[k])
        mlist = sim.measurements(t=50.0 + 0.2 * k, enu_pos=enu_p,
                                 enu_vel=enu_v, clk_bias=5.0 + 0.1 * k,
                                 clk_drift=0.5)
        u[k], r0[k], d0[k], oh[k], ps[k], ds[k], va[k] = prepare_frame_obs(
            mlist, sim.ref_ecef)
    tab = GnssTable(
        u_enu=jnp.asarray(u), r0=jnp.asarray(r0), d0=jnp.asarray(d0),
        sys_onehot=jnp.asarray(oh), psr_std=jnp.asarray(ps),
        dopp_std=jnp.asarray(ds), valid=jnp.asarray(va),
        frame_dt=jnp.full((W - 1,), 0.2, jnp.float32))
    return meas._replace(gnss=tab, gnss_enabled=jnp.ones(()))


@pytest.mark.slow
def test_gnss_factors_pin_absolute_position():
    # shift ALL poses by a common offset: VIO+IMU can't see it (gauge),
    # GNSS factors must pull the window back to the absolute position.
    x_true, x0, meas, layout = build_window(perturb=False)
    sim = GnssSim(psr_noise=0.5, dopp_noise=0.05, seed=2)
    meas = attach_gnss(meas, x_true, sim, yaw=0.0)

    offset = jnp.asarray([3.0, -2.0, 1.0], jnp.float32)
    x_shift = x_true._replace(p=x_true.p + offset[None])
    cfg = VioConfig(num_feats=F_SLOTS, use_gnss=True)
    out = solve_window(x_shift, meas, layout, cfg)
    p_err = np.linalg.norm(np.asarray(out.state.p - x_true.p), axis=-1)
    # pseudoranges at 0.5 m noise over 11 frames: absolute recovery to ~1 m
    assert p_err.max() < 1.0, p_err
    # clock bias states absorb the receiver clock (5 m + drift)
    gdt = np.asarray(out.state.gdt)
    assert abs(gdt[0, 0] - 5.0) < 1.0, gdt[0]


@pytest.mark.slow
def test_gnss_disabled_gate_ignores_measurements():
    x_true, x0, meas, layout = build_window(perturb=False)
    sim = GnssSim(psr_noise=0.5, seed=2)
    meas = attach_gnss(meas, x_true, sim, yaw=0.0)
    meas = meas._replace(gnss_enabled=jnp.zeros(()))  # low-speed gate

    offset = jnp.asarray([3.0, -2.0, 1.0], jnp.float32)
    x_shift = x_true._replace(p=x_true.p + offset[None])
    cfg = VioConfig(num_feats=F_SLOTS, use_gnss=True)
    out = solve_window(x_shift, meas, layout, cfg)
    # gated out: the common offset must REMAIN (nothing observes it)
    p_off = np.asarray(out.state.p - x_true.p)
    np.testing.assert_allclose(p_off, np.tile(np.asarray(offset), (11, 1)), atol=0.3)


@pytest.mark.slow
def test_gnss_yaw_refinement():
    # local frame rotated 0.1 rad from ENU; with yaw free the solver should
    # recover it from the pseudoranges
    x_true, x0, meas, layout = build_window(perturb=False)
    sim = GnssSim(psr_noise=0.3, dopp_noise=0.03, seed=3)
    yaw_true = 0.1
    meas = attach_gnss(meas, x_true, sim, yaw=yaw_true)
    cfg = VioConfig(num_feats=F_SLOTS, use_gnss=True,
                    refine_gnss_alignment=True, refine_gnss_yaw=True)
    out = solve_window(x_true, meas, layout, cfg)
    yaw_est = float(out.state.gyaw)
    assert abs(yaw_est - yaw_true) < 0.03, yaw_est
