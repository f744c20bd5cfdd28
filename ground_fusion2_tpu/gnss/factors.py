"""Tightly-coupled GNSS factors for the sliding window + host prereduction.

Rebuild of the reference's GNSS factor stack (``gnss_psr_dopp_factor.cpp``,
``dt_ddt_factor.hpp``, ``ddt_smooth_factor.hpp``; wired in
``estimator.cpp:3239-3292``): pseudorange + Doppler residuals tying window
poses/velocities to satellites through per-constellation receiver clocks, the
local-world ENU yaw, and the ECEF anchor; clock-evolution and drift-smooth
factors between consecutive frames.

TPU numerics: raw pseudoranges are ~2.6e7 m — differencing them on-device in
f32 would cost metres of quantization. The host (f64) prereduces each
observation against the current ECEF anchor:

    r0 = psr − (ρ(anchor) + sagnac − c·clk_sat + iono + trop)
    d0 = dopp − (u·v_sat + c·clk_drift_sat)

leaving metre-scale device residuals that are linear in the local state:

    r_psr  = (−u_enu·(Rz(yaw) p_i + δa) + dt_i[sys] − r0) / σ_psr
    r_dopp = (−u_enu·(Rz(yaw) v_i) − ddt_i − d0) / σ_dopp

(the range re-linearization error is |p|²/2ρ ≈ 2 cm at 1 km — far below the
measurement noise).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..vio.state import WindowState
from .ephemeris import SPEED_OF_LIGHT, satsys
from .frames import ecef2rotation
from .spp import GnssMeas, _sagnac

MAX_SATS = 16   # per-frame satellite slots


class GnssQualityFilter:
    """Measurement quality gating on the ingest path (the reference filters
    inside ``processGNSS``, ``estimator.cpp:1550-1578``): psr/dopp standard
    deviation thresholds, elevation mask, and a per-satellite consecutive
    track count so newly risen satellites must prove themselves first."""

    def __init__(self, psr_std_thres: float = 2.0, dopp_std_thres: float = 2.0,
                 elev_thres_deg: float = 30.0, track_thres: int = 5):
        self.psr_std_thres = psr_std_thres
        self.dopp_std_thres = dopp_std_thres
        self.elev_min = np.deg2rad(elev_thres_deg)
        self.track_thres = track_thres
        self._track: dict[int, int] = {}

    def filter(self, meas: list[GnssMeas]) -> list[GnssMeas]:
        new_track: dict[int, int] = {}
        out = []
        for m in meas:
            n = self._track.get(m.sat, 0) + 1
            new_track[m.sat] = n
            if m.psr_std > self.psr_std_thres:
                continue
            if m.dopp_std > self.dopp_std_thres:
                continue
            if m.azel[1] < self.elev_min:
                continue
            if n < self.track_thres:
                continue
            out.append(m)
        self._track = new_track
        return out


class GnssTable(NamedTuple):
    """Prereduced per-window GNSS observations, fixed [W, S] shapes."""

    u_enu: jax.Array      # [W, S, 3] unit rcv→sat in anchor-ENU
    r0: jax.Array         # [W, S] prereduced pseudorange residual (m)
    d0: jax.Array         # [W, S] prereduced doppler residual (m/s)
    sys_onehot: jax.Array  # [W, S, 4]
    psr_std: jax.Array    # [W, S]
    dopp_std: jax.Array   # [W, S]
    valid: jax.Array      # [W, S]
    frame_dt: jax.Array   # [W-1] spacing for the clock factors

    @staticmethod
    def empty(W: int, S: int = MAX_SATS, dtype=jnp.float32) -> "GnssTable":
        z = jnp.zeros
        return GnssTable(
            u_enu=z((W, S, 3), dtype), r0=z((W, S), dtype),
            d0=z((W, S), dtype), sys_onehot=z((W, S, 4), dtype),
            psr_std=jnp.ones((W, S), dtype), dopp_std=jnp.ones((W, S), dtype),
            valid=z((W, S), dtype), frame_dt=jnp.full((W - 1,), 0.1, dtype))


def prepare_frame_obs(meas: list[GnssMeas], anchor_ecef: np.ndarray,
                      max_sats: int = MAX_SATS):
    """Host-side (f64) prereduction of one epoch against the anchor.

    Returns numpy arrays (u_enu [S,3], r0 [S], d0 [S], onehot [S,4],
    psr_std [S], dopp_std [S], valid [S]).
    """
    S = max_sats
    R = ecef2rotation(anchor_ecef)      # ECEF -> ENU
    u_enu = np.zeros((S, 3), np.float32)
    r0 = np.zeros((S,), np.float32)
    d0 = np.zeros((S,), np.float32)
    onehot = np.zeros((S, 4), np.float32)
    psr_std = np.ones((S,), np.float32)
    dopp_std = np.ones((S,), np.float32)
    valid = np.zeros((S,), np.float32)
    for k, m in enumerate(meas[:S]):
        rho_vec = m.sat_pos - anchor_ecef
        rho = np.linalg.norm(rho_vec)
        u = rho_vec / rho
        pred0 = (rho + _sagnac(m.sat_pos, anchor_ecef)
                 - SPEED_OF_LIGHT * m.sat_clk + m.iono_delay + m.trop_delay)
        r0[k] = m.psr - pred0
        d0[k] = m.dopp - (u @ m.sat_vel + SPEED_OF_LIGHT * m.sat_clk_drift)
        u_enu[k] = R @ u
        onehot[k, satsys(m.sat)] = 1.0
        psr_std[k] = max(m.psr_std, 0.1)
        dopp_std[k] = max(m.dopp_std, 0.01)
        valid[k] = 1.0
    return u_enu, r0, d0, onehot, psr_std, dopp_std, valid


def _rz(yaw):
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    return jnp.stack([
        jnp.stack([c, -s, z]), jnp.stack([s, c, z]), jnp.stack([z, z, o])])


def gnss_residuals(x: WindowState, tab: GnssTable, enabled: jax.Array,
                   dt_ddt_weight: float = 10.0, ddt_smooth_weight: float = 1.0):
    """All GNSS residual blocks for the window.

    ``enabled``: scalar gate (gnss_ready && !lowspeed — reference
    ``estimator.cpp:2968-2991``). Returns (r, w) flat.
    """
    W, S, _ = tab.u_enu.shape
    Rz = _rz(x.gyaw)
    p_rot = jnp.einsum("ij,wj->wi", Rz, x.p) + x.ganchor[None]   # δa in ENU
    v_rot = jnp.einsum("ij,wj->wi", Rz, x.v)

    dt_sel = jnp.einsum("wsf,wf->ws", tab.sys_onehot, x.gdt)     # [W, S]
    # clamp stds: a zero std in an EMPTY slot would make inf residuals and
    # 0*inf = NaN cost even at weight 0 (NaN-poisons LM + marginalization)
    r_psr = (-jnp.einsum("wsi,wi->ws", tab.u_enu, p_rot)
             + dt_sel - tab.r0) / jnp.maximum(tab.psr_std, 1e-2)
    r_dopp = (-jnp.einsum("wsi,wi->ws", tab.u_enu, v_rot)
              - x.gddt[:, None] - tab.d0) / jnp.maximum(tab.dopp_std, 1e-3)
    w_obs = tab.valid * enabled

    # clock evolution: dt_{k+1} = dt_k + ddt_k Δt (per constellation)
    r_dt = (x.gdt[1:] - x.gdt[:-1]
            - (x.gddt[:-1] * tab.frame_dt)[:, None]) * dt_ddt_weight
    r_ddt = (x.gddt[1:] - x.gddt[:-1]) * ddt_smooth_weight
    w_clk = jnp.broadcast_to(enabled, r_dt.shape)
    w_ddt = jnp.broadcast_to(enabled, r_ddt.shape)

    r = jnp.concatenate([r_psr.reshape(-1), r_dopp.reshape(-1),
                         r_dt.reshape(-1), r_ddt.reshape(-1)])
    w = jnp.concatenate([w_obs.reshape(-1), w_obs.reshape(-1),
                         w_clk.reshape(-1), w_ddt.reshape(-1)])
    return r, w
