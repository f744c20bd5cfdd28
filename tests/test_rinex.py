"""RINEX 3 nav/obs parsing (gnss_comm ``rinex_helper.cpp`` parity).

Round-trip (write → parse) field equality for Kepler + GLONASS ephemerides,
byte-fixture obs decoding, and an end-to-end chain: simulated constellation
→ RINEX nav+obs files on disk → parse → SPP recovers the receiver state.
"""

import numpy as np

from ground_fusion2_tpu.gnss import rinex
from ground_fusion2_tpu.gnss.ephemeris import (Ephemeris, GloEphemeris,
                                               SPEED_OF_LIGHT)
from ground_fusion2_tpu.gnss.sim import GnssSim, make_constellation
from ground_fusion2_tpu.gnss.spp import GnssMeas, spp_position, spp_velocity


def test_epoch_gpst_roundtrip():
    for week, tow in [(0, 0.0), (2214, 345600.0), (2214, 604799.0),
                      (1042, 12345.5)]:
        y, mo, d, h, mi, s = rinex.gpst2epoch(week, tow)
        w2, t2 = rinex.epoch2gpst(y, mo, d, h, mi, s)
        assert (w2, round(t2, 6)) == (week, round(tow, 6))


def test_sat_id_mapping():
    assert rinex.sat_id("G", 1) == 1
    assert rinex.sat_id("G", 32) == 32
    assert rinex.sat_id("R", 1) == 33
    assert rinex.sat_id("E", 1) == 60
    assert rinex.sat_id("C", 1) == 96
    for s in (5, 40, 70, 120):
        c, prn = rinex.sat_prn(s)
        assert rinex.sat_id(c, prn) == s


def test_nav_roundtrip_kepler_and_glonass():
    eph = make_constellation(n_sats=6, seed=3)
    geph = GloEphemeris(sat=40, toe=7200.0,
                        pos=np.array([11.2e6, -19.1e6, 9.3e6]),
                        vel=np.array([1432.0, -822.0, 2980.0]),
                        acc=np.array([1.2e-6, -0.8e-6, 2.0e-6]),
                        tau_n=4.2e-5, gamma=1.1e-12)
    nav = rinex.NavData(ephems=list(eph) + [geph], glo_fcn={40: -4},
                        iono_alpha=np.array([1e-8, 2e-8, -1e-7, 0.0]),
                        iono_beta=np.array([8e4, 1e5, -6e4, -3e5]))
    text = rinex.write_rinex_nav(nav)
    back = rinex.parse_rinex_nav(text)

    assert back.glo_fcn == {40: -4}
    np.testing.assert_allclose(back.iono_alpha, nav.iono_alpha, rtol=1e-3)
    keplers = [e for e in back.ephems if isinstance(e, Ephemeris)]
    glos = [e for e in back.ephems if isinstance(e, GloEphemeris)]
    assert len(keplers) == 6 and len(glos) == 1
    for a, b in zip(eph, keplers):
        assert a.sat == b.sat
        for f in ("toe", "toc", "A", "e", "i0", "OMG0", "omg", "M0",
                  "delta_n", "OMG_dot", "i_dot", "cuc", "cus", "crc",
                  "crs", "cic", "cis", "af0", "af1", "af2", "tgd"):
            va, vb = getattr(a, f), getattr(b, f)
            assert abs(va - vb) <= 1e-9 * max(1.0, abs(va)), (a.sat, f)
    g = glos[0]
    assert g.sat == 40
    np.testing.assert_allclose(g.pos, geph.pos, rtol=1e-9)
    np.testing.assert_allclose(g.vel, geph.vel, rtol=1e-9)
    np.testing.assert_allclose(g.acc, geph.acc, rtol=1e-6)
    assert abs(g.toe - geph.toe) < 1.0
    assert abs(g.tau_n - geph.tau_n) < 1e-12


def test_obs_fixture_decoding():
    """Hand-written obs text (values chosen, not copied): field layout,
    doppler sign/λ conversion, SNR→std, missing-field skip."""
    lam = SPEED_OF_LIGHT / rinex.FREQ_L1_GPS
    text = "\n".join([
        "     3.04           O".ljust(60) + "RINEX VERSION / TYPE",
        "G    3 C1C D1C S1C".ljust(60) + "SYS / # / OBS TYPES",
        "C    3 C2I D2I S2I".ljust(60) + "SYS / # / OBS TYPES",
        " " * 60 + "END OF HEADER",
        f"> 2022 06 12 04 30{15.0:11.7f}  0  3",
        f"G07{21234567.890:14.3f}  {-1234.567:14.3f}  {45.0:14.3f}  ",
        f"C12{24111222.333:14.3f}  {321.0:14.3f}  {38.0:14.3f}  ",
        "G09" + " " * 48,                         # no psr → dropped
        "",
    ])
    epochs = rinex.parse_rinex_obs(text)
    assert len(epochs) == 1
    ep = epochs[0]
    y, mo, d, h, mi, s = rinex.gpst2epoch(ep.week, ep.tow)
    assert (y, mo, d, h, mi, round(s, 3)) == (2022, 6, 12, 4, 30, 15.0)
    assert len(ep.meas) == 2                    # G09 dropped (blank psr)
    g = ep.meas[0]
    assert g.sat == 7
    assert abs(g.psr - 21234567.890) < 1e-3
    assert abs(g.dopp - (-lam * -1234.567)) < 1e-6   # receding-positive
    assert abs(g.psr_std - 1.0) < 1e-6               # 45 dBHz → 1.0 m
    c = ep.meas[1]
    assert c.sat == rinex.sat_id("C", 12)
    lam_b = SPEED_OF_LIGHT / rinex.FREQ_B1I_BDS
    assert abs(c.dopp - (-lam_b * 321.0)) < 1e-6
    assert c.psr_std > 1.5                           # 38 dBHz → noisier


def test_obs_roundtrip_and_spp_e2e(tmp_path):
    """Sim constellation → nav+obs files → parse → SPP position/velocity."""
    sim = GnssSim(psr_noise=0.0, dopp_noise=0.0)
    t = 120.0
    enu = np.array([5.0, -3.0, 1.0])
    vel = np.array([0.6, 0.2, 0.0])
    meas = sim.measurements(t, enu, enu_vel=vel)
    assert len(meas) >= 6

    nav_p, obs_p = str(tmp_path / "sim.nav"), str(tmp_path / "sim.obs")
    rinex.write_rinex_nav(rinex.NavData(ephems=sim.eph), nav_p)
    week = 0
    rinex.write_rinex_obs([rinex.ObsEpoch(week=week, tow=t, meas=meas)],
                          obs_p)

    nav = rinex.parse_rinex_nav(nav_p)
    epochs = rinex.parse_rinex_obs(obs_p, glo_fcn=nav.glo_fcn)
    assert len(epochs) == 1 and abs(epochs[0].tow - t) < 1e-6
    filled = rinex.fill_sat_states(epochs[0].meas, nav, epochs[0].tow,
                                   tx_correction=False)
    assert len(filled) == len(meas)

    pos, dts, ok = spp_position(filled)
    assert ok
    truth = sim.enu_to_ecef_pos(enu)
    assert np.linalg.norm(pos - truth) < 0.5        # quantization-only error
    assert abs(dts[0] - sim.rcv_clk) < 0.5
    v_ecef, ddt, ok = spp_velocity(filled, pos)
    assert ok
    v_truth = sim.R_enu.T @ vel
    assert np.linalg.norm(v_ecef - v_truth) < 0.05
    assert abs(ddt - sim.rcv_ddt) < 0.05
