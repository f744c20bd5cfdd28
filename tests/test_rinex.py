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


# ---------------------------------------------------------------- time systems
def _fixture_nav(records: str) -> str:
    return ("     3.04           N                                       "
            "RINEX VERSION / TYPE\n"
            + " " * 60 + "END OF HEADER\n" + records)


def _nav_lines(hdr, rows):
    """Format one nav record the strict RINEX-3 way (4-space indent +
    19-char %19.12E fields) — constructed independently of the writer."""
    out = [hdr]
    for r in rows:
        out.append("    " + "".join(f"{v:19.12E}" for v in r))
    return "\n".join(out) + "\n"


_BDS_RECORD = _nav_lines(
    "C06 2021 06 01 04 00 00" + "".join(
        f"{v:19.12E}" for v in (2.717930416111e-04, 4.196643e-11, 0.0)),
    [(1.0, 2.934375e+01, 5.8977456136e-09, -2.775005222344e+00),
     (1.443270593882e-06, 6.1082258e-03, 2.030283212662e-05, 6.493410366058e+03),
     (1.872e5, 1.536682248116e-07, 2.103893211079e+00, -6.519258022308e-08),
     (9.559632165429e-01, -2.0515625e+02, -2.386512424018e+00, -6.540629992063e-09),
     (4.335895126779e-10, 0.0, 8.02e+02, 0.0),
     (2.0, 0.0, -1.05e-08, -1.1e-08),
     (1.86618e5, 0.0, 0.0, 0.0)])

_GAL_ROWS = [
    (1.0, 2.9e+01, 2.8e-09, 1.5),
    (1.4e-06, 3.0e-04, 8.0e-06, 5.4406e+03),
    (1.872e5, 1.0e-07, 2.0, -6.0e-08),
    (9.5e-01, -2.0e+02, -2.3, -6.0e-09),
    (4.0e-10, 5.17e+02, 2.158e+03, 0.0),     # data source 517: I/NAV bit set
    (3.12, 0.0, 2.328306436539e-09, 0.0),
    (1.866e5, 0.0, 0.0, 0.0)]

_GAL_INAV = _nav_lines(
    "E11 2021 06 01 04 00 00" + "".join(
        f"{v:19.12E}" for v in (1.0e-04, 0.0, 0.0)), _GAL_ROWS)

_FNAV_ROWS = [r if i != 4 else (4.0e-10, 2.58e+02, 2.158e+03, 0.0)
              for i, r in enumerate(_GAL_ROWS)]  # 258: E1-B bit unset
_GAL_FNAV = _nav_lines(
    "E12 2021 06 01 04 00 00" + "".join(
        f"{v:19.12E}" for v in (1.0e-04, 0.0, 0.0)), _FNAV_ROWS)


def test_bds_record_decoded_in_gpst():
    """ADVICE r3 (high): BDS nav epochs are BDT; the parser must add the
    14 s BDT->GPST offset to both toc and toe (rinex_helper.cpp:100,144).
    Independent ground truth: epoch 2021-06-01 04:00:00 BDT."""
    nav = rinex.parse_rinex_nav(_fixture_nav(_BDS_RECORD))
    assert len(nav.ephems) == 1
    e = nav.ephems[0]
    assert e.sat == rinex.sat_id("C", 6)
    _, toc_raw = rinex.epoch2gpst(2021, 6, 1, 4, 0, 0.0)
    assert abs(e.toc - (toc_raw + 14.0)) < 1e-6, e.toc
    assert abs(e.toe - (1.872e5 + 14.0)) < 1e-6, e.toe
    # writer round-trips back to the same GPST values
    back = rinex.parse_rinex_nav(rinex.write_rinex_nav(nav))
    assert abs(back.ephems[0].toc - e.toc) < 1e-6
    assert abs(back.ephems[0].toe - e.toe) < 1e-6


def test_galileo_fnav_records_skipped():
    """ADVICE r3 (low): only I/NAV (E1-B data-source bit) Galileo records
    are ingested; F/NAV entries (different tgd meaning) are dropped."""
    nav = rinex.parse_rinex_nav(_fixture_nav(_GAL_INAV + _GAL_FNAV))
    sats = [e.sat for e in nav.ephems]
    assert sats == [rinex.sat_id("E", 11)]
    # GPST passthrough for Galileo (GST aligned with GPST)
    _, toc = rinex.epoch2gpst(2021, 6, 1, 4, 0, 0.0)
    assert abs(nav.ephems[0].toc - toc) < 1e-6


def test_by_sat_nearest_toe():
    """ADVICE r3 (medium): ephemeris selection picks the record whose toe
    is nearest the query tow (week-rollover aware), not the latest."""
    from ground_fusion2_tpu.gnss.sim import make_constellation
    e_early = make_constellation(n_sats=1, seed=0)[0]
    e_early = e_early.__class__(**{**e_early.__dict__})
    e_late = e_early.__class__(**{**e_early.__dict__})
    e_early.toe, e_late.toe = 3600.0, 14400.0
    nav = rinex.NavData(ephems=[e_early, e_late])
    assert nav.by_sat(4000.0)[e_early.sat].toe == 3600.0
    assert nav.by_sat(14000.0)[e_early.sat].toe == 14400.0
    # no tow: latest wins (legacy)
    assert nav.by_sat()[e_early.sat].toe == 14400.0
    # rollover: tow near week end prefers a toe just past 0
    e_early.toe, e_late.toe = 100.0, 500000.0
    assert nav.by_sat(604700.0)[e_early.sat].toe == 100.0
