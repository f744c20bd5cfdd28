import numpy as np
import pytest

from ground_fusion2_tpu.gnss import frames
from ground_fusion2_tpu.gnss.ephemeris import eph2pos, sat_azel
from ground_fusion2_tpu.gnss.sim import GnssSim, make_constellation
from ground_fusion2_tpu.gnss.spp import spp_position, spp_velocity
from ground_fusion2_tpu.gnss.global_opt import GlobalFusion


def test_geo_ecef_roundtrip():
    lla = np.array([np.radians(31.0), np.radians(121.0), 25.0])
    ecef = frames.geo2ecef(lla)
    lla2 = frames.ecef2geo(ecef)
    np.testing.assert_allclose(lla2, lla, atol=1e-9)
    assert 6.3e6 < np.linalg.norm(ecef) < 6.5e6


def test_local_cartesian():
    lc = frames.LocalCartesian(31.0, 121.0, 10.0)
    # 100 m north should be ~(0, 100, 0) in ENU
    lat2 = 31.0 + 100.0 / 111320.0
    enu = lc.forward(lat2, 121.0, 10.0)
    np.testing.assert_allclose(enu, [0, 100.0, 0], atol=0.5)
    lat_r, lon_r, alt_r = lc.reverse(enu)
    np.testing.assert_allclose([lat_r, lon_r, alt_r], [lat2, 121.0, 10.0],
                               atol=1e-7)


def test_constellation_orbits():
    sats = make_constellation(8)
    for eph in sats:
        pos, vel, clk, drift = eph2pos(100.0, eph)
        r = np.linalg.norm(pos)
        assert 2.5e7 < r < 2.8e7, r
        # velocity ~ 3.9 km/s for MEO
        assert 2.5e3 < np.linalg.norm(vel) < 5.0e3  # ECEF frame (incl. -wExr)
        # finite-difference velocity check
        pos2, _, _, _ = eph2pos(100.5, eph)
        v_fd = (pos2 - pos) / 0.5
        np.testing.assert_allclose(vel, v_fd, rtol=2e-3, atol=2.0)


def test_week_rollover():
    """A measurement just after the week boundary must evaluate the
    ephemeris ~900 s past toe, not -603900 s (reference
    ``gnss_utility.cpp:453-456``)."""
    eph = make_constellation(1)[0]
    eph.toe = 604000.0
    eph.toc = 604000.0
    # same physical instant expressed two ways: late-week + dt, and
    # early-next-week time-of-week
    pos_direct, vel_direct, clk_d, _ = eph2pos(604000.0 + 900.0, eph)
    pos_wrap, vel_wrap, clk_w, _ = eph2pos(100.0, eph)  # 604900 mod 604800
    np.testing.assert_allclose(pos_wrap, pos_direct, atol=1e-3)
    np.testing.assert_allclose(vel_wrap, vel_direct, atol=1e-6)
    assert abs(clk_w - clk_d) < 1e-12


def test_bds_geo_orbit():
    """BDS GEO (prn <= 5, compressed id 96+) uses the tilted-frame branch:
    geostationary radius, near-zero ECEF velocity (earth co-rotation), and
    finite-difference velocity consistency."""
    from ground_fusion2_tpu.gnss.ephemeris import Ephemeris
    eph = Ephemeris(
        sat=97,                   # BDS prn 2 -> GEO
        toe=1000.0, toc=1000.0,
        A=42164.2e3, e=0.0003, i0=np.radians(1.5),
        OMG0=np.radians(100.0), omg=0.3, M0=1.0,
        delta_n=0.0, OMG_dot=0.0, i_dot=0.0)
    pos, vel, clk, drift = eph2pos(1500.0, eph)
    r = np.linalg.norm(pos)
    assert 4.21e7 < r < 4.23e7, r
    # GEO co-rotates with the earth: ECEF speed well below MEO's ~3.9 km/s
    assert np.linalg.norm(vel) < 300.0, np.linalg.norm(vel)
    pos2, _, _, _ = eph2pos(1501.0, eph)
    np.testing.assert_allclose((pos2 - pos), vel, rtol=5e-2, atol=0.5)


def test_gnss_quality_filter():
    """Ingest gates (reference estimator.cpp:1550-1578): std thresholds,
    elevation mask, consecutive-track count."""
    from ground_fusion2_tpu.gnss.factors import GnssQualityFilter
    from ground_fusion2_tpu.gnss.spp import GnssMeas

    def meas(sat, psr_std=1.0, dopp_std=0.5, el=np.radians(60)):
        return GnssMeas(sat=sat, psr=2e7, dopp=0.0, psr_std=psr_std,
                        dopp_std=dopp_std, sat_pos=np.zeros(3),
                        sat_vel=np.zeros(3), azel=(0.0, el))

    filt = GnssQualityFilter(track_thres=3)
    epoch = [meas(1), meas(2, psr_std=5.0), meas(3, el=np.radians(10.0)),
             meas(4, dopp_std=9.0)]
    # first two epochs: everything below the track threshold
    assert filt.filter(epoch) == []
    assert filt.filter(epoch) == []
    out = filt.filter(epoch)
    assert [m.sat for m in out] == [1]   # quality gates drop 2/3/4
    # a satellite that disappears loses its track count
    filt.filter([meas(5)])
    filt.filter([meas(5)])
    out = filt.filter([meas(1), meas(5)])
    assert [m.sat for m in out] == [5] or [m.sat for m in out] == []


def test_spp_recovers_position():
    sim = GnssSim(psr_noise=0.5, dopp_noise=0.05)
    enu_true = np.array([10.0, -5.0, 2.0])
    meas = sim.measurements(t=50.0, enu_pos=enu_true)
    assert len(meas) >= 6
    pos, dt, ok = spp_position(meas)
    assert ok
    enu_est = frames.ecef2enu(sim.ref_ecef, pos)
    np.testing.assert_allclose(enu_est, enu_true, atol=3.0)
    # clock bias recovered
    np.testing.assert_allclose(dt[0], sim.rcv_clk, atol=3.0)


def test_spp_recovers_velocity():
    sim = GnssSim(psr_noise=0.5, dopp_noise=0.02)
    enu_v = np.array([1.0, 0.5, 0.0])
    meas = sim.measurements(t=50.0, enu_pos=np.zeros(3), enu_vel=enu_v)
    pos, dt, ok = spp_position(meas)
    vel, ddt, ok = spp_velocity(meas, pos)
    enu_vel = frames.ecef2rotation(sim.ref_ecef) @ vel
    np.testing.assert_allclose(enu_vel, enu_v, atol=0.1)
    np.testing.assert_allclose(ddt, sim.rcv_ddt, atol=0.1)


def test_azel_overhead():
    sim = GnssSim()
    rcv = sim.ref_ecef
    up = rcv * (1 + 2.0e7 / np.linalg.norm(rcv))
    az, el = sat_azel(rcv, up)
    assert el > np.radians(85)


@pytest.mark.slow
def test_global_fusion_aligns_drifting_odometry():
    # local odometry drifts linearly; GPS anchors every 5 nodes pull the
    # global estimate back to truth
    rng = np.random.default_rng(0)
    gf = GlobalFusion(capacity=64)
    n = 40
    truth = np.stack([np.linspace(0, 20, n), np.sin(np.linspace(0, 3, n)),
                      np.zeros(n)], axis=-1)
    drift = np.linspace(0, 1.5, n)[:, None] * np.array([0.0, 1.0, 0.0])
    for i in range(n):
        p_local = truth[i] + drift[i]
        gf.input_odom(p_local, np.array([1.0, 0, 0, 0]))
        if i % 5 == 0:
            gf.input_gps(i, truth[i] + rng.normal(scale=0.05, size=3),
                         std=0.1)
    g = gf.optimize(iters=10)
    est = np.asarray(g.p[:n])
    err = np.linalg.norm(est - truth, axis=1)
    assert err.max() < 0.35, err.max()
    # without fusion, raw drift would be ~1.5 m
    assert err.max() < 0.3 * drift[-1, 1]
