"""RINEX 3.x navigation/observation file parsing (host-side, numpy).

Rebuild of ``gnss_comm``'s RINEX layer (``rinex_helper.cpp``: ``rinex2ephems``,
``rinex2obs``) — the real-data entry point for GNSS: broadcast ephemerides
from a ``*.rnx``/``*.nav`` navigation file and per-epoch pseudorange/doppler
observations from an obs file, decoded straight into this package's
:class:`~.ephemeris.Ephemeris` / :class:`~.ephemeris.GloEphemeris` /
:class:`~.spp.GnssMeas` structs that SPP (`spp.py`) and the tightly-coupled
factors (`factors.py`) consume.

Supported: GPS (G), GLONASS (R), Galileo (E), BeiDou (C) — the four
constellations the reference handles (``gnss_constant.hpp``). SBAS/QZSS/IRNSS
records are skipped. A matching writer (`write_rinex_nav`/`write_rinex_obs`)
exists for round-trip tests and for exporting simulated constellations.

Conventions (documented deviations from a full RTKLIB port):
* times are (GPS week, seconds-of-week); civil epochs convert via
  :func:`epoch2gpst` with a fixed GPS−UTC leap offset (18 s, post-2017) for
  GLONASS UTC epochs.
* doppler sign: RINEX stores Hz with + = approaching; ``GnssMeas.dopp`` is a
  range rate with + = receding → ``dopp = −λ·D`` (reference
  ``gnss_utility.cpp`` applies the same λ scaling per signal).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .ephemeris import (SPEED_OF_LIGHT, Ephemeris, GloEphemeris, satsys,
                        SYS_GPS, SYS_GLO, SYS_GAL, SYS_BDS)
from .spp import GnssMeas

# L1-band carrier frequencies (Hz) per constellation (gnss_constant.hpp)
FREQ_L1_GPS = 1575.42e6
FREQ_L1_GAL = 1575.42e6
FREQ_B1I_BDS = 1561.098e6
FREQ_G1_GLO = 1602.0e6
DFRQ_G1_GLO = 0.5625e6          # FDMA channel spacing

_SYS_CHAR = {"G": SYS_GPS, "R": SYS_GLO, "E": SYS_GAL, "C": SYS_BDS}
_CHAR_SYS = {v: k for k, v in _SYS_CHAR.items()}
# sat-id packing used across the package (ephemeris.satsys):
# GPS 1-32, GLO 33-59, GAL 60-95, BDS 96-141
_SYS_BASE = {SYS_GPS: 0, SYS_GLO: 32, SYS_GAL: 59, SYS_BDS: 95}

GPS_UTC_LEAP = 18.0             # GPS−UTC after 2017-01-01
BDT_GPST_OFFSET = 14.0          # GPST−BDT (reference rinex_helper.cpp:100,144)
WEEK_SECONDS = 604800.0


def sat_id(sys_char: str, prn: int) -> int:
    """'G',5 → package satellite id (see ``ephemeris.satsys``)."""
    return _SYS_BASE[_SYS_CHAR[sys_char]] + prn


def sat_prn(sat: int) -> tuple[str, int]:
    sys = satsys(sat)
    return _CHAR_SYS[sys], sat - _SYS_BASE[sys]


def carrier_freq(sat: int, glo_fcn: int = 0) -> float:
    sys = satsys(sat)
    if sys == SYS_GLO:
        return FREQ_G1_GLO + glo_fcn * DFRQ_G1_GLO
    if sys == SYS_BDS:
        return FREQ_B1I_BDS
    return FREQ_L1_GPS


def epoch2gpst(y: int, mo: int, d: int, h: int, mi: int,
               s: float) -> tuple[int, float]:
    """Civil epoch (GPS time scale) → (week, seconds-of-week).

    Mirrors the reference's ``epoch2time``+``time2gpst`` chain
    (``gnss_utility.cpp``) without the gtime_t struct: day count since the
    GPS epoch 1980-01-06 via a standard civil→day calculation.
    """
    # days since 1970-01-01 (proleptic Gregorian, valid 1970-2099)
    doy = [0, 31, 59, 90, 120, 151, 181, 212, 243, 273, 304, 334]
    days = ((y - 1970) * 365 + (y - 1969) // 4 + doy[mo - 1] + d - 1
            + (1 if (y % 4 == 0 and mo >= 3) else 0))
    days -= 3657                        # 1980-01-06 offset
    sec = days * 86400 + h * 3600 + mi * 60 + s
    week = int(sec // WEEK_SECONDS)
    return week, sec - week * WEEK_SECONDS


def gpst2epoch(week: int, tow: float) -> tuple:
    """(week, tow) → civil (y, mo, d, h, mi, s) in the GPS time scale."""
    days = int(week * 7 + tow // 86400) + 3657
    sod = tow - (tow // 86400) * 86400
    # invert days since 1970-01-01
    mday = [31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31]
    y = 1970
    while True:
        ylen = 366 if y % 4 == 0 else 365
        if days < ylen:
            break
        days -= ylen
        y += 1
    mo = 1
    for ml in mday:
        ml = ml + (1 if (mo == 2 and y % 4 == 0) else 0)
        if days < ml:
            break
        days -= ml
        mo += 1
    h = int(sod // 3600)
    mi = int((sod - h * 3600) // 60)
    s = sod - h * 3600 - mi * 60
    return y, mo, days + 1, h, mi, s


def _f(s: str) -> float:
    """Parse one RINEX 19-char float field ('D' or 'E' exponent, blanks→0)."""
    s = s.strip().replace("D", "E").replace("d", "e")
    return float(s) if s else 0.0


def _fields(line: str, start: int = 4, width: int = 19, n: int = 4):
    return [_f(line[start + i * width: start + (i + 1) * width])
            for i in range(n)]


@dataclass
class NavData:
    """Parsed navigation file: ephemerides + header side info."""

    ephems: list = field(default_factory=list)   # Ephemeris | GloEphemeris
    glo_fcn: dict = field(default_factory=dict)  # sat -> frequency number
    iono_alpha: np.ndarray | None = None         # Klobuchar GPSA
    iono_beta: np.ndarray | None = None          # GPSB

    def by_sat(self, tow: float | None = None) -> dict:
        """One ephemeris per satellite.

        With ``tow`` (seconds-of-week): the record whose toe is NEAREST the
        query time, week-rollover aware — the reference walks its per-sat
        ephemeris list time-ordered, so a multi-hour nav file must not
        evaluate early epochs with an ephemeris hours in the future (orbit
        error grows to hundreds of metres). Without ``tow``: globally
        latest toe (legacy behavior for single-epoch files)."""
        def dist(toe):
            d = abs(toe - tow) % WEEK_SECONDS
            return min(d, WEEK_SECONDS - d)
        out = {}
        for e in self.ephems:
            cur = out.get(e.sat)
            if cur is None:
                out[e.sat] = e
            elif tow is None:
                if e.toe >= cur.toe:
                    out[e.sat] = e
            elif dist(e.toe) < dist(cur.toe):
                out[e.sat] = e
        return out


def parse_rinex_nav(text_or_path: str) -> NavData:
    """Parse a RINEX 3.x navigation file (``rinex_helper.cpp:rinex2ephems``)."""
    text = _read(text_or_path)
    lines = text.splitlines()
    nav = NavData()
    i = 0
    # header
    while i < len(lines):
        ln = lines[i]
        i += 1
        label = ln[60:].strip()
        if label == "END OF HEADER":
            break
        if label == "IONOSPHERIC CORR":
            vals = [_f(ln[5 + 12 * k: 5 + 12 * (k + 1)]) for k in range(4)]
            if ln.startswith("GPSA"):
                nav.iono_alpha = np.array(vals)
            elif ln.startswith("GPSB"):
                nav.iono_beta = np.array(vals)
    # records
    while i < len(lines):
        ln = lines[i]
        if len(ln) < 23 or ln[0] not in _SYS_CHAR:
            i += 1
            continue
        sysc = ln[0]
        prn = int(ln[1:3])
        sat = sat_id(sysc, prn)
        y, mo, d = int(ln[4:8]), int(ln[9:11]), int(ln[12:14])
        h, mi, s = int(ln[15:17]), int(ln[18:20]), float(ln[21:23])
        clk = _fields(ln, 23, 19, 3)
        if sysc == "R":
            if i + 3 >= len(lines):
                break
            l1 = _fields(lines[i + 1])
            l2 = _fields(lines[i + 2])
            l3 = _fields(lines[i + 3])
            i += 4
            _, tow = epoch2gpst(y, mo, d, h, mi, s + GPS_UTC_LEAP)
            nav.ephems.append(GloEphemeris(
                sat=sat, toe=tow,
                pos=np.array([l1[0], l2[0], l3[0]]) * 1e3,
                vel=np.array([l1[1], l2[1], l3[1]]) * 1e3,
                acc=np.array([l1[2], l2[2], l3[2]]) * 1e3,
                tau_n=-clk[0], gamma=clk[1]))
            nav.glo_fcn[sat] = int(l2[3])
        else:
            if i + 7 >= len(lines):
                break
            l1 = _fields(lines[i + 1])
            l2 = _fields(lines[i + 2])
            l3 = _fields(lines[i + 3])
            l4 = _fields(lines[i + 4])
            l5 = _fields(lines[i + 5])
            l6 = _fields(lines[i + 6])
            i += 8                       # l7 = transmission time (unused)
            _, toc = epoch2gpst(y, mo, d, h, mi, s)
            toe = l3[0]
            if sysc == "C":
                # BDS nav records are in BDT; shift toc/toe into GPST so
                # evaluation at a GPST obs tow is consistent (reference
                # rinex_helper.cpp adds the 14 s offset on ingest)
                toc += BDT_GPST_OFFSET
                toe += BDT_GPST_OFFSET
            if sysc == "E":
                # Galileo: keep only I/NAV records (E1-B bit of the line-5
                # data-source field); F/NAV entries carry E5a clock/BGD with
                # a different tgd meaning (reference skips them)
                if not int(l5[1]) & 0x01:
                    continue
            nav.ephems.append(Ephemeris(
                sat=sat, toe=toe, toc=toc,
                A=l2[3] ** 2, e=l2[1], i0=l4[0], OMG0=l3[2], omg=l4[2],
                M0=l1[3], delta_n=l1[2], OMG_dot=l4[3], i_dot=l5[0],
                cuc=l2[0], cus=l2[2], crc=l4[1], crs=l1[1],
                cic=l3[1], cis=l3[3],
                af0=clk[0], af1=clk[1], af2=clk[2], tgd=l6[2]))
    return nav


def write_rinex_nav(nav: NavData, path: str | None = None) -> str:
    """Inverse of :func:`parse_rinex_nav` (round-trip tests; sim export)."""
    out = ["{:9.2f}{:11s}{:1s}{:19s}{:20s}{}".format(
        3.04, "", "N", "", "", "RINEX VERSION / TYPE")]
    if nav.iono_alpha is not None:
        out.append("GPSA " + "".join(f"{v:12.4E}" for v in nav.iono_alpha)
                   + " " * 7 + "IONOSPHERIC CORR")
    if nav.iono_beta is not None:
        out.append("GPSB " + "".join(f"{v:12.4E}" for v in nav.iono_beta)
                   + " " * 7 + "IONOSPHERIC CORR")
    out.append(" " * 60 + "END OF HEADER")

    def fmt(vals):
        return "    " + "".join(f"{v:19.12E}" for v in vals)

    for e in nav.ephems:
        sysc, prn = sat_prn(e.sat)
        if isinstance(e, GloEphemeris):
            y, mo, d, h, mi, s = gpst2epoch(0, e.toe - GPS_UTC_LEAP)
            hdr = (f"{sysc}{prn:02d} {y:04d} {mo:02d} {d:02d} "
                   f"{h:02d} {mi:02d} {int(s):02d}")
            out.append(hdr + "".join(
                f"{v:19.12E}" for v in (-e.tau_n, e.gamma, 0.0)))
            k = nav.glo_fcn.get(e.sat, 0)
            p, v, a = e.pos / 1e3, e.vel / 1e3, e.acc / 1e3
            out.append(fmt([p[0], v[0], a[0], 0.0]))
            out.append(fmt([p[1], v[1], a[1], float(k)]))
            out.append(fmt([p[2], v[2], a[2], 0.0]))
        else:
            # symmetric time-system shifts: BDS records are written back in
            # BDT; Galileo carries the I/NAV E1-B data-source bit
            toc_w, toe_w = e.toc, e.toe
            if sysc == "C":
                toc_w -= BDT_GPST_OFFSET
                toe_w -= BDT_GPST_OFFSET
            data_src = 1.0 if sysc == "E" else 0.0
            y, mo, d, h, mi, s = gpst2epoch(0, toc_w)
            hdr = (f"{sysc}{prn:02d} {y:04d} {mo:02d} {d:02d} "
                   f"{h:02d} {mi:02d} {int(s):02d}")
            out.append(hdr + "".join(
                f"{v:19.12E}" for v in (e.af0, e.af1, e.af2)))
            out.append(fmt([0.0, e.crs, e.delta_n, e.M0]))
            out.append(fmt([e.cuc, e.e, e.cus, np.sqrt(e.A)]))
            out.append(fmt([toe_w, e.cic, e.OMG0, e.cis]))
            out.append(fmt([e.i0, e.crc, e.omg, e.OMG_dot]))
            out.append(fmt([e.i_dot, data_src, 0.0, 0.0]))
            out.append(fmt([0.0, 0.0, e.tgd, 0.0]))
            out.append(fmt([0.0, 0.0, 0.0, 0.0]))
    text = "\n".join(out) + "\n"
    if path:
        with open(path, "w") as f:
            f.write(text)
    return text


# ---------------------------------------------------------------------------
# Observation files
# ---------------------------------------------------------------------------

@dataclass
class ObsEpoch:
    week: int
    tow: float
    meas: list               # list[GnssMeas] (psr/dopp/stds filled)


def parse_rinex_obs(text_or_path: str,
                    glo_fcn: dict | None = None) -> list[ObsEpoch]:
    """Parse a RINEX 3.x observation file (``rinex_helper.cpp:rinex2obs``).

    Picks the first pseudorange (C..) / doppler (D..) / SNR (S..) column per
    constellation from the ``SYS / # / OBS TYPES`` header. ``glo_fcn`` (from
    :class:`NavData`) sets GLONASS FDMA channels for the doppler λ.
    """
    text = _read(text_or_path)
    glo_fcn = glo_fcn or {}
    lines = text.splitlines()
    obs_types: dict[str, list[str]] = {}
    i = 0
    while i < len(lines):
        ln = lines[i]
        i += 1
        label = ln[60:].strip()
        if label == "END OF HEADER":
            break
        if label == "SYS / # / OBS TYPES":
            sysc = ln[0]
            n = int(ln[3:6])
            codes = []
            while len(codes) < n:
                codes += ln[7:58].split()
                if len(codes) < n:
                    ln = lines[i]
                    i += 1
            obs_types[sysc] = codes[:n]

    def col(sysc, kind):
        for j, c in enumerate(obs_types.get(sysc, [])):
            if c.startswith(kind):
                return j
        return -1

    epochs: list[ObsEpoch] = []
    while i < len(lines):
        ln = lines[i]
        i += 1
        if not ln.startswith(">"):
            continue
        y, mo, d = int(ln[2:6]), int(ln[7:9]), int(ln[10:12])
        h, mi, s = int(ln[13:15]), int(ln[16:18]), float(ln[19:29])
        nsat = int(ln[32:35])
        week, tow = epoch2gpst(y, mo, d, h, mi, s)
        meas = []
        for _ in range(nsat):
            sl = lines[i]
            i += 1
            sysc = sl[0]
            if sysc not in _SYS_CHAR:
                continue
            sat = sat_id(sysc, int(sl[1:3]))

            def val(j):
                if j < 0:
                    return 0.0
                seg = sl[3 + 16 * j: 3 + 16 * j + 14]
                return _f(seg) if seg.strip() else 0.0

            psr = val(col(sysc, "C"))
            dopp_hz = val(col(sysc, "D"))
            snr = val(col(sysc, "S"))
            if psr == 0.0:
                continue
            lam = SPEED_OF_LIGHT / carrier_freq(sat, glo_fcn.get(sat, 0))
            # CN0-driven std (reference scales factor noise by SNR)
            psr_std = 1.0 if snr == 0 else max(0.3, 10 ** ((45 - snr) / 20))
            meas.append(GnssMeas(sat=sat, psr=psr, dopp=-lam * dopp_hz,
                                 psr_std=psr_std, dopp_std=0.1 * psr_std))
        epochs.append(ObsEpoch(week=week, tow=tow, meas=meas))
    return epochs


def write_rinex_obs(epochs: list[ObsEpoch], path: str | None = None,
                    glo_fcn: dict | None = None) -> str:
    """Inverse of :func:`parse_rinex_obs` (C1C/D1C/S1C single-signal)."""
    glo_fcn = glo_fcn or {}
    out = ["{:9.2f}{:11s}{:1s}{:19s}{:20s}{}".format(
        3.04, "", "O", "", "", "RINEX VERSION / TYPE")]
    for sysc in "GREC":
        out.append(f"{sysc}    3 C1C D1C S1C".ljust(60)
                   + "SYS / # / OBS TYPES")
    out.append(" " * 60 + "END OF HEADER")
    for ep in epochs:
        y, mo, d, h, mi, s = gpst2epoch(ep.week, ep.tow)
        out.append(f"> {y:04d} {mo:02d} {d:02d} {h:02d} {mi:02d}"
                   f"{s:11.7f}  0{len(ep.meas):3d}")
        for m in ep.meas:
            sysc, prn = sat_prn(m.sat)
            lam = SPEED_OF_LIGHT / carrier_freq(m.sat,
                                                glo_fcn.get(m.sat, 0))
            dopp_hz = -m.dopp / lam
            snr = 45.0 - 20 * np.log10(max(m.psr_std, 0.3))
            out.append(f"{sysc}{prn:02d}{m.psr:14.3f}  {dopp_hz:14.3f}  "
                       f"{snr:14.3f}  ")
    text = "\n".join(out) + "\n"
    if path:
        with open(path, "w") as f:
            f.write(text)
    return text


def fill_sat_states(meas: list[GnssMeas], nav: NavData, tow: float,
                    tx_correction: bool = True) -> list[GnssMeas]:
    """Attach sat pos/vel/clock from broadcast ephemeris (signal TX time
    corrected by psr/c, reference ``estimator.cpp`` inputEphem→sat_states;
    ``tx_correction=False`` evaluates at reception time, matching
    :class:`~.sim.GnssSim`'s convention)."""
    from .ephemeris import eph2pos, geph2pos
    by_sat = nav.by_sat(tow)      # nearest-toe record per satellite
    out = []
    for m in meas:
        e = by_sat.get(m.sat)
        if e is None:
            continue
        t_tx = tow - (m.psr / SPEED_OF_LIGHT if tx_correction else 0.0)
        if isinstance(e, GloEphemeris):
            pos, vel, clk, drift = geph2pos(t_tx, e)
        else:
            pos, vel, clk, drift = eph2pos(t_tx, e)
        m.sat_pos, m.sat_vel = pos, vel
        m.sat_clk, m.sat_clk_drift = clk, drift
        out.append(m)
    return out


def _read(text_or_path: str) -> str:
    if "\n" in text_or_path:
        return text_or_path
    with open(text_or_path) as f:
        return f.read()
