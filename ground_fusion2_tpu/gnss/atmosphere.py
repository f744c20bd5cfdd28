"""Ionosphere (Klobuchar) and troposphere (Saastamoinen) delay models
(reference ``gnss_utility.cpp`` calculate_ion_delay / calculate_trop_delay)."""

from __future__ import annotations

import numpy as np

SPEED_OF_LIGHT = 299792458.0


def klobuchar_delay(t_sec_of_day: float, lat: float, lon: float,
                    az: float, el: float, alpha, beta) -> float:
    """L1 ionospheric delay (m). lat/lon/az/el radians; alpha/beta the 8
    broadcast coefficients."""
    psi = 0.0137 / (el / np.pi + 0.11) - 0.022
    phi = lat / np.pi + psi * np.cos(az)
    phi = np.clip(phi, -0.416, 0.416)
    lam = lon / np.pi + psi * np.sin(az) / np.cos(phi * np.pi)
    phi_m = phi + 0.064 * np.cos((lam - 1.617) * np.pi)
    t = 43200.0 * lam + t_sec_of_day
    t = t % 86400.0
    f = 1.0 + 16.0 * (0.53 - el / np.pi) ** 3
    amp = sum(a * phi_m**i for i, a in enumerate(alpha))
    per = sum(b * phi_m**i for i, b in enumerate(beta))
    amp = max(amp, 0.0)
    per = max(per, 72000.0)
    x = 2.0 * np.pi * (t - 50400.0) / per
    if abs(x) < 1.57:
        delay = 5e-9 + amp * (1 - x * x / 2 + x**4 / 24)
    else:
        delay = 5e-9
    return SPEED_OF_LIGHT * f * delay


def saastamoinen_delay(lat: float, alt: float, el: float,
                       humidity: float = 0.5) -> float:
    """Tropospheric delay (m). lat/el radians, alt metres."""
    if alt < -100 or alt > 10000 or el <= 0:
        return 0.0
    p = 1013.25 * (1.0 - 2.2557e-5 * alt) ** 5.2568
    T = 15.0 - 6.5e-3 * alt + 273.16
    e = 6.108 * humidity * np.exp((17.15 * T - 4684.0) / (T - 38.45))
    z = np.pi / 2.0 - el
    return 0.002277 / np.cos(z) * (
        p + (1255.0 / T + 0.05) * e - np.tan(z) ** 2)
