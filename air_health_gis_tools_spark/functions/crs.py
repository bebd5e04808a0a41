"""Real CRS transform (F1): GDA94 / Australian Albers (EPSG:3577).

The reference transforms coordinates with
``pyproj.Transformer.from_crs("EPSG:3577", "EPSG:4326")``
(srg-dev/"benchmark with Nate code.ipynb", transformer cell). pyproj is not
in this environment, so the projection is implemented directly from the
public equations for the ellipsoidal Albers Equal-Area Conic
(J. P. Snyder, *Map Projections — A Working Manual*, USGS Professional
Paper 1395, §14, eqs. 14-1..14-21 and 3-16) with EPSG:3577's published
parameters on GRS80. Fully vectorized NumPy — usable inside Arrow kernels.

Correctness is established by property tests (tests/test_crs.py):
roundtrip identity, central-meridian symmetry, and the equal-area
Jacobian identity |∂(x,y)/∂(λ,φ)| = a²(1−e²)cosφ/(1−e²sin²φ)² which holds
iff the projection really is ellipsoidal-equal-area.
"""

from __future__ import annotations

import numpy as np

# GRS80 ellipsoid + EPSG:3577 parameters (public EPSG registry values)
A = 6378137.0
F_INV = 298.257222101
E2 = 2.0 / F_INV - 1.0 / (F_INV * F_INV)
E = np.sqrt(E2)
LAT0 = 0.0                 # latitude of projection origin
LON0 = 132.0               # central meridian
LAT1, LAT2 = -18.0, -36.0  # standard parallels
FE, FN = 0.0, 0.0


def _q(sinphi: np.ndarray) -> np.ndarray:
    """Snyder 3-12: authalic q."""
    esp = E * sinphi
    return (1.0 - E2) * (sinphi / (1.0 - esp * esp)
                         - (1.0 / (2.0 * E)) * np.log((1.0 - esp)
                                                      / (1.0 + esp)))


def _m(phi: np.ndarray) -> np.ndarray:
    """Snyder 14-15: m = cosφ / sqrt(1 − e² sin²φ)."""
    s = np.sin(phi)
    return np.cos(phi) / np.sqrt(1.0 - E2 * s * s)


_phi1 = np.deg2rad(LAT1)
_phi2 = np.deg2rad(LAT2)
_m1 = _m(np.array(_phi1))
_m2 = _m(np.array(_phi2))
_q1 = _q(np.sin(np.array(_phi1)))
_q2 = _q(np.sin(np.array(_phi2)))
_q0 = _q(np.sin(np.deg2rad(np.array(LAT0))))
N = (_m1 * _m1 - _m2 * _m2) / (_q2 - _q1)          # Snyder 14-14 (n < 0 here)
C = _m1 * _m1 + N * _q1                            # Snyder 14-13
RHO0 = A * np.sqrt(C - N * _q0) / N                # Snyder 14-12a (signed)


def albers_forward(lat_deg, lon_deg) -> tuple[np.ndarray, np.ndarray]:
    """(lat, lon) WGS84/GDA94 degrees → EPSG:3577 (x, y) meters."""
    phi = np.deg2rad(np.asarray(lat_deg, dtype=np.float64))
    lam = np.deg2rad(np.asarray(lon_deg, dtype=np.float64) - LON0)
    q = _q(np.sin(phi))
    rho = A * np.sqrt(C - N * q) / N               # signed by N
    theta = N * lam
    x = FE + rho * np.sin(theta)
    y = FN + RHO0 - rho * np.cos(theta)
    return x, y


def albers_inverse(x, y, iters: int = 6) -> tuple[np.ndarray, np.ndarray]:
    """EPSG:3577 (x, y) meters → (lat, lon) degrees. Iterative Snyder 3-16
    latitude recovery (converges quadratically; 6 iterations ≪ 1e-12 rad)."""
    x = np.asarray(x, dtype=np.float64) - FE
    y = np.asarray(y, dtype=np.float64) - FN
    # Snyder 14-10/14-11 with the sign-of-n convention
    rho = np.hypot(x, RHO0 - y) * np.sign(N)
    theta = np.arctan2(x * np.sign(N), (RHO0 - y) * np.sign(N))
    q = (C - (rho * rho * N * N) / (A * A)) / N    # Snyder 14-19
    # initial guess: spherical (authalic) latitude
    phi = np.arcsin(np.clip(q / 2.0, -1.0, 1.0))
    for _ in range(iters):                          # Snyder 3-16
        s = np.sin(phi)
        esp = E * s
        one = 1.0 - esp * esp
        phi = phi + (one * one / (2.0 * np.cos(phi))) * (
            q / (1.0 - E2) - s / one
            + (1.0 / (2.0 * E)) * np.log((1.0 - esp) / (1.0 + esp)))
    lat = np.rad2deg(phi)
    lon = LON0 + np.rad2deg(theta / N)
    return lat, lon
