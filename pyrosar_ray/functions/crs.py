"""WGS84 ↔ UTM coordinate transforms, pure numpy (no PROJ/GDAL).

Closes the engine's "EPSG:4326-only" warp gap: the reference's
``dem_create``/Terrain-Correction accept UTM targets via GDAL+PROJ
(auxdata.py:274-468, snap/util.py t_srs), neither of which ships here.
The transverse-Mercator mapping is implemented from the standard
6th-order Krüger series in the conformal latitude (Karney 2011,
"Transverse Mercator with an accuracy of a few nanometers" — public
formulas), giving sub-micrometer accuracy over a UTM zone's width —
far below any raster's pixel size.

Supported CRSs: EPSG:4326 and the UTM zones EPSG:326xx (north) /
327xx (south). Everything is vectorized over coordinate arrays.
"""

from __future__ import annotations

import re

import numpy as np

# WGS84
_A = 6378137.0
_F = 1.0 / 298.257223563
_N = _F / (2.0 - _F)
_K0 = 0.9996
_FALSE_E = 500000.0
_FALSE_N_SOUTH = 10000000.0

_n = _N
# rectifying radius
_A1 = _A / (1 + _n) * (1 + _n**2 / 4 + _n**4 / 64 + _n**6 / 256)

# Krüger series coefficients (order n^6)
_ALPHA = np.array([
    _n / 2 - 2 * _n**2 / 3 + 5 * _n**3 / 16 + 41 * _n**4 / 180
    - 127 * _n**5 / 288 + 7891 * _n**6 / 37800,
    13 * _n**2 / 48 - 3 * _n**3 / 5 + 557 * _n**4 / 1440
    + 281 * _n**5 / 630 - 1983433 * _n**6 / 1935360,
    61 * _n**3 / 240 - 103 * _n**4 / 140 + 15061 * _n**5 / 26880
    + 167603 * _n**6 / 181440,
    49561 * _n**4 / 161280 - 179 * _n**5 / 168 + 6601661 * _n**6 / 7257600,
    34729 * _n**5 / 80640 - 3418889 * _n**6 / 1995840,
    212378941 * _n**6 / 319334400,
])
_BETA = np.array([
    _n / 2 - 2 * _n**2 / 3 + 37 * _n**3 / 96 - _n**4 / 360
    - 81 * _n**5 / 512 + 96199 * _n**6 / 604800,
    _n**2 / 48 + _n**3 / 15 - 437 * _n**4 / 1440 + 46 * _n**5 / 105
    - 1118711 * _n**6 / 3870720,
    17 * _n**3 / 480 - 37 * _n**4 / 840 - 209 * _n**5 / 4480
    + 5569 * _n**6 / 90720,
    4397 * _n**4 / 161280 - 11 * _n**5 / 504 - 830251 * _n**6 / 7257600,
    4583 * _n**5 / 161280 - 108847 * _n**6 / 3991680,
    20648693 * _n**6 / 638668800,
])
_DELTA = np.array([
    2 * _n - 2 * _n**2 / 3 - 2 * _n**3 + 116 * _n**4 / 45
    + 26 * _n**5 / 45 - 2854 * _n**6 / 675,
    7 * _n**2 / 3 - 8 * _n**3 / 5 - 227 * _n**4 / 45 + 2704 * _n**5 / 315
    + 2323 * _n**6 / 945,
    56 * _n**3 / 15 - 136 * _n**4 / 35 - 1262 * _n**5 / 105
    + 73814 * _n**6 / 2835,
    4279 * _n**4 / 630 - 332 * _n**5 / 35 - 399572 * _n**6 / 14175,
    4174 * _n**5 / 315 - 144838 * _n**6 / 6237,
    601676 * _n**6 / 22275,
])
_J = np.arange(1, 7, dtype=np.float64)

#: eccentricity term of the conformal-latitude mapping
_E2N = 2.0 * np.sqrt(_n) / (1.0 + _n)


def utm_zone_for(lon: float, lat: float) -> tuple[int, bool]:
    """Standard UTM zone for a point: zone = floor((lon+180)/6)+1,
    hemisphere from the latitude sign (Norway/Svalbard exceptions are a
    mapping-agency convention the reference does not apply either)."""
    zone = int(np.floor((float(lon) + 180.0) / 6.0)) % 60 + 1
    return zone, float(lat) >= 0.0


def parse_epsg(t_srs) -> int:
    """'EPSG:n' / 'n' / int → EPSG integer; anything else raises."""
    if isinstance(t_srs, (int, np.integer)):
        return int(t_srs)
    if isinstance(t_srs, str):
        match = re.fullmatch(r"(?:EPSG:)?(\d+)", t_srs.strip())
        if match:
            return int(match.group(1))
    raise RuntimeError(f"cannot parse t_srs: {t_srs!r}")


def epsg_to_utm(epsg: int) -> tuple[int, bool]:
    """EPSG:326xx/327xx → (zone, north). Raises on anything else."""
    if 32601 <= epsg <= 32660:
        return epsg - 32600, True
    if 32701 <= epsg <= 32760:
        return epsg - 32700, False
    raise RuntimeError(f"EPSG:{epsg} is not a WGS84 UTM zone (326xx/327xx)")


def utm_forward(
    lon, lat, zone: int, north: bool = True
) -> tuple[np.ndarray, np.ndarray]:
    """Geographic (degrees) → UTM easting/northing (meters), vectorized."""
    lam = np.radians(np.asarray(lon, dtype=np.float64) - (zone * 6.0 - 183.0))
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    s = np.sin(phi)
    # conformal latitude via the Gauss-Schreiber t
    t = np.sinh(np.arctanh(s) - _E2N * np.arctanh(_E2N * s))
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arcsinh(np.sin(lam) / np.hypot(t, np.cos(lam)))
    two_j_xi = 2.0 * _J[:, None] * xi_p.ravel()[None, :]
    two_j_eta = 2.0 * _J[:, None] * eta_p.ravel()[None, :]
    xi = xi_p.ravel() + (_ALPHA[:, None] * np.sin(two_j_xi) * np.cosh(two_j_eta)).sum(0)
    eta = eta_p.ravel() + (_ALPHA[:, None] * np.cos(two_j_xi) * np.sinh(two_j_eta)).sum(0)
    E = _FALSE_E + _K0 * _A1 * eta.reshape(lam.shape)
    Nn = _K0 * _A1 * xi.reshape(lam.shape)
    if not north:
        Nn = Nn + _FALSE_N_SOUTH
    return E, Nn


def utm_inverse(
    easting, northing, zone: int, north: bool = True
) -> tuple[np.ndarray, np.ndarray]:
    """UTM easting/northing (meters) → geographic lon/lat (degrees)."""
    E = np.asarray(easting, dtype=np.float64)
    Nn = np.asarray(northing, dtype=np.float64)
    if not north:
        Nn = Nn - _FALSE_N_SOUTH
    xi = (Nn / (_K0 * _A1)).ravel()
    eta = ((E - _FALSE_E) / (_K0 * _A1)).ravel()
    two_j_xi = 2.0 * _J[:, None] * xi[None, :]
    two_j_eta = 2.0 * _J[:, None] * eta[None, :]
    xi_p = xi - (_BETA[:, None] * np.sin(two_j_xi) * np.cosh(two_j_eta)).sum(0)
    eta_p = eta - (_BETA[:, None] * np.cos(two_j_xi) * np.sinh(two_j_eta)).sum(0)
    chi = np.arcsin(np.sin(xi_p) / np.cosh(eta_p))
    phi = chi + (_DELTA[:, None] * np.sin(2.0 * _J[:, None] * chi[None, :])).sum(0)
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    lon = np.degrees(lam).reshape(E.shape) + (zone * 6.0 - 183.0)
    lat = np.degrees(phi).reshape(E.shape)
    return lon, lat


def transform_points(x, y, s_srs, t_srs) -> tuple[np.ndarray, np.ndarray]:
    """Transform coordinate arrays between EPSG:4326 and UTM zones.

    Same-CRS is identity; 4326→UTM runs the forward mapping, UTM→4326
    the inverse; UTM→UTM composes through geographic.
    """
    s_epsg, t_epsg = parse_epsg(s_srs), parse_epsg(t_srs)
    if s_epsg == t_epsg:
        return np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
    if s_epsg != 4326:
        zone, north = epsg_to_utm(s_epsg)
        x, y = utm_inverse(x, y, zone, north)
    if t_epsg == 4326:
        return np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
    zone, north = epsg_to_utm(t_epsg)
    return utm_forward(x, y, zone, north)


def meridian_arc(lat_deg: float, steps: int = 200001) -> float:
    """Meridian arc length from the equator by numerical quadrature —
    an independent check of the series (tests only; Simpson over the
    closed-form integrand)."""
    e2 = _F * (2 - _F)
    phi = np.linspace(0.0, np.radians(lat_deg), steps)
    integrand = _A * (1 - e2) / np.power(1 - e2 * np.sin(phi) ** 2, 1.5)
    h = phi[1] - phi[0]
    weights = np.ones(steps)
    weights[1:-1:2] = 4.0
    weights[2:-1:2] = 2.0
    return float((integrand * weights).sum() * h / 3.0)
