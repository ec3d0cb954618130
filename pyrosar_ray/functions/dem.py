"""DEM preparation kernels: oversampling factors and great-circle posting.

Mirrors the reference's GAMMA DEM helpers (``gamma/util.py:1362-1400``
``ovs``): given a DEM's pixel posting — either already in meters
(``post_north``/``post_east``) or in degrees (``post_lat``/``post_lon``
converted at the raster's center coordinate via the haversine
great-circle distance) — the oversampling factor per axis is
``posting / target_spacing``.

All kernels are numpy-vectorized so they run per-batch inside
``map_batches`` over thousands of DEM descriptors at once; the scalar
reference semantics fall out at length-1 arrays.
"""

from __future__ import annotations

import numpy as np

# Mean Earth radius used by the public spatialist.haversine the
# reference imports (spatialist/ancillary.py).
_EARTH_RADIUS_M = 6371000.0


def haversine(lat1, lon1, lat2, lon2) -> np.ndarray:
    """Great-circle distance in meters (vectorized, spatialist-compatible)."""
    lat1, lon1, lat2, lon2 = (np.radians(np.asarray(x, dtype=np.float64)) for x in (lat1, lon1, lat2, lon2))
    dlat = lat2 - lat1
    dlon = lon2 - lon1
    a = np.sin(dlat / 2.0) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2.0) ** 2
    return _EARTH_RADIUS_M * 2.0 * np.arcsin(np.sqrt(a))


def ovs_factors(post_north, post_east, spacing) -> tuple[np.ndarray, np.ndarray]:
    """Oversampling factors for a metric-posting DEM (reference ``ovs``,
    ``gamma/util.py:1386-1399``): ``(|post_north|/spacing, |post_east|/spacing)``."""
    pn = np.abs(np.asarray(post_north, dtype=np.float64))
    pe = np.abs(np.asarray(post_east, dtype=np.float64))
    return pn / spacing, pe / spacing


def ovs_from_latlon(
    corner_lat,
    corner_lon,
    post_lat,
    post_lon,
    nlines,
    width,
    spacing,
) -> tuple[np.ndarray, np.ndarray]:
    """Oversampling factors for an equiangular DEM (reference ``ovs``
    degree path, ``gamma/util.py:1388-1399``).

    The degree posting is converted to meters at the raster center:
    ``lat_c = corner_lat - res_lat * (nlines // 2)``,
    ``lon_c = corner_lon + res_lon * (width // 2)``, then
    ``post_north = haversine(lat_c, lon_c, lat_c + res_lat, lon_c)`` and
    ``post_east = haversine(lat_c, lon_c, lat_c, lon_c + res_lon)``.
    """
    res_lat = np.abs(np.asarray(post_lat, dtype=np.float64))
    res_lon = np.abs(np.asarray(post_lon, dtype=np.float64))
    lat_c = np.asarray(corner_lat, dtype=np.float64) - res_lat * (np.asarray(nlines) // 2)
    lon_c = np.asarray(corner_lon, dtype=np.float64) + res_lon * (np.asarray(width) // 2)
    post_north = haversine(lat_c, lon_c, lat_c + res_lat, lon_c)
    post_east = haversine(lat_c, lon_c, lat_c, lon_c + res_lon)
    return ovs_factors(post_north, post_east, spacing)
