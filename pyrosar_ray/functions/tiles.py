"""Tile-grid grammars — the engine's tile-assignment primitives.

Semantics reproduce the reference exactly (golden-tested):
- SRTM HGT 1° tiles from a bbox: pyroSAR/drivers.py:535-558
  (``N51E011.hgt`` naming; floor-division ranges; zero-padding)
- ``intrange`` stepped integer tie-point ranges: pyroSAR/auxdata.py:667-691
- DEM remote tile IDs per grid family: pyroSAR/auxdata.py:1360-1549
  (SRTM1/Copernicus 1°, GETASSE30 reversed 15°, TDX 10°-lon bins,
  AW3D30 nested 5°-group/1°-tile, SRTM 3Sec inverted 5° CGIAR grid)

All batch kernels are fully vectorized: variable-length per-row tile
expansion uses repeat/offset arithmetic, and tile names come from a
precomputed global 1°-grid name table (64800 entries) via fancy indexing.
"""

from __future__ import annotations

from math import ceil, floor

import numpy as np

# ------------------------------------------------------------ scalar API


def hgt_ranges(xmin: float, xmax: float, ymin: float, ymax: float):
    """Integer tie-point ranges of 1° tiles overlapping a bbox (incl. upper edge)."""
    lat = range(int(floor(ymin)), int(floor(ymax)) + 1)
    lon = range(int(floor(xmin)), int(floor(xmax)) + 1)
    return lat, lon


def format_lat(lat: int, pad: int = 2) -> str:
    return f"{'S' if lat < 0 else 'N'}{abs(lat):0{pad}d}"


def format_lon(lon: int, pad: int = 3) -> str:
    return f"{'W' if lon < 0 else 'E'}{abs(lon):0{pad}d}"


def hgt_tiles(xmin: float, xmax: float, ymin: float, ymax: float) -> list[str]:
    """SRTM HGT tile names overlapping a bbox, e.g. ``['N51E011.hgt']``.

    Order matches the reference: latitudes outer, longitudes inner,
    both ascending.
    """
    lat, lon = hgt_ranges(xmin, xmax, ymin, ymax)
    return [format_lat(y) + format_lon(x) + ".hgt" for y in lat for x in lon]


def intrange(extent: dict, step: int):
    """Stepped integer ranges of DEM tile tie points covering an extent."""
    lat = range(
        floor(float(extent["ymin"]) / step) * step,
        ceil(float(extent["ymax"]) / step) * step,
        step,
    )
    lon = range(
        floor(float(extent["xmin"]) / step) * step,
        ceil(float(extent["xmax"]) / step) * step,
        step,
    )
    return lat, lon


def dem_tile_ids(extent: dict, dem_type: str) -> list[str]:
    """Tile IDs/filenames of a DEM grid family covering ``extent`` (sorted).

    Supported families and their name grammars (validated against the
    reference's golden cases):

    - ``SRTM 1Sec HGT``  → ``N51E011.SRTMGL1.hgt.zip`` (1° tiles)
    - ``Copernicus 30m Global DEM`` → ``Copernicus_DSM_COG_10_N51_00_E011_00_DEM.tif``
    - ``Copernicus 90m Global DEM`` → ``Copernicus_DSM_COG_30_...``
    - ``GETASSE30``      → ``45N000E_GETASSE30.zip`` (15° tiles, reversed order)
    - ``TDX90m``         → ``DEM/N51/E010/TDM1_DEM__30_N51E011.zip`` (10° lon bins)
    - ``AW3D30``         → ``N050E010/N051E011.tar.gz`` (5° group dir, 1° tile)
    - ``SRTM 3Sec``      → ``srtm_39_02.zip`` (5° CGIAR grid, row index
      inverted from 60N, both indices 1-based)

    Ocean/unavailable tiles are the caller's concern (the reference drops
    IDs missing from its remote index); the SRTM 1Sec land mask is applied
    via :func:`srtm1_is_land` when requested by the caller.
    """
    if dem_type in ("SRTM 1Sec HGT", "Copernicus 30m Global DEM", "Copernicus 90m Global DEM"):
        lat, lon = intrange(extent, step=1)
        out = []
        for x in lon:
            for y in lat:
                yf, xf = format_lat(y, 2), format_lon(x, 3)
                if dem_type == "SRTM 1Sec HGT":
                    out.append(f"{yf}{xf}.SRTMGL1.hgt.zip")
                else:
                    res = "10" if "30m" in dem_type else "30"
                    out.append(f"Copernicus_DSM_COG_{res}_{yf}_00_{xf}_00_DEM.tif")
        return sorted(out)
    if dem_type == "GETASSE30":
        lat, lon = intrange(extent, step=15)
        # reversed pattern: digits before hemisphere letter
        return sorted(
            f"{abs(y):02d}{'S' if y < 0 else 'N'}{abs(x):03d}{'W' if x < 0 else 'E'}_GETASSE30.zip"
            for x in lon
            for y in lat
        )
    if dem_type == "TDX90m":
        lat, lon = intrange(extent, step=1)
        out = []
        for x in lon:
            xr = abs(x) // 10 * 10
            for y in lat:
                yf, xf = format_lat(y, 2), format_lon(x, 3)
                out.append(f"DEM/{yf}/{xf[0]}{xr:03d}/TDM1_DEM__30_{yf}{xf}.zip")
        return sorted(out)
    if dem_type == "AW3D30":
        lat, lon = intrange(extent, step=1)
        out = []
        for x in lon:
            for y in lat:
                gy, gx = format_lat(y // 5 * 5, 3), format_lon(x // 5 * 5, 3)
                ty, tx = format_lat(y, 3), format_lon(x, 3)
                out.append(f"{gy}{gx}/{ty}{tx}.tar.gz")
        return sorted(out)
    if dem_type == "SRTM 3Sec":
        lat = range(
            floor((60 - float(extent["ymax"])) / 5) + 1,
            ceil((60 - float(extent["ymin"])) / 5) + 1,
        )
        lon = range(
            floor((float(extent["xmin"]) + 180) / 5) + 1,
            ceil((float(extent["xmax"]) + 180) / 5) + 1,
        )
        return sorted(f"srtm_{x:02d}_{y:02d}.zip" for x in lon for y in lat)
    raise ValueError(f"unknown demType: {dem_type}")


# --------------------------------------------------------- batch kernels

_NAME_TABLE: np.ndarray | None = None


def _name_table() -> np.ndarray:
    """Precomputed SRTM1-style tile names for every 1° cell, indexed by
    (lat+90)*360 + (lon+180)."""
    global _NAME_TABLE
    if _NAME_TABLE is None:
        lats = np.arange(-90, 91)
        lons = np.arange(-180, 181)
        names = np.empty((len(lats), len(lons)), dtype="U7")
        for i, y in enumerate(lats):
            fy = format_lat(int(y))
            for j, x in enumerate(lons):
                names[i, j] = fy + format_lon(int(x))
        _NAME_TABLE = names
    return _NAME_TABLE


def tile_index_1deg(lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
    """1° cell index of points: (floor(lat)+90)*361 + floor(lon)+180."""
    iy = np.floor(np.asarray(lat, dtype=np.float64)).astype(np.int64) + 90
    ix = np.floor(np.asarray(lon, dtype=np.float64)).astype(np.int64) + 180
    return iy * 361 + ix


def tile_name_from_index(idx: np.ndarray) -> np.ndarray:
    """1° cell index → SRTM-style tile name array (``N51E011``)."""
    return _name_table().ravel()[np.asarray(idx, dtype=np.int64)]


def expand_bbox_tiles(
    xmin: np.ndarray, xmax: np.ndarray, ymin: np.ndarray, ymax: np.ndarray
):
    """Vectorized per-row expansion of bboxes to overlapping 1° tiles.

    Returns ``(row_idx, lat, lon)`` int64 arrays: one entry per
    (input row, overlapping tile) pair. Entirely repeat/offset
    arithmetic — no Python loop over rows. Ordering within a row matches
    the reference's getHGT (lat outer ascending, lon inner ascending).
    """
    lat0 = np.floor(np.asarray(ymin, dtype=np.float64)).astype(np.int64)
    lat1 = np.floor(np.asarray(ymax, dtype=np.float64)).astype(np.int64) + 1
    lon0 = np.floor(np.asarray(xmin, dtype=np.float64)).astype(np.int64)
    lon1 = np.floor(np.asarray(xmax, dtype=np.float64)).astype(np.int64) + 1
    nlat = lat1 - lat0
    nlon = lon1 - lon0
    count = nlat * nlon
    if len(count) == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z.copy(), z.copy()
    total = int(count.sum())
    row_idx = np.repeat(np.arange(len(count), dtype=np.int64), count)
    offsets = np.concatenate([[0], np.cumsum(count)[:-1]])
    j = np.arange(total, dtype=np.int64) - np.repeat(offsets, count)
    nlon_r = np.repeat(nlon, count)
    lat = np.repeat(lat0, count) + j // nlon_r
    lon = np.repeat(lon0, count) + j % nlon_r
    return row_idx, lat, lon


def tile_names_1deg(lat: np.ndarray, lon: np.ndarray) -> np.ndarray:
    """Integer tile tie points → ``N51E011`` style names (table lookup)."""
    idx = (np.asarray(lat, dtype=np.int64) + 90) * 361 + (
        np.asarray(lon, dtype=np.int64) + 180
    )
    return _name_table().ravel()[idx]


_MGRS_BANDS = np.array(list("CDEFGHJKLMNPQRSTUVWX"))


def utm_mgrs_zone(lon100: np.ndarray, lat100: np.ndarray):
    """MGRS grid-zone designator from CENTIDEGREE integers (exact).

    Returns ``(zone, band)``: the UTM longitude zone (1-60) and the
    8° latitude band letter C-X (I and O skipped; X spans 72-84°).
    Implements the two standard exceptions — Norway (band V, 3-12°E →
    zone 32) and Svalbard (band X: 0-9→31, 9-21→33, 21-33→35,
    33-42→37). Inputs outside the UTM domain (lat < -80° or ≥ 84°
    except the 84 edge) clamp into the nearest band, matching the
    common library behavior for the polar fringe.

    Pure integer arithmetic — the SQL twin (MGRS_SQL fragment in
    __ray_entry__) reproduces it with CASE + list indexing, so the
    designator is hash-checkable. North-star named surface:
    "MGRS/UTM-style processing tiles".
    """
    lon100 = np.asarray(lon100, dtype=np.int64)
    lat100 = np.asarray(lat100, dtype=np.int64)
    zone = ((lon100 + 18000) // 600) % 60 + 1
    bidx = np.clip((lat100 + 8000) // 800, 0, 19)
    band = _MGRS_BANDS[bidx]
    # Norway: band V widens zone 32 over 3°E..12°E
    nor = (bidx == 17) & (lon100 >= 300) & (lon100 < 1200)
    zone = np.where(nor, 32, zone)
    # Svalbard: band X has no zones 32/34/36
    sva = bidx == 19
    zone = np.where(sva & (lon100 >= 0) & (lon100 < 900), 31, zone)
    zone = np.where(sva & (lon100 >= 900) & (lon100 < 2100), 33, zone)
    zone = np.where(sva & (lon100 >= 2100) & (lon100 < 3300), 35, zone)
    zone = np.where(sva & (lon100 >= 3300) & (lon100 < 4200), 37, zone)
    return zone.astype(np.int64), band
