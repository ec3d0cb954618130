"""Geoid-undulation grid + vertical datum shift — the engine twin of the
reference's EGM lookup application.

The reference converts geoid (orthometric) DEM heights to WGS84 ellipsoid
heights by handing ``gdalwarp`` a compound source SRS (``EPSG:4326+5773``
for EGM96, ``+3855`` for EGM2008) and downloading PROJ's vertical shift
grid (``us_nga_egm96_15.tif`` / ``us_nga_egm08_25.tif``) via
``get_egm_lookup`` (reference auxdata.py:420-436, 1626-1713). PROJ then
adds the bilinearly-interpolated undulation N(lat, lon) to every source
height: ``h_ellipsoid = H_orthometric + N``.

The engine reproduces exactly that application step: :class:`GeoidGrid`
holds a global undulation grid and answers bilinear lookups (lon wrap at
the antimeridian, lat clamped at the poles — the same edge behavior as
PROJ's grid reader), and ``dem_create(geoid_convert=True)`` adds the
undulation at every source pixel center before the warp. The real NGA
grids are not shipped in this sandbox (they require network download,
like the reference), so :meth:`GeoidGrid.synthetic` provides a
deterministic low-order-harmonic stand-in with EGM-scale amplitudes;
production users load the real grid into a :class:`GeoidGrid` the same
way — the application math is identical either way.
"""

from __future__ import annotations

import numpy as np

#: geoid model → vertical EPSG (reference auxdata.py:421-423)
GEOID_EPSG = {"EGM96": 5773, "EGM2008": 3855}

#: synthetic low-order harmonic coefficients per model — deterministic,
#: EGM-scale (real undulations span about -107..+85 m); the two models
#: differ so tests can pin that the model choice matters.
_SYNTH_COEFF = {
    "EGM96": (9.8, 6.2, 3.1, -1.7),
    "EGM2008": (9.6, 6.5, 2.9, -1.4),
}


class GeoidGrid:
    """Regular global lat/lon undulation grid with bilinear lookup.

    ``grid[0, 0]`` sits at ``(lat0, lon0)`` (north-west corner node),
    rows advance south by ``dlat``, columns east by ``dlon``. The grid
    is node-registered and global: longitude wraps modulo 360 and
    latitude clamps at the poles, so every (lat, lon) has a defined
    undulation — matching PROJ's handling of the NGA shift grids.
    """

    def __init__(
        self,
        grid: np.ndarray,
        lat0: float = 90.0,
        lon0: float = -180.0,
        dlat: float | None = None,
        dlon: float | None = None,
    ):
        self.grid = np.asarray(grid, dtype=np.float64)
        if self.grid.ndim != 2 or min(self.grid.shape) < 2:
            raise ValueError("geoid grid must be 2-D with at least 2 nodes per axis")
        rows, cols = self.grid.shape
        self.lat0 = float(lat0)
        self.lon0 = float(lon0)
        # node-registered: rows-1 intervals span 180°, cols intervals 360°
        # (the last column wraps onto the first)
        self.dlat = float(dlat) if dlat is not None else 180.0 / (rows - 1)
        self.dlon = float(dlon) if dlon is not None else 360.0 / cols

    @classmethod
    def synthetic(cls, geoid: str = "EGM96", step: float = 0.25) -> "GeoidGrid":
        """Deterministic EGM-style grid from a low-order harmonic field.

        ``N(φ, λ) = a·sin2φ·cosλ + b·cosφ·sin2λ + c·sin(3φ+λ) + d`` with
        per-model coefficients — smooth, global, zero-mean-ish, and
        entirely reproducible (no RNG), so golden tests can pin exact
        values. ``step`` is the grid spacing in degrees (the real EGM96
        grid is 15 minutes = 0.25°).
        """
        if geoid not in _SYNTH_COEFF:
            raise RuntimeError("geoid model not yet supported")
        a, b, c, d = _SYNTH_COEFF[geoid]
        lats = np.arange(90.0, -90.0 - step / 2, -step)
        lons = np.arange(-180.0, 180.0, step)
        phi = np.deg2rad(lats)[:, None]
        lam = np.deg2rad(lons)[None, :]
        grid = (
            a * np.sin(2 * phi) * np.cos(lam)
            + b * np.cos(phi) * np.sin(2 * lam)
            + c * np.sin(3 * phi + lam)
            + d
        )
        return cls(grid, lat0=90.0, lon0=-180.0, dlat=step, dlon=step)

    def undulation(self, lat, lon) -> np.ndarray:
        """Bilinear undulation N at (lat, lon), vectorized and
        broadcast; lon wraps modulo 360, lat clamps to [-90, 90]."""
        lat = np.clip(np.asarray(lat, dtype=np.float64), -90.0, 90.0)
        lon = np.asarray(lon, dtype=np.float64)
        lat, lon = np.broadcast_arrays(lat, lon)
        rows, cols = self.grid.shape

        fy = (self.lat0 - lat) / self.dlat
        fx = (lon - self.lon0) / self.dlon % cols  # wrap the antimeridian
        r0 = np.floor(fy).astype(np.int64)
        c0 = np.floor(fx).astype(np.int64)
        wy = fy - r0
        wx = fx - c0
        r0 = np.clip(r0, 0, rows - 1)
        r1 = np.clip(r0 + 1, 0, rows - 1)
        c0 %= cols
        c1 = (c0 + 1) % cols  # east neighbor of the last column is column 0
        g = self.grid
        return (
            g[r0, c0] * (1 - wx) * (1 - wy)
            + g[r0, c1] * wx * (1 - wy)
            + g[r1, c0] * (1 - wx) * wy
            + g[r1, c1] * wx * wy
        )

    def apply(
        self,
        heights: np.ndarray,
        geotransform: tuple[float, float, float, float, float, float],
        nodata: float | None = None,
    ) -> np.ndarray:
        """Geoid → ellipsoid: add N at every pixel center of a north-up
        grid; nodata (and NaN) cells pass through untouched."""
        src = np.asarray(heights, dtype=np.float64)
        h, w = src.shape
        ulx, xres, _, uly, _, yres_neg = (float(v) for v in geotransform)
        lons = ulx + (np.arange(w, dtype=np.float64) + 0.5) * xres
        lats = uly + (np.arange(h, dtype=np.float64) + 0.5) * yres_neg
        n = self.undulation(lats[:, None], lons[None, :])
        valid = ~np.isnan(src)
        if nodata is not None:
            valid &= src != float(nodata)
        return np.where(valid, src + n, src)
