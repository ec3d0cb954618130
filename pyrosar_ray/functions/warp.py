"""GDAL-free affine raster resampling (engine twin of ``dem_create``).

The reference's ``dem_create`` (``/root/reference/pyroSAR/auxdata.py:274``)
is a ``gdal.Warp`` wrapper with three defaults that matter for parity:
``resampleAlg='bilinear'``, ``targetAlignedPixels=True`` and nodata
propagation from the source. GDAL is absent in this environment, so the
same semantics are implemented as numpy kernels over in-memory grids:

- :func:`aligned_bounds` — the TAP snap: output bounds become multiples
  of the target resolution (gdalwarp ``-tap``).
- :func:`warp_affine` — regrid a single-band array from its
  geotransform onto a target grid, ``near`` or ``bilinear``, with
  nodata-aware masking (a bilinear neighborhood touching nodata yields
  nodata, matching gdalwarp's UNIFIED_SRC_NODATA behavior for DEMs).

- :func:`warp_reproject` — the ``-t_srs`` path: EPSG:4326 ↔ UTM
  reprojection through the pure-numpy Krüger transforms in
  functions/crs.py (no PROJ), same resampling/nodata semantics.

Kernels are fully vectorized: one ``meshgrid``-free index computation
per output grid, no per-pixel Python.
"""

from __future__ import annotations

from math import ceil, floor

import numpy as np


def aligned_bounds(
    xmin: float, ymin: float, xmax: float, ymax: float, xres: float, yres: float
) -> tuple[float, float, float, float]:
    """Snap bounds outward to multiples of the resolution (gdalwarp -tap)."""
    return (
        floor(xmin / xres) * xres,
        floor(ymin / yres) * yres,
        ceil(xmax / xres) * xres,
        ceil(ymax / yres) * yres,
    )


def grid_shape(
    xmin: float, ymin: float, xmax: float, ymax: float, xres: float, yres: float
) -> tuple[int, int]:
    """(rows, cols) of the target grid (bounds assumed res-aligned)."""
    return int(round((ymax - ymin) / yres)), int(round((xmax - xmin) / xres))


def warp_affine(
    data: np.ndarray,
    geotransform: tuple[float, float, float, float, float, float],
    dst_bounds: tuple[float, float, float, float],
    tr: tuple[float, float],
    nodata: float | None = None,
    resample: str = "bilinear",
    tap: bool = True,
    dtype=None,
) -> tuple[np.ndarray, tuple[float, float, float, float, float, float]]:
    """Resample one band onto a new grid; returns (array, geotransform).

    ``geotransform`` is the GDAL 6-tuple (ulx, xres, 0, uly, 0, -yres);
    rotation terms must be zero (the DEM path never rotates). Output
    pixel centers are sampled in the source's pixel space; ``bilinear``
    blends the 4 neighbors with nodata masking, ``near`` picks the
    closest. Pixels outside the source, or whose bilinear support
    includes nodata, are set to ``nodata`` (or NaN when none given).
    """
    if geotransform[2] != 0 or geotransform[4] != 0:
        raise ValueError("rotated geotransforms are not supported")
    ulx, sxres, _, uly, _, syres_neg = (float(v) for v in geotransform)
    syres = -syres_neg
    if syres <= 0 or sxres <= 0:
        raise ValueError("source must be north-up with positive resolution")
    xres, yres = float(tr[0]), float(tr[1])
    xmin, ymin, xmax, ymax = (float(v) for v in dst_bounds)
    if tap:
        xmin, ymin, xmax, ymax = aligned_bounds(xmin, ymin, xmax, ymax, xres, yres)
    rows, cols = grid_shape(xmin, ymin, xmax, ymax, xres, yres)
    src = np.asarray(data, dtype=np.float64)
    h, w = src.shape
    fill = np.nan if nodata is None else float(nodata)

    # output pixel centers → fractional source pixel coordinates
    xs = xmin + (np.arange(cols, dtype=np.float64) + 0.5) * xres
    ys = ymax - (np.arange(rows, dtype=np.float64) + 0.5) * yres
    fx = (xs - ulx) / sxres - 0.5  # source col coordinate of dst centers
    fy = (uly - ys) / syres - 0.5

    valid_src = ~np.isnan(src)
    if nodata is not None:
        valid_src &= src != float(nodata)

    if resample == "near":
        ci = np.round(fx).astype(np.int64)
        ri = np.round(fy).astype(np.int64)
        inside = (ci >= 0) & (ci < w)
        inside_r = (ri >= 0) & (ri < h)
        ci_c = np.clip(ci, 0, w - 1)
        ri_c = np.clip(ri, 0, h - 1)
        out = src[np.ix_(ri_c, ci_c)]
        ok = valid_src[np.ix_(ri_c, ci_c)] & inside_r[:, None] & inside[None, :]
        out = np.where(ok, out, fill)
    elif resample == "bilinear":
        c0 = np.floor(fx).astype(np.int64)
        r0 = np.floor(fy).astype(np.int64)
        wx = fx - c0
        wy = fy - r0
        c0c = np.clip(c0, 0, w - 1)
        c1c = np.clip(c0 + 1, 0, w - 1)
        r0c = np.clip(r0, 0, h - 1)
        r1c = np.clip(r0 + 1, 0, h - 1)
        v00 = src[np.ix_(r0c, c0c)]
        v01 = src[np.ix_(r0c, c1c)]
        v10 = src[np.ix_(r1c, c0c)]
        v11 = src[np.ix_(r1c, c1c)]
        wxg = wx[None, :]
        wyg = wy[:, None]
        out = (
            v00 * (1 - wxg) * (1 - wyg)
            + v01 * wxg * (1 - wyg)
            + v10 * (1 - wxg) * wyg
            + v11 * wxg * wyg
        )
        ok = (
            valid_src[np.ix_(r0c, c0c)]
            & valid_src[np.ix_(r0c, c1c)]
            & valid_src[np.ix_(r1c, c0c)]
            & valid_src[np.ix_(r1c, c1c)]
        )
        inside = (fx >= -0.5) & (fx <= w - 0.5)
        inside_r = (fy >= -0.5) & (fy <= h - 0.5)
        ok &= inside_r[:, None] & inside[None, :]
        out = np.where(ok, out, fill)
    else:
        raise ValueError(f"unsupported resampleAlg: {resample!r}")

    if dtype is not None:
        if np.issubdtype(np.dtype(dtype), np.integer):
            out = np.round(out)
            out = np.where(np.isnan(out), fill if not np.isnan(fill) else 0, out)
        out = out.astype(dtype)
    out_gt = (xmin, xres, 0.0, ymax, 0.0, -yres)
    return out, out_gt


def warp_reproject(
    data: np.ndarray,
    geotransform: tuple[float, float, float, float, float, float],
    s_srs,
    t_srs,
    tr: tuple[float, float],
    dst_bounds: tuple[float, float, float, float] | None = None,
    nodata: float | None = None,
    resample: str = "bilinear",
    tap: bool = True,
    dtype=None,
) -> tuple[np.ndarray, tuple[float, float, float, float, float, float]]:
    """Reprojecting warp between EPSG:4326 and UTM zones (pure numpy).

    The ``gdalwarp -t_srs`` twin the plain affine kernel could not
    cover: destination pixel centers are inverse-transformed to the
    source CRS (functions/crs.py Krüger series) and sampled with the
    same nodata-aware near/bilinear gather as :func:`warp_affine`.
    ``dst_bounds`` (in the TARGET CRS) default to the transformed
    source corners' envelope, densified along the edges so curved
    zone boundaries are covered.
    """
    from .crs import transform_points

    if geotransform[2] != 0 or geotransform[4] != 0:
        raise ValueError("rotated geotransforms are not supported")
    ulx, sxres, _, uly, _, syres_neg = (float(v) for v in geotransform)
    syres = -syres_neg
    src = np.asarray(data, dtype=np.float64)
    h, w = src.shape
    xres, yres = float(tr[0]), float(tr[1])

    if dst_bounds is None:
        # densified source boundary → target envelope
        edge = np.linspace(0.0, 1.0, 65)
        bx = np.concatenate([edge, np.ones_like(edge), edge[::-1], np.zeros_like(edge)])
        by = np.concatenate([np.zeros_like(edge), edge, np.ones_like(edge), edge[::-1]])
        sx = ulx + bx * (w * sxres)
        sy = uly - by * (h * syres)
        tx, ty = transform_points(sx, sy, s_srs, t_srs)
        dst_bounds = (tx.min(), ty.min(), tx.max(), ty.max())
    xmin, ymin, xmax, ymax = (float(v) for v in dst_bounds)
    if tap:
        xmin, ymin, xmax, ymax = aligned_bounds(xmin, ymin, xmax, ymax, xres, yres)
    rows, cols = grid_shape(xmin, ymin, xmax, ymax, xres, yres)
    fill = np.nan if nodata is None else float(nodata)

    # dst pixel centers → source CRS → fractional source pixels
    xs = xmin + (np.arange(cols, dtype=np.float64) + 0.5) * xres
    ys = ymax - (np.arange(rows, dtype=np.float64) + 0.5) * yres
    gx, gy = np.meshgrid(xs, ys)
    sxx, syy = transform_points(gx.ravel(), gy.ravel(), t_srs, s_srs)
    fx = ((sxx - ulx) / sxres - 0.5).reshape(rows, cols)
    fy = ((uly - syy) / syres - 0.5).reshape(rows, cols)

    valid_src = ~np.isnan(src)
    if nodata is not None:
        valid_src &= src != float(nodata)

    if resample == "near":
        ci = np.clip(np.round(fx).astype(np.int64), 0, w - 1)
        ri = np.clip(np.round(fy).astype(np.int64), 0, h - 1)
        out = src[ri, ci]
        ok = valid_src[ri, ci]
        ok &= (fx >= -0.5) & (fx <= w - 0.5) & (fy >= -0.5) & (fy <= h - 0.5)
        out = np.where(ok, out, fill)
    elif resample == "bilinear":
        c0 = np.floor(fx).astype(np.int64)
        r0 = np.floor(fy).astype(np.int64)
        wx = fx - c0
        wy = fy - r0
        c0c = np.clip(c0, 0, w - 1)
        c1c = np.clip(c0 + 1, 0, w - 1)
        r0c = np.clip(r0, 0, h - 1)
        r1c = np.clip(r0 + 1, 0, h - 1)
        out = (
            src[r0c, c0c] * (1 - wx) * (1 - wy)
            + src[r0c, c1c] * wx * (1 - wy)
            + src[r1c, c0c] * (1 - wx) * wy
            + src[r1c, c1c] * wx * wy
        )
        ok = (
            valid_src[r0c, c0c] & valid_src[r0c, c1c]
            & valid_src[r1c, c0c] & valid_src[r1c, c1c]
        )
        ok &= (fx >= -0.5) & (fx <= w - 0.5) & (fy >= -0.5) & (fy <= h - 0.5)
        out = np.where(ok, out, fill)
    else:
        raise ValueError(f"unsupported resampleAlg: {resample!r}")

    if dtype is not None:
        if np.issubdtype(np.dtype(dtype), np.integer):
            out = np.round(out)
            out = np.where(np.isnan(out), fill if not np.isnan(fill) else 0, out)
        out = out.astype(dtype)
    return out, (xmin, xres, 0.0, ymax, 0.0, -yres)


# --------------------------------------------------------- dem_create twin

# GDAL dtype spellings (spatialist.raster.Dtype accepts both GDAL and
# numpy notations; reference auxdata.py:334-336)
_GDAL_DTYPES = {
    "Byte": np.uint8,
    "Int8": np.int8,
    "Int16": np.int16,
    "UInt16": np.uint16,
    "Int32": np.int32,
    "UInt32": np.uint32,
    "Int64": np.int64,
    "UInt64": np.uint64,
    "Float32": np.float32,
    "Float64": np.float64,
}


def parse_dtype(dtype):
    """GDAL ('Float32') or numpy ('int8') dtype spelling → numpy dtype.

    Twin of ``spatialist.raster.Dtype`` as used by the reference's
    ``dem_create`` (auxdata.py:351-352).
    """
    if dtype is None:
        return None
    if isinstance(dtype, str) and dtype in _GDAL_DTYPES:
        return np.dtype(_GDAL_DTYPES[dtype])
    try:
        return np.dtype(dtype)
    except TypeError:
        raise ValueError(f"unsupported dtype: {dtype!r}")


def _validate_threads(threads) -> bool:
    """The reference's ``threads`` → ``multithread`` validation with its
    exact error surfaces (auxdata.py:369-386)."""
    if isinstance(threads, str):
        if threads != "ALL_CPUS":
            raise ValueError(f"unsupported value for 'threads': '{threads}'")
        return True
    if isinstance(threads, bool):
        raise TypeError(f"'threads' must be of type int, str or None. Is: {type(threads)}")
    if isinstance(threads, int):
        if threads < 1:
            raise ValueError("if 'threads' is of type int, it must be >= 1")
        return threads > 1
    if threads is None:
        return True
    raise TypeError(f"'threads' must be of type int, str or None. Is: {type(threads)}")


_DEM_CREATE_LOCKED = (
    "xRes", "yRes", "srcSRS", "dstSRS", "srcNodata",
    "dstNodata", "outputType", "multithread",
)

_GEOID_EPSG = {"EGM96": 5773, "EGM2008": 3855}


def dem_create(
    data: np.ndarray,
    geotransform: tuple[float, float, float, float, float, float],
    s_srs="EPSG:4326",
    t_srs=None,
    tr: tuple[float, float] | None = None,
    threads=None,
    geoid_convert: bool = False,
    geoid: str = "EGM96",
    geoid_grid=None,
    nodata: float | None = None,
    resampleAlg: str = "bilinear",
    dtype=None,
    **kwargs,
):
    """Engine twin of the reference's ``dem_create`` over in-memory
    grids (auxdata.py:274-462): same defaults (bilinear, TAP, nodata
    propagation), same argument validation and error surfaces, GDAL
    replaced by the numpy warp kernels.

    Returns ``(array, geotransform, epsg_out)`` instead of writing a
    GeoTIFF — the raster sink (stages/raster_sink.py) owns files.

    ``geoid_convert`` is the compound-CRS vertical shift the reference
    spells ``srcSRS='EPSG:4326+5773'`` + PROJ's NGA grid
    (auxdata.py:420-436): the undulation N(lat, lon) is added at every
    valid source pixel center BEFORE the warp. ``geoid_grid`` takes a
    :class:`~pyrosar_ray.functions.geoid.GeoidGrid` (load the real
    ``us_nga_egm96_15.tif`` there in production); when ``None`` the
    deterministic synthetic EGM-style grid stands in, since the real
    grid needs the network exactly like the reference's
    ``get_egm_lookup``.
    """
    from .crs import parse_epsg
    from .geoid import GeoidGrid

    for key in kwargs:
        if key in _DEM_CREATE_LOCKED:
            raise RuntimeError(
                f"argument '{key}' cannot be set via kwargs as it is set internally."
            )
    _validate_threads(threads)

    epsg_in = parse_epsg(s_srs)
    epsg_out = epsg_in if t_srs is None else parse_epsg(t_srs)

    src = np.asarray(data)
    if geoid_convert:
        if geoid not in _GEOID_EPSG:
            raise RuntimeError("geoid model not yet supported")
        if geoid_grid is None:
            geoid_grid = GeoidGrid.synthetic(geoid)
        src = geoid_grid.apply(src, geotransform, nodata=nodata)
    if tr is None:
        tr = (abs(float(geotransform[1])), abs(float(geotransform[5])))
    np_dtype = parse_dtype(dtype)

    if epsg_out == epsg_in:
        h, w = src.shape
        bounds = (
            geotransform[0],
            geotransform[3] + geotransform[5] * h,
            geotransform[0] + geotransform[1] * w,
            geotransform[3],
        )
        out, out_gt = warp_affine(
            src, geotransform, bounds, tr,
            nodata=nodata, resample=resampleAlg, tap=True, dtype=np_dtype,
        )
    else:
        out, out_gt = warp_reproject(
            src, geotransform, f"EPSG:{epsg_in}", f"EPSG:{epsg_out}", tr,
            nodata=nodata, resample=resampleAlg, tap=True, dtype=np_dtype,
        )
    return out, out_gt, epsg_out
