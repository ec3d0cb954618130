"""Raster kernels: morphology, multilook, radiometric maps, LUT interp.

Numpy-only (no scipy/GDAL in this sandbox) implementations of the
reference's per-image compute semantics:

- ``binary_erosion`` — 4/8-connectivity × n pixels, the mask op of
  erode_edges (reference: snap/auxil.py:1457-1587)
- ``multilook`` — block-mean downsample by (rg, az) look factors
  (reference: gamma/util.py:1247-1360 delegates to GAMMA multi_look;
  the array semantics are the plain block mean)
- ``linear_to_db`` / ``db_to_linear`` — 10·log10 maps with nodata
  (reference: gamma/util.py:1150-1177, nodata −99)
- ``band_product`` / ``band_ratio`` — elementwise multiply/divide with
  nodata propagation (reference: gamma/util.py:1179-1246)
- ``interp_lut_2d`` — sparse noise-LUT expansion: linear interpolation
  along rows then columns, the grid step of removeGRDBorderNoise
  (reference: S1/auxil.py:782-795)
- ``border_noise_mask`` — denoise + threshold mask of the border-noise
  removal core (reference: S1/auxil.py:798-802)

All are vectorized and row-local: they run inside map_batches /
actor-pool stages over decoded image arrays.
"""

from __future__ import annotations

import numpy as np


def binary_erosion(mask: np.ndarray, iterations: int = 1, connectivity: int = 4) -> np.ndarray:
    """Erode a boolean mask n times with 4- or 8-connected structure."""
    if connectivity not in (4, 8):
        raise ValueError("connectivity must be 4 or 8")
    out = np.asarray(mask, dtype=bool)
    for _ in range(iterations):
        padded = np.pad(out, 1, mode="constant", constant_values=False)
        center = padded[1:-1, 1:-1]
        up, down = padded[:-2, 1:-1], padded[2:, 1:-1]
        left, right = padded[1:-1, :-2], padded[1:-1, 2:]
        eroded = center & up & down & left & right
        if connectivity == 8:
            eroded &= (
                padded[:-2, :-2] & padded[:-2, 2:] & padded[2:, :-2] & padded[2:, 2:]
            )
        out = eroded
    return out


def erode_edges(bands: np.ndarray, pixels: int = 1, connectivity: int = 4) -> np.ndarray:
    """Zero out ``pixels`` of valid-data edge on every band.

    ``bands``: (n_bands, h, w). Mask = any-band nonzero, eroded, applied
    to all bands (reference applies the backscatter-derived master mask
    to each band, snap/auxil.py:1559-1561).
    """
    bands = np.asarray(bands)
    mask = (bands != 0).any(axis=0)
    mask = binary_erosion(mask, iterations=pixels, connectivity=connectivity)
    return np.where(mask[None, :, :], bands, 0)


def multilook(arr: np.ndarray, rg: int, az: int) -> np.ndarray:
    """Block-mean downsample by (rg looks = columns, az looks = rows)."""
    h, w = arr.shape[:2]
    th, tw = h // az * az, w // rg * rg
    view = arr[:th, :tw].reshape(th // az, az, tw // rg, rg, *arr.shape[2:])
    return view.mean(axis=(1, 3))


NODATA_DB = -99.0


def linear_to_db(arr: np.ndarray, nodata_in: float = 0.0, nodata_out: float = NODATA_DB) -> np.ndarray:
    """10·log10(x); input nodata (and non-positives) → ``nodata_out``."""
    arr = np.asarray(arr, dtype=np.float64)
    valid = (arr > 0) & (arr != nodata_in)
    out = np.full_like(arr, nodata_out)
    out[valid] = 10.0 * np.log10(arr[valid])
    return out


def db_to_linear(arr: np.ndarray, nodata_in: float = NODATA_DB) -> np.ndarray:
    arr = np.asarray(arr, dtype=np.float64)
    out = np.where(arr == nodata_in, 0.0, np.power(10.0, arr / 10.0))
    return out


def band_product(a: np.ndarray, b: np.ndarray, nodata: float = 0.0) -> np.ndarray:
    """Elementwise multiply; rows where either side is nodata stay nodata."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    return np.where((a == nodata) | (b == nodata), nodata, a * b)


def band_ratio(a: np.ndarray, b: np.ndarray, nodata: float = 0.0) -> np.ndarray:
    """Elementwise divide; nodata or zero denominator → nodata."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    bad = (a == nodata) | (b == nodata) | (b == 0)
    safe = np.where(bad, 1.0, b)
    return np.where(bad, nodata, a / safe)


def interp_lut_2d(
    lut_rows: np.ndarray, lut_cols: np.ndarray, lut_vals: np.ndarray, h: int, w: int
) -> np.ndarray:
    """Expand a sparse LUT grid to full (h, w): interp rows then columns.

    ``lut_vals``: (n_rows, n_cols) samples at grid (lut_rows × lut_cols).
    Mirrors the reference's two-pass 1-D linear interpolation order.
    """
    lut_rows = np.asarray(lut_rows, dtype=np.float64)
    lut_cols = np.asarray(lut_cols, dtype=np.float64)
    vals = np.asarray(lut_vals, dtype=np.float64)

    def _weights(grid: np.ndarray, n: int):
        # shared interpolation stencil: target i maps to grid[i0]..grid[i1]
        t = np.arange(n, dtype=np.float64)
        i1 = np.clip(np.searchsorted(grid, t, side="right"), 1, len(grid) - 1)
        i0 = i1 - 1
        span = grid[i1] - grid[i0]
        frac = np.where(span > 0, (t - grid[i0]) / np.where(span > 0, span, 1.0), 0.0)
        frac = np.clip(frac, 0.0, 1.0)
        return i0, i1, frac

    r0, r1, rf = _weights(lut_rows, h)
    rows_full = vals[r0] * (1 - rf)[:, None] + vals[r1] * rf[:, None]  # (h, n_cols)
    c0, c1, cf = _weights(lut_cols, w)
    return rows_full[:, c0] * (1 - cf)[None, :] + rows_full[:, c1] * cf[None, :]


def border_noise_mask(
    intensity: np.ndarray, noise: np.ndarray, scale: float = 1.0, raw_threshold: float = 30.0
) -> np.ndarray:
    """Denoise mask of the border-noise core: keep px where
    I² − noise·scale ≥ 0.5 AND raw I ≥ raw_threshold."""
    power = intensity.astype(np.float64) ** 2 - noise * scale
    return (power >= 0.5) & (intensity >= raw_threshold)
