"""Discrete-global-grid cell encoding for the spatial-join prefilter.

In production this slot is H3/S2; neither library ships in this sandbox,
so the engine uses an equivalent hierarchical lat/lon grid: at
resolution ``r`` the world is split into 2^r cells per degree (r=0 →
1°x1°, aligned with the SRTM tile grid). Cell ids are int64:

    id = r << 56 | row << 28 | col

where row = floor((lat+90) * 2^r), col = floor((lon+180) * 2^r).
All kernels are vectorized; a bbox/polygon cover is produced with the
same repeat/offset expansion as the tile kernels (no per-row loops).
"""

from __future__ import annotations

import numpy as np

_RES_SHIFT = 56
_ROW_SHIFT = 28


def cell_of_points(lon: np.ndarray, lat: np.ndarray, res: int = 0) -> np.ndarray:
    """Cell id containing each point."""
    scale = float(1 << res)
    row = np.floor((np.asarray(lat, dtype=np.float64) + 90.0) * scale).astype(np.int64)
    col = np.floor((np.asarray(lon, dtype=np.float64) + 180.0) * scale).astype(np.int64)
    return (np.int64(res) << _RES_SHIFT) | (row << _ROW_SHIFT) | col


def cell_cover_bbox(
    xmin: np.ndarray, ymin: np.ndarray, xmax: np.ndarray, ymax: np.ndarray, res: int = 0
):
    """Cells overlapped by each bbox → ``(row_idx, cell_id)`` arrays.

    row_idx maps each emitted cell back to its input row (for flat_map
    style expansion inside map_batches).
    """
    scale = float(1 << res)
    r0 = np.floor((np.asarray(ymin, dtype=np.float64) + 90.0) * scale).astype(np.int64)
    r1 = np.floor((np.asarray(ymax, dtype=np.float64) + 90.0) * scale).astype(np.int64)
    c0 = np.floor((np.asarray(xmin, dtype=np.float64) + 180.0) * scale).astype(np.int64)
    c1 = np.floor((np.asarray(xmax, dtype=np.float64) + 180.0) * scale).astype(np.int64)
    nrow = r1 - r0 + 1
    ncol = c1 - c0 + 1
    count = nrow * ncol
    if len(count) == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z.copy()
    total = int(count.sum())
    row_idx = np.repeat(np.arange(len(count), dtype=np.int64), count)
    offsets = np.concatenate([[0], np.cumsum(count)[:-1]])
    j = np.arange(total, dtype=np.int64) - np.repeat(offsets, count)
    ncol_r = np.repeat(ncol, count)
    rows = np.repeat(r0, count) + j // ncol_r
    cols = np.repeat(c0, count) + j % ncol_r
    cells = (np.int64(res) << _RES_SHIFT) | (rows << _ROW_SHIFT) | cols
    return row_idx, cells


def cell_bounds(cell: np.ndarray):
    """Cell id → (xmin, ymin, xmax, ymax) arrays."""
    cell = np.asarray(cell, dtype=np.int64)
    res = (cell >> _RES_SHIFT).astype(np.int64)
    row = (cell >> _ROW_SHIFT) & ((1 << (_RES_SHIFT - _ROW_SHIFT)) - 1)
    col = cell & ((1 << _ROW_SHIFT) - 1)
    size = 1.0 / (1 << int(res[0])) if len(res) else 1.0
    ymin = row * size - 90.0
    xmin = col * size - 180.0
    return xmin, ymin, xmin + size, ymin + size
