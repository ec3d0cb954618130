"""Hilbert curve encoding — the Z-order sibling with strictly better
locality (every consecutive pair of curve positions is grid-adjacent;
Morton's Z jumps break that at every power-of-two boundary).

The planar (non-face) Hilbert key completes the layout-key family:
``functions/morton.py`` (Z-order, points), ``functions/s2cells.py``
(Hilbert on cube faces, cell ids). Same 16-bit quantization law as
Morton so the two keys are comparable on identical grids. Pure integer
arithmetic — the SQL twin replays the standard xy2d rotation loop as 16
unrolled MATERIALIZED rounds (single-reference CTE inlining would nest
the x/y expressions exponentially).

Algorithm: the public-domain xy2d/d2xy pair (Wikipedia "Hilbert curve"
rendering of the 1991 Butz/Lam-Shapiro iteration), vectorized.
"""

from __future__ import annotations

import numpy as np

from pyrosar_ray.functions.morton import quantize_lonlat

_BITS = 16


def hilbert_xy2d(x: np.ndarray, y: np.ndarray, bits: int = _BITS) -> np.ndarray:
    """(x, y) 16-bit grid coords → Hilbert position d in [0, 4^bits)."""
    x = x.astype(np.int64).copy()
    y = y.astype(np.int64).copy()
    d = np.zeros(len(x), dtype=np.int64)
    s = 1 << (bits - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # drop the consumed bit BEFORE rotating: coords stay in [0, s),
        # so the reflection never goes negative — equivalent to the
        # classic full-width form (verified exhaustively) and the only
        # form whose //-and-% twin is exact in SQL, where negative
        # operands floor/truncate differently from two's-complement
        x &= s - 1
        y &= s - 1
        # rotate quadrant: if ry==0 {if rx==1 reflect; swap x,y}
        refl = (ry == 0) & (rx == 1)
        xr = np.where(refl, s - 1 - x, x)
        yr = np.where(refl, s - 1 - y, y)
        swap = ry == 0
        x = np.where(swap, yr, xr)
        y = np.where(swap, xr, yr)
        s >>= 1
    return d


def hilbert_d2xy(d: np.ndarray, bits: int = _BITS) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`hilbert_xy2d` (test harness + range planning)."""
    t = d.astype(np.int64).copy()
    x = np.zeros(len(t), dtype=np.int64)
    y = np.zeros(len(t), dtype=np.int64)
    s = 1
    while s < (1 << bits):
        rx = (t // 2) & 1
        ry = (t ^ rx) & 1
        # inverse rotate
        refl = (ry == 0) & (rx == 1)
        xr = np.where(refl, s - 1 - x, x)
        yr = np.where(refl, s - 1 - y, y)
        swap = ry == 0
        x, y = np.where(swap, yr, xr), np.where(swap, xr, yr)
        x += s * rx
        y += s * ry
        t //= 4
        s *= 2
    return x, y


def hilbert_key(lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
    """32-bit Hilbert layout key from degrees (Morton's quantization)."""
    x, y = quantize_lonlat(lon, lat)
    return hilbert_xy2d(x, y)


def hilbert_rounds_sql(bits: int = _BITS) -> str:
    """The xy2d loop as chained MATERIALIZED CTE rounds (DuckDB).

    Expects a CTE ``h0(point_id, x, y, d)`` with the quantized coords
    and d=0; emits rounds ``h1..h{bits}`` whose final ``d`` is the key.
    """
    parts = []
    for r in range(1, bits + 1):
        s = 1 << (bits - r)
        parts.append(
            f"""h{r} AS MATERIALIZED (
                SELECT point_id,
                       d + {s * s}::BIGINT * (CASE
                           WHEN rx = 1 AND ry = 0 THEN 3
                           WHEN rx = 1 AND ry = 1 THEN 2
                           WHEN rx = 0 AND ry = 1 THEN 1
                           ELSE 0 END) AS d,
                       CASE WHEN ry = 0 AND rx = 1 THEN {s - 1} - y
                            WHEN ry = 0 THEN y ELSE x END AS x,
                       CASE WHEN ry = 0 AND rx = 1 THEN {s - 1} - x
                            WHEN ry = 0 THEN x ELSE y END AS y
                FROM (
                    SELECT point_id, d,
                           x % {s} AS x, y % {s} AS y,
                           ((x // {s}) % 2) AS rx,
                           ((y // {s}) % 2) AS ry
                    FROM h{r - 1}
                )
            )"""
        )
    return ",\n".join(parts)
