"""Morton (Z-order) curve encoding — the data-layout locality key.

Interleaving the bits of the quantized (lon, lat) pair gives a 1-D key
whose sort order clusters spatial neighbors into the same output files
(the standard lakehouse Z-ORDER layout optimization; the S2 cell id in
functions/s2cells.py is the Hilbert sibling used for query indexes).
Pure integer arithmetic — the SQL twin reproduces the interleave as an
explicit 32-term bit expression, so the key is hash-checkable.
"""

from __future__ import annotations

import numpy as np

_BITS = 16


def _spread(v: np.ndarray) -> np.ndarray:
    """Spread the low 16 bits of v so bit b lands at position 2b."""
    v = v.astype(np.uint64) & np.uint64(0xFFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x33333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x55555555)
    return v


def quantize_lonlat(lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(lon, lat) degrees → 16-bit grid coordinates (floor, clamped)."""
    scale = float(1 << _BITS)
    x = np.floor((np.asarray(lon, dtype=np.float64) + 180.0) / 360.0 * scale)
    y = np.floor((np.asarray(lat, dtype=np.float64) + 90.0) / 180.0 * scale)
    x = np.clip(x, 0, scale - 1).astype(np.int64)
    y = np.clip(y, 0, scale - 1).astype(np.int64)
    return x, y


def morton_key(lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
    """32-bit Z-order key: lon bits at even positions, lat bits at odd."""
    x, y = quantize_lonlat(lon, lat)
    return (_spread(x) | (_spread(y) << np.uint64(1))).astype(np.int64)


def morton_quantize_sql(lon_expr: str, lat_expr: str, bits: int = _BITS) -> tuple[str, str]:
    """SQL for the identical 16-bit quantization (returns zx, zy exprs)."""
    scale = 1 << bits
    x = (
        f"CAST(least(greatest(FLOOR(({lon_expr} + 180.0) / 360.0 * {scale}.0),"
        f" 0), {scale - 1}) AS BIGINT)"
    )
    y = (
        f"CAST(least(greatest(FLOOR(({lat_expr} + 90.0) / 180.0 * {scale}.0),"
        f" 0), {scale - 1}) AS BIGINT)"
    )
    return x, y


def morton_interleave_sql(zx: str = "zx", zy: str = "zy", bits: int = _BITS) -> str:
    """The identical bit interleave as one SQL term sum (DuckDB)."""
    terms = []
    for b in range(bits):
        terms.append(f"((({zx} >> {b}) & 1) << {2 * b})")
        terms.append(f"((({zy} >> {b}) & 1) << {2 * b + 1})")
    return " + ".join(terms)
