"""Hilbert curve encoding (functions/hilbert.py)."""

from __future__ import annotations

import numpy as np

from pyrosar_ray.functions.hilbert import (
    hilbert_d2xy,
    hilbert_key,
    hilbert_xy2d,
)
from pyrosar_ray.functions.morton import morton_key, quantize_lonlat


def test_order2_golden():
    # n=2 curve: (0,0) -> (1,0) -> (1,1) -> (0,1) is d=0,3,2,1 in the
    # standard orientation (d=1 at (0,1), d=3 at (1,0))
    x = np.array([0, 0, 1, 1])
    y = np.array([0, 1, 0, 1])
    d = hilbert_xy2d(x, y, bits=1)
    assert sorted(d.tolist()) == [0, 1, 2, 3]
    # curve is connected: positions 0..3 visit grid-adjacent cells
    xs, ys = hilbert_d2xy(np.arange(4), bits=1)
    steps = np.abs(np.diff(xs)) + np.abs(np.diff(ys))
    assert (steps == 1).all()


def test_round_trip_random():
    rng = np.random.default_rng(3)
    x = rng.integers(0, 1 << 16, 5000)
    y = rng.integers(0, 1 << 16, 5000)
    d = hilbert_xy2d(x, y)
    x2, y2 = hilbert_d2xy(d)
    assert (x2 == x).all() and (y2 == y).all()
    assert d.min() >= 0 and d.max() < (1 << 32)


def test_consecutive_positions_always_adjacent():
    """THE Hilbert property: |Δx|+|Δy| == 1 for every consecutive pair
    of curve positions — checked across power-of-two boundaries where
    Morton's Z-jumps are worst."""
    starts = np.array([0, 4**8 - 8, 4**12 - 8, 4**15 - 8, (1 << 32) - 16])
    for s in starts:
        d = np.arange(s, min(s + 16, 1 << 32))
        x, y = hilbert_d2xy(d)
        steps = np.abs(np.diff(x)) + np.abs(np.diff(y))
        assert (steps == 1).all(), f"non-adjacent step at d={s}"


def test_locality_beats_morton():
    """The layout advantage lives in the KEY→CELL direction: a range
    scan reads consecutive keys, and consecutive Hilbert keys are
    ALWAYS grid-adjacent (step distance ≡ 1) while consecutive Morton
    keys Z-jump (mean step > 1, power-of-two boundary jumps huge) — so
    a Hilbert-clustered file range covers a compact region."""

    def _morton_d2xy(z):
        # compact the even/odd bits back out (inverse of _spread)
        def compact(v):
            v = v.astype(np.uint64) & np.uint64(0x5555555555555555)
            v = (v | (v >> np.uint64(1))) & np.uint64(0x3333333333333333)
            v = (v | (v >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
            v = (v | (v >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
            v = (v | (v >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
            return v.astype(np.int64)

        z = z.astype(np.uint64)
        return compact(z), compact(z >> np.uint64(1))

    rng = np.random.default_rng(11)
    starts = rng.integers(0, (1 << 32) - 512, 64)
    h_steps, z_steps = [], []
    for s in starts:
        d = np.arange(s, s + 512)
        hx, hy = hilbert_d2xy(d)
        h_steps.append(np.abs(np.diff(hx)) + np.abs(np.diff(hy)))
        zx, zy = _morton_d2xy(d)
        z_steps.append(np.abs(np.diff(zx)) + np.abs(np.diff(zy)))
    h_steps = np.concatenate(h_steps)
    z_steps = np.concatenate(z_steps)
    assert (h_steps == 1).all()  # Hilbert: every key step is adjacent
    assert z_steps.mean() > 1.3  # Morton: Z-jumps break adjacency
    assert z_steps.max() > 100


def test_quantization_shared_with_morton():
    lon = np.array([-180.0, 0.0, 179.99])
    lat = np.array([-90.0, 0.0, 89.99])
    k = hilbert_key(lon, lat)
    assert k.dtype == np.int64
    # same quantization law: the keys of identical grid cells agree
    x, y = quantize_lonlat(lon, lat)
    assert (k == hilbert_xy2d(x, y)).all()
