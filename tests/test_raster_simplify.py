"""Raster kernels + VW simplification (pure numpy, no Ray needed)."""

import numpy as np
import pytest

from pyrosar_ray.functions.raster import (
    band_product,
    band_ratio,
    binary_erosion,
    border_noise_mask,
    db_to_linear,
    erode_edges,
    interp_lut_2d,
    linear_to_db,
    multilook,
)
from pyrosar_ray.functions.simplify import VWSimplifier, reduce_line


def test_binary_erosion_4_vs_8():
    mask = np.ones((5, 5), dtype=bool)
    mask[0, 0] = False
    e4 = binary_erosion(mask, 1, 4)
    e8 = binary_erosion(mask, 1, 8)
    # border always eroded; the corner hole eats (1,1) only under 8-conn
    assert e4[1, 1] and not e8[1, 1]
    assert e4[2, 2] and e8[2, 2]
    assert not e4[0].any() and not e4[:, 0].any()


def test_erode_edges_applies_master_mask_to_all_bands():
    bands = np.zeros((2, 6, 6))
    bands[0, 1:5, 1:5] = 1.0
    bands[1, 1:5, 1:5] = 2.0
    out = erode_edges(bands, pixels=1)
    assert out[0, 2:4, 2:4].all() and out[1, 2:4, 2:4].all()
    assert out[:, 1, :].sum() == 0  # one-pixel rim removed on both bands


def test_multilook_block_mean():
    arr = np.arange(24, dtype=float).reshape(4, 6)
    out = multilook(arr, rg=3, az=2)
    assert out.shape == (2, 2)
    assert out[0, 0] == np.mean([0, 1, 2, 6, 7, 8])


def test_db_roundtrip():
    x = np.array([[1.0, 100.0, 0.0]])
    db = linear_to_db(x)
    assert db[0, 0] == 0.0 and db[0, 1] == 20.0 and db[0, 2] == -99.0
    back = db_to_linear(db)
    assert back[0, 0] == 1.0 and back[0, 1] == 100.0 and back[0, 2] == 0.0


def test_band_product_ratio_nodata():
    a = np.array([2.0, 0.0, 4.0])
    b = np.array([3.0, 5.0, 0.0])
    assert band_product(a, b).tolist() == [6.0, 0.0, 0.0]
    assert band_ratio(a, b).tolist() == [2.0 / 3.0, 0.0, 0.0]


def test_interp_lut_2d_matches_np_interp():
    rows = np.array([0.0, 4.0])
    cols = np.array([0.0, 3.0, 6.0])
    vals = np.array([[0.0, 3.0, 6.0], [8.0, 11.0, 14.0]])
    out = interp_lut_2d(rows, cols, vals, h=5, w=7)
    assert out.shape == (5, 7)
    assert out[0, 0] == 0.0 and out[4, 0] == 8.0
    assert out[2, 3] == pytest.approx((3.0 + 11.0) / 2)
    assert out[0, 1] == pytest.approx(1.0)  # linear along the first row


def test_border_noise_mask():
    intensity = np.array([[100.0, 100.0, 10.0]])
    noise = np.array([[0.0, 100.0 ** 2, 0.0]])
    m = border_noise_mask(intensity, noise)
    assert m.tolist() == [[True, False, False]]


def test_vw_keeps_salient_vertices():
    # a square wave: corners are salient, midpoints are not
    pts = np.array(
        [[0, 0], [1, 0.01], [2, 0], [3, 5], [4, 5.01], [5, 5], [6, 0], [7, 0.01], [8, 0]],
        dtype=float,
    )
    s = VWSimplifier(pts)
    out = s.from_number(5)
    assert len(out) == 5
    assert [0, 0] in out.tolist() and [8, 0] in out.tolist()
    assert [3, 5] in out.tolist() or [5, 5] in out.tolist()


def test_vw_from_threshold_and_ratio():
    rng = np.random.RandomState(0)
    pts = np.stack([np.arange(50, dtype=float), rng.rand(50)], axis=1)
    s = VWSimplifier(pts)
    assert len(s.from_threshold(np.inf)) == 0 or len(s.from_threshold(1e9)) == 2
    assert len(s.from_ratio(0.2)) == 10
    # thresholds grow monotonically along the removal sequence by design
    finite = np.sort(s.thresholds[np.isfinite(s.thresholds)])
    assert np.all(np.diff(finite) >= 0)


def test_reduce_line_reinserts_outside_points():
    xs = np.arange(100, dtype=float)
    ys = np.full(100, 10.0)
    ys[50] = 2.0  # a deep notch the 20-pt VW line may cut across
    out = reduce_line(xs, ys, maxpoints=20)
    assert len(out) >= 20
    assert [50.0, 2.0] in out.tolist()  # the notch point survives
    # every original point is on/above the final simplified line
    from pyrosar_ray.functions.simplify import _outside_mask

    assert not _outside_mask(out, xs, ys).any()
