"""Marching-squares contour extraction (stages/zonal.py)."""

import numpy as np
import pyarrow as pa
import ray.data

from pyrosar_ray.functions.tiff import encode_geotiff
from pyrosar_ray.stages.zonal import marching_squares, raster_contours


def _endpoints(segs):
    """Multiset of (y, x) half-grid endpoints across all segments."""
    pts = np.concatenate([segs[:, 3:5], segs[:, 5:7]], axis=0)
    return [tuple(p) for p in pts.tolist()]


def test_single_pixel_diamond():
    mask = np.zeros((3, 3), dtype=bool)
    mask[1, 1] = True
    segs = marching_squares(mask)
    # four cells cut, one segment each, forming a closed diamond
    assert len(segs) == 4
    assert sorted(segs[:, 2].tolist()) == [1, 2, 4, 8]
    pts = _endpoints(segs)
    # closed loop: every endpoint shared by exactly two segments
    for p in set(pts):
        assert pts.count(p) == 2
    # endpoints are the four edge midpoints around pixel (1,1)
    assert set(pts) == {(1, 2), (2, 1), (2, 3), (3, 2)}


def test_saddle_cases_emit_two_segments():
    seg5 = marching_squares(np.array([[0, 1], [1, 0]], dtype=bool))
    seg10 = marching_squares(np.array([[1, 0], [0, 1]], dtype=bool))
    assert len(seg5) == 2 and set(seg5[:, 2]) == {5}
    assert len(seg10) == 2 and set(seg10[:, 2]) == {10}
    # fixed convention: 5 → (T,R)+(B,L), 10 → (T,L)+(B,R)
    assert sorted(seg5[:, 3:].tolist()) == [[0, 1, 1, 2], [2, 1, 1, 0]]
    assert sorted(seg10[:, 3:].tolist()) == [[0, 1, 1, 0], [2, 1, 1, 2]]


def test_full_and_empty_masks_emit_nothing():
    assert len(marching_squares(np.ones((4, 5), dtype=bool))) == 0
    assert len(marching_squares(np.zeros((4, 5), dtype=bool))) == 0


def test_interior_contours_are_closed_loops():
    # any mask whose 1-pixels sit strictly interior yields only closed
    # contours: every cut edge is shared by exactly two cells, so every
    # endpoint has degree 2
    rng = np.random.default_rng(7)
    core = rng.random((9, 12)) < 0.45
    mask = np.pad(core, 2)
    segs = marching_squares(mask)
    pts = _endpoints(segs)
    for p in set(pts):
        assert pts.count(p) == 2


def test_segment_count_matches_case_table():
    rng = np.random.default_rng(11)
    mask = rng.random((8, 8)) < 0.5
    b = mask.astype(int)
    code = 8 * b[:-1, :-1] + 4 * b[:-1, 1:] + 2 * b[1:, 1:] + b[1:, :-1]
    expect = sum(
        2 if c in (5, 10) else (0 if c in (0, 15) else 1)
        for c in code.ravel().tolist()
    )
    assert len(marching_squares(mask)) == expect


def test_raster_contours_stage_decodes_and_thresholds():
    # 4×4 raster: one above-threshold pixel at (1,1), one nodata hole at
    # (2,2) adjacent to an above-threshold pixel at (2,3)
    v = np.zeros((4, 4), dtype=np.float32)
    v[1, 1] = 80.0
    v[2, 3] = 70.0
    v[2, 2] = -99.0
    blob = encode_geotiff(
        v[None], ulx=0.0, uly=0.0, xres=0.125, yres=0.25, nodata=-99.0, tile=8
    )
    ds = ray.data.from_arrow(
        pa.table({"image_id": pa.array([9], type=pa.int64()),
                  "blob": pa.array([blob], type=pa.binary())})
    )
    out = raster_contours(ds, threshold=50.0).to_pandas()
    assert (out["image_id"] == 9).all()
    # pixel (1,1) contributes a closed diamond (4 segments); pixel (2,3)
    # sits on the last column so only its left-side cells are scanned
    segs = out[["cell_y", "cell_x", "code", "y0", "x0", "y1", "x1"]].to_numpy()
    got = marching_squares((v >= 50.0) & (v != -99.0))
    assert sorted(segs.tolist()) == sorted(got.tolist())


def test_pyramid_halving_and_conservation():
    from pyrosar_ray.stages.zonal import _halve, raster_pyramid

    rng = np.random.default_rng(5)
    v = rng.integers(0, 100, (7, 9)).astype(np.float32)
    v[rng.random((7, 9)) < 0.2] = -99.0
    valid = v != -99.0
    s0 = np.where(valid, v, 0).astype(np.int64)
    c0 = valid.astype(np.int64)

    s1, c1 = _halve(s0, c0)
    assert s1.shape == (4, 5) and c1.shape == (4, 5)
    # conservation at every level
    assert s1.sum() == s0.sum() and c1.sum() == c0.sum()
    # cascaded level-2 equals one grouping of the base by (y>>2, x>>2)
    s2, c2 = _halve(s1, c1)
    want = np.zeros_like(s2)
    wantc = np.zeros_like(c2)
    for y in range(7):
        for x in range(9):
            want[y >> 2, x >> 2] += s0[y, x]
            wantc[y >> 2, x >> 2] += c0[y, x]
    assert np.array_equal(s2, want) and np.array_equal(c2, wantc)

    blob = encode_geotiff(
        v[None], ulx=0.0, uly=0.0, xres=0.125, yres=0.25, nodata=-99.0, tile=8
    )
    ds = ray.data.from_arrow(
        pa.table({"image_id": pa.array([3], type=pa.int64()),
                  "blob": pa.array([blob], type=pa.binary())})
    )
    out = raster_pyramid(ds, levels=2).to_pandas().sort_values("level")
    assert out["px_sum"].nunique() == 1  # level-invariant sum
    assert list(out["w"]) == [5, 3] and list(out["h"]) == [4, 2]
    idx2 = np.arange(1, s2.size + 1).reshape(s2.shape)
    assert out.iloc[1]["sum_checksum"] == int((s2 * idx2).sum())
    assert out.iloc[1]["cnt_checksum"] == int((c2 * idx2).sum())
