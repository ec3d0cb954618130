"""Property-based tests (hypothesis) for the geometry/tile/session kernels."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pyrosar_ray.functions.geometry import (
    convex_hull,
    points_in_polygon,
    polygon_wkt,
    ring_area,
    wkt_to_ring,
)
from pyrosar_ray.functions.grouping import session_ids
from pyrosar_ray.functions.tiles import expand_bbox_tiles, hgt_tiles

coords = st.floats(min_value=-179.0, max_value=179.0, allow_nan=False, width=32)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.tuples(coords, coords), min_size=3, max_size=30))
def test_convex_hull_properties(pts):
    arr = np.array(pts, dtype=np.float64)
    hull = convex_hull(arr)
    if len(hull) < 3:
        return  # degenerate (collinear) input
    # CCW orientation: positive signed area
    assert ring_area(hull) >= 0
    # every input point lies inside or on the hull
    assert points_in_polygon(hull, arr[:, 0], arr[:, 1]).all()
    # idempotent: hull of hull = hull
    again = convex_hull(hull)
    assert np.allclose(np.sort(again, axis=0), np.sort(hull, axis=0))


@settings(max_examples=50, deadline=None)
@given(st.lists(st.tuples(coords, coords), min_size=3, max_size=15))
def test_wkt_roundtrip(pts):
    hull = convex_hull(np.array(pts, dtype=np.float64))
    if len(hull) < 3:
        return
    back = wkt_to_ring(polygon_wkt(hull))
    assert np.allclose(back, hull)


@settings(max_examples=50, deadline=None)
@given(
    st.floats(min_value=-179, max_value=178, allow_nan=False),
    st.floats(min_value=-89, max_value=88, allow_nan=False),
    st.floats(min_value=0.01, max_value=3.0),
    st.floats(min_value=0.01, max_value=3.0),
)
def test_tile_expansion_matches_scalar(x0, y0, w, h):
    xmax, ymax = min(x0 + w, 179.5), min(y0 + h, 89.5)
    row_idx, lat, lon = expand_bbox_tiles(
        np.array([x0]), np.array([xmax]), np.array([y0]), np.array([ymax])
    )
    got = [f"{'S' if la < 0 else 'N'}{abs(la):02d}" f"{'W' if lo < 0 else 'E'}{abs(lo):03d}.hgt"
           for la, lo in zip(lat, lon)]
    assert got == hgt_tiles(x0, xmax, y0, ymax)
    assert (row_idx == 0).all()


@settings(max_examples=50, deadline=None)
@given(st.lists(st.floats(min_value=0, max_value=1e6, allow_nan=False), min_size=1, max_size=100),
       st.floats(min_value=0.1, max_value=1e5))
def test_session_ids_properties(ts, gap):
    arr = np.sort(np.array(ts, dtype=np.float64))
    sid = session_ids(arr, gap)
    # dense, nondecreasing, steps of ≤1, starts at 0
    assert sid[0] == 0
    assert ((np.diff(sid) == 0) | (np.diff(sid) == 1)).all()
    # a break happens exactly where the gap exceeds the threshold
    breaks = np.diff(arr) > gap
    assert (np.diff(sid) == breaks.astype(int)).all()


# ---------------------------------------------- late round-2 kernels


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=200),
    st.integers(min_value=1, max_value=3_600_000_000),
)
def test_tumbling_window_partition_property(ts_us, width):
    """Every event lands in exactly one window containing its timestamp."""
    arr = np.array(ts_us, dtype=np.int64)
    starts = arr // width * width
    assert ((starts <= arr) & (arr < starts + width)).all()


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), min_size=1, max_size=500))
def test_hash_bucket_bounds_and_determinism(ids):
    from pyrosar_ray.stages.sampling import hash_bucket

    arr = np.array(ids, dtype=np.int64)
    b = hash_bucket(arr)
    assert ((b >= 0) & (b < 100)).all()
    assert (b == hash_bucket(arr)).all()
    # only the low 32 bits matter (the SQL twin's contract)
    assert (hash_bucket(arr % (1 << 32)) == b).all()


@settings(max_examples=30, deadline=None)
@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.sampled_from([1, 3, 5]),
)
def test_boxcar_mean_preserving_bounds(h, w, size):
    from pyrosar_ray.pipelines.geocode import boxcar

    rng = np.random.default_rng(h * 100 + w)
    arr = rng.uniform(-5, 5, (h, w))
    out = boxcar(arr, size)
    assert out.shape == arr.shape
    # window means stay within the global value range
    assert out.min() >= arr.min() - 1e-9 and out.max() <= arr.max() + 1e-9
    # size=1 is the identity
    if size == 1:
        assert np.allclose(out, arr)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=200), min_size=1, max_size=300),
    st.lists(
        st.floats(min_value=0.01, max_value=1.0, allow_nan=False), min_size=1, max_size=5
    ),
)
def test_quantile_histogram_inversion(values, qs):
    """The histogram inversion equals sorting + rank selection."""
    import math

    vals = np.array(values, dtype=np.int64)
    uniq, counts = np.unique(vals, return_counts=True)
    cum = counts.cumsum()
    srt = np.sort(vals)
    for q in qs:
        rank = max(1, math.ceil(q * len(vals)))
        got = uniq[np.searchsorted(cum, rank)]
        assert got == srt[rank - 1]


@settings(max_examples=25, deadline=None)
@given(st.integers(min_value=0, max_value=10**9))
def test_synth_audio_metadata_arithmetic(doc_id):
    """The decode path must reproduce the synthesis arithmetic exactly
    (the audio_meta oracle contract)."""
    from pyrosar_ray.sources.audio import SAMPLE_RATE, decode_audio, synth_audio

    pcm = synth_audio(doc_id)
    back = decode_audio(pcm.tobytes(), "pcm16")
    assert len(back) == 8000 + (doc_id % 37) * 160
    assert len(back) * 1000.0 / SAMPLE_RATE == len(back) / 16.0
    assert np.array_equal(pcm, back)


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 50), st.integers(0, 50)), min_size=1, max_size=60
    )
)
def test_connected_components_properties(edges):
    """Labels are component minima and consistent across edges."""
    import pandas as pd

    from pyrosar_ray.stages.dedup_text import connected_components

    pairs = pd.DataFrame(
        {"id_a": [a for a, _ in edges], "id_b": [b for _, b in edges]}
    )
    out = connected_components(pairs)
    label = dict(zip(out["doc_id"], out["cluster_id"]))
    for a, b in edges:
        assert label[a] == label[b]  # edge endpoints share a component
    for node, lab in label.items():
        assert lab <= node  # canonical label is the component minimum
        assert label[lab] == lab  # the minimum labels itself


# ---------------------------------------------------------- hex grid


@given(
    st.lists(
        st.tuples(
            st.floats(min_value=-179.9, max_value=179.9),
            st.floats(min_value=-89.9, max_value=89.9),
        ),
        min_size=1,
        max_size=50,
    ),
    st.integers(min_value=0, max_value=12),
)
@settings(max_examples=40, deadline=None)
def test_hex_roundtrip_property(pts, res):
    import numpy as np

    from pyrosar_ray.functions.hexgrid import cell_center, hex_cell_of_points

    lon = np.array([p[0] for p in pts])
    lat = np.array([p[1] for p in pts])
    cells = hex_cell_of_points(lon, lat, res)
    clon, clat = cell_center(cells)
    assert np.array_equal(hex_cell_of_points(clon, clat, res), cells)


@given(
    st.floats(min_value=-170, max_value=160),
    st.floats(min_value=-80, max_value=70),
    st.floats(min_value=1e-6, max_value=9.0),
    st.floats(min_value=1e-6, max_value=9.0),
    st.integers(min_value=0, max_value=6),
)
@settings(max_examples=60, deadline=None)
def test_hex_cover_superset_property(x0, y0, w, h, res):
    import numpy as np

    from pyrosar_ray.functions.hexgrid import cover_bbox_hex, hex_cell_of_points

    ri, cells = cover_bbox_hex(
        np.array([x0]), np.array([y0]), np.array([x0 + w]), np.array([y0 + h]), res
    )
    cover = set(cells.tolist())
    rng = np.random.default_rng(0)
    px = rng.uniform(x0, x0 + w, 128)
    py = rng.uniform(y0, y0 + h, 128)
    inside = set(hex_cell_of_points(px, py, res).tolist())
    assert inside <= cover
