"""Footprint geometry parity (golden WKT/WKB from the reference tests)."""

import numpy as np

from pyrosar_ray.functions.geometry import (
    bbox_intersects,
    bbox_ring,
    convex_hull,
    convex_intersects,
    corners,
    points_in_polygon,
    polygon_wkb,
    polygon_wkt,
    wkb_to_ring,
    wkt_to_ring,
)

GOLDEN_WKT = (
    "POLYGON((8.505644 50.295261, 12.0268 50.688881, 11.653832 52.183979, "
    "8.017178 51.788181, 8.505644 50.295261))"
)
S1_COORDS = np.array(
    [
        [8.505644, 50.295261],
        [12.0268, 50.688881],
        [11.653832, 52.183979],
        [8.017178, 51.788181],
    ]
)


def test_hull_golden_wkt():
    ring = convex_hull(S1_COORDS)
    assert polygon_wkt(ring) == GOLDEN_WKT


def test_wkb_roundtrip():
    ring = convex_hull(S1_COORDS)
    wkb = polygon_wkb(ring)
    back = wkb_to_ring(wkb)
    np.testing.assert_array_equal(ring, back)
    # byte-stability: same ring → same bytes
    assert polygon_wkb(back) == wkb


def test_wkt_roundtrip():
    ring = wkt_to_ring(GOLDEN_WKT)
    assert polygon_wkt(ring) == GOLDEN_WKT


def test_corners_golden():
    c = corners(S1_COORDS)
    assert c == {
        "xmin": 8.017178,
        "xmax": 12.0268,
        "ymin": 50.295261,
        "ymax": 52.183979,
    }


def test_hull_ccw_and_interior_points():
    rng = np.random.default_rng(42)
    pts = rng.uniform(-1, 1, size=(50, 2))
    ring = convex_hull(pts)
    # all input points inside or on the hull
    assert points_in_polygon(ring, pts[:, 0], pts[:, 1]).all()
    # CCW: positive signed area
    x, y = ring[:, 0], ring[:, 1]
    area = 0.5 * np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)
    assert area > 0
    # starts at min-y vertex
    assert ring[0, 1] == ring[:, 1].min()


def test_points_in_polygon():
    ring = bbox_ring(0, 0, 2, 2)
    px = np.array([1.0, 3.0, 0.0, -0.1])
    py = np.array([1.0, 1.0, 0.0, 1.0])
    assert points_in_polygon(ring, px, py).tolist() == [True, False, True, False]


def test_convex_intersects():
    a = bbox_ring(0, 0, 2, 2)
    b = bbox_ring(1, 1, 3, 3)
    c = bbox_ring(5, 5, 6, 6)
    d = bbox_ring(2, 2, 3, 3)  # touching corner
    assert convex_intersects(a, b)
    assert not convex_intersects(a, c)
    assert convex_intersects(a, d)


def test_bbox_intersects_vectorized():
    out = bbox_intersects(
        np.array([0.0, 0.0]),
        np.array([0.0, 0.0]),
        np.array([1.0, 1.0]),
        np.array([1.0, 1.0]),
        np.array([0.5, 2.0]),
        np.array([0.5, 2.0]),
        np.array([2.0, 3.0]),
        np.array([2.0, 3.0]),
    )
    assert out.tolist() == [True, False]
