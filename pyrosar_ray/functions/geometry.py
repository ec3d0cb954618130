"""Pure-numpy planar geometry kernels (no GEOS/shapely in this sandbox).

Semantics mirror the reference's footprint handling:
- convex hull of the coordinate multipoint with a counter-clockwise
  exterior ring (pyroSAR/drivers.py:287-342, CCW enforcement 325-332)
- WKT/WKB serialization matching the stored 'SRID=4326;<WKT>' catalog
  geometry (pyroSAR/archive.py:469-475); golden WKT parity with
  /root/reference/tests/test_archive.py:48-53
- bbox corners (pyroSAR/drivers.py:479-492)

All polygons here are convex (hulls or tile boxes), so the exact
intersects refinement uses the separating-axis test plus containment.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- hull


def convex_hull(points: np.ndarray) -> np.ndarray:
    """Convex hull (Andrew's monotone chain) of an (n,2) float array.

    Returns the hull vertices in counter-clockwise order, rotated so the
    ring starts at the vertex with minimum y (tie: minimum x) — matching
    the ring start of the reference's stored footprints. The ring is NOT
    closed (first point not repeated).
    """
    pts = np.asarray(points, dtype=np.float64)
    pts = np.unique(pts, axis=0)  # sorts lexicographically by (x, y)
    n = len(pts)
    if n <= 2:
        return pts

    def half(iterable):
        hull: list[np.ndarray] = []
        for p in iterable:
            while len(hull) >= 2 and np.cross(hull[-1] - hull[-2], p - hull[-2]) <= 0:
                hull.pop()
            hull.append(p)
        return hull

    lower = half(pts)
    upper = half(pts[::-1])
    ring = np.array(lower[:-1] + upper[:-1])
    # rotate: start at min y, tie-break min x
    start = np.lexsort((ring[:, 0], ring[:, 1]))[0]
    return np.roll(ring, -start, axis=0)


def ring_close(ring: np.ndarray) -> np.ndarray:
    """Append the first vertex to close the ring."""
    return np.vstack([ring, ring[:1]])


def ring_area(ring: np.ndarray) -> float:
    """Signed shoelace area of an open CCW ring (positive for CCW)."""
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


# ------------------------------------------------------------- WKT/WKB


def _fmt(v: float) -> str:
    # %.15g reproduces OGR-style shortest WKT coordinates (12.0268 stays 12.0268)
    return f"{v:.15g}"


def polygon_wkt(ring: np.ndarray) -> str:
    """Open CCW ring → ``POLYGON((x y, ..., x0 y0))`` (ring closed in output)."""
    closed = ring_close(np.asarray(ring, dtype=np.float64))
    body = ", ".join(f"{_fmt(x)} {_fmt(y)}" for x, y in closed)
    return f"POLYGON(({body}))"


def polygon_wkb(ring: np.ndarray) -> bytes:
    """Open ring → little-endian ISO WKB polygon (single exterior ring)."""
    closed = ring_close(np.asarray(ring, dtype=np.float64))
    out = bytearray()
    out += struct.pack("<BII", 1, 3, 1)  # little-endian, Polygon, 1 ring
    out += struct.pack("<I", len(closed))
    out += closed.astype("<f8").tobytes()
    return bytes(out)


def wkb_to_ring(wkb: bytes) -> np.ndarray:
    """Little-endian WKB polygon → open exterior ring (n,2)."""
    byte_order, geom_type, nrings = struct.unpack_from("<BII", wkb, 0)
    if byte_order != 1 or geom_type != 3:
        raise ValueError("only little-endian WKB polygons supported")
    (npts,) = struct.unpack_from("<I", wkb, 9)
    ring = np.frombuffer(wkb, dtype="<f8", count=npts * 2, offset=13).reshape(-1, 2)
    return ring[:-1].copy()  # drop closing vertex


def wkt_to_ring(wkt: str) -> np.ndarray:
    """``POLYGON((...))`` → open exterior ring."""
    inner = wkt[wkt.index("((") + 2 : wkt.index("))")]
    pts = [tuple(map(float, p.split())) for p in inner.split(",")]
    ring = np.asarray(pts, dtype=np.float64)
    if np.array_equal(ring[0], ring[-1]):
        ring = ring[:-1]
    return ring


# ------------------------------------------------------------- corners


def corners(points: np.ndarray) -> dict:
    """Bounding box of a coordinate list: {xmin, xmax, ymin, ymax}."""
    pts = np.asarray(points, dtype=np.float64)
    return {
        "xmin": float(pts[:, 0].min()),
        "xmax": float(pts[:, 0].max()),
        "ymin": float(pts[:, 1].min()),
        "ymax": float(pts[:, 1].max()),
    }


# ---------------------------------------------------- predicates (convex)


def points_in_polygon(ring: np.ndarray, px: np.ndarray, py: np.ndarray) -> np.ndarray:
    """Vectorized point-in-convex-CCW-polygon test (boundary counts as inside)."""
    ring = np.asarray(ring, dtype=np.float64)
    ax, ay = ring[:, 0], ring[:, 1]
    bx, by = np.roll(ax, -1), np.roll(ay, -1)
    # cross((b - a), (p - a)) >= 0 for every edge → inside (CCW)
    cross = (bx - ax)[None, :] * (py[:, None] - ay[None, :]) - (by - ay)[None, :] * (
        px[:, None] - ax[None, :]
    )
    return np.all(cross >= -1e-12, axis=1)


def _project(ring: np.ndarray, axes: np.ndarray):
    proj = ring @ axes.T
    return proj.min(axis=0), proj.max(axis=0)


def convex_intersects(ring_a: np.ndarray, ring_b: np.ndarray) -> bool:
    """Separating-axis intersects test for two convex rings (touch counts)."""
    for ring in (ring_a, ring_b):
        edges = np.roll(ring, -1, axis=0) - ring
        axes = np.stack([-edges[:, 1], edges[:, 0]], axis=1)
        amin, amax = _project(ring_a, axes)
        bmin, bmax = _project(ring_b, axes)
        if np.any((amax < bmin) | (bmax < amin)):
            return False
    return True


def bbox_ring(xmin: float, ymin: float, xmax: float, ymax: float) -> np.ndarray:
    """CCW open ring of an axis-aligned box."""
    return np.array(
        [[xmin, ymin], [xmax, ymin], [xmax, ymax], [xmin, ymax]], dtype=np.float64
    )


def boxes_intersect_convex(
    ring: np.ndarray,
    xmin: np.ndarray,
    ymin: np.ndarray,
    xmax: np.ndarray,
    ymax: np.ndarray,
) -> np.ndarray:
    """Vectorized exact intersects of M axis-aligned boxes vs ONE convex ring.

    Full separating-axis test (touch counts as intersect, matching
    :func:`convex_intersects`): the box axes reduce to a bbox-interval
    overlap against the ring's bounds; the ring's edge normals are tested
    with the boxes' support points selected by normal sign — an O(E)
    loop of O(M) numpy ops, no per-box Python.
    """
    ring = np.asarray(ring, dtype=np.float64)
    xmin = np.asarray(xmin, dtype=np.float64)
    ymin = np.asarray(ymin, dtype=np.float64)
    xmax = np.asarray(xmax, dtype=np.float64)
    ymax = np.asarray(ymax, dtype=np.float64)
    keep = (
        (xmin <= ring[:, 0].max())
        & (xmax >= ring[:, 0].min())
        & (ymin <= ring[:, 1].max())
        & (ymax >= ring[:, 1].min())
    )
    edges = np.roll(ring, -1, axis=0) - ring
    axes = np.stack([-edges[:, 1], edges[:, 0]], axis=1)
    proj = ring @ axes.T  # (V, E)
    pmin = proj.min(axis=0)
    pmax = proj.max(axis=0)
    for e in range(len(axes)):
        if not keep.any():
            break
        nx, ny = axes[e]
        bx_lo, bx_hi = (xmin, xmax) if nx >= 0 else (xmax, xmin)
        by_lo, by_hi = (ymin, ymax) if ny >= 0 else (ymax, ymin)
        lo = nx * bx_lo + ny * by_lo
        hi = nx * bx_hi + ny * by_hi
        keep &= ~((hi < pmin[e]) | (pmax[e] < lo))
    return keep


def boxes_intersect_quads(
    qx: np.ndarray,
    qy: np.ndarray,
    xmin: np.ndarray,
    ymin: np.ndarray,
    xmax: np.ndarray,
    ymax: np.ndarray,
) -> np.ndarray:
    """Pairwise exact intersects of M boxes vs M convex quads (SAT).

    ``qx``/``qy`` are (M, 4) vertex arrays (each row one CCW quad);
    box i is tested against quad i. Full separating-axis test — box
    axes reduce to bbox-interval overlap against the quad's bounds,
    the quad's 4 edge normals are tested with box support points
    selected by normal sign. Fixed 4-edge loop of O(M) numpy ops, no
    per-pair Python. Touch counts as intersect (superset-cover use)."""
    qx = np.asarray(qx, dtype=np.float64)
    qy = np.asarray(qy, dtype=np.float64)
    keep = (
        (xmin <= qx.max(axis=1))
        & (xmax >= qx.min(axis=1))
        & (ymin <= qy.max(axis=1))
        & (ymax >= qy.min(axis=1))
    )
    for e in range(4):
        if not keep.any():
            break
        ex = qx[:, (e + 1) % 4] - qx[:, e]
        ey = qy[:, (e + 1) % 4] - qy[:, e]
        nx, ny = -ey, ex
        proj = nx[:, None] * qx + ny[:, None] * qy  # (M, 4)
        pmin = proj.min(axis=1)
        pmax = proj.max(axis=1)
        bx_lo = np.where(nx >= 0, xmin, xmax)
        bx_hi = np.where(nx >= 0, xmax, xmin)
        by_lo = np.where(ny >= 0, ymin, ymax)
        by_hi = np.where(ny >= 0, ymax, ymin)
        lo = nx * bx_lo + ny * by_lo
        hi = nx * bx_hi + ny * by_hi
        keep &= ~((hi < pmin) | (pmax < lo))
    return keep


def bbox_intersects(
    axmin, aymin, axmax, aymax, bxmin, bymin, bxmax, bymax
) -> np.ndarray:
    """Vectorized bbox-overlap predicate (touching boxes count)."""
    return (
        (np.asarray(axmin) <= np.asarray(bxmax))
        & (np.asarray(axmax) >= np.asarray(bxmin))
        & (np.asarray(aymin) <= np.asarray(bymax))
        & (np.asarray(aymax) >= np.asarray(bymin))
    )
