"""Visvalingam-Whyatt polyline simplification + border-line reduction.

Faithful numpy reimplementation of the reference's footprint
raster→vector toolchain (behavioral parity, no code reuse):

- ``VWSimplifier`` (reference: S1/polysimplify.py:92-204) — ranks every
  vertex by the "effective area" at which it would be removed; a
  simplified line at threshold t keeps vertices with effective area > t;
  ``from_number(n)`` keeps the n highest-ranked vertices.
- ``reduce_line`` (reference: S1/linesimplify.py:103-227) — simplify a
  noisy border line to ≤ ``maxpoints`` via VW, then greedily re-insert
  original points that fall OUTSIDE the polygon formed by the simplified
  line (distance-ranked), so the simplified border never cuts into valid
  data; shapely's Douglas-Peucker cannot express this (SURVEY.md §7.4-3).

These are per-row geometry kernels: applied inside ``map_batches`` over
footprint/border columns; nothing here touches Ray directly.
"""

from __future__ import annotations

import numpy as np


def _triangle_areas(pts: np.ndarray) -> np.ndarray:
    """Effective area of each interior vertex (endpoints get +inf)."""
    a, b, c = pts[:-2], pts[1:-1], pts[2:]
    cross = (b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1]) - (b[:, 1] - a[:, 1]) * (
        c[:, 0] - a[:, 0]
    )
    areas = np.empty(len(pts))
    areas[0] = areas[-1] = np.inf
    areas[1:-1] = 0.5 * np.abs(cross)
    return areas


class VWSimplifier:
    """Effective-area ranking of every vertex (Visvalingam-Whyatt).

    On construction computes, for each vertex, the area threshold at
    which VW removes it (monotonic: each removal's recorded area is
    clamped to at least the previous one, the standard VW trick so
    thresholds are totally ordered).
    """

    def __init__(self, pts: np.ndarray):
        pts = np.asarray(pts, dtype=np.float64)
        n = len(pts)
        self.pts = pts
        thresholds = np.full(n, np.inf)
        if n <= 2:
            self.thresholds = thresholds
            return
        # doubly-linked list over active vertices + lazy-deletion min-heap:
        # O(n log n) vs the naive per-removal argmin's O(n^2). Heap
        # entries are (area, index, version); stale versions are skipped
        # on pop, and the (area, index) ordering reproduces argmin's
        # smallest-index tie-break exactly.
        import heapq

        prev = np.arange(-1, n - 1)
        nxt = np.arange(1, n + 1)
        areas = _triangle_areas(pts)
        active = np.ones(n, dtype=bool)
        version = np.zeros(n, dtype=np.int64)
        heap = [(areas[i], i, 0) for i in range(1, n - 1)]
        heapq.heapify(heap)
        max_area_so_far = 0.0
        removed = 0
        while heap and removed < n - 2:
            area_i, i, ver = heapq.heappop(heap)
            if not active[i] or ver != version[i]:
                continue
            if not np.isfinite(area_i):
                break
            area = max(area_i, max_area_so_far)  # monotonic clamp
            max_area_so_far = area
            thresholds[i] = area
            active[i] = False
            removed += 1
            p, q = prev[i], nxt[i]
            nxt[p], prev[q] = q, p
            # recompute neighbor areas against new adjacency
            for j in (p, q):
                if 0 < j < n - 1 and active[j]:
                    a, b, c = pts[prev[j]], pts[j], pts[nxt[j]]
                    cross = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
                    areas[j] = 0.5 * abs(cross)
                    version[j] += 1
                    heapq.heappush(heap, (areas[j], j, int(version[j])))
        self.thresholds = thresholds

    def from_threshold(self, threshold: float) -> np.ndarray:
        return self.pts[self.thresholds > threshold]

    def from_number(self, n: int) -> np.ndarray:
        """Keep the n vertices with the highest removal thresholds."""
        if n >= len(self.pts):
            return self.pts
        order = np.argsort(-self.thresholds, kind="stable")[:n]
        return self.pts[np.sort(order)]

    def from_ratio(self, ratio: float) -> np.ndarray:
        if not 0 < ratio <= 1:
            raise ValueError("ratio must be in (0, 1]")
        return self.from_number(int(round(len(self.pts) * ratio)))


def _point_side(p1: np.ndarray, p2: np.ndarray, px: np.ndarray, py: np.ndarray):
    """Signed side of points vs directed segment p1→p2 (vectorized)."""
    return (p2[0] - p1[0]) * (py - p1[1]) - (p2[1] - p1[1]) * (px - p1[0])


def _outside_mask(simplified: np.ndarray, xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """True for original points lying strictly below the simplified line.

    The border line is x-monotonic (one y per column of the edge block);
    'outside the valid polygon' = below the piecewise-linear simplified
    line (larger y = deeper into the image interior is 'inside').
    """
    sx = simplified[:, 0]
    seg = np.clip(np.searchsorted(sx, xs, side="right") - 1, 0, len(sx) - 2)
    p1 = simplified[seg]
    p2 = simplified[seg + 1]
    t = np.where(p2[:, 0] != p1[:, 0], (xs - p1[:, 0]) / np.where(p2[:, 0] != p1[:, 0], p2[:, 0] - p1[:, 0], 1.0), 0.0)
    line_y = p1[:, 1] + t * (p2[:, 1] - p1[:, 1])
    return ys < line_y - 1e-12


def reduce_line(
    xs: np.ndarray, ys: np.ndarray, maxpoints: int = 20, max_iter: int = 1000
) -> np.ndarray:
    """VW-simplify a border line, then re-insert points left outside.

    Input: x-sorted border samples (one y per x). Returns the simplified
    point set (subset of input, x-sorted). Mirrors the reference's
    greedy loop: while any original point falls outside the polygon of
    the current simplification, insert the farthest-outside point.
    """
    pts = np.stack([np.asarray(xs, dtype=np.float64), np.asarray(ys, dtype=np.float64)], axis=1)
    if len(pts) <= maxpoints:
        return pts
    simplifier = VWSimplifier(pts)
    keep_mask = np.zeros(len(pts), dtype=bool)
    order = np.argsort(-simplifier.thresholds, kind="stable")[:maxpoints]
    keep_mask[order] = True
    for _ in range(max_iter):
        simplified = pts[keep_mask]
        outside = _outside_mask(simplified, pts[:, 0], pts[:, 1]) & ~keep_mask
        if not outside.any():
            break
        # distance below the line, farthest first
        sx = simplified[:, 0]
        seg = np.clip(np.searchsorted(sx, pts[:, 0], side="right") - 1, 0, len(sx) - 2)
        p1, p2 = simplified[seg], simplified[seg + 1]
        denom = np.where(p2[:, 0] != p1[:, 0], p2[:, 0] - p1[:, 0], 1.0)
        t = (pts[:, 0] - p1[:, 0]) / denom
        line_y = p1[:, 1] + t * (p2[:, 1] - p1[:, 1])
        depth = np.where(outside, line_y - pts[:, 1], -np.inf)
        keep_mask[int(np.argmax(depth))] = True
    return pts[keep_mask]
