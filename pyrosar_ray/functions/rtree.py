"""STR-packed R-tree over planar rectangles/points, pure numpy.

The north-star's per-partition spatial structure ("actor pools holding
per-partition R-tree + cell maps", BASELINE.json): a Sort-Tile-Recursive
bulk-loaded R-tree (Leutenegger et al., 1997 — the standard packing for
static data) built once per actor/partition and probed with *batched*
queries: the query frontier is a flat (query, node) pair array expanded
level by level with repeat/offset arithmetic — no per-query recursion,
no Python loop over probes.

Levels are stored top-down as concatenated arrays; node children are
contiguous ranges, a property of STR packing that makes the frontier
expansion pure integer arithmetic.
"""

from __future__ import annotations

import numpy as np


class STRtree:
    """Static R-tree over rectangles (points = degenerate rectangles).

    ``fanout`` children per node; build is O(n log n) (two sorts per
    level tier via one argsort each).
    """

    def __init__(
        self,
        xmin: np.ndarray,
        ymin: np.ndarray,
        xmax: np.ndarray,
        ymax: np.ndarray,
        fanout: int = 16,
    ):
        n = len(xmin)
        self.fanout = fanout
        cx = (np.asarray(xmin, dtype=np.float64) + xmax) / 2.0
        cy = (np.asarray(ymin, dtype=np.float64) + ymax) / 2.0
        # STR leaf packing: sort by x-center into vertical slabs of
        # ~sqrt(n/fanout) leaves each, then by y-center within a slab
        if n == 0:
            self.order = np.zeros(0, dtype=np.int64)
            self.levels = []
            self.leaf_xmin = np.zeros(0)
            self.leaf_ymin = np.zeros(0)
            self.leaf_xmax = np.zeros(0)
            self.leaf_ymax = np.zeros(0)
            return
        nleaf = -(-n // fanout)
        nslab = max(int(np.ceil(np.sqrt(nleaf))), 1)
        slab_cap = -(-n // nslab) if nslab else n
        by_x = np.argsort(cx, kind="stable")
        slab = np.arange(n) // slab_cap
        # sort within slab by y-center: lexsort on (y, slab)
        order = by_x[np.lexsort((cy[by_x], slab))]
        self.order = order
        self.leaf_xmin = np.asarray(xmin, dtype=np.float64)[order]
        self.leaf_ymin = np.asarray(ymin, dtype=np.float64)[order]
        self.leaf_xmax = np.asarray(xmax, dtype=np.float64)[order]
        self.leaf_ymax = np.asarray(ymax, dtype=np.float64)[order]
        # pack upward: each node covers a contiguous child range
        levels = []
        lo_x0, lo_y0, lo_x1, lo_y1 = (
            self.leaf_xmin,
            self.leaf_ymin,
            self.leaf_xmax,
            self.leaf_ymax,
        )
        count = n
        while count > 1:
            nn = -(-count // fanout)
            starts = np.arange(nn, dtype=np.int64) * fanout
            ends = np.minimum(starts + fanout, count)
            x0 = np.minimum.reduceat(lo_x0, starts)
            y0 = np.minimum.reduceat(lo_y0, starts)
            x1 = np.maximum.reduceat(lo_x1, starts)
            y1 = np.maximum.reduceat(lo_y1, starts)
            levels.append(
                {"x0": x0, "y0": y0, "x1": x1, "y1": y1, "start": starts, "end": ends}
            )
            lo_x0, lo_y0, lo_x1, lo_y1 = x0, y0, x1, y1
            count = nn
        levels.reverse()  # root first
        self.levels = levels

    def query_boxes(
        self,
        qx0: np.ndarray,
        qy0: np.ndarray,
        qx1: np.ndarray,
        qy1: np.ndarray,
    ):
        """Batched rectangle intersection query.

        Returns ``(query_idx, entry_idx)`` pairs where ``entry_idx``
        indexes the ORIGINAL input order (pre-packing).
        """
        nq = len(qx0)
        z = np.zeros(0, dtype=np.int64)
        if nq == 0 or len(self.order) == 0:
            return z, z.copy()
        if not self.levels:  # single entry, no internal nodes
            q = np.flatnonzero(
                (qx0 <= self.leaf_xmax[0])
                & (qx1 >= self.leaf_xmin[0])
                & (qy0 <= self.leaf_ymax[0])
                & (qy1 >= self.leaf_ymin[0])
            )
            return q, np.repeat(self.order[0], len(q))
        # frontier: (query, node) pairs at the current level
        root = self.levels[0]
        qi = np.repeat(np.arange(nq, dtype=np.int64), len(root["x0"]))
        ni = np.tile(np.arange(len(root["x0"]), dtype=np.int64), nq)
        for lvl, nodes in enumerate(self.levels):
            hit = (
                (qx0[qi] <= nodes["x1"][ni])
                & (qx1[qi] >= nodes["x0"][ni])
                & (qy0[qi] <= nodes["y1"][ni])
                & (qy1[qi] >= nodes["y0"][ni])
            )
            qi, ni = qi[hit], ni[hit]
            if len(qi) == 0:
                return z, z.copy()
            # expand to child ranges (contiguous by construction)
            starts = nodes["start"][ni]
            counts = nodes["end"][ni] - starts
            total = int(counts.sum())
            rep = np.repeat(np.arange(len(qi), dtype=np.int64), counts)
            offs = np.concatenate([[0], np.cumsum(counts)[:-1]])
            child = np.arange(total, dtype=np.int64) - np.repeat(offs, counts)
            qi = qi[rep]
            ni = starts[rep] + child
        # ni now indexes leaf entries (packed order); final exact filter
        hit = (
            (qx0[qi] <= self.leaf_xmax[ni])
            & (qx1[qi] >= self.leaf_xmin[ni])
            & (qy0[qi] <= self.leaf_ymax[ni])
            & (qy1[qi] >= self.leaf_ymin[ni])
        )
        return qi[hit], self.order[ni[hit]]
