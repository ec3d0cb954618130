"""Spatial kNN: k nearest catalog scenes per probe point.

The north-star's "kNN burst/orbit neighbor lookup" (BASELINE.json):
each probe point finds its k nearest scene centroids. Physical plan =
broadcast centroid cell index (built once driver-side, one ``ray.put``)
+ expanding-ring search inside an actor-pool ``map_batches`` — the
probe stream never shuffles.

Ring-search correctness: after exhausting all cells within Chebyshev
ring ``r`` of the probe's cell, any unseen candidate lies in ring
≥ r+1, whose nearest possible point is ≥ r·cell_size away. A probe is
finalized once it holds ≥ k candidates with kth distance ≤ r·cell_size
(planar degree metric — adequate for neighbor RANKING at catalog
density; swap in haversine for metric-true distances).

Determinism: ties break on (distance, scene_key) ascending, so any
cluster size produces identical neighbor lists.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset


def build_centroid_index(tab: pa.Table, res: int = 0) -> dict:
    """Scene centroids bucketed by grid cell (sorted-cell + offsets)."""
    cx = (tab["xmin"].to_numpy() + tab["xmax"].to_numpy()) / 2.0
    cy = (tab["ymin"].to_numpy() + tab["ymax"].to_numpy()) / 2.0
    scale = float(1 << res)
    row = np.floor((cy + 90.0) * scale).astype(np.int64)
    col = np.floor((cx + 180.0) * scale).astype(np.int64)
    ncols = int(360 * scale) + 1
    cell = row * ncols + col
    order = np.argsort(cell)
    cell_sorted = cell[order]
    newgrp = np.empty(len(cell_sorted), dtype=bool)
    if len(cell_sorted):
        newgrp[0] = True
        np.not_equal(cell_sorted[1:], cell_sorted[:-1], out=newgrp[1:])
        starts = np.flatnonzero(newgrp)
        unique_cells = cell_sorted[starts]
    else:
        starts = np.zeros(0, dtype=np.int64)
        unique_cells = cell_sorted
    return {
        "res": res,
        "ncols": ncols,
        "cell_size": 1.0 / scale,
        "order": order,
        "cx": cx[order],
        "cy": cy[order],
        "keys": tab["scene_key"].to_numpy()[order],
        "unique_cells": unique_cells,
        "offsets": np.concatenate([starts, [len(cell_sorted)]]),
    }


class CentroidKNN:
    """Actor probe: expanding-ring kNN against the broadcast index."""

    def __init__(self, index_ref, k: int, point_cols):
        self.__dict__.update(ray.get(index_ref))
        self.k = k
        self.point_cols = point_cols

    def _cells_of_ring(self, crow: int, ccol: int, r: int) -> list[int]:
        if r == 0:
            return [crow * self.ncols + ccol]
        cells = []
        for dc in range(-r, r + 1):
            cells.append((crow - r) * self.ncols + ccol + dc)
            cells.append((crow + r) * self.ncols + ccol + dc)
        for dr in range(-r + 1, r):
            cells.append((crow + dr) * self.ncols + ccol - r)
            cells.append((crow + dr) * self.ncols + ccol + r)
        return cells

    def _candidates(self, cells: list[int]) -> np.ndarray:
        pos = np.searchsorted(self.unique_cells, cells)
        pos = np.clip(pos, 0, max(len(self.unique_cells) - 1, 0))
        out = []
        for c, p in zip(cells, pos):
            if len(self.unique_cells) and self.unique_cells[p] == c:
                out.append(np.arange(self.offsets[p], self.offsets[p + 1]))
        return np.concatenate(out) if out else np.zeros(0, dtype=np.int64)

    def _bulk_3x3(self, lon, lat, crows, ccols):
        """Vectorized (2R+1)² neighborhood kNN for all probes at once.

        Returns (probe_idx, scene_pos, rank) for probes PROVABLY correct
        after ring ≤ R (kth d² ≤ (R·cell_size)²: unseen cells are ring
        ≥ R+1, nearest possible point ≥ R·cell_size away) plus the mask
        of unresolved probes needing the ring-expansion fallback.
        """
        n = len(lon)
        R = 2  # bulk radius: 5x5 neighborhood, correctness bound 2*cell
        span = np.arange(-R, R + 1)
        dr = np.repeat(span, 2 * R + 1)
        dc = np.tile(span, 2 * R + 1)
        cells = (crows[:, None] + dr[None, :]) * self.ncols + (ccols[:, None] + dc[None, :])
        flat = cells.ravel()
        pos = np.searchsorted(self.unique_cells, flat)
        pos_c = np.clip(pos, 0, max(len(self.unique_cells) - 1, 0))
        hit = (
            (self.unique_cells[pos_c] == flat)
            if len(self.unique_cells)
            else np.zeros(len(flat), dtype=bool)
        )
        lo = np.where(hit, self.offsets[pos_c], 0)
        hi = np.where(hit, self.offsets[pos_c + 1], 0)
        counts = hi - lo
        total = int(counts.sum())
        if total == 0:
            return (np.zeros(0, np.int64),) * 3 + (np.ones(n, dtype=bool),)
        ncells = (2 * R + 1) ** 2
        probe_rep = np.repeat(np.arange(n * ncells, dtype=np.int64) // ncells, counts)
        run_off = np.concatenate([[0], np.cumsum(counts)[:-1]])
        j = np.arange(total, dtype=np.int64) - np.repeat(run_off, counts)
        entry = np.repeat(lo, counts) + j
        dx = self.cx[entry] - lon[probe_rep]
        dy = self.cy[entry] - lat[probe_rep]
        d2 = dx * dx + dy * dy
        # rank candidates per probe: sort by (probe, d2, key)
        order = np.lexsort((self.keys[entry], d2, probe_rep))
        sp, sd2, se = probe_rep[order], d2[order], entry[order]
        newgrp = np.empty(len(sp), dtype=bool)
        newgrp[0] = True
        np.not_equal(sp[1:], sp[:-1], out=newgrp[1:])
        grp_start = np.maximum.accumulate(np.where(newgrp, np.arange(len(sp)), 0))
        rank = np.arange(len(sp)) - grp_start
        keep = rank < self.k
        # per-probe candidate count and kth distance for the correctness bound
        cand_count = np.bincount(sp, minlength=n)
        kth_d2 = np.full(n, np.inf)
        kth_rows = keep & (rank == np.minimum(cand_count[sp] - 1, self.k - 1))
        kth_d2[sp[kth_rows]] = sd2[kth_rows]
        bound2 = (R * self.cell_size) ** 2
        unresolved = (cand_count < self.k) | (kth_d2 > bound2)
        ok = keep & ~unresolved[sp]
        return sp[ok], se[ok], rank[ok] + 1, unresolved

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch["lon"].to_numpy()
        lat = batch["lat"].to_numpy()
        pids = batch[self.point_cols[0]].to_numpy()
        scale = 1.0 / self.cell_size
        crows = np.floor((lat + 90.0) * scale).astype(np.int64)
        ccols = np.floor((lon + 180.0) * scale).astype(np.int64)
        out_pid, out_key, out_rank = [], [], []
        max_ring = int(360 * scale)
        bp, be, br, unresolved = self._bulk_3x3(lon, lat, crows, ccols)
        out_pid.extend(pids[bp].tolist())
        out_key.extend(self.keys[be].tolist())
        out_rank.extend(br.tolist())
        # ring-expansion fallback for sparse neighborhoods only
        for i in np.flatnonzero(unresolved):
            cand: list[np.ndarray] = []
            best: np.ndarray | None = None
            bestd: np.ndarray | None = None
            for r in range(max_ring):
                idx = self._candidates(self._cells_of_ring(int(crows[i]), int(ccols[i]), r))
                if len(idx):
                    cand.append(idx)
                    all_idx = np.concatenate(cand)
                    dx = self.cx[all_idx] - lon[i]
                    dy = self.cy[all_idx] - lat[i]
                    # squared distance, same IEEE expression as the SQL
                    # oracle (dx*dx + dy*dy) so exact ties tie in both
                    d2 = dx * dx + dy * dy
                    order = np.lexsort((self.keys[all_idx], d2))[: self.k]
                    best = all_idx[order]
                    bestd = d2[order]
                bound = r * self.cell_size
                if (
                    best is not None
                    and len(best) >= self.k
                    and bestd[self.k - 1] <= bound * bound
                ):
                    break
            if best is None:
                continue
            out_pid.extend([pids[i]] * len(best))
            out_key.extend(self.keys[best].tolist())
            out_rank.extend(range(1, len(best) + 1))
        return pa.table(
            {
                "point_id": pa.array(out_pid, type=pa.int64()),
                "scene_key": pa.array(out_key, type=pa.int64()),
                "rank": pa.array(out_rank, type=pa.int64()),
            }
        )


class RTreeKNN:
    """Actor probe: radius-doubling kNN against a broadcast STR R-tree.

    The north-star's alternate physical plan ("actor pools holding
    per-partition R-tree"): the tree is built ONCE driver-side over the
    scene centroids and shipped via one ``ray.put``; each batch runs
    rounds of *batched* box queries with per-probe radii that double
    until the probe holds ≥ k candidates whose kth distance fits inside
    its query box (every point within Euclidean distance r lies inside
    the half-width-r box, so the kth answer is provably final).

    Distance metric, tie-breaking and output contract are identical to
    :class:`CentroidKNN` — the two plans must emit the same rows.
    """

    _MAX_R = 720.0  # past the whole lon/lat domain: resolve with all hits

    def __init__(self, index_ref, k: int, point_cols):
        self.__dict__.update(ray.get(index_ref))
        self.k = k
        self.point_cols = point_cols

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch["lon"].to_numpy()
        lat = batch["lat"].to_numpy()
        pids = batch[self.point_cols[0]].to_numpy()
        n = len(lon)
        out_pid, out_key, out_rank = [], [], []
        active = np.arange(n, dtype=np.int64)
        radius = np.full(n, self.r0)
        while len(active):
            al, at, ar = lon[active], lat[active], radius[active]
            qi, ei = self.tree.query_boxes(al - ar, at - ar, al + ar, at + ar)
            na = len(active)
            cand_count = np.bincount(qi, minlength=na)
            kth_d2 = np.full(na, np.inf)
            if len(qi):
                dx = self.cx[ei] - al[qi]
                dy = self.cy[ei] - at[qi]
                d2 = dx * dx + dy * dy
                order = np.lexsort((self.keys[ei], d2, qi))
                sq, se, sd2 = qi[order], ei[order], d2[order]
                newgrp = np.empty(len(sq), dtype=bool)
                newgrp[0] = True
                np.not_equal(sq[1:], sq[:-1], out=newgrp[1:])
                grp_start = np.maximum.accumulate(
                    np.where(newgrp, np.arange(len(sq)), 0)
                )
                rank = np.arange(len(sq)) - grp_start
                kth_rows = rank == np.minimum(cand_count[sq] - 1, self.k - 1)
                kth_d2[sq[kth_rows]] = sd2[kth_rows]
            resolved = (cand_count >= self.k) & (kth_d2 <= ar * ar)
            resolved |= ar >= self._MAX_R  # sparse catalog: emit what exists
            if len(qi):
                keep = (rank < self.k) & resolved[sq]
                out_pid.extend(pids[active[sq[keep]]].tolist())
                out_key.extend(self.keys[se[keep]].tolist())
                out_rank.extend((rank[keep] + 1).tolist())
            unres = ~resolved
            radius[active[unres]] *= 2.0
            active = active[unres]
        return pa.table(
            {
                "point_id": pa.array(out_pid, type=pa.int64()),
                "scene_key": pa.array(out_key, type=pa.int64()),
                "rank": pa.array(out_rank, type=pa.int64()),
            }
        )


def build_rtree_index(tab: pa.Table, k: int, fanout: int = 16) -> dict:
    """STR R-tree over scene centroids + a density-derived start radius."""
    from ..functions.rtree import STRtree

    cx = (tab["xmin"].to_numpy() + tab["xmax"].to_numpy()) / 2.0
    cy = (tab["ymin"].to_numpy() + tab["ymax"].to_numpy()) / 2.0
    n = max(len(cx), 1)
    if len(cx):
        area = max((cx.max() - cx.min()) * (cy.max() - cy.min()), 1e-12)
        r0 = max(float(np.sqrt(area * k / n)), 1e-6)
    else:
        r0 = 1.0
    return {
        "tree": STRtree(cx, cy, cx, cy, fanout=fanout),
        "cx": cx,
        "cy": cy,
        "keys": tab["scene_key"].to_numpy(),
        "r0": r0,
    }


def spatial_knn(
    scenes: Dataset,
    points: Dataset,
    k: int = 5,
    res: int = 0,
    point_cols: tuple[str, ...] = ("point_id", "lon", "lat"),
    concurrency=(1, 8),
    strategy: str = "cells",
    mode: str = "actors",
) -> Dataset:
    """k nearest scene centroids per point: rows (point_id, scene_key, rank).

    ``strategy='cells'``: expanding-ring search over the grid-cell index;
    ``strategy='rtree'``: radius-doubling batched box queries over a
    broadcast STR R-tree; ``strategy='hex'``: H3-style gridDisk
    expanding rings over the aperture-7 hex cell map (``res`` is the
    hex resolution there). Identical output by construction (same
    metric, same (distance, scene_key) tie-break).

    ``mode='tasks'`` runs the probe as stateless tasks that attach the
    broadcast index zero-copy per task instead of an actor pool — for
    small probe sets (e.g. the partitioned plan's fallback tail) the
    actor-pool ramp dominates the work, while a task starts instantly.
    """
    from .spatial import materialize_small_side

    tab = materialize_small_side(scenes, ["scene_key", "xmin", "ymin", "xmax", "ymax"])
    if strategy == "rtree":
        ref = ray.put(build_rtree_index(tab, k))
        cls = RTreeKNN
    elif strategy == "cells":
        ref = ray.put(build_centroid_index(tab, res))
        cls = CentroidKNN
    elif strategy == "hex":
        ref = ray.put(build_hex_centroid_index(tab, res if res else 2))
        cls = HexKNN
    else:
        raise ValueError(
            f"unknown strategy {strategy!r} (expected 'cells'|'rtree'|'hex')"
        )
    probes = points.select_columns(list(point_cols))
    if mode == "tasks":
        cols = tuple(point_cols)

        def _probe_task(batch: pa.Table, _ref=ref, _cls=cls) -> pa.Table:
            return _cls(_ref, k, cols)(batch)

        return probes.map_batches(_probe_task, batch_format="pyarrow")
    return probes.map_batches(
        cls,
        batch_format="pyarrow",
        concurrency=concurrency,
        fn_constructor_args=(ref, k, tuple(point_cols)),
    )


class HexKNN:
    """Actor probe: H3-style gridDisk expanding-ring kNN over the hex grid.

    The north-star's "actor pools holding ... H3 cell maps": scene
    centroids are bucketed by aperture-7 hex cell (functions/hexgrid),
    each probe expands gridDisk neighborhoods until the kth candidate
    distance fits inside the ring's correctness bound.

    Bound: hex centers at grid distance g are >= g * 1.5 * R apart
    (ring inradius of the hex lattice, R = circumradius); probe and
    candidate each sit within R of their centers, so any cell OUTSIDE
    disk(g) holds points >= (1.5 * (g + 1) - 2) * R away. Metric,
    tie-break and output contract are identical to :class:`CentroidKNN`
    — all three plans must emit the same rows.
    """

    def __init__(self, index_ref, k: int, point_cols):
        self.__dict__.update(ray.get(index_ref))
        self.k = k
        self.point_cols = point_cols

    def _axials(self, lon, lat):
        from ..functions.hexgrid import _apow, _B0_INV, _hex_round

        m = _apow(self.res).astype(np.float64) @ _B0_INV
        fq = m[0, 0] * lon + m[0, 1] * lat
        fr = m[1, 0] * lon + m[1, 1] * lat
        return _hex_round(fq, fr)

    def _candidates_disk(self, q: int, r: int, g: int) -> np.ndarray:
        from ..functions.hexgrid import _disk_offsets, axial_to_cell

        dq, dr = _disk_offsets(g)
        cells = np.sort(axial_to_cell(q + dq, r + dr, self.res))
        pos = np.searchsorted(self.unique_cells, cells)
        pos = np.clip(pos, 0, max(len(self.unique_cells) - 1, 0))
        out = []
        for c, p in zip(cells, pos):
            if len(self.unique_cells) and self.unique_cells[p] == c:
                out.append(np.arange(self.offsets[p], self.offsets[p + 1]))
        return np.concatenate(out) if out else np.zeros(0, dtype=np.int64)

    def _bulk_disk(self, lon, lat, pq, pr, G: int = 2):
        """Vectorized gridDisk(G) kNN for all probes at once + the
        unresolved mask (same shape as CentroidKNN._bulk_3x3)."""
        from ..functions.hexgrid import _disk_offsets, axial_to_cell

        n = len(lon)
        dq, dr = _disk_offsets(G)
        nd = len(dq)
        cells = axial_to_cell(
            (pq[:, None] + dq[None, :]).ravel(),
            (pr[:, None] + dr[None, :]).ravel(),
            self.res,
        )
        pos = np.searchsorted(self.unique_cells, cells)
        pos_c = np.clip(pos, 0, max(len(self.unique_cells) - 1, 0))
        hit = (
            (self.unique_cells[pos_c] == cells)
            if len(self.unique_cells)
            else np.zeros(len(cells), dtype=bool)
        )
        lo = np.where(hit, self.offsets[pos_c], 0)
        hi = np.where(hit, self.offsets[pos_c + 1], 0)
        counts = hi - lo
        total = int(counts.sum())
        if total == 0:
            return (np.zeros(0, np.int64),) * 3 + (np.ones(n, dtype=bool),)
        probe_rep = np.repeat(np.arange(n * nd, dtype=np.int64) // nd, counts)
        run_off = np.concatenate([[0], np.cumsum(counts)[:-1]])
        j = np.arange(total, dtype=np.int64) - np.repeat(run_off, counts)
        entry = np.repeat(lo, counts) + j
        dx = self.cx[entry] - lon[probe_rep]
        dy = self.cy[entry] - lat[probe_rep]
        d2 = dx * dx + dy * dy
        order = np.lexsort((self.keys[entry], d2, probe_rep))
        sp, sd2, se = probe_rep[order], d2[order], entry[order]
        newgrp = np.empty(len(sp), dtype=bool)
        newgrp[0] = True
        np.not_equal(sp[1:], sp[:-1], out=newgrp[1:])
        grp_start = np.maximum.accumulate(np.where(newgrp, np.arange(len(sp)), 0))
        rank = np.arange(len(sp)) - grp_start
        keep = rank < self.k
        cand_count = np.bincount(sp, minlength=n)
        kth_d2 = np.full(n, np.inf)
        kth_rows = keep & (rank == np.minimum(cand_count[sp] - 1, self.k - 1))
        kth_d2[sp[kth_rows]] = sd2[kth_rows]
        bound = (1.5 * (G + 1) - 2.0) * self.hex_r
        unresolved = (cand_count < self.k) | (kth_d2 > bound * bound)
        ok = keep & ~unresolved[sp]
        return sp[ok], se[ok], rank[ok] + 1, unresolved

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch["lon"].to_numpy()
        lat = batch["lat"].to_numpy()
        pids = batch[self.point_cols[0]].to_numpy()
        pq, pr = self._axials(lon, lat)
        out_pid, out_key, out_rank = [], [], []
        bp, be, br, unresolved = self._bulk_disk(lon, lat, pq, pr)
        out_pid.extend(pids[bp].tolist())
        out_key.extend(self.keys[be].tolist())
        out_rank.extend(br.tolist())
        max_g = int(540.0 / (1.5 * self.hex_r)) + 2
        for i in np.flatnonzero(unresolved):
            best = bestd = None
            for g in range(1, max_g):
                idx = self._candidates_disk(int(pq[i]), int(pr[i]), g)
                if len(idx):
                    dx = self.cx[idx] - lon[i]
                    dy = self.cy[idx] - lat[i]
                    d2 = dx * dx + dy * dy
                    order = np.lexsort((self.keys[idx], d2))[: self.k]
                    best = idx[order]
                    bestd = d2[order]
                bound = (1.5 * (g + 1) - 2.0) * self.hex_r
                if (
                    best is not None
                    and len(best) >= self.k
                    and bestd[self.k - 1] <= bound * bound
                ):
                    break
            if best is None:
                continue
            out_pid.extend([pids[i]] * len(best))
            out_key.extend(self.keys[best].tolist())
            out_rank.extend(range(1, len(best) + 1))
        return pa.table(
            {
                "point_id": pa.array(out_pid, type=pa.int64()),
                "scene_key": pa.array(out_key, type=pa.int64()),
                "rank": pa.array(out_rank, type=pa.int64()),
            }
        )


def build_hex_centroid_index(tab: pa.Table, res: int = 2) -> dict:
    """Scene centroids bucketed by aperture-7 hex cell (sorted + offsets)."""
    from ..functions.hexgrid import circumradius, hex_cell_of_points

    cx = (tab["xmin"].to_numpy() + tab["xmax"].to_numpy()) / 2.0
    cy = (tab["ymin"].to_numpy() + tab["ymax"].to_numpy()) / 2.0
    cell = hex_cell_of_points(cx, cy, res)
    order = np.argsort(cell)
    cell_sorted = cell[order]
    if len(cell_sorted):
        newgrp = np.empty(len(cell_sorted), dtype=bool)
        newgrp[0] = True
        np.not_equal(cell_sorted[1:], cell_sorted[:-1], out=newgrp[1:])
        starts = np.flatnonzero(newgrp)
        unique_cells = cell_sorted[starts]
    else:
        starts = np.zeros(0, dtype=np.int64)
        unique_cells = cell_sorted
    return {
        "res": res,
        "hex_r": circumradius(res),
        "cx": cx[order],
        "cy": cy[order],
        "keys": tab["scene_key"].to_numpy()[order],
        "unique_cells": unique_cells,
        "offsets": np.concatenate([starts, [len(cell_sorted)]]),
    }


# ------------------------------------------------- large-large plan


def partitioned_spatial_knn(
    scenes: Dataset,
    points: Dataset,
    k: int = 5,
    res: int = 0,
    halo: int = 2,
    num_partitions: int | None = None,
    point_cols: tuple[str, ...] = ("point_id", "lon", "lat"),
    replicate: str = "auto",
) -> Dataset:
    """Large-large kNN: co-partition by grid cell with halo replication.

    When the scene side is itself too large to broadcast, the
    **smaller** side replicates to every cell within Chebyshev radius
    ``halo`` ((2*halo+1)^2 copies of a 4-column row) while the larger
    side carries only its own cell; both co-partition on a salted cell
    hash and each partition resolves points against local candidates
    with the same vectorized rank kernel as :class:`CentroidKNN`.

    ``replicate='scenes'`` (the original plan) suits the
    points >> scenes regime; ``replicate='points'`` suits
    scenes >> points and adds a second, output-sized exchange that
    merges per-partition partial top-ks by point id. ``'auto'`` picks
    by read-metadata byte estimates and falls back to ``'scenes'``
    when an input's lineage hides its size (e.g. behind a groupby).

    Correctness (either side): a point's unseen candidates live in
    cells at Chebyshev distance > halo, hence >= halo * cell_size
    away; points whose kth candidate distance exceeds that bound (or
    with < k candidates) are re-resolved by the broadcast plan — the
    fallback set is the sparse tail, output-sized, and the union is
    EXACTLY the broadcast plan's rows (same metric and
    (distance, scene_key) tie-break; the spatial_knn oracle
    hash-checks it). In probe-replication mode the merged partial
    top-ks are the exact top-k of all candidates within the halo:
    every candidate cell of a point is probed by exactly one replica,
    and a group's merged row count reaches k iff the point saw >= k
    candidates (each partition emits min(cand, k) rows).
    """
    from .spatial import (
        _cell_partition,
        auto_num_partitions,
        estimate_input_bytes,
        materialize_small_side,
    )

    if num_partitions is None:
        num_partitions = auto_num_partitions(scenes, points)
    nparts = int(num_partitions)
    if replicate == "auto":
        sb = estimate_input_bytes(scenes)
        pb = estimate_input_bytes(points)
        replicate = "points" if (sb is not None and pb is not None and pb < sb) else "scenes"
    if replicate == "points":
        return _probe_replicated_knn(
            scenes, points, k, res, halo, nparts, point_cols
        )
    scale = float(1 << res)
    cell_size = 1.0 / scale
    ncols = int(360 * scale) + 2 * halo + 3
    span = np.arange(-halo, halo + 1, dtype=np.int64)
    dr = np.repeat(span, 2 * halo + 1)
    dc = np.tile(span, 2 * halo + 1)

    def _rep_scenes(batch: pa.Table) -> pa.Table:
        cx = (batch["xmin"].to_numpy() + batch["xmax"].to_numpy()) / 2.0
        cy = (batch["ymin"].to_numpy() + batch["ymax"].to_numpy()) / 2.0
        row = np.floor((cy + 90.0) * scale).astype(np.int64) + halo + 1
        col = np.floor((cx + 180.0) * scale).astype(np.int64) + halo + 1
        n = len(cx)
        nd = len(dr)
        cells = ((row[:, None] + dr[None, :]) * ncols + (col[:, None] + dc[None, :])).ravel()
        rep = np.repeat(np.arange(n, dtype=np.int64), nd)
        return pa.table(
            {
                "_cell": pa.array(cells),
                "_part": pa.array(_cell_partition(cells, nparts)),
                "_side": pa.array(np.zeros(len(cells), dtype=np.int8)),
                "point_id": pa.array(np.full(len(cells), -1, dtype=np.int64)),
                "scene_key": pa.array(batch["scene_key"].to_numpy()[rep]),
                "lon": pa.array(cx[rep]),
                "lat": pa.array(cy[rep]),
            }
        )

    def _tag_points(batch: pa.Table) -> pa.Table:
        lon = batch["lon"].to_numpy()
        lat = batch["lat"].to_numpy()
        row = np.floor((lat + 90.0) * scale).astype(np.int64) + halo + 1
        col = np.floor((lon + 180.0) * scale).astype(np.int64) + halo + 1
        cells = row * ncols + col
        return pa.table(
            {
                "_cell": pa.array(cells),
                "_part": pa.array(_cell_partition(cells, nparts)),
                "_side": pa.array(np.ones(len(cells), dtype=np.int8)),
                "point_id": pa.array(batch[point_cols[0]].to_numpy()),
                "scene_key": pa.array(np.full(len(cells), -1, dtype=np.int64)),
                "lon": pa.array(lon),
                "lat": pa.array(lat),
            }
        )

    bound2 = (halo * cell_size) ** 2

    def _local(tab: pa.Table) -> pa.Table:
        side = tab["_side"].to_numpy()
        stab = tab.filter(pa.array(side == 0))
        ptab = tab.filter(pa.array(side == 1))
        empty = pa.table(
            {
                "point_id": pa.array([], type=pa.int64()),
                "scene_key": pa.array([], type=pa.int64()),
                "rank": pa.array([], type=pa.int64()),
                "ok": pa.array([], type=pa.bool_()),
                "lon": pa.array([], type=pa.float64()),
                "lat": pa.array([], type=pa.float64()),
            }
        )
        if len(ptab) == 0:
            return empty
        pids = ptab["point_id"].to_numpy()
        if len(stab) == 0:
            return pa.table(
                {
                    "point_id": pa.array(pids),
                    "scene_key": pa.array(np.full(len(pids), -1, dtype=np.int64)),
                    "rank": pa.array(np.zeros(len(pids), dtype=np.int64)),
                    "ok": pa.array(np.zeros(len(pids), dtype=bool)),
                    "lon": ptab["lon"],
                    "lat": ptab["lat"],
                }
            )
        scell = stab["_cell"].to_numpy()
        order = np.argsort(scell, kind="stable")
        scell_sorted = scell[order]
        pcell = ptab["_cell"].to_numpy()
        lo = np.searchsorted(scell_sorted, pcell, side="left")
        hi = np.searchsorted(scell_sorted, pcell, side="right")
        counts = hi - lo
        total = int(counts.sum())
        n = len(pids)
        plon = ptab["lon"].to_numpy()
        plat = ptab["lat"].to_numpy()
        out_pid, out_key, out_rank, out_ok = [], [], [], []
        out_lon, out_lat = [], []
        if total:
            point_rep = np.repeat(np.arange(n, dtype=np.int64), counts)
            run_off = np.concatenate([[0], np.cumsum(counts)[:-1]])
            j = np.arange(total, dtype=np.int64) - np.repeat(run_off, counts)
            entry = order[np.repeat(lo, counts) + j]
            scx = stab["lon"].to_numpy()[entry]
            scy = stab["lat"].to_numpy()[entry]
            skey = stab["scene_key"].to_numpy()[entry]
            dx = scx - plon[point_rep]
            dy = scy - plat[point_rep]
            d2 = dx * dx + dy * dy
            osort = np.lexsort((skey, d2, point_rep))
            sp, sd2, sk = point_rep[osort], d2[osort], skey[osort]
            newgrp = np.empty(len(sp), dtype=bool)
            newgrp[0] = True
            np.not_equal(sp[1:], sp[:-1], out=newgrp[1:])
            grp_start = np.maximum.accumulate(np.where(newgrp, np.arange(len(sp)), 0))
            rank = np.arange(len(sp)) - grp_start
            keep = rank < k
            cand_count = np.bincount(sp, minlength=n)
            kth_d2 = np.full(n, np.inf)
            kth_rows = keep & (rank == np.minimum(cand_count[sp] - 1, k - 1))
            kth_d2[sp[kth_rows]] = sd2[kth_rows]
            resolved = (cand_count >= k) & (kth_d2 <= bound2)
            emit = keep & resolved[sp]
            out_pid.append(pids[sp[emit]])
            out_key.append(sk[emit])
            out_rank.append(rank[emit] + 1)
            out_ok.append(np.ones(int(emit.sum()), dtype=bool))
            out_lon.append(np.zeros(int(emit.sum())))
            out_lat.append(np.zeros(int(emit.sum())))
            un = np.flatnonzero(~resolved)
        else:
            un = np.arange(n)
        if len(un):
            out_pid.append(pids[un])
            out_key.append(np.full(len(un), -1, dtype=np.int64))
            out_rank.append(np.zeros(len(un), dtype=np.int64))
            out_ok.append(np.zeros(len(un), dtype=bool))
            # unresolved rows carry their coordinates so the fallback
            # probes come straight from pass1 (no points re-scan)
            out_lon.append(plon[un])
            out_lat.append(plat[un])
        return pa.table(
            {
                "point_id": pa.array(np.concatenate(out_pid)),
                "scene_key": pa.array(np.concatenate(out_key)),
                "rank": pa.array(np.concatenate(out_rank)),
                "ok": pa.array(np.concatenate(out_ok)),
                "lon": pa.array(np.concatenate(out_lon)),
                "lat": pa.array(np.concatenate(out_lat)),
            }
        )

    tagged = scenes.select_columns(
        ["scene_key", "xmin", "ymin", "xmax", "ymax"]
    ).map_batches(_rep_scenes, batch_format="pyarrow").union(
        points.select_columns(list(point_cols)).map_batches(
            _tag_points, batch_format="pyarrow"
        )
    )
    pass1 = (
        tagged.groupby("_part")
        .map_groups(_local, batch_format="pyarrow")
        .materialize()  # output-sized (k rows per resolved point)
    )
    def _keep_ok(batch: pa.Table) -> pa.Table:
        return batch.filter(batch["ok"]).select(["point_id", "scene_key", "rank"])

    def _keep_bad(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.invert(batch["ok"].combine_chunks())).select(
            ["point_id", "lon", "lat"]
        )

    resolved = pass1.map_batches(_keep_ok, batch_format="pyarrow")
    # sparse tail: unresolved probes (with coordinates) come straight
    # from the materialized pass1 — the points pipeline never re-runs
    tail_pts = pass1.map_batches(_keep_bad, batch_format="pyarrow")
    if tail_pts.count() == 0:
        return resolved
    tail = spatial_knn(
        scenes, tail_pts, k=k, res=res,
        point_cols=("point_id", "lon", "lat"), strategy="cells", mode="tasks",
    )
    return resolved.union(tail)


def _probe_replicated_knn(
    scenes: Dataset,
    points: Dataset,
    k: int,
    res: int,
    halo: int,
    nparts: int,
    point_cols: tuple[str, ...],
) -> Dataset:
    """Probe-replication plan: points copy to their halo cells, scenes
    stay in their own cell — the exchange carries (2*halo+1)^2 copies of
    the SMALL side plus one copy of the large side, instead of 25x the
    150k-scene catalog for a 2.6k-point probe set (17x fewer rows at
    the bench shape). A second output-sized exchange merges the
    per-partition partial top-ks per point id.
    """
    from .spatial import _cell_partition

    scale = float(1 << res)
    cell_size = 1.0 / scale
    ncols = int(360 * scale) + 2 * halo + 3
    span = np.arange(-halo, halo + 1, dtype=np.int64)
    dr = np.repeat(span, 2 * halo + 1)
    dc = np.tile(span, 2 * halo + 1)
    nd = len(dr)
    marker_off = (dr == 0) & (dc == 0)
    bound2 = (halo * cell_size) ** 2
    pid_col = point_cols[0]

    def _tag_scenes(batch: pa.Table) -> pa.Table:
        cx = (batch["xmin"].to_numpy() + batch["xmax"].to_numpy()) / 2.0
        cy = (batch["ymin"].to_numpy() + batch["ymax"].to_numpy()) / 2.0
        row = np.floor((cy + 90.0) * scale).astype(np.int64) + halo + 1
        col = np.floor((cx + 180.0) * scale).astype(np.int64) + halo + 1
        cells = row * ncols + col
        n = len(cx)
        return pa.table(
            {
                "_cell": pa.array(cells),
                "_part": pa.array(_cell_partition(cells, nparts)),
                "_side": pa.array(np.zeros(n, dtype=np.int8)),
                "point_id": pa.array(np.full(n, -1, dtype=np.int64)),
                "scene_key": pa.array(batch["scene_key"].to_numpy()),
                "lon": pa.array(cx),
                "lat": pa.array(cy),
                "_marker": pa.array(np.zeros(n, dtype=bool)),
            }
        )

    def _rep_points(batch: pa.Table) -> pa.Table:
        lon = batch[point_cols[1]].to_numpy()
        lat = batch[point_cols[2]].to_numpy()
        row = np.floor((lat + 90.0) * scale).astype(np.int64) + halo + 1
        col = np.floor((lon + 180.0) * scale).astype(np.int64) + halo + 1
        n = len(lon)
        cells = ((row[:, None] + dr[None, :]) * ncols + (col[:, None] + dc[None, :])).ravel()
        rep = np.repeat(np.arange(n, dtype=np.int64), nd)
        return pa.table(
            {
                "_cell": pa.array(cells),
                "_part": pa.array(_cell_partition(cells, nparts)),
                "_side": pa.array(np.ones(len(cells), dtype=np.int8)),
                "point_id": pa.array(batch[pid_col].to_numpy()[rep]),
                "scene_key": pa.array(np.full(len(cells), -1, dtype=np.int64)),
                "lon": pa.array(lon[rep]),
                "lat": pa.array(lat[rep]),
                "_marker": pa.array(np.tile(marker_off, n)),
            }
        )

    partial_schema = {
        "point_id": pa.int64(),
        "scene_key": pa.int64(),
        "d2": pa.float64(),
        "marker": pa.bool_(),
        "lon": pa.float64(),
        "lat": pa.float64(),
    }
    from .groups import empty_table

    def _local_partial(tab: pa.Table) -> pa.Table:
        side = tab["_side"].to_numpy()
        stab = tab.filter(pa.array(side == 0))
        ptab = tab.filter(pa.array(side == 1))
        outs = []
        if len(ptab):
            mk = ptab["_marker"].to_numpy()
            if mk.any():
                mtab = ptab.filter(pa.array(mk))
                nm = len(mtab)
                outs.append(
                    pa.table(
                        {
                            "point_id": mtab["point_id"],
                            "scene_key": pa.array(np.full(nm, -1, dtype=np.int64)),
                            "d2": pa.array(np.full(nm, np.inf)),
                            "marker": pa.array(np.ones(nm, dtype=bool)),
                            "lon": mtab["lon"],
                            "lat": mtab["lat"],
                        }
                    )
                )
        if len(ptab) and len(stab):
            scell = stab["_cell"].to_numpy()
            order = np.argsort(scell, kind="stable")
            scell_sorted = scell[order]
            pcell = ptab["_cell"].to_numpy()
            lo = np.searchsorted(scell_sorted, pcell, side="left")
            hi = np.searchsorted(scell_sorted, pcell, side="right")
            counts = hi - lo
            total = int(counts.sum())
            if total:
                n = len(pcell)
                plon = ptab["lon"].to_numpy()
                plat = ptab["lat"].to_numpy()
                pids = ptab["point_id"].to_numpy()
                rep_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
                run_off = np.concatenate([[0], np.cumsum(counts)[:-1]])
                j = np.arange(total, dtype=np.int64) - np.repeat(run_off, counts)
                entry = order[np.repeat(lo, counts) + j]
                scx = stab["lon"].to_numpy()[entry]
                scy = stab["lat"].to_numpy()[entry]
                skey = stab["scene_key"].to_numpy()[entry]
                dx = scx - plon[rep_idx]
                dy = scy - plat[rep_idx]
                d2 = dx * dx + dy * dy
                # rank within each REPLICA row (one probed cell each);
                # capping at k per replica keeps the exact top-k property
                # of the later merge (see partitioned_spatial_knn doc)
                osort = np.lexsort((skey, d2, rep_idx))
                sp, sd2, sk = rep_idx[osort], d2[osort], skey[osort]
                newgrp = np.empty(len(sp), dtype=bool)
                newgrp[0] = True
                np.not_equal(sp[1:], sp[:-1], out=newgrp[1:])
                grp_start = np.maximum.accumulate(
                    np.where(newgrp, np.arange(len(sp)), 0)
                )
                rank = np.arange(len(sp)) - grp_start
                keep = rank < k
                ne = int(keep.sum())
                outs.append(
                    pa.table(
                        {
                            "point_id": pa.array(pids[sp[keep]]),
                            "scene_key": pa.array(sk[keep]),
                            "d2": pa.array(sd2[keep]),
                            "marker": pa.array(np.zeros(ne, dtype=bool)),
                            "lon": pa.array(np.zeros(ne)),
                            "lat": pa.array(np.zeros(ne)),
                        }
                    )
                )
        if not outs:
            return empty_table(partial_schema)
        return pa.concat_tables(outs)

    merge_parts = min(64, nparts)

    def _tag_merge(batch: pa.Table) -> pa.Table:
        pid = batch["point_id"].to_numpy()
        return batch.append_column(
            "_p2", pa.array(_cell_partition(pid, merge_parts))
        )

    out_schema = {
        "point_id": pa.int64(),
        "scene_key": pa.int64(),
        "rank": pa.int64(),
        "ok": pa.bool_(),
        "lon": pa.float64(),
        "lat": pa.float64(),
    }

    def _merge(tab: pa.Table) -> pa.Table:
        mk = tab["marker"].to_numpy()
        cand = tab.filter(pa.array(~mk))
        mtab = tab.filter(pa.array(mk))
        mpid = mtab["point_id"].to_numpy()
        morder = np.argsort(mpid, kind="stable")
        mpid_sorted = mpid[morder]
        mlon = mtab["lon"].to_numpy()[morder]
        mlat = mtab["lat"].to_numpy()[morder]
        resolved_mask = np.zeros(len(mpid_sorted), dtype=bool)
        outs = []
        if len(cand):
            pid = cand["point_id"].to_numpy()
            d2 = cand["d2"].to_numpy()
            skey = cand["scene_key"].to_numpy()
            osort = np.lexsort((skey, d2, pid))
            sp, sd2, sk = pid[osort], d2[osort], skey[osort]
            newgrp = np.empty(len(sp), dtype=bool)
            newgrp[0] = True
            np.not_equal(sp[1:], sp[:-1], out=newgrp[1:])
            grp_start = np.maximum.accumulate(np.where(newgrp, np.arange(len(sp)), 0))
            rank = np.arange(len(sp)) - grp_start
            starts = np.flatnonzero(newgrp)
            counts = np.diff(np.concatenate([starts, [len(sp)]]))
            grp_of = np.cumsum(newgrp) - 1
            kth_rows = rank == np.minimum(counts[grp_of] - 1, k - 1)
            grp_kth_d2 = sd2[np.flatnonzero(kth_rows)]  # one per group, in order
            grp_ok = (counts >= k) & (grp_kth_d2 <= bound2)
            emit = (rank < k) & grp_ok[grp_of]
            ne = int(emit.sum())
            outs.append(
                pa.table(
                    {
                        "point_id": pa.array(sp[emit]),
                        "scene_key": pa.array(sk[emit]),
                        "rank": pa.array(rank[emit] + 1),
                        "ok": pa.array(np.ones(ne, dtype=bool)),
                        "lon": pa.array(np.zeros(ne)),
                        "lat": pa.array(np.zeros(ne)),
                    }
                )
            )
            ok_pids = sp[starts[grp_ok]]
            resolved_mask[np.searchsorted(mpid_sorted, ok_pids)] = True
        un = np.flatnonzero(~resolved_mask)
        if len(un):
            outs.append(
                pa.table(
                    {
                        "point_id": pa.array(mpid_sorted[un]),
                        "scene_key": pa.array(np.full(len(un), -1, dtype=np.int64)),
                        "rank": pa.array(np.zeros(len(un), dtype=np.int64)),
                        "ok": pa.array(np.zeros(len(un), dtype=bool)),
                        "lon": pa.array(mlon[un]),
                        "lat": pa.array(mlat[un]),
                    }
                )
            )
        if not outs:
            return empty_table(out_schema)
        return pa.concat_tables(outs)

    tagged = scenes.select_columns(
        ["scene_key", "xmin", "ymin", "xmax", "ymax"]
    ).map_batches(_tag_scenes, batch_format="pyarrow").union(
        points.select_columns(list(point_cols)).map_batches(
            _rep_points, batch_format="pyarrow"
        )
    )
    pass2 = (
        tagged.groupby("_part")
        .map_groups(_local_partial, batch_format="pyarrow")
        .map_batches(_tag_merge, batch_format="pyarrow")
        .groupby("_p2")
        .map_groups(_merge, batch_format="pyarrow")
        .materialize()  # output-sized (k rows per resolved point + tail probes)
    )

    def _keep_ok(batch: pa.Table) -> pa.Table:
        return batch.filter(batch["ok"]).select(["point_id", "scene_key", "rank"])

    def _keep_bad(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.invert(batch["ok"].combine_chunks())).select(
            ["point_id", "lon", "lat"]
        )

    resolved = pass2.map_batches(_keep_ok, batch_format="pyarrow")
    tail_pts = pass2.map_batches(_keep_bad, batch_format="pyarrow")
    if tail_pts.count() == 0:
        return resolved
    tail = spatial_knn(
        scenes, tail_pts, k=k, res=res,
        point_cols=("point_id", "lon", "lat"), strategy="cells", mode="tasks",
    )
    return resolved.union(tail)
