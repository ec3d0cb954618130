"""Spatial join stages: cell-cover prefilter + exact refine.

The engine's core wide operation (reference semantics:
``Archive.select(vectorobject=...)``, pyroSAR/archive.py:1058-1073 —
scenes whose footprint intersects a query geometry). Two physical plans:

1. **Partitioned join** (both sides large): scenes flat-expand to their
   grid-cell cover, points get their containing cell, the two Datasets
   hash-join on ``cell`` (Ray's hash-shuffle join), and an exact
   vectorized bbox/polygon refine drops false positives. A point lies in
   exactly one cell, so no pair-dedup pass is needed.
2. **Broadcast semi-join** (single/small query side): the query rings go
   through ``ray.put`` once; every map_batches task filters its batch
   against them — no shuffle. This is the plan for the reference's
   one-polygon ``select`` path.

Skew note (coastal/polar hotspots): the join key is the grid cell; hot
cells can be salted by bumping ``res`` (4x cells per step) — cover and
point cells stay consistent because both sides use the same resolution.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset

from ..functions.cells import cell_cover_bbox, cell_of_points
from ..functions.geometry import bbox_ring, convex_intersects, wkb_to_ring


def add_point_cells(points: Dataset, res: int = 0) -> Dataset:
    """Append the containing grid-cell id to a (lon, lat) point Dataset."""

    def _cells(batch: pa.Table) -> pa.Table:
        cells = cell_of_points(batch["lon"].to_numpy(), batch["lat"].to_numpy(), res)
        return batch.append_column("cell", pa.array(cells, type=pa.int64()))

    return points.map_batches(_cells, batch_format="pyarrow")


def expand_scene_cells(scenes: Dataset, res: int = 0) -> Dataset:
    """Flat-expand scenes to one row per (scene, covered cell)."""

    def _cover(batch: pa.Table) -> pa.Table:
        row_idx, cells = cell_cover_bbox(
            batch["xmin"].to_numpy(),
            batch["ymin"].to_numpy(),
            batch["xmax"].to_numpy(),
            batch["ymax"].to_numpy(),
            res,
        )
        taken = batch.take(pa.array(row_idx))
        return taken.append_column("cell", pa.array(cells, type=pa.int64()))

    return scenes.map_batches(_cover, batch_format="pyarrow")


def refine_bbox(batch: pa.Table) -> pa.Table:
    """Exact point-in-bbox refine after the cell prefilter (vectorized)."""
    lon = batch["lon"].to_numpy()
    lat = batch["lat"].to_numpy()
    keep = (
        (lon >= batch["xmin"].to_numpy())
        & (lon < batch["xmax"].to_numpy())
        & (lat >= batch["ymin"].to_numpy())
        & (lat < batch["ymax"].to_numpy())
    )
    return batch.filter(pa.array(keep))


def spatial_join_points(
    scenes: Dataset,
    points: Dataset,
    num_partitions: int = 32,
    res: int = 0,
    scene_cols: tuple[str, ...] = ("scene_key", "outname_base", "xmin", "ymin", "xmax", "ymax"),
    point_cols: tuple[str, ...] = ("point_id", "lon", "lat"),
) -> Dataset:
    """Inner spatial join: (scene, point) pairs where the point falls in
    the scene bbox. Hash-partitioned on the grid cell; exact refine after."""
    s = expand_scene_cells(scenes.select_columns(list(scene_cols)), res)
    p = add_point_cells(points.select_columns(list(point_cols)), res)
    joined = s.join(
        p,
        join_type="inner",
        num_partitions=num_partitions,
        on=("cell",),
    )
    return joined.map_batches(refine_bbox, batch_format="pyarrow").drop_columns(["cell"])


def broadcast_polygon_filter(
    scenes: Dataset, query_ring_wkb: bytes, exact: bool = True
) -> Dataset:
    """Semi-join of scenes against ONE query polygon (broadcast, no shuffle).

    Mirrors Archive.select(vectorobject=...): keep scenes whose footprint
    intersects the query. Prefilter on bbox overlap; exact refine tests
    the scene's corner points and the query's vertices (sufficient for
    convex footprints vs convex query).
    """
    ref = ray.put(query_ring_wkb)

    class _Filter:
        def __init__(self):
            self.ring = wkb_to_ring(ray.get(ref))
            self.qxmin, self.qymin = self.ring.min(axis=0)
            self.qxmax, self.qymax = self.ring.max(axis=0)

        def __call__(self, batch: pa.Table) -> pa.Table:
            xmin = batch["xmin"].to_numpy()
            ymin = batch["ymin"].to_numpy()
            xmax = batch["xmax"].to_numpy()
            ymax = batch["ymax"].to_numpy()
            keep = (
                (xmin <= self.qxmax)
                & (xmax >= self.qxmin)
                & (ymin <= self.qymax)
                & (ymax >= self.qymin)
            )
            if exact:
                # exact separating-axis test, bbox-prefiltered candidates only
                idx = np.flatnonzero(keep)
                for i in idx:
                    box = bbox_ring(xmin[i], ymin[i], xmax[i], ymax[i])
                    if not convex_intersects(box, self.ring):
                        keep[i] = False
            return batch.filter(pa.array(keep))

    return scenes.map_batches(_Filter, batch_format="pyarrow", concurrency=2)
