"""Raster → vector footprint extraction (north_star named surface).

The reference derives scene footprints from raster valid-data masks via
GDAL polygonize + linesimplify (reference linesimplify.py /
polysimplify.py feed the border handling in snap/util.py); this engine
expresses the same operation as an actor-pool ``map_batches`` stage:

- ``footprint_spans``: per valid raster row, the [x_min, x_max] span of
  non-nodata pixels — the exact boundary chain of a (quasi-convex) SAR
  footprint, integer-exact and hash-checkable
- ``footprint_polygons``: the spans closed into a CCW boundary ring
  (right chain top→bottom, left chain bottom→top) and reduced with the
  engine's Visvalingam-Whyatt simplifier (functions/simplify.py), the
  reference's footprint-reduction semantics

Everything is vectorized: the mask reduction is three numpy ops per
image; no per-pixel Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset


def _spans_for(arr: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(h, w) mask → (valid row idx, x_min per row, x_max per row)."""
    valid = arr > 0
    any_row = valid.any(axis=1)
    ys = np.flatnonzero(any_row)
    if len(ys) == 0:
        return ys, ys, ys
    sub = valid[ys]
    x_min = sub.argmax(axis=1)
    x_max = sub.shape[1] - 1 - sub[:, ::-1].argmax(axis=1)
    return ys, x_min, x_max


class FootprintSpans:
    """Actor-pool stage: decode single-band rasters, emit one row per
    valid raster line with its [x_min, x_max] span + the line's valid
    pixel count (span length for convex rows — checked upstream by the
    synthesis contract, asserted here by a mask popcount)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, ys, mins, maxs, counts = [], [], [], [], []
        for iid, blob, w, h in zip(
            batch["image_id"].to_pylist(),
            batch["bytes"].to_pylist(),
            batch["w"].to_numpy(),
            batch["h"].to_numpy(),
        ):
            arr = np.frombuffer(blob, dtype=np.uint8).reshape(int(h), int(w))
            yy, x0, x1 = _spans_for(arr)
            n = (arr[yy] > 0).sum(axis=1) if len(yy) else yy
            ids.extend([iid] * len(yy))
            ys.extend(yy.tolist())
            mins.extend(x0.tolist())
            maxs.extend(x1.tolist())
            counts.extend(np.asarray(n).tolist())
        return pa.table(
            {
                "image_id": pa.array(ids, type=pa.string()),
                "y": pa.array(ys, type=pa.int64()),
                "x_min": pa.array(mins, type=pa.int64()),
                "x_max": pa.array(maxs, type=pa.int64()),
                "n_valid": pa.array(counts, type=pa.int64()),
            }
        )


def footprint_spans(
    rasters: Dataset, concurrency=(1, 8), batch_size: int = 64
) -> Dataset:
    """Raster mask → per-line boundary spans (the vector footprint)."""
    return rasters.map_batches(
        FootprintSpans,
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )


class FootprintPolygons:
    """Actor-pool stage: spans → closed CCW ring → VW-simplified ring.

    Emits per image: the full ring length, the simplified ring length at
    the requested point budget, the ring's shoelace area (equals the
    valid-pixel area measure for span-built rings), and the simplified
    ring WKT.
    """

    def __init__(self, max_points: int = 12):
        self.max_points = max_points

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.simplify import VWSimplifier

        ids, ring_n, simp_n, areas, wkts = [], [], [], [], []
        for iid, blob, w, h in zip(
            batch["image_id"].to_pylist(),
            batch["bytes"].to_pylist(),
            batch["w"].to_numpy(),
            batch["h"].to_numpy(),
        ):
            arr = np.frombuffer(blob, dtype=np.uint8).reshape(int(h), int(w))
            yy, x0, x1 = _spans_for(arr)
            if len(yy) == 0:
                continue
            # right chain top→bottom, then left chain bottom→top (CCW in
            # image coordinates with y down ⇔ CW on screen; consistent)
            right = np.stack([x1 + 1, yy], axis=1)  # pixel right edges
            left = np.stack([x0[::-1], yy[::-1]], axis=1)
            ring = np.concatenate([right, left]).astype(np.float64)
            shifted = np.roll(ring, -1, axis=0)
            area = 0.5 * abs(
                float(np.sum(ring[:, 0] * shifted[:, 1] - shifted[:, 0] * ring[:, 1]))
            )
            simplified = VWSimplifier(ring).from_number(self.max_points)
            ids.append(iid)
            ring_n.append(len(ring))
            simp_n.append(len(simplified))
            areas.append(area)
            wkts.append(
                "POLYGON (("
                + ", ".join(f"{x:g} {y:g}" for x, y in simplified)
                + f", {simplified[0][0]:g} {simplified[0][1]:g}))"
            )
        return pa.table(
            {
                "image_id": pa.array(ids, type=pa.string()),
                "ring_points": pa.array(ring_n, type=pa.int64()),
                "simplified_points": pa.array(simp_n, type=pa.int64()),
                "area": pa.array(areas, type=pa.float64()),
                "wkt": pa.array(wkts, type=pa.string()),
            }
        )


def footprint_polygons(
    rasters: Dataset, max_points: int = 12, concurrency=(1, 8), batch_size: int = 64
) -> Dataset:
    return rasters.map_batches(
        FootprintPolygons,
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
        fn_constructor_args=(max_points,),
    )


# ------------------------------------------------- vector -> raster


def rasterize_quads(
    scenes: Dataset,
    res: int = 2,
    key_col: str = "scene_key",
) -> Dataset:
    """Burn convex quad footprints into the flat grid (vector → raster).

    The inverse of the footprint extraction above: center-sample
    rasterization (a cell is covered when its CENTER lies inside the
    quad — GDAL's default all_touched=False convention). Per batch the
    candidate cells come from the bbox cover expansion
    (functions/cells.cell_cover_bbox) and the center test is the exact
    4-edge cross-product kernel over IEEE-identical center coordinates
    ``(idx + 0.5) / scale - offset`` — so a SQL twin reproduces the
    burned cell set bit-for-bit. Output rows: ``(key, row, col)``.

    Row-local (cover + mask per batch, no shuffle); output volume is
    the burned-cell count, the raster's natural size.
    """
    from ..functions.cells import cell_cover_bbox

    scale = float(1 << res)

    def _burn(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key_col: pa.array([], type=pa.int64()),
                "row": pa.array([], type=pa.int64()),
                "col": pa.array([], type=pa.int64()),
            }
        )
        if len(batch) == 0:
            return empty
        row_idx, cells = cell_cover_bbox(
            batch["xmin"].to_numpy(),
            batch["ymin"].to_numpy(),
            batch["xmax"].to_numpy(),
            batch["ymax"].to_numpy(),
            res,
        )
        if len(cells) == 0:
            return empty
        rows = (cells >> 28) & ((1 << 28) - 1)
        cols = cells & ((1 << 28) - 1)
        cx = (cols + 0.5) / scale - 180.0
        cy = (rows + 0.5) / scale - 90.0
        keep = np.ones(len(cells), dtype=bool)
        qx = [batch[c].to_numpy()[row_idx] for c in ("qax", "qbx", "qcx", "qdx")]
        qy = [batch[c].to_numpy()[row_idx] for c in ("qay", "qby", "qcy", "qdy")]
        for e in range(4):
            ax, ay = qx[e], qy[e]
            bx, by = qx[(e + 1) % 4], qy[(e + 1) % 4]
            keep &= (bx - ax) * (cy - ay) - (by - ay) * (cx - ax) >= 0
        return pa.table(
            {
                key_col: pa.array(batch[key_col].to_numpy()[row_idx][keep]),
                "row": pa.array(rows[keep]),
                "col": pa.array(cols[keep]),
            }
        )

    return scenes.map_batches(_burn, batch_format="pyarrow")
