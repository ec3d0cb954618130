"""Tile-assignment stages: bbox → 1° tiles, with skew-aware aggregation.

Reference semantics: ID.getHGT (pyroSAR/drivers.py:535-558) per scene;
at engine scale the expansion runs loop-free inside map_batches and the
per-tile aggregate uses the partial-combine pattern (one partial row per
tile per batch) so hot coastal/polar tiles never concentrate raw rows on
one reducer — the groupby shuffles pre-combined partials only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset
from ray.data.aggregate import Sum

from ..functions.tiles import expand_bbox_tiles, tile_names_1deg


def assign_tiles(
    scenes: Dataset,
    keep_cols: tuple[str, ...] = ("scene_key", "outname_base"),
) -> Dataset:
    """Flat-expand each scene bbox to one row per overlapping 1° tile.

    Output columns: *keep_cols, tile (``N51E011`` grammar, reference
    naming order preserved within each scene).
    """
    cols = list(keep_cols) + ["xmin", "ymin", "xmax", "ymax"]

    def _expand(batch: pa.Table) -> pa.Table:
        row_idx, lat, lon = expand_bbox_tiles(
            batch["xmin"].to_numpy(),
            batch["xmax"].to_numpy(),
            batch["ymin"].to_numpy(),
            batch["ymax"].to_numpy(),
        )
        taken = batch.select(list(keep_cols)).take(pa.array(row_idx))
        return taken.append_column("tile", pa.array(tile_names_1deg(lat, lon)))

    return scenes.select_columns(cols).map_batches(_expand, batch_format="pyarrow")


def tile_counts(tile_rows: Dataset, combine: str = "driver") -> Dataset:
    """Per-tile row counts via partial aggregation.

    map_batches emits one (tile, partial n) row per tile per batch; the
    1° tile key space is globally BOUNDED (≤ 64800 land/sea cells), so
    the partial stream is tiny relative to the input no matter how big
    the input is.

    ``combine='driver'`` (default): final merge of the bounded partials
    happens driver-side — no all-to-all shuffle at all; right whenever
    #blocks × #tiles stays driver-sized. ``combine='shuffle'``: a
    groupby-Sum shuffle of the partials — the fully distributed path for
    unbounded key spaces or very high block counts.
    """

    def _partial(batch: pa.Table) -> pa.Table:
        tiles, counts = np.unique(np.asarray(batch["tile"]), return_counts=True)
        return pa.table({"tile": pa.array(tiles), "n": pa.array(counts.astype(np.int64))})

    partials = tile_rows.map_batches(_partial, batch_format="pyarrow")
    if combine == "shuffle":
        return partials.groupby("tile").aggregate(Sum("n", alias_name="n_scenes"))
    import ray.data

    df = partials.to_pandas()
    out = (
        df.groupby("tile", as_index=False)["n"].sum().rename(columns={"n": "n_scenes"})
    )
    return ray.data.from_pandas(out)


def tile_counts_indexed(tile_rows: Dataset, col: str = "tile_idx") -> Dataset:
    """Per-tile counts over an INTEGER tile index column.

    The scale-path variant of :func:`tile_counts`: the hot pipeline
    carries int64 cell indices (no per-row string materialization);
    names are attached only to the ≤ 64800 distinct aggregated rows at
    the very end (driver-side, bounded).
    """

    def _partial(batch: pa.Table) -> pa.Table:
        idx, counts = np.unique(batch[col].to_numpy(), return_counts=True)
        return pa.table({col: pa.array(idx), "n": pa.array(counts.astype(np.int64))})

    partials = tile_rows.map_batches(_partial, batch_format="pyarrow")
    import ray.data

    from ..functions.tiles import tile_name_from_index

    df = partials.to_pandas()
    out = df.groupby(col, as_index=False)["n"].sum().rename(columns={"n": "n_scenes"})
    out["tile"] = tile_name_from_index(out[col].to_numpy())
    return ray.data.from_pandas(out[["tile", "n_scenes"]])


def tile_coverage(scenes: Dataset, combine: str = "driver") -> Dataset:
    """Per-tile scene count + EXACT covered area (tile-overlap semantics).

    The planning statistic behind tile-overlap decisions (reference
    Archive.select / getHGT pick tiles by bbox overlap; a scheduler
    additionally needs HOW MUCH of each tile is covered): for every
    (scene bbox, 1° tile) pair from the flat expansion, the rectangle
    intersection area — in integer CENTIDEGREE² so distributed Sum is
    order-independent and bit-exact against the SQL twin (scene coords
    are exact multiples of 0.01°; float summation would hash-diverge
    between partial orders). ``coverage`` = covered_cdeg2 / 10⁴ — total
    covered area in tile-area units (exceeds 1 where scenes overlap);
    one double division AFTER the integer sum keeps it twin-exact.

    Same bounded-key partial-combine plan as :func:`tile_counts`: one
    (tile, n, area) partial per tile per batch; ``combine='driver'``
    merges the ≤64800-key partial stream driver-side, ``'shuffle'``
    runs a groupby-Sum for very high block counts.
    """

    def _partial(batch: pa.Table) -> pa.Table:
        xmin = batch["xmin"].to_numpy()
        xmax = batch["xmax"].to_numpy()
        ymin = batch["ymin"].to_numpy()
        ymax = batch["ymax"].to_numpy()
        row_idx, lat, lon = expand_bbox_tiles(xmin, xmax, ymin, ymax)
        # exact centidegree integers (coords are multiples of 0.01)
        cx0 = np.round(xmin * 100.0).astype(np.int64)[row_idx]
        cx1 = np.round(xmax * 100.0).astype(np.int64)[row_idx]
        cy0 = np.round(ymin * 100.0).astype(np.int64)[row_idx]
        cy1 = np.round(ymax * 100.0).astype(np.int64)[row_idx]
        w = np.minimum(cx1, (lon + 1) * 100) - np.maximum(cx0, lon * 100)
        h = np.minimum(cy1, (lat + 1) * 100) - np.maximum(cy0, lat * 100)
        area = w * h
        cell = (lat + 90) * 361 + (lon + 180)
        uniq, inv = np.unique(cell, return_inverse=True)
        n = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        a = np.bincount(inv, weights=area, minlength=len(uniq)).astype(np.int64)
        return pa.table(
            {
                "tile": pa.array(tile_names_1deg(uniq // 361 - 90, uniq % 361 - 180)),
                "n": pa.array(n),
                "a": pa.array(a),
            }
        )

    partials = scenes.select_columns(["xmin", "ymin", "xmax", "ymax"]).map_batches(
        _partial, batch_format="pyarrow"
    )
    if combine == "shuffle":
        merged = partials.groupby("tile").aggregate(
            Sum("n", alias_name="n_scenes"), Sum("a", alias_name="covered_cdeg2")
        )

        def _frac(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "coverage",
                pa.array(batch["covered_cdeg2"].to_numpy() / 10000.0),
            )

        return merged.map_batches(_frac, batch_format="pyarrow")
    import ray.data

    df = partials.to_pandas()
    if df.empty:
        df = pd.DataFrame({"tile": pd.Series(dtype="object"),
                           "n": pd.Series(dtype="int64"),
                           "a": pd.Series(dtype="int64")})
    out = (
        df.groupby("tile", as_index=False)[["n", "a"]]
        .sum()
        .rename(columns={"n": "n_scenes", "a": "covered_cdeg2"})
    )
    out["coverage"] = out["covered_cdeg2"].to_numpy() / 10000.0
    return ray.data.from_pandas(out)


def salted_group_apply(
    ds: Dataset,
    key: str,
    fn,
    num_salts: int = 8,
    batch_format: str = "pandas",
) -> Dataset:
    """Two-phase salted groupby for per-group functions with hot keys.

    Phase 1 groups on (key, salt) — hot keys split across ``num_salts``
    reducers — applying ``fn`` per sub-group; phase 2 re-groups phase-1
    results on the bare key and applies ``fn`` again. ``fn`` must be a
    combinable reduction (e.g. partial counts/min/max rows).
    """

    def _salt(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["_salt"] = np.arange(len(batch)) % num_salts
        return batch

    salted = ds.map_batches(_salt, batch_format="pandas")
    phase1 = salted.groupby([key, "_salt"]).map_groups(
        lambda g: fn(g.drop(columns=["_salt"])), batch_format=batch_format
    )
    return phase1.groupby(key).map_groups(fn, batch_format=batch_format)


def tile_areal_transfer(
    scenes: Dataset, attr_col: str = "attr_c"
) -> Dataset:
    """Areal interpolation (the GIS attribute-transfer op): distribute
    an extensive per-scene quantity onto the 1° tile grid proportional
    to the EXACT rectangle overlap. Per (scene, tile) pair the
    transferred amount is ``(attr_c · overlap_cd2) // area_cd2`` — one
    deterministic floor per pair, so the per-scene rounding loss is
    bounded by its tile count in attr units (disclosed, not hidden in
    float error) — followed by an order-independent integer Sum per
    tile (same bounded-key partial-combine plan as tile_coverage).

    Output: (tile, n_scenes, transferred_u).
    """

    def _partial(batch: pa.Table) -> pa.Table:
        xmin = batch["xmin"].to_numpy()
        xmax = batch["xmax"].to_numpy()
        ymin = batch["ymin"].to_numpy()
        ymax = batch["ymax"].to_numpy()
        attr = batch[attr_col].to_numpy().astype(np.int64)
        row_idx, lat, lon = expand_bbox_tiles(xmin, xmax, ymin, ymax)
        cx0 = np.round(xmin * 100.0).astype(np.int64)[row_idx]
        cx1 = np.round(xmax * 100.0).astype(np.int64)[row_idx]
        cy0 = np.round(ymin * 100.0).astype(np.int64)[row_idx]
        cy1 = np.round(ymax * 100.0).astype(np.int64)[row_idx]
        w = np.minimum(cx1, (lon + 1) * 100) - np.maximum(cx0, lon * 100)
        h = np.minimum(cy1, (lat + 1) * 100) - np.maximum(cy0, lat * 100)
        term = attr[row_idx] * (w * h) // ((cx1 - cx0) * (cy1 - cy0))
        cell = (lat + 90) * 361 + (lon + 180)
        uniq, inv = np.unique(cell, return_inverse=True)
        n = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        t = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(t, inv, term)
        return pa.table(
            {"cell": pa.array(uniq), "n": pa.array(n), "t": pa.array(t)}
        )

    def _render(batch: pa.Table) -> pa.Table:
        cell = batch["cell"].to_numpy()
        return pa.table(
            {
                "tile": pa.array(
                    tile_names_1deg(cell // 361 - 90, cell % 361 - 180)
                ),
                "n_scenes": batch["n"],
                "transferred_u": batch["t"],
            }
        )

    from .agg import keyed_sum

    # keyed_sum over the integer cell (then render names row-local):
    # the sort-based groupby over ~44k STRING tile keys x blocks of
    # partials held most of this query's wall time at sf0.1
    return keyed_sum(
        scenes.select_columns(["xmin", "ymin", "xmax", "ymax", attr_col])
        .map_batches(_partial, batch_format="pyarrow"),
        "cell", ["n", "t"],
    ).map_batches(_render, batch_format="pyarrow")
