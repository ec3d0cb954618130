"""Z-order clustered write + min/max-stats data skipping.

The storage-side half of "prune at the read": cluster rows by their
Morton key so spatially-close rows land in the same row groups, then
answer bbox queries by reading ONLY the row groups whose per-column
min/max footer statistics can intersect the box. Without clustering,
every row group's (lon, lat) envelope spans the whole world and
nothing skips; with it, a small box touches a handful of groups — the
same mechanism lakehouse Z-ORDER BY feeds into parquet/ORC stats
pruning at 100 TB.

- :func:`zorder_write` — one exchange: rows group by a coarse Morton
  prefix (the spatial bucket = the file), each bucket sorts by full
  key and writes its parquet with small row groups.
- :func:`zscan_plan` — the driver reads one footer per file (planner
  cost only) and keeps row groups whose stats envelope intersects the
  query box; returns work items + the skip ratio.
- :func:`zorder_scan` — Ray tasks read exactly the surviving row
  groups and apply the exact bbox filter (stats are a SUPERSET prune:
  necessary, never sufficient).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data
from ray.data import Dataset

from ..functions.morton import morton_key
from .groups import typed_groups

_ROW_GROUP_SIZE = 512
_BUCKET_SHIFT = 26  # top bits of the 32-bit key → ≤ 64 file buckets


def zorder_write(points: Dataset, out_dir: str, key_fn=None) -> Dataset:
    """Cluster by a space-filling-curve key into bucket files; returns
    the manifest (bucket, n_rows, n_row_groups).

    ``key_fn(lon, lat) -> int64`` defaults to the Morton key; pass
    ``functions.hilbert.hilbert_key`` for the Hilbert layout — the scan
    side is key-agnostic (skipping reads only the lon/lat footer
    stats), so the curve choice is purely a clustering-quality knob."""
    os.makedirs(out_dir, exist_ok=True)
    if key_fn is None:
        key_fn = morton_key

    def _key(batch: pa.Table) -> pa.Table:
        z = key_fn(batch["lon"].to_numpy(), batch["lat"].to_numpy())
        return batch.append_column("z", pa.array(z)).append_column(
            "bucket", pa.array((z >> _BUCKET_SHIFT).astype(np.int64))
        )

    @typed_groups(
        {"bucket": pa.int64(), "n_rows": pa.int64(), "n_row_groups": pa.int64()}
    )
    def _write(group: pd.DataFrame) -> pa.Table:
        bucket = int(group["bucket"].iloc[0])
        g = group.sort_values(["z", "point_id"], ignore_index=True)
        tab = pa.table(
            {
                "point_id": pa.array(g["point_id"].to_numpy(), type=pa.int64()),
                "lon": pa.array(g["lon"].to_numpy(), type=pa.float64()),
                "lat": pa.array(g["lat"].to_numpy(), type=pa.float64()),
            }
        )
        path = f"{out_dir}/bucket={bucket:05d}.parquet"
        pq.write_table(tab, path, row_group_size=_ROW_GROUP_SIZE)
        return pa.table(
            {
                "bucket": pa.array([bucket], type=pa.int64()),
                "n_rows": pa.array([len(g)], type=pa.int64()),
                "n_row_groups": pa.array(
                    [pq.read_metadata(path).num_row_groups], type=pa.int64()
                ),
            }
        )

    return (
        points.map_batches(_key, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_write, batch_format="pandas")
    )


def zscan_plan(
    out_dir: str, bbox: tuple[float, float, float, float]
) -> tuple[list[dict], int]:
    """→ (surviving work items, total row groups). Planner cost = one
    footer read per file."""
    lo_lon, lo_lat, hi_lon, hi_lat = bbox
    items, total = [], 0
    for fname in sorted(os.listdir(out_dir)):
        if not fname.endswith(".parquet"):
            continue
        meta = pq.read_metadata(f"{out_dir}/{fname}")
        cols = {
            meta.schema.column(i).name: i for i in range(meta.num_columns)
        }
        for rg in range(meta.num_row_groups):
            total += 1
            g = meta.row_group(rg)
            slon = g.column(cols["lon"]).statistics
            slat = g.column(cols["lat"]).statistics
            if slon.max < lo_lon or slon.min > hi_lon:
                continue
            if slat.max < lo_lat or slat.min > hi_lat:
                continue
            items.append({"file": fname, "rg": rg})
    return items, total


def zorder_scan(
    out_dir: str, bbox: tuple[float, float, float, float]
) -> Dataset:
    """(point_id, lon, lat) of rows inside ``bbox``, reading only the
    stats-surviving row groups."""
    lo_lon, lo_lat, hi_lon, hi_lat = bbox
    items, _total = zscan_plan(out_dir, bbox)

    def _read(batch: pa.Table) -> pa.Table:
        out = []
        for fname, rg in zip(batch["file"].to_pylist(), batch["rg"].to_pylist()):
            tab = pq.ParquetFile(f"{out_dir}/{fname}").read_row_group(rg)
            lon = tab["lon"].to_numpy()
            lat = tab["lat"].to_numpy()
            keep = (
                (lon >= lo_lon) & (lon <= hi_lon)
                & (lat >= lo_lat) & (lat <= hi_lat)
            )
            out.append(tab.filter(pa.array(keep)))
        if not out:
            return pa.table(
                {
                    "point_id": pa.array([], type=pa.int64()),
                    "lon": pa.array([], type=pa.float64()),
                    "lat": pa.array([], type=pa.float64()),
                }
            )
        return pa.concat_tables(out)

    if not items:  # degenerate box: empty typed dataset
        return ray.data.from_arrow(
            pa.table(
                {
                    "point_id": pa.array([], type=pa.int64()),
                    "lon": pa.array([], type=pa.float64()),
                    "lat": pa.array([], type=pa.float64()),
                }
            )
        )
    return ray.data.from_items(items).map_batches(_read, batch_format="pyarrow")
