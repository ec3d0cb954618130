"""Merge-on-read with positional delete files — the lakehouse update
mechanic (Iceberg v2 / Delta deletion vectors): instead of rewriting
data files to delete rows, a sidecar records (file, row position)
pairs and every subsequent scan subtracts them by POSITION, never by
value. This is how a 100 TB table absorbs deletes without a 100 TB
rewrite.

Ray shape:

- :func:`mor_write` — one groupby exchange partitions rows by day;
  each group writes its base parquet (sorted by id, multiple row
  groups) plus its positional-delete sidecar, and emits a manifest row.
- :func:`mor_scan` — the planner reads ONLY file metadata on the
  driver (one footer per file, like any query planner) and builds
  (file, row_group, pos_base) work items; each Ray task reads ONE row
  group, derives absolute row positions from the metadata offsets, and
  anti-filters its slice of the delete vector. Scan parallelism is
  row-group granular — the splittable-scan-with-position-offsets
  design — and delete sidecars are loaded per file (bounded by that
  file's delete count), cached per actor.

Correctness hinge: the scan never inspects the deleted rows' VALUES —
positions alone drive the drop (pinned by the hash twin, which
recomputes positions via ROW_NUMBER and must agree row-for-row).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data
from ray.data import Dataset

from .groups import typed_groups

_ROW_GROUP_SIZE = 200  # several row groups per day file → real offsets


def mor_write(
    events: Dataset,
    out_dir: str,
    delete_types: tuple[str, ...] = ("error",),
) -> Dataset:
    """Partition by day; per day write base parquet + positional
    deletes for rows whose type is in ``delete_types``. Returns the
    manifest (day, n_rows, n_deletes)."""
    os.makedirs(f"{out_dir}/base", exist_ok=True)
    os.makedirs(f"{out_dir}/deletes", exist_ok=True)

    def _day(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.append_column(
            "day", pc.strftime(batch["ts"], format="%Y-%m-%d")
        )

    @typed_groups(
        {"day": pa.string(), "n_rows": pa.int64(), "n_deletes": pa.int64()}
    )
    def _write(group: pd.DataFrame) -> pa.Table:
        day = group["day"].iloc[0]
        g = group.sort_values("event_id", ignore_index=True)
        base = pa.table(
            {
                "event_id": pa.array(g["event_id"].to_numpy(), type=pa.int64()),
                "event_type": pa.array(g["event_type"], type=pa.string()),
            }
        )
        pq.write_table(
            base, f"{out_dir}/base/day={day}.parquet",
            row_group_size=_ROW_GROUP_SIZE,
        )
        dels = np.flatnonzero(g["event_type"].isin(delete_types).to_numpy())
        pq.write_table(
            pa.table({"pos": pa.array(dels, type=pa.int64())}),
            f"{out_dir}/deletes/day={day}.parquet",
        )
        return pa.table(
            {
                "day": pa.array([day], type=pa.string()),
                "n_rows": pa.array([len(g)], type=pa.int64()),
                "n_deletes": pa.array([len(dels)], type=pa.int64()),
            }
        )

    return (
        events.map_batches(_day, batch_format="pyarrow")
        .groupby("day")
        .map_groups(_write, batch_format="pandas")
    )


def mor_write_snapshots(
    events: Dataset,
    out_dir: str,
    snapshot_preds: dict[int, "callable"],
) -> Dataset:
    """Multi-snapshot MOR write (time travel): one base file per day
    plus one positional-delete sidecar PER SNAPSHOT — snapshot k's
    sidecar records the positions its commit deleted from the base
    (positions are always relative to the immutable base file, the
    Iceberg v2 sequencing rule). ``snapshot_preds``: snapshot id →
    ``df -> bool mask`` of rows that commit deletes. Returns the
    manifest (day, n_rows, then one n_deletes_s{k} per snapshot)."""
    os.makedirs(f"{out_dir}/base", exist_ok=True)
    for sid in snapshot_preds:
        os.makedirs(f"{out_dir}/deletes/s{sid}", exist_ok=True)

    def _day(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.append_column(
            "day", pc.strftime(batch["ts"], format="%Y-%m-%d")
        )

    schema = {"day": pa.string(), "n_rows": pa.int64()}
    for sid in sorted(snapshot_preds):
        schema[f"n_deletes_s{sid}"] = pa.int64()

    @typed_groups(schema)
    def _write(group: pd.DataFrame) -> pa.Table:
        day = group["day"].iloc[0]
        g = group.sort_values("event_id", ignore_index=True)
        base = pa.table(
            {
                "event_id": pa.array(g["event_id"].to_numpy(), type=pa.int64()),
                "event_type": pa.array(g["event_type"], type=pa.string()),
            }
        )
        pq.write_table(
            base, f"{out_dir}/base/day={day}.parquet",
            row_group_size=_ROW_GROUP_SIZE,
        )
        row = {
            "day": pa.array([day], type=pa.string()),
            "n_rows": pa.array([len(g)], type=pa.int64()),
        }
        for sid in sorted(snapshot_preds):
            dels = np.flatnonzero(np.asarray(snapshot_preds[sid](g)))
            pq.write_table(
                pa.table({"pos": pa.array(dels, type=pa.int64())}),
                f"{out_dir}/deletes/s{sid}/day={day}.parquet",
            )
            row[f"n_deletes_s{sid}"] = pa.array([len(dels)], type=pa.int64())
        return pa.table(row)

    return (
        events.map_batches(_day, batch_format="pyarrow")
        .groupby("day")
        .map_groups(_write, batch_format="pandas")
    )


def mor_scan(out_dir: str, snapshot: int | None = None) -> Dataset:
    """Read base minus positional deletes: (event_id, day, pos,
    event_type) of surviving rows.

    ``snapshot=None`` reads the single-generation layout
    (``deletes/day=*``); ``snapshot=k`` time-travels a multi-snapshot
    layout — the delete vector is the UNION of sidecars ``s1..sk``
    (``k=0`` = the original commit, no deletes applied)."""
    base_dir = f"{out_dir}/base"
    items = []
    for fname in sorted(os.listdir(base_dir)):
        day = fname[len("day=") : -len(".parquet")]
        meta = pq.read_metadata(f"{base_dir}/{fname}")
        pos_base = 0
        for rg in range(meta.num_row_groups):
            n = meta.row_group(rg).num_rows
            items.append(
                {"day": day, "rg": rg, "pos_base": pos_base, "n": n}
            )
            pos_base += n

    class _ScanTask:
        def __init__(self):
            self._deletes: dict[str, np.ndarray] = {}
            self._files: dict[str, pq.ParquetFile] = {}

        def _dels(self, day: str) -> np.ndarray:
            if day not in self._deletes:
                if snapshot is None:
                    paths = [f"{out_dir}/deletes/day={day}.parquet"]
                else:
                    paths = [
                        f"{out_dir}/deletes/s{s}/day={day}.parquet"
                        for s in range(1, snapshot + 1)
                    ]
                if paths:
                    vecs = [pq.read_table(p)["pos"].to_numpy() for p in paths]
                    # union across snapshots: a row may be deleted by
                    # more than one commit
                    self._deletes[day] = np.unique(np.concatenate(vecs))
                else:
                    self._deletes[day] = np.array([], dtype=np.int64)
            return self._deletes[day]

        def _file(self, day: str) -> pq.ParquetFile:
            # footer parsed once per actor per file, not per row group
            if day not in self._files:
                self._files[day] = pq.ParquetFile(
                    f"{base_dir}/day={day}.parquet"
                )
            return self._files[day]

        def __call__(self, batch: pa.Table) -> pa.Table:
            out = []
            for day, rg, pos_base, n in zip(
                batch["day"].to_pylist(),
                batch["rg"].to_pylist(),
                batch["pos_base"].to_pylist(),
                batch["n"].to_pylist(),
            ):
                tab = self._file(day).read_row_group(rg)
                pos = np.arange(pos_base, pos_base + n, dtype=np.int64)
                dels = self._dels(day)
                # positions alone decide the drop — never the values
                keep = ~np.isin(pos, dels, assume_unique=True)
                out.append(
                    pa.table(
                        {
                            "event_id": tab["event_id"].combine_chunks().filter(
                                pa.array(keep)
                            ),
                            "day": pa.array([day] * int(keep.sum())),
                            "pos": pa.array(pos[keep]),
                            "event_type": tab["event_type"]
                            .combine_chunks()
                            .filter(pa.array(keep)),
                        }
                    )
                )
            if not out:
                return pa.table(
                    {
                        "event_id": pa.array([], type=pa.int64()),
                        "day": pa.array([], type=pa.string()),
                        "pos": pa.array([], type=pa.int64()),
                        "event_type": pa.array([], type=pa.string()),
                    }
                )
            return pa.concat_tables(out)

    # from_items defaults to ONE block per item — every downstream
    # operator then pays per-task overhead once per row group (measured
    # 200 tasks/snapshot at sf0.1, ~10 s of pure scheduling across the
    # three-snapshot scan). Bundle ~16 row groups per scan task: still
    # linear parallelism in the table size, 16x less fixed cost.
    return ray.data.from_items(
        items, override_num_blocks=max(1, len(items) // 16)
    ).map_batches(
        _ScanTask, batch_format="pyarrow", batch_size=None, concurrency=(1, 4)
    )


def eq_write(
    events: Dataset,
    out_dir: str,
    commit_preds: "dict[int, callable]",
) -> Dataset:
    """Equality-delete MOR write (the other Iceberg delete flavor).

    Where a positional sidecar records (file, row position), an
    EQUALITY delete file records KEY VALUES (event_ids here) — it
    applies to every data file of an earlier sequence number, wherever
    the key's row happens to sit. That indirection is what survives
    compaction: rewrite/reorder the base files and a positional vector
    is garbage, an equality vector still deletes exactly the same rows
    (pinned by a test).

    Write shape: one day-keyed groupby writes the base files (same
    layout as :func:`mor_write`); each commit's delete file is the
    DISTRIBUTED filter of the base stream collected to one id list —
    bounded by the commit's delete count, the same driver contract an
    Iceberg writer's delete-file manifest has. Returns the manifest
    (day, n_rows).
    """
    os.makedirs(f"{out_dir}/base", exist_ok=True)
    os.makedirs(f"{out_dir}/eqdel", exist_ok=True)

    def _day(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.append_column(
            "day", pc.strftime(batch["ts"], format="%Y-%m-%d")
        )

    schema = {"day": pa.string(), "n_rows": pa.int64()}

    @typed_groups(schema)
    def _write(group: pd.DataFrame) -> pa.Table:
        day = group["day"].iloc[0]
        g = group.sort_values("event_id", ignore_index=True)
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(g["event_id"].to_numpy(), type=pa.int64()),
                    "event_type": pa.array(g["event_type"], type=pa.string()),
                }
            ),
            f"{out_dir}/base/day={day}.parquet",
            row_group_size=_ROW_GROUP_SIZE,
        )
        return pa.table(
            {
                "day": pa.array([day], type=pa.string()),
                "n_rows": pa.array([len(g)], type=pa.int64()),
            }
        )

    manifest = (
        events.map_batches(_day, batch_format="pyarrow")
        .groupby("day")
        .map_groups(_write, batch_format="pandas")
        .materialize()
    )

    from pyrosar_ray.stages import collect_arrow

    for cid in sorted(commit_preds):
        pred = commit_preds[cid]

        def _match(batch: pa.Table, _p=pred) -> pa.Table:
            df = batch.to_pandas()
            mask = np.asarray(_p(df))
            return pa.table(
                {"event_id": pa.array(df["event_id"].to_numpy()[mask])}
            )

        ids = collect_arrow(
            events.map_batches(_match, batch_format="pyarrow"),
            empty_schema={"event_id": pa.int64()},
        )
        pq.write_table(
            pa.table(
                {"event_id": pa.array(np.sort(ids["event_id"].to_numpy()))}
            ),
            f"{out_dir}/eqdel/c{cid}.parquet",
        )
    return manifest


def eq_scan(
    out_dir: str,
    as_of: int | None = None,
    broadcast_bound: int = 50_000_000,
) -> Dataset:
    """Equality-delete scan: base rows whose key is in NO delete file
    of commits <= ``as_of`` (``None`` = all commits, ``0`` = original).

    Up to ``broadcast_bound`` total delete keys, the union of delete
    sets broadcasts once (``ray.put`` — the standard Iceberg reader
    design: equality deletes load into a hash set; bounded, disclosed)
    and every scan task drops by searchsorted membership, position-free
    — so the scan is insensitive to base-file row order, unlike
    :func:`mor_scan`.

    PAST the bound (the r4 verdict's scale-stress item) the scan
    switches to the bloom + exact-verify cascade
    (:func:`membership.bloom_anti_join`): a fixed-size bit set over the
    delete keys broadcasts instead of the keys themselves,
    bloom-negative rows pass untouched (the vast majority), and only
    the maybe-deleted slice pays an exact co-partition anti-join
    against the delete-key Dataset. Output is EXACTLY the broadcast
    path's (false positives ride the slow path, none are dropped) —
    pinned by tests/test_mor.py::test_eq_scan_bloom_cascade_identical.
    """
    import ray

    base_dir = f"{out_dir}/base"
    files = sorted(os.listdir(base_dir))
    del_files = []
    total_dels = 0
    for fname in sorted(os.listdir(f"{out_dir}/eqdel")):
        cid = int(fname[1:-len(".parquet")])
        if as_of is None or cid <= as_of:
            path = f"{out_dir}/eqdel/{fname}"
            del_files.append(path)
            total_dels += pq.ParquetFile(path).metadata.num_rows

    if total_dels > broadcast_bound:
        return _eq_scan_bloom(base_dir, files, del_files, total_dels)

    vecs = [pq.read_table(p)["event_id"].to_numpy() for p in del_files]
    dels = (
        np.unique(np.concatenate(vecs)) if vecs else np.array([], dtype=np.int64)
    )
    dels_ref = ray.put(dels)
    items = [
        {"day": f[len("day="):-len(".parquet")], "path": f"{base_dir}/{f}"}
        for f in files
    ]

    class _Scan:
        def __init__(self):
            self.dels = ray.get(dels_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            out = []
            for day, path in zip(
                batch["day"].to_pylist(), batch["path"].to_pylist()
            ):
                tab = pq.read_table(path)
                ids = tab["event_id"].to_numpy()
                if len(self.dels):
                    pos = np.clip(
                        np.searchsorted(self.dels, ids), 0, len(self.dels) - 1
                    )
                    keep = self.dels[pos] != ids
                else:
                    keep = np.ones(len(ids), dtype=bool)
                out.append(
                    pa.table(
                        {
                            "event_id": tab["event_id"]
                            .combine_chunks()
                            .filter(pa.array(keep)),
                            # explicit type: a fully-deleted day's
                            # [day]*0 would otherwise infer null and
                            # break the concat
                            "day": pa.array(
                                [day] * int(keep.sum()), type=pa.string()
                            ),
                            "event_type": tab["event_type"]
                            .combine_chunks()
                            .filter(pa.array(keep)),
                        }
                    )
                )
            if not out:
                return pa.table(
                    {
                        "event_id": pa.array([], type=pa.int64()),
                        "day": pa.array([], type=pa.string()),
                        "event_type": pa.array([], type=pa.string()),
                    }
                )
            return pa.concat_tables(out)

    return ray.data.from_items(
        items, override_num_blocks=max(1, len(items) // 8)
    ).map_batches(
        _Scan, batch_format="pyarrow", batch_size=None, concurrency=(1, 4)
    )


def _eq_scan_bloom(
    base_dir: str,
    files: "list[str]",
    del_files: "list[str]",
    total_dels: int,
) -> Dataset:
    """Bloom + exact-verify equality-delete scan (the past-the-
    broadcast-bound path of :func:`eq_scan`; plan in its docstring)."""
    import ray
    import ray.data

    from pyrosar_ray.pipelines.tables import read_parquet_clean
    from pyrosar_ray.stages.membership import bloom_anti_join

    items = [
        {"day": f[len("day="):-len(".parquet")], "path": f"{base_dir}/{f}"}
        for f in files
    ]

    def _read(batch: pa.Table) -> pa.Table:
        out = []
        for day, path in zip(
            batch["day"].to_pylist(), batch["path"].to_pylist()
        ):
            tab = pq.read_table(path)
            out.append(
                pa.table(
                    {
                        "event_id": tab["event_id"].combine_chunks(),
                        "day": pa.array(
                            [day] * tab.num_rows, type=pa.string()
                        ),
                        "event_type": tab["event_type"].combine_chunks(),
                    }
                )
            )
        if not out:
            return pa.table(
                {
                    "event_id": pa.array([], type=pa.int64()),
                    "day": pa.array([], type=pa.string()),
                    "event_type": pa.array([], type=pa.string()),
                }
            )
        return pa.concat_tables(out)

    base = ray.data.from_items(
        items, override_num_blocks=max(1, len(items) // 8)
    ).map_batches(_read, batch_format="pyarrow", batch_size=None)
    dels = read_parquet_clean(del_files, columns=["event_id"])
    # ~16 bits per delete key (k=4 -> false-positive fraction ~2e-3, so
    # only that sliver of the base pays the exact anti-join exchange);
    # a fixed m would either waste broadcast bytes or flood the slow
    # path (measured: 1M bits over 511k keys sent most rows through the
    # anti join - 21.5s vs 2.9s with sizing)
    m_bits = 1 << max(20, int(np.ceil(np.log2(max(total_dels, 1) * 16))))
    return bloom_anti_join(base, dels, "event_id", m_bits=m_bits)


def mor_compact(out_dir: str) -> Dataset:
    """Fold positional deletes into the base files (file compaction).

    The maintenance half of merge-on-read: each day's base rewrites
    WITHOUT its deleted rows and the sidecar resets to empty, so
    subsequent scans skip the anti-filter entirely. One Ray task per
    file bundle; every rewrite goes through a temp-file + atomic rename
    (the lineage convention — a killed compaction leaves either the old
    or the new generation, never a torn file). Survivors keep their
    VALUES but get fresh dense positions — the reason positional
    sidecars cannot outlive a compaction (they are replaced by empties
    here) while equality sidecars could (pinned in tests/test_mor.py).
    Returns the manifest (day, n_rows).
    """
    base_dir = f"{out_dir}/base"
    items = [
        {
            "day": f[len("day="):-len(".parquet")],
            "base": f"{base_dir}/{f}",
            "dels": f"{out_dir}/deletes/{f}",
        }
        for f in sorted(os.listdir(base_dir))
    ]

    def _rewrite(batch: pa.Table) -> pa.Table:
        days, rows = [], []
        for day, bpath, dpath in zip(
            batch["day"].to_pylist(),
            batch["base"].to_pylist(),
            batch["dels"].to_pylist(),
        ):
            tab = pq.read_table(bpath)
            dels = pq.read_table(dpath)["pos"].to_numpy()
            keep = np.ones(len(tab), dtype=bool)
            keep[dels] = False
            out = tab.filter(pa.array(keep))
            tmp_b = bpath + ".tmp"
            pq.write_table(out, tmp_b, row_group_size=_ROW_GROUP_SIZE)
            os.replace(tmp_b, bpath)
            tmp_d = dpath + ".tmp"
            pq.write_table(
                pa.table({"pos": pa.array([], type=pa.int64())}), tmp_d
            )
            os.replace(tmp_d, dpath)
            days.append(day)
            rows.append(len(out))
        return pa.table(
            {
                "day": pa.array(days, type=pa.string()),
                "n_rows": pa.array(rows, type=pa.int64()),
            }
        )

    return ray.data.from_items(
        items, override_num_blocks=max(1, len(items) // 8)
    ).map_batches(_rewrite, batch_format="pyarrow", batch_size=None)
