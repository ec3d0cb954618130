"""CDC-style compaction: the latest full row per key.

The upsert/changelog pattern every large-scale ingest pipeline needs —
a stream of record VERSIONS keyed by id with a sequence column (commit
timestamp, LSN, version number) compacts to the single newest version
of each record (reference parallel: Archive.insert's last-write-wins
promotion on re-registration, archive.py:300-333 `drop_element` +
re-insert; here generalized to full-row argmax semantics).

Plan (the engine's aggregate discipline):

1. **Combiner** — every batch pre-compacts LOCALLY with one
   vectorized ``np.lexsort`` keep-last kernel, so the exchange carries
   at most (distinct keys in the batch) rows however many versions a
   key accumulated. A CDC stream with 1000 updates/key ships ~0.1% of
   its rows.
2. **One hash exchange** — survivors tag a Fibonacci-hash partition
   of the key (the join/exchange convention, stages/join.py) and
   co-group on it: per-partition memory ≈ surviving_rows /
   num_partitions, partition count auto-sized from read metadata.
3. **Per-partition finalize** — the SAME kernel runs once per
   partition (vectorized over all its keys — no per-key Python calls,
   unlike a naive ``groupby(key).map_groups``).

Determinism: the winner is the row with the lexicographically largest
``(seq, tiebreak)``. With ``tiebreak=None`` the caller asserts ``seq``
is unique per key — duplicate (key, seq) pairs would make the winner
depend on block boundaries, so pass a total-order tiebreaker (an id
column) whenever seq can tie.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

_PART = "__compact_part"
_MIX = np.uint64(0x9E3779B97F4A7C15)


def _col_np(tab: pa.Table, name: str) -> np.ndarray:
    return tab[name].combine_chunks().to_numpy(zero_copy_only=False)


def _keep_latest(
    tab: pa.Table, key: str, seq: str, tiebreak: str | None
) -> pa.Table:
    """Vectorized keep-last: one lexsort, one run-boundary mask."""
    if len(tab) <= 1:
        return tab
    k = _col_np(tab, key)
    s = _col_np(tab, seq)
    sort_cols = (
        (s, k) if tiebreak is None else (_col_np(tab, tiebreak), s, k)
    )
    order = np.lexsort(sort_cols)  # last key sorts primary → by key, then seq
    ks = k[order]
    last = np.ones(len(ks), dtype=bool)
    last[:-1] = ks[1:] != ks[:-1]
    winners = np.sort(order[last])  # preserve input order among winners
    return tab.take(pa.array(winners))


def latest_by_key(
    ds: Dataset,
    key: str,
    seq: str,
    tiebreak: str | None = None,
    num_partitions: int | None = None,
) -> Dataset:
    """Compact a changelog to its newest row per ``key`` (full-row
    argmax over ``(seq, tiebreak)``). Output schema = input schema;
    one row per distinct key."""
    schema = ds.schema()
    names = schema.names
    for c in (key, seq) + (() if tiebreak is None else (tiebreak,)):
        if c not in names:
            raise ValueError(f"column {c!r} not in dataset")
    out_types = {
        n: (t if isinstance(t, pa.DataType) else pa.string())
        for n, t in zip(names, schema.types)
    }
    if num_partitions is None:
        from pyrosar_ray.stages.spatial import auto_num_partitions

        num_partitions = auto_num_partitions(ds, ds) // 2 or 1
    n_parts = int(num_partitions)

    def _combine(batch: pa.Table) -> pa.Table:
        out = _keep_latest(batch, key, seq, tiebreak)
        keys = np.asarray(out[key].combine_chunks().cast(pa.int64()))
        with np.errstate(over="ignore"):
            parts = (
                (keys.astype(np.uint64) * _MIX) >> np.uint64(40)
            ).astype(np.int64) % np.int64(n_parts)
        return out.append_column(_PART, pa.array(parts))

    def _finalize(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            # sort-boundary groups arrive empty and null-typed; return a
            # typed empty so blocks keep schema (stages/groups.py)
            from .groups import empty_table

            return empty_table(out_types)
        return _keep_latest(group, key, seq, tiebreak).drop_columns([_PART])

    return (
        ds.map_batches(_combine, batch_format="pyarrow")
        .groupby(_PART)
        .map_groups(_finalize, batch_format="pyarrow")
    )
