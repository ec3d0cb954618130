"""Incremental keyed aggregation over stored partial state.

The warehouse-refresh primitive: aggregates over an append-only corpus
should cost one pass over the NEW rows, not a recompute of the corpus.
That works exactly when the stored state is *mergeable sufficient
statistics* — per-key ``(n, sum, sumsq, min, max)`` in integer cents —
because integer merges are associative and commutative, so
``merge(state, partials(delta)) == partials(all)`` bit-for-bit at any
block structure or merge order (a float sum would drift here: the
incremental order differs from the recompute order by construction).

State lives as one parquet per epoch (atomic tmp+rename, same contract
as every sidecar in this engine); ``incremental_stats`` unions the
state rows with the delta's per-batch partials and runs ONE bounded
groupby merge (keys × (state epochs + blocks) rows — never raw events).

Reference analogue: pyroSAR's Archive.insert appends scenes and its
selects re-derive views; this is the aggregate-side of that contract
at corpus scale.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
from ray.data import Dataset
from ray.data.aggregate import Max, Min, Sum

_STATS = ("n", "s", "ss", "mn", "mx")


def _partials(batch: pa.Table, key_col: str, cents_col: str) -> pa.Table:
    keys = np.asarray(batch[key_col]).astype(object)
    c = batch[cents_col].to_numpy().astype(np.int64)
    uk, inv = np.unique(keys, return_inverse=True)
    n = np.bincount(inv, minlength=len(uk)).astype(np.int64)
    s = np.bincount(inv, weights=c, minlength=len(uk)).astype(np.int64)
    ss = np.bincount(inv, weights=c * c, minlength=len(uk)).astype(np.int64)
    order = np.argsort(inv, kind="stable")
    bounds = np.searchsorted(inv[order], np.arange(len(uk)))
    mn = np.minimum.reduceat(c[order], bounds) if len(uk) else c
    mx = np.maximum.reduceat(c[order], bounds) if len(uk) else c
    return pa.table(
        {
            key_col: pa.array(uk),
            "n": pa.array(n),
            "s": pa.array(s),
            "ss": pa.array(ss),
            "mn": pa.array(mn),
            "mx": pa.array(mx),
        }
    )


def _merge(partials: Dataset, key_col: str) -> Dataset:
    return partials.groupby(key_col).aggregate(
        Sum("n", alias_name="n"),
        Sum("s", alias_name="s"),
        Sum("ss", alias_name="ss"),
        Min("mn", alias_name="mn"),
        Max("mx", alias_name="mx"),
    )


def keyed_stats_partials(
    ds: Dataset, key_col: str, cents_col: str
) -> Dataset:
    """Merged per-key sufficient statistics of one dataset."""
    return _merge(
        ds.select_columns([key_col, cents_col]).map_batches(
            lambda b: _partials(b, key_col, cents_col),
            batch_format="pyarrow",
        ),
        key_col,
    )


def write_state(partials: Dataset, path: str) -> str:
    """Persist merged partials as ONE small parquet (keys-sized),
    atomically — rerunning an epoch overwrites, never double-counts."""
    tab = pa.Table.from_pylist(partials.take_all())
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(tab, tmp)
    os.replace(tmp, path)
    return path


def incremental_stats(
    state_paths: "list[str]",
    delta: Dataset,
    key_col: str,
    cents_col: str,
) -> Dataset:
    """Fold ``delta`` into the stored state: one pass over the delta,
    one bounded merge; emits finalized per-key ``n, sum_c, min_c,
    max_c`` (cents). Equals the full recompute bit-for-bit."""
    import ray.data

    delta_partials = delta.select_columns([key_col, cents_col]).map_batches(
        lambda b: _partials(b, key_col, cents_col), batch_format="pyarrow"
    )
    state = ray.data.read_parquet(state_paths)
    merged = _merge(delta_partials.union(state), key_col)

    def _finalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                key_col: batch[key_col],
                "n": batch["n"],
                "sum_c": batch["s"],
                "min_c": batch["mn"],
                "max_c": batch["mx"],
            }
        )

    return merged.map_batches(_finalize, batch_format="pyarrow")


# ------------------------------------------------- incremental dedup

def digest_winners(
    docs: Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> Dataset:
    """First-wins winners per distinct content digest: ``(h64, keeper,
    n)`` with ``h64`` the signed view of DuckDB's md5_number_lower —
    the digest-sized dedup view (shuffles 8-byte keys + ids only)."""
    from ray.data.aggregate import Count, Min

    from .checksum import row_digest64

    def _hash(batch: pa.Table) -> pa.Table:
        h = row_digest64(batch[text_col].to_pylist()).view(np.int64)
        return pa.table({"h64": pa.array(h), id_col: batch[id_col]})

    hashed = docs.select_columns([id_col, text_col]).map_batches(
        _hash, batch_format="pyarrow"
    )
    agg = hashed.groupby("h64").aggregate(
        Min(id_col, alias_name="keeper"), Count(alias_name="n")
    )

    def _typed(batch: pa.Table) -> pa.Table:
        # hash-aggregate empty splits carry null-typed columns; pin the
        # schema so a downstream join partition never sees type null
        return pa.table(
            {c: batch[c].cast(pa.int64()) for c in ("h64", "keeper", "n")}
        )

    return agg.map_batches(_typed, batch_format="pyarrow")


def write_dedup_state(winners: Dataset, dir_path: str) -> str:
    """Persist the seen-digest set as PARTITIONED parquet (a dataset
    write, never a driver materialization — the state is corpus-sized
    at scale, unlike the keys-sized aggregate state above)."""
    winners.select_columns(["h64"]).write_parquet(dir_path)
    return dir_path


def incremental_dedup(
    state_paths: "list[str] | str",
    delta: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> Dataset:
    """Streaming-ingest dedup: the delta's first-wins winners whose
    content digest is NOT already in the stored state — one delta pass
    plus ONE co-partition anti-join against the state dataset (both
    sides digest-sized; the raw corpus is never rescanned).  Appending
    the result's ``h64`` to the state directory makes the next epoch's
    call see this epoch's content — the Archive.insert dedup contract
    as an incremental corpus operation.
    """
    import ray.data

    from .join import equi_join

    if isinstance(state_paths, str):
        state_paths = [state_paths]
    # read_parquet treats list entries as files — expand directories
    files: list[str] = []
    for p in state_paths:
        if os.path.isdir(p):
            files.extend(
                os.path.join(p, f)
                for f in sorted(os.listdir(p))
                if f.endswith(".parquet")
            )
        else:
            files.append(p)
    new_w = digest_winners(delta, text_col, id_col)
    state = ray.data.read_parquet(files).select_columns(["h64"])
    return equi_join(new_w, state, on="h64", how="anti")
