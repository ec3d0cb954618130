"""Generic interval-overlap join: the 1-D analogue of the spatial cell
join (reference semantics: OSV.catch's validity-window overlap filter,
S1/auxil.py — generalized to two large sides).

Both sides flat-expand to fixed-width time buckets (the 1-D "cell
cover"), co-group on (bucket, key), and each group joins locally with
the exact overlap refine. A pair that co-occurs in several buckets is
emitted ONLY from the bucket of ``max(left.start, right.start)`` —
that bucket intersects both intervals whenever they overlap, so the
output is exactly-once with no dedup exchange.

Scale contract: ONE groupby exchange; exchange volume = sum of interval
widths / bucket (pick ``bucket`` near the median interval width so the
expansion factor stays O(1)); a group holds only the rows of one
(bucket, key) slot, so memory is bounded by the densest time slot.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset


def _expand_buckets(
    batch: pa.Table, start_col: str, stop_col: str, bucket: int, side: int, cols
) -> pa.Table:
    start = batch[start_col].to_numpy().astype(np.int64)
    stop = batch[stop_col].to_numpy().astype(np.int64)
    b0 = start // bucket
    b1 = stop // bucket
    count = b1 - b0 + 1
    total = int(count.sum())
    rep = np.repeat(np.arange(len(count), dtype=np.int64), count)
    offs = np.concatenate([[0], np.cumsum(count)[:-1]])
    j = np.arange(total, dtype=np.int64) - np.repeat(offs, count)
    out = {c: batch[c].take(pa.array(rep)) for c in cols}
    out["_bucket"] = pa.array(np.repeat(b0, count) + j)
    out["_start"] = pa.array(start[rep])
    out["_stop"] = pa.array(stop[rep])
    out["_side"] = pa.array(np.full(total, side, dtype=np.int8))
    return pa.table(out)


def _local_interval_join(
    df: pd.DataFrame, bucket: int, left_cols, right_cols
) -> pd.DataFrame:
    lhs = df[df["_side"].to_numpy() == 0]
    rhs = df[df["_side"].to_numpy() == 1]
    empty = pd.DataFrame(
        {
            **{c: pd.Series([], dtype=df[c].dtype) for c in (*left_cols, *right_cols)},
            "overlap_sec": pd.Series([], dtype=np.int64),
        }
    )
    if not len(lhs) or not len(rhs):
        return empty
    b = int(df["_bucket"].iloc[0])
    # sort rhs by start; candidates per lhs row = prefix with r.start <= l.stop
    rs = rhs["_start"].to_numpy()
    order = np.argsort(rs, kind="stable")
    rs_sorted = rs[order]
    re_sorted = rhs["_stop"].to_numpy()[order]
    ls = lhs["_start"].to_numpy()
    le = lhs["_stop"].to_numpy()
    hi = np.searchsorted(rs_sorted, le, side="right")
    total = int(hi.sum())
    if total == 0:
        return empty
    lrep = np.repeat(np.arange(len(lhs), dtype=np.int64), hi)
    offs = np.concatenate([[0], np.cumsum(hi)[:-1]])
    ridx = np.arange(total, dtype=np.int64) - np.repeat(offs, hi)
    l0, l1 = ls[lrep], le[lrep]
    r0, r1 = rs_sorted[ridx], re_sorted[ridx]
    keep = (r1 >= l0) & (np.maximum(l0, r0) // bucket == b)
    if not keep.any():
        return empty
    lrows = lhs.iloc[lrep[keep]].reset_index(drop=True)
    rrows = rhs.iloc[order[ridx[keep]]].reset_index(drop=True)
    out = pd.concat(
        [lrows[list(left_cols)], rrows[list(right_cols)]], axis=1
    )
    out["overlap_sec"] = (
        np.minimum(l1[keep], r1[keep]) - np.maximum(l0[keep], r0[keep])
    ).astype(np.int64)
    return out


def interval_join(
    left: Dataset,
    right: Dataset,
    left_cols: tuple[str, ...],
    right_cols: tuple[str, ...],
    left_span: tuple[str, str],
    right_span: tuple[str, str],
    key: str | None = None,
    bucket: int = 86400,
) -> Dataset:
    """Pairs of (left, right) rows whose [start, stop] intervals overlap
    (closed ends), optionally also matched on an equality ``key``.
    Output = left_cols + right_cols + ``overlap_sec``.
    """
    if bucket <= 0:
        raise ValueError("bucket must be positive")
    lkeep = tuple(dict.fromkeys((*left_cols, *((key,) if key else ()))))
    rkeep = tuple(dict.fromkeys((*right_cols, *((key,) if key else ()))))

    l = left.map_batches(
        lambda b: _expand_buckets(b, *left_span, bucket, 0, lkeep),
        batch_format="pyarrow",
    )
    r = right.map_batches(
        lambda b: _expand_buckets(b, *right_span, bucket, 1, rkeep),
        batch_format="pyarrow",
    )

    # schema-align the union; the other side's columns are padded with
    # typed DEFAULTS (never read — each output row selects only its own
    # side's columns) so integer dtypes survive the pandas group format
    def _default(n: int, t: pa.DataType):
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            return pa.array([""] * n, type=t)
        if pa.types.is_floating(t):
            return pa.array(np.zeros(n), type=t)
        return pa.array(np.zeros(n, dtype=np.int64), type=t)

    def _pad(batch: pa.Table, types: dict) -> pa.Table:
        n = len(batch)
        cols = {}
        for c in (*lkeep, *rkeep):
            if c in batch.column_names:
                cols[c] = batch[c]
            else:
                cols[c] = _default(n, types[c])
        for c in ("_bucket", "_start", "_stop", "_side"):
            cols[c] = batch[c]
        return pa.table(cols)

    lt = {n: t for n, t in zip(left.schema().names, left.schema().types)}
    rt = {n: t for n, t in zip(right.schema().names, right.schema().types)}
    types = {**lt, **rt}
    tagged = l.map_batches(
        lambda b: _pad(b, types), batch_format="pyarrow"
    ).union(r.map_batches(lambda b: _pad(b, types), batch_format="pyarrow"))
    keys = ["_bucket"] + ([key] if key else [])
    return tagged.groupby(keys).map_groups(
        lambda g: _local_interval_join(g, bucket, left_cols, right_cols),
        batch_format="pandas",
    )
