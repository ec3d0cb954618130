"""Multi-level (ROLLUP) aggregation in one finest-level exchange.

SQL's ``GROUP BY ROLLUP(a, b)`` computes the (a, b), (a) and ()
grouping sets. The scale-correct Ray Data plan runs ONE distributed
exchange — per-batch partial combine at the finest level feeding a
``groupby(a, b)`` Sum — and derives every coarser level from that
already-aggregated, vocabulary-sized result: level (a) is a second
(bounded) groupby over the finest table, and the grand total is a
driver-side fold of a scalar aggregate. Re-aggregating base rows once
per level would multiply the all-to-all cost by the level count for
identical output.

Collapsed key columns carry typed NULLs, exactly like SQL ROLLUP
output (the engine's keys are non-null, so NULL is an unambiguous
level marker; add a GROUPING id column if nullable keys ever appear).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
from ray.data import Dataset
from ray.data.aggregate import Sum

from . import table_from_pandas

#: hard ceiling for PIVOT category discovery — one output COLUMN per
#: category, so anything near this bound is already a schema bug; failing
#: loudly here protects the driver from an unbounded take over a skewed
#: or free-text category column.
PIVOT_MAX_CATEGORIES = 10_000


def rollup_aggregate(
    ds: Dataset,
    keys: list[str],
    sum_cols: list[str],
    count_col: str = "n",
) -> Dataset:
    """ROLLUP over ``keys``: one row per grouping set member.

    ``sum_cols`` must be integer columns (quantize floats per row
    first — see ``tumbling_window``'s cents convention — so sums are
    independent of distributed combine order). Output columns:
    ``keys`` (NULL where collapsed) + ``count_col`` + ``sum_cols``.
    """
    if not keys:
        raise ValueError("rollup needs at least one key")
    metrics = [count_col] + list(sum_cols)

    def _partial(batch: pa.Table) -> pa.Table:
        df = batch.select(keys + list(sum_cols)).to_pandas()
        df[count_col] = np.int64(1)
        part = df.groupby(keys, sort=False, as_index=False)[metrics].sum()
        return table_from_pandas(part)

    finest = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(keys)
        .aggregate(*[Sum(m, alias_name=m) for m in metrics])
        # vocabulary-sized; materialized because every coarser level and
        # the grand total re-consume it (no re-execution of the big scan)
        .materialize()
    )

    schema = finest.schema()  # Ray Data Schema: parallel names/types lists
    key_types = {
        n: t for n, t in zip(schema.names, schema.types) if n in keys
    }

    def _with_nulls(tab_ds: Dataset, present: list[str]) -> Dataset:
        missing = [k for k in keys if k not in present]

        def _pad(batch: pa.Table) -> pa.Table:
            cols = {}
            for k in keys:
                cols[k] = (
                    batch[k]
                    if k in present
                    else pa.nulls(len(batch), type=key_types[k])
                )
            for m in metrics:
                cols[m] = batch[m]
            return pa.table(cols)

        return tab_ds.map_batches(_pad, batch_format="pyarrow") if missing else tab_ds

    levels = [_with_nulls(finest, keys)]
    for depth in range(len(keys) - 1, 0, -1):
        sub = keys[:depth]

        def _repart(batch: pa.Table, _sub=tuple(sub)) -> pa.Table:
            df = batch.select(list(_sub) + metrics).to_pandas()
            part = df.groupby(list(_sub), sort=False, as_index=False)[metrics].sum()
            return table_from_pandas(part)

        lvl = (
            finest.map_batches(_repart, batch_format="pyarrow")
            .groupby(sub)
            .aggregate(*[Sum(m, alias_name=m) for m in metrics])
        )
        levels.append(_with_nulls(lvl, sub))

    totals = finest.aggregate(*[Sum(m, alias_name=m) for m in metrics])
    total_tab = pa.table(
        {
            **{k: pa.nulls(1, type=key_types[k]) for k in keys},
            **{
                m: pa.array([int(totals[m])], type=pa.int64())
                for m in metrics
            },
        }
    )
    levels.append(ray.data.from_arrow(total_tab))
    out = levels[0]
    for lvl in levels[1:]:
        out = out.union(lvl)
    return out


def pivot_counts(
    ds: "Dataset",
    key_col: str,
    cat_col: str,
    categories: "list[str] | None" = None,
) -> "Dataset":
    """Crosstab reshape: one count column per category value, keyed rows.

    The distributed PIVOT: each batch folds its rows into a
    (keys-in-batch) × (categories) integer count matrix — one
    ``bincount`` over ``key_idx * n_cats + cat_idx``, no per-row loop —
    and the groupby-Sum merges the pre-combined partials, so the
    exchange carries at most keys × blocks wide rows, never raw events.

    ``categories`` pins the output schema; when omitted, a tiny
    distinct aggregate discovers the domain first (valid only for
    bounded-cardinality columns — the same contract as SQL PIVOT).
    Discovery is HARD-CAPPED at :data:`PIVOT_MAX_CATEGORIES` distinct
    values: a skewed/unbounded category column fails loudly with the
    offending cardinality instead of OOMing the driver (the output
    schema is one column per category, so past ~10^4 the result is
    malformed anyway).  Unknown categories at fold time raise rather
    than drop rows.
    """
    from ray.data.aggregate import Sum

    if categories is None:
        found = (
            ds.select_columns([cat_col])
            .groupby(cat_col)
            .count()
            .take(PIVOT_MAX_CATEGORIES + 1)
        )
        if len(found) > PIVOT_MAX_CATEGORIES:
            raise ValueError(
                f"pivot category column {cat_col!r} has more than "
                f"{PIVOT_MAX_CATEGORIES} distinct values — a pivot output "
                f"schema that wide is malformed; pass an explicit bounded "
                f"`categories` list or aggregate instead"
            )
        categories = sorted(r[cat_col] for r in found)
    cats = np.asarray(sorted(categories), dtype=object)
    col_names = [f"n_{c}" for c in cats]

    def _fold(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        cvals = np.asarray(batch[cat_col]).astype(object)
        cat_idx = np.searchsorted(cats, cvals)
        cat_idx_c = np.clip(cat_idx, 0, len(cats) - 1)
        if not (cats[cat_idx_c] == cvals).all():
            bad = sorted(set(cvals) - set(cats))
            raise ValueError(f"values outside the pinned categories: {bad[:5]}")
        uk, key_idx = np.unique(keys, return_inverse=True)
        flat = np.bincount(
            key_idx * len(cats) + cat_idx_c, minlength=len(uk) * len(cats)
        ).reshape(len(uk), len(cats))
        cols = {key_col: pa.array(uk)}
        for j, name in enumerate(col_names):
            cols[name] = pa.array(flat[:, j].astype(np.int64))
        return pa.table(cols)

    partials = ds.select_columns([key_col, cat_col]).map_batches(
        _fold, batch_format="pyarrow"
    )
    return partials.groupby(key_col).aggregate(
        *[Sum(name, alias_name=name) for name in col_names]
    )


def keyed_zscores(
    ds: "Dataset",
    key_col: str,
    cents_col: str,
    id_col: str,
) -> "Dataset":
    """Per-key z-score of an integer-cents column, bit-exact at scale.

    The sufficient-statistics pattern: each batch folds to per-key
    ``(n, sum, sumsq)`` int64 partials (a bounded exchange — keys x
    blocks rows, never events), the merged statistics are combined
    driver-side into per-key (mean, std) with EXACT integer numerators
    (``var = (n*sumsq - sum²) / (n*(n-1))``, Python bigints → one
    double division, ``math.sqrt`` = libm = the SQL twin's ``sqrt``),
    broadcast, and a row-local pass emits ``z = (c - mean) / std``.
    Float accumulation order never enters — that's what makes the twin
    hash-exact where a naive ``(x-mean)/stddev_samp`` over doubles
    would drift with partition order.

    Keys with n < 2 or zero variance emit z = 0.0 (the twin mirrors).
    """
    import math

    from ray.data.aggregate import Sum

    def _fold(batch: pa.Table) -> pa.Table:
        keys = np.asarray(batch[key_col]).astype(object)
        c = batch[cents_col].to_numpy().astype(np.int64)
        uk, inv = np.unique(keys, return_inverse=True)
        return pa.table(
            {
                key_col: pa.array(uk),
                "n": pa.array(np.bincount(inv, minlength=len(uk)).astype(np.int64)),
                "s": pa.array(np.bincount(inv, weights=c, minlength=len(uk)).astype(np.int64)),
                "ss": pa.array(
                    np.bincount(inv, weights=c * c, minlength=len(uk)).astype(np.int64)
                ),
            }
        )

    stats = (
        ds.select_columns([key_col, cents_col])
        .map_batches(_fold, batch_format="pyarrow")
        .groupby(key_col)
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("s", alias_name="s"),
            Sum("ss", alias_name="ss"),
        )
        .take_all()
    )  # bounded: one row per key
    params = {}
    for r in stats:
        n, s, ss = int(r["n"]), int(r["s"]), int(r["ss"])
        if n < 2:
            params[r[key_col]] = (s / n if n else 0.0, 0.0)
            continue
        var = float(n * ss - s * s) / float(n * (n - 1))
        params[r[key_col]] = (s / n, math.sqrt(var))

    def _score(batch: pa.Table) -> pa.Table:
        keys = np.asarray(batch[key_col]).astype(object)
        c = batch[cents_col].to_numpy().astype(np.float64)
        mean = np.array([params[k][0] for k in keys])
        std = np.array([params[k][1] for k in keys])
        z = np.where(std > 0.0, (c - mean) / np.where(std > 0.0, std, 1.0), 0.0)
        return pa.table(
            {
                id_col: batch[id_col],
                key_col: batch[key_col],
                cents_col: batch[cents_col],
                "z": pa.array(z),
            }
        )

    return ds.map_batches(_score, batch_format="pyarrow")


def winsorize_cents(
    ds: "Dataset",
    cents_col: str,
    id_col: str,
    q_lo: float = 0.05,
    q_hi: float = 0.95,
) -> "Dataset":
    """Winsorize an integer-cents column at exact corpus quantiles.

    Outlier trimming with EXACT (not sketched) cut points: per-batch
    value histograms fold into a bounded (distinct cents) exchange, the
    driver inverts the cumulative histogram under the engine's shared
    quantile definition — smallest v with cumulative count >= max(1,
    ceil(q*N)) — and a row-local pass clips. Integer cut points mean
    the clip is bit-exact against the SQL twin at any partition order.
    """
    import math

    from ray.data.aggregate import Sum

    def _hist(batch: pa.Table) -> pa.Table:
        c = batch[cents_col].to_numpy().astype(np.int64)
        v, n = np.unique(c, return_counts=True)
        return pa.table({"v": pa.array(v), "c": pa.array(n.astype(np.int64))})

    hist = (
        ds.select_columns([cents_col])
        .map_batches(_hist, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Sum("c", alias_name="c"))
        .sort("v")
        .take_all()
    )  # bounded by the distinct-value domain
    vs = np.array([r["v"] for r in hist], dtype=np.int64)
    cum = np.cumsum([r["c"] for r in hist])
    total = int(cum[-1]) if len(cum) else 0

    def _cut(q: float) -> int:
        rank = max(1, math.ceil(q * total))
        return int(vs[np.searchsorted(cum, rank)])

    lo, hi = (_cut(q_lo), _cut(q_hi)) if total else (0, 0)

    def _clip(batch: pa.Table) -> pa.Table:
        c = batch[cents_col].to_numpy().astype(np.int64)
        return pa.table(
            {
                id_col: batch[id_col],
                cents_col: batch[cents_col],
                "clipped": pa.array(np.clip(c, lo, hi)),
            }
        )

    return ds.map_batches(_clip, batch_format="pyarrow")


def unpivot(
    ds: "Dataset",
    key_cols: "list[str]",
    value_cols: "list[str]",
    var_col: str,
    value_name: str,
    labels: "list | None" = None,
) -> "Dataset":
    """Melt wide columns into (key, variable, value) rows — PIVOT's
    inverse, row-local (one repeat/tile expansion per batch, ZERO
    shuffle; output rows = input rows × len(value_cols)).

    ``labels`` renames each wide column in the ``var_col`` output
    (default: the column name itself) — e.g. the ``n_<cat>`` columns a
    :func:`pivot_counts` emits melt back to their category values, and
    ``unpivot(pivot_counts(ds, k, c)) == counts(ds, [k, c])`` plus the
    explicit zero rows the wide form materializes.
    """
    labels = list(labels) if labels is not None else list(value_cols)
    if len(labels) != len(value_cols):
        raise ValueError("labels must pair 1:1 with value_cols")

    def _melt(batch: pa.Table) -> pa.Table:
        n = len(batch)
        cols = {}
        for kc in key_cols:
            arr = batch[kc].combine_chunks()
            # n rows repeated once per value column, column-major order
            cols[kc] = pa.concat_arrays([arr] * len(value_cols))
        var_chunks, val_chunks = [], []
        for lab, vc in zip(labels, value_cols):
            var_chunks.append(pa.array([lab] * n))
            val_chunks.append(batch[vc].combine_chunks())
        cols[var_col] = pa.concat_arrays(var_chunks)
        cols[value_name] = pa.concat_arrays(val_chunks)
        return pa.table(cols)

    return ds.map_batches(_melt, batch_format="pyarrow")
