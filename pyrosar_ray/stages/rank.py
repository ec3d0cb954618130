"""Exact corpus-wide ranking without a single-node sort.

``global_rank`` assigns SQL's ``ROW_NUMBER() OVER (ORDER BY score, id)``
to every row — the curriculum-ordering / quality-percentile primitive —
as two bounded exchanges instead of a global sort-then-stitch:

1. a *count* exchange over ``(score, id >> shift)`` cells (per-batch
   bincount partials → groupby-Sum), whose result the driver prefix-sums
   in ``(score, bucket)`` order into exclusive base offsets;
2. a *rank* exchange: ``groupby((score, bucket)).map_groups`` sorts ids
   inside each cell and emits ``base + local_index + 1``.

The id-range bucket (high bits of the id) preserves order *within* a
score — unlike a hash salt, which would interleave ids across groups —
so per-cell local sorting composes into the exact global order. Group
size is bounded by construction at ``2**shift`` rows (a cell holds one
score and one id range), which makes the plan skew-safe even when one
score value covers most of the corpus: the hot score spreads over
``id_domain / 2**shift`` cells.

Driver state is one int per non-empty ``(score, bucket)`` cell — size
``≈ distinct_scores + N / 2**shift``; pick ``shift`` so that stays a
few million at the target scale (shift=16 → ~15M cells at 10^12 rows,
each 8 bytes; raise shift to trade driver memory against group width).

Reference analogue: pyroSAR sorts scene lists globally for deterministic
processing order (identify_many(sortkey=), Archive.select ORDER BY);
this is that contract at corpus scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset
from ray.data.aggregate import Sum

# per-worker memo of the deserialized offset table (one ray.get per
# worker process, not one per group)
_OFFSET_CACHE: dict[str, dict] = {}


def _get_offsets(ref) -> dict:
    key = ref.hex()
    table = _OFFSET_CACHE.get(key)
    if table is None:
        if len(_OFFSET_CACHE) >= 4:  # a scan holds up to 3 live tables
            _OFFSET_CACHE.clear()
        table = ray.get(ref)
        _OFFSET_CACHE[key] = table
    return table


def global_rank(
    ds: Dataset,
    score_col: str,
    id_col: str,
    shift: int = 16,
    rank_col: str = "rank",
) -> Dataset:
    """Exact 1-based global rank by ``(score_col, id_col)`` per row.

    Both columns must be integers; ids unique (ties broken by id make
    the rank a total order, matching the SQL twin's ROW_NUMBER).
    Output: ``id_col, score_col, rank_col``.
    """
    import pandas as pd

    from . import table_from_pandas

    def _cell_counts(batch: pa.Table) -> pa.Table:
        s = batch[score_col].to_numpy().astype(np.int64)
        b = batch[id_col].to_numpy().astype(np.int64) >> shift
        # one combined key per (score, bucket) cell; scores and buckets
        # are non-negative in-domain, so the pack is collision-free
        cells = np.stack([s, b], axis=1)
        uniq, counts = np.unique(cells, axis=0, return_counts=True)
        return pa.table(
            {
                "s": pa.array(uniq[:, 0]),
                "b": pa.array(uniq[:, 1]),
                "n": pa.array(counts.astype(np.int64)),
            }
        )

    cells = (
        ds.select_columns([score_col, id_col])
        .map_batches(_cell_counts, batch_format="pyarrow")
        .groupby(["s", "b"])
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )  # bounded: one row per non-empty (score, bucket) cell
    if cells:
        # (s, b) ordering happens driver-side on the bounded cell table
        # (numpy lexsort) instead of a Dataset.sort — that sort was a
        # full extra all-to-all per global_rank call
        ss = np.array([r["s"] for r in cells], dtype=np.int64)
        bs = np.array([r["b"] for r in cells], dtype=np.int64)
        ns = np.array([r["n"] for r in cells], dtype=np.int64)
        order = np.lexsort((bs, ss))
        ss, bs, ns = ss[order], bs[order], ns[order]
        bases = np.concatenate([[0], np.cumsum(ns)[:-1]])
        offsets = {
            (int(s), int(b)): int(base)
            for s, b, base in zip(ss, bs, bases)
        }
    else:
        offsets = {}
    offsets_ref = ray.put(offsets)

    def _rank(group: pd.DataFrame) -> pa.Table:
        table = _get_offsets(offsets_ref)
        s = int(group[score_col].iloc[0])
        ids = group[id_col].to_numpy().astype(np.int64)
        b = int(ids[0] >> shift)
        order = np.argsort(ids, kind="stable")
        ranks = np.empty(len(ids), dtype=np.int64)
        ranks[order] = table[(s, b)] + 1 + np.arange(len(ids), dtype=np.int64)
        return table_from_pandas(
            pd.DataFrame(
                {
                    id_col: ids,
                    score_col: group[score_col].to_numpy().astype(np.int64),
                    rank_col: ranks,
                }
            )
        )

    def _with_bucket(batch: pa.Table) -> pa.Table:
        b = batch[id_col].to_numpy().astype(np.int64) >> shift
        return batch.append_column("_bucket", pa.array(b))

    return (
        ds.select_columns([score_col, id_col])
        .map_batches(_with_bucket, batch_format="pyarrow")
        .groupby([score_col, "_bucket"])
        .map_groups(_rank, batch_format="pandas")
    )


def global_cumsum(
    ds: Dataset,
    order_col: str,
    id_col: str,
    value_col: str,
    order_shift: int = 32,
    shift: int = 16,
    split_threshold: int = 1 << 18,
    out_col: str = "run_sum",
) -> Dataset:
    """Exact global running total — SQL's ``SUM(v) OVER (ORDER BY
    order_col, id_col ROWS UNBOUNDED PRECEDING)`` — as the distributed
    prefix-sum scan (no global sort-then-stitch), with cost-based
    hot-value splitting:

    1. a *sum* exchange over coarse order-range cells
       (``order >> order_shift``) whose per-cell row counts + value
       totals the driver reads (bounded: one row per non-empty range);
    2. cells larger than ``split_threshold`` — a hot order value, e.g.
       one timestamp covering most of the corpus — get ONE extra
       bounded exchange over their rows only, keyed
       ``(order_low, id >> shift)``: exact-order + id-range subcells of
       ≤ 2**shift rows by id uniqueness, exactly :func:`global_rank`'s
       skew armor.  No heavy cells (the common case) → the pass is
       skipped entirely;
    3. the driver prefix-sums the cells (subcells nested in
       ``(order_low, id-range)`` order inside their coarse cell) into
       exclusive base sums, broadcast once;
    4. a *scan* exchange groups rows by their final cell, lex-sorts
       ``(order, id)`` locally and emits ``base + local_cumsum``.

    Range cells compose because they are disjoint order intervals;
    split subcells compose because they pin one exact order value and
    an id range (order within a coarse cell never interleaves across
    them).  All three columns must be integers; ids unique.  Output:
    ``id_col, order_col, out_col`` (inclusive running total).
    """
    import pandas as pd

    from . import table_from_pandas

    projected = ds.select_columns([order_col, id_col, value_col])

    def _coarse_sums(batch: pa.Table) -> pa.Table:
        o = batch[order_col].to_numpy().astype(np.int64)
        v = batch[value_col].to_numpy().astype(np.int64)
        c = o >> order_shift
        uniq, inv = np.unique(c, return_inverse=True)
        # int64 scatter-add (bincount's float64 weights would cap
        # exactness at 2**53)
        sums = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(sums, inv, v)
        counts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        return pa.table(
            {"c": pa.array(uniq), "n": pa.array(counts), "v": pa.array(sums)}
        )

    coarse = (
        projected.map_batches(_coarse_sums, batch_format="pyarrow")
        .groupby("c")
        .aggregate(Sum("n", alias_name="n"), Sum("v", alias_name="v"))
        .sort("c")
        .take_all()
    )  # bounded: one row per non-empty order range
    heavy = {int(r["c"]) for r in coarse if int(r["n"]) > split_threshold}

    sub_sums: dict[int, list] = {}
    if heavy:
        heavy_ref = ray.put(np.array(sorted(heavy), dtype=np.int64))

        def _sub_sums(batch: pa.Table) -> pa.Table:
            hs = _get_offsets(heavy_ref)
            o = batch[order_col].to_numpy().astype(np.int64)
            c = o >> order_shift
            mask = np.isin(c, hs)
            if not mask.any():
                return pa.table(
                    {
                        "c": pa.array([], pa.int64()),
                        "o2": pa.array([], pa.int64()),
                        "b2": pa.array([], pa.int64()),
                        "v": pa.array([], pa.int64()),
                    }
                )
            o, c = o[mask], c[mask]
            o2 = o - (c << order_shift)  # in [0, 2**order_shift)
            b2 = batch[id_col].to_numpy().astype(np.int64)[mask] >> shift
            v = batch[value_col].to_numpy().astype(np.int64)[mask]
            key = np.stack([c, o2, b2], axis=1)
            uniq, inv = np.unique(key, axis=0, return_inverse=True)
            sums = np.zeros(len(uniq), dtype=np.int64)
            np.add.at(sums, inv, v)
            return pa.table(
                {
                    "c": pa.array(uniq[:, 0]),
                    "o2": pa.array(uniq[:, 1]),
                    "b2": pa.array(uniq[:, 2]),
                    "v": pa.array(sums),
                }
            )

        subs = (
            projected.map_batches(_sub_sums, batch_format="pyarrow")
            .groupby(["c", "o2", "b2"])
            .aggregate(Sum("v", alias_name="v"))
            .sort(["c", "o2", "b2"])
            .take_all()
        )  # bounded: distinct orders + rows/2**shift inside heavy cells
        for r in subs:
            sub_sums.setdefault(int(r["c"]), []).append(
                (int(r["o2"]), int(r["b2"]), int(r["v"]))
            )

    # exclusive prefix over the composed cell sequence
    offsets: dict[tuple, int] = {}
    running = 0
    for r in coarse:
        c = int(r["c"])
        if c in heavy:
            for o2, b2, v in sub_sums.get(c, []):  # already (o2, b2)-sorted
                offsets[(c, o2, b2)] = running
                running += v
        else:
            offsets[(c, -1, -1)] = running
            running += int(r["v"])
    offsets_ref = ray.put(offsets)
    heavy_arr_ref = ray.put(np.array(sorted(heavy), dtype=np.int64))

    def _with_cell(batch: pa.Table) -> pa.Table:
        hs = _get_offsets(heavy_arr_ref)
        o = batch[order_col].to_numpy().astype(np.int64)
        c = o >> order_shift
        o2 = np.full(len(o), -1, dtype=np.int64)
        b2 = np.full(len(o), -1, dtype=np.int64)
        if len(hs):
            m = np.isin(c, hs)
            o2[m] = o[m] - (c[m] << order_shift)
            b2[m] = batch[id_col].to_numpy().astype(np.int64)[m] >> shift
        return batch.append_column("_c", pa.array(c)).append_column(
            "_o2", pa.array(o2)
        ).append_column("_b2", pa.array(b2))

    def _scan(group: pd.DataFrame) -> pa.Table:
        table = _get_offsets(offsets_ref)
        key = (
            int(group["_c"].iloc[0]),
            int(group["_o2"].iloc[0]),
            int(group["_b2"].iloc[0]),
        )
        ids = group[id_col].to_numpy().astype(np.int64)
        ords = group[order_col].to_numpy().astype(np.int64)
        vals = group[value_col].to_numpy().astype(np.int64)
        pos = np.lexsort((ids, ords))
        run = np.empty(len(ids), dtype=np.int64)
        run[pos] = table[key] + np.cumsum(vals[pos])
        return table_from_pandas(
            pd.DataFrame({id_col: ids, order_col: ords, out_col: run})
        )

    return (
        projected.map_batches(_with_cell, batch_format="pyarrow")
        .groupby(["_c", "_o2", "_b2"])
        .map_groups(_scan, batch_format="pandas")
    )


def multi_global_rank(
    ds: Dataset,
    score_cols: "list[str]",
    id_col: str,
    shift: int = 16,
    rank_col: str = "rank",
    metric_col: str = "metric",
) -> Dataset:
    """Rank the SAME rows by SEVERAL score columns at once — ONE count
    exchange + ONE rank exchange total, instead of two per metric.

    The single-metric :func:`global_rank` plan generalizes by adding the
    metric index to the cell key: counts fold over ``(m, score, bucket)``
    cells, the driver prefix-sums each metric's cells independently, and
    the rank exchange groups by the same triple. The orders_rfm chain
    (3 metrics) drops from 6 exchanges to 2 this way.

    Output: ``id_col, metric_col (index into score_cols), rank_col`` —
    one row per (input row, metric); each metric's ranks are exactly
    ``ROW_NUMBER() OVER (ORDER BY score_cols[m], id_col)``.
    """
    import pandas as pd

    from . import table_from_pandas

    n_metrics = len(score_cols)

    def _cell_counts(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy().astype(np.int64)
        b = ids >> shift
        ms, ss, bs, ns = [], [], [], []
        for m, col in enumerate(score_cols):
            s = batch[col].to_numpy().astype(np.int64)
            cells = np.stack([s, b], axis=1)
            uniq, counts = np.unique(cells, axis=0, return_counts=True)
            ms.append(np.full(len(uniq), m, dtype=np.int64))
            ss.append(uniq[:, 0])
            bs.append(uniq[:, 1])
            ns.append(counts.astype(np.int64))
        return pa.table(
            {
                "m": np.concatenate(ms),
                "s": np.concatenate(ss),
                "b": np.concatenate(bs),
                "n": np.concatenate(ns),
            }
        )

    cells = (
        ds.select_columns([id_col, *score_cols])
        .map_batches(_cell_counts, batch_format="pyarrow")
        .groupby(["m", "s", "b"])
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )  # bounded: one row per non-empty (metric, score, bucket) cell
    offsets: dict = {}
    if cells:
        mm = np.array([r["m"] for r in cells], dtype=np.int64)
        ss = np.array([r["s"] for r in cells], dtype=np.int64)
        bs = np.array([r["b"] for r in cells], dtype=np.int64)
        ns = np.array([r["n"] for r in cells], dtype=np.int64)
        order = np.lexsort((bs, ss, mm))
        mm, ss, bs, ns = mm[order], ss[order], bs[order], ns[order]
        # each metric's prefix sum restarts at 0 (rank domains are
        # independent); metric boundaries found on the sorted cells
        bases = np.zeros(len(ns), dtype=np.int64)
        for m in range(n_metrics):
            sel = mm == m
            nm = ns[sel]
            if len(nm):
                bases[sel] = np.concatenate([[0], np.cumsum(nm)[:-1]])
        offsets = {
            (int(m), int(s), int(b)): int(base)
            for m, s, b, base in zip(mm, ss, bs, bases)
        }
    offsets_ref = ray.put(offsets)

    def _explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy().astype(np.int64)
        b = ids >> shift
        out_id, out_m, out_s, out_b = [], [], [], []
        for m, col in enumerate(score_cols):
            out_id.append(ids)
            out_m.append(np.full(len(ids), m, dtype=np.int64))
            out_s.append(batch[col].to_numpy().astype(np.int64))
            out_b.append(b)
        return pa.table(
            {
                id_col: np.concatenate(out_id),
                "_m": np.concatenate(out_m),
                "_s": np.concatenate(out_s),
                "_bucket": np.concatenate(out_b),
            }
        )

    def _rank(group: pd.DataFrame) -> pa.Table:
        table = _get_offsets(offsets_ref)
        m = int(group["_m"].iloc[0])
        s = int(group["_s"].iloc[0])
        ids = group[id_col].to_numpy().astype(np.int64)
        b = int(ids[0] >> shift)
        order = np.argsort(ids, kind="stable")
        ranks = np.empty(len(ids), dtype=np.int64)
        ranks[order] = table[(m, s, b)] + 1 + np.arange(
            len(ids), dtype=np.int64
        )
        return table_from_pandas(
            pd.DataFrame(
                {id_col: ids, metric_col: m, rank_col: ranks}
            )
        )

    return (
        ds.select_columns([id_col, *score_cols])
        .map_batches(_explode, batch_format="pyarrow")
        .groupby(["_m", "_s", "_bucket"])
        .map_groups(_rank, batch_format="pandas")
    )
