"""Tumbling / hopping time-window aggregates over an event stream.

The reference has no windowed aggregate (SURVEY.md §2.10: ``groupbyTime``
is its only order-sensitive grouping), but a large-scale training-data
pipeline needs fixed-window rollups (events/sec dashboards, per-window
quality counters, rate limits).  Both operators here are expressed
Ray-Data-first as a *partial combine* followed by a small ``groupby``:

1. ``map_batches`` assigns each row its window start(s) with integer-µs
   arithmetic and pre-aggregates ``(window_start, key) → (n, sum)``
   WITHIN the batch, so the shuffle carries one row per distinct
   (window, key) per block — never the raw events;
2. a global ``groupby(window_start, key).aggregate(Sum, Sum)`` merges the
   partials.  The post-shuffle key space is ``time_range/width × keys``
   (hours-in-a-year × event types ≈ 10⁴–10⁵ rows even at 100 TB of
   events), so the wide stage is trivially small.

Hopping (sliding) windows of width ``W`` and hop ``H`` with ``W % H == 0``
expand each event into exactly ``W/H`` member windows via a vectorized
repeat — the expansion happens on the already-combined partials' inputs
inside the batch, before the partial groupby, so the blow-up never
crosses the wire either.

Window assignment uses integer microseconds end-to-end
(``window_start = ts_us // width * width``), bit-equal to the DuckDB
twin ``(epoch_us(ts) // W) * W``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset
from ray.data.aggregate import Sum

from . import table_from_pandas


def _ts_us(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Timestamp column → int64 epoch microseconds."""
    if pa.types.is_timestamp(col.type):
        col = col.cast(pa.timestamp("us")).cast(pa.int64())
    elif not pa.types.is_integer(col.type):
        raise TypeError(f"expected timestamp or integer ts column, got {col.type}")
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return np.asarray(arr.cast(pa.int64()))


def tumbling_window(
    events: Dataset,
    width_us: int,
    ts_col: str = "ts",
    key_col: str | None = "event_type",
    value_col: str | None = "value",
) -> Dataset:
    """Per-(window, key) count + sum over fixed non-overlapping windows.

    Output columns: ``window_start`` (int64 epoch µs), ``key_col`` (if
    given), ``n`` (int64) and ``sum_cents`` (int64 of per-row
    ``floor(value·100 + 0.5)``, only if ``value_col``).
    """
    if width_us <= 0:
        raise ValueError("width_us must be positive")
    group_cols = ["window_start"] + ([key_col] if key_col else [])

    def _partial(batch: pa.Table) -> pa.Table:
        us = _ts_us(batch[ts_col])
        frame = {"window_start": us // width_us * width_us, "n": np.int64(1)}
        if key_col:
            frame[key_col] = batch[key_col].to_pandas()
        if value_col:
            # quantize per row BEFORE summing (floor(v*100 + 0.5) on the
            # row's double is deterministic IEEE on any engine); the
            # integer sum is then independent of combine order — float
            # sums of distributed partials are not reproducible
            v = batch[value_col].to_pandas().to_numpy()
            frame["sum_cents"] = np.floor(v * 100.0 + 0.5).astype(np.int64)
        df = pd.DataFrame(frame)
        agg = {"n": "sum"} | ({"sum_cents": "sum"} if value_col else {})
        part = df.groupby(group_cols, sort=False, as_index=False).agg(agg)
        return table_from_pandas(part)

    partials = events.map_batches(_partial, batch_format="pyarrow")
    aggs = [Sum("n", alias_name="n")]
    if value_col:
        aggs.append(Sum("sum_cents", alias_name="sum_cents"))
    return partials.groupby(group_cols).aggregate(*aggs)


def hopping_window(
    events: Dataset,
    width_us: int,
    hop_us: int,
    ts_col: str = "ts",
    key_col: str | None = "event_type",
) -> Dataset:
    """Per-(window, key) counts for overlapping windows (width, hop).

    A window starts at every multiple of ``hop_us`` and spans
    ``width_us``; an event at ``t`` is a member of the ``width/hop``
    windows starting at ``(t // hop - j) * hop`` for
    ``j ∈ [0, width/hop)``.  Requires ``width_us % hop_us == 0``.

    Output columns: ``window_start`` (int64 epoch µs), ``key_col`` (if
    given), ``n`` (int64).
    """
    if hop_us <= 0 or width_us <= 0:
        raise ValueError("width_us and hop_us must be positive")
    if width_us % hop_us:
        raise ValueError("width_us must be a multiple of hop_us")
    fanout = width_us // hop_us
    group_cols = ["window_start"] + ([key_col] if key_col else [])

    def _partial(batch: pa.Table) -> pa.Table:
        us = _ts_us(batch[ts_col])
        base = us // hop_us * hop_us  # newest member window per event
        offsets = np.arange(fanout, dtype=np.int64) * hop_us
        starts = (base[:, None] - offsets[None, :]).ravel()
        frame = {"window_start": starts, "n": np.int64(1)}
        if key_col:
            frame[key_col] = np.repeat(
                batch[key_col].to_pandas().to_numpy(), fanout
            )
        df = pd.DataFrame(frame)
        part = df.groupby(group_cols, sort=False, as_index=False).agg({"n": "sum"})
        return table_from_pandas(part)

    partials = events.map_batches(_partial, batch_format="pyarrow")
    return partials.groupby(group_cols).aggregate(Sum("n", alias_name="n"))


def rolling_sum(
    events: Dataset,
    frame_rows: int = 3,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> Dataset:
    """Per-key ordered rolling sum over the last ``frame_rows`` rows.

    The ordered-window analytic (SQL ``SUM(...) OVER (PARTITION BY key
    ORDER BY ts, id ROWS BETWEEN frame-1 PRECEDING AND CURRENT ROW)``)
    as a hash-shuffle on the key plus one sorted cumsum-difference scan
    per group — no per-row Python. Values are quantized to integer
    cents per row BEFORE summation (``floor(v·100 + 0.5)``), so the
    distributed result is bit-equal to any engine's window sum.
    Per-key volume bounded as in sessionize; a hot key would take the
    range-partitioned variant (stages/sessions.py) with frame overlap
    at bucket edges.
    """

    def _roll(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([ts_col, id_col], kind="mergesort")
        cents = np.floor(df[value_col].to_numpy() * 100.0 + 0.5).astype(np.int64)
        cum = np.concatenate([[0], np.cumsum(cents)])
        lo = np.maximum(np.arange(len(cents)) + 1 - frame_rows, 0)
        roll = cum[1:] - cum[lo]
        return pd.DataFrame(
            {
                key_col: df[key_col].to_numpy(),
                id_col: df[id_col].to_numpy(),
                "roll_cents": roll,
            }
        )

    return events.groupby(key_col).map_groups(_roll, batch_format="pandas")


def rolling_ewma(
    events: Dataset,
    frame_rows: int = 16,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> Dataset:
    """Per-key exponentially-weighted moving average over the last
    ``frame_rows`` rows, exact in dyadic fixed point.

    The classic EWMA (α = 1/2) is recursive and therefore not
    finite-window; the production streaming form truncates it to a
    window, and with dyadic weights the truncated sum is EXACT in
    integers: the row at offset ``j`` back (0 = current) carries weight
    ``2^(frame_rows-1-j)``, so the output ``ewma_fp`` is the fixed-point
    value ``Σ cents_{t-j} · 2^(15-j)`` — bit-equal on any engine, no
    float accumulation order to disagree about. Missing predecessors at
    a partition head simply contribute nothing (the SQL frame
    semantics).

    Same plan shape as :func:`rolling_sum`: one hash exchange on the
    key, then a per-group sorted sliding-window dot product
    (``sliding_window_view @ weights`` — vectorized, no per-row
    Python). int64-safe: cents < 2^25, weights sum < 2^17.
    """

    w = (1 << np.arange(frame_rows, dtype=np.int64))  # col j ↔ offset frame-1-j

    def _ewma(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([ts_col, id_col], kind="mergesort")
        cents = np.floor(df[value_col].to_numpy() * 100.0 + 0.5).astype(np.int64)
        padded = np.concatenate([np.zeros(frame_rows - 1, dtype=np.int64), cents])
        win = np.lib.stride_tricks.sliding_window_view(padded, frame_rows)
        out = win @ w
        return pd.DataFrame(
            {
                key_col: df[key_col].to_numpy(),
                id_col: df[id_col].to_numpy(),
                "ewma_fp": out,
            }
        )

    return events.groupby(key_col).map_groups(_ewma, batch_format="pandas")


def tumbling_distinct(
    events: Dataset,
    width_us: int,
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> Dataset:
    """Exact distinct-``key_col`` count per tumbling window.

    Distinct-count is inherently an exchange on the (window, key) pair:
    batches emit their LOCAL distinct pairs (already deduplicated, so
    the shuffle carries at most one row per pair per block), a groupby
    on the pair collapses global duplicates, and a second bounded
    groupby counts pairs per window. Output: ``window_start`` (int64
    epoch µs), ``n_distinct`` (int64).
    """
    from ray.data.aggregate import Count, Sum

    if width_us <= 0:
        raise ValueError("width_us must be positive")

    def _pairs(batch: pa.Table) -> pa.Table:
        us = _ts_us(batch[ts_col])
        df = pd.DataFrame(
            {
                "window_start": us // width_us * width_us,
                key_col: batch[key_col].to_pandas().to_numpy(),
            }
        ).drop_duplicates()
        return table_from_pandas(df)

    pairs = events.map_batches(_pairs, batch_format="pyarrow")
    deduped = pairs.groupby(["window_start", key_col]).aggregate(
        Count(alias_name="_c")
    )

    def _partial(batch: pa.Table) -> pa.Table:
        df = (
            batch.select(["window_start"])
            .to_pandas()
            .groupby("window_start", as_index=False)
            .size()
        )
        return table_from_pandas(
            df.rename(columns={"size": "n_distinct"}))

    return (
        deduped.map_batches(_partial, batch_format="pyarrow")
        .groupby("window_start")
        .aggregate(Sum("n_distinct", alias_name="n_distinct"))
    )


def resample_events(
    events: Dataset,
    width_us: int = 3_600_000_000,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> Dataset:
    """Per-key DENSE time-grid resample with zero-fill.

    The gap-materializing member of the window family: each key's
    event stream becomes one row per grid step between its first and
    last event — steps with no events emit ``n=0, sum_cents=0`` (the
    time-series regularization every forecasting/feature pipeline
    needs; tumbling_window only emits occupied windows).

    One hash exchange on the key, then a vectorized bincount over the
    dense span per group. Output volume per key = span/width — bounded
    by the stream's time horizon, not its row count; a key whose span
    x resolution explodes (years at 1-s steps) is a caller bug, same
    contract as the hopping window's expansion factor.
    """
    if width_us <= 0:
        raise ValueError("width_us must be positive")

    def _grid(df: pd.DataFrame) -> pd.DataFrame:
        us = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        bucket = us // width_us
        cents = np.floor(df[value_col].to_numpy() * 100.0 + 0.5).astype(np.int64)
        lo, hi = int(bucket.min()), int(bucket.max())
        idx = bucket - lo
        size = hi - lo + 1
        n = np.bincount(idx, minlength=size).astype(np.int64)
        s = np.rint(
            np.bincount(idx, weights=cents.astype(np.float64), minlength=size)
        ).astype(np.int64)
        return pd.DataFrame(
            {
                key_col: np.full(size, df[key_col].iloc[0], dtype=np.int64),
                "bucket_start": (np.arange(lo, hi + 1, dtype=np.int64)) * width_us,
                "n": n,
                "sum_cents": s,
            }
        )

    return events.groupby(key_col).map_groups(_grid, batch_format="pandas")


def late_data_window(
    events: Dataset,
    width_us: int,
    lateness_us: int,
    ts_col: str = "ts",
    delay_col: str = "delay_us",
    key_col: str | None = "event_type",
) -> Dataset:
    """Tumbling windows with WATERMARK semantics: a row whose ingest
    delay exceeds the allowed lateness arrives after its window's
    watermark has passed and is DROPPED — but never silently: the
    window keeps an ``n_late`` ledger alongside ``n_on_time``, the
    accounting every Beam/Flink-style pipeline must surface (a late
    drop that isn't counted is data loss you can't audit).

    Same physical plan as :func:`tumbling_window`: row-local classify +
    in-batch partial fold + one vocabulary-sized groupby merge.
    """
    group_cols = ["window_start"] + ([key_col] if key_col else [])

    def _partial(batch: pa.Table) -> pa.Table:
        us = _ts_us(batch[ts_col])
        delay = np.asarray(batch[delay_col].to_numpy(), dtype=np.int64)
        late = delay > lateness_us
        frame = {
            "window_start": us // width_us * width_us,
            "n_on_time": (~late).astype(np.int64),
            "n_late": late.astype(np.int64),
        }
        if key_col:
            frame[key_col] = batch[key_col].to_pandas().to_numpy()
        df = pd.DataFrame(frame)
        part = df.groupby(group_cols, as_index=False, sort=False)[
            ["n_on_time", "n_late"]
        ].sum()
        return table_from_pandas(part)

    return (
        events.map_batches(_partial, batch_format="pyarrow")
        .groupby(group_cols)
        .aggregate(
            Sum("n_on_time", alias_name="n_on_time"),
            Sum("n_late", alias_name="n_late"),
        )
    )


def keyed_cusum(
    events,
    drift_c: int,
    threshold_c: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "cents",
):
    """Per-key CUSUM change-point scan (Page 1954), integer-exact.

    The textbook recursion ``S_t = max(0, S_{t-1} + (x_t − k))`` looks
    stateful-streaming-only, but it has the exact closed form
    ``S_t = Q_t − min_{0≤j≤t} Q_j`` with ``Q_t`` the running sum of
    ``x − k`` and ``Q_0 = 0`` — a prefix sum minus a prefix min, which
    is (a) one vectorized pass per key here and (b) two standard SQL
    window frames in the twin, so the "recursive → rows-only" caveat
    from the round-4 grooming does not apply. One key-partitioned
    exchange (the scd2/rolling contract: a key's events fit one group);
    inside each group the scan orders by ``(ts, id)`` and emits the
    statistic plus the ``S_t > h`` alarm flag.

    Output: ``key_col, id_col, s_c (int64), alarm (int64 0/1)``.
    """
    import pyarrow as pa

    from .groups import typed_groups

    schema = {
        key_col: pa.int64(),
        id_col: pa.int64(),
        "s_c": pa.int64(),
        "alarm": pa.int64(),
    }

    @typed_groups(schema)
    def _scan(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([ts_col, id_col], kind="mergesort")
        d = g[value_col].to_numpy().astype(np.int64) - drift_c
        q = np.cumsum(d)
        m = np.minimum(np.minimum.accumulate(q), 0)
        s = q - m
        return pd.DataFrame(
            {
                key_col: g[key_col].to_numpy().astype(np.int64),
                id_col: g[id_col].to_numpy().astype(np.int64),
                "s_c": s,
                "alarm": (s > threshold_c).astype(np.int64),
            }
        )

    return events.groupby(key_col).map_groups(_scan, batch_format="pandas")
