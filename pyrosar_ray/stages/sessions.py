"""Distributed session-window grouping (groupbyTime at engine scale).

Reference semantics (pyroSAR/ancillary.py:73-108): items sorted by time;
a new session starts when the gap to the session's last element exceeds
``gap``. For sorted input the gap-to-last-element rule equals the
gap-to-previous-element rule, which makes sessionization a per-key
sorted scan.

Physical plan: hash-shuffle by the session key (user), then one sorted
scan per group. Gap comparison uses INTEGER microseconds end-to-end so
results are bit-equal to the SQL oracle (no float timestamp rounding).
Scale note: per-user event counts are bounded in practice; a pathological
hot key would be handled by range-partitioning that key's rows by time
and stitching sessions at the bucket edges (SURVEY.md §2.5 groupbyTime
row) — not needed for hash-distributed user activity.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset


def sessionize_group(df: pd.DataFrame, ts_col: str, gap_us: int) -> pd.DataFrame:
    """Append ``session_id`` (0-based per key) to one key's sorted events."""
    df = df.sort_values(ts_col, kind="mergesort")
    us = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
    breaks = np.diff(us) > gap_us
    sid = np.concatenate([[0], np.cumsum(breaks)]).astype(np.int64)
    return df.assign(session_id=sid)


def sessionize(
    events: Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_us: int = 1_800_000_000,
) -> Dataset:
    """Assign per-key session ids (new session when gap > ``gap_us`` µs)."""
    return events.groupby(key_col).map_groups(
        lambda df: sessionize_group(df, ts_col, gap_us), batch_format="pandas"
    )


def sessionize_range_partitioned(
    events: Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_us: int = 1_800_000_000,
    bucket_us: int = 86_400_000_000,
) -> Dataset:
    """Sessionize with (key, time-bucket) partitioning + edge stitching.

    The scale path for keys whose event volume outgrows one reducer
    (SURVEY.md §2.5 groupbyTime row): rows hash on (key, coarse time
    bucket), each partition sessionizes its own sorted range, and
    bucket-edge sessions are stitched from per-bucket summaries
    (first/last timestamp + local session count — one tiny row per
    (key, bucket), produced by a distributed Min/Max aggregate). The
    stitch itself is a vectorized per-key exclusive prefix-sum over the
    sorted summaries (groupby-cumsum of session counts minus cumsum of
    boundary merges — no Python loop), broadcast as an indexed table
    and probed per batch with one ``MultiIndex.get_indexer`` hash probe.
    A session spanning buckets b, b+1 merges when the cross-boundary
    gap ≤ ``gap_us``; merged offsets cascade so final ids equal the
    single-partition result exactly.
    """
    import pyarrow as pa
    import ray

    def _bucket(batch: "pa.Table") -> "pa.Table":
        us = batch[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        return batch.append_column("_bucket", pa.array(us // bucket_us))

    bucketed = events.map_batches(_bucket, batch_format="pyarrow")

    def _local(df: pd.DataFrame) -> pd.DataFrame:
        df = sessionize_group(df, ts_col, gap_us).rename(
            columns={"session_id": "_local_sid"}
        )
        us = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        return df.assign(_us=us)

    # ONE shuffle: the (key, bucket) groupby. Materialized so the
    # summary pass and the final adjust pass both read the shuffled
    # blocks instead of re-executing the exchange (object-store resident,
    # spill-backed — the standard inter-phase checkpoint).
    local = (
        bucketed.groupby([key_col, "_bucket"])
        .map_groups(_local, batch_format="pandas")
        .materialize()
    )

    # per-(key, bucket) summaries WITHOUT a second shuffle: map_groups
    # emits whole groups per block, so a per-batch groupby-agg is already
    # exact (partial == total); only the tiny summary rows leave the
    # workers.
    def _summarize(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby([key_col, "_bucket"], as_index=False).agg(
            first_us=("_us", "min"),
            last_us=("_us", "max"),
            _max_sid=("_local_sid", "max"),
        )
        return g

    # dynamic block splitting may split one task's output mid-group, so
    # a (key, bucket) can surface as a couple of partial rows — the
    # driver-side re-combine below (over the tiny summary table) makes
    # the result exact either way.
    summaries = (
        local.map_batches(_summarize, batch_format="pandas")
        .to_pandas()
        .groupby([key_col, "_bucket"], as_index=False)
        .agg(
            first_us=("first_us", "min"),
            last_us=("last_us", "max"),
            _max_sid=("_max_sid", "max"),
        )
        .sort_values([key_col, "_bucket"], kind="mergesort")
        .reset_index(drop=True)
    )
    n_sessions = summaries["_max_sid"].to_numpy().astype(np.int64) + 1
    same_key = summaries[key_col].eq(summaries[key_col].shift()).to_numpy()
    gap_prev = summaries["first_us"].to_numpy() - summaries["last_us"].shift().to_numpy()
    merged = same_key & (gap_prev <= gap_us)
    # offset_i = Σ_{j<i, same key} n_sessions_j − (#merged boundaries ≤ i)
    cum_sessions = (
        pd.Series(n_sessions).groupby(summaries[key_col], sort=False).cumsum().to_numpy()
        - n_sessions
    )
    cum_merged = (
        pd.Series(merged.astype(np.int64))
        .groupby(summaries[key_col], sort=False)
        .cumsum()
        .to_numpy()
    )
    stitch = summaries[[key_col, "_bucket"]].copy()
    stitch["_offset"] = cum_sessions - cum_merged
    ref = ray.put(stitch)

    class _Adjust:
        def __init__(self):
            s = ray.get(ref)
            self.index = pd.MultiIndex.from_frame(s[[key_col, "_bucket"]])
            self.offset = s["_offset"].to_numpy()

        def __call__(self, batch: "pa.Table") -> "pa.Table":
            probe = pd.MultiIndex.from_arrays(
                [batch[key_col].to_pandas(), batch["_bucket"].to_pandas()]
            )
            pos = self.index.get_indexer(probe)
            assert (pos >= 0).all(), "(key, bucket) missing from stitch table"
            local_sid = batch["_local_sid"].to_numpy()
            out = batch.append_column(
                "session_id", pa.array(local_sid + self.offset[pos])
            )
            return out.drop_columns(["_bucket", "_local_sid", "_us"])

    return local.map_batches(_Adjust, batch_format="pyarrow", concurrency=(1, 4))


def session_counts(
    events: Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_us: int = 1_800_000_000,
) -> Dataset:
    """Per-key session count — one row per key: (key, n_sessions).

    Computed in the same per-group scan (no second shuffle): a key's
    session count is 1 + number of over-gap breaks.
    """

    def _count(df: pd.DataFrame) -> pd.DataFrame:
        us = np.sort(df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64))
        n = 1 + int((np.diff(us) > gap_us).sum()) if len(us) else 0
        return pd.DataFrame({key_col: [df[key_col].iloc[0]], "n_sessions": [n]})

    return events.select_columns([key_col, ts_col]).groupby(key_col).map_groups(
        _count, batch_format="pandas"
    )


def funnel_counts(
    events: Dataset,
    steps: "tuple[str, ...]",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> Dataset:
    """Ordered-funnel completion counts: how many users reach each step.

    The sequence-analytics primitive: a user completes step i when an
    event of ``steps[i]`` exists STRICTLY after their earliest
    completion time of step i-1 (chained minima — the standard strict
    funnel rule, shared exactly with the SQL twin's chained
    ``MIN(ts) FILTER (...)`` subqueries). Events co-partition by user
    (one bounded exchange of (user, type, ts) triples — only rows whose
    type is in the funnel survive the pre-filter); the per-user chain
    is a vectorized searchsorted walk over its sorted timestamps.

    Output: one row per step — (step_idx, step, n_users), n_users
    non-increasing with step_idx.
    """
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    if not steps:
        raise ValueError("steps must be non-empty")
    step_ix = {s: i for i, s in enumerate(steps)}

    def _prefilter(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch[type_col], pa.array(list(steps)))
        t = batch.filter(keep)
        return pa.table(
            {
                user_col: t[user_col],
                "six": pa.array(
                    np.array([step_ix[x] for x in np.asarray(t[type_col]).astype(object)],
                             dtype=np.int64)
                ),
                "us": t[ts_col].cast(pa.int64()),
            }
        )

    def _chain(g: pd.DataFrame) -> pa.Table:
        reached = np.zeros(len(steps), dtype=np.int64)
        t_prev = -np.inf
        for i in range(len(steps)):
            ts_i = g.loc[g["six"] == i, "us"].to_numpy()
            ts_i = ts_i[ts_i > t_prev] if i else ts_i
            if len(ts_i) == 0:
                break
            t_prev = ts_i.min()
            reached[i] = 1
        return pa.table(
            {
                "step_idx": pa.array(np.arange(len(steps), dtype=np.int64)),
                "reached": pa.array(reached),
            }
        )

    per_user = (
        events.select_columns([user_col, type_col, ts_col])
        .map_batches(_prefilter, batch_format="pyarrow")
        .groupby(user_col)
        .map_groups(_chain, batch_format="pandas")
    )
    merged = per_user.groupby("step_idx").aggregate(
        Sum("reached", alias_name="n_users")
    )

    def _label(batch: pa.Table) -> pa.Table:
        ix = batch["step_idx"].to_numpy()
        return batch.append_column(
            "step", pa.array(np.array(list(steps), dtype=object)[ix], pa.string())
        )

    return merged.map_batches(_label, batch_format="pyarrow")


def retention_matrix(
    events: Dataset,
    user_col: str = "user_id",
    ts_col: str = "ts",
    day_us: int = 86_400_000_000,
) -> Dataset:
    """Cohort retention: users from first-activity-day cohort c active
    again d days later.

    The funnel's companion analytics op: per batch, (user, day) pairs
    dedup locally; one user co-partition computes each user's cohort
    (min day) and emits one (cohort_day, day_offset) row per distinct
    activity day — a user contributes each offset at most once, so the
    final bounded groupby-Sum IS the distinct-user count. Day
    arithmetic is integer (epoch_us // day_us), twin-exact.

    Output: (cohort_day, day_offset, n_users) — offset 0 row equals
    the cohort size.
    """
    from ray.data.aggregate import Sum

    def _days(batch: pa.Table) -> pa.Table:
        us = batch[ts_col].cast(pa.int64()).to_numpy()
        df = pd.DataFrame(
            {user_col: batch[user_col].to_numpy(), "day": us // day_us}
        ).drop_duplicates()
        return pa.table(
            {
                user_col: pa.array(df[user_col].to_numpy()),
                "day": pa.array(df["day"].to_numpy().astype(np.int64)),
            }
        )

    def _cohort(g: pd.DataFrame) -> pa.Table:
        days = np.unique(g["day"].to_numpy())
        first = days[0]
        return pa.table(
            {
                "cohort_day": pa.array(np.full(len(days), first, dtype=np.int64)),
                "day_offset": pa.array((days - first).astype(np.int64)),
                "one": pa.array(np.ones(len(days), dtype=np.int64)),
            }
        )

    return (
        events.select_columns([user_col, ts_col])
        .map_batches(_days, batch_format="pyarrow")
        .groupby(user_col)
        .map_groups(_cohort, batch_format="pandas")
        .groupby(["cohort_day", "day_offset"])
        .aggregate(Sum("one", alias_name="n_users"))
    )


def transition_counts(
    events: Dataset,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> Dataset:
    """Markov transition counts: (from_type, to_type, n) over per-user
    event streams ordered by (ts, id).

    The clickstream-analysis primitive: events co-partition by user,
    each group sorts once by the deterministic (ts, id) total order and
    emits its adjacent pairs vectorized; per-group partial counts merge
    in one type²-bounded groupby-Sum. The (ts, id) tie-break is shared
    with the twin's ``lag() OVER (PARTITION BY user ORDER BY ts, id)``.
    """
    from ray.data.aggregate import Sum

    def _prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                user_col: batch[user_col],
                type_col: batch[type_col],
                "us": batch[ts_col].cast(pa.int64()),
                id_col: batch[id_col],
            }
        )

    def _pairs(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["us", id_col], ignore_index=True)
        t = g[type_col].to_numpy()
        if len(t) < 2:
            return pa.table(
                {
                    "from_type": pa.array([], pa.string()),
                    "to_type": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        df = (
            pd.DataFrame({"from_type": t[:-1], "to_type": t[1:]})
            .groupby(["from_type", "to_type"], sort=False, as_index=False)
            .size()
        )
        return pa.table(
            {
                "from_type": pa.array(df["from_type"].to_numpy(), pa.string()),
                "to_type": pa.array(df["to_type"].to_numpy(), pa.string()),
                "n": pa.array(df["size"].to_numpy().astype(np.int64)),
            }
        )

    return (
        events.select_columns([user_col, type_col, ts_col, id_col])
        .map_batches(_prep, batch_format="pyarrow")
        .groupby(user_col)
        .map_groups(_pairs, batch_format="pandas")
        .groupby(["from_type", "to_type"])
        .aggregate(Sum("n", alias_name="n"))
    )
