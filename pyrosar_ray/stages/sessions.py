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
    bucket-edge sessions are stitched by a driver pass over the
    per-bucket summaries (first/last timestamp + local session count —
    one tiny row per (key, bucket)). A session spanning buckets b, b+1
    merges when the cross-boundary gap ≤ ``gap_us``; merged offsets
    cascade so final ids equal the single-partition result exactly.
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
        return df

    local = bucketed.groupby([key_col, "_bucket"]).map_groups(_local, batch_format="pandas")

    # per-(key, bucket) summaries — tiny, driver-merged
    def _summary(df: pd.DataFrame) -> pd.DataFrame:
        us = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        return pd.DataFrame(
            {
                key_col: [df[key_col].iloc[0]],
                "_bucket": [df["_bucket"].iloc[0]],
                "first_us": [int(us.min())],
                "last_us": [int(us.max())],
                "n_sessions": [int(df["_local_sid"].max()) + 1],
            }
        )

    summaries = (
        local.groupby([key_col, "_bucket"]).map_groups(_summary, batch_format="pandas").to_pandas()
    )
    summaries = summaries.sort_values([key_col, "_bucket"], kind="mergesort")
    offsets: dict[tuple, int] = {}
    for key, grp in summaries.groupby(key_col):
        running = 0
        prev_last = None
        for _, row in grp.iterrows():  # summaries are tiny (one row per bucket)
            merged = prev_last is not None and (row["first_us"] - prev_last) <= gap_us
            if merged:
                running -= 1  # first local session continues the previous one
            offsets[(key, row["_bucket"])] = running
            running += int(row["n_sessions"])
            prev_last = row["last_us"]
    ref = ray.put(offsets)

    class _Adjust:
        def __init__(self):
            self.offsets = ray.get(ref)

        def __call__(self, batch: "pa.Table") -> "pa.Table":
            keys = batch[key_col].to_numpy()
            buckets = batch["_bucket"].to_numpy()
            local_sid = batch["_local_sid"].to_numpy()
            off = np.fromiter(
                (self.offsets[(k, b)] for k, b in zip(keys.tolist(), buckets.tolist())),
                dtype=np.int64,
                count=len(keys),
            )
            out = batch.append_column("session_id", pa.array(local_sid + off))
            return out.drop_columns(["_bucket", "_local_sid"])

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
