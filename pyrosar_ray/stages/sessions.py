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
