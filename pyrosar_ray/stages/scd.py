"""SCD Type-2 interval build from a change stream.

The lakehouse dimension-history primitive: a keyed event stream whose
attribute value changes over time collapses into validity intervals —
one row per maximal run of equal consecutive attribute values, carrying
``[valid_from, valid_to)`` and an ``is_current`` flag, with the open
interval closed by a high sentinel (the standard warehouse convention;
it also keeps the hash gate away from null-timestamp edge cases).

Scale shape: ONE exchange — events co-partition by key through
``groupby(key).map_groups`` (group size is bounded by a key's event
count, the same contract as sessionize/funnel in
``pyrosar_ray/stages/sessions.py``), run detection and the interval
stitch are vectorized numpy inside the group, and the output is typed
Arrow via ``typed_groups`` so the exchange-terminal block schema stays
pinned. Determinism: events order by ``(ts, id)`` everywhere — two
same-timestamp events of one key cannot reorder between engine and
twin.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

from pyrosar_ray.stages.groups import typed_groups

SCD2_SENTINEL = "9999-12-31 00:00:00.000000"
_TS_FMT = "%Y-%m-%d %H:%M:%S.%f"


def scd2_intervals(
    events: Dataset,
    key_col: str = "user_id",
    attr_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    sentinel: str = SCD2_SENTINEL,
) -> Dataset:
    """(key, attr, valid_from, valid_to, is_current) validity intervals.

    A new interval starts at the first event of every maximal run of
    equal consecutive ``attr_col`` values in ``(ts, id)`` order; its
    ``valid_to`` is the next run's ``valid_from`` (half-open intervals
    tile the key's whole history), and the last run closes with
    ``sentinel`` and ``is_current=1``.
    """
    schema = {
        key_col: pa.int64(),
        attr_col: pa.string(),
        "valid_from": pa.string(),
        "valid_to": pa.string(),
        "is_current": pa.int64(),
    }

    @typed_groups(schema)
    def _build(df: pd.DataFrame) -> pd.DataFrame:
        ts_us = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        order = np.lexsort((df[id_col].to_numpy(), ts_us))
        attr = df[attr_col].to_numpy()[order]
        change = np.ones(len(attr), dtype=bool)
        change[1:] = attr[1:] != attr[:-1]
        starts = np.flatnonzero(change)
        stamps = (
            pd.Series(df[ts_col].to_numpy()[order][starts])
            .dt.strftime(_TS_FMT)
            .to_numpy()
        )
        valid_to = np.empty(len(starts), dtype=object)
        valid_to[:-1] = stamps[1:]
        valid_to[-1] = sentinel
        is_current = np.zeros(len(starts), dtype=np.int64)
        is_current[-1] = 1
        return pd.DataFrame(
            {
                key_col: df[key_col].to_numpy()[order][starts],
                attr_col: attr[starts],
                "valid_from": stamps,
                "valid_to": valid_to,
                "is_current": is_current,
            }
        )

    return (
        events.select_columns([key_col, attr_col, ts_col, id_col])
        .groupby(key_col)
        .map_groups(_build, batch_format="pandas")
    )
