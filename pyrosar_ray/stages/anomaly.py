"""Keyed robust anomaly detection: median / MAD outlier flagging.

The classic robust-statistics screen (median absolute deviation — the
outlier rule that, unlike z-scores, is not itself corrupted by the
outliers): per key, find the exact lower median m and the exact MAD
(median of |v − m|), then flag rows with |v − m| > k·MAD.

Exactness + scale shape: values quantize to integer cents, so the full
per-key value HISTOGRAM is bounded (keys × distinct cents) — ONE
groupby-Sum exchange materializes it on the driver, and both medians
invert from that same histogram (the deviation histogram is a
driver-side fold of the value histogram; no second corpus pass). The
flagging pass is row-local against the broadcast (median, MAD) table.
Two corpus passes total: histogram + flag.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset
from ray.data.aggregate import Sum

from . import table_from_pandas


def _hist_median(values: np.ndarray, counts: np.ndarray) -> int:
    """Exact lower median (rank ceil(n/2)) from a sorted histogram."""
    order = np.argsort(values, kind="stable")
    v = values[order]
    cum = counts[order].cumsum()
    rank = (int(cum[-1]) + 1) // 2
    return int(v[np.searchsorted(cum, rank)])


def mad_anomalies(
    events: Dataset,
    key_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    k: int = 3,
) -> Dataset:
    """Rows whose |v − median| exceeds ``k`` × MAD within their key.

    Output: (event_id, key, v, dev) in integer cents — dev = |v − m|.
    """

    def _hist(batch: pa.Table) -> pa.Table:
        v = np.floor(batch[value_col].to_numpy() * 100.0 + 0.5).astype(np.int64)
        part = (
            pd.DataFrame({key_col: batch[key_col].to_pandas().to_numpy(), "v": v})
            .groupby([key_col, "v"], sort=False, as_index=False)
            .size()
            .rename(columns={"size": "c"})
        )
        return table_from_pandas(part)

    hist = (
        events.select_columns([key_col, value_col])
        .map_batches(_hist, batch_format="pyarrow")
        .groupby([key_col, "v"])
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )  # bounded: keys × distinct cents
    stats: dict[str, tuple[int, int]] = {}
    for key, grp in hist.groupby(key_col, sort=True):
        vals = grp["v"].to_numpy()
        cnts = grp["c"].to_numpy()
        m = _hist_median(vals, cnts)
        # deviation histogram folds from the SAME value histogram —
        # no second corpus pass
        dev = np.abs(vals - m)
        dd = pd.DataFrame({"d": dev, "c": cnts}).groupby("d", as_index=False).sum()
        mad = _hist_median(dd["d"].to_numpy(), dd["c"].to_numpy())
        stats[key] = (m, mad)

    import ray

    stats_ref = ray.put(stats)

    def _flag(batch: pa.Table) -> pa.Table:
        table = ray.get(stats_ref)
        keys = batch[key_col].to_pandas().to_numpy()
        v = np.floor(batch[value_col].to_numpy() * 100.0 + 0.5).astype(np.int64)
        m = np.array([table[x][0] for x in keys], dtype=np.int64)
        mad = np.array([table[x][1] for x in keys], dtype=np.int64)
        dev = np.abs(v - m)
        keep = dev > k * mad
        return pa.table(
            {
                id_col: batch[id_col].combine_chunks().cast(pa.int64()).filter(
                    pa.array(keep)
                ),
                key_col: pa.array(keys[keep], type=pa.string()),
                "v": pa.array(v[keep]),
                "dev": pa.array(dev[keep]),
            }
        )

    return events.select_columns([id_col, key_col, value_col]).map_batches(
        _flag, batch_format="pyarrow"
    )
