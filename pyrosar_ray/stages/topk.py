"""Per-group top-k with partial pushdown.

The distributed rendering of ``row_number() OVER (PARTITION BY key
ORDER BY v DESC, id) <= k``: every batch first reduces LOCALLY to at
most k rows per key it contains (so the exchange carries
O(k x keys x blocks) rows, never the full input — the same partial
combine that makes a distributed Sum scale), then groups co-partition
on a salted key hash and a single vectorized lexsort-rank kernel per
partition emits the exact global top-k. Ties break on ``id_col``
ascending, so the result is total-ordered and cluster-size independent.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

from . import table_from_pandas


def _local_topk(df: pd.DataFrame, key: str, order_col: str, id_col: str, k: int,
                descending: bool) -> pd.DataFrame:
    df = df.sort_values(
        [key, order_col, id_col], ascending=[True, not descending, True]
    )
    return df.groupby(key, sort=False).head(k)


def topk_per_group(
    ds: Dataset,
    key: str,
    order_col: str,
    k: int,
    id_col: str,
    descending: bool = True,
    num_partitions: int = 32,
) -> Dataset:
    """Top ``k`` rows per ``key`` ordered by (``order_col``, ``id_col``).

    Output: (key, id_col, order_col, rank) with rank 1..k per key.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    from .spatial import _cell_partition

    cols = [key, id_col, order_col]

    def _partial(batch: pa.Table) -> pa.Table:
        df = batch.select(cols).to_pandas()
        part = _local_topk(df, key, order_col, id_col, k, descending)
        out = table_from_pandas(part)
        keys = part[key].to_numpy()
        if keys.dtype.kind not in "iu":  # hash strings deterministically
            import hashlib

            hv = np.array(
                [
                    int.from_bytes(
                        hashlib.md5(str(s).encode("utf-8")).digest()[:8], "big"
                    ) >> 1
                    for s in keys
                ],
                dtype=np.int64,
            )
        else:
            hv = keys.astype(np.int64)
        return out.append_column("_p", pa.array(_cell_partition(hv, num_partitions)))

    def _merge(tab: pa.Table) -> pa.Table:
        df = tab.select(cols).to_pandas()
        part = _local_topk(df, key, order_col, id_col, k, descending)
        ranks = part.groupby(key, sort=False).cumcount() + 1
        part = part.assign(rank=ranks.astype(np.int64))
        return table_from_pandas(part)

    return (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("_p")
        .map_groups(_merge, batch_format="pyarrow")
    )
