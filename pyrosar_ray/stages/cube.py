"""One-pass CUBE / GROUPING SETS aggregation.

The warehouse multi-rollup: compute every subset of the grouping
dimensions in a SINGLE pass over the data — each batch folds partials
for ALL 2^d grouping sets (rolled-up dimensions take the ``'ALL'``
sentinel), and one bounded groupby merges them. The exchange carries
Σ over sets of |set cardinality| rows per batch — for low-cardinality
dims that is vocabulary-sized regardless of input rows, so the plan is
a streaming scan + small merge at any scale (vs running 2^d separate
aggregations = 2^d passes).

Values use the engine's integer-cent convention (``floor(v·100+0.5)``
per row before summation) so sums are combine-order independent.
"""

from __future__ import annotations

from itertools import combinations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset
from ray.data.aggregate import Sum

from . import table_from_pandas

ALL = "ALL"


def cube_aggregate(
    ds: Dataset,
    dims: list[str],
    value_col: str | None = None,
) -> Dataset:
    """→ one row per (grouping set × group): dims (sentinel ``'ALL'``
    on rolled dimensions, so dim columns must be strings), ``n`` and
    ``sum_cents``."""
    sets: list[tuple[str, ...]] = []
    for r in range(len(dims), -1, -1):
        sets.extend(combinations(dims, r))

    def _partial(df: pd.DataFrame) -> pa.Table:
        out = []
        df = df[dims + ([value_col] if value_col else [])].copy()
        if value_col:
            df["sum_cents"] = np.floor(
                df[value_col].to_numpy() * 100.0 + 0.5
            ).astype(np.int64)
        df["n"] = np.int64(1)
        vals = ["n"] + (["sum_cents"] if value_col else [])
        for keep in sets:
            g = df.copy()
            for d in dims:
                if d not in keep:
                    g[d] = ALL
            # dropna=False: SQL GROUP BY keeps a NULL group; pandas'
            # default would drop null-dim rows from kept sets while
            # still counting them in rolled-up 'ALL' sets
            part = g.groupby(dims, as_index=False, sort=False, dropna=False)[
                vals
            ].sum()
            out.append(part)
        return table_from_pandas(pd.concat(out, ignore_index=True))

    aggs = [Sum("n", alias_name="n")]
    if value_col:
        aggs.append(Sum("sum_cents", alias_name="sum_cents"))
    return (
        ds.map_batches(_partial, batch_format="pandas")
        .groupby(dims)
        .aggregate(*aggs)
    )
