"""Generic co-partition equi-join over one key column.

The engine's join discipline generalized from the spatial join
(stages/spatial.py): Ray's built-in hash-join operator spikes build-side
memory (observed OOM worker deaths in this environment), so the engine
joins through ONE groupby exchange — both sides are schema-aligned with
typed nulls, tagged, unioned, co-grouped on the key, and each group
emits its local inner product. The exchange spills gracefully and a
group's memory is bounded by that key's rows on both sides; a genuinely
hot key is the caller's salting problem, as in the spatial join.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
from ray.data import Dataset

_SIDE = "__join_side"
_PART = "__join_part"


def equi_join(
    left: Dataset,
    right: Dataset,
    on: str,
    right_on: str | None = None,
    num_partitions: int = 64,
    how: str = "inner",
) -> Dataset:
    """Inner join on one key column; output = key + both sides' columns.

    Column names must not collide apart from the key (callers project
    first — the engine convention everywhere else). Both sides
    co-partition on a Fibonacci hash of the key into ``num_partitions``
    buckets and each partition runs ONE vectorized pandas merge — per-
    partition memory ≈ (|left| + |right|) / num_partitions, and the
    number of merge calls is the partition count, not the key count.
    The key column must be integer-valued (the engine's id convention).
    ``how='anti'`` keeps left rows with NO right match (the engine's
    filter_scenelist shape, shuffle-sided for a large right side);
    ``how='left'`` keeps all left rows with NaN-filled right columns on
    misses (numeric right columns become float64, pandas' null form);
    ``how='outer'`` keeps both sides' unmatched rows the same way.
    """
    if how not in ("inner", "anti", "left", "outer"):
        raise ValueError("how must be 'inner', 'anti', 'left' or 'outer'")
    right_key = right_on or on
    l_schema = left.schema()
    r_schema = right.schema()
    l_cols = [c for c in l_schema.names]
    r_cols = [right_key if c == right_key else c for c in r_schema.names]
    r_value_cols = [c for c in r_schema.names if c != right_key]
    clash = set(l_cols) & set(r_value_cols)
    if clash:
        raise ValueError(f"column collision outside the key: {sorted(clash)}")
    def _pa_type(t):
        # Ray reports pandas object-dtype columns as the python class
        # ``object`` instead of a pyarrow DataType — treat those as strings
        return t if isinstance(t, pa.DataType) else pa.string()

    l_types = {n: _pa_type(t) for n, t in zip(l_schema.names, l_schema.types)}
    r_types = {n: _pa_type(t) for n, t in zip(r_schema.names, r_schema.types)}
    all_cols = l_cols + r_value_cols

    import numpy as np

    mix = np.uint64(0x9E3779B97F4A7C15)  # Fibonacci-hash partition spread

    def _part_ids(key_col: pa.ChunkedArray) -> pa.Array:
        keys = np.asarray(key_col.combine_chunks().cast(pa.int64())).astype(
            np.uint64
        )
        with np.errstate(over="ignore"):
            return pa.array(
                ((keys * mix) >> np.uint64(40)).astype(np.int64)
                % np.int64(num_partitions)
            )

    def _tag_left(batch: pa.Table) -> pa.Table:
        cols = {c: batch[c] for c in l_cols}
        for c in r_value_cols:
            cols[c] = pa.nulls(len(batch), type=r_types[c])
        cols[_SIDE] = pa.array([0] * len(batch), type=pa.int8())
        cols[_PART] = _part_ids(batch[on])
        return pa.table(cols)

    def _tag_right(batch: pa.Table) -> pa.Table:
        cols = {on: batch[right_key].cast(l_types[on])}
        for c in l_cols:
            if c != on:
                cols[c] = pa.nulls(len(batch), type=l_types[c])
        for c in r_value_cols:
            cols[c] = batch[c]
        cols[_SIDE] = pa.array([1] * len(batch), type=pa.int8())
        cols[_PART] = _part_ids(cols[on])
        return pa.table({c: cols[c] for c in all_cols + [_SIDE, _PART]})

    tagged = left.map_batches(_tag_left, batch_format="pyarrow").union(
        right.map_batches(_tag_right, batch_format="pyarrow")
    )

    # pandas upcasts int columns to float inside mixed partitions (the
    # other side's typed nulls become NaN) — restore the schema dtypes
    # on the merged output, where no nulls remain
    out_dtypes = {
        c: (l_types.get(c) or r_types[c]).to_pandas_dtype() for c in all_cols
    }

    def _local(group: pd.DataFrame) -> pd.DataFrame:
        lhs = group[group[_SIDE] == 0][l_cols]
        rhs = group[group[_SIDE] == 1][[on] + r_value_cols]
        if how == "anti":
            kept = lhs[~lhs[on].isin(rhs[on])]
            return kept.astype({c: out_dtypes[c] for c in l_cols})
        if how == "left":
            # unmatched rows carry NaN in right columns → right numeric
            # columns stay float64 (the same null representation the
            # SQL twin's LEFT JOIN produces through a pandas fetch)
            out = lhs.merge(rhs, on=on, how="left")
            return out.astype({c: out_dtypes[c] for c in l_cols})
        if how == "outer":
            # misses on either side carry NaN; the key (present in every
            # row) keeps its exact dtype, and non-key numerics cast to
            # float64 UNCONDITIONALLY so partitions without misses emit
            # the same block schema as partitions with them
            out = lhs.merge(rhs, on=on, how="outer")
            casts = {on: out_dtypes[on]}
            for c in all_cols:
                if c != on and np.issubdtype(np.dtype(out_dtypes[c]), np.number):
                    casts[c] = np.float64
            return out.astype(casts)
        return lhs.merge(rhs, on=on).astype(out_dtypes)

    return tagged.groupby(_PART).map_groups(_local, batch_format="pandas")
