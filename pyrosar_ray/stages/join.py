"""Generic co-partition equi-join over one key column.

The engine's join discipline generalized from the spatial join
(stages/spatial.py): Ray's built-in hash-join operator spikes build-side
memory (observed OOM worker deaths in this environment), so the engine
joins through ONE groupby exchange — both sides are schema-aligned with
typed nulls, tagged, unioned, co-grouped on the key, and each group
emits its local join via Arrow's Acero hash join (``pa.Table.join``),
which keeps every column's exact dtype (misses are typed nulls, not a
pandas float64 upcast). The exchange spills gracefully and a group's
memory is bounded by that key's rows on both sides; a genuinely hot key
is the caller's salting problem, as in the spatial join.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

_SIDE = "__join_side"
_PART = "__join_part"


def equi_join(
    left: Dataset,
    right: Dataset,
    on: str,
    right_on: str | None = None,
    num_partitions: int | None = None,
    how: str = "inner",
) -> Dataset:
    """Equi-join on one key column; output = key + both sides' columns.

    Column names must not collide apart from the key (callers project
    first — the engine convention everywhere else). Both sides
    co-partition on a Fibonacci hash of the key into ``num_partitions``
    buckets and each partition runs ONE Arrow hash join — per-partition
    memory ≈ (|left| + |right|) / num_partitions, and the number of
    join calls is the partition count, not the key count. The key
    column must be integer-valued (the engine's id convention).
    ``num_partitions=None`` (default) auto-sizes from the inputs' read
    metadata so a partition stays ~64 MB at any scale (same policy as
    the spatial join); pass an int to pin it.
    ``how='anti'`` keeps left rows with NO right match (the engine's
    filter_scenelist shape, shuffle-sided for a large right side);
    ``how='left'`` keeps all left rows with typed-null right columns on
    misses; ``how='outer'`` keeps both sides' unmatched rows the same
    way. Dtypes survive exactly — a miss is an Arrow null, which only
    becomes NaN/float64 if the caller converts to pandas.
    """
    if how not in ("inner", "anti", "left", "outer"):
        raise ValueError("how must be 'inner', 'anti', 'left' or 'outer'")
    if num_partitions is None:
        from pyrosar_ray.stages.spatial import auto_num_partitions

        num_partitions = auto_num_partitions(left, right)
    right_key = right_on or on
    l_schema = left.schema()
    r_schema = right.schema()
    l_cols = [c for c in l_schema.names]
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

    mix = np.uint64(0x9E3779B97F4A7C15)  # Fibonacci-hash partition spread
    n_parts = int(num_partitions)

    def _part_ids(key_col: pa.ChunkedArray) -> pa.Array:
        keys = np.asarray(key_col.combine_chunks().cast(pa.int64())).astype(
            np.uint64
        )
        with np.errstate(over="ignore"):
            return pa.array(
                ((keys * mix) >> np.uint64(40)).astype(np.int64)
                % np.int64(n_parts)
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

    join_type = {
        "inner": "inner",
        "left": "left outer",
        "outer": "full outer",
        "anti": "left anti",
    }[how]

    def _local(group: pa.Table) -> pa.Table:
        side = group[_SIDE]
        lhs = group.filter(pc.equal(side, 0)).select(l_cols)
        rhs = group.filter(pc.equal(side, 1)).select([on] + r_value_cols)
        if how == "anti":
            return lhs.join(rhs.select([on]), keys=on, join_type=join_type)
        out = lhs.join(rhs, keys=on, join_type=join_type)
        return out.select(all_cols)

    return tagged.groupby(_PART).map_groups(_local, batch_format="pyarrow")
