"""Hash-partitioned exact keyed Sum — the engine's fast big-key groupby.

Ray's native ``groupby(key).aggregate(Sum(...))`` is a sort-based
aggregate over the RAW key domain; at ~10^5+ distinct integer keys the
sort-and-reduce machinery dominates the pipeline (measured on tpch_q3's
per-orderkey revenue pre-aggregate at sf0.1: the Aggregate operator
held ~6.7 s of a 10.8 s query while the equi_join exchanges around it
cost 0.2 s). The joins are fast because they shuffle on a TINY domain —
the partition id — and do the per-key work vectorized inside each
partition. ``keyed_sum`` applies the same plan to aggregation:

1. per-batch partial combine (pandas groupby over the batch — the
   exchange carries at most (distinct keys in batch) rows per batch),
2. tag each partial with ``_part = fib_hash(key) % n`` (the equi_join
   spread, so co-partitioned consumers can reuse the layout),
3. ONE ``groupby(_part).map_groups`` exchange over the n-value domain,
   merging partials with a vectorized in-partition groupby.

Exactness: int64 sums only — combine-order independent, the same
contract as every partial-combine aggregate in ``__ray_entry__``.
Scale: the exchange volume is bounded by partials (keys × blocks), the
per-partition merge holds ~|keys|/n rows; size ``num_partitions`` so a
partition's distinct keys fit a worker heap (64 default matches the
join auto-sizing policy's floor at these block counts).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

from pyrosar_ray.stages import table_from_pandas
from pyrosar_ray.stages.groups import typed_groups

_MIX = np.uint64(0x9E3779B97F4A7C15)
_PART = "_ks_part"


def keyed_agg(
    ds: Dataset,
    key_col: str,
    how: "dict[str, str]",
    num_partitions: int = 64,
    str_value_cols: "set[str] | None" = None,
) -> Dataset:
    """Exact per-key aggregation by an integer key — the general form.

    ``how`` maps value column → one of ``'sum' | 'min' | 'max'`` (all
    associative-commutative, so the partial-then-merge plan is
    combine-order independent by construction). Integer value columns
    stay int64-exact; ``min``/``max`` additionally accept string
    columns named in ``str_value_cols`` (e.g. ISO day stamps, where
    lexicographic == chronological — declared by the caller instead of
    probed from ``ds.schema()``, which would execute a pipeline
    sample). Output: ``[key_col, *how]``, one row per distinct key.
    """
    n = int(num_partitions)
    str_cols = set(str_value_cols or ())

    partial_schema = pa.schema(
        [(key_col, pa.int64())]
        + [(c, pa.string() if c in str_cols else pa.int64()) for c in how]
        + [(_PART, pa.int64())]
    )

    def _partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            # pandas groupby on an empty frame emits object columns
            # that Arrow infers as null-typed; a null-typed block mixed
            # into the groupby(_PART) exchange hits the
            # schema-unification slow path. Emit a typed empty instead.
            return partial_schema.empty_table()
        cols = {
            key_col: batch[key_col].to_numpy(zero_copy_only=False).astype(
                np.int64
            )
        }
        for c in how:
            arr = batch[c].to_numpy(zero_copy_only=False)
            cols[c] = arr if c in str_cols else arr.astype(np.int64)
        df = pd.DataFrame(cols)
        part = df.groupby(key_col, as_index=False).agg(how)
        keys = part[key_col].to_numpy().astype(np.uint64)
        with np.errstate(over="ignore"):
            part[_PART] = ((keys * _MIX) >> np.uint64(40)).astype(
                np.int64
            ) % np.int64(n)
        return table_from_pandas(part)

    schema = {
        key_col: pa.int64(),
        **{c: (pa.string() if c in str_cols else pa.int64()) for c in how},
    }

    @typed_groups(schema)
    def _merge(group: pa.Table) -> pd.DataFrame:
        df = group.to_pandas()
        return df.groupby(key_col, as_index=False).agg(how)

    return (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(_PART)
        .map_groups(_merge, batch_format="pyarrow")
    )


def keyed_sum(
    ds: Dataset,
    key_col: str,
    sum_cols: list[str],
    num_partitions: int = 64,
) -> Dataset:
    """Exact per-key int64 sums of ``sum_cols`` grouped by an integer key.

    Output columns: ``[key_col, *sum_cols]`` (all int64), one row per
    distinct key. Input columns must be integer-valued; callers convert
    floats to fixed-point units first (the engine-wide exactness rule).
    """
    return keyed_agg(
        ds, key_col, {c: "sum" for c in sum_cols}, num_partitions=num_partitions
    )
