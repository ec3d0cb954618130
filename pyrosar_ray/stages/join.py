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
import ray
from ray.data import Dataset

_SIDE = "__join_side"
_PART = "__join_part"


def detect_heavy_keys(
    ds: Dataset, on: str, threshold: int, candidate_min: int | None = None
) -> np.ndarray:
    """Keys whose row count exceeds ``threshold`` (sorted int64 array).

    Detection is a bounded two-stage sieve: each batch emits only keys
    it sees at least ``candidate_min`` times (default ``threshold//64
    + 1``), and a small groupby-Sum confirms the global count. A key
    heavy overall but diluted below ``candidate_min`` in every batch
    escapes detection — which degrades BALANCE, never correctness
    (undetected keys just stay on the plain co-partition path), so the
    sieve may be biased cheap. The confirmed exchange carries only
    candidate keys, not the key domain.
    """
    from ray.data.aggregate import Sum

    cmin = max(1, (threshold // 64) + 1 if candidate_min is None else candidate_min)

    def _cand(batch: pa.Table) -> pa.Table:
        keys = np.asarray(batch[on].combine_chunks().cast(pa.int64()))
        uk, counts = np.unique(keys, return_counts=True)
        keep = counts >= cmin
        return pa.table(
            {"k": pa.array(uk[keep]), "n": pa.array(counts[keep].astype(np.int64))}
        )

    rows = (
        ds.select_columns([on])
        .map_batches(_cand, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    return np.sort(
        np.array(
            [int(r["k"]) for r in rows if int(r["n"]) > threshold],
            dtype=np.int64,
        )
    )


def equi_join(
    left: Dataset,
    right: Dataset,
    on: str,
    right_on: str | None = None,
    num_partitions: int | None = None,
    how: str = "inner",
    skew_threshold: int | None = None,
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

    ``skew_threshold=N`` turns on the hybrid salted plan for hot keys:
    left keys with more than N rows (bounded heuristic detection —
    see :func:`detect_heavy_keys`) are salted round-robin across every
    partition while the matching RIGHT rows replicate to all
    partitions, so one dominant key costs each partition 1/nparts of
    its probe rows plus one copy of its (assumed bounded) build rows —
    instead of one partition holding the key's entire probe side.
    Output rows are identical with or without salting; inner/left/anti
    only (an outer join's unmatched replicated build row would emit
    once per partition).
    """
    if how not in ("inner", "anti", "left", "outer", "semi"):
        raise ValueError(
            "how must be 'inner', 'anti', 'left', 'outer' or 'semi'"
        )
    if skew_threshold is not None and how == "outer":
        # a replicated right row would emit its unmatched copy once per
        # salt partition; outer keeps the plain co-partition plan
        raise ValueError("skew salting supports inner/left/anti only")
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
    hot = (
        detect_heavy_keys(left, on, skew_threshold)
        if skew_threshold is not None
        else np.empty(0, dtype=np.int64)
    )

    def _part_np(keys: np.ndarray) -> np.ndarray:
        with np.errstate(over="ignore"):
            return (
                (keys.astype(np.uint64) * mix) >> np.uint64(40)
            ).astype(np.int64) % np.int64(n_parts)

    def _hot_mask(keys: np.ndarray) -> np.ndarray:
        if not len(hot):
            return np.zeros(len(keys), dtype=bool)
        pos = np.searchsorted(hot, keys)
        pos_c = np.minimum(pos, len(hot) - 1)
        return hot[pos_c] == keys

    def _tag_left(batch: pa.Table) -> pa.Table:
        cols = {c: batch[c] for c in l_cols}
        for c in r_value_cols:
            cols[c] = pa.nulls(len(batch), type=r_types[c])
        cols[_SIDE] = pa.array([0] * len(batch), type=pa.int8())
        keys = np.asarray(batch[on].combine_chunks().cast(pa.int64()))
        parts = _part_np(keys)
        hm = _hot_mask(keys)
        if hm.any():
            # salt: spread a heavy key's probe rows round-robin across
            # every partition (assignment never changes output rows,
            # only placement, so any deterministic spread is valid)
            parts[hm] = (keys[hm] + np.arange(int(hm.sum()))) % n_parts
        cols[_PART] = pa.array(parts)
        return pa.table(cols)

    def _tag_right(batch: pa.Table) -> pa.Table:
        cols = {on: batch[right_key].cast(l_types[on])}
        for c in l_cols:
            if c != on:
                cols[c] = pa.nulls(len(batch), type=l_types[c])
        for c in r_value_cols:
            cols[c] = batch[c]
        cols[_SIDE] = pa.array([1] * len(batch), type=pa.int8())
        tab = pa.table({c: cols[c] for c in all_cols + [_SIDE]})
        keys = np.asarray(tab[on].combine_chunks().cast(pa.int64()))
        parts = _part_np(keys)
        hm = _hot_mask(keys)
        if not hm.any():
            return tab.append_column(_PART, pa.array(parts))
        # a heavy key's build rows replicate to EVERY salt partition so
        # each salted probe row still sees the key's full build side
        cold_idx = np.flatnonzero(~hm)
        hot_idx = np.flatnonzero(hm)
        take = np.concatenate([cold_idx, np.repeat(hot_idx, n_parts)])
        parts_out = np.concatenate(
            [
                parts[cold_idx],
                np.tile(np.arange(n_parts, dtype=np.int64), len(hot_idx)),
            ]
        )
        return tab.take(pa.array(take)).append_column(
            _PART, pa.array(parts_out)
        )

    tagged = left.map_batches(_tag_left, batch_format="pyarrow").union(
        right.map_batches(_tag_right, batch_format="pyarrow")
    )

    join_type = {
        "inner": "inner",
        "left": "left outer",
        "outer": "full outer",
        "anti": "left anti",
        "semi": "left semi",
    }[how]

    out_cols = l_cols if how in ("anti", "semi") else all_cols
    out_types = {**l_types, **r_types}

    def _empty() -> pa.Table:
        # sort-boundary groups arrive EMPTY with null-typed columns;
        # Acero rejects null-typed non-key fields even on empty input,
        # so short-circuit with a typed empty (typed_groups convention)
        return pa.table(
            {c: pa.array([], type=out_types[c]) for c in out_cols}
        )

    def _local(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return _empty()
        side = group[_SIDE]
        lhs = group.filter(pc.equal(side, 0)).select(l_cols)
        rhs = group.filter(pc.equal(side, 1)).select([on] + r_value_cols)
        if how in ("anti", "semi"):
            if len(lhs) == 0:
                return _empty()
            if len(rhs) == 0:
                return lhs if how == "anti" else _empty()
            return lhs.join(rhs.select([on]), keys=on, join_type=join_type)
        if len(lhs) == 0 and how in ("inner", "left"):
            return _empty()
        out = lhs.join(rhs, keys=on, join_type=join_type)
        return out.select(all_cols)

    return tagged.groupby(_PART).map_groups(_local, batch_format="pyarrow")


def equi_join_sample(
    left: Dataset,
    right: Dataset,
    on: str,
    n_samples: int,
    left_id: str,
    right_id: str,
    right_on: str | None = None,
) -> "pa.Table":
    """Uniform sample of ``n_samples`` tuples from the equi-join
    ``left ⋈ right`` WITHOUT materializing the join (the streaming
    sampling-over-joins pattern, e.g. EDBT'23 "Streaming Weighted
    Sampling over Join Queries").

    A join tuple under key k is a pair (a ∈ A_k, b ∈ B_k); the join has
    W = Σ_k |A_k|·|B_k| tuples. Instead of producing W rows and
    sampling, the plan is:

    1. ONE bounded count exchange per side (key-cardinality-sized).
    2. Driver: prefix sums over w_k = |A_k|·|B_k| (exact Python ints);
       ``n_samples`` deterministic draws u_s = ((s+1)·2654435761 mod
       2³²) mod W (the engine's shared Knuth mix — hash-uniform with
       mod bias ≤ W/2³²; W < 2³² is the documented domain, chain a
       second mix past it) locate (key, i_a = off mod |A_k|,
       i_b = off div |A_k|) by binary search.
    3. Each side streams ONCE: broadcast target-key filter, per-key
       rank by the id column (mergesort on the sampled keys only),
       emit the ranked rows — the exchange is bounded by the rows of
       SAMPLED keys, never W.

    Deterministic end-to-end → the DuckDB twin reproduces the exact
    sample; output (sample_id, key, left_id, right_id), n_samples rows.
    """
    import pandas as pd

    from ray.data.aggregate import Count

    from . import table_from_pandas

    right_on = right_on or on
    ca_rows = left.groupby(on).aggregate(Count()).take_all()
    cb_rows = right.groupby(right_on).aggregate(Count()).take_all()
    ca = {int(r[on]): int(r["count()"]) for r in ca_rows}
    cb = {int(r[right_on]): int(r["count()"]) for r in cb_rows}
    keys = sorted(k for k in ca if k in cb)
    if not keys:
        raise ValueError("empty join: no shared keys")
    w = [ca[k] * cb[k] for k in keys]
    prefix = np.cumsum([0] + w)
    total = int(prefix[-1])
    if total >= 1 << 32:
        raise NotImplementedError(
            f"join size {total} exceeds the 2^32 draw domain; chain a "
            "second mix stage for larger joins"
        )

    targets_a: dict[int, list[tuple[int, int]]] = {}
    targets_b: dict[int, list[tuple[int, int]]] = {}
    picks = []
    for s in range(n_samples):
        u = int(((s + 1) * 2654435761) % (1 << 32)) % total
        ki = int(np.searchsorted(prefix, u, side="right")) - 1
        k = keys[ki]
        off = u - int(prefix[ki])
        ia = off % ca[k]
        ib = off // ca[k]
        targets_a.setdefault(k, []).append((s, ia))
        targets_b.setdefault(k, []).append((s, ib))
        picks.append((s, k))

    def _ranked(ds: Dataset, key_col: str, id_col: str, targets: dict) -> pd.DataFrame:
        import ray

        tref = ray.put(targets)

        def _filter(batch: pa.Table) -> pa.Table:
            tgt = ray.get(tref)
            keys_np = batch[key_col].to_numpy()
            mask = np.isin(keys_np, np.fromiter(tgt.keys(), dtype=np.int64))
            return batch.filter(pa.array(mask))

        def _pick(group: pd.DataFrame) -> pd.DataFrame:
            tgt = ray.get(tref)
            k = int(group[key_col].iloc[0])
            ordered = group[id_col].sort_values(kind="mergesort").to_numpy()
            rows = [
                {"s": s, "key": k, id_col: int(ordered[rank])}
                for s, rank in tgt.get(k, [])
            ]
            return pd.DataFrame(rows, columns=["s", "key", id_col])

        out = (
            ds.select_columns([key_col, id_col])
            .map_batches(_filter, batch_format="pyarrow")
            .groupby(key_col)
            .map_groups(_pick, batch_format="pandas")
            .to_pandas()  # n_samples rows — bounded epilogue
        )
        return out

    a = _ranked(left, on, left_id, targets_a)
    b = _ranked(right, right_on, right_id, targets_b)
    merged = a.merge(b[["s", right_id]], on="s").sort_values("s", ignore_index=True)
    merged = merged.rename(columns={"s": "sample_id"})
    return table_from_pandas(
        merged[["sample_id", "key", left_id, right_id]].astype(np.int64)
    )


def broadcast_equi_join(
    left: Dataset,
    right: Dataset,
    on: str,
    right_on: "str | None" = None,
    how: str = "inner",
    concurrency=(1, 8),
) -> Dataset:
    """Map-side equi-join against a SMALL right side — ZERO shuffle.

    The other half of the engine's join policy (the spatial join has
    had both plans since round 1): when the build side fits a broadcast
    (dimension tables, per-key aggregates), ship it ONCE via ``ray.put``
    and run one Arrow hash join per probe batch inside map_batches —
    the probe side streams, nothing is exchanged. Same column contract
    and inner/left/anti semantics as :func:`equi_join`; output rows are
    identical (callers can gate-check one against the other).
    """
    if how not in ("inner", "anti", "left", "semi"):
        raise ValueError("broadcast join supports inner/left/anti/semi")
    from .spatial import materialize_small_side

    right_key = right_on or on
    r_schema = right.schema()
    r_cols = [right_key] + [c for c in r_schema.names if c != right_key]
    small = materialize_small_side(right, r_cols)
    if right_key != on:
        small = small.rename_columns([on] + r_cols[1:])
    if how == "semi":
        # semi keeps each probe row AT MOST once however many build
        # rows share its key — ship only the distinct key set
        small = small.select([on]).group_by(on).aggregate([])
    small_ref = ray.put(small.combine_chunks())
    join_type = {
        "inner": "inner",
        "left": "left outer",
        "anti": "left anti",
        "semi": "left semi",
    }[how]
    l_names = [c for c in left.schema().names]
    out_cols = l_names + (
        [] if how in ("anti", "semi") else [c for c in r_cols[1:]]
    )

    class _Probe:
        def __init__(self):
            self.small = ray.get(small_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            out = batch.join(self.small, keys=on, join_type=join_type)
            return out.select(out_cols)

    return left.map_batches(
        _Probe, batch_format="pyarrow", concurrency=concurrency
    )
