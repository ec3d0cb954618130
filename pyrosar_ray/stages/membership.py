"""Bloom-filter membership prefilter: drop rows possibly in a reference
id set, keep the guaranteed-new ones.

The classic scale-out anti-join accelerator: the reference side folds
to a FIXED-SIZE bit set (m bits, independent of reference cardinality)
that broadcasts once; the candidate stream filters locally with zero
shuffle. False positives (a new row dropped) are inherent to the
structure — and fully DETERMINISTIC here: positions come from
Kirsch-Mitzenmacher double hashing over the engine's 32-bit-safe
multiplicative family, pure integer arithmetic a SQL twin reproduces
exactly, false-positive drops included.

    r    = id mod 2^32
    h1   = ((r xor (r >> 16)) · 2654435761) mod 2^32
    h2   = odd(((r xor (r >> 13)) · 2246822519) mod 2^32)
    pos_i(id) = ((h1 + i·h2) mod 2^32) · m  >>  32,   i = 0..k-1

    (xorshift premix + fast-range high-bit reduction: a bare
    multiplicative hash reduced mod a power-of-two m keeps only its
    weak LOW bits and concentrates sequential ids — observed 70x the
    theoretical false-positive rate before the premix)

Build: per-batch distinct positions -> a ≤m-row groupby -> driver bit
array -> one ``ray.put``. Exchange volume is bounded by m at any input
scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset

_K1 = np.uint64(2654435761)  # Knuth multiplicative
_K2 = np.uint64(2246822519)  # xxhash PRIME32_2
_M32 = np.uint64(1 << 32)


def bloom_positions(ids: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(n, k) int64 bit positions per id (double hashing, h2 forced odd)."""
    r = ids.astype(np.uint64) % _M32
    h1 = ((r ^ (r >> np.uint64(16))) * _K1) % _M32
    h2 = ((r ^ (r >> np.uint64(13))) * _K2) % _M32
    h2 = (h2 // np.uint64(2)) * np.uint64(2) + np.uint64(1)
    i = np.arange(k, dtype=np.uint64)[None, :]
    mixed = (h1[:, None] + i * h2[:, None]) % _M32
    return ((mixed * np.uint64(m_bits)) >> np.uint64(32)).astype(np.int64)


def build_bloom(
    ref: Dataset, id_col: str, m_bits: int = 1 << 16, k: int = 4
):
    """Distributed build -> driver bit array + its broadcast ref.

    Returns ``(object_ref, set_bit_count)``. The exchange is the
    distinct-position table (≤ m rows however large the reference is).
    """
    if m_bits < 2 or k < 1:
        raise ValueError("need m_bits >= 2 and k >= 1")

    def _pos(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].combine_chunks().cast(pa.int64()))
        p = np.unique(bloom_positions(ids, m_bits, k))
        return pa.table(
            {"p": pa.array(p), "one": np.ones(len(p), dtype=np.int64)}
        )

    # keyed_sum, not groupby().count(): at m ~ 2^23+ the sort-based
    # aggregate over millions of position rows held ~16 s of a 20 s
    # eq-delete cascade; the partition-domain exchange does the same
    # dedup in well under a second (same exchange-volume bound: <= m
    # partial rows however large the reference side is)
    from .agg import keyed_sum
    from .spatial import materialize_small_side

    distinct = keyed_sum(
        ref.map_batches(_pos, batch_format="pyarrow"), "p", ["one"]
    )
    tab = materialize_small_side(distinct, ["p"])
    bits = np.zeros(m_bits, dtype=bool)
    if len(tab):
        bits[tab["p"].to_numpy()] = True
    return ray.put({"bits": bits, "m_bits": m_bits, "k": k}), int(bits.sum())


class BloomFilterNew:
    """Actor stage: keep rows whose id is GUARANTEED absent from the
    reference set (at least one of its k bits unset) — or, with
    ``keep='maybe'``, the complement (rows that MIGHT be members; the
    inner-join runtime-filter side, where dropping a provable
    non-member is exact and a false positive just rides along)."""

    def __init__(self, bloom_ref, id_col: str, keep: str = "absent"):
        if keep not in ("absent", "maybe"):
            raise ValueError("keep must be 'absent' or 'maybe'")
        b = ray.get(bloom_ref)
        self.bits = b["bits"]
        self.m_bits = b["m_bits"]
        self.k = b["k"]
        self.id_col = id_col
        self.keep_maybe = keep == "maybe"

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[self.id_col].combine_chunks().cast(pa.int64()))
        pos = bloom_positions(ids, self.m_bits, self.k)
        maybe_member = self.bits[pos].all(axis=1)
        keep = maybe_member if self.keep_maybe else ~maybe_member
        return batch.filter(pa.array(keep))


def bloom_new_rows(
    candidates: Dataset,
    ref: Dataset,
    id_col: str,
    m_bits: int = 1 << 16,
    k: int = 4,
    concurrency=(1, 8),
) -> Dataset:
    """Rows of ``candidates`` provably NOT in ``ref`` (by id)."""
    bloom_ref, _ = build_bloom(ref, id_col, m_bits, k)
    return candidates.map_batches(
        BloomFilterNew,
        batch_format="pyarrow",
        concurrency=concurrency,
        fn_constructor_args=(bloom_ref, id_col),
    )


def bloom_anti_join(
    candidates: Dataset,
    ref: Dataset,
    id_col: str,
    m_bits: int = 1 << 20,
    k: int = 4,
    concurrency=(1, 8),
) -> Dataset:
    """EXACT anti-join accelerated by the bloom prefilter — the
    production shape (sketch prune + exact verify).

    The broadcast bit set splits candidates into definitely-new rows
    (≥1 unset bit — pass through untouched, typically the vast
    majority) and maybe-members, and ONLY the maybe slice pays the
    exact co-partition anti-join exchange. Output is exactly the
    anti-join — false positives just ride the slow path; none are
    dropped.
    """
    from .join import equi_join

    bloom_ref, _ = build_bloom(ref, id_col, m_bits, k)

    class _Maybe:
        def __init__(self):
            b = ray.get(bloom_ref)
            self.bits, self.m_bits, self.k = b["bits"], b["m_bits"], b["k"]

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch[id_col].combine_chunks().cast(pa.int64()))
            pos = bloom_positions(ids, self.m_bits, self.k)
            return batch.filter(pa.array(self.bits[pos].all(axis=1)))

    sure_new = candidates.map_batches(
        BloomFilterNew,
        batch_format="pyarrow",
        concurrency=concurrency,
        fn_constructor_args=(bloom_ref, id_col),
    )
    maybe = candidates.map_batches(
        _Maybe, batch_format="pyarrow", concurrency=concurrency
    )
    from pyrosar_ray.stages import physical_select

    # physical projection: ref may be an arbitrary lazy pipeline and this
    # feeds equi_join's schema()-derived column plan (see physical_select)
    ref_keys = physical_select(ref, [id_col])
    verified_new = equi_join(maybe, ref_keys, on=id_col, how="anti")
    cand_cols = [c for c in (candidates.schema().names or [])]
    return sure_new.select_columns(cand_cols).union(
        verified_new.select_columns(cand_cols)
    )


def bloom_inner_join(
    left: Dataset,
    right: Dataset,
    on: str,
    right_on: "str | None" = None,
    m_bits: int = 1 << 20,
    k: int = 4,
    num_partitions: "int | None" = None,
    concurrency=(1, 8),
) -> Dataset:
    """EXACT inner join with a runtime bloom filter on the probe side —
    the Spark-runtime-filter / sideways-information-passing shape.

    The build side's keys fold to a fixed-size bit set (broadcast
    once); probe rows whose key is PROVABLY absent (≥1 unset bit) drop
    before the co-partition exchange, so the shuffle carries only rows
    that might match. Bloom filters have no false negatives, hence no
    matching row is ever dropped; false positives ride into the exact
    join and miss there. Wins whenever the join is selective (dim-table
    joins, id-subset enrichment): the exchange shrinks from |probe| to
    ~|matching| + ε·|probe|.
    """
    from .join import equi_join

    right_key = right_on or on
    bloom_ref, _ = build_bloom(
        right.select_columns([right_key]), right_key, m_bits, k
    )
    filtered = left.map_batches(
        BloomFilterNew,
        batch_format="pyarrow",
        concurrency=concurrency,
        fn_constructor_args=(bloom_ref, on),
        fn_constructor_kwargs={"keep": "maybe"},
    )
    return equi_join(
        filtered, right, on=on, right_on=right_on,
        num_partitions=num_partitions, how="inner",
    )
