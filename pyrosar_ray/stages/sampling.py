"""Deterministic sampling and per-group quota ops for corpus curation.

The reference has no sampling operators (SURVEY.md §2.6), but a
training-data pipeline needs reproducible subsetting: hash-based rate
sampling (the same rows are kept on every run, on any cluster shape,
with no RNG state to coordinate) and per-domain quota caps (bound any
single source's contribution to the corpus).

Both are shuffle-light by construction:

- ``hash_sample`` is a stateless per-batch filter — zero exchange;
- ``group_cap`` pre-prunes every batch to at most ``cap`` rows per key
  BEFORE the shuffle, so the exchange carries ≤ cap × keys rows per
  block no matter how large the input is, then finishes with a per-key
  top-``cap`` in ``map_groups``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

from . import table_from_pandas

#: Knuth multiplicative constant, applied to ids reduced mod 2^32 so the
#: engine's uint64 math and the SQL twin's HUGEINT math never wrap
_KNUTH = np.uint64(2654435761)
_M32 = np.uint64(1 << 32)


def hash_bucket(ids: np.ndarray, buckets: int = 100) -> np.ndarray:
    """Deterministic bucket in [0, buckets) per integer id.

    ``((id mod 2^32) * 2654435761 mod 2^32) mod buckets`` — identical in
    any engine with 64-bit integers (the product of two 32-bit values
    never overflows), shared verbatim with the DuckDB twin.
    """
    reduced = ids.astype(np.uint64) % _M32
    return ((reduced * _KNUTH) % _M32 % np.uint64(buckets)).astype(np.int64)


def hash_sample(
    ds: Dataset, rate_pct: int, id_col: str = "doc_id"
) -> Dataset:
    """Keep rows whose id hashes into the first ``rate_pct`` of 100 buckets."""
    if not 0 <= rate_pct <= 100:
        raise ValueError("rate_pct must be within [0, 100]")

    def _filter(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].combine_chunks().cast(pa.int64()))
        return batch.filter(pa.array(hash_bucket(ids) < rate_pct))

    return ds.map_batches(_filter, batch_format="pyarrow")


def stratified_split(
    ds: Dataset,
    fractions: "dict[str, int] | None" = None,
    id_col: str = "doc_id",
) -> Dataset:
    """Deterministic train/val/test assignment by id hash (row-local).

    ``fractions`` maps split name → integer percent (must sum to 100);
    labels are assigned by consecutive :func:`hash_bucket` ranges in the
    given order, so the split is reproducible across runs, engines and
    cluster sizes, and any stratum whose ids are hash-uniform (all of
    them — the Knuth multiplicative hash decorrelates id structure)
    lands within sampling error of the requested proportions. Zero
    shuffle: one vectorized searchsorted per batch.
    """
    if fractions is None:
        fractions = {"train": 90, "val": 5, "test": 5}
    if sum(fractions.values()) != 100 or min(fractions.values()) < 0:
        raise ValueError("fractions must be non-negative and sum to 100")
    labels = np.array(list(fractions), dtype=object)
    bounds = np.cumsum(list(fractions.values()))[:-1]

    def _assign(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].combine_chunks().cast(pa.int64()))
        idx = np.searchsorted(bounds, hash_bucket(ids), side="right")
        return batch.append_column("split", pa.array(labels[idx]))

    return ds.map_batches(_assign, batch_format="pyarrow")


def group_cap(
    ds: Dataset, cap: int, key_col: str = "source", order_col: str = "doc_id"
) -> Dataset:
    """Per-``key_col`` quota: keep the ``cap`` smallest ``order_col`` rows.

    The deterministic total order (``order_col`` unique) makes the kept
    set identical across cluster sizes — the same property the scene
    catalog's first-wins dedup relies on (reference archive.py:563-577).
    """
    if cap < 1:
        raise ValueError("cap must be >= 1")

    def _prune(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        kept = (
            df.sort_values(order_col, kind="mergesort")
            .groupby(key_col, sort=False)
            .head(cap)
        )
        return table_from_pandas(kept)

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(order_col, kind="mergesort").head(cap)

    pruned = ds.map_batches(_prune, batch_format="pyarrow")
    return pruned.groupby(key_col).map_groups(_final, batch_format="pandas")


def hash_sample_k(ds: Dataset, k: int, id_col: str = "doc_id") -> Dataset:
    """Fixed-size deterministic sample: the ``k`` rows with the smallest
    hash values (ties broken by id).

    The distributed min-k pattern: every batch pre-prunes to its local
    k smallest (so the final exchange sees ≤ k rows per block), then a
    sort + limit picks the global k. Same rows on any cluster shape —
    the fixed-size counterpart of :func:`hash_sample`'s rate filter.
    Output columns: ``id_col`` and ``h`` (the 32-bit-safe hash).
    """
    if k < 1:
        raise ValueError("k must be >= 1")

    def _prune(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].combine_chunks().cast(pa.int64()))
        h = ((ids.astype(np.uint64) % _M32) * _KNUTH % _M32).astype(np.int64)
        order = np.lexsort((ids, h))[:k]
        return pa.table(
            {id_col: pa.array(ids[order]), "h": pa.array(h[order])}
        )

    pruned = ds.map_batches(_prune, batch_format="pyarrow")
    return pruned.sort(["h", id_col]).limit(k)


#: salt decorrelating the mixture's extra-copy draw from hash_sample
_MIX_SALT = 7919


def source_mixture(
    ds: Dataset,
    weights: dict[str, float],
    key_col: str = "source",
    id_col: str = "doc_id",
    default: float = 1.0,
) -> Dataset:
    """Epoch-weighted training mixture: repeat each row per its source
    weight — ``floor(w)`` guaranteed copies plus one more for the
    deterministic ``frac(w)`` fraction of ids (salted hash draw, no RNG
    state). Output rows carry an ``epoch`` column (0-based copy index).

    The curriculum/datamix primitive: upweight scarce high-quality
    sources, downweight bulk crawl (w < 1 keeps a w-rate subset as
    epoch 0). Entirely row-local — zero shuffle at any scale; epoch
    ordering is the downstream reader's concern (shard shuffle).

    Weights are quantized to percent so the engine and any SQL twin
    agree exactly on the fractional draw.
    """
    for k, w in weights.items():
        if w < 0:
            raise ValueError(f"negative weight for {k!r}: {w}")
    wmap = {k: float(w) for k, w in weights.items()}

    def _expand(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].combine_chunks().cast(pa.int64()))
        w = (
            pd.Series(batch[key_col].to_pylist())
            .map(wmap)
            .fillna(default)
            .to_numpy(dtype=np.float64)
        )
        nfull = np.floor(w).astype(np.int64)
        frac_pct = np.round((w - np.floor(w)) * 100).astype(np.int64)
        extra = hash_bucket(ids + _MIX_SALT) < frac_pct
        copies = nfull + extra
        total = int(copies.sum())
        if total == 0:
            empty = batch.slice(0, 0)
            return empty.append_column("epoch", pa.array([], type=pa.int64()))
        rep = np.repeat(np.arange(len(ids), dtype=np.int64), copies)
        offs = np.concatenate([[0], np.cumsum(copies)[:-1]])
        epoch = np.arange(total, dtype=np.int64) - np.repeat(offs, copies)
        out = batch.take(pa.array(rep))
        return out.append_column("epoch", pa.array(epoch, type=pa.int64()))

    return ds.map_batches(_expand, batch_format="pyarrow")


#: epoch mixing constant for the shard shuffle (odd, fits 16 bits so the
#: pre-multiply stays under 2^48 before the mod-2^32 reduction)
_EPOCH_MIX = 40503


def epoch_shard_shuffle(
    ds: Dataset, epoch: int, num_shards: int, id_col: str = "doc_id"
) -> Dataset:
    """Deterministic per-epoch training shuffle: every row gets a shard
    and a dense position inside it, both pure functions of (id, epoch).

    ``h = ((id + epoch·40503) mod 2^32) · 2654435761 mod 2^32`` — a new
    permutation each epoch with no RNG state to coordinate; ``shard =
    h mod num_shards``; ``pos`` ranks (h, id) inside the shard. ONE
    bounded exchange (groupby shard) at any scale: the shuffle payload
    is (id, h) pairs, never the documents — the reader joins positions
    back to content shard-locally.
    """
    if num_shards < 1:
        raise ValueError("num_shards must be >= 1")

    def _hash(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].combine_chunks().cast(pa.int64()))
        mixed = (ids.astype(np.uint64) + np.uint64(epoch) * np.uint64(_EPOCH_MIX)) % _M32
        h = (mixed * _KNUTH % _M32).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(ids),
                "h": pa.array(h),
                "shard": pa.array(h % np.int64(num_shards)),
            }
        )

    def _rank(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["h", id_col], kind="mergesort", ignore_index=True)
        df["pos"] = np.arange(len(df), dtype=np.int64)
        return df[[id_col, "h", "shard", "pos"]]

    hashed = ds.map_batches(_hash, batch_format="pyarrow")
    return hashed.groupby("shard").map_groups(_rank, batch_format="pandas")


def weighted_sample_k(
    ds: Dataset,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
) -> Dataset:
    """Weighted sampling WITHOUT replacement: k rows, P ∝ weight (A-ES).

    Efraimidis–Spirakis exponential clocks with DETERMINISTIC uniforms:
    ``u = (knuth_hash(id) + 1) / 2^32`` ∈ (0, 1], ``key = -ln(u) / w``,
    keep the k smallest keys (ties → id). Fully distributed: each batch
    reduces LOCALLY to its k smallest (the same partial top-k pushdown
    as ``hash_sample_k``), so the exchange carries k × blocks rows; the
    final cut is one tiny sort. ``ln`` is computed per row with the
    same libm the SQL twin's ``ln()`` uses — keys are float64-exact,
    so the selected SET and the emitted key column hash-match.

    The reproducible replacement for `ORDER BY random() LIMIT k` with
    quality weighting — rerunning on the same corpus at any cluster
    size draws the same sample.

    libm parity detail: numpy's SIMD ``np.log`` drifts up to 1 ulp from
    libm on some inputs, so batches prune with the fast vectorized key
    to ``k + 64`` candidates and the exact scalar ``math.log`` (= the
    twin's ``ln``) is recomputed on the survivors only; a true top-k
    row can be mispruned only if 65+ batch-mates flip order against it
    within 1 ulp each — not a reachable state for distinct inputs.
    """
    import math

    if k <= 0:
        raise ValueError("k must be positive")

    def _keys(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].combine_chunks().cast(pa.int64()))
        w = batch[weight_col].to_numpy().astype(np.float64)
        reduced = ids.astype(np.uint64) % _M32
        u = ((reduced * _KNUTH) % _M32 + np.uint64(1)).astype(np.float64) / 4294967296.0
        fast = -np.log(u) / w
        if len(ids) > k + 64:  # local partial top-k prune (fast keys)
            keep = np.sort(np.lexsort((ids, fast))[: k + 64])
            ids, w, u = ids[keep], w[keep], u[keep]
            batch = batch.take(pa.array(keep))
        key = np.fromiter(
            (-math.log(x) for x in u), dtype=np.float64, count=len(u)
        ) / w
        return pa.table(
            {
                id_col: batch[id_col],
                weight_col: batch[weight_col],
                "key": pa.array(key),
            }
        )

    return (
        ds.select_columns([id_col, weight_col])
        .map_batches(_keys, batch_format="pyarrow")
        .sort(["key", id_col])
        .limit(k)
    )


def leakage_free_split(
    docs: Dataset,
    fractions: "dict[str, int] | None" = None,
    id_col: str = "doc_id",
    block_col: str = "source",
    threshold: float = 0.5,
) -> Dataset:
    """Train/val/test split with near-duplicate leakage control.

    Plain hash splits (:func:`stratified_split`) can place two near-
    duplicate documents in different splits — a val/test contamination
    vector. Here the split key is the document's near-dup CLUSTER label
    (connected components of the Jaccard pair graph,
    :func:`~pyrosar_ray.stages.dedup_text.dup_clusters`; singletons keep
    their own id), so every member of a duplicate cluster lands in the
    same split by construction.

    Plan: cluster labels (volume ∝ near-dup docs, not corpus) left-join
    back onto the id stream via the co-partitioned
    :func:`~pyrosar_ray.stages.join.equi_join`, then one row-local pass
    computes ``group_key = coalesce(cluster_id, doc_id)`` and the same
    consecutive hash-bucket ranges as the plain split. One bounded
    exchange total; the labeling itself reuses dup_clusters' cost-based
    driver/distributed switch.
    """
    from .dedup_text import dup_clusters
    from .join import equi_join

    if fractions is None:
        fractions = {"train": 90, "val": 5, "test": 5}
    if sum(fractions.values()) != 100 or min(fractions.values()) < 0:
        raise ValueError("fractions must be non-negative and sum to 100")
    labels = np.array(list(fractions), dtype=object)
    bounds = np.cumsum(list(fractions.values()))[:-1]

    clusters = dup_clusters(docs, block_col=block_col, threshold=threshold)
    ids = docs.select_columns([id_col])
    joined = equi_join(ids, clusters, on=id_col, how="left")

    def _assign(batch: pa.Table) -> pa.Table:
        doc_ids = np.asarray(batch[id_col].combine_chunks().cast(pa.int64()))
        cl = batch["cluster_id"].combine_chunks().cast(pa.int64())
        cl_np = np.asarray(cl.fill_null(0))
        group_key = np.where(np.asarray(cl.is_valid()), cl_np, doc_ids)
        idx = np.searchsorted(bounds, hash_bucket(group_key), side="right")
        return pa.table(
            {
                id_col: pa.array(doc_ids, pa.int64()),
                "group_key": pa.array(group_key, pa.int64()),
                "split": pa.array(labels[idx], pa.string()),
            }
        )

    return joined.map_batches(_assign, batch_format="pyarrow")
