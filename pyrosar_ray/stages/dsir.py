"""DSIR-style importance-weighted data selection.

The data-selection primitive from Xie et al. 2023 ("Data Selection for
Language Models via Importance Resampling"): score every raw-corpus
document by how target-like its hashed n-gram feature distribution is,
then keep the top-scoring slice. Features are word unigrams + bigrams
hashed into ``n_buckets`` buckets with the engine-standard token hash
(FNV-1a over the first 16 zero-padded bytes, folded to 32 bits — the
same kernel the HLL/CMS/minhash twins pin in SQL).

The importance model deviates from the paper in ONE documented way: the
per-bucket log-likelihood-ratio ``log p_t[b] - log p_r[b]`` is replaced
by the CENTERED smoothed probability ratio in fixed point,
``w[b] = (p_t[b] / p_r[b] - 1) << 20`` with add-one smoothing
(``p_t[b] = (t[b]+1)/(T+B)``, ``p_r[b] = (r[b]+1)/(R+B)``), evaluated in
exact integer arithmetic. Like the log-ratio it is positive exactly when
the bucket is target-heavy and negative when raw-heavy (first-order
equivalent near ratio 1), so document length does not systematically
inflate scores the way an uncentered ratio would. No float log appears
on either side, so the DuckDB twin reproduces every score bit-for-bit.

Scale shape (100 TB-safe):

- Bucket counting is a per-batch partial bincount merged by ONE
  ``groupby(bucket).aggregate(Sum, Sum)`` — the exchange carries at
  most ``n_buckets`` rows per block, never corpus rows.
- The weight table is ≤ ``n_buckets`` int64s, materialized on the
  driver (bounded by construction) and broadcast once via ``ray.put``.
- Scoring is row-local; the final top-k folds per-batch partial top-k
  blocks through a k×blocks-row sort — never a full-corpus sort.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
from ray.data import Dataset
from ray.data.aggregate import Sum

from .sketch import _token_hash32

#: fixed-point scale of the importance ratio (2^20)
DSIR_SCALE = 1 << 20


def explode_grams(texts: pd.Series) -> tuple[pd.Series, pd.Series]:
    """(unigrams, bigrams) Series for a text column, both indexed by the
    source row position. Tokenization is the engine-wide whitespace
    split; bigrams are the SPACE-joined consecutive token pairs (a NUL
    separator would be silently dropped by pandas' numpy-backed string
    concat — C-string semantics — and spaces cannot occur inside
    whitespace-split tokens, so the join is unambiguous). Shared by the
    DSIR and CCNet stages so their tokenization can never diverge."""
    lists = texts.astype("string").str.split(" ")
    uni = lists.explode()
    nxt = uni.groupby(level=0).shift(-1)
    big = (uni + " " + nxt).dropna()
    return uni, big


def _gram_buckets(
    texts: pd.Series, n_buckets: int
) -> tuple[np.ndarray, np.ndarray]:
    """(doc_position, bucket) pairs for every unigram + bigram occurrence
    (grams truncated, like everywhere in the engine, to 16 bytes inside
    the hash kernel)."""
    uni, big = explode_grams(texts)
    grams = pd.concat([uni, big])
    pos = grams.index.to_numpy(dtype=np.int64)
    h = _token_hash32(grams.reset_index(drop=True))
    return pos, (h % np.uint64(n_buckets)).astype(np.int64)


def dsir_bucket_counts(
    docs: Dataset,
    target_sources: tuple[str, ...],
    n_buckets: int = 8192,
    text_col: str = "text",
    source_col: str = "source",
) -> Dataset:
    """Per-bucket gram counts: ``(bucket, t_cnt, r_cnt)`` — target-set
    occurrences and whole-corpus occurrences, merged by one
    bucket-table-sized groupby Sum."""
    target = set(target_sources)

    def _partial(batch: pa.Table) -> pa.Table:
        df = batch.select([text_col, source_col]).to_pandas()
        pos, buckets = _gram_buckets(df[text_col], n_buckets)
        is_target = df[source_col].isin(target).to_numpy()[pos]
        r = np.bincount(buckets, minlength=n_buckets)
        t = np.bincount(buckets[is_target], minlength=n_buckets)
        occupied = np.flatnonzero(r)
        return pa.table(
            {
                "bucket": pa.array(occupied),
                "t_cnt": pa.array(t[occupied].astype(np.int64)),
                "r_cnt": pa.array(r[occupied].astype(np.int64)),
            }
        )

    return (
        docs.map_batches(_partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("t_cnt", alias_name="t_cnt"), Sum("r_cnt", alias_name="r_cnt"))
    )


def dsir_weights(counts: Dataset, n_buckets: int = 8192) -> np.ndarray:
    """Dense fixed-point importance-weight table from the bucket counts:
    ``w[b] = ((t[b]+1)·(R+B)·SCALE) // ((r[b]+1)·(T+B)) − SCALE``.

    Driver materialization is bounded at ``n_buckets`` rows by
    construction (the groupby key is the bucket id). The products are
    taken in arbitrary-precision Python ints (the 3-term numerator
    overflows int64 at full corpus scale); the divided-down weights fit
    int64 comfortably."""
    df = counts.to_pandas()
    t = np.zeros(n_buckets, dtype=np.int64)
    r = np.zeros(n_buckets, dtype=np.int64)
    b = df["bucket"].to_numpy()
    t[b] = df["t_cnt"].to_numpy()
    r[b] = df["r_cnt"].to_numpy()
    t_tot = int(t.sum()) + n_buckets
    r_tot = int(r.sum()) + n_buckets
    w = [
        (int(ti) + 1) * r_tot * DSIR_SCALE // ((int(ri) + 1) * t_tot)
        - DSIR_SCALE
        for ti, ri in zip(t, r)
    ]
    return np.array(w, dtype=np.int64)


def dsir_select(
    docs: Dataset,
    weights_ref,
    n_buckets: int = 8192,
    k: int = 200,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> Dataset:
    """Importance scores + top-k selection over a broadcast weight table.

    ``weights_ref``: ``ray.ObjectRef`` of the dense int64 weight array
    (``ray.put`` once; read zero-copy in every task). Output rows:
    ``(doc_id, score)``, the ``k`` highest scores, ties broken by the
    smaller doc id.
    """

    def _score(batch: pa.Table) -> pa.Table:
        w = ray.get(weights_ref)
        df = batch.select([id_col, text_col]).to_pandas()
        pos, buckets = _gram_buckets(df[text_col], n_buckets)
        # integer scatter-add — np.bincount(weights=...) sums in float64
        # and would drop low bits past 2^53, breaking the bit-for-bit
        # twin guarantee at corpus scale
        score = np.zeros(len(df), dtype=np.int64)
        np.add.at(score, pos, w[buckets])
        part = pd.DataFrame(
            {id_col: df[id_col].to_numpy(), "score": score}
        ).sort_values(["score", id_col], ascending=[False, True]).head(k)
        return pa.table(
            {
                id_col: pa.array(part[id_col].to_numpy()),
                "score": pa.array(part["score"].to_numpy()),
            }
        )

    partials = docs.map_batches(_score, batch_format="pyarrow")
    return partials.sort(["score", id_col], descending=[True, False]).limit(k)


def dsir_topk(
    docs: Dataset,
    target_sources: tuple[str, ...],
    n_buckets: int = 8192,
    k: int = 200,
) -> Dataset:
    """Full DSIR selection: count → weight table → broadcast → top-k."""
    counts = dsir_bucket_counts(docs, target_sources, n_buckets)
    weights_ref = ray.put(dsir_weights(counts, n_buckets))
    return dsir_select(docs, weights_ref, n_buckets, k)
