"""Sequence packing: greedy next-fit token packing for training batches.

Training-data prep companion to the sampling/quota stages (reference
analogue: the reference has no packer — this is engine-native, like
k-means and the window aggregates). Documents are packed, in ``id_col``
order within each ``key_col`` partition, into fixed ``budget``-token
bins ("sequences"): a document that would overflow the current bin
starts the next one; a document larger than the whole budget gets a bin
of its own.

Scale contract: the pack order is *per key partition*, which makes the
key the unit of parallelism — packing within a key is inherently
sequential (each bin boundary depends on every prior document), so at
corpus scale the caller picks a key of shard granularity (e.g.
``source`` x hash-bucket, one key per output shard). Cross-key packing
is embarrassingly parallel: one ``groupby(key).map_groups`` exchange,
then each group packs locally in O(bins) searchsorted jumps over a
cumulative-sum array — no per-row Python loop.

Deterministic: byte-stable output for a given (input, budget, key).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset


def _pack_group(df: pd.DataFrame, budget: int, sort_cols) -> pd.DataFrame:
    if isinstance(sort_cols, str):
        sort_cols = [sort_cols]
    df = df.sort_values(list(sort_cols), kind="mergesort")
    toks = df["n_tokens"].to_numpy(dtype=np.int64)
    n = len(toks)
    cum = np.concatenate([[0], np.cumsum(toks)])
    bins = np.empty(n, dtype=np.int64)
    offs = np.empty(n, dtype=np.int64)
    start, b = 0, 0
    while start < n:
        # furthest end with cum[end] - cum[start] <= budget (next-fit jump)
        end = int(np.searchsorted(cum, cum[start] + budget, side="right")) - 1
        if end <= start:  # oversize document: a bin of its own
            end = start + 1
        bins[start:end] = b
        offs[start:end] = cum[start:end] - cum[start]
        b += 1
        start = end
    out = df.copy()
    out["bin_idx"] = bins
    out["bin_offset"] = offs
    return out


def pack_sequences(
    docs: Dataset,
    budget: int = 256,
    key_col: str | list[str] = "source",
    id_col: str | list[str] = "doc_id",
    text_col: str = "text",
    n_tokens_col: str | None = None,
) -> Dataset:
    """Pack documents into ``budget``-token bins per ``key_col`` partition.

    Returns one row per document: ``(id_col, key_col, n_tokens,
    bin_idx, bin_offset)`` where ``bin_idx`` counts bins within the key
    partition (id order) and ``bin_offset`` is the document's token
    offset inside its bin. Token count is the engine-standard
    whitespace count (stages/text.py:token_stats), or a precomputed
    ``n_tokens_col``. ``key_col``/``id_col`` accept composite keys
    (e.g. pack per (source, epoch) after a mixture expansion).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    keys = [key_col] if isinstance(key_col, str) else list(key_col)
    ids = [id_col] if isinstance(id_col, str) else list(id_col)

    def _tok(batch: pa.Table) -> pa.Table:
        cols = {c: batch[c] for c in (*ids, *keys)}
        if n_tokens_col is not None:
            cols["n_tokens"] = batch[n_tokens_col].cast(pa.int64())
        else:
            s = batch[text_col].to_pandas().astype("string")
            n_ws = (s.str.count(" ") + 1).astype("int64")
            cols["n_tokens"] = pa.array(n_ws.to_numpy())
        return pa.table(cols)

    counted = docs.map_batches(_tok, batch_format="pyarrow")
    return counted.groupby(keys).map_groups(
        lambda df: _pack_group(df, budget, ids), batch_format="pandas"
    )


def shard_layout(
    items: Dataset,
    num_shards: int,
    hash_col: str,
    id_col: str,
    size_col: str,
) -> Dataset:
    """WebDataset-style shard manifest: byte offsets into packed shards.

    The multimodal analogue of :func:`pack_sequences`: every item is
    assigned to one of ``num_shards`` archives by the engine-standard
    multiplicative hash of ``hash_col`` (an int64 column — shard count
    and assignment are cluster-size independent), then laid out inside
    its shard in ``id_col`` order with ``offset`` = exclusive prefix sum
    of ``size_col``. The manifest is what random-access readers need to
    seek into tar/wds-style shard blobs without decoding them.

    One bounded exchange (rows co-partition on shard); the per-shard
    layout is a vectorized sort + cumsum. Output: (shard, id, nbytes,
    offset), one row per item.
    """
    if num_shards <= 0:
        raise ValueError(f"num_shards must be positive, got {num_shards}")
    from . import table_from_pandas
    from .sampling import hash_bucket

    def _tag(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[hash_col].combine_chunks().cast(pa.int64()))
        return pa.table(
            {
                id_col: batch[id_col],
                "nbytes": batch[size_col].cast(pa.int64()),
                "shard": pa.array(hash_bucket(ids, num_shards)),
            }
        )

    def _layout(tab: pa.Table) -> pa.Table:
        df = tab.to_pandas().sort_values(id_col, ignore_index=True)
        c = df["nbytes"].to_numpy()
        df["offset"] = np.concatenate([[0], np.cumsum(c)[:-1]]).astype(np.int64)
        return table_from_pandas(df)

    return (
        items.map_batches(_tag, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(_layout, batch_format="pyarrow")
    )


def concat_shards(
    items: Dataset,
    num_shards: int,
    hash_col: str,
    id_col: str,
    bytes_col: str,
) -> Dataset:
    """Materialize the packed shard blobs described by :func:`shard_layout`.

    Same shard assignment and in-shard order; each group concatenates
    its payload bytes and emits (shard, n_items, total_bytes, sha256) —
    the digest pins the exact byte stream a reader would mmap, so the
    writer is testable without keeping blobs around. Real payloads flow
    through the object store once (one exchange), never via the driver.
    """
    import hashlib

    from .sampling import hash_bucket

    def _tag(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[hash_col].combine_chunks().cast(pa.int64()))
        return pa.table(
            {
                id_col: batch[id_col],
                "payload": batch[bytes_col],
                "shard": pa.array(hash_bucket(ids, num_shards)),
            }
        )

    def _concat(tab: pa.Table) -> pa.Table:
        order = pa.compute.sort_indices(tab[id_col])
        blob = b"".join(tab["payload"].take(order).to_pylist())
        return pa.table(
            {
                "shard": pa.array([tab["shard"][0].as_py()], pa.int64()),
                "n_items": pa.array([len(tab)], pa.int64()),
                "total_bytes": pa.array([len(blob)], pa.int64()),
                "sha256": pa.array([hashlib.sha256(blob).hexdigest()]),
            }
        )

    return (
        items.map_batches(_tag, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(_concat, batch_format="pyarrow")
    )
