"""Order-insensitive per-key content checksums (anti-entropy / resume audit).

The lineage manifests (state/lineage.py) record WHICH partitions were
written; this stage gives the cheap answer to WHETHER a re-run produced
the same content without comparing rows: an XOR fold of per-row 64-bit
digests is commutative/associative, so it is independent of block
structure, partition order and retry interleaving — and it cannot
overflow, unlike an additive checksum, so it stays exact at any row
count (a SUM of 2^32-bounded halves leaves int64 near 2^31 rows/key).

Digest parity is pinned to DuckDB's ``md5_number_lower`` (the
little-endian uint64 of md5 bytes 8:16), split into 32-bit halves so
both sides stay in non-negative BIGINT with no two's-complement games.

The merge is a custom ``AggregateFn`` — the engine's extension point
for aggregates Ray Data lacks (XOR here): vectorized
``accumulate_block`` over the per-batch partials, scalar ``merge``
across blocks. The exchange carries keys × blocks partial rows, never
documents.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
from ray.data import Dataset
from ray.data.aggregate import AggregateFn, Sum


def xor_agg(col: str) -> AggregateFn:
    """XOR-fold aggregate over an int64 column (block-vectorized)."""

    def _acc(a: int, block) -> int:
        arr = (
            block[col].to_numpy()
            if isinstance(block, pa.Table)
            else block[col].to_numpy(copy=False)
        )
        return a ^ int(np.bitwise_xor.reduce(arr.astype(np.int64), initial=0))

    return AggregateFn(
        init=lambda k: 0,
        merge=lambda a, b: a ^ b,
        accumulate_block=_acc,
        name=col,
    )


def row_digest64(texts: "list[str] | np.ndarray") -> np.ndarray:
    """DuckDB ``md5_number_lower`` of each string, as uint64."""
    out = np.empty(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        out[i] = int.from_bytes(
            hashlib.md5(t.encode("utf-8")).digest()[8:16], "little"
        )
    return out


def source_checksums(ds: Dataset, key_col: str, text_col: str) -> Dataset:
    """Per-key ``(n, xh, xl)``: row count and XOR of digest halves.

    Twin: ``COUNT(*), bit_xor(md5_number_lower(text) >> 32),
    bit_xor(md5_number_lower(text) & 0xFFFFFFFF) GROUP BY key``.
    """

    def _partial(batch: pa.Table) -> pa.Table:
        keys = np.asarray(batch[key_col]).astype(object)
        h = row_digest64(batch[text_col].to_pylist())
        hi = (h >> np.uint64(32)).astype(np.int64)
        lo = (h & np.uint64(0xFFFFFFFF)).astype(np.int64)
        uk, inv = np.unique(keys, return_inverse=True)
        order = np.argsort(inv, kind="stable")
        bounds = np.searchsorted(inv[order], np.arange(len(uk)))
        xh = np.bitwise_xor.reduceat(hi[order], bounds) if len(uk) else hi
        xl = np.bitwise_xor.reduceat(lo[order], bounds) if len(uk) else lo
        return pa.table(
            {
                key_col: pa.array(uk),
                "n": pa.array(
                    np.bincount(inv, minlength=len(uk)).astype(np.int64)
                ),
                "xh": pa.array(xh),
                "xl": pa.array(xl),
            }
        )

    return (
        ds.select_columns([key_col, text_col])
        .map_batches(_partial, batch_format="pyarrow")
        .groupby(key_col)
        .aggregate(
            Sum("n", alias_name="n"),
            xor_agg("xh"),
            xor_agg("xl"),
        )
    )
