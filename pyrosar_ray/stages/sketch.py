"""Mergeable cardinality sketch: HyperLogLog registers over token hashes.

The distributed distinct-count primitive (Flajolet et al. 2007): each
batch folds its tokens into 2^b max-of-rank registers; registers merge
by elementwise max — a vocabulary-independent, fixed-size exchange (at
most 2^b rows cross the wire per block regardless of corpus size),
where the exact-distinct plan's shuffle grows with the vocabulary.

Everything that leaves the stage is INTEGER: the register table
(bucket, rho) is deterministic given the engine's standard 32-bit-safe
multiplicative hash, so a SQL twin reproduces it bit-for-bit (rank via
binary-string length — no float logs on either side). The float
estimate is a driver-side epilogue over ≤ 2^b integers.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

def _token_hash32(tokens: pd.Series) -> np.ndarray:
    """Engine-standard FNV-1a over the token's first 16 zero-padded
    bytes (the vectorized dedup_text kernel, already twinned in SQL),
    folded to 32 bits by xor of the halves."""
    from .dedup_text import _TOKEN_BYTES, _token_hash_matrix

    toks = np.array(tokens.to_numpy(dtype=object), dtype=f"S{_TOKEN_BYTES}")
    h = _token_hash_matrix(toks)
    return ((h >> np.uint64(32)) ^ (h & np.uint64(0xFFFFFFFF))).astype(np.uint64)


def _rho(rem: np.ndarray, width: int) -> np.ndarray:
    """Rank = leading zeros of ``rem`` within ``width`` bits, plus one.

    Uses the IEEE exponent (exact for ints < 2^53) — no log rounding.
    """
    bitlen = np.zeros(len(rem), dtype=np.int64)
    nz = rem > 0
    bitlen[nz] = np.frexp(rem[nz].astype(np.float64))[1]
    return np.where(nz, width - bitlen + 1, width + 1).astype(np.int64)


def hll_registers(
    docs: Dataset, b: int = 8, text_col: str = "text"
) -> Dataset:
    """Corpus-wide HLL registers over distinct whitespace tokens.

    Per batch: tokenize, hash, bucket on the top ``b`` bits, fold to a
    per-batch partial register table; a 2^b-sized groupby Max merges the
    partials. Output rows: ``(bucket, rho)`` for non-empty buckets.
    """
    if not 1 <= b <= 16:
        raise ValueError("b must be in [1, 16]")
    width = 32 - b

    def _partial(batch: pa.Table) -> pa.Table:
        s = batch[text_col].to_pandas().astype("string")
        tokens = s.str.split(" ").explode().dropna().drop_duplicates()
        if not len(tokens):
            return pa.table(
                {
                    "bucket": pa.array([], type=pa.int64()),
                    "rho": pa.array([], type=pa.int64()),
                }
            )
        h = _token_hash32(tokens)
        bucket = (h >> np.uint64(width)).astype(np.int64)
        rem = (h & ((np.uint64(1) << np.uint64(width)) - np.uint64(1))).astype(
            np.int64
        )
        rho = _rho(rem, width)
        df = pd.DataFrame({"bucket": bucket, "rho": rho})
        part = df.groupby("bucket", sort=True)["rho"].max().reset_index()
        return pa.table(
            {
                "bucket": pa.array(part["bucket"].to_numpy()),
                "rho": pa.array(part["rho"].to_numpy()),
            }
        )

    from ray.data.aggregate import Max

    partials = docs.map_batches(_partial, batch_format="pyarrow")
    return partials.groupby("bucket").aggregate(Max("rho", alias_name="rho"))


def hll_estimate(registers: pd.DataFrame, b: int = 8) -> float:
    """Driver epilogue: the standard HLL estimator with small/large-range
    corrections, over the ≤ 2^b merged registers."""
    m = 1 << b
    rho = np.zeros(m, dtype=np.int64)
    rho[registers["bucket"].to_numpy()] = registers["rho"].to_numpy()
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    raw = alpha * m * m / np.sum(np.power(2.0, -rho.astype(np.float64)))
    zeros = int((rho == 0).sum())
    if raw <= 2.5 * m and zeros:
        return m * float(np.log(m / zeros))
    if raw > (1 << 32) / 30.0:
        return -(1 << 32) * float(np.log1p(-raw / (1 << 32)))
    return float(raw)
