"""Mergeable sketches: HyperLogLog registers + count-min counters.

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


#: odd multiply-shift row constants (public xxhash/Knuth primes)
CMS_ODD = (0x9E3779B1, 0x85EBCA77, 0xC2B2AE3D, 0x27D4EB2F)

_M32 = np.uint64(0xFFFFFFFF)


def cms_counters(
    docs: Dataset, depth: int = 4, lw: int = 10, text_col: str = "text"
) -> Dataset:
    """Count-min sketch of corpus token frequencies (Cormode-Muthukrishnan).

    Counter[d][pos] = total occurrences of tokens whose row-``d``
    multiply-shift hash lands on ``pos``; rows merge by elementwise sum,
    so the exchange is a fixed ``depth * 2^lw``-row groupby Sum
    regardless of vocabulary — the approximate dual of the exact
    term-frequency plan (stages/text.py term_topk). Per batch, distinct
    tokens are hashed once and weighted by their in-batch counts.

    Everything that crosses the wire is INTEGER (the engine-standard
    FNV-1a 32-bit token hash times public odd constants, mod 2^32,
    shifted), so the DuckDB twin reproduces the counter table
    bit-for-bit. Output rows: ``(d, pos, cnt)`` for non-empty counters.
    """
    if not 1 <= depth <= len(CMS_ODD):
        raise ValueError(f"depth must be in [1, {len(CMS_ODD)}]")
    if not 1 <= lw <= 20:
        raise ValueError("lw (log2 width) must be in [1, 20]")
    shift = np.uint64(32 - lw)

    def _partial(batch: pa.Table) -> pa.Table:
        s = batch[text_col].to_pandas().astype("string")
        counts = s.str.split(" ").explode().dropna().value_counts()
        if not len(counts):
            e = pa.array([], type=pa.int64())
            return pa.table({"d": e, "pos": e, "cnt": e})
        h = _token_hash32(pd.Series(counts.index))
        cnt = counts.to_numpy()
        frames = []
        for d in range(depth):
            pos = ((h * np.uint64(CMS_ODD[d])) & _M32) >> shift
            frames.append(
                pd.DataFrame(
                    {"d": d, "pos": pos.astype(np.int64), "cnt": cnt}
                )
            )
        part = (
            pd.concat(frames)
            .groupby(["d", "pos"], sort=True)["cnt"]
            .sum()
            .reset_index()
        )
        return pa.table(
            {
                "d": pa.array(part["d"].to_numpy(), type=pa.int64()),
                "pos": pa.array(part["pos"].to_numpy()),
                "cnt": pa.array(part["cnt"].to_numpy(), type=pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    partials = docs.map_batches(_partial, batch_format="pyarrow")
    return partials.groupby(["d", "pos"]).aggregate(Sum("cnt", alias_name="cnt"))


def cms_query(counters: pd.DataFrame, tokens: list[str], depth: int = 4, lw: int = 10):
    """Driver epilogue: point-estimate token counts = min over the
    ``depth`` counters each token hashes to (never under-estimates)."""
    shift = np.uint64(32 - lw)
    table = {}
    for d, pos, cnt in zip(counters["d"], counters["pos"], counters["cnt"]):
        table[(int(d), int(pos))] = int(cnt)
    h = _token_hash32(pd.Series(tokens))
    out = []
    for i in range(len(tokens)):
        est = min(
            table.get(
                (d, int(((h[i] * np.uint64(CMS_ODD[d])) & _M32) >> shift)), 0
            )
            for d in range(depth)
        )
        out.append(est)
    return np.asarray(out, dtype=np.int64)


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
