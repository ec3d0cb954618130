"""Document deduplication stages: exact, MinHash+LSH, SimHash, Jaccard.

The engine's generalization of the reference's exact catalog dedup
(pyroSAR/archive.py:563-577 — hash-partition by identity key, first
writer wins) to content-level near-dup detection for training-data
pipelines. All stages follow the same scale shape:

  per-batch signature computation (vectorized, stateless map_batches)
  → hash-shuffle on a SMALL key (digest / band bucket / block key)
  → per-group work bounded by bucket size, never all-pairs global.

Exact text-hash grouping shuffles 16-byte digests + ids, not the texts.
"""

from __future__ import annotations

import hashlib
from itertools import combinations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset
from ray.data.aggregate import Count, Min

# ------------------------------------------------------------ exact dedup


def md5_digests(texts) -> list[str]:
    """Hex MD5 per text (shared definition with the SQL oracle's md5())."""
    return [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]


def exact_dedup(docs: Dataset, text_col: str = "text", id_col: str = "doc_id") -> Dataset:
    """One row per distinct text: (text_hash, keeper=min id, n copies).

    Shuffles only (digest, id) pairs; the keeper choice (minimum id) is a
    total order, so any cluster size routes identically (the engine twin
    of the reference's deterministic first-wins routing).
    """

    def _hash(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "text_hash": pa.array(md5_digests(batch[text_col].to_pylist())),
                id_col: batch[id_col],
            }
        )

    hashed = docs.select_columns([id_col, text_col]).map_batches(_hash, batch_format="pyarrow")
    return hashed.groupby("text_hash").aggregate(
        Min(id_col, alias_name="keeper"), Count(alias_name="n")
    )


# ------------------------------------------------------- shingles/minhash

_MERSENNE = (1 << 61) - 1


def _token_hashes(text: str) -> np.ndarray:
    """Stable 64-bit hash per whitespace token (blake2b-seeded, not PYTHONHASHSEED)."""
    return np.fromiter(
        (
            int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "little")
            for t in text.split(" ")
        ),
        dtype=np.uint64,
    )


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Unique 64-bit hashes of word k-shingles (rolling combine of token hashes)."""
    th = _token_hashes(text)
    if len(th) < k:
        return np.unique(th)
    stacked = np.stack([th[i : len(th) - k + 1 + i] for i in range(k)])
    mix = np.zeros(stacked.shape[1], dtype=np.uint64)
    for row in stacked:
        mix = mix * np.uint64(1_000_003) + row
    return np.unique(mix)


class MinHasher:
    """Vectorized 64-permutation MinHash over shingle hash sets."""

    def __init__(self, num_perm: int = 64, seed: int = 7):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(object)
        self.b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(object)
        self.num_perm = num_perm

    def signature(self, shingles: np.ndarray) -> np.ndarray:
        if len(shingles) == 0:
            return np.full(self.num_perm, np.iinfo(np.int64).max, dtype=np.int64)
        s = shingles.astype(object)[:, None]
        vals = (s * self.a[None, :] + self.b[None, :]) % _MERSENNE
        return vals.min(axis=0).astype(np.int64)


def minhash_band_rows(
    docs: Dataset,
    num_perm: int = 64,
    bands: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> Dataset:
    """Emit one (band, band_hash, id) row per band per doc.

    ``bands`` buckets of ``num_perm/bands`` signature rows; two docs land
    in the same (band, band_hash) bucket iff that band of their
    signatures agrees — the standard shingle→minhash→band→bucket LSH.
    """
    rows_per_band = num_perm // bands

    def _sig(batch: pa.Table) -> pa.Table:
        hasher = MinHasher(num_perm)
        ids, band_ids, band_hashes = [], [], []
        for doc_id, text in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            sig = hasher.signature(shingle_hashes(text))
            for b in range(bands):
                chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
                h = hashlib.blake2b(chunk.tobytes(), digest_size=8).digest()
                ids.append(doc_id)
                band_ids.append(b)
                band_hashes.append(int.from_bytes(h, "little") >> 1)
        return pa.table(
            {
                id_col: pa.array(ids, type=pa.int64()),
                "band": pa.array(band_ids, type=pa.int32()),
                "band_hash": pa.array(band_hashes, type=pa.int64()),
            }
        )

    return docs.select_columns([id_col, text_col]).map_batches(_sig, batch_format="pyarrow")


def minhash_candidate_pairs(docs: Dataset, **kwargs) -> Dataset:
    """Near-dup candidate pairs (a < b) from LSH band buckets, deduplicated."""
    id_col = kwargs.get("id_col", "doc_id")
    band_rows = minhash_band_rows(docs, **kwargs)

    def _pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(group[id_col].tolist())
        pairs = list(combinations(ids, 2)) if len(ids) > 1 else []
        return pd.DataFrame(pairs, columns=["id_a", "id_b"])

    pairs = band_rows.groupby(["band", "band_hash"]).map_groups(_pairs, batch_format="pandas")
    # a pair can surface from several bands → distinct
    return pairs.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


# ------------------------------------------------------------------ simhash


def simhash(texts, bits: int = 64) -> np.ndarray:
    """64-bit SimHash per text from token hash bit-votes (vectorized)."""
    out = np.empty(len(texts), dtype=np.int64)
    weights = np.uint64(1) << np.arange(bits, dtype=np.uint64)
    for i, t in enumerate(texts):
        th = _token_hashes(t)
        if len(th) == 0:
            out[i] = 0
            continue
        votes = ((th[:, None] & weights[None, :]) != 0).sum(axis=0)
        sig = np.uint64(0)
        sig = (weights[votes * 2 > len(th)]).sum(dtype=np.uint64)
        out[i] = np.int64(sig >> np.uint64(1))  # keep sign bit clear for int64
    return out


def simhash_column(docs: Dataset, text_col: str = "text", id_col: str = "doc_id") -> Dataset:
    def _sh(batch: pa.Table) -> pa.Table:
        return pa.table(
            {id_col: batch[id_col], "simhash": pa.array(simhash(batch[text_col].to_pylist()))}
        )

    return docs.select_columns([id_col, text_col]).map_batches(_sh, batch_format="pyarrow")


# --------------------------------------------------- word-set jaccard pairs


def jaccard_pairs(
    docs: Dataset,
    block_col: str = "source",
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> Dataset:
    """Exact word-SET Jaccard similar pairs within blocking-key groups.

    Blocking bounds the quadratic term by the block size (the SQL oracle
    shares the identical block + threshold definition). Jaccard is
    computed on distinct whitespace tokens; the emitted ``jac`` value is
    one int/int double division → bit-equal to SQL.
    """

    def _pairs(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(id_col, kind="mergesort")
        ids = group[id_col].tolist()
        sets = [set(t.split(" ")) for t in group[text_col]]
        out_a, out_b, out_j = [], [], []
        for i, j in combinations(range(len(ids)), 2):
            inter = len(sets[i] & sets[j])
            union = len(sets[i]) + len(sets[j]) - inter
            jac = inter / union if union else 0.0
            if jac >= threshold:
                out_a.append(ids[i])
                out_b.append(ids[j])
                out_j.append(jac)
        return pd.DataFrame({"id_a": out_a, "id_b": out_b, "jac": out_j})

    return (
        docs.select_columns([id_col, text_col, block_col])
        .groupby(block_col)
        .map_groups(_pairs, batch_format="pandas")
    )
