"""Similarity search over an embedding column.

Baseline: brute-force cosine top-k — the query matrix is broadcast via
``ray.put`` once, each map_batches task does ONE numpy matmul per batch
and emits at most k rows per query per batch (partial top-k), and a
final small groupby merges partials. The shuffle therefore carries
O(#queries × #batches × k) rows — independent of corpus size.

Scale path: LSH-bucketed search (random-hyperplane signatures), where
corpus and queries hash-partition by signature bucket and only bucket
peers are scored — the IVF-style variant when brute force stops fitting.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
from ray.data import Dataset


def _normalize(mat: np.ndarray) -> np.ndarray:
    mat = np.asarray(mat, dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def _stack_embeddings(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return np.asarray(arr.flatten()).reshape(len(batch), -1)


def brute_force_topk(
    corpus: Dataset,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    exclude_self: bool = True,
) -> Dataset:
    """Cosine top-k neighbors per query: rows (query_id, neighbor_id, rank).

    Ties broken by ascending neighbor id (deterministic across cluster
    sizes). Returns exactly k rows per query (fewer if the corpus is
    smaller).
    """
    qref = ray.put((np.asarray(query_ids, dtype=np.int64), _normalize(query_matrix)))

    class _Partial:
        def __init__(self):
            self.qids, self.qmat = ray.get(qref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            if len(batch) == 0:
                return pa.table(
                    {
                        "query_id": pa.array([], type=pa.int64()),
                        "neighbor_id": pa.array([], type=pa.int64()),
                        "score": pa.array([], type=pa.float64()),
                    }
                )
            emb = _normalize(_stack_embeddings(batch, emb_col))
            ids = batch[id_col].to_numpy()
            sims = emb @ self.qmat.T  # (batch, nq)
            if exclude_self:
                sims[ids[:, None] == self.qids[None, :]] = -np.inf
            kk = min(k, sims.shape[0])
            # per-query partial top-k within this batch
            part = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (kk, nq)
            nq = sims.shape[1]
            out_q = np.repeat(self.qids, kk)
            flat = part.T.reshape(-1)  # query-major
            out_n = ids[flat]
            out_s = sims[flat, np.repeat(np.arange(nq), kk)]
            keep = np.isfinite(out_s)
            return pa.table(
                {
                    "query_id": pa.array(out_q[keep]),
                    "neighbor_id": pa.array(out_n[keep]),
                    "score": pa.array(out_s[keep]),
                }
            )

    partials = corpus.select_columns([id_col, emb_col]).map_batches(
        _Partial, batch_format="pyarrow", concurrency=(1, 4)
    )

    def _merge(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(
            ["score", "neighbor_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        group = group.assign(rank=np.arange(1, len(group) + 1, dtype=np.int64))
        return group[["query_id", "neighbor_id", "rank"]]

    return partials.groupby("query_id").map_groups(_merge, batch_format="pandas")


# ----------------------------------------------------------- LSH variant


class HyperplaneLSH:
    """Random-hyperplane signatures: bucket = sign-bit pattern of ``nbits`` dots."""

    def __init__(self, dim: int, nbits: int = 8, seed: int = 11):
        rng = np.random.RandomState(seed)
        self.planes = rng.standard_normal((nbits, dim))

    def buckets(self, mat: np.ndarray) -> np.ndarray:
        bits = (np.asarray(mat, dtype=np.float64) @ self.planes.T) > 0
        weights = (1 << np.arange(bits.shape[1], dtype=np.int64))[None, :]
        return (bits * weights).sum(axis=1).astype(np.int64)


def lsh_topk(
    corpus: Dataset,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    k: int = 10,
    nbits: int = 8,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> Dataset:
    """Approximate top-k: score only corpus rows sharing the query's LSH bucket.

    Same output schema as :func:`brute_force_topk`; recall < 1 by design.
    Queries are grouped by bucket on the driver (small side); each batch
    computes its rows' buckets and scores only the matching queries.
    """
    qmat = _normalize(query_matrix)
    lsh = HyperplaneLSH(qmat.shape[1], nbits)
    qbuckets = lsh.buckets(qmat)
    qref = ray.put((np.asarray(query_ids, dtype=np.int64), qmat, qbuckets))

    class _Partial:
        def __init__(self):
            self.qids, self.qmat, self.qbuckets = ray.get(qref)
            self.lsh = HyperplaneLSH(self.qmat.shape[1], nbits)

        def __call__(self, batch: pa.Table) -> pa.Table:
            emb = _normalize(_stack_embeddings(batch, emb_col))
            ids = batch[id_col].to_numpy()
            cbuckets = self.lsh.buckets(emb)
            out_q, out_n, out_s = [], [], []
            for b in np.unique(cbuckets):
                qm = self.qbuckets == b
                cm = cbuckets == b
                if not qm.any() or not cm.any():
                    continue
                sims = emb[cm] @ self.qmat[qm].T
                sub_ids = ids[cm]
                sub_q = self.qids[qm]
                sims[sub_ids[:, None] == sub_q[None, :]] = -np.inf
                kk = min(k, sims.shape[0])
                part = np.argpartition(-sims, kk - 1, axis=0)[:kk]
                for qi in range(sims.shape[1]):
                    sel = part[:, qi]
                    out_q.extend([sub_q[qi]] * len(sel))
                    out_n.extend(sub_ids[sel].tolist())
                    out_s.extend(sims[sel, qi].tolist())
            keep = np.isfinite(out_s)
            return pa.table(
                {
                    "query_id": pa.array(np.asarray(out_q, dtype=np.int64)[keep]),
                    "neighbor_id": pa.array(np.asarray(out_n, dtype=np.int64)[keep]),
                    "score": pa.array(np.asarray(out_s, dtype=np.float64)[keep]),
                }
            )

    partials = corpus.select_columns([id_col, emb_col]).map_batches(
        _Partial, batch_format="pyarrow", concurrency=(1, 4)
    )

    def _merge(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(
            ["score", "neighbor_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        return group.assign(rank=np.arange(1, len(group) + 1, dtype=np.int64))[
            ["query_id", "neighbor_id", "rank"]
        ]

    return partials.groupby("query_id").map_groups(_merge, batch_format="pandas")
