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
    if isinstance(arr, pa.ExtensionArray):
        # Ray tensor extension (fixed-shape ndarray column) → (n, d)
        return np.asarray(arr.to_numpy(zero_copy_only=False))
    return np.asarray(arr.flatten()).reshape(len(batch), -1)


def brute_force_topk(
    corpus: Dataset,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    exclude_self: bool = True,
    query_labels: np.ndarray | None = None,
    label_col: str = "label",
) -> Dataset:
    """Cosine top-k neighbors per query: rows (query_id, neighbor_id, rank).

    Ties broken by ascending neighbor id (deterministic across cluster
    sizes). Returns exactly k rows per query (fewer if the corpus is
    smaller).

    ``query_labels`` turns the search into HARD-NEGATIVE MINING for
    contrastive training: corpus rows sharing the query's label are
    masked out, so the result is each query's most similar
    OTHER-class neighbors — same broadcast + one-matmul-per-batch plan,
    one extra int compare per (row, query) pair.
    """
    qlab = None if query_labels is None else np.asarray(query_labels, dtype=np.int64)
    qref = ray.put(
        (np.asarray(query_ids, dtype=np.int64), _normalize(query_matrix), qlab)
    )

    class _Partial:
        def __init__(self):
            self.qids, self.qmat, self.qlabels = ray.get(qref)

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
            if self.qlabels is not None:
                lab = batch[label_col].to_numpy().astype(np.int64)
                sims[lab[:, None] == self.qlabels[None, :]] = -np.inf
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

    cols = [id_col, emb_col] + ([label_col] if query_labels is not None else [])
    partials = corpus.select_columns(cols).map_batches(
        _Partial, batch_format="pyarrow", concurrency=(1, 4)
    )

    def _merge(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(
            ["score", "neighbor_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        group = group.assign(rank=np.arange(1, len(group) + 1, dtype=np.int64))
        return group[["query_id", "neighbor_id", "rank"]]

    return partials.groupby("query_id").map_groups(_merge, batch_format="pandas")


def cosine_threshold_pairs(
    corpus: Dataset,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    threshold: float = 0.2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    exclude_self: bool = True,
) -> Dataset:
    """Embedding-cosine near-dup pairs: every (query, corpus) pair with
    cosine ≥ ``threshold``, streamed over the corpus.

    The dual of :func:`brute_force_topk` for DEDUP rather than search:
    the query matrix broadcasts once (``ray.put``), each batch does one
    matmul and emits only the over-threshold pairs — no shuffle at all
    (pair volume is the actual near-dup volume, corpus never moves).
    """
    qref = ray.put((np.asarray(query_ids, dtype=np.int64), _normalize(query_matrix)))

    class _Pairs:
        def __init__(self):
            self.qids, self.qmat = ray.get(qref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            if len(batch) == 0:
                return pa.table(
                    {
                        "query_id": pa.array([], type=pa.int64()),
                        "neighbor_id": pa.array([], type=pa.int64()),
                        "cos": pa.array([], type=pa.float64()),
                    }
                )
            emb = _normalize(_stack_embeddings(batch, emb_col))
            ids = batch[id_col].to_numpy()
            sims = emb @ self.qmat.T  # (batch, nq)
            keep = sims >= threshold
            if exclude_self:
                keep &= ids[:, None] != self.qids[None, :]
            ci, qi = np.nonzero(keep)
            return pa.table(
                {
                    "query_id": pa.array(self.qids[qi]),
                    "neighbor_id": pa.array(ids[ci]),
                    "cos": pa.array(sims[ci, qi]),
                }
            )

    return corpus.select_columns([id_col, emb_col]).map_batches(
        _Pairs, batch_format="pyarrow", concurrency=(1, 4)
    )


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
        """Bucketed partial top-k; per-bucket block matmuls.

        Queries are pre-sorted by bucket ONCE per actor; each batch
        sorts its rows by bucket and intersects the two bucket sets, so
        the only Python loop runs over SHARED buckets (≤ 2^nbits) and
        every iteration is pure vectorized numpy — matmul, one
        argpartition, array appends concatenated once at the end.
        """

        def __init__(self):
            self.qids, self.qmat, qbuckets = ray.get(qref)
            self.lsh = HyperplaneLSH(self.qmat.shape[1], nbits)
            qorder = np.argsort(qbuckets, kind="stable")
            self.qorder = qorder
            qb_sorted = qbuckets[qorder]
            self.qb_unique, self.qb_starts = np.unique(qb_sorted, return_index=True)
            self.qb_ends = np.append(self.qb_starts[1:], len(qb_sorted))

        def __call__(self, batch: pa.Table) -> pa.Table:
            emb = _normalize(_stack_embeddings(batch, emb_col))
            ids = batch[id_col].to_numpy()
            cbuckets = self.lsh.buckets(emb)
            corder = np.argsort(cbuckets, kind="stable")
            cb_sorted = cbuckets[corder]
            cb_unique, cb_starts = np.unique(cb_sorted, return_index=True)
            cb_ends = np.append(cb_starts[1:], len(cb_sorted))
            shared, qpos, cpos = np.intersect1d(
                self.qb_unique, cb_unique, assume_unique=True, return_indices=True
            )
            chunks_q, chunks_n, chunks_s = [], [], []
            for qi, ci in zip(qpos, cpos):
                qsel = self.qorder[self.qb_starts[qi] : self.qb_ends[qi]]
                csel = corder[cb_starts[ci] : cb_ends[ci]]
                sub_q = self.qids[qsel]
                sub_ids = ids[csel]
                sims = emb[csel] @ self.qmat[qsel].T  # (nc, nq)
                sims[sub_ids[:, None] == sub_q[None, :]] = -np.inf
                kk = min(k, sims.shape[0])
                part = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (kk, nq)
                nq = sims.shape[1]
                flat = part.T.reshape(-1)  # query-major
                chunks_q.append(np.repeat(sub_q, kk))
                chunks_n.append(sub_ids[flat])
                chunks_s.append(sims[flat, np.repeat(np.arange(nq), kk)])
            if not chunks_q:
                return pa.table(
                    {
                        "query_id": pa.array([], type=pa.int64()),
                        "neighbor_id": pa.array([], type=pa.int64()),
                        "score": pa.array([], type=pa.float64()),
                    }
                )
            out_q = np.concatenate(chunks_q)
            out_n = np.concatenate(chunks_n)
            out_s = np.concatenate(chunks_s)
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
        return group.assign(rank=np.arange(1, len(group) + 1, dtype=np.int64))[
            ["query_id", "neighbor_id", "rank"]
        ]

    return partials.groupby("query_id").map_groups(_merge, batch_format="pandas")


def lsh_planes_int(dim: int, nbits: int = 8, seed: int = 11) -> np.ndarray:
    """Deterministic small-INTEGER hyperplanes (nbits × dim, values in
    [-9, 9]): the sign of an integer dot product is exact arithmetic, so
    bucket assignment reproduces bit-for-bit across numpy, DuckDB (the
    planes embed as SQL literals) and any cluster size — the hyperplane
    analogue of :func:`ivf_centroids`. Sign is scale-invariant, so
    bucketing the quantized RAW embedding equals bucketing the
    normalized one up to quantization."""
    rng = np.random.RandomState(seed)
    planes = rng.randint(-9, 10, size=(nbits, dim)).astype(np.int64)
    for j in range(nbits):
        if not planes[j].any():  # degenerate all-zero row can't split
            planes[j, 0] = 1
    return planes


def lsh_buckets_int(mat_int: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Sign-bit bucket of each row: bit j set iff row · planes[j] > 0."""
    bits = (np.asarray(mat_int, dtype=np.int64) @ planes.T) > 0
    weights = (1 << np.arange(bits.shape[1], dtype=np.int64))[None, :]
    return (bits * weights).sum(axis=1).astype(np.int64)


def lsh_topk_exact(
    corpus: Dataset,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    k: int = 10,
    nbits: int = 8,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> Dataset:
    """LSH-bucketed approximate top-k, ORACLE-EXACT: 1e-6-quantized
    embeddings, integer hyperplane buckets, ranking by exact integer
    inner product with (score DESC, neighbor_id ASC) ties — every
    arithmetic step reproduces in SQL (< 2^53), like ``ivf_topk``.

    Same bucketed physical plan as :func:`lsh_topk` (queries broadcast
    once, per-batch bucket intersection, per-bucket block matmuls,
    output-sized merge exchange); recall < 1 by design — only bucket
    peers are scored."""
    qmat = quantize_embeddings(query_matrix)
    planes = lsh_planes_int(qmat.shape[1], nbits)
    qbuckets = lsh_buckets_int(qmat, planes)
    qref = ray.put((np.asarray(query_ids, dtype=np.int64), qmat, qbuckets))

    class _Partial:
        """Integer twin of lsh_topk._Partial: per-bucket int matmuls,
        per-batch top-k under the exact (score desc, id asc) total
        order — a candidate cut here is strictly worse than k kept
        ones, so the global merge stays exact."""

        def __init__(self):
            self.qids, self.qmat, qb = ray.get(qref)
            self.planes = lsh_planes_int(self.qmat.shape[1], nbits)
            qorder = np.argsort(qb, kind="stable")
            self.qorder = qorder
            qb_sorted = qb[qorder]
            self.qb_unique, self.qb_starts = np.unique(qb_sorted, return_index=True)
            self.qb_ends = np.append(self.qb_starts[1:], len(qb_sorted))

        def __call__(self, batch: pa.Table) -> pa.Table:
            emb = quantize_embeddings(_stack_embeddings(batch, emb_col))
            ids = batch[id_col].to_numpy()
            cbuckets = lsh_buckets_int(emb, self.planes)
            corder = np.argsort(cbuckets, kind="stable")
            cb_sorted = cbuckets[corder]
            cb_unique, cb_starts = np.unique(cb_sorted, return_index=True)
            cb_ends = np.append(cb_starts[1:], len(cb_sorted))
            shared, qpos, cpos = np.intersect1d(
                self.qb_unique, cb_unique, assume_unique=True, return_indices=True
            )
            chunks_q, chunks_n, chunks_s = [], [], []
            for qi, ci in zip(qpos, cpos):
                qsel = self.qorder[self.qb_starts[qi] : self.qb_ends[qi]]
                csel = corder[cb_starts[ci] : cb_ends[ci]]
                sub_q = self.qids[qsel]
                sub_ids = ids[csel]
                sims = emb[csel] @ self.qmat[qsel].T  # (nc, nq) int64 exact
                selfmask = sub_ids[:, None] == sub_q[None, :]
                for qj in range(sims.shape[1]):
                    col = sims[:, qj]
                    valid = ~selfmask[:, qj]
                    vidx = np.flatnonzero(valid)
                    if not len(vidx):
                        continue
                    order = np.lexsort((sub_ids[vidx], -col[vidx]))[:k]
                    pick = vidx[order]
                    chunks_q.append(np.full(len(pick), sub_q[qj], dtype=np.int64))
                    chunks_n.append(sub_ids[pick])
                    chunks_s.append(col[pick])
            if not chunks_q:
                return pa.table(
                    {
                        "query_id": pa.array([], type=pa.int64()),
                        "neighbor_id": pa.array([], type=pa.int64()),
                        "score": pa.array([], type=pa.int64()),
                    }
                )
            return pa.table(
                {
                    "query_id": pa.array(np.concatenate(chunks_q)),
                    "neighbor_id": pa.array(np.concatenate(chunks_n)),
                    "score": pa.array(np.concatenate(chunks_s)),
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

    from .groups import typed_groups

    merge_schema = {
        "query_id": pa.int64(),
        "neighbor_id": pa.int64(),
        "rank": pa.int64(),
    }
    return partials.groupby("query_id").map_groups(
        typed_groups(merge_schema)(_merge), batch_format="pandas"
    )


# --------------------------------------------------------------- IVF search


def ivf_centroids(ncells: int, dim: int, seed: int = 7) -> np.ndarray:
    """Deterministic integer coarse-quantizer centroids (ncells × dim,
    values in [-1000, 1000]). Integer-valued so cell assignment is
    EXACT arithmetic — reproducible bit-for-bit across numpy, DuckDB
    and any cluster size (the float argmax of a trained k-means flips
    on last-ulp ties; a fixed integer quantizer cannot)."""
    rng = np.random.RandomState(seed)
    return rng.randint(-1000, 1001, size=(ncells, dim)).astype(np.int64)


def quantize_embeddings(mat: np.ndarray) -> np.ndarray:
    """float embedding → int64 via ``floor(x * 1e6 + 0.5)`` (double
    precision). The same expression evaluates identically in SQL
    (``floor(x*1000000 + 0.5)::BIGINT``), keeping every downstream dot
    product exact (|dot| < 2^53)."""
    return np.floor(np.asarray(mat, dtype=np.float64) * 1e6 + 0.5).astype(np.int64)


def ivf_topk(
    corpus: Dataset,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    k: int = 10,
    ncells: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    exclude_self: bool = True,
    seed: int = 7,
) -> Dataset:
    """IVF-partitioned inner-product top-k: rows (query_id, neighbor_id, rank).

    The scale path past :func:`brute_force_topk`: corpus rows are
    assigned to the argmax-inner-product centroid cell (ties → lowest
    cell id), each query probes only its ``nprobe`` closest cells, and
    candidates are ranked by exact integer inner product (ties →
    ascending neighbor id). Per batch the work is two integer matmuls
    and a boolean mask — the shuffle still carries only
    O(queries × batches × k) partial rows, and at scale the candidate
    mask skips ``(ncells - nprobe) / ncells`` of every batch's rows
    before scoring.

    Unlike the cosine baseline this ranks by inner product of the
    1e-6-quantized embeddings — the deterministic-exactness contract
    documented on :func:`quantize_embeddings`.
    """
    cents = ivf_centroids(ncells, np.asarray(query_matrix).shape[1], seed=seed)
    qmat = quantize_embeddings(query_matrix)
    # per-query probe sets, computed once driver-side (nq × ncells ints)
    qcell_dots = qmat @ cents.T  # (nq, ncells), exact
    order = np.lexsort((np.arange(ncells)[None, :].repeat(len(qmat), 0), -qcell_dots))
    probed = np.zeros((len(qmat), ncells), dtype=bool)
    rows = np.repeat(np.arange(len(qmat)), nprobe)
    probed[rows, order[:, :nprobe].reshape(-1)] = True
    qref = ray.put(
        (np.asarray(query_ids, dtype=np.int64), qmat, cents, probed)
    )

    class _Partial:
        def __init__(self):
            self.qids, self.qmat, self.cents, self.probed = ray.get(qref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            empty = pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "neighbor_id": pa.array([], type=pa.int64()),
                    "dot": pa.array([], type=pa.int64()),
                }
            )
            if len(batch) == 0:
                return empty
            emb = quantize_embeddings(_stack_embeddings(batch, emb_col))
            ids = batch[id_col].to_numpy()
            # cell assignment: argmax dot, first (lowest) cell wins ties
            cells = np.argmax(emb @ self.cents.T, axis=1)
            # candidate mask per (query, row): row's cell is probed by query
            cand = self.probed[:, cells]  # (nq, batch)
            if exclude_self:
                cand &= self.qids[:, None] != ids[None, :]
            if not cand.any():
                return empty
            dots = self.qmat @ emb.T  # (nq, batch), exact int64
            NEG = np.int64(-(2**62))
            dots = np.where(cand, dots, NEG)
            kk = min(k, dots.shape[1])
            part = np.argpartition(-dots, kk - 1, axis=1)[:, :kk]  # (nq, kk)
            out_q = np.repeat(self.qids, kk)
            flat = part.reshape(-1)
            out_n = ids[flat]
            out_d = dots[np.repeat(np.arange(len(self.qids)), kk), flat]
            keep = out_d != NEG
            return pa.table(
                {
                    "query_id": pa.array(out_q[keep]),
                    "neighbor_id": pa.array(out_n[keep]),
                    "dot": pa.array(out_d[keep]),
                }
            )

    partials = corpus.select_columns([id_col, emb_col]).map_batches(
        _Partial, batch_format="pyarrow", concurrency=(1, 4)
    )

    def _merge(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(
            ["dot", "neighbor_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        group = group.assign(rank=np.arange(1, len(group) + 1, dtype=np.int64))
        return group[["query_id", "neighbor_id", "rank"]]

    return partials.groupby("query_id").map_groups(_merge, batch_format="pandas")


# ----------------------------------------------------------- SemDeDup


def semdedup(
    corpus: Dataset,
    threshold: float = 0.2,
    ncells: int = 16,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    seed: int = 7,
) -> Dataset:
    """Cluster-partitioned semantic dedup (SemDeDup, Abbas et al. 2023).

    Embeddings are assigned to their argmax-inner-product coarse cell
    (the deterministic integer quantizer of :func:`ivf_topk`, ties →
    lowest cell), then each cell independently drops every vector that
    has a same-cell neighbor with smaller id and cosine ≥ ``threshold``
    — the paper's "keep one representative per semantic cluster" rule
    with a deterministic representative. Output rows:
    ``(vec_id, cell, kept)``.

    Scale shape: the only exchange is the groupby on the cell id; the
    quadratic cosine pass is confined to one cell (SemDeDup's cost
    model — ``ncells`` grows with the corpus so cells stay bounded),
    and each cell is one vectorized matmul, not per-pair Python.
    """
    state = {}

    def _assign(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch.append_column("cell", pa.array([], type=pa.int64()))
        emb = quantize_embeddings(_stack_embeddings(batch, emb_col))
        if "cents" not in state:
            state["cents"] = ivf_centroids(ncells, emb.shape[1], seed=seed)
        cells = np.argmax(emb @ state["cents"].T, axis=1).astype(np.int64)
        return batch.append_column("cell", pa.array(cells))

    def _dedup(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(id_col, ignore_index=True)
        mat = _normalize(np.stack(group[emb_col].to_numpy()))
        # row-tiled matmul: peak extra memory = tile x n, not n x n
        # (the cell itself must fit the worker — SemDeDup's contract is
        # that ncells grows with the corpus so cells stay bounded)
        n = len(mat)
        tile = 4096
        dup = np.zeros(n, dtype=bool)
        for t0 in range(0, n, tile):
            t1 = min(t0 + tile, n)
            sims = mat[t0:t1] @ mat.T  # (tile, n)
            hit = sims >= threshold
            # only columns strictly below the row index count (smaller id)
            col = np.arange(n)[None, :]
            row = np.arange(t0, t1)[:, None]
            dup[t0:t1] = (hit & (col < row)).any(axis=1)
        return pd.DataFrame(
            {
                id_col: group[id_col].to_numpy().astype(np.int64),
                "cell": group["cell"].to_numpy().astype(np.int64),
                "kept": (~dup).astype(np.int64),
            }
        )

    return (
        corpus.select_columns([id_col, emb_col])
        .map_batches(_assign, batch_format="pyarrow")
        .groupby("cell")
        .map_groups(_dedup, batch_format="pandas")
    )


# ------------------------------------------------- distributed Gram matrix


def embedding_gram(
    corpus: Dataset, emb_col: str = "embedding"
) -> Dataset:
    """Exact Gram (scatter) matrix of quantized embeddings — the
    distributed-PCA first pass.

    Per batch one integer matmul folds rows into a d x d partial
    (Q^T Q); partials merge by a fixed d^2-row groupby Sum, so the
    exchange is dimension-sized regardless of corpus size. Entries are
    exact int64 (|q| <= ~1e6+eps, so a 10^6-row corpus stays < 2^53 per
    partial and the merged sums stay < 2^63 far past that; the SQL twin
    sums in HUGEINT). Output rows: ``(i, j, s)`` for the upper triangle
    (i <= j — the matrix is symmetric; the driver epilogue mirrors it
    before an eigendecomposition).
    """

    def _partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            e = pa.array([], type=pa.int64())
            return pa.table({"i": e, "j": e, "s": e})
        q = quantize_embeddings(_stack_embeddings(batch, emb_col))
        g = q.T @ q  # (d, d) exact int64
        d = g.shape[0]
        iu, ju = np.triu_indices(d)
        return pa.table(
            {
                "i": pa.array(iu.astype(np.int64)),
                "j": pa.array(ju.astype(np.int64)),
                "s": pa.array(g[iu, ju]),
            }
        )

    from ray.data.aggregate import Sum

    return (
        corpus.select_columns([emb_col])
        .map_batches(_partial, batch_format="pyarrow")
        .groupby(["i", "j"])
        .aggregate(Sum("s", alias_name="s"))
    )


def gram_to_matrix(gram: pd.DataFrame, dim: int) -> np.ndarray:
    """Driver epilogue: mirror the upper triangle into the full (d, d)
    float64 matrix (exact — entries < 2^53), ready for np.linalg.eigh."""
    m = np.zeros((dim, dim), dtype=np.float64)
    i = gram["i"].to_numpy()
    j = gram["j"].to_numpy()
    s = gram["s"].to_numpy().astype(np.float64)
    m[i, j] = s
    m[j, i] = s
    return m


def pca_project(
    corpus: Dataset,
    k: int = 3,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> Dataset:
    """Distributed PCA projection — the second (and last) pass after
    :func:`embedding_gram`.

    Pass 1 folds the corpus into the EXACT integer Gram matrix (one
    dimension-sized exchange); the driver eigendecomposes the d x d
    matrix (d ~ tens-hundreds: trivial) and broadcasts the top-``k``
    eigenvectors; pass 2 projects every row with one matmul per batch —
    zero further exchange, so a 10^12-row corpus streams through at
    read bandwidth. Scatter-matrix PCA (uncentered) matches the
    SemDeDup/IVF quantizer convention used elsewhere in the engine.

    Deterministic across cluster sizes: the Gram sums are exact
    integers, eigh runs once on the driver, and an eigenvector sign
    convention (largest-|component| entry positive) pins the otherwise
    arbitrary +/- per component. Output: (id, p0..p{k-1} float64,
    eigenvalue-descending order). Rows-only by design — eigenvectors
    are float libm output with no exact SQL twin.
    """
    gram = embedding_gram(corpus, emb_col=emb_col).to_pandas()
    dim = int(gram["i"].max()) + 1 if len(gram) else 0
    if dim == 0 or k < 1:
        raise ValueError("empty corpus or k < 1")
    m = gram_to_matrix(gram, dim)
    vals, vecs = np.linalg.eigh(m)
    order = np.argsort(vals)[::-1][: min(k, dim)]
    comps = vecs[:, order]  # (d, k)
    # sign convention: the largest-|entry| coordinate of each component
    # is made positive, so N and 4N clusters emit identical projections
    flip = np.sign(comps[np.abs(comps).argmax(axis=0), np.arange(comps.shape[1])])
    flip[flip == 0] = 1.0
    comps = comps * flip[None, :]
    ref = ray.put(comps)

    class _Project:
        def __init__(self):
            self.comps = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            q = quantize_embeddings(_stack_embeddings(batch, emb_col)).astype(
                np.float64
            )
            proj = q @ self.comps
            out = {id_col: batch[id_col]}
            for c in range(proj.shape[1]):
                out[f"p{c}"] = pa.array(proj[:, c])
            return pa.table(out)

    return corpus.select_columns([id_col, emb_col]).map_batches(
        _Project, batch_format="pyarrow", concurrency=(1, 8), batch_size=4096
    )


def power_iteration_int(
    gram: Dataset, dim: int, iters: int = 4, scale: int = 1 << 20
) -> pa.Table:
    """Top-eigenvector power iteration over the distributed Gram matrix
    in EXACT integers — the hash-twinnable face of distributed PCA.

    The corpus-sized work is :func:`embedding_gram` (bounded d²-row
    exchange); the iteration itself is dimension-bounded driver math
    (d×d ≤ 64×64 here), exactly like ``gram_to_matrix`` + ``eigh`` in
    the float path — but every update is integer arithmetic, so the
    result is independent of block order, cluster size and engine:

        w = G @ v            (exact big-int: |w| ≲ d·n·10¹²·scale)
        v' = trunc(w·scale / max|w|)   (truncation toward zero — the
                                        semantics of DuckDB's ``//``)

    Sign is pinned by the all-positive start vector and identical
    iterations on both sides; no canonicalization step is needed. The
    SQL twin unrolls the same iterations as chained CTEs in HUGEINT.
    Python ints are arbitrary precision, so no overflow on this side;
    the twin's HUGEINT bound (1.7e38) holds past 10¹⁸-row corpora.
    """
    import pandas as pd

    from . import table_from_pandas

    if iters < 1 or dim < 1 or scale < 1:
        raise ValueError("bad iters/dim/scale")
    rows = gram.take_all()  # d²/2 rows — dimension-bounded by contract
    g = [[0] * dim for _ in range(dim)]
    for r in rows:
        i, j, s = int(r["i"]), int(r["j"]), int(r["s"])
        g[i][j] = s
        if i != j:
            g[j][i] = s

    def tdiv(a: int, b: int) -> int:  # truncation toward zero (SQL //)
        return -((-a) // b) if a < 0 else a // b

    v = [scale] * dim
    for _ in range(iters):
        w = [sum(g[i][j] * v[j] for j in range(dim)) for i in range(dim)]
        m = max(abs(x) for x in w)
        if m == 0:
            raise ValueError("zero Gram matrix: power iteration undefined")
        v = [tdiv(x * scale, m) for x in w]

    return table_from_pandas(
        pd.DataFrame(
            {"dim_idx": np.arange(dim, dtype=np.int64), "v": np.array(v, dtype=np.int64)}
        )
    )


def ann_recall(
    exact: "Dataset",
    approx: "Dataset",
    k: int,
    query_col: str = "query_id",
    neighbor_col: str = "neighbor_id",
) -> "Dataset":
    """Recall@k of an approximate neighbor table against the exact one.

    Both inputs are (query_id, neighbor_id, ...) rank tables. The
    intersection is computed with the engine's co-partitioned equi-join
    on a packed (query, neighbor) key — ids must fit 31 bits each (the
    engine's id convention; the pack is checked). Output: one row per
    query, ``n_hits`` = |approx ∩ exact| and ``recall`` = n_hits / k.
    Queries where the approximate index missed everything keep a row
    with n_hits = 0 (left join from the exact side).

    This is the index-quality gate a production ANN deployment runs
    after building an IVF/LSH index: distributed, never materializes
    either neighbor table on the driver.
    """
    import pyarrow.compute as pc

    from .join import equi_join

    def _pack(batch: pa.Table) -> pa.Table:
        q = batch[query_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = batch[neighbor_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(q) and (
            q.max() >= 1 << 31 or n.max() >= 1 << 31 or q.min() < 0 or n.min() < 0
        ):
            raise ValueError("ann_recall packed key needs ids in [0, 2^31)")
        return pa.table({"key": pa.array((q << 31) | n, type=pa.int64())})

    def _pack_left(batch: pa.Table) -> pa.Table:
        packed = _pack(batch)
        return packed.append_column(query_col, batch[query_col])

    def _pack_right(batch: pa.Table) -> pa.Table:
        packed = _pack(batch)
        return packed.append_column(
            "hit", pa.array(np.ones(len(packed), dtype=np.int64))
        )

    left = exact.map_batches(_pack_left, batch_format="pyarrow")
    right = approx.map_batches(_pack_right, batch_format="pyarrow")
    joined = equi_join(left, right, on="key", how="left")

    def _fill(batch: pa.Table) -> pa.Table:
        hit = pc.fill_null(batch["hit"], 0)
        return pa.table({query_col: batch[query_col], "hit": hit})

    from ray.data.aggregate import Sum

    per_query = (
        joined.map_batches(_fill, batch_format="pyarrow")
        .groupby(query_col)
        .aggregate(Sum("hit", alias_name="n_hits"))
    )

    def _ratio(batch: pa.Table) -> pa.Table:
        n = batch["n_hits"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                query_col: batch[query_col],
                "n_hits": pa.array(n, type=pa.int64()),
                "recall": pa.array(n / float(k), type=pa.float64()),
            }
        )

    return per_query.map_batches(_ratio, batch_format="pyarrow")


# ------------------------------------------------- product quantization


def pq_codebooks(
    m: int = 8, ksub: int = 16, dsub: int = 8, seed: int = 13
) -> np.ndarray:
    """Deterministic integer PQ codebooks, shape (m, ksub, dsub), values
    multiples of 1000 in [-1e6, 1e6] — the 1e-6-quantized embedding
    scale, so per-dim residuals and their squares stay exact int64 and
    DOUBLE-representable (same rationale as :func:`ivf_centroids`; a
    float-trained codebook would flip argmins on last-ulp ties)."""
    rng = np.random.RandomState(seed)
    return rng.randint(-1000, 1001, size=(m, ksub, dsub)).astype(np.int64) * 1000


def _pq_assign(emb: np.ndarray, books: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-subspace nearest codeword (ties → lowest code) by exact
    integer L2. Returns (codes (n, m) int64, d2min (n, m) int64)."""
    n = emb.shape[0]
    m, ksub, dsub = books.shape
    sub = emb.reshape(n, m, dsub)
    x2 = np.einsum("nmd,nmd->nm", sub, sub)[:, :, None]
    c2 = np.einsum("mkd,mkd->mk", books, books)[None]
    xc = np.einsum("nmd,mkd->nmk", sub, books)
    d2 = x2 + c2 - 2 * xc  # (n, m, ksub), exact: |terms| < 2^47
    codes = d2.argmin(axis=2).astype(np.int64)  # first = lowest code
    d2min = np.take_along_axis(d2, codes[:, :, None], axis=2)[:, :, 0]
    return codes, d2min


def pq_pack(codes: np.ndarray, ksub: int) -> np.ndarray:
    """Pack (n, m) codes into one int64 per row, ``bits = ceil(log2
    ksub)`` per code, subspace 0 highest. bits*m must stay < 53 so the
    SQL twin can reproduce the packing in exact DOUBLE arithmetic."""
    bits = int(ksub - 1).bit_length()
    m = codes.shape[1]
    if bits * m >= 53:
        raise ValueError(f"packed width {bits * m} exceeds exact-DOUBLE range")
    shifts = (bits * (m - 1 - np.arange(m))).astype(np.int64)
    return (codes << shifts[None, :]).sum(axis=1)


def pq_codes(
    corpus: Dataset,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    m: int = 8,
    ksub: int = 16,
    seed: int = 13,
) -> Dataset:
    """Product-quantization encode (Jégou et al., TPAMI 2011): each
    embedding splits into ``m`` subvectors, each mapped to its nearest
    integer codeword — 64 dims × 8 B collapse to one packed int64 (the
    memory path that lets a 10^12-row ANN index fit a cluster: 64x
    compression here). Row-local, ZERO shuffle; codebooks are
    deterministic integers so codes and reconstruction errors are
    bit-reproducible at any parallelism (hash-twinnable in SQL).

    Output: ``(vec_id, pq_code, recon_err)`` — recon_err the exact
    integer squared reconstruction distance Σ_sub ||x_sub - c||².
    """

    class _Encode:
        def __init__(self):
            self.books = pq_codebooks(m, ksub, 0, seed)  # dsub fixed below

        def __call__(self, batch: pa.Table) -> pa.Table:
            if len(batch) == 0:
                return pa.table(
                    {
                        id_col: pa.array([], type=pa.int64()),
                        "pq_code": pa.array([], type=pa.int64()),
                        "recon_err": pa.array([], type=pa.int64()),
                    }
                )
            emb = quantize_embeddings(_stack_embeddings(batch, emb_col))
            if self.books.shape[2] == 0:
                dsub = emb.shape[1] // m
                self.books = pq_codebooks(m, ksub, dsub, seed)
            codes, d2min = _pq_assign(emb, self.books)
            return pa.table(
                {
                    id_col: batch[id_col].cast(pa.int64()),
                    "pq_code": pa.array(pq_pack(codes, ksub)),
                    "recon_err": pa.array(d2min.sum(axis=1)),
                }
            )

    return corpus.select_columns([id_col, emb_col]).map_batches(
        _Encode, batch_format="pyarrow", concurrency=(1, 4)
    )


def pq_adc_topk(
    corpus: Dataset,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    k: int = 10,
    m: int = 8,
    ksub: int = 16,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    exclude_self: bool = True,
    seed: int = 13,
) -> Dataset:
    """Asymmetric-distance top-k over PQ codes (ADC): each query builds
    ONE (m × ksub) integer LUT of squared distances to every codeword,
    and a database row's distance is m LUT lookups — no decode, no
    d-dim arithmetic per candidate. Rows: (query_id, neighbor_id, rank),
    rank by ascending ADC distance, ties → ascending neighbor id.

    Scale shape = :func:`ivf_topk`: LUTs broadcast once via ray.put
    (nq × m × ksub ints), per-batch work is one encode + m vectorized
    gathers, the exchange carries O(queries × batches × k) partials.
    """
    qmat = quantize_embeddings(query_matrix)
    dsub = qmat.shape[1] // m
    books = pq_codebooks(m, ksub, dsub, seed)
    # LUT[q, sub, code] = ||q_sub - codeword||², exact int64
    qsub = qmat.reshape(len(qmat), m, dsub)
    q2 = np.einsum("nmd,nmd->nm", qsub, qsub)[:, :, None]
    c2 = np.einsum("mkd,mkd->mk", books, books)[None]
    qc = np.einsum("nmd,mkd->nmk", qsub, books)
    lut = q2 + c2 - 2 * qc  # (nq, m, ksub)
    qref = ray.put((np.asarray(query_ids, dtype=np.int64), lut, books))

    class _Partial:
        def __init__(self):
            self.qids, self.lut, self.books = ray.get(qref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            empty = pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "neighbor_id": pa.array([], type=pa.int64()),
                    "dist": pa.array([], type=pa.int64()),
                }
            )
            if len(batch) == 0:
                return empty
            emb = quantize_embeddings(_stack_embeddings(batch, emb_col))
            ids = batch[id_col].to_numpy()
            codes, _ = _pq_assign(emb, self.books)
            nq = len(self.qids)
            dists = np.zeros((nq, len(ids)), dtype=np.int64)
            for s in range(m):  # m gathers, each vectorized over (nq, batch)
                dists += self.lut[:, s, codes[:, s]]
            BIG = np.int64(2**62)
            if exclude_self:
                dists = np.where(
                    self.qids[:, None] == ids[None, :], BIG, dists
                )
            kk = min(k, dists.shape[1])
            part = np.argpartition(dists, kk - 1, axis=1)[:, :kk]
            out_q = np.repeat(self.qids, kk)
            flat = part.reshape(-1)
            out_d = dists[np.repeat(np.arange(nq), kk), flat]
            keep = out_d != BIG
            return pa.table(
                {
                    "query_id": pa.array(out_q[keep]),
                    "neighbor_id": pa.array(ids[flat][keep]),
                    "dist": pa.array(out_d[keep]),
                }
            )

    partials = corpus.select_columns([id_col, emb_col]).map_batches(
        _Partial, batch_format="pyarrow", concurrency=(1, 4)
    )

    def _merge(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(
            ["dist", "neighbor_id"], ascending=[True, True], kind="mergesort"
        ).head(k)
        group = group.assign(rank=np.arange(1, len(group) + 1, dtype=np.int64))
        return group[["query_id", "neighbor_id", "rank"]]

    return partials.groupby("query_id").map_groups(_merge, batch_format="pandas")


# --------------------------------------------- scalar quantization (SQ8)


def sq_train_stats(
    corpus: Dataset, emb_col: str = "embedding"
) -> tuple[np.ndarray, np.ndarray]:
    """Per-dimension (min, max) of the 1e-6-quantized corpus — the SQ8
    "training" pass. One bounded exchange: each batch folds to a single
    (2, d) partial, the driver combines O(#batches) partials. Exact
    integer stats, so codes are bit-reproducible at any block count."""

    def _partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    "mn": pa.array([], type=pa.list_(pa.int64())),
                    "mx": pa.array([], type=pa.list_(pa.int64())),
                }
            )
        emb = quantize_embeddings(_stack_embeddings(batch, emb_col))
        return pa.table(
            {
                "mn": pa.array([emb.min(axis=0).tolist()]),
                "mx": pa.array([emb.max(axis=0).tolist()]),
            }
        )

    parts = corpus.select_columns([emb_col]).map_batches(
        _partial, batch_format="pyarrow"
    ).take_all()  # bounded: one row per input batch
    mn = np.min([p["mn"] for p in parts], axis=0).astype(np.int64)
    mx = np.max([p["mx"] for p in parts], axis=0).astype(np.int64)
    return mn, mx


def _sq_encode(emb: np.ndarray, mn: np.ndarray, mx: np.ndarray) -> np.ndarray:
    """int64 quantized values → uint8 codes, exact floor arithmetic:
    ``(x - min) * 255 // (max - min)`` (0 where the dim is constant) —
    the same expression DuckDB's integer ``//`` evaluates."""
    span = mx - mn
    safe = np.where(span == 0, 1, span)
    codes = (emb - mn[None, :]) * 255 // safe[None, :]
    return np.where(span[None, :] == 0, 0, codes).astype(np.int64)


def sq_rerank_topk(
    corpus: Dataset,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    k: int = 10,
    candidates: int = 30,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    exclude_self: bool = True,
) -> Dataset:
    """Two-stage retrieve-and-rerank cascade over SQ8 codes — the
    production ANN serving shape (quantized first pass, exact second
    pass on a shortlist):

    1. **Retrieve**: symmetric int8×int8 dot products over the scalar-
       quantized codes (8x smaller than the int64 embeddings — the
       memory-bandwidth path at 10^12 rows); per-batch partial
       top-``candidates`` + one small groupby merge, exactly like
       :func:`brute_force_topk`.
    2. **Rerank**: the shortlist (queries × candidates pairs, bounded)
       is broadcast back over the corpus and ONLY candidate rows get
       exact integer dot products; a final vocabulary-sized merge ranks
       the true top-k.

    Both passes are integer-exact, so the full cascade — including
    which candidates survive stage 1 — is reproducible in SQL. Rows:
    (query_id, neighbor_id, rank) by exact score desc, ties → id asc.
    """
    mn, mx = sq_train_stats(corpus, emb_col)
    qmat = quantize_embeddings(query_matrix)
    qcodes = _sq_encode(qmat, mn, mx)
    qids = np.asarray(query_ids, dtype=np.int64)
    statsref = ray.put((qids, qcodes, mn, mx))

    class _Retrieve:
        def __init__(self):
            self.qids, self.qcodes, self.mn, self.mx = ray.get(statsref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            empty = pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "neighbor_id": pa.array([], type=pa.int64()),
                    "approx": pa.array([], type=pa.int64()),
                }
            )
            if len(batch) == 0:
                return empty
            emb = quantize_embeddings(_stack_embeddings(batch, emb_col))
            ids = batch[id_col].to_numpy()
            codes = _sq_encode(emb, self.mn, self.mx)
            scores = self.qcodes @ codes.T  # (nq, batch) int64, |.| < 2^32
            if exclude_self:
                scores = np.where(
                    self.qids[:, None] == ids[None, :],
                    np.int64(-(2**62)),
                    scores,
                )
            nq = scores.shape[0]
            kk = min(candidates, scores.shape[1])
            # partial top-C by (approx desc, id asc)
            order = np.lexsort((ids[None, :].repeat(nq, 0), -scores), axis=1)
            top = order[:, :kk]
            out_q = np.repeat(self.qids, kk)
            flat = top.reshape(-1)
            out_s = scores[np.repeat(np.arange(nq), kk), flat]
            keep = out_s != -(2**62)
            return pa.table(
                {
                    "query_id": pa.array(out_q[keep]),
                    "neighbor_id": pa.array(ids[flat][keep]),
                    "approx": pa.array(out_s[keep]),
                }
            )

    shortlist = (
        corpus.select_columns([id_col, emb_col])
        .map_batches(_Retrieve, batch_format="pyarrow", concurrency=(1, 4))
    )

    def _cand_merge(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(
            ["approx", "neighbor_id"], ascending=[False, True], kind="mergesort"
        ).head(candidates)
        return group[["query_id", "neighbor_id"]]

    cand = (
        shortlist.groupby("query_id")
        .map_groups(_cand_merge, batch_format="pandas")
        .to_pandas()
    )  # bounded: nq × candidates rows
    # pair set → per-neighbor query lists, broadcast once
    pair_map: dict[int, list[int]] = {}
    qpos = {int(q): i for i, q in enumerate(qids)}
    for q, n in zip(cand["query_id"].to_numpy(), cand["neighbor_id"].to_numpy()):
        pair_map.setdefault(int(n), []).append(qpos[int(q)])
    pairref = ray.put((pair_map, qids, qmat))

    class _Rerank:
        def __init__(self):
            self.pairs, self.qids, self.qmat = ray.get(pairref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            empty = pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "neighbor_id": pa.array([], type=pa.int64()),
                    "exact": pa.array([], type=pa.int64()),
                }
            )
            if len(batch) == 0:
                return empty
            ids = batch[id_col].to_numpy()
            mask = np.array([int(i) in self.pairs for i in ids], dtype=bool)
            if not mask.any():
                return empty
            emb = quantize_embeddings(_stack_embeddings(batch, emb_col))[mask]
            kept = ids[mask]
            out_q, out_n, out_s = [], [], []
            for row, nid in zip(emb, kept):
                for qi in self.pairs[int(nid)]:
                    out_q.append(int(self.qids[qi]))
                    out_n.append(int(nid))
                    out_s.append(int(self.qmat[qi] @ row))
            return pa.table(
                {
                    "query_id": pa.array(out_q, type=pa.int64()),
                    "neighbor_id": pa.array(out_n, type=pa.int64()),
                    "exact": pa.array(out_s, type=pa.int64()),
                }
            )

    exact = corpus.select_columns([id_col, emb_col]).map_batches(
        _Rerank, batch_format="pyarrow", concurrency=(1, 4)
    )

    def _final(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(
            ["exact", "neighbor_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        group = group.assign(rank=np.arange(1, len(group) + 1, dtype=np.int64))
        return group[["query_id", "neighbor_id", "rank"]]

    return exact.groupby("query_id").map_groups(_final, batch_format="pandas")


def subspace_iteration_int(
    gram: Dataset,
    dim: int,
    k: int = 3,
    iters: int = 4,
    scale: int = 1 << 20,
) -> "list[list[int]]":
    """Top-``k`` eigen-SUBSPACE by orthogonal iteration in EXACT
    integers — :func:`power_iteration_int` generalized so distributed
    PCA's projection becomes hash-twinnable end to end (the k=1 twin
    proved the technique; this is the k>1 basis the pca query ships).

    Per iteration, per component c (in order):

        w   = G @ v_c                      (exact big-int matvec)
        ŵ   = trunc(w·scale / max|w|)      (max-norm rescale, SQL ``//``)
        for each already-updated p < c:    (Gram–Schmidt, cross-mult —
            n = ŵ·v_p ; d = v_p·v_p        no division until the final
            ŵ = ŵ·d − v_p·n                rescale keeps it exact)
            ŵ = trunc(ŵ·scale / max|ŵ|)    (re-rescale bounds HUGEINT)

    Start vectors ``v_c[j] = scale + c·j`` are linearly independent and
    all-positive-slope, pinning signs without a canonicalization pass.
    Every op is integer and sequential, so N and 4N clusters — and the
    unrolled HUGEINT SQL twin — reproduce the basis bit-for-bit.
    Magnitude bound (the twin's HUGEINT ceiling): |w| ≲ d·|G|·scale
    stays under 1.7e38 past 10¹²-row corpora; the orthogonalization
    terms are ≤ scale·d·scale² ≈ 7e19.
    """
    if iters < 1 or dim < 1 or k < 1 or k > dim or scale < 1:
        raise ValueError("bad iters/dim/k/scale")
    rows = gram.take_all()  # d²/2 rows — dimension-bounded by contract
    g = [[0] * dim for _ in range(dim)]
    for r in rows:
        i, j, s = int(r["i"]), int(r["j"]), int(r["s"])
        g[i][j] = s
        if i != j:
            g[j][i] = s

    def tdiv(a: int, b: int) -> int:  # truncation toward zero (SQL //)
        return -((-a) // b) if a < 0 else a // b

    def rescale(w: "list[int]") -> "list[int]":
        m = max(abs(x) for x in w)
        if m == 0:
            raise ValueError("degenerate subspace: zero vector mid-iteration")
        return [tdiv(x * scale, m) for x in w]

    vs = [[scale + c * j for j in range(dim)] for c in range(k)]
    for _ in range(iters):
        for c in range(k):
            w = [sum(g[i][j] * vs[c][j] for j in range(dim)) for i in range(dim)]
            w = rescale(w)
            for p in range(c):
                vp = vs[p]
                n = sum(w[i] * vp[i] for i in range(dim))
                d = sum(x * x for x in vp)
                w = [w[i] * d - vp[i] * n for i in range(dim)]
                w = rescale(w)
            vs[c] = w
    return vs


def pca_project_int(
    corpus: Dataset,
    k: int = 3,
    iters: int = 4,
    scale: int = 1 << 20,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> Dataset:
    """Integer-exact distributed PCA projection — the hash-twinnable
    face of :func:`pca_project` (whose float eigh basis has no SQL
    twin; see its docstring). Pass 1 = :func:`embedding_gram` (bounded
    d²-row exchange); the driver derives the top-``k`` basis via
    :func:`subspace_iteration_int` (dimension-bounded big-int math, the
    shipped-model contract: the SQL twin RE-DERIVES the same basis from
    the data in unrolled HUGEINT CTEs); pass 2 projects every row with
    one int64 matmul per batch — zero further exchange. Output:
    ``(id, p0..p{k-1} int64)``; |p| ≤ d·q·scale ≈ 6.4e13 < 2^53, so the
    twin's DOUBLE dot products are exact too.
    """
    vs = subspace_iteration_int(
        embedding_gram(corpus, emb_col=emb_col), dim=_embedding_dim(corpus, emb_col),
        k=k, iters=iters, scale=scale,
    )
    comps = np.array(vs, dtype=np.int64).T  # (d, k)
    ref = ray.put(comps)

    class _Project:
        def __init__(self):
            self.comps = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            q = quantize_embeddings(_stack_embeddings(batch, emb_col))
            proj = q @ self.comps  # int64: |q|≤~1e6 · scale≤2^20 · d=64
            out = {id_col: batch[id_col]}
            for c in range(proj.shape[1]):
                out[f"p{c}"] = pa.array(proj[:, c])
            return pa.table(out)

    return corpus.select_columns([id_col, emb_col]).map_batches(
        _Project, batch_format="pyarrow", concurrency=(1, 8), batch_size=4096
    )


def _embedding_dim(corpus: Dataset, emb_col: str) -> int:
    """Dimension probe from one row (cheap: limit(1) streams one block)."""
    row = corpus.select_columns([emb_col]).limit(1).take_all()
    if not row:
        raise ValueError("empty corpus")
    return len(row[0][emb_col])
