"""Distributed Lloyd's k-means over an embedding column.

The iterative-algorithm shape on Ray Data: per iteration, the current
centroid matrix is broadcast once (``ray.put``), every batch assigns its
vectors with one matmul and emits k partial ``(sum_vec, count)`` rows,
and the driver folds the bounded partials (k × num_blocks rows, k ≪
data) into the next centroid matrix. The big side streams; only
centroid-sized state ever reaches the driver — the same
broadcast-small-side discipline as the spatial join.

Determinism: init takes the k lowest-id vectors (a total order, not
RNG); per-batch partial sums are fixed-order; the driver fold sorts
partials by (iteration-stable) block index, so repeated runs on the
same input produce identical centroids up to float associativity of
the per-block partials — assignments are stable in practice and the
tests assert convergence properties, not bit-equality.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset


def _vectors(batch: pa.Table, vec_col: str) -> np.ndarray:
    """Embedding column → (n, d) float64; handles Arrow list columns
    (the parquet layout) and Ray's tensor extension arrays
    (``from_pandas`` of ndarray cells)."""
    col = batch[vec_col].combine_chunks()
    if pa.types.is_list(col.type) or pa.types.is_fixed_size_list(col.type):
        flat = np.asarray(col.flatten(), dtype=np.float64)
        return flat.reshape(len(batch), -1)
    arr = col.to_numpy(zero_copy_only=False)
    if arr.dtype == object:
        return np.stack([np.asarray(v, dtype=np.float64) for v in arr])
    return np.asarray(arr, dtype=np.float64).reshape(len(batch), -1)


def _farthest_point_init(
    embeddings: Dataset, first: np.ndarray, k: int, id_col: str, vec_col: str
) -> np.ndarray:
    """Deterministic farthest-point seeding (greedy max-min distance).

    Seed = the lowest-id vector; each further seed is the global argmax
    of the distance to the chosen set, found by a distributed argmax
    reduce: every batch emits its best (distance, id, vector) candidate
    and the driver keeps the max (ties broken by min id). k-1 extra
    passes over the data, centroid-sized partials only.
    """
    import ray

    chosen = [first]
    for _ in range(k - 1):
        ref = ray.put(np.stack(chosen))

        def _cand(batch: pa.Table) -> pa.Table:
            cents = ray.get(ref)
            vecs = _vectors(batch, vec_col)
            d2 = ((vecs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2).min(axis=1)
            ids = np.asarray(batch[id_col].combine_chunks().cast(pa.int64()))
            order = np.lexsort((ids, -d2))  # max distance, then min id
            best = order[0]
            return pa.table(
                {
                    "d2": pa.array([float(d2[best])]),
                    "cid": pa.array([int(ids[best])]),
                    "vec": pa.array([vecs[best].tolist()], type=pa.list_(pa.float64())),
                }
            )

        parts = [
            t
            for t in ray.get(
                embeddings.map_batches(_cand, batch_format="pyarrow").to_arrow_refs()
            )
            if len(t)
        ]
        cand = pa.concat_tables(parts).to_pandas()
        cand = cand.sort_values(["d2", "cid"], ascending=[False, True])
        chosen.append(np.asarray(cand["vec"].iloc[0], dtype=np.float64))
    return np.stack(chosen)


def kmeans_fit(
    embeddings: Dataset,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Fit ``k`` centroids with ``iters`` Lloyd iterations; returns (k, d)."""
    import ray

    if k < 1 or iters < 1:
        raise ValueError("k and iters must be >= 1")
    # fit makes (k-1) init passes + ``iters`` Lloyd passes over the
    # data; materialize once so each pass reads object-store blocks
    # (spill-backed) instead of re-executing the upstream read
    embeddings = embeddings.materialize()
    n = embeddings.count()
    if n < k:
        raise ValueError(f"need at least k={k} vectors, got {n}")
    seed_tab = embeddings.sort(id_col).limit(1).to_pandas()
    first = np.asarray(seed_tab[vec_col].iloc[0], dtype=np.float64)
    centroids = _farthest_point_init(embeddings, first, k, id_col, vec_col)

    for _ in range(iters):
        ref = ray.put(centroids)

        def _partial(batch: pa.Table) -> pa.Table:
            cents = ray.get(ref)
            vecs = _vectors(batch, vec_col)
            d2 = ((vecs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            sums = np.zeros_like(cents)
            np.add.at(sums, assign, vecs)
            counts = np.bincount(assign, minlength=len(cents)).astype(np.int64)
            return pa.table(
                {
                    "cluster": pa.array(np.arange(len(cents), dtype=np.int64)),
                    "vsum": pa.array(list(sums), type=pa.list_(pa.float64())),
                    "n": pa.array(counts),
                }
            )

        parts = [
            t
            for t in ray.get(
                embeddings.map_batches(_partial, batch_format="pyarrow").to_arrow_refs()
            )
            if len(t)
        ]
        merged = pa.concat_tables(parts).to_pandas()
        sums = np.zeros_like(centroids)
        counts = np.zeros(k, dtype=np.int64)
        for cluster, vsum, n in zip(merged["cluster"], merged["vsum"], merged["n"]):
            sums[cluster] += np.asarray(vsum)
            counts[cluster] += n
        nonempty = counts > 0
        centroids[nonempty] = sums[nonempty] / counts[nonempty, None]
        # empty clusters keep their previous centroid (standard Lloyd's)
    return centroids


def kmeans_assign(
    embeddings: Dataset,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> Dataset:
    """Label every vector with its nearest centroid (one matmul/batch)."""
    import ray

    ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def _assign(batch: pa.Table) -> pa.Table:
        cents = ray.get(ref)
        vecs = _vectors(batch, vec_col)
        d2 = ((vecs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        return pa.table(
            {
                id_col: batch[id_col],
                "cluster": pa.array(d2.argmin(axis=1).astype(np.int64)),
            }
        )

    return embeddings.map_batches(_assign, batch_format="pyarrow")
