"""Distributed Lloyd's k-means over an embedding column.

The iterative-algorithm shape on Ray Data: per iteration, the current
centroid matrix is broadcast once (``ray.put``), every batch assigns its
vectors with one matmul and emits k partial ``(sum_vec, count)`` rows,
and the driver folds the bounded partials (k × num_blocks rows, k ≪
data) into the next centroid matrix. The big side streams; only
centroid-sized state ever reaches the driver — the same
broadcast-small-side discipline as the spatial join.

Determinism: seeding is RNG-free — the first seed is the lowest-id
vector, k-means‖ oversampling draws with a splitmix64 id hash, and
farthest-point/argmax ties break on min id — so repeated runs on the
same input produce identical centroids up to float associativity of
the per-block partials; assignments are stable in practice and the
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


def _id_uniform(ids: np.ndarray) -> np.ndarray:
    """Deterministic uniform [0,1) per id (splitmix64 finalizer).

    Replaces RNG in the oversampling draw so repeated fits on the same
    input are bit-identical across processes and cluster sizes.
    """
    h = ids.astype(np.uint64)
    with np.errstate(over="ignore"):
        h = h + np.uint64(0x9E3779B97F4A7C15)
        h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        h = h ^ (h >> np.uint64(31))
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def _weighted_local_kmeans(cand: np.ndarray, w: np.ndarray, k: int, iters: int = 25) -> np.ndarray:
    """Reduce the candidate set to k centers: deterministic weighted
    farthest-point init + weighted Lloyd, all driver-local numpy (the
    candidate set is O(oversample · rounds), independent of data size)."""
    chosen = [int(np.lexsort((np.arange(len(w)), -w))[0])]  # max weight, min index
    d2 = ((cand - cand[chosen[0]]) ** 2).sum(axis=1)
    for _ in range(k - 1):
        score = w * d2
        nxt = int(np.lexsort((np.arange(len(score)), -score))[0])
        chosen.append(nxt)
        d2 = np.minimum(d2, ((cand - cand[nxt]) ** 2).sum(axis=1))
    cents = cand[chosen].copy()
    for _ in range(iters):
        dist = ((cand[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = dist.argmin(axis=1)
        for c in range(k):
            sel = assign == c
            if w[sel].sum() > 0:
                cents[c] = (cand[sel] * w[sel, None]).sum(axis=0) / w[sel].sum()
    return cents


def _parallel_init(
    embeddings: Dataset,
    first: np.ndarray,
    k: int,
    id_col: str,
    vec_col: str,
    rounds: int = 4,
    oversample: int | None = None,
) -> np.ndarray:
    """k-means‖ seeding (Bahmani et al., VLDB'12 — public algorithm).

    One cost pass + ``rounds`` sampling passes + one weighting pass over
    the data — O(rounds) passes independent of k, replacing the k−1
    sequential argmax passes of farthest-point init. Each sampling pass
    broadcasts the current candidate matrix and the lagged total cost
    φ, draws each point with probability min(1, ℓ·d²(x,C)/φ) using the
    deterministic id hash, and emits only (cost partial, sampled rows).
    The final candidate set (≈ ℓ·rounds rows) is weighted by cluster
    population and reduced to k centers driver-locally.
    """
    import ray

    ell = oversample if oversample is not None else 2 * k

    def _sweep(cand_ref, phi: float | None):
        """One pass: per-batch (cost partial, sampled candidate rows)."""

        def _fn(batch: pa.Table) -> pa.Table:
            cents = ray.get(cand_ref)
            vecs = _vectors(batch, vec_col)
            d2 = ((vecs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2).min(axis=1)
            ids = np.asarray(batch[id_col].combine_chunks().cast(pa.int64()))
            if phi is None or phi <= 0:
                take = np.zeros(len(ids), dtype=bool)
            else:
                take = _id_uniform(ids) < np.minimum(1.0, ell * d2 / phi)
            return pa.table(
                {
                    "cost": pa.array([float(d2.sum())] + [0.0] * int(take.sum())),
                    "cid": pa.array(
                        np.concatenate([[-1], ids[take]]).astype(np.int64)
                    ),
                    "vec": pa.array(
                        [np.zeros(vecs.shape[1]).tolist()]
                        + [v.tolist() for v in vecs[take]],
                        type=pa.list_(pa.float64()),
                    ),
                }
            )

        parts = [
            t
            for t in ray.get(
                embeddings.map_batches(_fn, batch_format="pyarrow").to_arrow_refs()
            )
            if len(t)
        ]
        tab = pa.concat_tables(parts).to_pandas()
        cost = float(tab["cost"].sum())
        picked = tab[tab["cid"] >= 0].sort_values("cid")
        return cost, picked

    cand_ids: set[int] = set()
    cand = [first]
    phi: float | None = None  # round 0 only measures cost; sampling starts round 1
    for _ in range(rounds + 1):
        cost, picked = _sweep(ray.put(np.stack(cand)), phi)
        for cid, vec in zip(picked["cid"], picked["vec"]):
            if int(cid) not in cand_ids:
                cand_ids.add(int(cid))
                cand.append(np.asarray(vec, dtype=np.float64))
        # lagged φ: cost measured against the candidate set at round
        # start (≥ the true post-addition cost → never over-samples)
        phi = cost

    cand_mat = np.stack(cand)
    if len(cand) < k:
        # deficit top-up (rare: tiny inputs) — farthest-point the rest
        extra = _farthest_point_init(
            embeddings, first, k - len(cand) + 1, id_col, vec_col
        )
        cand_mat = np.concatenate([cand_mat, extra[1:]])
        if len(cand_mat) < k:
            raise ValueError(f"could not seed k={k} distinct centers")

    # weighting pass: population of each candidate's Voronoi cell
    ref = ray.put(cand_mat)

    def _wfn(batch: pa.Table) -> pa.Table:
        cents = ray.get(ref)
        vecs = _vectors(batch, vec_col)
        d2 = ((vecs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        counts = np.bincount(d2.argmin(axis=1), minlength=len(cents))
        return pa.table(
            {
                "cand": pa.array(np.arange(len(cents), dtype=np.int64)),
                "n": pa.array(counts.astype(np.int64)),
            }
        )

    parts = [
        t
        for t in ray.get(
            embeddings.map_batches(_wfn, batch_format="pyarrow").to_arrow_refs()
        )
        if len(t)
    ]
    wtab = pa.concat_tables(parts).to_pandas().groupby("cand")["n"].sum()
    w = np.zeros(len(cand_mat), dtype=np.float64)
    w[wtab.index.to_numpy()] = wtab.to_numpy().astype(np.float64)
    return _weighted_local_kmeans(cand_mat, w, k)


def kmeans_fit(
    embeddings: Dataset,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init: str = "parallel",
) -> np.ndarray:
    """Fit ``k`` centroids with ``iters`` Lloyd iterations; returns (k, d).

    ``init="parallel"`` (default) seeds with k-means‖ — O(rounds) data
    passes independent of k; ``init="farthest"`` keeps the greedy
    max-min seeding (k−1 passes, exact, fine for small k).
    """
    import ray

    if k < 1 or iters < 1:
        raise ValueError("k and iters must be >= 1")
    if init not in ("parallel", "farthest"):
        raise ValueError(f"unknown init {init!r}")
    # fit makes O(rounds) init passes + ``iters`` Lloyd passes over the
    # data; materialize once so each pass reads object-store blocks
    # (spill-backed) instead of re-executing the upstream read
    embeddings = embeddings.materialize()
    n = embeddings.count()
    if n < k:
        raise ValueError(f"need at least k={k} vectors, got {n}")
    seed_tab = embeddings.sort(id_col).limit(1).to_pandas()
    first = np.asarray(seed_tab[vec_col].iloc[0], dtype=np.float64)
    if init == "parallel":
        centroids = _parallel_init(embeddings, first, k, id_col, vec_col)
    else:
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


def kmeans_int(
    embeds: "Dataset",
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    seed: int = 7,
) -> "Dataset":
    """Spherical k-means in EXACT integer arithmetic — the hash-twinnable
    iterative-ML counterexample to "iterative float means are
    irreducibly rows-only".

    Embeddings quantize via the engine-standard ``floor(x·10⁶ + 0.5)``;
    assignment is argmax of the exact integer dot product (ties → the
    smaller cell, matching the twin's ``ORDER BY dot DESC, cell``);
    the centroid update is the FLOOR integer mean per dimension
    (``sum // n``, empty cells keep their previous centroid), computed
    from one bounded ``(cell, dim) → (sum, count)`` exchange per
    iteration (k·(d+1) rows per block — never the vectors). Every
    quantity is an exact integer < 2^53, so block order, cluster size
    and engine all produce identical assignments; the SQL twin unrolls
    the iterations as chained CTEs with the floor-division identity
    ``(a - ((a % b + b) % b)) // b`` (DuckDB ``//`` truncates, Python
    floors).
    """
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from .ann import ivf_centroids, quantize_embeddings

    if k < 1 or iters < 0:
        raise ValueError("bad k/iters")
    probe = embeds.take(1)
    dim = len(probe[0][emb_col]) if probe else 0
    cents = ivf_centroids(k, dim, seed=seed)

    def _assign(qe: np.ndarray, c: np.ndarray) -> np.ndarray:
        dots = qe @ c.T  # exact int64, |dot| < 2^53
        return np.argmax(dots, axis=1)  # first max = smaller cell

    for _ in range(iters):
        cref = ray.put(cents)

        def _fold(batch: "pa.Table") -> "pa.Table":
            c = ray.get(cref)
            qe = quantize_embeddings(
                np.stack(batch[emb_col].to_pandas().to_numpy())
            )
            cell = _assign(qe, c)
            rows_cd, rows_s = [], []
            for cc in np.unique(cell):
                mask = cell == cc
                sums = qe[mask].sum(axis=0)
                rows_cd.extend((int(cc) * (dim + 1) + np.arange(dim)).tolist())
                rows_s.extend(sums.tolist())
                rows_cd.append(int(cc) * (dim + 1) + dim)  # count slot
                rows_s.append(int(mask.sum()))
            return pa.table(
                {
                    "cd": pa.array(np.asarray(rows_cd, dtype=np.int64)),
                    "s": pa.array(np.asarray(rows_s, dtype=np.int64)),
                }
            )

        stat_rows = (
            embeds.map_batches(_fold, batch_format="pyarrow")
            .groupby("cd")
            .aggregate(Sum("s", alias_name="s"))
            .take_all()
        )  # bounded: k x (dim+1) rows
        sums = np.zeros((k, dim), dtype=object)
        counts = np.zeros(k, dtype=np.int64)
        for r in stat_rows:
            cd, s = int(r["cd"]), int(r["s"])
            cc, d = divmod(cd, dim + 1)
            if d == dim:
                counts[cc] = s
            else:
                sums[cc, d] = s
        new = cents.copy()
        for cc in range(k):
            if counts[cc] > 0:
                new[cc] = np.array(
                    [int(sums[cc, d]) // int(counts[cc]) for d in range(dim)],
                    dtype=np.int64,
                )
        cents = new

    cref = ray.put(cents)

    def _final(batch: "pa.Table") -> "pa.Table":
        c = ray.get(cref)
        qe = quantize_embeddings(np.stack(batch[emb_col].to_pandas().to_numpy()))
        return pa.table(
            {
                id_col: batch[id_col],
                "cell": pa.array(_assign(qe, c).astype(np.int64)),
            }
        )

    return embeds.map_batches(_final, batch_format="pyarrow")
