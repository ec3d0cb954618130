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

from . import table_from_pandas


def _ray_from_arrow(tab: pa.Table) -> Dataset:
    import ray.data as rd

    return rd.from_arrow(tab)

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

_FNV_OFFSET = np.uint64(14695981039346656037)
_FNV_PRIME = np.uint64(1099511628211)
_TOKEN_BYTES = 16  # tokens hashed on their first 16 bytes (zero-padded)
_MIX = np.uint64(1_000_003)


def _token_hash_matrix(tokens: np.ndarray) -> np.ndarray:
    """FNV-1a over fixed-width token bytes — one vectorized op per column.

    ``tokens``: numpy bytes array (S{_TOKEN_BYTES}). Deterministic across
    processes (no PYTHONHASHSEED dependence), wrap-around uint64 math.
    """
    if len(tokens) == 0:
        return np.zeros(0, dtype=np.uint64)
    mat = tokens.view(np.uint8).reshape(len(tokens), _TOKEN_BYTES)
    h = np.full(len(tokens), _FNV_OFFSET, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(_TOKEN_BYTES):
            h = (h ^ mat[:, j].astype(np.uint64)) * _FNV_PRIME
    return h


def _token_hashes(text: str) -> np.ndarray:
    """Stable 64-bit hash per whitespace token."""
    toks = np.array(text.split(" "), dtype=f"S{_TOKEN_BYTES}")
    return _token_hash_matrix(toks)


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Unique 64-bit hashes of word k-shingles (rolling combine of token hashes)."""
    th = _token_hashes(text)
    if len(th) < k:
        return np.unique(th)
    with np.errstate(over="ignore"):
        mix = th[: len(th) - k + 1].copy()
        for i in range(1, k):
            mix = mix * _MIX + th[i : len(th) - k + 1 + i]
    return np.unique(mix)


class MinHasher:
    """Vectorized multiply-shift MinHash (uint64 wrap-around permutations)."""

    def __init__(self, num_perm: int = 64, seed: int = 7):
        rng = np.random.RandomState(seed)
        # odd multipliers → bijections mod 2^64
        self.a = (rng.randint(0, 2**62, size=num_perm).astype(np.uint64) << np.uint64(1)) | np.uint64(1)
        self.b = rng.randint(0, 2**62, size=num_perm).astype(np.uint64)
        self.num_perm = num_perm

    def signature(self, shingles: np.ndarray) -> np.ndarray:
        if len(shingles) == 0:
            return np.full(self.num_perm, np.iinfo(np.int64).max, dtype=np.int64)
        with np.errstate(over="ignore"):
            vals = shingles.astype(np.uint64)[:, None] * self.a[None, :] + self.b[None, :]
        return (vals.min(axis=0) >> np.uint64(1)).astype(np.int64)

    def signatures(self, texts: list[str], k: int = 3) -> np.ndarray:
        """(n_docs, num_perm) signatures for a whole batch — one pass of
        token hashing + per-doc segment minima (no per-doc Python math)."""
        tok_lists = [t.split(" ") for t in texts]
        counts = np.array([len(t) for t in tok_lists], dtype=np.int64)
        flat = [tok for lst in tok_lists for tok in lst]
        th = _token_hash_matrix(np.array(flat, dtype=f"S{_TOKEN_BYTES}"))
        tok_off = np.concatenate([[0], np.cumsum(counts)])
        # per-doc shingle arrays (k-windows; short docs fall back to tokens)
        sh_counts = np.where(counts >= k, counts - k + 1, counts)
        out = np.empty((len(texts), self.num_perm), dtype=np.int64)
        pieces = []
        for i in range(len(texts)):
            seg = th[tok_off[i] : tok_off[i + 1]]
            if counts[i] >= k:
                with np.errstate(over="ignore"):
                    mix = seg[: len(seg) - k + 1].copy()
                    for j in range(1, k):
                        mix = mix * _MIX + seg[j : len(seg) - k + 1 + j]
                pieces.append(mix)
            else:
                pieces.append(seg)
        all_sh = np.concatenate(pieces) if pieces else np.zeros(0, dtype=np.uint64)
        sh_off = np.concatenate([[0], np.cumsum(sh_counts)])
        with np.errstate(over="ignore"):
            vals = all_sh[:, None] * self.a[None, :] + self.b[None, :]
        empty = sh_counts == 0
        starts = np.minimum(sh_off[:-1], max(len(all_sh) - 1, 0))
        if len(all_sh):
            mins = np.minimum.reduceat(vals, starts, axis=0)
        else:
            mins = np.full((len(texts), self.num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
        out = (mins >> np.uint64(1)).astype(np.int64)
        out[empty] = np.iinfo(np.int64).max
        return out


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
    Band hashes come from an FNV fold over the band's signature words,
    computed vectorized for the whole batch.
    """
    rows_per_band = num_perm // bands

    def _sig(batch: pa.Table) -> pa.Table:
        hasher = MinHasher(num_perm)
        texts = batch[text_col].to_pylist()
        sig = hasher.signatures(texts).astype(np.uint64)  # (n, num_perm)
        n = len(texts)
        chunks = sig.reshape(n, bands, rows_per_band)
        h = np.full((n, bands), _FNV_OFFSET, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for r in range(rows_per_band):
                h = (h ^ chunks[:, :, r]) * _FNV_PRIME
        band_hash = (h >> np.uint64(1)).astype(np.int64).ravel()
        ids = np.repeat(batch[id_col].to_numpy(), bands)
        band_ids = np.tile(np.arange(bands, dtype=np.int32), n)
        return pa.table(
            {
                id_col: pa.array(ids, type=pa.int64()),
                "band": pa.array(band_ids),
                "band_hash": pa.array(band_hash),
            }
        )

    return docs.select_columns([id_col, text_col]).map_batches(_sig, batch_format="pyarrow")


# Above this many input rows the per-batch partial-count tables are no
# longer provably driver-safe (distinct keys <= input rows), so the
# bucket-size combine moves to the distributed groupby-Sum.
DRIVER_COMBINE_MAX_ROWS = 2_000_000


def keep_multi_member_buckets(
    ds: Dataset, key_cols: tuple[str, ...], combine: str = "auto"
) -> Dataset:
    """Drop rows whose bucket has a single member (vectorized prefilter).

    LSH buckets are overwhelmingly singletons; per-group functions must
    only ever see REAL candidate buckets. Bucket sizes come from
    per-batch partial counts followed by a combine:

    - ``combine='shuffle'`` — distributed groupby-Sum; the only valid
      plan when the key domain is unbounded (band hashes are 63-bit)
      and the input is large: the full count table never lands on the
      driver.
    - ``combine='driver'`` — merge partials driver-side; valid only
      when the distinct-key count is provably bounded.
    - ``combine='auto'`` (default) — cost-based: distinct keys are
      bounded by input rows, so when ``ds.count()`` (cheap — callers
      pass a materialized Dataset) is at most
      :data:`DRIVER_COMBINE_MAX_ROWS` the driver combine is provably
      safe and skips a whole shuffle; anything larger takes the
      shuffle path. At the 100 TB target the count is always over the
      bound, so auto degrades to exactly the scale-safe plan.

    Either way, ONLY the multi-member key set (proportional to actual
    near-dups, small) is collected and broadcast; batches are filtered
    with a vectorized hash semi-join (pandas MultiIndex.isin — C hash
    probe, no per-row Python).
    """
    import ray

    if combine == "auto":
        combine = "driver" if ds.count() <= DRIVER_COMBINE_MAX_ROWS else "shuffle"

    if combine == "shuffle":
        from ray.data.aggregate import Sum

        from .spatial import materialize_small_side

        def _partial(batch: pa.Table) -> pa.Table:
            df = batch.select(list(key_cols)).to_pandas()
            part = df.groupby(list(key_cols), as_index=False).size()
            return table_from_pandas(part)

        counts_ds = (
            ds.map_batches(_partial, batch_format="pyarrow")
            .groupby(list(key_cols))
            .aggregate(Sum("size", alias_name="size"))
        )
        # drop singletons BEFORE collecting — only near-dup volume ships
        multi_ds = counts_ds.map_batches(
            lambda b: b.filter(pa.compute.greater(b["size"], 1)),
            batch_format="pyarrow",
        )
        multi = materialize_small_side(multi_ds, list(key_cols)).to_pandas()
    else:
        # driver combine: the caller passes a MATERIALIZED Dataset with a
        # provably-bounded row count, so the key columns are fetched
        # straight from the cached block refs (<= 16 B x bound) and
        # counted in one pandas pass — no extra Ray execution at all
        refs = ds.select_columns(list(key_cols)).to_arrow_refs()
        blocks = [t for t in ray.get(refs) if len(t)]
        if blocks:
            keys = pa.concat_tables(blocks).to_pandas()
            counts = keys.groupby(list(key_cols), as_index=False).size()
            multi = counts[counts["size"] > 1][list(key_cols)]
        else:
            multi = pd.DataFrame({c: pd.Series([], dtype="int64") for c in key_cols})

    ref = ray.put(multi)

    def _filter(batch: pa.Table) -> pa.Table:
        multi_keys = pd.MultiIndex.from_frame(ray.get(ref))
        df = batch.select(list(key_cols)).to_pandas()
        mask = pd.MultiIndex.from_frame(df).isin(multi_keys)
        return batch.filter(pa.array(mask))

    # plain task pool: the broadcast key set is fetched zero-copy per
    # task (shared-memory ray.get), and no actor-pool spin-up is paid
    return ds.map_batches(_filter, batch_format="pyarrow")


def minhash_candidate_pairs(docs: Dataset, combine: str = "auto", **kwargs) -> Dataset:
    """Near-dup candidate pairs (a < b) from LSH band buckets, deduplicated.

    The band-row Dataset is materialized ONCE in the object store
    (distributed, spill-backed — ~20 bytes x bands per doc, far smaller
    than the text input) so the count pass and the filter pass don't
    each recompute the MinHash signatures. ``combine`` is forwarded to
    :func:`keep_multi_member_buckets` (default cost-based auto).
    """
    id_col = kwargs.get("id_col", "doc_id")
    all_band_rows = minhash_band_rows(docs, **kwargs).materialize()

    if combine == "auto":
        combine = (
            "driver"
            if all_band_rows.count() <= DRIVER_COMBINE_MAX_ROWS
            else "shuffle"
        )
    if combine == "driver":
        # bounded input: the (id, band, band_hash) triples fit the same
        # driver budget as the bucket counts, so the whole bucket →
        # pairs → distinct chain collapses into one pandas pass with no
        # further Ray executions (two shuffles saved); 'shuffle' below
        # remains the fully-distributed plan for unbounded inputs
        import ray

        refs = all_band_rows.select_columns(
            [id_col, "band", "band_hash"]
        ).to_arrow_refs()
        blocks = [t for t in ray.get(refs) if len(t)]
        empty = pa.table(
            {
                "id_a": pa.array([], type=pa.int64()),
                "id_b": pa.array([], type=pa.int64()),
            }
        )
        if not blocks:
            return _ray_from_arrow(empty)
        df = pa.concat_tables(blocks).to_pandas()
        grp = df.groupby(["band", "band_hash"])[id_col]
        out_a, out_b = [], []
        for _, ids in grp:
            if len(ids) < 2:
                continue
            for a, b in combinations(sorted(ids.tolist()), 2):
                out_a.append(a)
                out_b.append(b)
        pairs_df = (
            pd.DataFrame({"id_a": out_a, "id_b": out_b}, dtype="int64")
            .drop_duplicates()
            .reset_index(drop=True)
        )
        if pairs_df.empty:
            return _ray_from_arrow(empty)
        return _ray_from_arrow(table_from_pandas(pairs_df))

    band_rows = keep_multi_member_buckets(
        all_band_rows, ("band", "band_hash"), combine=combine
    )

    from .groups import typed_groups

    @typed_groups({"id_a": pa.int64(), "id_b": pa.int64()})
    def _pairs(group: pd.DataFrame) -> pd.DataFrame:
        # Arrow out (via typed_groups): this stage feeds the distinct
        # aggregate below, and pandas-format blocks entering an exchange
        # hit a ~10x slow path (see stages/groups.py).
        ids = sorted(group[id_col].tolist())
        pairs = list(combinations(ids, 2)) if len(ids) > 1 else []
        return pd.DataFrame(
            {
                "id_a": pd.Series([a for a, _ in pairs], dtype="int64"),
                "id_b": pd.Series([b for _, b in pairs], dtype="int64"),
            }
        )

    pairs = band_rows.groupby(["band", "band_hash"]).map_groups(_pairs, batch_format="pandas")
    # a pair can surface from several bands → distinct via a C++ hash
    # aggregate (no per-group pandas calls)
    return (
        pairs.groupby(["id_a", "id_b"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
    )


# ------------------------------------------------------------------ simhash


def simhash(texts, bits: int = 64) -> np.ndarray:
    """64-bit SimHash per text from token hash bit-votes.

    Fully batch-vectorized: one token-hash pass over the concatenated
    batch, per-doc bit votes via segmented ``np.add.reduceat`` — no
    per-text Python loop.
    """
    if len(texts) == 0:
        return np.zeros(0, dtype=np.int64)
    weights = np.uint64(1) << np.arange(bits, dtype=np.uint64)
    tok_lists = [t.split(" ") for t in texts]
    counts = np.array([len(t) for t in tok_lists], dtype=np.int64)
    flat = [tok for lst in tok_lists for tok in lst]
    th = _token_hash_matrix(np.array(flat, dtype=f"S{_TOKEN_BYTES}"))
    bitmat = (th[:, None] & weights[None, :]) != 0  # (total_tokens, bits)
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
    votes = np.add.reduceat(bitmat, offsets, axis=0)  # (n_docs, bits)
    sigbits = votes * 2 > counts[:, None]
    sig = (sigbits * weights[None, :]).sum(axis=1, dtype=np.uint64)
    return (sig >> np.uint64(1)).astype(np.int64)  # keep sign bit clear


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

    All-pairs intersection sizes come from a tiled boolean-incidence
    matrix product (dense-rank tokens → ``A[docs, tokens]`` → one BLAS
    matmul per row tile), not per-pair Python set ops: exact for every
    pair, O(n²·T) flops but vectorized, and peak memory bounded by the
    tile budget (~128 MB) regardless of block size. The quadratic term
    is still inherent to exact all-pairs within a block — callers with
    unbounded hot blocks should pre-block on a finer key.
    """
    _empty = {
        "id_a": pd.Series(dtype="int64"),
        "id_b": pd.Series(dtype="int64"),
        "jac": pd.Series(dtype="float64"),
    }

    from .groups import typed_groups

    @typed_groups({"id_a": pa.int64(), "id_b": pa.int64(), "jac": pa.float64()})
    def _pairs(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(id_col, kind="mergesort")
        ids = group[id_col].to_numpy()
        n = len(ids)
        if n < 2:
            return pd.DataFrame(_empty)
        tok_lists = [t.split(" ") for t in group[text_col]]
        doc_idx = np.repeat(np.arange(n), [len(t) for t in tok_lists])
        codes, uniques = pd.factorize(
            np.array([tok for lst in tok_lists for tok in lst], dtype=object)
        )
        T = len(uniques)
        # distinct (doc, token) incidence
        A = np.zeros((n, T), dtype=bool)
        A[doc_idx, codes] = True
        sizes = A.sum(axis=1).astype(np.int64)
        budget = 1 << 25  # floats per tile (~128 MB)
        if n * T <= budget:
            Af = A.astype(np.float32)
        else:
            Af = None
        row_chunk = max(1, budget // max(n, 1))
        tok_chunk = max(1, budget // max(n, 1))
        frames = []
        for r0 in range(0, n, row_chunk):
            r1 = min(n, r0 + row_chunk)
            if Af is not None:
                inter = Af[r0:r1] @ Af.T
            else:
                inter = np.zeros((r1 - r0, n), dtype=np.float32)
                for t0 in range(0, T, tok_chunk):
                    t1 = min(T, t0 + tok_chunk)
                    inter += A[r0:r1, t0:t1].astype(np.float32) @ A[:, t0:t1].T.astype(np.float32)
            inter = inter.astype(np.int64)
            union = sizes[r0:r1, None] + sizes[None, :] - inter
            with np.errstate(divide="ignore", invalid="ignore"):
                jac = np.where(union > 0, inter / union, 0.0)
            ii, jj = np.nonzero((jac >= threshold) & (np.arange(n)[None, :] > np.arange(r0, r1)[:, None]))
            if len(ii):
                frames.append(
                    pd.DataFrame(
                        {
                            "id_a": ids[ii + r0].astype(np.int64),
                            "id_b": ids[jj].astype(np.int64),
                            "jac": jac[ii, jj],
                        }
                    )
                )
        if not frames:
            return pd.DataFrame(_empty)
        return pd.concat(frames, ignore_index=True)

    return (
        docs.select_columns([id_col, text_col, block_col])
        .groupby(block_col)
        .map_groups(_pairs, batch_format="pandas")
    )


# ------------------------------------------------- near-dup clustering


def connected_components(pairs: "pd.DataFrame") -> "pd.DataFrame":
    """(doc_id, cluster_id) for every node of an undirected pair graph.

    Vectorized min-label propagation with pointer jumping: scatter the
    minimum label across every edge (``np.minimum.at``), compress the
    label forest to its roots (``label = label[label]`` until stable),
    repeat until every edge's endpoints agree. ``cluster_id`` is the
    component's minimum node id (a deterministic canonical label). The
    edge set a near-dup detector emits is proportional to actual
    duplicates — orders of magnitude smaller than the corpus — so this
    driver-side kernel is the right plan up to the edge bound;
    :func:`cc_distributed` takes over past it.
    """
    nodes = np.unique(np.concatenate([pairs["id_a"].to_numpy(), pairs["id_b"].to_numpy()]))
    ia = np.searchsorted(nodes, pairs["id_a"].to_numpy())
    ib = np.searchsorted(nodes, pairs["id_b"].to_numpy())
    label = np.arange(len(nodes), dtype=np.int64)
    while True:
        m = np.minimum(label[ia], label[ib])
        np.minimum.at(label, ia, m)
        np.minimum.at(label, ib, m)
        while True:  # pointer jumping: compress forest to roots
            nxt = label[label]
            if np.array_equal(nxt, label):
                break
            label = nxt
        if np.array_equal(label[ia], label[ib]):
            break
    return pd.DataFrame({"doc_id": nodes.astype("int64"), "cluster_id": nodes[label].astype("int64")})


def _star_round(edges: Dataset, large: bool) -> Dataset:
    """One large-star or small-star rewrite of a canonical (lo<hi) edge list.

    Alternating the two operations converges an arbitrary edge list to a
    star forest whose centers are the component minima in O(log n) rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14 — public algorithm). Each round is ONE groupby shuffle of the
    edge set; group work is a vectorized numpy min/compare over the
    node's (deduplicated) neighbor array.
    """

    def _symmetrize(t: pa.Table) -> pa.Table:
        lo = t["lo"].to_numpy(zero_copy_only=False)
        hi = t["hi"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "u": pa.array(np.concatenate([lo, hi])),
                "v": pa.array(np.concatenate([hi, lo])),
            }
        )

    from .groups import typed_groups

    @typed_groups({"lo": pa.int64(), "hi": pa.int64()})
    def _star(group: pd.DataFrame) -> pd.DataFrame:
        # Arrow out: each round's output feeds the NEXT round's
        # exchange, so pandas blocks would pay the ~10x slow path
        # once per round (stages/groups.py).
        u = int(group["u"].iloc[0])
        nbrs = np.unique(group["v"].to_numpy())
        if large:
            m = min(u, int(nbrs[0]))
            out = nbrs[nbrs > u]
            lo = np.full(len(out), m, dtype=np.int64)
            return pd.DataFrame({"lo": lo, "hi": out.astype(np.int64)})
        smaller = nbrs[nbrs < u]
        if len(smaller) == 0:
            return pd.DataFrame({"lo": pd.Series([], dtype="int64"), "hi": pd.Series([], dtype="int64")})
        m = int(smaller[0])
        out = np.concatenate([smaller[1:], np.array([u], dtype=smaller.dtype)])
        return pd.DataFrame(
            {"lo": np.full(len(out), m, dtype=np.int64), "hi": out.astype(np.int64)}
        )

    return (
        edges.map_batches(_symmetrize, batch_format="pyarrow")
        .groupby("u")
        .map_groups(_star, batch_format="pandas")
    )


def cc_distributed(pairs: Dataset, max_rounds: int = 40) -> Dataset:
    """Distributed connected components over an (id_a, id_b) edge Dataset.

    Alternates large-star/small-star rewrites (each one groupby shuffle
    of the edge set, never a node- or corpus-sized driver structure)
    until the deduplicated edge list is stable, i.e. a star forest with
    component-minimum centers. Convergence is checked with two scalar
    aggregates (distinct-edge count + a wrap-around hash sum); only
    those scalars reach the driver. The final labeling maps every star
    leaf to its center and each center to itself.
    """

    def _canon(t: pa.Table) -> pa.Table:
        a = t["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = a != b
        a, b = a[keep], b[keep]
        return pa.table({"lo": np.minimum(a, b), "hi": np.maximum(a, b)})

    def _edge_hash(t: pa.Table) -> pa.Table:
        lo = t["lo"].to_numpy(zero_copy_only=False).astype(np.uint64)
        hi = t["hi"].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = (lo * np.uint64(0x9E3779B97F4A7C15) ^ hi) * _FNV_PRIME
        # keep 32 bits so the Sum aggregate stays inside int64 even for
        # multi-billion-edge sets (sum of 2^32-bounded values)
        h32 = (h >> np.uint64(32)).astype(np.int64)
        return pa.table({"lo": t["lo"], "hi": t["hi"], "h": pa.array(h32)})

    edges = pairs.map_batches(_canon, batch_format="pyarrow")
    prev_sig = None
    for _ in range(max_rounds):
        edges = _star_round(edges, large=True)
        edges = _star_round(edges, large=False)
        # global distinct (groupby the pair key), then two scalar probes
        edges = (
            edges.groupby(["lo", "hi"])
            .aggregate(Count(alias_name="_n"))
            .drop_columns(["_n"])
            .map_batches(_edge_hash, batch_format="pyarrow")
            .materialize()
        )
        sig = (edges.count(), edges.sum("h") if edges.count() else 0)
        edges = edges.drop_columns(["h"])
        if sig == prev_sig:
            break
        prev_sig = sig

    def _labels(t: pa.Table) -> pa.Table:
        lo = t["lo"].to_numpy(zero_copy_only=False)
        hi = t["hi"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate([hi, lo]).astype(np.int64)),
                "cluster_id": pa.array(np.concatenate([lo, lo]).astype(np.int64)),
            }
        )

    return (
        edges.map_batches(_labels, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Min("cluster_id", alias_name="cluster_id"))
    )


def dup_clusters(
    docs: Dataset,
    block_col: str = "source",
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    mode: str = "auto",
    driver_edge_bound: int = 2_000_000,
) -> Dataset:
    """Near-duplicate clusters: connected components of the Jaccard pair
    graph, labeled by the component's minimum doc id.

    Cost-based plan choice (same auto policy as
    :func:`keep_multi_member_buckets`): when the detected edge set is
    provably small (``<= driver_edge_bound``, known exactly after the
    pair stage materializes) the vectorized driver kernel labels it in
    one pass; past the bound — an adversarially dup-dense corpus — the
    labeling stays distributed via large-star/small-star rounds
    (:func:`cc_distributed`), which never materialize more than one
    edge block per task. ``mode`` forces ``"driver"`` / ``"distributed"``.
    """
    pairs_ds = jaccard_pairs(
        docs, block_col=block_col, threshold=threshold,
        text_col=text_col, id_col=id_col,
    ).select_columns(["id_a", "id_b"])
    return cc_pairs(pairs_ds, mode=mode, driver_edge_bound=driver_edge_bound)


def cc_pairs(
    pairs_ds: Dataset,
    mode: str = "auto",
    driver_edge_bound: int = 2_000_000,
) -> Dataset:
    """Connected components of an (id_a, id_b) edge Dataset with the
    cost-based driver/distributed plan split of :func:`dup_clusters`.

    The edge count is known exactly after one ``materialize`` of the
    (already tiny relative to the corpus) pair set; ≤ the bound labels
    with the vectorized driver kernel, past it the large-star /
    small-star rounds keep everything distributed. Output:
    ``(doc_id, cluster_id)`` with cluster_id = component minimum.
    """
    import ray

    pairs_ds = pairs_ds.materialize()
    n_edges = pairs_ds.count()
    empty = pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "cluster_id": pa.array([], type=pa.int64()),
        }
    )
    if n_edges == 0:
        return _ray_from_arrow(empty)
    if mode == "distributed" or (mode == "auto" and n_edges > driver_edge_bound):
        return cc_distributed(pairs_ds)
    blocks = [t for t in ray.get(pairs_ds.to_arrow_refs()) if len(t)]
    out = connected_components(pa.concat_tables(blocks).to_pandas())
    return _ray_from_arrow(table_from_pandas(out))


# ------------------------------------------------- exact duplicated spans


def dup_ngram_stats(
    docs: Dataset,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
) -> Dataset:
    """Exact duplicated k-gram span statistics per document.

    The hash-groupby rendering of exact substring dedup ("Deduplicating
    Training Data Makes Language Models Better", Lee et al. 2021 — there
    via suffix arrays; the distributed-scalable variant exchanges
    (gram-hash, doc) pairs instead): a k-gram counts as duplicated when
    it occurs in >= 2 distinct documents. Output per document (only
    documents with at least one valid k-gram, i.e. >= k tokens):

        total_grams     all k-gram positions (with multiplicity)
        distinct_grams  distinct k-gram hashes in the doc
        dup_grams       distinct k-grams shared with another doc

    Plan: one map_batches emits per-doc DISTINCT (gram, doc) pairs (the
    per-doc dedup bounds the exchange by distinct grams, not positions);
    the pairs co-partition on a Fibonacci hash of the gram so each gram
    lives wholly in one partition, and in-partition dup counting is one
    vectorized pandas pass (no per-gram groups); bounded per-doc partials
    merge in a doc-sized groupby Sum; a left equi-join stitches totals.
    Gram hashes are the minhash shingle mix (FNV-1a token hashes, Horner
    base 1000003, uint64 wrap) so the SQL twin matches bit-for-bit.
    """
    from ray.data.aggregate import Max, Sum

    if num_partitions is None:
        # size the gram exchange from the input text bytes (the pair
        # table is ~token-count-proportional; same policy as the joins)
        from .spatial import auto_num_partitions

        num_partitions = auto_num_partitions(docs, docs)

    def _grams(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy()
        texts = batch[text_col].to_pylist()
        empty = pa.table(
            {
                id_col: pa.array([], type=pa.int64()),
                "g": pa.array([], type=pa.int64()),
                "tot": pa.array([], type=pa.int64()),
            }
        )
        if not texts:
            return empty
        # ONE flat pass over the whole batch: hash every token once,
        # Horner-mix over the flat array, then drop grams that straddle
        # a document boundary — no per-doc Python loop.
        tok_lists = [(t or "").split(" ") for t in texts]
        counts = np.array([len(t) for t in tok_lists], dtype=np.int64)
        flat = np.array(
            [tok for lst in tok_lists for tok in lst], dtype=f"S{_TOKEN_BYTES}"
        )
        th = _token_hash_matrix(flat)
        if len(th) < k:
            return empty
        ng_flat = len(th) - k + 1
        with np.errstate(over="ignore"):
            mix = th[:ng_flat].copy()
            for j in range(1, k):
                mix = mix * _MIX + th[j : ng_flat + j]
        doc_of = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
        same_doc = doc_of[:ng_flat] == doc_of[k - 1 :]
        gdoc = doc_of[:ng_flat][same_doc]
        gval = mix[same_doc].view(np.int64)
        if not len(gdoc):
            return empty
        # per-doc distinct (doc, gram) pairs via one lexsort
        order = np.lexsort((gval, gdoc))
        sd, sv = gdoc[order], gval[order]
        first = np.empty(len(sd), dtype=bool)
        first[0] = True
        first[1:] = (sd[1:] != sd[:-1]) | (sv[1:] != sv[:-1])
        tot_per_doc = np.maximum(counts - k + 1, 0)
        return pa.table(
            {
                id_col: pa.array(ids[sd[first]]),
                "g": pa.array(sv[first]),
                "tot": pa.array(tot_per_doc[sd[first]]),
            }
        )

    fib = np.uint64(0x9E3779B97F4A7C15)
    nparts = int(num_partitions)

    def _bucket(batch: pa.Table) -> pa.Table:
        g = batch["g"].to_numpy().astype(np.uint64)
        with np.errstate(over="ignore"):
            gp = ((g * fib) >> np.uint64(40)).astype(np.int64) % nparts
        return batch.append_column("_gp", pa.array(gp))

    def _partials(group: pd.DataFrame) -> pa.Table:
        """Per-doc partials from one gram partition: every gram lives
        wholly here, so per-partition distinct/dup counts SUM to the
        global ones and tot (per-doc constant) merges by Max — all
        three aggregates ride ONE exchange, pairs are computed once,
        and no join is needed.

        Returns a TYPED Arrow table even for the empty groups Ray's
        range-split hands in: schema-less empty pandas blocks poison
        the downstream aggregate into a schema-unification slow path
        (measured 12-27 s instead of ~2 s for the same 38k rows at
        sf0.1) besides the 'Failed to hash the schemas' warnings."""
        schema = {
            id_col: pa.int64(),
            "tot": pa.int64(),
            "distinct_grams": pa.int64(),
            "dup_grams": pa.int64(),
        }
        if not len(group):
            return pa.table({c: pa.array([], type=t) for c, t in schema.items()})
        sizes = group.groupby("g")["g"].transform("size")
        agg = group.assign(_dup=(sizes >= 2).astype(np.int64)).groupby(id_col).agg(
            tot=("tot", "max"),
            distinct_grams=("g", "size"),
            dup_grams=("_dup", "sum"),
        )
        out = agg.reset_index().astype(np.int64)
        return table_from_pandas(out).cast(
            pa.schema(schema)
        )

    return (
        docs.map_batches(_grams, batch_format="pyarrow")
        .map_batches(_bucket, batch_format="pyarrow")
        .groupby("_gp")
        .map_groups(_partials, batch_format="pandas")
        .groupby(id_col)
        .aggregate(
            Max("tot", alias_name="total_grams"),
            Sum("distinct_grams", alias_name="distinct_grams"),
            Sum("dup_grams", alias_name="dup_grams"),
        )
    )


def winnow_fingerprints(
    docs: Dataset,
    k: int = 4,
    window: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """Winnowing document fingerprints (Schleimer et al. 2003, MOSS).

    Each document's k-gram hash sequence slides a ``window``; the
    minimum hash of every window position is selected, and the DISTINCT
    selected values form the fingerprint set — the guarantee is that
    any shared substring of length >= window + k - 1 tokens yields a
    shared fingerprint. Row-local (one pass per doc, vectorized
    sliding-window minimum via stride tricks); output rows
    ``(doc_id, fp)`` sorted within doc by fp.

    Gram hashes are the engine-standard shingle mix, so the SQL twin is
    a MIN() window frame over the same Horner chain.
    """
    if window < 1:
        raise ValueError("window must be >= 1")

    def _fps(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy()
        texts = batch[text_col].to_pylist()
        out_ids, out_fp = [], []
        for i, t in enumerate(texts):
            th = _token_hashes(t or "")
            if len(th) < k:
                continue
            n = len(th) - k + 1
            with np.errstate(over="ignore"):
                mix = th[:n].copy()
                for j in range(1, k):
                    mix = mix * _MIX + th[j : n + j]
            w = min(window, n)
            wins = np.lib.stride_tricks.sliding_window_view(mix, w)
            sel = np.unique(wins.min(axis=1))
            out_ids.append(np.full(len(sel), ids[i], dtype=np.int64))
            out_fp.append(sel.view(np.int64))
        if not out_ids:
            e = pa.array([], type=pa.int64())
            return pa.table({id_col: e, "fp": e})
        return pa.table(
            {
                id_col: pa.array(np.concatenate(out_ids)),
                "fp": pa.array(np.concatenate(out_fp)),
            }
        )

    return docs.map_batches(_fps, batch_format="pyarrow")


# ------------------------------------------------- chunk dedup + rewrite


def chunk_dedup_rewrite(
    docs: Dataset,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
) -> Dataset:
    """Corpus-wide first-wins chunk dedup with in-place document rewrite
    (the C4 recipe's "discard repeated spans" step at fixed-chunk
    granularity): every document splits into consecutive ``k``-token
    chunks, a chunk occurrence survives iff it is the globally FIRST
    occurrence of that chunk text (minimum ``doc_id * 2^20 + chunk_no``),
    and each document is reassembled from its surviving chunks in order.

    Output per input document (every doc appears, even fully-deduped
    ones): ``(doc_id, text, n_kept, n_dropped)``.

    Plan: one chunk-keyed exchange (rows co-partition on an md5-prefix
    hash of the chunk text, so each distinct chunk lives wholly in one
    partition and the winner filter is a vectorized in-partition
    transform-min) followed by one doc-keyed, output-sized exchange
    that stitches surviving chunks back into documents; per-doc marker
    rows bypass the chunk exchange and carry the total chunk count, so
    fully-deduplicated documents still emit a row. Nothing driver-side,
    both exchanges bounded by corpus token count.
    """
    from .groups import typed_groups
    from .spatial import _cell_partition, auto_num_partitions

    if k <= 0:
        raise ValueError("k must be positive")
    if num_partitions is None:
        num_partitions = auto_num_partitions(docs, docs)
    nparts = int(num_partitions)
    merge_parts = min(64, nparts)
    base = docs.select_columns([id_col, text_col])

    def _explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy()
        texts = batch[text_col].to_pylist()
        out_id, out_no, out_tx = [], [], []
        for i, t in enumerate(texts):
            toks = (t or "").split(" ")
            for j in range(0, (len(toks) + k - 1) // k):
                out_id.append(ids[i])
                out_no.append(j)
                out_tx.append(" ".join(toks[j * k : (j + 1) * k]))
        part = np.array(
            [
                int.from_bytes(hashlib.md5(c.encode("utf-8")).digest()[:8], "big")
                for c in out_tx
            ],
            dtype=np.uint64,
        ).astype(np.int64, copy=False) & np.int64(0x7FFFFFFFFFFFFFFF)
        return pa.table(
            {
                "_p": pa.array(_cell_partition(part, nparts)),
                id_col: pa.array(out_id, type=pa.int64()),
                "chunk_no": pa.array(out_no, type=pa.int64()),
                "chunk": pa.array(out_tx, type=pa.string()),
            }
        )

    kept_schema = {
        id_col: pa.int64(),
        "chunk_no": pa.int64(),
        "chunk": pa.string(),
        "nc": pa.int64(),
    }

    @typed_groups(kept_schema)
    def _winners(group):
        df = group.select([id_col, "chunk_no", "chunk"]).to_pandas()
        packed = df[id_col].to_numpy() * np.int64(1 << 20) + df["chunk_no"].to_numpy()
        df["_packed"] = packed
        keep = df["_packed"] == df.groupby("chunk")["_packed"].transform("min")
        out = df.loc[keep, [id_col, "chunk_no", "chunk"]].copy()
        out["nc"] = np.int64(0)
        return out

    def _markers(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy()
        texts = batch[text_col].to_pylist()
        nc = np.array(
            [((len((t or "").split(" ")) + k - 1) // k) for t in texts],
            dtype=np.int64,
        )
        return pa.table(
            {
                id_col: pa.array(ids),
                "chunk_no": pa.array(np.full(len(ids), -1, dtype=np.int64)),
                "chunk": pa.array([""] * len(ids), type=pa.string()),
                "nc": pa.array(nc),
            }
        )

    def _tag_doc(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_p2", pa.array(_cell_partition(batch[id_col].to_numpy(), merge_parts))
        )

    out_schema = {
        id_col: pa.int64(),
        text_col: pa.string(),
        "n_kept": pa.int64(),
        "n_dropped": pa.int64(),
    }

    @typed_groups(out_schema)
    def _reassemble(group):
        df = group.select([id_col, "chunk_no", "chunk", "nc"]).to_pandas()
        marks = df[df["chunk_no"] < 0]
        chunks = df[df["chunk_no"] >= 0].sort_values([id_col, "chunk_no"])
        joined = chunks.groupby(id_col)["chunk"].agg(" ".join)
        kept = chunks.groupby(id_col)["chunk"].size()
        out = marks[[id_col, "nc"]].copy()
        out[text_col] = out[id_col].map(joined).fillna("")
        out["n_kept"] = out[id_col].map(kept).fillna(0).astype(np.int64)
        out["n_dropped"] = out["nc"] - out["n_kept"]
        return out[[id_col, text_col, "n_kept", "n_dropped"]]

    kept = (
        base.map_batches(_explode, batch_format="pyarrow")
        .groupby("_p")
        .map_groups(_winners, batch_format="pyarrow")
    )
    markers = base.map_batches(_markers, batch_format="pyarrow")
    return (
        kept.union(markers)
        .map_batches(_tag_doc, batch_format="pyarrow")
        .groupby("_p2")
        .map_groups(_reassemble, batch_format="pyarrow")
    )


def levenshtein_small(a: str, b: str) -> int:
    """Exact Levenshtein distance (two-row DP; shared with the SQL
    twin's ``levenshtein``). Used on CANDIDATE pairs only — volume is
    bounded by the deletion-key collision count, never the corpus."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def deletion_neighborhood_pairs(
    strings: Dataset,
    col: str,
) -> Dataset:
    """FastSS deletion-neighborhood join: candidate string pairs whose
    1-deletion neighborhoods intersect, with exact edit distance.

    The typo-level near-dup family (titles / queries / scene names —
    strings short enough that one edit matters): every DISTINCT string
    emits its identity plus its ``len(s)`` one-character deletions as
    keys (vectorized per length class: one byte matrix + len(s) column
    drops, no per-string Python loop), candidates co-partition on the
    key, pairs dedup on one more bounded exchange, and the verify
    computes exact Levenshtein per candidate pair (pair-volume bounded).
    Two distinct strings share a deletion key iff they differ by one
    substitution, insertion or deletion — OR collide coincidentally
    (e.g. 'ab'/'ba'), which is why the exact distance column exists;
    filter ``dist <= 1`` downstream for the strict predicate.

    Output: (name_a, name_b, dist), name_a < name_b, one row per pair.
    """
    from .groups import typed_groups

    def _distinct(batch: pa.Table) -> pa.Table:
        u = np.unique(np.asarray(batch[col]).astype(object))
        return pa.table({"s": pa.array(u, pa.string())})

    def _keys(batch: pa.Table) -> pa.Table:
        ss = np.asarray(batch["s"]).astype(object)
        out_s: list = []
        out_k: list = []
        for length in np.unique([len(s) for s in ss]):
            group = np.array([s for s in ss if len(s) == length], dtype=object)
            if length == 0:
                out_s.extend(group)
                out_k.extend(group)
                continue
            mat = (
                np.frombuffer("".join(group).encode("utf-8"), dtype=np.uint8)
                .reshape(len(group), int(length))
            )  # scene names / tokens are ASCII; non-ASCII would need codepoints
            keys = [group]  # identity key
            step = int(length) - 1
            for i in range(int(length)):
                dele = np.delete(mat, i, axis=1)
                if step == 0:
                    keys.append(np.full(len(group), "", dtype=object))
                else:
                    keys.append(
                        np.char.decode(
                            dele.view(np.dtype(("S", step))).ravel(), "utf-8"
                        ).astype(object)
                    )
            ks = np.concatenate(keys)
            srep = np.concatenate([group] * (int(length) + 1))
            # per-string DISTINCT keys (repeated chars collapse)
            df = pd.DataFrame({"s": srep, "k": ks}).drop_duplicates()
            out_s.extend(df["s"].tolist())
            out_k.extend(df["k"].tolist())
        return pa.table({"s": pa.array(out_s, pa.string()),
                         "k": pa.array(out_k, pa.string())})

    @typed_groups({"name_a": pa.string(), "name_b": pa.string()})
    def _pairs(tab: pa.Table) -> pa.Table:
        ss = sorted(set(np.asarray(tab["s"]).astype(object)))
        if len(ss) < 2:
            return pa.table({"name_a": pa.array([], pa.string()),
                             "name_b": pa.array([], pa.string())})
        pairs = list(combinations(ss, 2))
        return pa.table({"name_a": pa.array([p[0] for p in pairs]),
                         "name_b": pa.array([p[1] for p in pairs])})

    def _verify(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch["name_a"]).astype(object)
        b = np.asarray(batch["name_b"]).astype(object)
        dist = np.fromiter(
            (levenshtein_small(x, y) for x, y in zip(a, b)),
            dtype=np.int64, count=len(a),
        )
        return pa.table({"name_a": batch["name_a"], "name_b": batch["name_b"],
                         "dist": pa.array(dist)})

    # distinct strings via a C++ hash aggregate (no per-group UDF calls)
    distinct = (
        strings.select_columns([col])
        .map_batches(_distinct, batch_format="pyarrow")
        .groupby("s")
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
    )
    keys = distinct.map_batches(_keys, batch_format="pyarrow").materialize()
    # deletion-key buckets are overwhelmingly singletons — prefilter
    # them so the per-group pair emitter only sees real candidates
    cand_rows = keep_multi_member_buckets(keys, ("k",))
    pairs = cand_rows.groupby("k").map_groups(_pairs, batch_format="pyarrow")
    distinct_pairs = (
        pairs.groupby(["name_a", "name_b"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
    )
    return distinct_pairs.map_batches(_verify, batch_format="pyarrow")
