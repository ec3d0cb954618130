"""Graph stages over edge Datasets: triangle counting.

Companion to the connected-components rounds in
``dedup_text.cc_distributed`` — the near-dup pair graph is the engine's
native edge set (dup clusters, co-occurrence). Triangle counts per node
are the clustering-coefficient numerator, the standard diagnostic for
"is this dup cluster a clique or a chain".

Plan (the classic degree-oriented wedge join — compact-forward):
orient every undirected edge from its (degree, id)-smaller endpoint to
the larger, so each triangle {x ≺ y ≺ z} is counted exactly once as a
wedge (x→y, x→z) closed by the oriented edge (y→z). Degree ordering
bounds every oriented out-degree by O(sqrt(m)) on any graph, which
bounds the wedge volume — the reason this plan survives skewed dup
cliques where a naive node-iterator explodes.

Scale shape: degrees are one bounded groupby over edge endpoints
(node-count rows); orientation is row-local against the broadcast
degree map (node-count ints — the dup-graph node set is pair-volume
sized, the same broadcast bound the CC driver kernel documents);
wedge emission is a per-source co-partition with the singleton
prefilter (sources with out-degree 1 cannot form wedges); closure is a
vectorized ``np.isin`` membership probe against the broadcast packed
edge set. Per-node counts fold per batch before one final
vocabulary-sized groupby-Sum.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset
from ray.data.aggregate import Sum

from . import table_from_pandas

_SHIFT = np.int64(1) << np.int64(32)


def _pack(u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """(u, v) int32-ranged pairs → one sortable int64 key."""
    return u * _SHIFT + v


def triangle_counts(
    edges: Dataset,
    a_col: str = "id_a",
    b_col: str = "id_b",
    out_col: str = "doc_id",
) -> Dataset:
    """Per-node triangle counts over an undirected simple edge set.

    ``edges`` must hold each undirected edge once (``a < b`` rows, int
    ids below 2^32 — the pair-emitting dedup stages guarantee both).
    Output: ``(out_col, n_tri)`` for every node in >= 1 triangle.
    """
    import ray

    from .dedup_text import keep_multi_member_buckets
    from .groups import typed_groups

    edges = edges.select_columns([a_col, b_col]).materialize()

    # --- degrees: one bounded exchange over endpoints -------------------
    def _deg_partial(batch: pa.Table) -> pa.Table:
        ids = np.concatenate(
            [batch[a_col].to_numpy(), batch[b_col].to_numpy()]
        ).astype(np.int64)
        u, c = np.unique(ids, return_counts=True)
        return pa.table({"id": pa.array(u), "d": pa.array(c.astype(np.int64))})

    deg_rows = (
        edges.map_batches(_deg_partial, batch_format="pyarrow")
        .groupby("id")
        .aggregate(Sum("d", alias_name="d"))
        .take_all()
    )  # node set is pair-volume bounded (documented broadcast contract)
    node_ids = np.array([r["id"] for r in deg_rows], dtype=np.int64)
    node_deg = np.array([r["d"] for r in deg_rows], dtype=np.int64)
    order = np.argsort(node_ids)
    node_ids, node_deg = node_ids[order], node_deg[order]
    deg_ref = ray.put((node_ids, node_deg))

    # --- orientation: row-local against the broadcast degrees -----------
    def _orient(batch: pa.Table) -> pa.Table:
        ids, degs = ray.get(deg_ref)
        a = batch[a_col].to_numpy().astype(np.int64)
        b = batch[b_col].to_numpy().astype(np.int64)
        da = degs[np.searchsorted(ids, a)]
        db = degs[np.searchsorted(ids, b)]
        fwd = (da < db) | ((da == db) & (a < b))
        u = np.where(fwd, a, b)
        v = np.where(fwd, b, a)
        dv = np.where(fwd, db, da)
        return pa.table(
            {"u": pa.array(u), "v": pa.array(v), "dv": pa.array(dv)}
        )

    oriented = edges.map_batches(_orient, batch_format="pyarrow").materialize()

    # --- broadcast packed edge set for the closure probe -----------------
    packed_blocks = [
        np.sort(_pack(t["u"].to_numpy().astype(np.int64),
                      t["v"].to_numpy().astype(np.int64)))
        for t in ray.get(oriented.to_arrow_refs())
        if len(t)
    ]
    packed = (
        np.sort(np.concatenate(packed_blocks))
        if packed_blocks
        else np.zeros(0, dtype=np.int64)
    )
    edge_ref = ray.put(packed)

    # --- wedges per source (singleton sources pruned), closed inline ----
    # sources hash-bucket into ~num_cpus partitions so the closure runs
    # as ONE vectorized pass per bucket (a per-u map_groups costs a
    # pandas conversion per source — seconds at 10^3+ multi-out-degree
    # sources; the bucketed pass amortizes it to one probe per bucket)
    wedge_src = keep_multi_member_buckets(oriented, ("u",))

    def _bucket(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy().astype(np.int64)
        return batch.append_column(
            "_p", pa.array(((u * 2654435761) % (1 << 32)) % 64)
        )

    @typed_groups({"x": pa.int64(), "y": pa.int64(), "z": pa.int64()})
    def _close(tab: pa.Table) -> pa.Table:
        df = tab.to_pandas().sort_values(["u", "dv", "v"], ignore_index=True)
        u = df["u"].to_numpy().astype(np.int64)
        v = df["v"].to_numpy().astype(np.int64)
        # run boundaries per source
        starts = np.flatnonzero(np.concatenate([[True], u[1:] != u[:-1]]))
        lens = np.diff(np.append(starts, len(u)))
        counts = lens * (lens - 1) // 2
        total = int(counts.sum())
        if total == 0:
            return pa.table({"x": pa.array([], pa.int64()),
                             "y": pa.array([], pa.int64()),
                             "z": pa.array([], pa.int64())})
        # unrank wedge pairs per run without a per-pair loop: for each
        # run, pair t-th corresponds to (i, j) in the triangular order
        # i ascending, j>i — generated run-by-run with numpy slices
        xs = np.empty(total, dtype=np.int64)
        ys = np.empty(total, dtype=np.int64)
        zs = np.empty(total, dtype=np.int64)
        off = 0
        for s, L, c in zip(starts, lens, counts):
            if c == 0:
                continue
            iu, ju = np.triu_indices(int(L), k=1)
            xs[off:off + c] = u[s]
            ys[off:off + c] = v[s + iu]
            zs[off:off + c] = v[s + ju]
            off += int(c)
        keys = _pack(ys, zs)
        packed = ray.get(edge_ref)  # sorted — probe, don't isin
        pos = np.searchsorted(packed, keys)
        pos_c = np.minimum(pos, max(len(packed) - 1, 0))
        hit = (
            (packed[pos_c] == keys) if len(packed) else np.zeros(total, bool)
        )
        return pa.table({"x": pa.array(xs[hit]), "y": pa.array(ys[hit]),
                         "z": pa.array(zs[hit])})

    triangles = (
        wedge_src.map_batches(_bucket, batch_format="pyarrow")
        .groupby("_p")
        .map_groups(_close, batch_format="pyarrow")
    )

    # --- per-node fold + final bounded groupby ---------------------------
    def _node_partial(batch: pa.Table) -> pa.Table:
        ids = np.concatenate(
            [batch["x"].to_numpy(), batch["y"].to_numpy(), batch["z"].to_numpy()]
        ).astype(np.int64)
        u, c = np.unique(ids, return_counts=True)
        return pa.table(
            {out_col: pa.array(u), "n_tri": pa.array(c.astype(np.int64))}
        )

    return (
        triangles.map_batches(_node_partial, batch_format="pyarrow")
        .groupby(out_col)
        .aggregate(Sum("n_tri", alias_name="n_tri"))
    )


def clustering_coefficients(
    edges: Dataset,
    a_col: str = "id_a",
    b_col: str = "id_b",
    out_col: str = "doc_id",
) -> Dataset:
    """Local clustering coefficient per node: ``2·tri / (d·(d-1))``.

    Composes :func:`triangle_counts` with the same bounded degree
    aggregate; nodes with degree >= 2 are emitted (zero triangles →
    cc = 0.0), so the output is the node set of the dup graph minus
    leaves. The coefficient is one exact-int ratio in one double
    division — bit-exact against the SQL twin.
    """
    import ray

    tri = {
        r[out_col]: int(r["n_tri"])
        for r in triangle_counts(edges, a_col, b_col, out_col).take_all()
    }  # bounded: nodes in triangles (pair-volume contract)
    tri_ref = ray.put(tri)

    def _deg_partial(batch: pa.Table) -> pa.Table:
        ids = np.concatenate(
            [batch[a_col].to_numpy(), batch[b_col].to_numpy()]
        ).astype(np.int64)
        u, c = np.unique(ids, return_counts=True)
        return pa.table({out_col: pa.array(u), "d": pa.array(c.astype(np.int64))})

    degrees = (
        edges.select_columns([a_col, b_col])
        .map_batches(_deg_partial, batch_format="pyarrow")
        .groupby(out_col)
        .aggregate(Sum("d", alias_name="d"))
    )

    def _cc(batch: pa.Table) -> pa.Table:
        tri_map = ray.get(tri_ref)
        ids = batch[out_col].to_numpy().astype(np.int64)
        d = batch["d"].to_numpy().astype(np.int64)
        keep = d >= 2
        ids, d = ids[keep], d[keep]
        t = np.array([tri_map.get(int(i), 0) for i in ids], dtype=np.int64)
        cc = (2 * t).astype(np.float64) / (d * (d - 1)).astype(np.float64)
        return pa.table(
            {
                out_col: pa.array(ids),
                "d": pa.array(d),
                "n_tri": pa.array(t),
                "cc": pa.array(cc),
            }
        )

    return degrees.map_batches(_cc, batch_format="pyarrow")


def pagerank_int(
    edges: Dataset,
    iters: int = 3,
    damping_pct: int = 85,
    scale: int = 1_000_000,
    a_col: str = "id_a",
    b_col: str = "id_b",
    out_col: str = "doc_id",
) -> Dataset:
    """PageRank over an undirected edge set in EXACT fixed-point integers.

    The iterative-algorithm representative: float power iteration is
    partition-order dependent (sums of doubles), so ranks are kept in
    integer micro-units and every update is integer arithmetic —
    ``contrib(j) = pr(j) // deg(j)``, ``pr'(i) = (100 - d)·scale // 100
    + d · Σ contrib // 100`` — making the result independent of block
    order, cluster size AND engine (the SQL twin unrolls the same
    iterations as chained CTEs, bit-for-bit).

    Scale shape per iteration: ranks are a node-count-bounded broadcast
    (the dup-graph contract shared with :func:`triangle_counts`);
    contributions fold per batch over the edge Dataset and merge in one
    bounded groupby-Sum. Dangling nodes cannot exist (every node is an
    edge endpoint). O(iters) passes over edges — the documented cost.
    """
    import ray

    if iters < 0 or not 0 <= damping_pct <= 100:
        raise ValueError("bad iters/damping")
    edges = edges.select_columns([a_col, b_col]).materialize()

    def _deg_partial(batch: pa.Table) -> pa.Table:
        ids = np.concatenate(
            [batch[a_col].to_numpy(), batch[b_col].to_numpy()]
        ).astype(np.int64)
        u, c = np.unique(ids, return_counts=True)
        return pa.table({"id": pa.array(u), "d": pa.array(c.astype(np.int64))})

    deg_rows = (
        edges.map_batches(_deg_partial, batch_format="pyarrow")
        .groupby("id")
        .aggregate(Sum("d", alias_name="d"))
        .take_all()
    )
    ids = np.sort(np.array([r["id"] for r in deg_rows], dtype=np.int64))
    deg = np.empty(len(ids), dtype=np.int64)
    for r in deg_rows:
        deg[np.searchsorted(ids, r["id"])] = r["d"]

    base = (100 - damping_pct) * scale // 100
    pr = np.full(len(ids), scale, dtype=np.int64)

    for _ in range(iters):
        state_ref = ray.put((ids, pr // deg))  # per-node contribution

        def _contrib(batch: pa.Table) -> pa.Table:
            nids, c = ray.get(state_ref)
            a = batch[a_col].to_numpy().astype(np.int64)
            b = batch[b_col].to_numpy().astype(np.int64)
            dst = np.concatenate([b, a])  # undirected: both directions
            src = np.concatenate([a, b])
            w = c[np.searchsorted(nids, src)]
            u, inv = np.unique(dst, return_inverse=True)
            s = np.bincount(inv, weights=w, minlength=len(u)).astype(np.int64)
            return pa.table({"id": pa.array(u), "s": pa.array(s)})

        inc_rows = (
            edges.map_batches(_contrib, batch_format="pyarrow")
            .groupby("id")
            .aggregate(Sum("s", alias_name="s"))
            .take_all()
        )
        inc = np.zeros(len(ids), dtype=np.int64)
        for r in inc_rows:
            inc[np.searchsorted(ids, r["id"])] = r["s"]
        pr = base + damping_pct * inc // 100

    import ray.data

    return ray.data.from_arrow(
        pa.table({out_col: pa.array(ids), "pr": pa.array(pr)})
    )


def kcore(
    edges: Dataset,
    k: int = 3,
    a_col: str = "id_a",
    b_col: str = "id_b",
    out_col: str = "doc_id",
    mode: str = "auto",
    driver_edge_bound: int = 2_000_000,
    max_rounds: int = 60,
) -> Dataset:
    """k-core membership + in-core degree by iterative peeling.

    The k-core is the maximal subgraph where every node keeps degree
    >= k — the standard "dense kernel" extractor over the near-dup pair
    graph (a chainy false-positive cluster peels away, a true duplicate
    clique survives). Output: ``(out_col, core_deg)`` for every core
    node, ``core_deg`` = its degree inside the core (deterministic —
    the k-core is unique, so no tie-breaking enters the result).

    Cost-based like ``dedup_text.dup_clusters``: an edge set that is
    provably small (``<= driver_edge_bound``, known exactly after the
    pair stage) peels in one vectorized driver kernel (rounds of
    bincount over a compacted index — O(m) per round, rounds = peel
    depth); a larger set runs the distributed plan — per round ONE
    degree groupby over the directed live edge set plus ONE semi join
    dropping edges whose TARGET was peeled (sufficient: see the inline
    proof at the peel loop), with convergence probed by two driver
    scalars (live-node count, live-edge count). Nothing node- or
    corpus-sized ever reaches the driver on that path.
    """
    import ray

    from pyrosar_ray.stages import physical_select
    from pyrosar_ray.stages.join import equi_join

    n_edges = edges.count()
    use_driver = mode == "driver" or (mode == "auto" and n_edges <= driver_edge_bound)
    empty = pa.table(
        {out_col: pa.array([], type=pa.int64()),
         "core_deg": pa.array([], type=pa.int64())}
    )
    if n_edges == 0:
        return ray.data.from_arrow(empty)

    if use_driver:
        from pyrosar_ray.stages import collect_arrow

        t = collect_arrow(
            edges.select_columns([a_col, b_col]),
            empty_schema={a_col: pa.int64(), b_col: pa.int64()},
        )
        a = t[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
        nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
        ui, vi = inv[: len(a)], inv[len(a):]
        alive_edge = np.ones(len(a), dtype=bool)
        alive_node = np.ones(len(nodes), dtype=bool)
        for _ in range(max_rounds):
            deg = np.bincount(ui[alive_edge], minlength=len(nodes)) + np.bincount(
                vi[alive_edge], minlength=len(nodes)
            )
            peel = alive_node & (deg < k)
            if not peel.any():
                break
            alive_node &= ~peel
            alive_edge &= alive_node[ui] & alive_node[vi]
        deg = np.bincount(ui[alive_edge], minlength=len(nodes)) + np.bincount(
            vi[alive_edge], minlength=len(nodes)
        )
        keep = alive_node & (deg >= k)
        out = pa.table(
            {out_col: pa.array(nodes[keep]),
             "core_deg": pa.array(deg[keep].astype(np.int64))}
        )
        return ray.data.from_arrow(out if len(out) else empty)

    # distributed peel: live edges / live nodes as Datasets only
    def _dir(batch: pa.Table) -> pa.Table:
        u = batch[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"u": np.concatenate([u, v]), "v": np.concatenate([v, u])}
        )

    def _deg_partial(batch: pa.Table) -> pa.Table:
        keys, counts = np.unique(batch["u"].to_numpy(), return_counts=True)
        return pa.table({"u": keys, "d": counts.astype(np.int64)})

    # Edges store DIRECTED (both orientations, 2|E| rows, built once)
    # so each peel round pays TWO exchanges, not three: one degree
    # groupby + ONE semi join filtering on TARGET-alive alone. That
    # single filter is sufficient: a dead node's out-edges linger, but
    # they only feed ITS OWN degree recount — which stays < k forever,
    # because its alive-target set can only shrink — while no live
    # node's degree ever counts a dead neighbor (the edge pointing AT
    # the dead node is exactly what the target filter drops). The
    # lingering rows cost bounded extra volume (≤ the dead fraction of
    # the original edge set) and never correctness; the final d >= k
    # filter excludes the dead sources from the output.
    live = (
        edges.select_columns([a_col, b_col])
        .map_batches(_dir, batch_format="pyarrow")
        .materialize()
    )
    from pyrosar_ray.stages.agg import keyed_sum

    prev = (None, None)
    for _ in range(max_rounds):
        # keyed_sum, not groupby().aggregate(): once the semi join has
        # hash-scattered edges by target, per-block degree partials
        # stop compressing (every block sees nearly the full node set)
        # and Ray's sort-based aggregate pays a full sort of ~|V|·blocks
        # partial rows — measured 19 s vs 1.5 s per round at 10M
        # directed edges. The partition-domain exchange does the same
        # exact sums on the 64-value domain.
        deg = keyed_sum(
            live.map_batches(_deg_partial, batch_format="pyarrow"),
            "u", ["d"],
        )
        alive = physical_select(
            deg.filter(expr=f"d >= {k}"), ["u"]
        ).materialize()
        sig = (alive.count(), live.count())
        if sig[0] == 0:
            # every node peeled: the k-core is empty (also guards the
            # semi join below — an empty map_batches output has no
            # schema for equi_join to plan from)
            return ray.data.from_arrow(empty)
        if sig == prev:
            break
        prev = sig
        from pyrosar_ray.stages import drop_empty_blocks

        # drop the exchange's 0-column empty boundary blocks before the
        # next round's degree groupby (see drop_empty_blocks: they cost
        # a measured 15x on the following exchange)
        live = drop_empty_blocks(
            physical_select(
                equi_join(live, alive, on="v", right_on="u", how="semi"),
                ["u", "v"],
            ).materialize()
        )
    if live.count() == 0:
        return ray.data.from_arrow(empty)

    def _rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {out_col: batch["u"], "core_deg": batch["d"]}
        )

    # Re-check d >= k on the final aggregate: it excludes the lingering
    # dead sources above, and (mirroring the driver path's
    # `keep = alive_node & (deg >= k)`) guards a run that exhausted
    # max_rounds without converging from silently emitting nodes whose
    # degree fell below k in the last unprocessed round.
    return (
        keyed_sum(
            live.map_batches(_deg_partial, batch_format="pyarrow"),
            "u", ["d"],
        )
        .filter(expr=f"d >= {k}")
        .map_batches(_rename, batch_format="pyarrow")
    )
