"""Triangle counting (stages/graph.py)."""

import itertools

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from pyrosar_ray.stages.graph import triangle_counts


def _edges_ds(edges):
    a = np.array([e[0] for e in edges], dtype=np.int64)
    b = np.array([e[1] for e in edges], dtype=np.int64)
    return ray.data.from_arrow(
        pa.table({"id_a": pa.array(np.minimum(a, b)),
                  "id_b": pa.array(np.maximum(a, b))})
    ).repartition(3)


def _reference(edges):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts = {}
    for x, y, z in itertools.combinations(sorted(adj), 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            for n in (x, y, z):
                counts[n] = counts.get(n, 0) + 1
    return counts


def test_triangle_counts_known_graphs():
    # K4 (every node in C(3,2)=3 triangles) + a chain + an isolated edge
    k4 = list(itertools.combinations([10, 11, 12, 13], 2))
    chain = [(20, 21), (21, 22), (22, 23)]
    extra = [(30, 31)]
    edges = k4 + chain + extra
    out = triangle_counts(_edges_ds(edges)).to_pandas()
    got = dict(zip(out["doc_id"], out["n_tri"]))
    assert got == {10: 3, 11: 3, 12: 3, 13: 3}


def test_triangle_counts_random_vs_reference():
    rng = np.random.RandomState(7)
    raw = {tuple(sorted((int(a), int(b))))
           for a, b in rng.randint(0, 25, size=(120, 2)) if a != b}
    edges = sorted(raw)
    out = triangle_counts(_edges_ds(edges)).to_pandas()
    got = dict(zip(out["doc_id"], out["n_tri"]))
    assert got == _reference(edges)


def test_triangle_counts_no_triangles():
    out = triangle_counts(_edges_ds([(1, 2), (3, 4), (2, 3)])).to_pandas()
    assert len(out) == 0


def test_clustering_coefficients():
    from pyrosar_ray.stages.graph import clustering_coefficients

    # K4 plus a path attached at node 13
    k4 = list(itertools.combinations([10, 11, 12, 13], 2))
    edges = k4 + [(13, 20), (20, 21)]
    out = clustering_coefficients(_edges_ds(edges)).to_pandas()
    got = {int(r.doc_id): (int(r.d), int(r.n_tri), float(r.cc))
           for r in out.itertuples()}
    assert got[10] == (3, 3, 1.0)  # pure K4 member: all pairs connected
    assert got[13] == (4, 3, 0.5)  # 3 triangles of C(4,2)=6 pairs
    assert got[20] == (2, 0, 0.0)  # path middle: no triangle
    assert 21 not in got  # leaf (d=1) excluded


def test_pagerank_int_reference():
    from pyrosar_ray.stages.graph import pagerank_int

    # star: center 0 connected to 1..4
    edges = [(0, i) for i in range(1, 5)]
    out = pagerank_int(_edges_ds(edges), iters=3).to_pandas()
    got = dict(zip(out["doc_id"], out["pr"]))
    # exact integer reference (same update rule)
    pr = {n: 1_000_000 for n in range(5)}
    deg = {0: 4, 1: 1, 2: 1, 3: 1, 4: 1}
    for _ in range(3):
        contrib = {n: pr[n] // deg[n] for n in pr}
        inc = {0: sum(contrib[i] for i in range(1, 5))}
        for i in range(1, 5):
            inc[i] = contrib[0]
        pr = {n: 150_000 + 85 * inc[n] // 100 for n in pr}
    assert got == pr
    assert got[0] > got[1]  # hub outranks leaves
    assert len({got[i] for i in range(1, 5)}) == 1  # symmetric leaves
