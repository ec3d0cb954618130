"""Distributed k-means (stages/kmeans.py)."""

import numpy as np
import pandas as pd
import pytest
import ray

from pyrosar_ray.stages.kmeans import kmeans_assign, kmeans_fit


def _blobs(n_per=60, d=4, seed=1):
    rng = np.random.default_rng(seed)
    centers = np.array(
        [[10, 0, 0, 0], [0, 10, 0, 0], [0, 0, 10, 0]], dtype=np.float64
    )
    vecs, labels = [], []
    for c, center in enumerate(centers):
        vecs.append(center + rng.normal(0, 0.5, (n_per, d)))
        labels += [c] * n_per
    vecs = np.concatenate(vecs)
    order = rng.permutation(len(vecs))
    return (
        pd.DataFrame(
            {
                "vec_id": np.arange(len(vecs), dtype=np.int64)[order],
                "embedding": [v for v in vecs[order]],
            }
        ),
        vecs[order],
        np.asarray(labels)[order],
    )


def test_kmeans_recovers_separated_blobs():
    df, vecs, truth = _blobs()
    ds = ray.data.from_pandas(df).repartition(4)
    cents = kmeans_fit(ds, k=3, iters=5)
    assert cents.shape == (3, 4)
    out = kmeans_assign(ds, cents).to_pandas().sort_values("vec_id")
    df_sorted = df.sort_values("vec_id")
    labels = out["cluster"].to_numpy()
    # clusters must be pure: every true blob maps to exactly one label
    truth_sorted = truth[np.argsort(df["vec_id"].to_numpy())]
    for blob in range(3):
        got = labels[truth_sorted == blob]
        assert (got == got[0]).all()
    assert len(set(labels)) == 3


def test_kmeans_centroids_near_true_means():
    df, vecs, truth = _blobs(seed=7)
    ds = ray.data.from_pandas(df).repartition(3)
    cents = kmeans_fit(ds, k=3, iters=6)
    true_means = np.stack([vecs[truth == b].mean(axis=0) for b in range(3)])
    # each true mean is within 1.0 of some centroid (blob std 0.5)
    d = np.linalg.norm(true_means[:, None, :] - cents[None, :, :], axis=2)
    assert (d.min(axis=1) < 1.0).all()


def test_kmeans_parallel_init_matches_farthest_quality():
    df, vecs, truth = _blobs(seed=3)
    ds = ray.data.from_pandas(df).repartition(4)
    cents = kmeans_fit(ds, k=3, iters=5, init="parallel")
    true_means = np.stack([vecs[truth == b].mean(axis=0) for b in range(3)])
    d = np.linalg.norm(true_means[:, None, :] - cents[None, :, :], axis=2)
    assert (d.min(axis=1) < 1.0).all()
    # deterministic: a second fit is bit-identical
    cents2 = kmeans_fit(ds, k=3, iters=5, init="parallel")
    np.testing.assert_array_equal(cents, cents2)


def test_kmeans_parallel_init_pass_count_independent_of_k():
    """k-means‖ makes O(rounds) data passes, not O(k)."""
    from pyrosar_ray.stages import kmeans as km

    df, _, _ = _blobs(n_per=40)
    ds = ray.data.from_pandas(df).repartition(2)
    calls = {"n": 0}
    orig = km.Dataset.map_batches

    def _counting(self, *a, **kw):
        calls["n"] += 1
        return orig(self, *a, **kw)

    km.Dataset.map_batches = _counting
    try:
        kmeans_fit(ds, k=3, iters=1, init="parallel")
        small_k = calls["n"]
        calls["n"] = 0
        kmeans_fit(ds, k=12, iters=1, init="parallel")
        large_k = calls["n"]
    finally:
        km.Dataset.map_batches = orig
    assert large_k == small_k  # rounds-bound, not k-bound


def test_kmeans_validation():
    df, _, _ = _blobs(n_per=2)
    ds = ray.data.from_pandas(df)
    with pytest.raises(ValueError):
        kmeans_fit(ds, k=0)
    with pytest.raises(ValueError):
        kmeans_fit(ds, k=1000)


def test_kmeans_int_matches_local_reference_and_partition_independent():
    import pyarrow as pa

    from pyrosar_ray.stages.ann import ivf_centroids, quantize_embeddings
    from pyrosar_ray.stages.kmeans import kmeans_int

    rng = np.random.default_rng(3)
    n, dim, k = 300, 16, 4
    mat = rng.normal(size=(n, dim))
    tab = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([list(map(float, r)) for r in mat],
                              pa.list_(pa.float64())),
    })
    out = (
        kmeans_int(ray.data.from_arrow(tab).repartition(5), k=k, iters=2)
        .to_pandas().sort_values("vec_id", ignore_index=True)
    )
    # local integer reference with the identical update rule
    qe = quantize_embeddings(mat)
    cents = ivf_centroids(k, dim, seed=7)
    for _ in range(2):
        cell = np.argmax(qe @ cents.T, axis=1)
        new = cents.copy()
        for c in range(k):
            m = cell == c
            if m.sum():
                new[c] = np.array(
                    [int(s) // int(m.sum()) for s in qe[m].sum(axis=0)],
                    dtype=np.int64)
        cents = new
    want = np.argmax(qe @ cents.T, axis=1)
    assert (out["cell"].to_numpy() == want).all()
    # partition independence: different block structure, same assignment
    out2 = (
        kmeans_int(ray.data.from_arrow(tab).repartition(11), k=k, iters=2)
        .to_pandas().sort_values("vec_id", ignore_index=True)
    )
    assert (out2["cell"].to_numpy() == out["cell"].to_numpy()).all()
