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
