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


def test_kmeans_validation():
    df, _, _ = _blobs(n_per=2)
    ds = ray.data.from_pandas(df)
    with pytest.raises(ValueError):
        kmeans_fit(ds, k=0)
    with pytest.raises(ValueError):
        kmeans_fit(ds, k=1000)
