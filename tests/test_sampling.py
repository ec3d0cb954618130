"""Deterministic sampling / quota ops (stages/sampling.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from pyrosar_ray.stages.sampling import group_cap, hash_bucket, hash_sample


def test_hash_bucket_deterministic_and_spread():
    ids = np.arange(10_000, dtype=np.int64)
    b = hash_bucket(ids)
    assert (b == hash_bucket(ids)).all()
    assert b.min() >= 0 and b.max() < 100
    # multiplicative hash spreads consecutive ids roughly uniformly
    counts = np.bincount(b, minlength=100)
    assert counts.min() > 50 and counts.max() < 200


def test_hash_bucket_is_32bit_safe():
    """ids beyond 2^32 reduce mod 2^32 first — no engine-dependent wrap."""
    small = np.array([5], dtype=np.int64)
    big = np.array([5 + (1 << 32)], dtype=np.int64)
    assert hash_bucket(small) == hash_bucket(big)


def test_hash_sample_rate_and_stability():
    df = pd.DataFrame({"doc_id": np.arange(2000, dtype=np.int64), "v": 1.0})
    out = hash_sample(ray.data.from_pandas(df).repartition(4), 10).to_pandas()
    # same kept set as a driver-side recompute
    kept = set(df["doc_id"][hash_bucket(df["doc_id"].to_numpy()) < 10])
    assert set(out["doc_id"]) == kept
    assert 100 < len(out) < 300  # ~10%
    with pytest.raises(ValueError):
        hash_sample(ray.data.from_pandas(df), 101)


def test_group_cap_keeps_smallest_ids():
    rng = np.random.default_rng(2)
    df = pd.DataFrame(
        {
            "doc_id": rng.permutation(300).astype(np.int64),
            "source": np.repeat(["a", "b", "c"], 100),
        }
    )
    out = group_cap(
        ray.data.from_pandas(df).repartition(5), cap=7
    ).to_pandas()
    exp = (
        df.sort_values("doc_id").groupby("source").head(7)
    )
    assert len(out) == 21
    for src in "abc":
        got = sorted(out[out.source == src]["doc_id"])
        want = sorted(exp[exp.source == src]["doc_id"])
        assert got == want


def test_group_cap_small_groups_pass_through():
    df = pd.DataFrame({"doc_id": [3, 1], "source": ["x", "x"]})
    out = group_cap(ray.data.from_pandas(df), cap=10).to_pandas()
    assert sorted(out["doc_id"]) == [1, 3]


def test_hash_sample_k_deterministic_min_k():
    from pyrosar_ray.stages.sampling import hash_bucket, hash_sample_k

    ids = np.arange(500, dtype=np.int64)
    df = pd.DataFrame({"doc_id": ids})
    out = hash_sample_k(ray.data.from_pandas(df).repartition(5), k=20).to_pandas()
    # reference: full hash sort driver-side
    h = ((ids.astype(np.uint64) % (1 << 32)) * np.uint64(2654435761) % (1 << 32)).astype(
        np.int64
    )
    order = np.lexsort((ids, h))[:20]
    assert out["doc_id"].tolist() == ids[order].tolist()
    assert len(out) == 20
    with pytest.raises(ValueError):
        hash_sample_k(ray.data.from_pandas(df), k=0)


def test_source_mixture_copies_and_epochs(sf_dir):
    from pyrosar_ray.stages.sampling import hash_bucket, source_mixture

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )
    weights = {f"src{n}": 1.0 + (n % 4) * 0.5 for n in range(64)}
    out = source_mixture(docs, weights).to_pandas()
    base = docs.to_pandas()
    # per-doc copy count equals floor(w) + deterministic fractional draw
    w = base["source"].str[3:].astype(int).mod(4).mul(0.5).add(1.0)
    frac_pct = ((w - np.floor(w)) * 100).round().astype(int)
    extra = hash_bucket(base["doc_id"].to_numpy() + 7919) < frac_pct
    want = (np.floor(w).astype(int) + extra).rename(None)
    got = out.groupby("doc_id").size().reindex(base["doc_id"]).fillna(0).astype(int)
    assert (got.to_numpy() == want.to_numpy()).all()
    # epochs are dense 0..copies-1 per doc
    emax = out.groupby("doc_id")["epoch"].agg(["min", "max", "count"])
    assert (emax["min"] == 0).all()
    assert (emax["max"] == emax["count"] - 1).all()
    # determinism
    out2 = source_mixture(docs, weights).to_pandas()
    key = ["doc_id", "epoch"]
    pd.testing.assert_frame_equal(
        out.sort_values(key, ignore_index=True),
        out2.sort_values(key, ignore_index=True),
    )


def test_source_mixture_subunit_weight_is_rate_sample():
    from pyrosar_ray.stages.sampling import hash_bucket, source_mixture

    df = pd.DataFrame(
        {"doc_id": np.arange(2000, dtype=np.int64), "source": "bulk"}
    )
    out = source_mixture(
        ray.data.from_pandas(df).repartition(4), {"bulk": 0.25}
    ).to_pandas()
    kept = hash_bucket(df["doc_id"].to_numpy() + 7919) < 25
    assert len(out) == int(kept.sum())
    assert (out["epoch"] == 0).all()


def test_source_mixture_rejects_negative_weight():
    from pyrosar_ray.stages.sampling import source_mixture

    with pytest.raises(ValueError):
        source_mixture(None, {"a": -1.0})


def test_epoch_shard_shuffle_permutes_per_epoch(sf_dir):
    from pyrosar_ray.stages.sampling import epoch_shard_shuffle

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    a = epoch_shard_shuffle(docs, epoch=0, num_shards=4).to_pandas()
    b = epoch_shard_shuffle(docs, epoch=1, num_shards=4).to_pandas()
    n = docs.count()
    assert len(a) == n == len(b)
    # positions dense 0..count-1 within each shard
    for df in (a, b):
        g = df.groupby("shard")["pos"]
        assert (g.min() == 0).all()
        assert (g.max() == g.count() - 1).all()
    # different epochs give a different assignment (overwhelmingly)
    merged = a.merge(b, on="doc_id", suffixes=("_a", "_b"))
    same = (merged["shard_a"] == merged["shard_b"]) & (
        merged["pos_a"] == merged["pos_b"]
    )
    assert same.mean() < 0.5
    # same epoch reproduces exactly
    a2 = epoch_shard_shuffle(docs, epoch=0, num_shards=4).to_pandas()
    key = ["shard", "pos"]
    pd.testing.assert_frame_equal(
        a.sort_values(key, ignore_index=True), a2.sort_values(key, ignore_index=True)
    )


def test_epoch_shard_shuffle_rejects_bad_shards():
    from pyrosar_ray.stages.sampling import epoch_shard_shuffle

    with pytest.raises(ValueError):
        epoch_shard_shuffle(None, epoch=0, num_shards=0)


def test_stratified_split_fractions_and_determinism():
    import ray
    from pyrosar_ray.stages.sampling import stratified_split

    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(np.arange(10_000, dtype=np.int64))})
    ).repartition(5)
    out = stratified_split(ds).to_pandas()
    frac = out["split"].value_counts(normalize=True)
    assert abs(frac["train"] - 0.90) < 0.02
    assert abs(frac["val"] - 0.05) < 0.01
    assert abs(frac["test"] - 0.05) < 0.01
    # deterministic: same assignment on re-run and partition-independent
    out2 = stratified_split(ds.repartition(2)).to_pandas()
    m = out.set_index("doc_id")["split"]
    m2 = out2.set_index("doc_id")["split"]
    assert m.sort_index().equals(m2.sort_index())
    with pytest.raises(ValueError):
        stratified_split(ds, fractions={"a": 50, "b": 49})


def test_weighted_sample_k_properties():
    import math

    from pyrosar_ray.stages.sampling import weighted_sample_k, _KNUTH, _M32

    n = 2000
    ids = np.arange(n, dtype=np.int64)
    w = (ids % 17 + 1).astype(np.int64) * 10
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids), "w": pa.array(w)})
    ).repartition(7)
    out = weighted_sample_k(ds, k=100, weight_col="w").to_pandas()
    assert len(out) == 100
    # exact reference: smallest -ln(u)/w with libm log
    u = ((ids.astype(np.uint64) % _M32) * _KNUTH % _M32 + np.uint64(1)).astype(
        np.float64
    ) / 4294967296.0
    key = np.array([-math.log(x) for x in u]) / w
    order = np.lexsort((ids, key))[:100]
    assert set(out["doc_id"]) == set(ids[order])
    assert (np.sort(out["key"].to_numpy()) == np.sort(key[order])).all()
    # weighting property: the kept set over-represents heavy weights
    assert out["w"].mean() > w.mean()


def test_leakage_free_split_clusters_share_split():
    """Near-dup cluster members always land in the same split; singletons
    split by their own id — identical to stratified_split on the id."""
    from pyrosar_ray.stages.sampling import leakage_free_split

    # docs 1/2 and 3/4 are exact near-dups (same token set); 5..40 unique
    rows = []
    for i in range(1, 41):
        if i in (1, 2):
            text = "alpha beta gamma delta"
        elif i in (3, 4):
            text = "epsilon zeta eta theta"
        else:
            text = f"unique{i} token{i} word{i} item{i}"
        rows.append({"doc_id": i, "text": text, "source": "s0"})
    docs = ray.data.from_pandas(pd.DataFrame(rows)).repartition(3)
    out = leakage_free_split(docs).to_pandas().set_index("doc_id")

    assert len(out) == 40
    # cluster co-location: same group key AND same split label
    assert out.loc[1, "group_key"] == out.loc[2, "group_key"] == 1
    assert out.loc[3, "group_key"] == out.loc[4, "group_key"] == 3
    assert out.loc[1, "split"] == out.loc[2, "split"]
    assert out.loc[3, "split"] == out.loc[4, "split"]
    # singletons keep their own id and the plain hash split
    labels = np.array(["train", "val", "test"], dtype=object)
    bounds = np.array([90, 95])
    for i in range(5, 41):
        assert out.loc[i, "group_key"] == i
        expect = labels[np.searchsorted(bounds, hash_bucket(np.array([i]))[0], side="right")]
        assert out.loc[i, "split"] == expect

    with pytest.raises(ValueError):
        leakage_free_split(docs, fractions={"train": 50, "val": 10})


def test_aspect_bucket_assign_integer_argmin():
    """Bucket choice equals the exact rational argmin with first-tie wins."""
    from fractions import Fraction

    from pyrosar_ray.stages.images import ASPECT_BUCKETS, aspect_bucket_assign

    df = pd.DataFrame(
        {
            "image_id": [f"img-{i}" for i in range(7)],
            "w": pd.array([16, 24, 32, 16, 32, 100, 7], dtype="int32"),
            "h": pd.array([16, 32, 16, 32, 24, 1, 13], dtype="int32"),
        }
    )
    out = (
        aspect_bucket_assign(ray.data.from_pandas(df).repartition(2))
        .to_pandas()
        .set_index("image_id")
    )
    for _, row in df.iterrows():
        ar = Fraction(int(row.w), int(row.h))
        dists = [abs(ar - Fraction(bw, bh)) for bw, bh in ASPECT_BUCKETS]
        best = dists.index(min(dists))  # first minimum = tie rule
        got = out.loc[row.image_id]
        assert got["bucket_id"] == best
        assert (got["bw"], got["bh"]) == ASPECT_BUCKETS[best]
