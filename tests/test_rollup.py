"""ROLLUP aggregation (stages/rollup.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from pyrosar_ray.stages.rollup import rollup_aggregate


def _ds(n=400, seed=5):
    rng = np.random.default_rng(seed)
    return ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array(rng.choice(["x", "y", "z"], n)),
                "b": pa.array(rng.integers(0, 4, n)),
                "v": pa.array(rng.integers(-50, 50, n)),
            }
        )
    ).repartition(6)


def test_rollup_matches_pandas_reference():
    ds = _ds()
    base = ds.to_pandas()
    got = (
        rollup_aggregate(ds, keys=["a", "b"], sum_cols=["v"])
        .to_pandas()
        .sort_values(["a", "b"], ignore_index=True)
    )
    finest = base.groupby(["a", "b"]).agg(n=("v", "size"), v=("v", "sum"))
    lvl1 = base.groupby(["a"]).agg(n=("v", "size"), v=("v", "sum"))
    assert len(got) == len(finest) + len(lvl1) + 1
    for row in got.itertuples():
        if pd.isna(row.a):
            assert pd.isna(row.b)
            assert row.n == len(base) and row.v == base["v"].sum()
        elif pd.isna(row.b):
            assert row.n == lvl1.loc[row.a, "n"] and row.v == lvl1.loc[row.a, "v"]
        else:
            key = (row.a, int(row.b))
            assert row.n == finest.loc[key, "n"] and row.v == finest.loc[key, "v"]


def test_rollup_single_key_and_empty_key_rejected():
    ds = _ds(50)
    out = rollup_aggregate(ds, keys=["a"], sum_cols=["v"]).to_pandas()
    base = ds.to_pandas()
    assert len(out) == base["a"].nunique() + 1
    total = out[out["a"].isna()]
    assert int(total["v"].iloc[0]) == base["v"].sum()
    with pytest.raises(ValueError):
        rollup_aggregate(ds, keys=[], sum_cols=["v"])


def test_pivot_counts_matches_crosstab():
    from pyrosar_ray.stages.rollup import pivot_counts

    ds = _ds(300, seed=9)
    base = ds.to_pandas()
    got = (
        pivot_counts(ds, key_col="b", cat_col="a")
        .to_pandas()
        .sort_values("b", ignore_index=True)
    )
    want = pd.crosstab(base["b"], base["a"])
    for row in got.itertuples():
        for c in ("x", "y", "z"):
            assert getattr(row, f"n_{c}") == want.loc[row.b].get(c, 0)
    # pinned categories add all-zero columns; unknown values raise
    wide = pivot_counts(ds, key_col="b", cat_col="a",
                        categories=["x", "y", "z", "missing"]).to_pandas()
    assert (wide["n_missing"] == 0).all()
    with pytest.raises(Exception):
        pivot_counts(ds, key_col="b", cat_col="a",
                     categories=["x", "y"]).to_pandas()


def test_keyed_zscores_sufficient_statistics():
    import math

    from pyrosar_ray.stages.rollup import keyed_zscores

    rng = np.random.default_rng(4)
    keys = rng.choice(["p", "q"], 400)
    cents = rng.integers(-500, 500, 400).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"id": pa.array(np.arange(400, dtype=np.int64)),
                  "k": pa.array(keys), "c": pa.array(cents)})
    ).repartition(6)
    out = (
        keyed_zscores(ds, key_col="k", cents_col="c", id_col="id")
        .to_pandas()
        .sort_values("id", ignore_index=True)
    )
    df = pd.DataFrame({"k": keys, "c": cents})
    for key in ("p", "q"):
        sub = df[df["k"] == key]["c"]
        n, s, ss = len(sub), int(sub.sum()), int((sub.astype(object) ** 2).sum())
        mean = s / n
        std = math.sqrt(float(n * ss - s * s) / float(n * (n - 1)))
        mask = out["k"] == key
        want = (out.loc[mask, "c"].to_numpy().astype(np.float64) - mean) / std
        assert (out.loc[mask, "z"].to_numpy() == want).all()
    # degenerate keys emit z = 0
    one = ray.data.from_arrow(
        pa.table({"id": pa.array([1, 2, 3], pa.int64()),
                  "k": pa.array(["a", "b", "b"]),
                  "c": pa.array([7, 5, 5], pa.int64())})
    )
    z = keyed_zscores(one, key_col="k", cents_col="c", id_col="id").to_pandas()
    assert (z["z"] == 0.0).all()  # n=1 and zero-variance keys


def test_winsorize_cents_exact_cutpoints():
    from pyrosar_ray.stages.rollup import winsorize_cents

    import math
    rng = np.random.default_rng(2)
    cents = rng.integers(0, 1000, 500).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"id": pa.array(np.arange(500, dtype=np.int64)),
                  "c": pa.array(cents)})
    ).repartition(5)
    out = (
        winsorize_cents(ds, cents_col="c", id_col="id", q_lo=0.1, q_hi=0.9)
        .to_pandas()
        .sort_values("id", ignore_index=True)
    )
    srt = np.sort(cents)
    lo = srt[max(1, math.ceil(0.1 * 500)) - 1]
    hi = srt[max(1, math.ceil(0.9 * 500)) - 1]
    want = np.clip(cents, lo, hi)
    assert (out["clipped"].to_numpy() == want).all()
    assert out["clipped"].min() == lo and out["clipped"].max() == hi


def test_unpivot_golden_and_labels():
    from pyrosar_ray.stages.rollup import unpivot

    ds = ray.data.from_arrow(
        pa.table({"g": ["a", "b"], "n_x": [1, 2], "n_y": [3, 4]})
    )
    out = (
        unpivot(ds, ["g"], ["n_x", "n_y"], "cat", "cnt",
                labels=["x", "y"])
        .to_pandas()
        .sort_values(["g", "cat"], ignore_index=True)
    )
    assert out["g"].tolist() == ["a", "a", "b", "b"]
    assert out["cat"].tolist() == ["x", "y", "x", "y"]
    assert out["cnt"].tolist() == [1, 3, 2, 4]
    with pytest.raises(ValueError, match="pair 1:1"):
        unpivot(ds, ["g"], ["n_x", "n_y"], "cat", "cnt", labels=["x"])


def test_unpivot_inverts_pivot_counts():
    """unpivot(pivot_counts(ds)) == groupby counts plus the explicit
    zero cells the wide form materializes."""
    from pyrosar_ray.stages.rollup import pivot_counts, unpivot

    ds = _ds(300, seed=9)
    base = ds.to_pandas()
    cats = ["x", "y", "z"]
    wide = pivot_counts(ds, key_col="b", cat_col="a", categories=cats)
    tall = (
        unpivot(wide, ["b"], [f"n_{c}" for c in cats], "a", "n",
                labels=cats)
        .to_pandas()
        .sort_values(["b", "a"], ignore_index=True)
    )
    want = (
        base.groupby(["b", "a"]).size().rename("n")
        .reindex(pd.MultiIndex.from_product(
            [sorted(base["b"].unique()), cats], names=["b", "a"]),
            fill_value=0)
        .reset_index()
    )
    assert tall["n"].tolist() == want["n"].tolist()
    assert (len(tall) == base["b"].nunique() * len(cats))


def test_pivot_category_discovery_hard_cap(monkeypatch):
    # unbounded/skewed category columns must fail loudly instead of
    # OOMing the driver during discovery (round-3 verdict: hard cap)
    from pyrosar_ray.stages import rollup as rollup_mod
    from pyrosar_ray.stages.rollup import pivot_counts

    ds = _ds()
    monkeypatch.setattr(rollup_mod, "PIVOT_MAX_CATEGORIES", 2)
    with pytest.raises(ValueError, match="more than 2 distinct"):
        pivot_counts(ds, key_col="b", cat_col="a")
    # an explicit pinned category list bypasses discovery entirely
    wide = pivot_counts(ds, key_col="b", cat_col="a",
                        categories=["x", "y", "z"]).to_pandas()
    assert len(wide) == 4
