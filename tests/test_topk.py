"""Per-group top-k with partial pushdown (stages/topk.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from pyrosar_ray.stages.topk import topk_per_group


def _ds(n=500, seed=11, string_key=True):
    rng = np.random.default_rng(seed)
    keys = rng.choice(["alpha", "beta", "gamma", "delta"], n)
    if not string_key:
        keys = rng.integers(0, 7, n)
    return ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array(keys),
                "id": pa.array(np.arange(n, dtype=np.int64)),
                "v": pa.array(rng.integers(-1000, 1000, n)),
            }
        )
    ).repartition(8)


def _reference(df, k, descending=True):
    df = df.sort_values(["k", "v", "id"], ascending=[True, not descending, True])
    top = df.groupby("k", sort=False).head(k).copy()
    top["rank"] = top.groupby("k", sort=False).cumcount() + 1
    return top.sort_values(["k", "rank"], ignore_index=True)


@pytest.mark.parametrize("string_key", [True, False])
def test_topk_matches_window_function(string_key):
    ds = _ds(string_key=string_key)
    base = ds.to_pandas()
    got = (
        topk_per_group(ds, key="k", order_col="v", k=5, id_col="id")
        .to_pandas()
        .sort_values(["k", "rank"], ignore_index=True)
    )
    want = _reference(base, 5)
    pd.testing.assert_frame_equal(
        got[["k", "id", "v", "rank"]], want[["k", "id", "v", "rank"]]
    )


def test_topk_ascending_and_k_larger_than_group():
    ds = _ds(60, seed=3)
    base = ds.to_pandas()
    got = (
        topk_per_group(ds, key="k", order_col="v", k=100, id_col="id",
                       descending=False)
        .to_pandas()
        .sort_values(["k", "rank"], ignore_index=True)
    )
    want = _reference(base, 100, descending=False)
    assert len(got) == len(base)  # k > group size keeps everything
    pd.testing.assert_frame_equal(
        got[["k", "id", "v", "rank"]], want[["k", "id", "v", "rank"]]
    )


def test_topk_rejects_nonpositive_k():
    with pytest.raises(ValueError):
        topk_per_group(_ds(10), key="k", order_col="v", k=0, id_col="id")
