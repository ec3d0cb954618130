"""keyed_sum (stages/agg.py): parity with the sort-based aggregate."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from pyrosar_ray.stages.agg import keyed_sum


def test_matches_ray_aggregate(ray_session):
    rng = np.random.default_rng(7)
    n = 50_000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 7_000, n),
            "a": rng.integers(-1000, 1000, n),
            "b": rng.integers(0, 10, n),
        }
    )
    ds = ray.data.from_pandas(df).repartition(13)
    got = (
        keyed_sum(ds, "k", ["a", "b"])
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    want = (
        df.groupby("k", as_index=False)[["a", "b"]]
        .sum()
        .astype(np.int64)
        .sort_values("k", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert got.dtypes.tolist() == [np.dtype(np.int64)] * 3


def test_partition_count_invariant(ray_session):
    df = pd.DataFrame({"k": [1, 1, 2, 3, 3, 3], "v": [10, 20, 5, 1, 2, 3]})
    outs = []
    for nparts in (1, 4, 64):
        ds = ray.data.from_pandas(df)
        out = (
            keyed_sum(ds, "k", ["v"], num_partitions=nparts)
            .to_pandas()
            .sort_values("k", ignore_index=True)
        )
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    pd.testing.assert_frame_equal(outs[0], outs[2])
    assert list(outs[0].v) == [30, 5, 6]


def test_negative_keys(ray_session):
    df = pd.DataFrame({"k": [-5, -5, 0, 7], "v": [1, 2, 3, 4]})
    out = (
        keyed_sum(ray.data.from_pandas(df), "k", ["v"])
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    assert list(out.k) == [-5, 0, 7]
    assert list(out.v) == [3, 3, 4]
