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


def _kaj_reference(df, rdf, how, join_how):
    agg = df.groupby("k", as_index=False).agg(how)
    if join_how == "inner":
        return agg.merge(rdf, on="k")
    if join_how == "left":
        return agg.merge(rdf, on="k", how="left")
    if join_how == "semi":
        return agg[agg["k"].isin(rdf["k"])]
    return agg[~agg["k"].isin(rdf["k"])]


def test_keyed_agg_join_parity(ray_session):
    """Fused aggregate→join emits exactly equi_join(keyed_agg(...), right)
    for every join flavor, including keys missing from either side."""
    from pyrosar_ray.stages.agg import keyed_agg_join

    rng = np.random.default_rng(11)
    n = 20_000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 3_000, n),
            "a": rng.integers(-1000, 1000, n),
            "b": rng.integers(0, 50, n),
        }
    )
    # right side covers ~2/3 of the key domain plus keys absent on the left
    rdf = pd.DataFrame({"k": np.arange(1_000, 3_500), "name": [f"n{i}" for i in range(1_000, 3_500)]})
    how = {"a": "sum", "b": "max"}
    for join_how in ("inner", "left", "semi", "anti"):
        ds = ray.data.from_pandas(df).repartition(9)
        right = ray.data.from_pandas(rdf).repartition(3)
        got = (
            keyed_agg_join(ds, "k", how, right, join_how=join_how)
            .to_pandas()
            .sort_values(["k"], ignore_index=True)
        )
        want = (
            _kaj_reference(df, rdf, how, join_how)
            .sort_values(["k"], ignore_index=True)
            .reset_index(drop=True)
        )
        assert list(got.columns) == list(want.columns), join_how
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False
        ), join_how


def test_keyed_agg_join_right_on_and_partition_invariance(ray_session):
    from pyrosar_ray.stages.agg import keyed_agg_join

    df = pd.DataFrame({"k": [1, 1, 2, 5, 5, 9], "v": [1, 2, 3, 4, 5, 6]})
    rdf = pd.DataFrame({"rk": [1, 5, 7], "w": [10, 20, 30]})
    outs = []
    for nparts in (1, 8, 64):
        ds = ray.data.from_pandas(df)
        right = ray.data.from_pandas(rdf)
        out = (
            keyed_agg_join(
                ds, "k", {"v": "sum"}, right, right_on="rk",
                num_partitions=nparts,
            )
            .to_pandas()
            .sort_values("k", ignore_index=True)
        )
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    pd.testing.assert_frame_equal(outs[0], outs[2])
    assert outs[0]["k"].tolist() == [1, 5]
    assert outs[0]["v"].tolist() == [3, 9]
    assert outs[0]["w"].tolist() == [10, 20]


def test_keyed_agg_join_group_cols(ray_session):
    """group_cols folds by (key, dims) while joining on key alone —
    the fused 'pre-aggregate the fact per (join key, dims)' shape."""
    from pyrosar_ray.stages.agg import keyed_agg_join

    rng = np.random.default_rng(5)
    n = 10_000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 800, n),
            "yr": rng.integers(1996, 1999, n),
            "v": rng.integers(0, 100, n),
        }
    )
    rdf = pd.DataFrame({"k": np.arange(0, 600), "w": np.arange(0, 600) * 7})
    ds = ray.data.from_pandas(df).repartition(7)
    right = ray.data.from_pandas(rdf).repartition(2)
    got = (
        keyed_agg_join(
            ds, "k", {"v": "sum"}, right, group_cols=["yr"]
        )
        .to_pandas()
        .sort_values(["k", "yr"], ignore_index=True)
    )
    want = (
        df.groupby(["k", "yr"], as_index=False)["v"]
        .sum()
        .merge(rdf, on="k")
        .sort_values(["k", "yr"], ignore_index=True)
    )
    assert list(got.columns) == ["k", "yr", "v", "w"]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # semi flavor: right side is key-only membership
    got_semi = (
        keyed_agg_join(
            ds, "k", {"v": "sum"},
            ray.data.from_pandas(rdf[["k"]]), group_cols=["yr"],
            join_how="semi",
        )
        .to_pandas()
        .sort_values(["k", "yr"], ignore_index=True)
    )
    want_semi = (
        df[df["k"].isin(rdf["k"])]
        .groupby(["k", "yr"], as_index=False)["v"]
        .sum()
        .sort_values(["k", "yr"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(got_semi, want_semi, check_dtype=False)


def test_partition_policy_and_cross_count_invariance(ray_session):
    """The cluster-aware partition policy (r4 verdict #8): the default
    derives from ray.cluster_resources() with a 64 floor / 4096 cap,
    and keyed_agg emits identical values at 8 / 32 / 128 partitions."""
    from pyrosar_ray.stages.agg import default_num_partitions, keyed_agg

    n = default_num_partitions()
    assert 64 <= n <= 4096
    assert default_num_partitions(floor=1, cap=5) == 5  # cap binds (2x4 CPUs > 5)
    # ray_session has 4 CPUs -> 2x4=8 < floor 64 -> floor binds
    assert default_num_partitions() == 64

    rng = np.random.default_rng(13)
    df = pd.DataFrame(
        {
            "k": rng.integers(-500, 500, 30_000),
            "v": rng.integers(-100, 100, 30_000),
            "w": rng.integers(0, 9, 30_000),
        }
    )
    outs = []
    for nparts in (8, 32, 128):
        ds = ray.data.from_pandas(df).repartition(11)
        outs.append(
            keyed_agg(ds, "k", {"v": "sum", "w": "max"}, num_partitions=nparts)
            .to_pandas()
            .sort_values("k", ignore_index=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])
    pd.testing.assert_frame_equal(outs[0], outs[2])
