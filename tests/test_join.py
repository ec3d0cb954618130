"""Generic co-partition equi-join (stages/join.py)."""

import numpy as np
import pandas as pd
import pytest
import ray

from pyrosar_ray.stages.join import equi_join


def test_equi_join_inner_semantics():
    left = pd.DataFrame({"k": [1, 2, 3, 5], "a": ["w", "x", "y", "z"]})
    right = pd.DataFrame({"rk": [2, 3, 4, 2], "b": [20.0, 30.0, 40.0, 21.0]})
    out = (
        equi_join(
            ray.data.from_pandas(left).repartition(2),
            ray.data.from_pandas(right).repartition(2),
            on="k",
            right_on="rk",
            num_partitions=4,
        )
        .to_pandas()
        .sort_values(["k", "b"])
        .reset_index(drop=True)
    )
    exp = (
        left.merge(right, left_on="k", right_on="rk")[["k", "a", "b"]]
        .sort_values(["k", "b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out[["k", "a", "b"]], exp)


def test_equi_join_dtypes_survive():
    left = pd.DataFrame({"k": np.array([1, 2], dtype=np.int64), "n": np.array([7, 8], dtype=np.int64)})
    right = pd.DataFrame({"k": np.array([1, 2], dtype=np.int64), "m": np.array([9, 10], dtype=np.int64)})
    out = equi_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right), on="k"
    ).to_pandas()
    assert out["n"].dtype == np.int64 and out["m"].dtype == np.int64


def test_equi_join_column_collision_rejected():
    df = pd.DataFrame({"k": [1], "v": [2]})
    with pytest.raises(ValueError):
        equi_join(ray.data.from_pandas(df), ray.data.from_pandas(df), on="k")


def test_equi_join_anti():
    left = pd.DataFrame({"k": [1, 2, 3, 4], "a": [10, 20, 30, 40]})
    right = pd.DataFrame({"k": [2, 4]})
    out = (
        equi_join(
            ray.data.from_pandas(left),
            ray.data.from_pandas(right),
            on="k",
            how="anti",
            num_partitions=3,
        )
        .to_pandas()
        .sort_values("k")
    )
    assert out["k"].tolist() == [1, 3]
    assert out["a"].dtype == np.int64
    with pytest.raises(ValueError):
        equi_join(ray.data.from_pandas(left), ray.data.from_pandas(right), on="k", how="full")


def test_equi_join_semi():
    """Semi keeps each probe row AT MOST once: build-key duplicates
    (k=2 twice) must not replicate the probe row the way inner would."""
    left = pd.DataFrame({"k": [1, 2, 3, 4], "a": [10, 20, 30, 40]})
    right = pd.DataFrame({"k": [2, 2, 4], "b": [1.0, 2.0, 3.0]})
    out = (
        equi_join(
            ray.data.from_pandas(left).repartition(2),
            ray.data.from_pandas(right).repartition(2),
            on="k",
            how="semi",
            num_partitions=3,
        )
        .to_pandas()
        .sort_values("k")
    )
    assert list(out.columns) == ["k", "a"]
    assert out["k"].tolist() == [2, 4]
    assert out["a"].tolist() == [20, 40]
    assert out["a"].dtype == np.int64


def test_equi_join_semi_salted_matches_plain():
    rng = np.random.default_rng(7)
    left = pd.DataFrame(
        {"k": np.repeat([1, 2, 3], [50, 5, 5]), "a": np.arange(60)}
    )
    right = pd.DataFrame({"k": rng.choice([1, 2, 9], 30), "b": np.arange(30)})
    plain = (
        equi_join(
            ray.data.from_pandas(left),
            ray.data.from_pandas(right),
            on="k",
            how="semi",
            num_partitions=4,
        )
        .to_pandas()
        .sort_values(["k", "a"])
        .reset_index(drop=True)
    )
    salted = (
        equi_join(
            ray.data.from_pandas(left),
            ray.data.from_pandas(right),
            on="k",
            how="semi",
            num_partitions=4,
            skew_threshold=10,
        )
        .to_pandas()
        .sort_values(["k", "a"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(plain, salted)
    exp = left[left["k"].isin(right["k"].unique())]
    assert sorted(plain["a"].tolist()) == sorted(exp["a"].tolist())


def test_broadcast_equi_join_semi_matches_shuffle():
    from pyrosar_ray.stages.join import broadcast_equi_join

    left = pd.DataFrame({"k": [1, 2, 3, 4, 5], "a": [10, 20, 30, 40, 50]})
    right = pd.DataFrame({"rk": [2, 2, 5, 7], "b": [0.1, 0.2, 0.3, 0.4]})
    lds = ray.data.from_pandas(left).repartition(2)
    rds = ray.data.from_pandas(right)
    bout = (
        broadcast_equi_join(lds, rds, on="k", right_on="rk", how="semi")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    sout = (
        equi_join(lds, rds, on="k", right_on="rk", how="semi", num_partitions=3)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(bout, sout)
    assert bout["k"].tolist() == [2, 5]


def test_equi_join_left():
    left = pd.DataFrame({"k": [1, 2, 3], "a": [10, 20, 30]})
    right = pd.DataFrame({"k": [2], "b": [200.0]})
    out = (
        equi_join(
            ray.data.from_pandas(left),
            ray.data.from_pandas(right),
            on="k",
            how="left",
            num_partitions=2,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert out["k"].tolist() == [1, 2, 3]
    assert out["b"].isna().tolist() == [True, False, True]
    assert out.loc[1, "b"] == 200.0


def test_equi_join_left_keeps_int_dtype():
    """Arrow-native merge: misses are typed nulls, not a float64 upcast."""
    left = pd.DataFrame({"k": [1, 2, 3], "a": np.array([10, 20, 30], dtype=np.int64)})
    right = pd.DataFrame({"k": [2], "b": np.array([200], dtype=np.int64)})
    out = equi_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right), on="k", how="left"
    )
    schema = out.schema()
    assert dict(zip(schema.names, schema.types))["b"] == __import__("pyarrow").int64()


def test_equi_join_auto_partitions_default():
    """num_partitions=None resolves via auto_num_partitions (no crash,
    same rows as a pinned count)."""
    left = pd.DataFrame({"k": [1, 2, 3, 5], "a": ["w", "x", "y", "z"]})
    right = pd.DataFrame({"k": [2, 3, 4, 2], "b": [20.0, 30.0, 40.0, 21.0]})
    auto = (
        equi_join(ray.data.from_pandas(left), ray.data.from_pandas(right), on="k")
        .to_pandas()
        .sort_values(["k", "b"], ignore_index=True)
    )
    pinned = (
        equi_join(
            ray.data.from_pandas(left),
            ray.data.from_pandas(right),
            on="k",
            num_partitions=4,
        )
        .to_pandas()
        .sort_values(["k", "b"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(auto, pinned)


def test_equi_join_outer():
    left = pd.DataFrame({"k": [1, 2], "a": [10.0, 20.0]})
    right = pd.DataFrame({"k": [2, 3], "b": [200.0, 300.0]})
    out = (
        equi_join(
            ray.data.from_pandas(left),
            ray.data.from_pandas(right),
            on="k",
            how="outer",
            num_partitions=2,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert out["k"].tolist() == [1, 2, 3]
    assert out["a"].isna().tolist() == [False, False, True]
    assert out["b"].isna().tolist() == [True, False, False]


def test_equi_join_extreme_key_skew():
    """Adversarial skew: 95% of both sides share ONE key. The hot key
    co-locates in one partition (correct by construction — pair
    explosion is inherent to the join semantics, 4k·20 rows here);
    output matches pandas exactly and cold keys are unaffected."""
    n_hot, n_cold = 4000, 50
    left = pd.DataFrame(
        {
            "k": np.concatenate(
                [np.full(n_hot, 7, np.int64), np.arange(100, 100 + n_cold)]
            ),
            "a": np.arange(n_hot + n_cold, dtype=np.int64),
        }
    )
    right = pd.DataFrame(
        {
            "rk": np.concatenate(
                [np.full(20, 7, np.int64), np.arange(100, 100 + n_cold)]
            ),
            "b": np.arange(20 + n_cold, dtype=np.int64),
        }
    )
    out = (
        equi_join(
            ray.data.from_pandas(left).repartition(8),
            ray.data.from_pandas(right).repartition(8),
            on="k",
            right_on="rk",
            num_partitions=16,
        )
        .to_pandas()
        .sort_values(["k", "a", "b"], ignore_index=True)
    )
    exp = (
        left.merge(right, left_on="k", right_on="rk")[["k", "a", "b"]]
        .sort_values(["k", "a", "b"], ignore_index=True)
    )
    assert len(out) == n_hot * 20 + n_cold
    pd.testing.assert_frame_equal(out[["k", "a", "b"]], exp)


def test_equi_join_sample_uniform_without_materializing():
    """Sampling over a join: every sampled pair is a REAL join tuple,
    the draw sequence is deterministic, and the sample matches a
    brute-force materialized-join reference exactly."""
    from pyrosar_ray.stages.join import equi_join_sample

    rng = np.random.RandomState(0)
    n = 300
    left = pd.DataFrame(
        {"k": rng.randint(0, 12, n), "a_id": np.arange(1000, 1000 + n, dtype=np.int64)}
    )
    right = pd.DataFrame(
        {"k": rng.randint(0, 12, n), "b_id": np.arange(5000, 5000 + n, dtype=np.int64)}
    )
    out = equi_join_sample(
        ray.data.from_pandas(left).repartition(4),
        ray.data.from_pandas(right).repartition(4),
        on="k",
        n_samples=50,
        left_id="a_id",
        right_id="b_id",
    ).to_pandas()
    assert len(out) == 50 and out["sample_id"].tolist() == list(range(50))

    # brute-force reference: enumerate the join, replay the same draws
    keys = sorted(set(left["k"]) & set(right["k"]))
    ca = left.groupby("k").size().to_dict()
    cb = right.groupby("k").size().to_dict()
    w = [ca[k] * cb[k] for k in keys]
    prefix = np.cumsum([0] + w)
    total = int(prefix[-1])
    a_sorted = {k: sorted(left[left["k"] == k]["a_id"]) for k in keys}
    b_sorted = {k: sorted(right[right["k"] == k]["b_id"]) for k in keys}
    for s in range(50):
        u = int(((s + 1) * 2654435761) % (1 << 32)) % total
        ki = int(np.searchsorted(prefix, u, side="right")) - 1
        k = keys[ki]
        off = u - int(prefix[ki])
        row = out.iloc[s]
        assert row["key"] == k
        assert row["a_id"] == a_sorted[k][off % ca[k]]
        assert row["b_id"] == b_sorted[k][off // ca[k]]


def test_equi_join_salted_skew_exact():
    """skew_threshold: the hot key's probe rows salt across partitions,
    build rows replicate — output identical to the plain plan and to
    pandas, for inner/left/anti."""
    n_hot, n_cold = 3000, 60
    left = pd.DataFrame(
        {
            "k": np.concatenate(
                [np.full(n_hot, 7, np.int64), np.arange(100, 100 + n_cold)]
            ),
            "a": np.arange(n_hot + n_cold, dtype=np.int64),
        }
    )
    right = pd.DataFrame(
        {
            "rk": np.concatenate(
                [np.full(5, 7, np.int64), np.arange(130, 130 + n_cold)]
            ),
            "b": np.arange(5 + n_cold, dtype=np.int64),
        }
    )
    lds = ray.data.from_pandas(left).repartition(8)
    rds = ray.data.from_pandas(right).repartition(8)
    for how in ("inner", "left", "anti"):
        plain = (
            equi_join(lds, rds, on="k", right_on="rk",
                      num_partitions=6, how=how)
            .to_pandas()
            .sort_values(list(left.columns), ignore_index=True)
        )
        salted = (
            equi_join(lds, rds, on="k", right_on="rk",
                      num_partitions=6, how=how, skew_threshold=500)
            .to_pandas()
            .sort_values(list(left.columns), ignore_index=True)
        )
        pd.testing.assert_frame_equal(
            salted.sort_index(axis=1), plain.sort_index(axis=1)
        )


def test_equi_join_salted_outer_rejected():
    ds = ray.data.from_pandas(pd.DataFrame({"k": [1], "a": [1]}))
    rs = ray.data.from_pandas(pd.DataFrame({"rk": [1], "b": [1]}))
    with pytest.raises(ValueError, match="inner/left/anti"):
        equi_join(ds, rs, on="k", right_on="rk", how="outer",
                  skew_threshold=10)


def test_detect_heavy_keys_sieve():
    from pyrosar_ray.stages.join import detect_heavy_keys

    df = pd.DataFrame(
        {"k": np.concatenate([np.full(900, 3, np.int64),
                              np.arange(50, dtype=np.int64)])}
    )
    ds = ray.data.from_pandas(df).repartition(4)
    heavy = detect_heavy_keys(ds, "k", threshold=100)
    assert list(heavy) == [3]
    # below-threshold keys never detected
    assert list(detect_heavy_keys(ds, "k", threshold=2000)) == []


def test_broadcast_equi_join_matches_shuffle_plan():
    """The zero-shuffle broadcast plan and the co-partition exchange
    plan are output-identical on all three supported modes."""
    from pyrosar_ray.stages.join import broadcast_equi_join

    rng = np.random.default_rng(11)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 40, 300).astype(np.int64),
            "a": rng.integers(-99, 99, 300).astype(np.int64),
        }
    )
    right = pd.DataFrame(
        {
            "rk": np.arange(0, 60, 2, dtype=np.int64),
            "b": np.arange(30, dtype=np.int64) * 7,
        }
    )
    lds = ray.data.from_pandas(left).repartition(5)
    rds = ray.data.from_pandas(right).repartition(2)
    for how in ("inner", "left", "anti"):
        cols = ["k", "a"] + ([] if how == "anti" else ["b"])
        got = (
            broadcast_equi_join(lds, rds, on="k", right_on="rk", how=how)
            .to_pandas()
            .sort_values(cols, ignore_index=True)
        )
        want = (
            equi_join(lds, rds, on="k", right_on="rk", how=how,
                      num_partitions=4)
            .to_pandas()
            .sort_values(cols, ignore_index=True)
        )
        pd.testing.assert_frame_equal(got[cols], want[cols])


def test_broadcast_equi_join_keeps_int_dtype_on_left():
    """Arrow hash join keeps misses as typed nulls — no float64 upcast
    of the build side's int columns (the pandas-merge artifact the
    shuffle plan documents)."""
    import pyarrow as pa

    from pyrosar_ray.stages.join import broadcast_equi_join

    lds = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2], pa.int64())})
    )
    rds = ray.data.from_arrow(
        pa.table({"k": pa.array([2], pa.int64()),
                  "n": pa.array([9], pa.int64())})
    )
    out = broadcast_equi_join(lds, rds, on="k", how="left")
    tbl = pa.concat_tables(
        [b for b in out.iter_batches(batch_format="pyarrow")]
    )
    assert tbl.schema.field("n").type == pa.int64()
    got = tbl.to_pandas().sort_values("k", ignore_index=True)
    assert got["n"].isna().tolist() == [True, False]


def test_broadcast_equi_join_rejects_outer():
    lds = ray.data.from_pandas(pd.DataFrame({"k": [1], "a": [1]}))
    with pytest.raises(ValueError, match="inner/left/anti"):
        from pyrosar_ray.stages.join import broadcast_equi_join

        broadcast_equi_join(lds, lds, on="k", how="outer")


def test_equi_join_partition_count_invariance(ray_session):
    """equi_join emits identical rows at 8 / 32 / 128 partitions (the
    precondition for the cluster-aware auto partition policy)."""
    import numpy as np
    import pandas as pd
    import ray

    from pyrosar_ray.stages.join import equi_join

    rng = np.random.default_rng(7)
    left = pd.DataFrame(
        {"k": rng.integers(0, 400, 5_000), "x": np.arange(5_000)}
    )
    right = pd.DataFrame({"k": np.arange(100, 500), "y": np.arange(400)})
    outs = []
    for nparts in (8, 32, 128):
        out = (
            equi_join(
                ray.data.from_pandas(left).repartition(5),
                ray.data.from_pandas(right),
                on="k", num_partitions=nparts,
            )
            .to_pandas()
            .sort_values(["k", "x"], ignore_index=True)
        )
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    pd.testing.assert_frame_equal(outs[0], outs[2])
