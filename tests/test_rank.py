"""global_rank: exact distributed ROW_NUMBER vs a local argsort."""

import numpy as np
import pandas as pd
import pytest
import ray

from pyrosar_ray.stages.rank import global_rank


def _reference(scores, ids):
    order = np.lexsort((ids, scores))
    ranks = np.empty(len(ids), dtype=np.int64)
    ranks[order] = np.arange(1, len(ids) + 1)
    return ranks


def _run(scores, ids, shift, blocks=5):
    df = pd.DataFrame({"doc_id": ids, "score": scores})
    ds = ray.data.from_pandas(df).repartition(blocks)
    out = global_rank(ds, "score", "doc_id", shift=shift).to_pandas()
    out = out.sort_values("doc_id", ignore_index=True)
    expect = pd.DataFrame(
        {"doc_id": ids, "score": scores, "rank": _reference(scores, ids)}
    ).sort_values("doc_id", ignore_index=True)
    pd.testing.assert_frame_equal(
        out[["doc_id", "score", "rank"]].astype("int64"), expect.astype("int64")
    )


def test_matches_lexsort_mixed():
    rng = np.random.RandomState(7)
    ids = rng.permutation(500).astype(np.int64)
    scores = rng.randint(0, 20, size=500).astype(np.int64)
    _run(scores, ids, shift=4)


def test_single_dominant_score_is_bucket_bounded():
    # every row shares one score: groups are id-range cells of <= 2^shift
    ids = np.arange(1000, dtype=np.int64)
    scores = np.zeros(1000, dtype=np.int64)
    _run(scores, ids, shift=5)


def test_unique_scores():
    ids = np.arange(64, dtype=np.int64)[::-1].copy()
    scores = np.arange(64, dtype=np.int64)
    _run(scores, ids, shift=2, blocks=3)


def test_group_width_bound():
    # the rank exchange's group key spreads a hot score across cells
    ids = np.arange(256, dtype=np.int64)
    shift = 4
    buckets = ids >> shift
    assert (np.bincount(buckets) <= 2**shift).all()


def test_empty():
    ds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                      "score": pd.Series([], dtype="int64")})
    )
    assert global_rank(ds, "score", "doc_id").count() == 0


def test_global_cumsum_matches_lexsort_scan():
    from pyrosar_ray.stages.rank import global_cumsum

    rng = np.random.RandomState(3)
    ids = rng.permutation(600).astype(np.int64)
    ts = rng.randint(0, 25, size=600).astype(np.int64)
    vals = rng.randint(-500, 500, size=600).astype(np.int64)
    df = pd.DataFrame({"event_id": ids, "ts": ts, "cents": vals})
    ds = ray.data.from_pandas(df).repartition(5)
    out = (
        global_cumsum(ds, "ts", "event_id", "cents", shift=4)
        .to_pandas()
        .sort_values("event_id", ignore_index=True)
    )
    order = np.lexsort((ids, ts))
    run = np.empty(len(ids), dtype=np.int64)
    run[order] = np.cumsum(vals[order])
    expect = pd.DataFrame(
        {"event_id": ids, "ts": ts, "run_sum": run}
    ).sort_values("event_id", ignore_index=True)
    pd.testing.assert_frame_equal(
        out[["event_id", "ts", "run_sum"]].astype("int64"),
        expect.astype("int64"),
    )


def test_global_cumsum_hot_order_value_bucket_bounded():
    # one ts value for every row: cells are id ranges of <= 2^shift,
    # scan still exact and totals at the last row equal the full sum
    from pyrosar_ray.stages.rank import global_cumsum

    ids = np.arange(800, dtype=np.int64)
    vals = np.full(800, 3, dtype=np.int64)
    df = pd.DataFrame({"event_id": ids, "ts": np.zeros(800, np.int64),
                       "cents": vals})
    ds = ray.data.from_pandas(df).repartition(4)
    # split_threshold forces the heavy-cell path: the single hot ts
    # splits into (order_low, id-range) subcells of <= 2^shift rows
    out = (
        global_cumsum(ds, "ts", "event_id", "cents", shift=5,
                      split_threshold=100)
        .to_pandas()
        .sort_values("event_id", ignore_index=True)
    )
    assert out["run_sum"].tolist() == (3 * (np.arange(800) + 1)).tolist()


def test_global_cumsum_mixed_heavy_and_light_cells():
    # one hot order value next to a spread tail: split subcells and
    # range cells must compose into one exact global scan
    from pyrosar_ray.stages.rank import global_cumsum

    rng = np.random.RandomState(9)
    hot_ts = np.zeros(400, dtype=np.int64)
    tail_ts = rng.randint(1 << 6, 1 << 12, size=300).astype(np.int64)
    ts = np.concatenate([hot_ts, tail_ts])
    ids = rng.permutation(700).astype(np.int64)
    vals = rng.randint(-50, 50, size=700).astype(np.int64)
    df = pd.DataFrame({"event_id": ids, "ts": ts, "cents": vals})
    ds = ray.data.from_pandas(df).repartition(6)
    out = (
        global_cumsum(ds, "ts", "event_id", "cents", order_shift=6,
                      shift=4, split_threshold=64)
        .to_pandas()
        .sort_values("event_id", ignore_index=True)
    )
    order = np.lexsort((ids, ts))
    run = np.empty(len(ids), dtype=np.int64)
    run[order] = np.cumsum(vals[order])
    expect = pd.DataFrame(
        {"event_id": ids, "ts": ts, "run_sum": run}
    ).sort_values("event_id", ignore_index=True)
    pd.testing.assert_frame_equal(
        out[["event_id", "ts", "run_sum"]].astype("int64"),
        expect.astype("int64"),
    )


def test_global_cumsum_empty():
    from pyrosar_ray.stages.rank import global_cumsum

    df = pd.DataFrame({"event_id": pd.array([], dtype="int64"),
                       "ts": pd.array([], dtype="int64"),
                       "cents": pd.array([], dtype="int64")})
    ds = ray.data.from_pandas(df)
    assert global_cumsum(ds, "ts", "event_id", "cents").count() == 0


def test_multi_global_rank_matches_single(ray_session):
    """multi_global_rank's one-exchange-per-stage plan emits exactly the
    per-metric ranks of three independent global_rank calls."""
    import numpy as np

    from pyrosar_ray.stages.rank import global_rank, multi_global_rank

    rng = np.random.RandomState(3)
    n = 5_000
    df = pd.DataFrame(
        {
            "id": rng.permutation(n).astype(np.int64),
            "a": rng.randint(0, 40, n).astype(np.int64),
            "b": rng.randint(-5, 5, n).astype(np.int64),
            "c": rng.randint(0, 1_000_000, n).astype(np.int64),
        }
    )
    ds = ray.data.from_pandas(df).repartition(7)
    got = (
        multi_global_rank(ds, ["a", "b", "c"], id_col="id", shift=8)
        .to_pandas()
        .sort_values(["metric", "id"], ignore_index=True)
    )
    for m, col in enumerate(["a", "b", "c"]):
        single = (
            global_rank(
                ray.data.from_pandas(df[["id", col]]).repartition(7),
                score_col=col, id_col="id", shift=8,
            )
            .to_pandas()
            .sort_values("id", ignore_index=True)
        )
        mine = got[got["metric"] == m].sort_values("id", ignore_index=True)
        assert (mine["rank"].to_numpy() == single["rank"].to_numpy()).all()
