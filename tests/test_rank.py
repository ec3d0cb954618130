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
