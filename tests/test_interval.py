"""Generic interval-overlap join (stages/interval.py)."""

import numpy as np
import pandas as pd
import pytest
import ray

from pyrosar_ray.stages.interval import interval_join


def _make(rows, cols):
    return ray.data.from_pandas(pd.DataFrame(rows, columns=cols))


def _brute(ldf, rdf, key=None):
    out = []
    for _, l in ldf.iterrows():
        for _, r in rdf.iterrows():
            if key and l[key] != r[key]:
                continue
            if r["start"] <= l["stop"] and r["stop"] >= l["start"]:
                out.append(
                    (l["lid"], r["rid"], min(l["stop"], r["stop"]) - max(l["start"], r["start"]))
                )
    return sorted(out)


@pytest.mark.parametrize("bucket", [5, 37, 1000])
def test_matches_brute_force_across_bucket_sizes(bucket):
    rng = np.random.default_rng(bucket)
    n = 120
    ldf = pd.DataFrame(
        {
            "lid": np.arange(n, dtype=np.int64),
            "start": rng.integers(0, 500, n),
            "stop": 0,
        }
    )
    ldf["stop"] = ldf["start"] + rng.integers(0, 60, n)
    rdf = pd.DataFrame(
        {
            "rid": np.arange(n, dtype=np.int64) + 1000,
            "start": rng.integers(0, 500, n),
            "stop": 0,
        }
    )
    rdf["stop"] = rdf["start"] + rng.integers(0, 120, n)
    out = interval_join(
        ray.data.from_pandas(ldf).repartition(3),
        ray.data.from_pandas(rdf).repartition(2),
        left_cols=("lid",),
        right_cols=("rid",),
        left_span=("start", "stop"),
        right_span=("start", "stop"),
        bucket=bucket,
    ).to_pandas()
    got = sorted(zip(out["lid"], out["rid"], out["overlap_sec"]))
    assert got == _brute(ldf, rdf)
    # exactly-once even when a pair shares many buckets
    assert not out.duplicated(["lid", "rid"]).any()


def test_key_match_and_dtypes():
    ldf = pd.DataFrame(
        {"lid": [1, 2], "k": ["a", "b"], "start": [0, 0], "stop": [10, 10]}
    )
    rdf = pd.DataFrame(
        {"rid": [7, 8], "k": ["a", "a"], "start": [5, 20], "stop": [6, 30]}
    )
    out = interval_join(
        ray.data.from_pandas(ldf),
        ray.data.from_pandas(rdf),
        left_cols=("lid",),
        right_cols=("rid",),
        left_span=("start", "stop"),
        right_span=("start", "stop"),
        key="k",
        bucket=4,
    ).to_pandas()
    assert out[["lid", "rid"]].values.tolist() == [[1, 7]]
    # integer dtypes survive the padded union
    assert out["lid"].dtype == np.int64 and out["rid"].dtype == np.int64


def test_no_overlaps_yields_empty_with_schema():
    ldf = pd.DataFrame({"lid": [1], "start": [0], "stop": [1]})
    rdf = pd.DataFrame({"rid": [2], "start": [100], "stop": [101]})
    out = interval_join(
        ray.data.from_pandas(ldf),
        ray.data.from_pandas(rdf),
        left_cols=("lid",),
        right_cols=("rid",),
        left_span=("start", "stop"),
        right_span=("start", "stop"),
        bucket=10,
    ).to_pandas()
    assert len(out) == 0


def test_bad_bucket_rejected():
    with pytest.raises(ValueError):
        interval_join(
            None, None, ("a",), ("b",), ("s", "e"), ("s", "e"), bucket=0
        )
