"""CDC latest-by-key compaction (stages/compact.py)."""

import numpy as np
import pandas as pd
import pytest
import ray

from pyrosar_ray.stages.compact import latest_by_key


def _changelog(n_keys=40, versions=6, seed=3):
    rng = np.random.default_rng(seed)
    keys = np.repeat(np.arange(n_keys, dtype=np.int64), versions)
    seq = rng.permutation(len(keys)).astype(np.int64)
    return pd.DataFrame(
        {
            "id": keys,
            "seq": seq,
            "payload": (keys * 1000 + seq).astype(np.int64),
            "name": [f"v{s}" for s in seq],
        }
    )


def _expected(df, tiebreak=None):
    by = ["seq"] if tiebreak is None else ["seq", tiebreak]
    idx = df.sort_values(by).groupby("id").tail(1).index
    return (
        df.loc[idx].sort_values("id").reset_index(drop=True)
    )


def test_latest_by_key_full_row_argmax():
    df = _changelog()
    out = (
        latest_by_key(
            ray.data.from_pandas(df).repartition(5),
            key="id",
            seq="seq",
            num_partitions=4,
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, _expected(df))
    assert out["payload"].dtype == np.int64  # dtypes survive


def test_latest_by_key_tiebreak_deterministic():
    # duplicate (id, seq) pairs across different blocks: the tiebreak
    # column must pick the same winner at any block split
    df = pd.DataFrame(
        {
            "id": np.array([1, 1, 1, 2, 2], dtype=np.int64),
            "seq": np.array([5, 5, 3, 7, 7], dtype=np.int64),
            "tb": np.array([10, 20, 30, 40, 50], dtype=np.int64),
            "v": ["a", "b", "c", "d", "e"],
        }
    )
    for nblocks in (1, 3, 5):
        out = (
            latest_by_key(
                ray.data.from_pandas(df).repartition(nblocks),
                key="id",
                seq="seq",
                tiebreak="tb",
                num_partitions=3,
            )
            .to_pandas()
            .sort_values("id")
            .reset_index(drop=True)
        )
        assert out["v"].tolist() == ["b", "e"]


def test_latest_by_key_single_version_identity():
    df = pd.DataFrame(
        {"id": np.arange(10, dtype=np.int64), "seq": np.arange(10, dtype=np.int64)}
    )
    out = (
        latest_by_key(ray.data.from_pandas(df), key="id", seq="seq")
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, df)


def test_latest_by_key_missing_column_rejected():
    df = pd.DataFrame({"id": [1], "seq": [1]})
    with pytest.raises(ValueError, match="not in dataset"):
        latest_by_key(ray.data.from_pandas(df), key="id", seq="nope")


def test_latest_by_key_combiner_prunes_before_exchange():
    """The per-batch combiner must shrink a heavy changelog to its
    per-batch key count before the exchange (scale contract)."""
    import pyarrow as pa

    from pyrosar_ray.stages.compact import _keep_latest

    df = _changelog(n_keys=8, versions=100)
    tab = pa.Table.from_pandas(df, preserve_index=False)
    out = _keep_latest(tab, "id", "seq", None)
    assert len(out) == 8  # 800 rows → 8 survivors locally
    exp = _expected(df)
    got = out.to_pandas().sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)
