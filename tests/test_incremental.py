"""incremental_stats: stored-state fold == full recompute, bit-exact."""

import numpy as np
import pandas as pd
import ray

from pyrosar_ray.stages.incremental import (
    incremental_stats,
    keyed_stats_partials,
    write_state,
)


def _frame(n, seed):
    rng = np.random.RandomState(seed)
    return pd.DataFrame(
        {
            "k": rng.choice(["a", "b", "c", "d"], size=n),
            "c": rng.randint(-10_000, 10_000, size=n).astype(np.int64),
        }
    )


def _full(df):
    g = df.groupby("k")["c"]
    return (
        pd.DataFrame(
            {
                "n": g.count().astype("int64"),
                "sum_c": g.sum(),
                "min_c": g.min(),
                "max_c": g.max(),
            }
        )
        .reset_index()
        .rename(columns={"k": "k"})
        .sort_values("k", ignore_index=True)
    )


def test_fold_equals_recompute(tmp_path):
    old, delta = _frame(500, 1), _frame(300, 2)
    state = write_state(
        keyed_stats_partials(
            ray.data.from_pandas(old).repartition(4), "k", "c"
        ),
        str(tmp_path / "epoch0.parquet"),
    )
    got = (
        incremental_stats(
            [state], ray.data.from_pandas(delta).repartition(3), "k", "c"
        )
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    expect = _full(pd.concat([old, delta], ignore_index=True))
    pd.testing.assert_frame_equal(
        got[["k", "n", "sum_c", "min_c", "max_c"]], expect
    )


def test_multi_epoch_state(tmp_path):
    e0, e1, delta = _frame(200, 3), _frame(200, 4), _frame(100, 5)
    paths = [
        write_state(
            keyed_stats_partials(ray.data.from_pandas(df), "k", "c"),
            str(tmp_path / f"epoch{i}.parquet"),
        )
        for i, df in enumerate([e0, e1])
    ]
    got = (
        incremental_stats([*paths], ray.data.from_pandas(delta), "k", "c")
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    expect = _full(pd.concat([e0, e1, delta], ignore_index=True))
    pd.testing.assert_frame_equal(
        got[["k", "n", "sum_c", "min_c", "max_c"]], expect
    )


def test_rerun_overwrites_never_double_counts(tmp_path):
    old = _frame(150, 6)
    path = str(tmp_path / "e.parquet")
    for _ in range(2):  # epoch rerun = overwrite
        write_state(
            keyed_stats_partials(ray.data.from_pandas(old), "k", "c"),
            path,
        )
    got = (
        incremental_stats([path], ray.data.from_pandas(_frame(50, 7)), "k", "c")
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    expect = _full(pd.concat([old, _frame(50, 7)], ignore_index=True))
    pd.testing.assert_frame_equal(
        got[["k", "n", "sum_c", "min_c", "max_c"]], expect
    )
