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


def _docs(ids, texts):
    return ray.data.from_pandas(
        pd.DataFrame({"doc_id": np.array(ids, dtype=np.int64),
                      "text": texts})
    ).repartition(3)


def test_incremental_dedup_epoch_contract(tmp_path):
    from pyrosar_ray.stages.incremental import (
        digest_winners,
        incremental_dedup,
        write_dedup_state,
    )

    # epoch 1: "aa" and "bb" seen; epoch 2 delta re-sends "bb" plus two
    # copies of the new "cc" and one "dd"
    e1 = _docs([0, 2, 4], ["aa", "bb", "aa"])
    e2 = _docs([1, 3, 5, 7], ["bb", "cc", "cc", "dd"])
    state = str(tmp_path / "st")
    write_dedup_state(digest_winners(e1), state)
    out = (
        incremental_dedup(state, e2)
        .to_pandas()
        .sort_values("keeper", ignore_index=True)
    )
    # "bb" filtered by state; "cc" first-wins at id 3 with 2 copies
    assert out["keeper"].tolist() == [3, 7]
    assert out["n"].tolist() == [2, 1]

    # appending this epoch's digests advances the state: a third epoch
    # re-sending "cc"/"dd" emits nothing
    from pyrosar_ray.stages.incremental import write_dedup_state as _w

    _w(incremental_dedup(state, e2), str(tmp_path / "st2"))
    e3 = _docs([9, 11], ["cc", "dd"])
    out3 = incremental_dedup(
        [state, str(tmp_path / "st2")], e3
    ).to_pandas()
    assert len(out3) == 0


def test_incremental_dedup_matches_full_recompute(tmp_path):
    """Filter-by-state over the delta == full exact dedup restricted to
    content unseen in epoch 1 (the SQL twin's contract)."""
    from pyrosar_ray.stages.incremental import (
        digest_winners,
        incremental_dedup,
        write_dedup_state,
    )

    rng = np.random.RandomState(12)
    texts = [f"t{v}" for v in rng.randint(0, 40, 200)]
    ids = np.arange(200, dtype=np.int64)
    old_ids = ids[ids % 2 == 0]
    new_ids = ids[ids % 2 == 1]
    e1 = _docs(old_ids, [texts[i] for i in old_ids])
    e2 = _docs(new_ids, [texts[i] for i in new_ids])
    state = str(tmp_path / "st")
    write_dedup_state(digest_winners(e1), state)
    got = (
        incremental_dedup(state, e2)
        .to_pandas()
        .sort_values("keeper", ignore_index=True)
    )
    seen = {texts[i] for i in old_ids}
    import collections

    cnt = collections.Counter(texts[i] for i in new_ids if texts[i] not in seen)
    first = {}
    for i in new_ids:
        t = texts[i]
        if t not in seen and t not in first:
            first[t] = i
    expect = sorted((first[t], cnt[t]) for t in first)
    assert list(zip(got["keeper"], got["n"])) == expect
