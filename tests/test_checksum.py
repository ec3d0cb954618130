"""source_checksums: digest parity, order-insensitivity, XOR aggregate."""

import duckdb
import numpy as np
import pandas as pd
import ray

from pyrosar_ray.stages.checksum import row_digest64, source_checksums, xor_agg


def test_digest_matches_duckdb_md5_number_lower():
    texts = ["abc", "", "pyroSAR", "émoji ✓", "a" * 1000]
    got = row_digest64(texts)
    want = [
        duckdb.sql("SELECT md5_number_lower(?)", params=[t]).fetchone()[0]
        for t in texts
    ]
    assert [int(x) for x in got] == [int(w) for w in want]


def _frame(n=200, seed=3):
    rng = np.random.RandomState(seed)
    return pd.DataFrame(
        {
            "source": rng.choice(["a", "b", "c"], size=n),
            "text": [f"doc-{i}-{rng.randint(1e6)}" for i in range(n)],
        }
    )


def test_block_structure_invariance():
    df = _frame()
    outs = []
    for blocks in (1, 7):
        ds = ray.data.from_pandas(df).repartition(blocks)
        out = (
            source_checksums(ds, "source", "text")
            .to_pandas()
            .sort_values("source", ignore_index=True)
        )
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_detects_single_row_change():
    df = _frame()
    base = source_checksums(
        ray.data.from_pandas(df), "source", "text"
    ).to_pandas()
    df2 = df.copy()
    df2.loc[5, "text"] = df2.loc[5, "text"] + "!"
    changed = source_checksums(
        ray.data.from_pandas(df2), "source", "text"
    ).to_pandas()
    merged = base.merge(changed, on="source", suffixes=("_a", "_b"))
    diff = merged[
        (merged.xh_a != merged.xh_b) | (merged.xl_a != merged.xl_b)
    ]
    assert list(diff["source"]) == [df.loc[5, "source"]]
    assert (merged.n_a == merged.n_b).all()


def test_xor_agg_merge_is_commutative():
    a = xor_agg("x")
    assert a.merge(5, 3) == a.merge(3, 5) == 6
