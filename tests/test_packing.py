"""Sequence packing (stages/packing.py): next-fit bin invariants."""

import numpy as np
import pandas as pd
import pytest
import ray

from pyrosar_ray.stages.packing import _pack_group, pack_sequences


def _ref_pack(toks, budget):
    """Row-at-a-time next-fit reference."""
    bins, offs = [], []
    b, fill = 0, 0
    first = True
    for t in toks:
        if first:
            b, fill = 0, t
            first = False
        elif fill + t <= budget:
            fill += t
        else:
            b, fill = b + 1, t
        bins.append(b)
        offs.append(fill - t)
    return bins, offs


@pytest.mark.parametrize("budget", [1, 7, 64, 1000])
def test_pack_group_matches_scalar_reference(budget):
    rng = np.random.default_rng(42)
    toks = rng.integers(1, 120, size=300)
    df = pd.DataFrame(
        {"doc_id": np.arange(300, dtype=np.int64), "n_tokens": toks}
    )
    out = _pack_group(df, budget, "doc_id")
    bins, offs = _ref_pack(toks.tolist(), budget)
    assert out["bin_idx"].tolist() == bins
    assert out["bin_offset"].tolist() == offs


def test_pack_group_invariants():
    rng = np.random.default_rng(7)
    toks = rng.integers(1, 50, size=500)
    df = pd.DataFrame(
        {"doc_id": np.arange(500, dtype=np.int64), "n_tokens": toks}
    )
    out = _pack_group(df, 128, "doc_id")
    g = out.groupby("bin_idx")["n_tokens"].sum()
    # every bin within budget (no oversize rows here: max token 49 < 128)
    assert (g <= 128).all()
    # bins are dense 0..nbins-1 and non-decreasing in id order
    assert sorted(g.index) == list(range(len(g)))
    assert (np.diff(out["bin_idx"].to_numpy()) >= 0).all()
    # next-fit tightness: consecutive bins couldn't merge their boundary doc
    starts = out.drop_duplicates("bin_idx", keep="first").set_index("bin_idx")
    for b in range(1, len(g)):
        assert g[b - 1] + starts.loc[b, "n_tokens"] > 128


def test_pack_group_oversize_gets_own_bin():
    df = pd.DataFrame(
        {"doc_id": [1, 2, 3, 4], "n_tokens": [10, 999, 10, 10]}
    )
    out = _pack_group(df, 64, "doc_id").set_index("doc_id")
    assert out.loc[2, "bin_idx"] != out.loc[1, "bin_idx"]
    assert out.loc[3, "bin_idx"] != out.loc[2, "bin_idx"]
    assert out.loc[2, "bin_offset"] == 0
    # docs 3 and 4 pack together after the oversize bin
    assert out.loc[3, "bin_idx"] == out.loc[4, "bin_idx"]


def test_pack_sequences_per_key_and_deterministic(sf_dir):
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    a = pack_sequences(docs, budget=64).to_pandas()
    b = pack_sequences(docs, budget=64).to_pandas()
    key = ["source", "doc_id"]
    a = a.sort_values(key, ignore_index=True)
    b = b.sort_values(key, ignore_index=True)
    pd.testing.assert_frame_equal(a, b)
    # packing restarts per source: every source has a bin 0 at offset 0
    firsts = a.groupby("source").first()
    assert (firsts["bin_idx"] == 0).all()
    assert (firsts["bin_offset"] == 0).all()


def test_pack_sequences_rejects_bad_budget():
    with pytest.raises(ValueError):
        pack_sequences(None, budget=0)
