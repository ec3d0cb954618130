"""HyperLogLog register sketch (stages/sketch.py)."""

import numpy as np
import pandas as pd
import pytest
import ray

from pyrosar_ray.stages.sketch import _rho, _token_hash32, hll_estimate, hll_registers


def test_rho_matches_leading_zero_definition():
    width = 24
    rem = np.array([0, 1, 2, 3, (1 << 23), (1 << 24) - 1], dtype=np.int64)
    want = []
    for r in rem:
        if r == 0:
            want.append(width + 1)
        else:
            want.append(width - int(r).bit_length() + 1)
    assert _rho(rem, width).tolist() == want


def test_token_hash32_deterministic_and_spread():
    toks = pd.Series([f"tok{i}" for i in range(5000)])
    h = _token_hash32(toks)
    assert (h == _token_hash32(toks)).all()
    assert h.max() < (1 << 32)
    # top-8-bit buckets roughly uniform
    counts = np.bincount((h >> np.uint64(24)).astype(int), minlength=256)
    assert counts.min() > 0 and counts.max() < 60


def test_hll_estimate_accuracy_large_vocab():
    """Estimator within the standard ~1.04/sqrt(m) band on 50k distinct."""
    toks = pd.Series([f"word-{i}" for i in range(50_000)])
    h = _token_hash32(toks)
    b, width = 8, 24
    bucket = (h >> np.uint64(width)).astype(np.int64)
    rem = (h & np.uint64((1 << width) - 1)).astype(np.int64)
    df = pd.DataFrame({"bucket": bucket, "rho": _rho(rem, width)})
    reg = df.groupby("bucket")["rho"].max().reset_index()
    est = hll_estimate(reg, b=8)
    assert abs(est - 50_000) / 50_000 < 0.15  # 3 sigma at m=256 is ~0.2
    # merge property: registers of two halves merge to the full table
    regA = df.iloc[:25_000].groupby("bucket")["rho"].max()
    regB = df.iloc[25_000:].groupby("bucket")["rho"].max()
    merged = pd.concat([regA, regB], axis=1).max(axis=1)
    full = df.groupby("bucket")["rho"].max()
    assert (merged.reindex(full.index).astype(int) == full).all()


def test_hll_registers_pipeline(sf_dir):
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    reg = hll_registers(docs, b=8).to_pandas()
    assert (reg["bucket"] >= 0).all() and (reg["bucket"] < 256).all()
    assert (reg["rho"] >= 1).all() and (reg["rho"] <= 25).all()
    assert reg["bucket"].is_unique
    # estimate in a sane band for the tiny synthetic vocabulary
    est = hll_estimate(reg, b=8)
    assert 5 <= est <= 200


def test_hll_registers_rejects_bad_b():
    with pytest.raises(ValueError):
        hll_registers(None, b=0)


def test_cms_counters_pipeline_and_query(sf_dir):
    from pyrosar_ray.stages.sketch import cms_counters, cms_query

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    tab = cms_counters(docs, depth=4, lw=10).to_pandas()
    assert set(tab.columns) == {"d", "pos", "cnt"}
    assert (tab["d"] >= 0).all() and (tab["d"] < 4).all()
    assert (tab["pos"] >= 0).all() and (tab["pos"] < 1024).all()
    assert not tab.duplicated(["d", "pos"]).any()
    # every sketch row preserves total mass
    totals = tab.groupby("d")["cnt"].sum()
    assert totals.nunique() == 1
    # point estimates never under-count: compare vs exact counts
    texts = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])["text"]
    exact = texts.str.split(" ").explode().dropna().value_counts()
    toks = list(exact.index[:20])
    est = cms_query(tab, toks, depth=4, lw=10)
    for t, e in zip(toks, est):
        assert e >= exact[t]
    # unseen token estimates stay below the heaviest true count
    ghost = cms_query(tab, ["zzz-unseen-token"], depth=4, lw=10)
    assert ghost[0] <= int(exact.max())


def test_cms_counters_rejects_bad_params():
    from pyrosar_ray.stages.sketch import cms_counters

    with pytest.raises(ValueError):
        cms_counters(None, depth=0)
    with pytest.raises(ValueError):
        cms_counters(None, lw=0)
