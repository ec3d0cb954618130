"""Bloom membership prefilter (stages/membership.py)."""

import numpy as np
import pandas as pd
import pytest
import ray

from pyrosar_ray.stages.membership import (
    bloom_new_rows,
    bloom_positions,
    build_bloom,
)


def test_positions_shape_and_determinism():
    ids = np.arange(1000, dtype=np.int64)
    p = bloom_positions(ids, 4096, 3)
    assert p.shape == (1000, 3)
    assert (p >= 0).all() and (p < 4096).all()
    assert (p == bloom_positions(ids, 4096, 3)).all()
    # ids beyond 2^32 reduce mod 2^32 first
    assert (
        bloom_positions(np.array([7]), 512, 2)
        == bloom_positions(np.array([7 + (1 << 32)]), 512, 2)
    ).all()


def test_no_false_negatives_and_bounded_false_positives():
    rng = np.random.default_rng(11)
    ref_ids = rng.choice(100_000, 2000, replace=False).astype(np.int64)
    ref = ray.data.from_pandas(pd.DataFrame({"id": ref_ids})).repartition(4)
    bloom_ref, nbits = build_bloom(ref, "id", m_bits=1 << 16, k=4)
    assert 0 < nbits <= 8000
    cand_ids = np.arange(100_000, dtype=np.int64)
    cand = ray.data.from_pandas(pd.DataFrame({"id": cand_ids})).repartition(4)
    kept = bloom_new_rows(
        cand, ref, "id", m_bits=1 << 16, k=4
    ).to_pandas()["id"].to_numpy()
    # NO false negatives: every reference id was dropped
    assert not np.isin(ref_ids, kept).any()
    # false-positive drops are rare at this sizing
    truly_new = np.setdiff1d(cand_ids, ref_ids)
    fp = len(truly_new) - len(kept)
    assert 0 <= fp < len(truly_new) * 0.01


def test_build_rejects_bad_params():
    with pytest.raises(ValueError):
        build_bloom(None, "id", m_bits=1, k=0)
