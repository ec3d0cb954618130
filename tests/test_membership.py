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


def test_bloom_anti_join_is_exact_even_with_tiny_filter(sf_dir):
    """m=64 saturates the filter — nearly everything rides the exact
    path — and the result is still the exact anti-join."""
    from pyrosar_ray.stages.membership import bloom_anti_join

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )
    ref = docs.filter(lambda r: r["doc_id"] % 3 == 0).select_columns(["doc_id"])
    out = bloom_anti_join(docs, ref, "doc_id", m_bits=64, k=2).to_pandas()
    base = docs.to_pandas()
    want = base[base["doc_id"] % 3 != 0].sort_values("doc_id", ignore_index=True)
    got = out.sort_values("doc_id", ignore_index=True)
    pd.testing.assert_frame_equal(got, want)


def test_bloom_inner_join_exact_and_prunes():
    import pandas as pd

    from pyrosar_ray.stages.join import equi_join
    from pyrosar_ray.stages.membership import (
        BloomFilterNew,
        bloom_inner_join,
        build_bloom,
    )

    rng = np.random.RandomState(11)
    left = pd.DataFrame(
        {
            "k": rng.randint(0, 10_000, size=5_000).astype(np.int64),
            "a": np.arange(5_000, dtype=np.int64),
        }
    )
    right = pd.DataFrame(
        {"k": np.arange(0, 10_000, 250, dtype=np.int64)}
    ).assign(b=lambda d: d.k * 2)
    lds = ray.data.from_pandas(left).repartition(4)
    rds = ray.data.from_pandas(right)
    got = (
        bloom_inner_join(lds, rds, on="k")
        .to_pandas()
        .sort_values(["k", "a"], ignore_index=True)
    )
    want = (
        equi_join(lds, rds.map_batches(
            lambda t: t.rename_columns(["rk", "b"]), batch_format="pyarrow"
        ), on="k", right_on="rk")
        .to_pandas()
        .sort_values(["k", "a"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(got.sort_index(axis=1), want.sort_index(axis=1))

    # the runtime filter actually prunes: survivors << probe rows
    bloom_ref, _ = build_bloom(rds, "k")
    kept = lds.map_batches(
        BloomFilterNew,
        batch_format="pyarrow",
        concurrency=1,
        fn_constructor_args=(bloom_ref, "k"),
        fn_constructor_kwargs={"keep": "maybe"},
    ).count()
    assert kept < len(left) * 0.2  # 40/10000 keys + epsilon fp
    assert kept >= len(got)  # no false negatives: every match survives


def test_bloom_keep_param_validated():
    import pytest as _pytest

    from pyrosar_ray.stages.membership import BloomFilterNew, build_bloom

    ref, _ = build_bloom(ray.data.range(10), "id", m_bits=64)
    with _pytest.raises(ValueError, match="absent.*maybe"):
        BloomFilterNew(ref, "id", keep="bogus")
