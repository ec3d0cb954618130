"""DSIR importance-weighted selection (stages/dsir.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from pyrosar_ray.stages.dsir import (
    DSIR_SCALE,
    dsir_bucket_counts,
    dsir_select,
    dsir_topk,
    dsir_weights,
)

DOCS = pd.DataFrame(
    {
        "doc_id": [1, 2, 3, 4, 5, 6],
        "text": [
            "alpha beta gamma",
            "alpha beta",
            "delta epsilon zeta eta",
            "beta beta beta",
            "",
            "theta",
        ],
        "source": ["tgt", "tgt", "raw", "raw", "raw", "raw"],
    }
)


def _grams(text: str) -> list[str]:
    toks = text.split(" ")
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _hash32(tok: str) -> int:
    h = 14695981039346656037
    raw = tok.encode()[:16].ljust(16, b"\0")
    for b in raw:
        h = ((h ^ b) * 1099511628211) % (1 << 64)
    return (h >> 32) ^ (h & 0xFFFFFFFF)


def _brute(n_buckets: int = 64):
    t = np.zeros(n_buckets, dtype=np.int64)
    r = np.zeros(n_buckets, dtype=np.int64)
    for _, row in DOCS.iterrows():
        for g in _grams(row["text"]):
            b = _hash32(g) % n_buckets
            r[b] += 1
            if row["source"] == "tgt":
                t[b] += 1
    t_tot, r_tot = int(t.sum()) + n_buckets, int(r.sum()) + n_buckets
    w = np.array(
        [
            (int(ti) + 1) * r_tot * DSIR_SCALE // ((int(ri) + 1) * t_tot)
            - DSIR_SCALE
            for ti, ri in zip(t, r)
        ],
        dtype=np.int64,
    )
    scores = {
        row["doc_id"]: sum(w[_hash32(g) % n_buckets] for g in _grams(row["text"]))
        for _, row in DOCS.iterrows()
    }
    return t, r, w, scores


def test_bucket_counts_match_bruteforce():
    ds = ray.data.from_pandas(DOCS)
    got = dsir_bucket_counts(ds, ("tgt",), n_buckets=64).to_pandas()
    t, r, _, _ = _brute()
    for _, row in got.iterrows():
        assert t[row["bucket"]] == row["t_cnt"]
        assert r[row["bucket"]] == row["r_cnt"]
    assert got["r_cnt"].sum() == r.sum() and got["t_cnt"].sum() == t.sum()


def test_scores_and_topk_match_bruteforce():
    ds = ray.data.from_pandas(DOCS)
    counts = dsir_bucket_counts(ds, ("tgt",), n_buckets=64)
    w = dsir_weights(counts, n_buckets=64)
    _, _, w_ref, scores_ref = _brute()
    assert np.array_equal(w, w_ref)
    out = (
        dsir_select(ds, ray.put(w), n_buckets=64, k=6)
        .to_pandas()
        .set_index("doc_id")["score"]
    )
    assert dict(out) == scores_ref
    # target-like docs outrank disjoint-vocabulary raw docs
    assert out[1] > out[3] and out[2] > out[3]


def test_topk_truncates_with_deterministic_ties():
    ds = ray.data.from_pandas(DOCS)
    out = dsir_topk(ds, ("tgt",), n_buckets=64, k=3).to_pandas()
    assert len(out) == 3
    # descending scores; ties impossible to assert here but ordering is
    _, _, _, scores_ref = _brute()
    want = sorted(scores_ref.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert list(zip(out["doc_id"], out["score"])) == want


def test_empty_and_single_token_docs():
    # doc 5 (empty text) hashes the single '' unigram; doc 6 has no bigram
    ds = ray.data.from_pandas(DOCS)
    out = dsir_topk(ds, ("tgt",), n_buckets=64, k=6).to_pandas()
    assert set(out["doc_id"]) == {1, 2, 3, 4, 5, 6}


def test_ccnet_buckets_exact_scores():
    from pyrosar_ray.stages.text import CCNET_SCALE, ccnet_buckets

    docs = ray.data.from_pandas(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": ["a b a b", "a b c", "c c c", "x"],
                "lang": ["en", "en", "de", "de"],
            }
        )
    )
    out = (
        ccnet_buckets(docs).to_pandas().set_index("doc_id").sort_index()
    )
    S = CCNET_SCALE
    # hand-computed: counts ab=3 ba=1 bc=1 cc=2; ctx a=3 b=2 c=2
    assert out.loc[1, "score"] == (S + S // 2 + S) // 3
    assert out.loc[2, "score"] == (S + S // 2) // 2
    assert out.loc[3, "score"] == S
    assert out.loc[4, "score"] == 0  # no bigrams
    # per-language terciles of 2 docs → buckets {0, 1}
    assert out.loc[2, "bucket"] == 0 and out.loc[1, "bucket"] == 1
    assert out.loc[4, "bucket"] == 0 and out.loc[3, "bucket"] == 1
    # regression guard for the pandas NUL-concat pitfall: a nonzero
    # score proves the bigram keys actually hit the broadcast LM table
    assert (out["score"] > 0).sum() == 3


def test_mad_anomalies_bruteforce():
    import numpy as np

    from pyrosar_ray.stages.anomaly import mad_anomalies

    rng = np.random.default_rng(13)
    vals = np.concatenate([rng.normal(50, 2, 200), [500.0, -100.0]])
    df = pd.DataFrame(
        {
            "event_id": np.arange(len(vals), dtype=np.int64),
            "event_type": ["a"] * len(vals),
            "value": vals,
        }
    )
    out = mad_anomalies(ray.data.from_pandas(df)).to_pandas()
    v = np.floor(vals * 100 + 0.5).astype(np.int64)
    sv = np.sort(v)
    m = sv[(len(v) + 1) // 2 - 1]
    d = np.sort(np.abs(v - m))
    mad = d[(len(v) + 1) // 2 - 1]
    want = set(np.flatnonzero(np.abs(v - m) > 3 * mad).tolist())
    assert set(out["event_id"]) == want
    # the planted outliers must be flagged, the bulk must not
    assert {200, 201} <= want and len(want) < 30
