"""Hypothesis properties for the kernel-level pieces of the newest
operators — pure-function surfaces only (no Ray session needed):
Levenshtein DP, hash_bucket split ranges, tile-coverage arithmetic,
and BM25 monotonicity."""

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pyrosar_ray.stages.dedup_text import levenshtein_small
from pyrosar_ray.stages.sampling import hash_bucket

short = st.text(alphabet="abcd", min_size=0, max_size=8)


@settings(max_examples=150, deadline=None)
@given(short, short)
def test_levenshtein_metric_axioms(a, b):
    d = levenshtein_small(a, b)
    assert d == levenshtein_small(b, a)  # symmetry
    assert (d == 0) == (a == b)  # identity
    assert d <= max(len(a), len(b))  # upper bound
    assert d >= abs(len(a) - len(b))  # lower bound


@settings(max_examples=80, deadline=None)
@given(short, short, short)
def test_levenshtein_triangle_inequality(a, b, c):
    assert levenshtein_small(a, c) <= (
        levenshtein_small(a, b) + levenshtein_small(b, c)
    )


@settings(max_examples=60, deadline=None)
@given(short, st.integers(min_value=0, max_value=7), st.sampled_from("abcd"))
def test_levenshtein_single_edit_is_one(s, pos, ch):
    pos = min(pos, len(s))
    ins = s[:pos] + ch + s[pos:]
    assert levenshtein_small(s, ins) == (0 if ins == s else 1)
    if s:
        p = min(pos, len(s) - 1)
        sub = s[:p] + ch + s[p + 1:]
        assert levenshtein_small(s, sub) == (0 if sub == s else 1)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.integers(min_value=-(2**62), max_value=2**62), min_size=1,
             max_size=200),
    st.integers(min_value=1, max_value=1000),
)
def test_hash_bucket_range_and_determinism(ids, buckets):
    arr = np.asarray(ids, dtype=np.int64)
    b = hash_bucket(arr, buckets)
    assert ((b >= 0) & (b < buckets)).all()
    assert (b == hash_bucket(arr, buckets)).all()
    # congruent ids mod 2^32 collide by construction (documented)
    assert (hash_bucket(arr + (1 << 32), buckets) == b).all()


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=-17000, max_value=16000),
    st.integers(min_value=-7000, max_value=6000),
    st.integers(min_value=1, max_value=400),
    st.integers(min_value=1, max_value=400),
)
def test_tile_coverage_partition_of_bbox_area(cx0, cy0, w, h):
    """Per-tile rectangle overlaps partition the bbox area exactly."""
    cx1, cy1 = cx0 + w, cy0 + h
    lon0, lon1 = cx0 // 100, (cx1 - 1) // 100 if cx1 > cx0 else cx0 // 100
    lat0, lat1 = cy0 // 100, (cy1 - 1) // 100 if cy1 > cy0 else cy0 // 100
    total = 0
    for lat in range(lat0, lat1 + 1):
        for lon in range(lon0, lon1 + 1):
            ww = min(cx1, (lon + 1) * 100) - max(cx0, lon * 100)
            hh = min(cy1, (lat + 1) * 100) - max(cy0, lat * 100)
            assert ww >= 0 and hh >= 0
            total += ww * hh
    assert total == w * h


def _bm25_one(tf, df, n, dl, avgdl, k1=1.2, b=0.75):
    idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    return idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * (dl / avgdl)))


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=1, max_value=50),
    st.integers(min_value=1, max_value=99),
    st.integers(min_value=10, max_value=300),
)
def test_bm25_term_monotonicity(tf, df, dl):
    n, avgdl = 100, 120.0
    # more occurrences never lower the score; rarer terms score higher
    assert _bm25_one(tf + 1, df, n, dl, avgdl) >= _bm25_one(tf, df, n, dl, avgdl)
    if df > 1:
        assert _bm25_one(tf, df - 1, n, dl, avgdl) > _bm25_one(tf, df, n, dl, avgdl)
    # longer docs are penalized
    assert _bm25_one(tf, df, n, dl + 10, avgdl) < _bm25_one(tf, df, n, dl, avgdl)
