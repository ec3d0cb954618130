"""Text analysis + dedup stages: kernels and Ray pipelines."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from pyrosar_ray.stages.dedup_text import (
    MinHasher,
    exact_dedup,
    jaccard_pairs,
    md5_digests,
    minhash_candidate_pairs,
    shingle_hashes,
    simhash,
)
from pyrosar_ray.stages.text import (
    LangID,
    quality_scores,
    rolling_fingerprint,
    token_stats,
)

DOCS = pa.table(
    {
        "doc_id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
        "text": pa.array(
            [
                "the quick brown fox jumps over the lazy dog",
                "the quick brown fox jumps over the lazy dog",  # exact dup of 1
                "the quick brown fox leaps over the lazy dog",  # near dup
                "completely different words here entirely now",
                "a b",
            ]
        ),
        "source": pa.array(["s1", "s1", "s1", "s1", "s2"]),
    }
)


def test_token_stats():
    out = token_stats(ray.data.from_arrow(DOCS)).to_pandas().sort_values("doc_id")
    assert out["n_tokens"].tolist() == [9, 9, 9, 6, 2]
    assert out["n_retokens"].tolist() == [9, 9, 9, 6, 2]


def test_quality_scores():
    out = quality_scores(ray.data.from_arrow(DOCS)).to_pandas().sort_values("doc_id")
    assert out["n_uniq_tokens"].tolist() == [8, 8, 8, 6, 2]
    # 'the' twice per fox doc; 'a' once in doc 5
    assert out["n_stopwords"].tolist() == [2, 2, 2, 0, 1]
    assert out["stop_ratio"].iloc[0] == 2 / 9


def test_exact_dedup():
    out = exact_dedup(ray.data.from_arrow(DOCS)).to_pandas()
    assert len(out) == 4  # 5 docs, one exact dup
    dup_row = out[out["n"] == 2]
    assert dup_row["keeper"].tolist() == [1]
    assert set(out["text_hash"]) == set(md5_digests(set(DOCS["text"].to_pylist())))


def test_rolling_fingerprint_deterministic():
    a = rolling_fingerprint(["hello world", "hello world", "hello worle"])
    assert a[0] == a[1] != a[2]
    # matches a plain byte-wise Horner evaluation
    acc = 0
    for byte in b"hello world":
        acc = (acc * 1_000_003 + byte) % ((1 << 61) - 1)
    assert a[0] == acc


def test_simhash_properties():
    s = simhash(DOCS["text"].to_pylist())
    assert s[0] == s[1]  # identical text → identical simhash
    ham_near = bin(int(np.uint64(s[0])) ^ int(np.uint64(s[2]))).count("1")
    ham_far = bin(int(np.uint64(s[0])) ^ int(np.uint64(s[3]))).count("1")
    assert ham_near < ham_far


def test_minhash_similarity_estimate():
    h = MinHasher()
    a = shingle_hashes(DOCS["text"][0].as_py())
    c = shingle_hashes(DOCS["text"][2].as_py())
    sig_a, sig_c = h.signature(a), h.signature(c)
    est = (sig_a == sig_c).mean()
    inter = len(np.intersect1d(a, c))
    true_j = inter / (len(a) + len(c) - inter)
    assert abs(est - true_j) < 0.3


def test_minhash_candidate_pairs():
    out = minhash_candidate_pairs(ray.data.from_arrow(DOCS)).to_pandas()
    pairs = set(map(tuple, out[["id_a", "id_b"]].to_numpy()))
    assert (1, 2) in pairs  # exact dup always a candidate
    assert (1, 4) not in pairs and (2, 4) not in pairs


def test_jaccard_pairs():
    out = jaccard_pairs(ray.data.from_arrow(DOCS), threshold=0.5).to_pandas()
    pairs = {(a, b): j for a, b, j in out.to_numpy()}
    assert pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs  # 8∩ of 8+8-8... near dup passes 0.5
    assert all(a < b for a, b in pairs)


def test_langid_roundtrip():
    texts = ["aaa bbb aaa bbb aaa"] * 5 + ["zzz yyy zzz yyy zzz"] * 5
    langs = ["aa"] * 5 + ["zz"] * 5
    profiles = LangID.fit_profiles(texts, langs)
    ds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": range(10), "text": texts})
    )
    import ray as _ray

    from pyrosar_ray.stages.text import lang_id

    out = lang_id(ds, profiles, concurrency=1).to_pandas().sort_values("doc_id")
    assert out["lang_pred"].tolist() == langs


def test_term_topk():
    from pyrosar_ray.stages.text import term_topk

    docs = pd.DataFrame(
        {"text": ["b a a", "a b c", "c c b  d"]}  # note the double space → empty token
    )
    out = term_topk(ray.data.from_pandas(docs).repartition(3), k=3).to_pandas()
    # counts: a=3 b=3 c=3 d=1 ''=1 (double space keeps the empty token)
    assert out[["token", "n"]].values.tolist() == [["a", 3], ["b", 3], ["c", 3]]


def test_term_topk_tie_break_is_lexicographic():
    from pyrosar_ray.stages.text import term_topk

    docs = pd.DataFrame({"text": ["x y", "y x", "z z"]})
    out = term_topk(ray.data.from_pandas(docs), k=2).to_pandas()
    assert out["token"].tolist() == ["x", "y"]  # 2,2,2 tie → lexicographic


def test_token_count_quantiles():
    import math

    from pyrosar_ray.stages.text import token_count_quantiles

    rng = np.random.default_rng(11)
    n_tok = rng.integers(1, 40, 1000)
    texts = [" ".join(["w"] * k) for k in n_tok]
    qs = [0.1, 0.5, 0.9, 1.0]
    out = token_count_quantiles(
        ray.data.from_pandas(pd.DataFrame({"text": texts})).repartition(6), qs=qs
    ).to_pandas()
    srt = np.sort(n_tok)
    for q, v in zip(out["q"], out["v"]):
        rank = max(1, math.ceil(q * len(srt)))
        assert v == srt[rank - 1]


def test_connected_components_union_find():
    from pyrosar_ray.stages.dedup_text import connected_components

    pairs = pd.DataFrame(
        {"id_a": [1, 2, 10, 20, 5], "id_b": [2, 3, 11, 21, 1]}
    )  # components {1,2,3,5}, {10,11}, {20,21}
    out = connected_components(pairs)
    got = dict(zip(out["doc_id"], out["cluster_id"]))
    assert got == {1: 1, 2: 1, 3: 1, 5: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_dup_clusters_pipeline():
    from pyrosar_ray.stages.dedup_text import dup_clusters

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": ["a b c", "a b c", "a b x", "zz qq ww"],
            "source": ["s", "s", "s", "s"],
        }
    )
    out = dup_clusters(ray.data.from_pandas(docs)).to_pandas()
    got = dict(zip(out["doc_id"], out["cluster_id"]))
    # 1-2 exact, 2-3 jaccard 0.5 → one component {1,2,3}; 4 has no pair
    assert got == {1: 1, 2: 1, 3: 1}


def test_cc_distributed_matches_driver_kernel():
    from pyrosar_ray.stages.dedup_text import cc_distributed, connected_components

    rng = np.random.RandomState(11)
    # several chains + a dense blob + isolated pairs, shuffled edge order
    edges = [(i, i + 1) for i in range(100, 140)]  # one long chain
    edges += [(200 + a, 200 + b) for a in range(12) for b in range(a + 1, 12)]
    edges += [(300, 301), (400, 401), (402, 400)]
    edges += [(int(a), int(b)) for a, b in rng.randint(500, 560, size=(80, 2)) if a != b]
    rng.shuffle(edges)
    pairs = pd.DataFrame({"id_a": [a for a, _ in edges], "id_b": [b for _, b in edges]})
    want = connected_components(pairs).sort_values("doc_id", ignore_index=True)
    got = (
        cc_distributed(ray.data.from_pandas(pairs).repartition(7))
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got.astype("int64"), want)


def test_dup_clusters_distributed_path_agrees():
    from pyrosar_ray.stages.dedup_text import dup_clusters

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5, 6],
            "text": ["a b c", "a b c", "a b x", "zz qq ww", "zz qq ww", "k l m"],
            "source": ["s"] * 6,
        }
    )
    ds = ray.data.from_pandas(docs)
    want = dup_clusters(ds, mode="driver").to_pandas().sort_values("doc_id", ignore_index=True)
    # driver_edge_bound=0 makes the auto policy take the distributed plan
    got = (
        dup_clusters(ds, driver_edge_bound=0)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


def test_dup_clusters_empty():
    from pyrosar_ray.stages.dedup_text import dup_clusters

    docs = pd.DataFrame(
        {"doc_id": [1, 2], "text": ["aa bb", "cc dd"], "source": ["s", "s"]}
    )
    out = dup_clusters(ray.data.from_pandas(docs))
    # Ray's to_pandas drops columns on zero-row data; the Dataset-level
    # schema is the contract
    assert out.count() == 0
    assert out.schema().names == ["doc_id", "cluster_id"]


def test_normalize_text():
    from pyrosar_ray.stages.text import normalize_text

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["Hello,  World!", "  a...b  c ", ""],
        }
    )
    out = normalize_text(ray.data.from_pandas(docs)).to_pandas().sort_values("doc_id")
    assert out["norm_text"].tolist() == ["hello world", "ab c", ""]
    assert out["norm_chars"].tolist() == [11, 4, 0]


def test_top_tf_df_terms():
    from pyrosar_ray.stages.text import top_tf_df_terms

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["a a b c", "a b b", "c c c a"],
        }
    )
    out = top_tf_df_terms(
        ray.data.from_pandas(docs).repartition(3), k=2
    ).to_pandas()
    # doc 1: a(tf2), then b/c tie tf1 → lower df first: b(df2) before c(df2)?
    # df: a=3, b=2, c=2 → tie broken by token asc: 'b'
    d1 = out[out.doc_id == 1].sort_values("rank")
    assert d1["token"].tolist() == ["a", "b"]
    assert d1["tf"].tolist() == [2, 1]
    assert d1["df"].tolist() == [3, 2]
    d3 = out[out.doc_id == 3].sort_values("rank")
    assert d3["token"].tolist() == ["c", "a"]
    assert (out.groupby("doc_id")["rank"].max() == 2).all()


def test_token_count_quantiles_by_key():
    import math

    from pyrosar_ray.stages.text import token_count_quantiles_by

    rng = np.random.default_rng(4)
    n_tok = rng.integers(1, 30, 600)
    src = np.repeat(["a", "b", "c"], 200)
    texts = [" ".join(["w"] * k) for k in n_tok]
    qs = [0.25, 0.5, 0.95]
    out = token_count_quantiles_by(
        ray.data.from_pandas(pd.DataFrame({"source": src, "text": texts})).repartition(5),
        qs=qs,
    ).to_pandas()
    assert len(out) == 9
    for s in "abc":
        vals = np.sort(n_tok[src == s])
        for q in qs:
            rank = max(1, math.ceil(q * len(vals)))
            got = out[(out.source == s) & (out.q == q)]["v"].iloc[0]
            assert got == vals[rank - 1]


def test_new_ops_tolerate_empty_input():
    from pyrosar_ray.stages.sampling import group_cap, hash_sample
    from pyrosar_ray.stages.text import (
        term_topk,
        token_count_quantiles,
        top_tf_df_terms,
    )

    empty = ray.data.from_pandas(
        pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                      "text": pd.Series([], dtype="string"),
                      "source": pd.Series([], dtype="string")})
    )
    assert token_count_quantiles(empty, qs=[0.5]).num_rows == 0
    assert term_topk(empty, k=5).count() == 0
    assert hash_sample(empty, 10).count() == 0
    assert group_cap(empty, cap=3).count() == 0
    assert top_tf_df_terms(empty, k=3).count() == 0


def test_adaptive_token_filter_median_cutoff(sf_dir):
    import ray
    from pyrosar_ray.stages.text import adaptive_token_filter

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    out = adaptive_token_filter(docs, q=0.5).to_pandas()
    base = docs.to_pandas()
    base["n"] = base["text"].str.count(" ") + 1
    for src, grp in base.groupby("source"):
        v = np.sort(grp["n"].to_numpy())
        cum_rank = max(1, int(np.ceil(0.5 * len(v))))
        cut = v[cum_rank - 1]
        want = set(grp.loc[grp["n"] >= cut, "doc_id"])
        got = set(out.loc[out["source"] == src, "doc_id"])
        assert got == want, src


def test_dup_ngram_stats_golden(sf_dir):
    """Known corpus: shared 3-gram spans counted exactly."""
    import pyarrow as pa
    import ray

    from pyrosar_ray.stages.dedup_text import dup_ngram_stats

    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
                "text": pa.array(
                    [
                        "the quick brown fox jumps",   # grams: tqb qbf bfj
                        "a quick brown fox runs",      # grams: aqb qbf bfr
                        "nothing in common here now",
                        "xy",                          # < k tokens: excluded
                    ]
                ),
            }
        )
    )
    out = (
        dup_ngram_stats(docs, k=3)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert list(out["doc_id"]) == [1, 2, 3]
    assert list(out["total_grams"]) == [3, 3, 3]
    assert list(out["distinct_grams"]) == [3, 3, 3]
    # "quick brown fox" is the one shared 3-gram between docs 1 and 2
    assert list(out["dup_grams"]) == [1, 1, 0]


def test_dup_ngram_stats_repeated_gram_multiplicity(sf_dir):
    import pyarrow as pa
    import ray

    from pyrosar_ray.stages.dedup_text import dup_ngram_stats

    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], type=pa.int64()),
                "text": pa.array(
                    [
                        "go go go go",  # 3-grams: (go go go) x2 -> 1 distinct
                        "go go go stop",
                    ]
                ),
            }
        )
    )
    out = (
        dup_ngram_stats(docs, k=3)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    # doc 1: total 2 positions, 1 distinct, and it is shared with doc 2
    assert list(out["total_grams"]) == [2, 2]
    assert list(out["distinct_grams"]) == [1, 2]
    assert list(out["dup_grams"]) == [1, 1]


def test_chunk_documents_coverage_and_overlap(sf_dir):
    import pyarrow as pa
    import pytest
    import ray

    from pyrosar_ray.stages.text import chunk_documents

    text = " ".join(f"t{i}" for i in range(75))
    docs = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([1], type=pa.int64()),
                  "text": pa.array([text])})
    )
    out = (
        chunk_documents(docs, chunk_tokens=32, stride=24)
        .to_pandas()
        .sort_values("chunk_id", ignore_index=True)
    )
    # starts: 0, 24, capped last = 43 -> chunk ids 0, 1, 2
    assert list(out["chunk_id"]) == [0, 1, 2]
    assert list(out["n_tokens"]) == [32, 32, 32]
    assert out.loc[0, "chunk_text"].split(" ")[0] == "t0"
    assert out.loc[2, "chunk_text"].split(" ")[0] == "t43"
    # every token covered
    covered = set()
    for t in out["chunk_text"]:
        covered |= set(t.split(" "))
    assert covered == {f"t{i}" for i in range(75)}
    # short doc -> exactly one full chunk
    short = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([2], type=pa.int64()),
                  "text": pa.array(["a b c"])})
    )
    one = chunk_documents(short, chunk_tokens=32, stride=24).to_pandas()
    assert len(one) == 1 and one.loc[0, "n_tokens"] == 3
    with pytest.raises(ValueError):
        chunk_documents(short, chunk_tokens=0)


def test_winnow_guarantee_shared_substring(sf_dir):
    """Docs sharing a substring of >= window+k-1 tokens share >= 1
    fingerprint; disjoint docs share none."""
    import pyarrow as pa
    import ray

    from pyrosar_ray.stages.dedup_text import winnow_fingerprints

    shared = " ".join(f"s{i}" for i in range(8))  # 8 >= window+k-1 = 8
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], type=pa.int64()),
                "text": pa.array(
                    [
                        "alpha beta " + shared + " gamma",
                        "x y z " + shared,
                        "totally different words here entirely now",
                    ]
                ),
            }
        )
    )
    out = winnow_fingerprints(docs, k=4, window=5).to_pandas()
    fps = {d: set(g["fp"]) for d, g in out.groupby("doc_id")}
    assert fps[1] & fps[2], "shared substring must share a fingerprint"
    assert not (fps[1] & fps[3])
    assert not (fps[2] & fps[3])
    # fingerprints are distinct within each doc
    assert not out.duplicated(["doc_id", "fp"]).any()


def test_chunk_dedup_rewrite_first_wins_and_reassembly():
    """Cross-doc and within-doc duplicate chunks drop everywhere except
    their first (doc_id, chunk_no) occurrence; fully-deduped docs still
    emit a row with empty text."""
    import numpy as np
    import pyarrow as pa
    import ray

    from pyrosar_ray.stages.dedup_text import chunk_dedup_rewrite

    A = " ".join(f"a{i}" for i in range(3))   # one 3-token chunk at k=3
    B = " ".join(f"b{i}" for i in range(3))
    C = " ".join(f"c{i}" for i in range(3))
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
                "text": pa.array(
                    [
                        f"{A} {B}",          # doc0: A,B both first
                        f"{B} {C} {B}",      # doc1: B dup (cross), B dup (within)
                        f"{A}",              # doc2: fully deduped
                        f"{C} tail",         # doc3: C dup, partial chunk kept
                    ]
                ),
            }
        )
    ).repartition(3)
    out = (
        chunk_dedup_rewrite(docs, k=3, num_partitions=8)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert list(out["doc_id"]) == [0, 1, 2, 3]
    assert out.loc[0, "text"] == f"{A} {B}" and out.loc[0, "n_dropped"] == 0
    assert out.loc[1, "text"] == C and out.loc[1, "n_kept"] == 1
    assert out.loc[1, "n_dropped"] == 2
    assert out.loc[2, "text"] == "" and out.loc[2, "n_kept"] == 0
    assert out.loc[2, "n_dropped"] == 1
    assert out.loc[3, "text"] == "tail" and out.loc[3, "n_dropped"] == 1


def test_inverted_index_postings_exact():
    import ray
    import pyarrow as pa
    from pyrosar_ray.stages.text import inverted_index

    texts = ["red blue red", "blue green", "red", "yellow blue yellow", "green green red"]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([5, 3, 9, 1, 7], pa.int64()),
                  "text": pa.array(texts)})
    ).repartition(3)
    out = inverted_index(ds).to_pandas().set_index("token")
    assert out.loc["red", "postings"] == "5,7,9"
    assert out.loc["red", "df_count"] == 3
    assert out.loc["blue", "postings"] == "1,3,5"
    assert out.loc["yellow", "postings"] == "1"
    assert out.loc["green", "df_count"] == 2
    # min_df prunes the tail
    pruned = inverted_index(ds, min_df=2).to_pandas()
    assert set(pruned["token"]) == {"red", "blue", "green"}


def test_bm25_scores_reference():
    import math
    import ray
    import pyarrow as pa
    from pyrosar_ray.stages.text import bm25_scores

    texts = ["join scan join", "vector scan", "filter sort", "join join join join"]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                  "text": pa.array(texts)})
    ).repartition(2)
    out = bm25_scores(ds, query_terms=("join", "scan")).to_pandas()
    out = out.set_index("doc_id")["score"]
    # hand-computed BM25 (k1=1.2, b=0.75)
    dls = [3, 2, 2, 4]
    avgdl = sum(dls) / 4
    dfs = {"join": 2, "scan": 2}
    tfs = {1: {"join": 2, "scan": 1}, 2: {"join": 0, "scan": 1},
           3: {"join": 0, "scan": 0}, 4: {"join": 4, "scan": 0}}
    for doc, dl in zip([1, 2, 3, 4], dls):
        want = 0.0
        for t in ("join", "scan"):
            idf = math.log((4 - dfs[t] + 0.5) / (dfs[t] + 0.5) + 1.0)
            tf = tfs[doc][t]
            want = want + idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))
        assert out[doc] == pytest.approx(want, abs=0, rel=1e-15)
    assert out[3] == 0.0
    # tf saturation: two distinct terms beat four copies of one term
    assert out[1] > out[4] > out[2]
    with pytest.raises(ValueError):
        bm25_scores(ds, query_terms=())


def test_deletion_neighborhood_pairs():
    import itertools
    import pyarrow as pa
    import ray.data as rd
    from pyrosar_ray.stages.dedup_text import (
        deletion_neighborhood_pairs,
        levenshtein_small,
    )

    words = ["cat", "cart", "car", "bat", "cat", "dog", "dig", "ab", "ba", "aa", "a"]
    ds = rd.from_arrow(pa.table({"w": pa.array(words)})).repartition(3)
    out = deletion_neighborhood_pairs(ds, col="w").to_pandas()
    got = {(r.name_a, r.name_b): r.dist for r in out.itertuples()}
    # completeness: every true distance<=1 pair over distinct words is found
    uniq = sorted(set(words))
    for a, b in itertools.combinations(uniq, 2):
        d = levenshtein_small(a, b)
        if d <= 1:
            assert got.get((a, b)) == d, (a, b, d)
    # coincidental collisions carry their exact (larger) distance
    assert got[("ab", "ba")] == 2
    # no false distances anywhere
    for (a, b), d in got.items():
        assert d == levenshtein_small(a, b)
    # reference distances sanity
    assert levenshtein_small("kitten", "sitting") == 3
    assert levenshtein_small("", "abc") == 3


def test_bigram_lm_conditional_probabilities():
    import pyarrow as pa
    import ray.data as rd
    from pyrosar_ray.stages.text import bigram_lm

    ds = rd.from_arrow(
        pa.table({"text": pa.array(["a b a b c", "b a", "c"])})
    ).repartition(2)
    out = bigram_lm(ds).to_pandas().set_index(["w1", "w2"])
    # bigrams: (a,b)x2 (b,a)x2 (b,c)x1 — "c" alone contributes none
    assert out.loc[("a", "b"), "n"] == 2 and out.loc[("a", "b"), "p"] == 1.0
    assert out.loc[("b", "a"), "n"] == 2 and out.loc[("b", "a"), "p"] == 2 / 3
    assert out.loc[("b", "c"), "p"] == 1 / 3
    assert len(out) == 3
    # conditionals normalize per context
    sums = out.groupby("w1")["p"].sum()
    assert np.allclose(sums.to_numpy(), 1.0)


def test_pmi_table_reference():
    import math
    import pyarrow as pa
    import ray.data as rd
    from pyrosar_ray.stages.text import pmi_table

    ds = rd.from_arrow(
        pa.table({"text": pa.array(["a b a b", "a b c b", "c a c a"])})
    ).repartition(2)
    out = pmi_table(ds, min_n=2).to_pandas().set_index(["w1", "w2"])
    # bigrams: ab:3 ba:1 bc:1 cb:1 ca:2 ac:1 -> T=9
    # left margins: a:4 b:2 c:3 ; right margins: a:3 b:4 c:2
    assert out.loc[("a", "b"), "n"] == 3
    assert out.loc[("a", "b"), "pmi"] == math.log(float(3 * 9) / float(4 * 4))
    assert out.loc[("c", "a"), "pmi"] == math.log(float(2 * 9) / float(3 * 3))
    assert ("b", "a") not in out.index  # min_n prunes count-1 bigrams


def test_lang_id_int_accuracy_and_repartition_invariance():
    """Integer lang-ID: corpus-trained profiles classify the corpus
    itself with high accuracy, and the result is identical at any
    partitioning (bounded profile exchange + row-local scoring)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from pyrosar_ray.stages.text import lang_id_int

    tab = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text", "lang"],
    )
    out1 = lang_id_int(rd.from_arrow(tab)).to_pandas()
    out8 = lang_id_int(rd.from_arrow(tab).repartition(8)).to_pandas()
    a = out1.sort_values("doc_id", ignore_index=True)
    b = out8.sort_values("doc_id", ignore_index=True)
    assert a.equals(b)  # partition-count invariance (the hash-twin property)
    assert (a["score"] >= 0).all()
    # NOTE: the synthetic corpus's lang labels are random over one shared
    # vocabulary (even the float classifier scores ~0.37 on it), so
    # accuracy is asserted on a corpus with real trigram differences:
    import pandas as pd

    rows = []
    phrases = {
        "xx": "zxqj vwkq xx jzx qzv wxj",
        "aa": "aaa aab aba baa ab aa ba",
        "oo": "ooo oon ono noo on oo no",
    }
    for i in range(60):
        lang = ["xx", "aa", "oo"][i % 3]
        rows.append({"doc_id": i, "text": (phrases[lang] + " ") * 4, "lang": lang})
    toy = rd.from_pandas(pd.DataFrame(rows)).repartition(4)
    got = lang_id_int(toy).to_pandas()
    truth = {r["doc_id"]: r["lang"] for r in rows}
    assert (got["pred_lang"] == got["doc_id"].map(truth)).all()


def test_gopher_filter_rules_bite_individually():
    import pandas as pd
    import ray.data as rd

    from pyrosar_ray.stages.text import gopher_filter

    base = ("the of and to in " + "word" + " different tokens here now " ) * 6
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4],
            "text": [
                base.strip(),                         # passes all rules
                "short text only",                    # fails word count
                ("the " * 60).strip(),                # fails repetition + stop distinct
                ("zz " * 60).strip(),                 # fails stopwords + mean len (2.0 < 3)
                ("the of " + "supercalifragilistic " * 58).strip(),  # mean len > 10
            ],
        }
    )
    out = gopher_filter(rd.from_pandas(docs).repartition(3)).to_pandas()
    assert out["doc_id"].tolist() == [0]
    row = out.iloc[0]
    toks = docs.loc[0, "text"].split(" ")
    assert row["n_words"] == len(toks)
    assert row["sum_wlen"] == sum(len(t) for t in toks)
    assert row["n_stop_distinct"] == 5
    from collections import Counter

    assert row["max_tok_freq"] == max(Counter(toks).values())


def test_gopher_filter_empty_and_partition_invariance():
    import pandas as pd
    import ray.data as rd

    from pyrosar_ray.stages.text import gopher_filter

    rng = np.random.default_rng(5)
    vocab = ["the", "a", "of", "and", "to", "in", "data", "rays",
             "scans", "sorting", "pipeline", "window", "stream"]
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(80, dtype=np.int64),
            "text": [
                " ".join(rng.choice(vocab, rng.integers(5, 70)))
                for _ in range(80)
            ],
        }
    )
    a = gopher_filter(rd.from_pandas(docs)).to_pandas().sort_values("doc_id", ignore_index=True)
    b = gopher_filter(rd.from_pandas(docs).repartition(7)).to_pandas().sort_values("doc_id", ignore_index=True)
    assert len(a) > 0  # the corpus must exercise the keep path
    assert a.equals(b)
