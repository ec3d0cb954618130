"""Goldens for the PII / repetition / decontamination stages
(stages/text.py tail). The sf0.01 hash twins are the strong check;
these pin closed-form cases and edge behavior."""

import pyarrow as pa
import ray.data


def _docs(texts):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
            }
        )
    )


def test_redact_pii_order_and_counts(ray_session):
    from pyrosar_ray.stages.text import redact_pii

    out = (
        redact_pii(_docs([
            "mail a@b.co and c.d@e.org now",
            "host 10.0.0.1 and 255.255.255.255 up",
            "call 555-1234 or 555-0000",
            "mixed x@y.zz 1.2.3.4 555-9999",
            "clean text only",
        ]))
        .to_pandas()
        .sort_values("doc_id")
    )
    assert out["n_emails"].tolist() == [2, 0, 0, 1, 0]
    assert out["n_ips"].tolist() == [0, 2, 0, 1, 0]
    assert out["n_phones"].tolist() == [0, 0, 2, 1, 0]
    assert out["clean_text"].tolist()[3] == "mixed [EMAIL] [IP] [PHONE]"
    assert out["clean_text"].tolist()[4] == "clean text only"


def test_repetition_signals_closed_form(ray_session):
    from pyrosar_ray.stages.text import repetition_signals

    out = (
        repetition_signals(_docs([
            "a a a b",      # 4 tokens, 2 distinct; bigrams aa,aa,ab → top 2/3
            "x y z",        # all distinct; top bigram 1/2
            "w",            # single token: no bigrams
        ]))
        .to_pandas()
        .sort_values("doc_id")
    )
    assert out["n_tokens"].tolist() == [4, 3, 1]
    assert out["dup_word_frac"].tolist() == [0.5, 0.0, 0.0]
    assert out["top_bigram_frac"].tolist() == [2 / 3, 1 / 2, 0.0]


def test_decontaminate_counts_duplicate_ngrams(ray_session):
    from pyrosar_ray.stages.text import decontaminate

    out = (
        decontaminate(
            _docs(["alpha beta gamma", "beta gamma delta", "zeta eta"]),
            ["beta gamma", "beta gamma", "eta"],
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    # duplicate benchmark n-grams count twice, matching the SQL join;
    # matching is raw substring (the twin's contains()), so "eta" also
    # hits inside "beta" — 2 bigram hits + 1 substring hit for docs 0/1
    assert out["n_hits"].tolist() == [3, 3, 1]
    assert out["contaminated"].tolist() == [True, True, True]


def test_benchmark_ngrams_contract(ray_session):
    from pyrosar_ray.stages.text import benchmark_ngrams

    ngs = benchmark_ngrams("/root/testdata/sf0.001", every=97, n_tokens=8)
    assert 0 < len(ngs) <= 6  # 500 docs / 97
    assert all(len(n.split(" ")) == 8 for n in ngs)


def test_curate_corpus_end_to_end(ray_session):
    from pyrosar_ray.pipelines.curate import curate_corpus

    out = curate_corpus("/root/testdata/sf0.001").to_pandas()
    assert set(out.columns) == {
        "doc_id", "source", "n_tokens", "n_copies", "clean_text", "n_pii"
    }
    assert 0 < len(out) < 500          # gates actually dropped rows
    assert out["doc_id"].is_unique     # dedup keeps one keeper per text
    assert (out["n_copies"] >= 1).all()
    injected = out[out["doc_id"] % 3 == 0]
    assert (injected["n_pii"] == 3).all()          # email + ip + phone
    assert injected["clean_text"].str.endswith(
        "contact [EMAIL] from [IP] call [PHONE]"
    ).all()
    assert (out[out["doc_id"] % 3 != 0]["n_pii"] == 0).all()
