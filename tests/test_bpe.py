"""BPE tokenizer goldens (functions/bpe.py + stages/bpe.py).

The trainer is pinned with the hand-walkable Sennrich corpus (low /
lower / newest / widest) where the merge sequence is derivable on
paper; the encoder with segmentation-partition and cache-transparency
laws; the distributed stage with a same-merges / same-counts equality
against a single-process reference over the real sf0.001 table.
"""

import numpy as np
import pytest

from pyrosar_ray.functions.bpe import (
    EOW,
    encode_word,
    train_bpe,
    word_symbols,
)

SENNRICH = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_word_symbols():
    assert word_symbols("low") == ("l", "o", "w</w>")
    assert word_symbols("a") == ("a</w>",)
    assert word_symbols("") == ()


def test_trainer_hand_walked_sennrich():
    # Pair counts round 1: ('e','s') 9, ('s','t</w>') 9, ('l','o') 7,
    # ('o','w</w>') 5, ... tie 9/9 broken lexicographically → ('e','s').
    merges = train_bpe(SENNRICH, 4)
    assert merges[0] == ("e", "s")
    # round 2: ('es','t</w>') has 9 — the unique max
    assert merges[1] == ("es", "t</w>")
    # round 3: ('l','o') 7 beats everything else
    assert merges[2] == ("l", "o")
    # round 4: ('lo','w</w>') 5 vs ('n','e') 6 vs ('w','est</w>') ... :
    # ('d','est</w>') 3, ('i','d') 3, ('n','e') 6, ('e','w') 6,
    # ('w','est</w>') 6 → tie at 6 → lexicographic min ('e','w')
    assert merges[3] == ("e", "w")


def test_trainer_stops_when_dry():
    merges = train_bpe({"ab": 1, "cd": 1}, 10)
    assert merges == []  # no pair reaches frequency 2
    merges = train_bpe({"ab": 2}, 10)
    assert merges == [("a", "b</w>")]


def test_encode_word_partition_law_and_cache():
    merges = train_bpe(SENNRICH, 6)
    ranks = {p: i for i, p in enumerate(merges)}
    cache = {}
    for w in list(SENNRICH) + ["lowest", "newer", "wide", "zzz", "w"]:
        toks = encode_word(w, ranks, cache)
        assert "".join(toks) == w + EOW  # segmentation partitions the word
        assert encode_word(w, ranks, None) == toks  # cache-transparent
        assert cache[w] == toks
    # under the first four merges 'newest' → ('n','ew','est</w>');
    # two more merges fuse it completely
    ranks4 = {p: i for i, p in enumerate(merges[:4])}
    assert encode_word("newest", ranks4) == ("n", "ew", "est</w>")
    assert encode_word("newest", ranks) == ("newest</w>",)


def test_trainer_deterministic():
    rng = np.random.default_rng(0)
    words = {f"w{int(i)}x{int(i)%7}": int(n) for i, n in enumerate(rng.integers(1, 50, 300))}
    assert train_bpe(dict(words), 50) == train_bpe(dict(reversed(list(words.items()))), 50)


@pytest.mark.usefixtures("ray_session")
def test_distributed_stage_matches_reference():
    import pyarrow.parquet as pq
    import ray.data

    from pyrosar_ray.pipelines.tables import read_parquet_clean
    from pyrosar_ray.stages.bpe import bpe_encode, learn_merges

    sf = "/root/testdata/sf0.001"
    docs = read_parquet_clean(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    merges = learn_merges(docs, n_merges=80, max_vocab=5000)
    assert len(merges) == 80

    # single-process reference: same counts, same merges
    tab = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    counts: dict[str, int] = {}
    for t in tab["text"]:
        for w in t.split(" "):
            if w:
                counts[w] = counts.get(w, 0) + 1
    assert train_bpe(counts, 80) == merges

    out = (
        bpe_encode(docs, merges, concurrency=2)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert len(out) == len(tab) and out["recon_ok"].all()

    ranks = {p: i for i, p in enumerate(merges)}
    from pyrosar_ray.functions.bpe import encode_word as ew

    ref_tokens = [
        sum(len(ew(w, ranks)) for w in t.split(" ") if w) for t in tab.sort_values("doc_id")["text"]
    ]
    assert out["n_bpe_tokens"].tolist() == ref_tokens
    # subwording compresses vs characters and never beats word count
    n_chars = tab.sort_values("doc_id")["text"].str.replace(" ", "").str.len()
    assert (out["n_bpe_tokens"].to_numpy() <= n_chars.to_numpy()).all()
    assert (out["n_bpe_tokens"] >= out["n_words"]).all()


def test_sample_mod_trains_on_subset():
    import ray.data

    from pyrosar_ray.pipelines.tables import read_parquet_clean
    from pyrosar_ray.stages.bpe import learn_merges

    sf = "/root/testdata/sf0.001"
    docs = read_parquet_clean(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    merges_all = learn_merges(docs, n_merges=30)
    merges_sampled = learn_merges(docs, n_merges=30, sample_mod=5)
    assert len(merges_sampled) == 30
    # different corpora, same grammar: both reproduce deterministically
    assert learn_merges(docs, n_merges=30, sample_mod=5) == merges_sampled
    assert merges_all != merges_sampled or merges_all == merges_sampled  # smoke
