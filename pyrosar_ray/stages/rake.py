"""RAKE keyphrase extraction (Rose et al. 2010) — integer-exact.

The classic unsupervised keyword extractor used in corpus curation and
dataset search: split each document into candidate phrases at stopword
boundaries, score words by degree/frequency over the document's
candidate occurrences, score a phrase as the sum of its word scores,
keep the top-k phrases per document.

Ray shape: completely row-local (one document = one independent
computation) — a streaming ``map_batches`` scan with zero shuffle; the
stopword set is a constant. The standard ``deg(w)/freq(w)`` word score
is kept integer-exact as ``deg(w)·SCALE // freq(w)`` (floor division,
identical in SQL), so the per-document ranking is bit-reproducible.
"""

from __future__ import annotations

import pyarrow as pa
from ray.data import Dataset

SCALE = 1000
STOPWORDS = frozenset(
    ["the", "a", "and", "of", "to", "in", "is", "on", "for", "at"]
)


def rake_phrases(doc: str, k: int = 3) -> list[tuple[str, int]]:
    """→ top-k (phrase, score) by (score desc, phrase asc)."""
    words = doc.split(" ")
    segments: list[list[str]] = []
    cur: list[str] = []
    for w in words:
        if w in STOPWORDS:
            if cur:
                segments.append(cur)
            cur = []
        else:
            cur.append(w)
    if cur:
        segments.append(cur)
    freq: dict[str, int] = {}
    deg: dict[str, int] = {}
    for seg in segments:
        slen = len(seg)
        for w in seg:
            freq[w] = freq.get(w, 0) + 1
            deg[w] = deg.get(w, 0) + slen
    scores: dict[str, int] = {}
    for seg in segments:
        phrase = " ".join(seg)
        if phrase not in scores:
            scores[phrase] = sum(deg[w] * SCALE // freq[w] for w in seg)
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return ranked


def rake_topk(
    docs: Dataset, k: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> Dataset:
    """(doc_id, phrase, score, rank) — top-k RAKE phrases per doc."""

    def _extract(batch: pa.Table) -> pa.Table:
        ids, phrases, scores, ranks = [], [], [], []
        for did, text in zip(
            batch[id_col].to_pylist(), batch[text_col].to_pylist()
        ):
            for r, (phrase, score) in enumerate(rake_phrases(text, k), start=1):
                ids.append(did)
                phrases.append(phrase)
                scores.append(score)
                ranks.append(r)
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "phrase": pa.array(phrases, type=pa.string()),
                "score": pa.array(scores, type=pa.int64()),
                "rank": pa.array(ranks, type=pa.int64()),
            }
        )

    return docs.select_columns([id_col, text_col]).map_batches(
        _extract, batch_format="pyarrow"
    )
