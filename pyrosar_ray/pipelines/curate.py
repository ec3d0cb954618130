"""End-to-end corpus curation — the flagship training-data pipeline.

Composes the engine's text operators into the standard pre-training
chain over the documents table:

1. quality gate (token count / uniqueness / stopword thresholds —
   same contract as the ``doc_quality_filter`` query)
2. exact first-wins dedup: digest groupby picks the min-id keeper,
   then the generic co-partition ``equi_join`` semi-joins keepers back
   to full rows — two bounded exchanges of (digest,id) + keys, never a
   broadcast of a corpus-sized set
3. benchmark decontamination (broadcast n-gram small side, zero
   shuffle) — contaminated docs dropped
4. PII injection (deterministic synthetic PII, every 3rd doc, for
   twin-checkability on this synthetic corpus) + ordered redaction

Every step is hash-checked end-to-end by the ``doc_curate`` twin: a
CTE chain with QUALIFY dedup, contains() anti-join and nested
regexp_replace. Scale shape: one digest groupby + one id equi-join are
the only exchanges; everything else is stateless map_batches.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset
from ray.data.aggregate import Count, Min

from ..stages.dedup_text import md5_digests
from ..stages.join import equi_join
from ..stages.text import STOPWORDS, benchmark_ngrams

MIN_TOKENS = 8
MIN_UNIQ_X10 = 6  # keep when n_uniq * 10 >= n_tokens * 6
MAX_STOP_RATIO = 0.35


def _score_and_gate(batch: pa.Table) -> pa.Table:
    """Quality stats inline (text retained), threshold filter applied."""
    s = batch["text"].to_pandas().astype("string")
    toks = s.str.split(" ")
    n = toks.str.len().to_numpy(dtype=np.int64)
    uniq = toks.map(lambda t: len(set(t))).to_numpy(dtype=np.int64)
    stop = toks.map(lambda t: sum(1 for x in t if x in STOPWORDS)).to_numpy(
        dtype=np.int64
    )
    with np.errstate(invalid="ignore"):
        ratio = stop / n.astype(np.float64)
    mask = (n >= MIN_TOKENS) & (uniq * 10 >= n * MIN_UNIQ_X10) & (ratio < MAX_STOP_RATIO)
    kept = batch.append_column("n_tokens", pa.array(n, type=pa.int64()))
    return kept.filter(pa.array(mask))


def _pii_suffix(ids: np.ndarray) -> pd.Series:
    return pd.Series(
        [
            f" contact user{i}@mail.example.com from 10.{i % 256}.0.{i % 100}"
            f" call 555-{str(i % 10000).zfill(4)}"
            if i % 3 == 0
            else ""
            for i in ids
        ],
        dtype="string",
    )


def curate_corpus(sf_dir: str) -> Dataset:
    """documents.parquet → curated corpus Dataset.

    Output columns: doc_id, source, n_tokens (pre-injection),
    clean_text, n_pii (emails+ips+phones redacted).
    """
    from .tables import read_parquet_clean

    docs = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    gated = docs.map_batches(_score_and_gate, batch_format="pyarrow")

    # exact dedup: winners per digest, then keeper ids join back to rows
    def _digest(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "text_hash": pa.array(md5_digests(batch["text"].to_pylist())),
                "doc_id": batch["doc_id"],
            }
        )

    winners = (
        gated.map_batches(_digest, batch_format="pyarrow")
        .groupby("text_hash")
        .aggregate(Min("doc_id", alias_name="keeper"), Count(alias_name="n_copies"))
        .map_batches(
            lambda b: pa.table(
                {"doc_id": b["keeper"], "n_copies": b["n_copies"]}
            ),
            batch_format="pyarrow",
        )
    )
    unique_docs = equi_join(gated, winners, on="doc_id")

    # decontamination against the original corpus' benchmark n-grams;
    # the standalone decontaminate() op projects to (id, flag, hits), so
    # the drop is applied inline here to keep the carried columns
    ngrams = benchmark_ngrams(sf_dir)
    import ray

    ng_ref = ray.put(ngrams)

    def _drop_contaminated(batch: pa.Table) -> pa.Table:
        pats = ray.get(ng_ref)
        s = batch["text"].to_pandas().astype("string")
        bad = np.zeros(len(s), dtype=bool)
        for p in pats:
            bad |= s.str.contains(p, regex=False).fillna(False).to_numpy()
        return batch.filter(pa.array(~bad))

    clean = unique_docs.map_batches(_drop_contaminated, batch_format="pyarrow")

    def _inject(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        s = batch["text"].to_pandas().astype("string")
        pii = _pii_suffix(ids)
        pii.index = s.index
        out = batch.drop_columns(["text"]).append_column(
            "text", pa.array((s + pii).to_numpy(dtype=object), type=pa.string())
        )
        return out

    injected = clean.map_batches(_inject, batch_format="pyarrow")

    # same patterns/order as redact_pii, carrying source/n_tokens/n_copies
    from ..stages.text import _PII_COMPILED

    def _redact_keep(batch: pa.Table) -> pa.Table:
        s = batch["text"].to_pandas().astype("string")
        n_pii = np.zeros(len(s), dtype=np.int64)
        for _, rx, repl in _PII_COMPILED:
            n_pii += s.str.count(rx.pattern).fillna(0).astype("int64").to_numpy()
            s = s.str.replace(rx, repl, regex=True)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "source": batch["source"],
                "n_tokens": batch["n_tokens"],
                "n_copies": batch["n_copies"],
                "clean_text": pa.array(s.to_numpy(dtype=object), type=pa.string()),
                "n_pii": pa.array(n_pii),
            }
        )

    return injected.map_batches(_redact_keep, batch_format="pyarrow")


def curate_multimodal(sf_dir: str) -> Dataset:
    """Image+caption curation — the multimodal twin of :func:`curate_corpus`.

    The standard LAION-style gate chain over the image table:

    1. dimension gate (``w*h >= 512`` — drops thumbnail-class images)
    2. caption gate (``>= 10`` whitespace tokens — drops alt-text stubs)
    3. exact caption dedup, first-wins by ``image_id`` (digest groupby
       Min keeper + the generic co-partition equi_join — the same two
       bounded exchanges as the text chain; caption bytes never leave
       their blocks, only 32-char digests and ids shuffle)

    Output: (image_id, w, h, fmt, caption) of the surviving pairs.
    The ``image_caption_curate`` twin hash-checks every gate and the
    keeper rule end-to-end.
    """
    from ..sources.images import images_from_documents

    import pyarrow.compute as pc

    imgs = images_from_documents(sf_dir, with_pixels=False)

    def _gate(batch: pa.Table) -> pa.Table:
        w = batch["w"].to_numpy().astype(np.int64)
        h = batch["h"].to_numpy().astype(np.int64)
        s = batch["caption"].to_pandas().astype("string")
        n_tok = (s.str.count(" ") + 1).to_numpy()
        out = batch.filter(pa.array((w * h >= 512) & (n_tok >= 10)))
        # int64 join key for the co-partition equi_join (zero-padded
        # image_id <-> numeric suffix are order-isomorphic)
        return out.append_column(
            "img_key", pc.cast(pc.utf8_slice_codeunits(out["image_id"], 4), pa.int64())
        )

    gated = imgs.map_batches(_gate, batch_format="pyarrow")

    def _digest(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cap_hash": pa.array(md5_digests(batch["caption"].to_pylist())),
                "img_key": batch["img_key"],
            }
        )

    winners = (
        gated.map_batches(_digest, batch_format="pyarrow")
        .groupby("cap_hash")
        .aggregate(Min("img_key", alias_name="keeper"))
        .map_batches(
            lambda b: pa.table({"img_key": b["keeper"]}),
            batch_format="pyarrow",
        )
    )
    return equi_join(gated, winners, on="img_key").select_columns(
        ["image_id", "w", "h", "fmt", "caption"]
    )
