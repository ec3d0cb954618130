"""Confusable-skeleton dedup — Unicode homoglyph normalization (the
UTS #39 "skeleton" idea): spam and SEO duplicates evade exact-hash
dedup by swapping Latin letters for Cyrillic/Greek lookalikes and
sprinkling zero-width characters; the skeleton transform (casefold,
strip default-ignorable code points, map confusables to their Latin
prototype) makes such spoofs collide again.

Ray shape: skeleton is row-local (a str.translate through a built-once
table — the table is a module constant, no broadcast needed), dedup is
ONE hash exchange on the skeleton; groups are duplicate-cluster sized.
"""

from __future__ import annotations

import pyarrow as pa
from ray.data import Dataset

from ..pipelines.tables import read_parquet_clean as _read_parquet
from .groups import typed_groups

# lookalike → Latin prototype (the high-frequency rows of the UTS #39
# confusables table for Latin text; extensible)
_CONFUSABLES = {
    "а": "a",  # CYRILLIC SMALL A
    "е": "e",  # CYRILLIC SMALL IE
    "о": "o",  # CYRILLIC SMALL O
    "р": "p",  # CYRILLIC SMALL ER
    "с": "c",  # CYRILLIC SMALL ES
    "х": "x",  # CYRILLIC SMALL HA
    "ѕ": "s",  # CYRILLIC SMALL DZE
    "і": "i",  # CYRILLIC SMALL BYELORUSSIAN-UKRAINIAN I
    "ο": "o",  # GREEK SMALL OMICRON
    "α": "a",  # GREEK SMALL ALPHA
    "ɡ": "g",  # LATIN SMALL SCRIPT G
    "ａ": "a",  # FULLWIDTH a
    "ｏ": "o",  # FULLWIDTH o
}
# default-ignorable: zero-width space/joiner/non-joiner, BOM, soft hyphen
_IGNORABLE = "​‌‍﻿­"

_TABLE = str.maketrans(
    {**_CONFUSABLES, **{ch: None for ch in _IGNORABLE}}
)


def skeleton(text: str) -> str:
    """casefold → drop ignorables → map confusables to prototypes."""
    return text.casefold().translate(_TABLE)


def spoof(text: str, variant: int) -> str:
    """Deterministic homoglyph spoofing (the adversary's move) — used
    by the synthetic table so the dedup has real spoofs to catch."""
    v = variant % 3
    if v == 0:
        return text.replace("a", "а")
    if v == 1:
        return text.replace("e", "е").replace(" ", " ​")
    out = text.replace("o", "ο")
    words = out.split(" ", 1)
    words[0] = words[0].upper()
    return " ".join(words)


def spoofed_rows(sf_dir: str) -> Dataset:
    """(row_id, text): every document plus a spoofed copy at
    ``row_id = doc_id + N`` (N = corpus size)."""
    import pyarrow.parquet as pq

    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    docs = _read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def _expand(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        return pa.table(
            {
                "row_id": pa.array(
                    ids + [i + n for i in ids], type=pa.int64()
                ),
                "text": pa.array(
                    texts + [spoof(t, i) for i, t in zip(ids, texts)],
                    type=pa.string(),
                ),
            }
        )

    return docs.map_batches(_expand, batch_format="pyarrow")


def skeleton_dedup(rows: Dataset, id_col: str = "row_id") -> Dataset:
    """(row_id, dup_of): cluster rows by confusable skeleton, tag each
    with the cluster's minimum id."""

    def _skel(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: batch[id_col].cast(pa.int64()),
                "skel": pa.array(
                    [skeleton(t) for t in batch["text"].to_pylist()],
                    type=pa.string(),
                ),
            }
        )

    @typed_groups({id_col: pa.int64(), "dup_of": pa.int64()})
    def _group(group) -> pa.Table:
        rep = int(group[id_col].min())
        return pa.table(
            {
                id_col: pa.array(group[id_col].to_numpy(), type=pa.int64()),
                "dup_of": pa.array([rep] * len(group), type=pa.int64()),
            }
        )

    return (
        rows.map_batches(_skel, batch_format="pyarrow")
        .groupby("skel")
        .map_groups(_group, batch_format="pandas")
    )
