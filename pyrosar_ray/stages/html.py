"""HTML page synthesis + extraction stages — the crawl-corpus text
extraction step (WARC fetch → THIS → quality scoring), over Ray Data.

Pages are synthesized deterministically from the documents table so
the expected extraction is closed-form in (doc_id, text): the title is
the first three words joined by `` &amp; `` (exercises entity decode in
the title path), body paragraphs are 10-word chunks with every
7th-position separator written as ``&#32;`` (numeric entity — decodes
back to the plain space, so extracted text must BYTE-EQUAL the chunk
join), every 13th word is wrapped in an inline ``<a>`` (text kept,
link counted), and nav/script/style/footer/aside boilerplate wraps it
all (dropped by the tokenizer, nav+aside links still counted).

Extraction is row-local ``map_batches`` — pure streaming scan, zero
shuffle; at 100 TB the only cost is the compiled-regex entity pass and
the single tag walk per page.
"""

from __future__ import annotations

import pyarrow as pa
from ray.data import Dataset

from ..functions.html import extract_text
from ..pipelines.tables import read_parquet_clean as _read_parquet


def build_page(doc_id: int, text: str) -> str:
    """Deterministic HTML page for a document (see module docstring)."""
    words = text.split(" ")
    title = " &amp; ".join(words[:3])
    parts = [
        "<!DOCTYPE html>",
        "<html><head>",
        f"<title>{title}</title>",
        "<style>.m{color:red}</style>",
        '<script>if (1<2) { var s = "<p>not text</p>"; }</script>',
        "</head><body>",
        '<nav><a href="/">home</a> | <a href="/about">about</a> | '
        '<a href="/contact">contact</a></nav>',
        "<header><h1>corpus mirror</h1></header>",
    ]
    if doc_id % 4 == 0:
        parts.append('<aside>related: <a href="/r">link</a></aside>')
    for start in range(0, len(words), 10):
        chunk = words[start : start + 10]
        pieces = []
        for j, w in enumerate(chunk):
            gw = start + j
            token = f'<a href="/w/{gw}">{w}</a>' if gw % 13 == 5 else w
            if j == 0:
                pieces.append(token)
            else:
                sep = "&#32;" if j % 7 == 3 else " "
                pieces.append(sep + token)
        parts.append("<p>" + "".join(pieces) + "</p>")
    parts.append("<footer>&copy; mirror — not content</footer>")
    parts.append("</body></html>")
    return "".join(parts)


def pages_from_documents(sf_dir: str) -> Dataset:
    """(doc_id, html) — the synthetic crawl-page table."""
    docs = _read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def _build(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "html": pa.array(
                    [build_page(i, t) for i, t in zip(ids, texts)],
                    type=pa.string(),
                ),
            }
        )

    return docs.map_batches(_build, batch_format="pyarrow")


def html_extract(pages: Dataset) -> Dataset:
    """(doc_id, title, text, n_links, n_blocks) via the real tokenizer."""

    def _extract(batch: pa.Table) -> pa.Table:
        out = [extract_text(h) for h in batch["html"].to_pylist()]
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "title": pa.array([o["title"] for o in out], type=pa.string()),
                "text": pa.array([o["text"] for o in out], type=pa.string()),
                "n_links": pa.array([o["n_links"] for o in out], type=pa.int32()),
                "n_blocks": pa.array([o["n_blocks"] for o in out], type=pa.int32()),
            }
        )

    return pages.map_batches(_extract, batch_format="pyarrow")


def anchor_agg(pages: Dataset) -> Dataset:
    """Anchor-text aggregation — the web-graph signal op (the text other
    pages use when linking a target is a classic relevance/pretraining
    signal): extract content-zone (href, anchor) pairs with the real
    tag tokenizer (boilerplate links counted but carry no anchor), hash
    each anchor with the engine-standard 32-bit token fold, and reduce
    per target href with ONE link-table-sized groupby.

    Output rows: (href, n_refs, min_doc, anchor_hash_sum) — the
    order-insensitive hash sum pins every anchor string without
    shipping the concatenated text.
    """
    import numpy as np
    from ray.data.aggregate import Count, Min, Sum

    from .sketch import _token_hash32

    def _links(batch: pa.Table) -> pa.Table:
        import pandas as pd

        hrefs: list[str] = []
        docs: list[int] = []
        anchors: list[str] = []
        for doc_id, html in zip(
            batch["doc_id"].to_pylist(), batch["html"].to_pylist()
        ):
            for href, anchor in extract_text(html)["links"]:
                hrefs.append(href)
                docs.append(doc_id)
                anchors.append(anchor)
        if not hrefs:
            return pa.table(
                {
                    "href": pa.array([], type=pa.string()),
                    "doc_id": pa.array([], type=pa.int64()),
                    "h32": pa.array([], type=pa.int64()),
                }
            )
        h = _token_hash32(pd.Series(anchors)).astype(np.int64)
        return pa.table(
            {
                "href": pa.array(hrefs, type=pa.string()),
                "doc_id": pa.array(docs, type=pa.int64()),
                "h32": pa.array(h),
            }
        )

    return (
        pages.map_batches(_links, batch_format="pyarrow")
        .groupby("href")
        .aggregate(
            Count(alias_name="n_refs"),
            Min("doc_id", alias_name="min_doc"),
            Sum("h32", alias_name="anchor_hash_sum"),
        )
    )
