"""The composed crawl-curation pipeline — fetch layout to curated text
in one streaming Ray Data plan:

    HTML pages → .warc.gz shards → WARC walk + HTTP parse →
    HTML tokenizer extraction → canonical-URL dedup (winners only) →
    structure-based quality gate

This is the flagship composition of the web-text surface: every stage
is individually hash-twinned (doc_warc_ingest / doc_html_extract /
doc_url_dedup), and the composition is pinned by its own twin built
from the same closed forms — so a regression in ANY stage, or in how
they compose (column contracts, dedup-before-gate ordering), flips the
hash.

Exchanges: shard-build groupby (absent in production — shards come off
storage), the URL-dedup hash exchange, and one co-partitioned semi
join; everything else is a streaming scan.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from ..stages.html import html_extract, pages_from_documents
from ..stages.join import equi_join
from ..stages.urls import url_dedup, urls_from_documents
from ..stages.warc import warc_extract, warc_shards_from_table


def crawl_curate(
    sf_dir: str,
    docs_per_shard: int = 50,
    min_blocks: int = 2,
    max_links: int = 9,
) -> Dataset:
    """(doc_id, title, n_links, n_blocks, text) of curated winners."""
    pages = pages_from_documents(sf_dir)
    shards = warc_shards_from_table(
        pages, body_col="html", docs_per_shard=docs_per_shard
    )
    fetched = warc_extract(shards).select_columns(["doc_id", "text"])

    def _as_html(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["doc_id", "html"])

    extracted = html_extract(fetched.map_batches(_as_html, batch_format="pyarrow"))

    def _winners(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch["doc_id"], batch["dup_of"]))

    urls = url_dedup(urls_from_documents(sf_dir))
    from pyrosar_ray.stages import physical_select

    # physical projection: feeds equi_join's schema()-derived column plan
    winners = physical_select(
        urls.map_batches(_winners, batch_format="pyarrow"), ["doc_id"]
    )

    kept = equi_join(extracted, winners, on="doc_id", how="semi")

    def _gate(batch: pa.Table) -> pa.Table:
        ok = pc.and_(
            pc.greater_equal(batch["n_blocks"], min_blocks),
            pc.less_equal(batch["n_links"], max_links),
        )
        return batch.filter(ok)

    return kept.map_batches(_gate, batch_format="pyarrow").select_columns(
        ["doc_id", "title", "n_links", "n_blocks", "text"]
    )
