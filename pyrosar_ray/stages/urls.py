"""Canonical-URL dedup — the crawl-frontier dedup stage: normalize
each record's URL (functions/url.py) and group records that name the
same resource. ONE hash exchange keyed on the canonical string; groups
are duplicate-cluster sized (tiny), so ``map_groups`` emits every row
tagged with its cluster representative without any driver state.
"""

from __future__ import annotations

import pyarrow as pa
from ray.data import Dataset

from ..functions.url import canonicalize_url
from ..pipelines.tables import read_parquet_clean as _read_parquet
from .groups import typed_groups


def urls_from_documents(sf_dir: str) -> Dataset:
    """Deterministic messy-URL table: every 3 consecutive doc ids name
    the SAME resource through different RFC 3986 denormalizations
    (explicit default port + dot-segments + unsorted query / uppercase
    scheme + single-dot segment / percent-over-encoded path + host
    case), so the canonicalizer — not string equality — defines the
    dup groups."""
    docs = _read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def _mess(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        urls = []
        for i in ids:
            base, v = i // 3, i % 3
            if v == 0:
                urls.append(f"http://Example.COM:80/a/b/../c/page-{base}?b=2&a=1#frag")
            elif v == 1:
                urls.append(f"HTTP://example.com/a/./c/page-{base}?a=1&b=2")
            else:
                urls.append(f"http://EXAMPLE.com./%61/c/page-{base}?b=2&a=1")
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "url": pa.array(urls, type=pa.string()),
            }
        )

    return docs.map_batches(_mess, batch_format="pyarrow")


def url_dedup(urls: Dataset, id_col: str = "doc_id", url_col: str = "url") -> Dataset:
    """(doc_id, url_canon, dup_of): canonicalize row-local, then one
    exchange on the canonical key; ``dup_of`` = min id in the group."""

    def _canon(batch: pa.Table) -> pa.Table:
        canon = [canonicalize_url(u) for u in batch[url_col].to_pylist()]
        return pa.table(
            {
                id_col: batch[id_col].cast(pa.int64()),
                "url_canon": pa.array(canon, type=pa.string()),
            }
        )

    @typed_groups(
        {id_col: pa.int64(), "url_canon": pa.string(), "dup_of": pa.int64()}
    )
    def _group(group) -> pa.Table:
        rep = int(group[id_col].min())
        return pa.table(
            {
                id_col: pa.array(group[id_col].to_numpy(), type=pa.int64()),
                "url_canon": pa.array(group["url_canon"], type=pa.string()),
                "dup_of": pa.array([rep] * len(group), type=pa.int64()),
            }
        )

    return (
        urls.map_batches(_canon, batch_format="pyarrow")
        .groupby("url_canon")
        .map_groups(_group, batch_format="pandas")
    )


# ------------------------------------------------------- robots gating


def robots_for_host(h: int) -> str:
    """Deterministic robots.txt for host index ``h`` — exercises the
    full REP grammar: comments, unknown directives, an empty Disallow,
    consecutive shared User-agent lines, and a specific group that must
    SHADOW ``*`` (never merge with it)."""
    s = h % 5
    return (
        "# synthetic robots for host h{h}\n"
        "Sitemap: http://h{h}.example.com/sitemap.xml\n"
        "\n"
        "User-agent: otherbot\n"
        "User-agent: *\n"
        "Disallow: /sec0/\n"
        "Allow: /sec0/page-1*\n"
        "Crawl-delay: 2\n"
        "Disallow:\n"
        "\n"
        "User-agent: raybot\n"
        "Disallow: /sec{s}/\n"
        "Allow: /sec{s}/page-*0$\n"
    ).format(h=h, s=s)


def frontier_from_documents(sf_dir: str) -> Dataset:
    """Crawl frontier: (doc_id, host, path), 7 hosts × 5 path sections."""
    docs = _read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def _mk(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "host": pa.array(
                    [f"h{i % 7}.example.com" for i in ids], type=pa.string()
                ),
                "path": pa.array(
                    [f"/sec{i % 5}/page-{i}" for i in ids], type=pa.string()
                ),
            }
        )

    return docs.map_batches(_mk, batch_format="pyarrow")


def robots_gate(frontier: Dataset, agent: str = "raybot") -> Dataset:
    """Filter-annotate a frontier through per-host robots rules.

    The robots corpus is the SMALL side (one file per host): broadcast
    once via ``ray.put``; each actor parses and regex-compiles every
    host's matcher in ``__init__`` and then only matches per row — the
    canonical stateful-actor-pool stage. Output adds (allowed, rule):
    the RFC 9309 longest-match decision and the winning pattern.
    """
    import ray as _ray

    from ..functions.robots import RobotsMatcher

    texts = {f"h{h}.example.com": robots_for_host(h) for h in range(7)}
    ref = _ray.put(texts)

    class _Gate:
        def __init__(self):
            self.matchers = {
                host: RobotsMatcher(text, agent)
                for host, text in _ray.get(ref).items()
            }

        def __call__(self, batch: pa.Table) -> pa.Table:
            hosts = batch["host"].to_pylist()
            paths = batch["path"].to_pylist()
            allowed, rules = [], []
            for host, path in zip(hosts, paths):
                ok, rule = self.matchers[host].decision(path)
                allowed.append(ok)
                rules.append(rule)
            return batch.append_column(
                "allowed", pa.array(allowed, type=pa.bool_())
            ).append_column("rule", pa.array(rules, type=pa.string()))

    return frontier.map_batches(_Gate, batch_format="pyarrow", concurrency=(1, 4))
