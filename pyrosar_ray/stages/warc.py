"""WARC shard synthesis + extraction — the web-crawl ingest pipeline.

Two stages over Ray Data:

- :func:`warc_shards_from_documents` — ONE groupby exchange keyed on
  ``shard_id = doc_id // docs_per_shard`` builds each ``.warc.gz``
  shard blob (warcinfo member + interleaved request/response records,
  one gzip member per record — the real Common-Crawl layout). The
  shard key is closed-form in the id, so shard contents are identical
  at any block count / cluster size.
- :func:`warc_extract` — stateless ``map_batches`` over shard blobs:
  multi-member gunzip → WARC record walk → keep ``response`` records
  BY TYPE → HTTP parse → body octets by Content-Length → UTF-8 text.
  Per-blob work is independent, so at 100 TB this runs as a pure
  streaming scan; the only exchange in the whole pipeline is the
  shard-build groupby (and a production run reads shards straight off
  storage, skipping even that).

Every emitted column is arithmetic in (doc_id, text) — see the
``doc_warc_ingest`` SQL twin, which reproduces member indices,
HTTP framing overhead and record lengths closed-form.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from ..functions.warc import (
    build_http_response,
    build_warc_record,
    gzip_member,
    parse_http_response,
    parse_warc_gz,
)
from ..pipelines.tables import read_parquet_clean as _read_parquet
from .groups import typed_groups

_WARCINFO_PAYLOAD = b"software: pyrosar-ray synthetic crawl\r\n"


def _doc_date(doc_id: int) -> str:
    return f"2026-01-{1 + doc_id % 28:02d}T00:00:00Z"


def _doc_status(doc_id: int) -> int:
    return 404 if doc_id % 23 == 0 else 200


def _doc_uri(doc_id: int) -> str:
    return f"http://corpus.invalid/doc/{doc_id}"


def build_shard(doc_ids: np.ndarray, texts: list[str]) -> tuple[bytes, int]:
    """One ``.warc.gz`` shard: warcinfo member, then per doc (ascending
    id) an optional ``request`` member (ids ≡ 0 mod 5) and the
    ``response`` member. Returns (blob, n_members)."""
    order = np.argsort(doc_ids, kind="stable")
    members = [
        gzip_member(
            build_warc_record(
                "warcinfo", "shardinfo", "2026-01-01T00:00:00Z", _WARCINFO_PAYLOAD
            )
        )
    ]
    for idx in order:
        did = int(doc_ids[idx])
        date = _doc_date(did)
        uri = _doc_uri(did)
        if did % 5 == 0:
            members.append(
                gzip_member(
                    build_warc_record(
                        "request", f"req-{did:012d}", date, b"GET", target_uri=uri
                    )
                )
            )
        body = texts[idx].encode("utf-8")
        payload = build_http_response(body, status=_doc_status(did))
        members.append(
            gzip_member(
                build_warc_record(
                    "response", f"rsp-{did:012d}", date, payload, target_uri=uri
                )
            )
        )
    return b"".join(members), len(members)


def warc_shards_from_documents(
    sf_dir: str, docs_per_shard: int = 50
) -> Dataset:
    """Synthesize the ``.warc.gz`` shard table: (shard_id, blob,
    n_members). One groupby exchange; ~docs_per_shard rows per group."""
    docs = _read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return warc_shards_from_table(docs, docs_per_shard=docs_per_shard)


def warc_shards_from_table(
    docs: Dataset,
    id_col: str = "doc_id",
    body_col: str = "text",
    docs_per_shard: int = 50,
) -> Dataset:
    """Pack any (id, body) table into ``.warc.gz`` shards — the body
    can be plain text or full HTML pages (the crawl-chain composition
    path). Same framing/shard contract as the documents variant."""

    def _shard_key(batch: pa.Table) -> pa.Table:
        sid = pc.divide(batch[id_col], docs_per_shard)
        return batch.append_column("shard_id", pc.cast(sid, pa.int64()))

    @typed_groups(
        {
            "shard_id": pa.int64(),
            "blob": pa.binary(),
            "n_members": pa.int32(),
        }
    )
    def _build(group) -> pa.Table:
        ids = group[id_col].to_numpy()
        blob, n = build_shard(ids, group[body_col].tolist())
        return pa.table(
            {
                "shard_id": pa.array([int(group["shard_id"].iloc[0])]),
                "blob": pa.array([blob], type=pa.binary()),
                "n_members": pa.array([n], type=pa.int32()),
            }
        )

    return (
        docs.map_batches(_shard_key, batch_format="pyarrow")
        .groupby("shard_id")
        .map_groups(_build, batch_format="pandas")
    )


def warc_extract(shards: Dataset) -> Dataset:
    """Parse shard blobs back into text rows: (doc_id, shard_id,
    member_index, status, content_length, text).

    ``member_index`` is the response record's position among ALL
    members of its shard (warcinfo/request members count — proving the
    walk saw them); records are kept by ``WARC-Type``, never position.
    """

    def _extract(batch: pa.Table) -> pa.Table:
        out: dict[str, list] = {
            "doc_id": [],
            "shard_id": [],
            "member_index": [],
            "status": [],
            "content_length": [],
            "text": [],
        }
        sids = batch["shard_id"].to_pylist()
        for sid, blob in zip(sids, batch["blob"].to_pylist()):
            for i, (headers, payload) in enumerate(parse_warc_gz(blob)):
                if headers["warc-type"] != "response":
                    continue
                status, _, body = parse_http_response(payload)
                uri = headers["warc-target-uri"]
                out["doc_id"].append(int(uri.rsplit("/", 1)[1]))
                out["shard_id"].append(sid)
                out["member_index"].append(i)
                out["status"].append(status)
                out["content_length"].append(int(headers["content-length"]))
                out["text"].append(body.decode("utf-8"))
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], type=pa.int64()),
                "shard_id": pa.array(out["shard_id"], type=pa.int64()),
                "member_index": pa.array(out["member_index"], type=pa.int32()),
                "status": pa.array(out["status"], type=pa.int32()),
                "content_length": pa.array(out["content_length"], type=pa.int64()),
                "text": pa.array(out["text"], type=pa.string()),
            }
        )

    return shards.map_batches(_extract, batch_format="pyarrow")


def warc_ingest(sf_dir: str, docs_per_shard: int = 50) -> Dataset:
    """documents → shard blobs → extracted rows (the full round trip)."""
    return warc_extract(warc_shards_from_documents(sf_dir, docs_per_shard))
