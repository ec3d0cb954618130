"""WARC/1.0 codec + shard round trip (functions/warc.py, stages/warc.py)."""

import numpy as np
import pytest

from pyrosar_ray.functions.warc import (
    build_http_response,
    build_warc_record,
    gzip_member,
    parse_http_response,
    parse_warc_gz,
    parse_warc_record,
    split_gzip_members,
    warc_http_overhead,
)


def test_http_overhead_closed_form():
    for status in (200, 404, 503):
        for n in (0, 1, 9, 10, 99, 100, 1234, 99999):
            body = b"x" * n
            msg = build_http_response(body, status=status)
            assert len(msg) - n == warc_http_overhead(n, status)
            st, headers, got = parse_http_response(msg)
            assert st == status and got == body
            assert headers["content-length"] == str(n)


def test_record_roundtrip_and_separator():
    payload = b"hello \xf0\x9f\x8c\x8d world"
    rec = build_warc_record(
        "response", "abc", "2026-01-01T00:00:00Z", payload,
        target_uri="http://x.invalid/1",
    )
    headers, got = parse_warc_record(rec)
    assert got == payload
    assert headers["warc-type"] == "response"
    assert headers["warc-target-uri"] == "http://x.invalid/1"
    # content-length counts payload octets exactly
    assert int(headers["content-length"]) == len(payload)
    # corrupting the separator is detected
    with pytest.raises(ValueError, match="separator"):
        parse_warc_record(rec[:-1] + b"X")
    with pytest.raises(ValueError, match="not a WARC"):
        parse_warc_record(b"WARC/0.9\r\n" + rec[10:])


def test_multi_member_gzip():
    parts = [b"alpha", b"", b"gamma" * 1000]
    blob = b"".join(gzip_member(p) for p in parts)
    assert split_gzip_members(blob) == parts
    # naive single-member decompress would stop after 'alpha'
    import zlib

    assert zlib.decompress(blob, 16 + 15) == b"alpha"
    with pytest.raises(ValueError, match="truncated"):
        split_gzip_members(blob[:-3])


def test_shard_build_and_walk():
    from pyrosar_ray.stages.warc import build_shard

    ids = np.array([7, 5, 23, 6], dtype=np.int64)  # 5: request; 23: 404
    texts = ["seven", "five", "twentythree", "six"]
    blob, n = build_shard(ids, texts)
    # members: warcinfo + (req+rsp for 5) + rsp(6) + rsp(7) + rsp(23)
    assert n == 1 + 2 + 1 + 1 + 1
    recs = parse_warc_gz(blob)
    assert [h["warc-type"] for h, _ in recs] == [
        "warcinfo", "request", "response", "response", "response", "response",
    ]
    # responses in ascending doc order, bodies intact, status rule applied
    bodies, statuses, uris = [], [], []
    for h, p in recs:
        if h["warc-type"] != "response":
            continue
        st, _, body = parse_http_response(p)
        statuses.append(st)
        bodies.append(body.decode())
        uris.append(h["warc-target-uri"])
    assert bodies == ["five", "six", "seven", "twentythree"]
    assert statuses == [200, 200, 200, 404]
    assert uris == [f"http://corpus.invalid/doc/{i}" for i in (5, 6, 7, 23)]


def test_warc_ingest_roundtrip(ray_session, sf_dir):
    """Every document comes back byte-equal through the full
    gzip→WARC→HTTP chain, with closed-form member indices."""
    import pandas as pd

    from pyrosar_ray.stages.warc import warc_ingest

    got = warc_ingest(sf_dir).to_pandas().sort_values("doc_id", ignore_index=True)
    import duckdb

    want = duckdb.sql(
        f"""
        SELECT doc_id, text,
               CASE WHEN doc_id % 23 = 0 THEN 404 ELSE 200 END AS status
        FROM read_parquet('{sf_dir}/documents.parquet') ORDER BY doc_id
        """
    ).df()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["text"].tolist() == want["text"].tolist()  # caption byte-equality
    assert got["status"].tolist() == want["status"].tolist()
    # member_index closed form: 1 + sum of (1+has_req) of earlier docs + has_req
    df = want.assign(shard=want.doc_id // 50, req=(want.doc_id % 5 == 0).astype(int))
    df["members"] = 1 + df.req
    prior = df.groupby("shard")["members"].cumsum() - df["members"]
    expect_idx = 1 + prior + df.req
    assert got["member_index"].tolist() == expect_idx.tolist()


def test_crawl_curate_composition(ray_session, sf_dir):
    """The composed pipeline = dedup winners ∩ quality gate, with the
    html-extraction closed forms intact through the WARC round trip."""
    import duckdb

    from pyrosar_ray.pipelines.crawl import crawl_curate

    got = crawl_curate(sf_dir).to_pandas().sort_values("doc_id", ignore_index=True)
    want = duckdb.sql(
        f"""
        SELECT doc_id, len(string_split(text, ' ')) AS nw
        FROM read_parquet('{sf_dir}/documents.parquet')
        WHERE doc_id % 3 = 0
          AND (len(string_split(text, ' ')) + 9) // 10 >= 2
          AND 3 + CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END
              + CASE WHEN len(string_split(text, ' ')) >= 6
                     THEN (len(string_split(text, ' ')) - 6) // 13 + 1
                     ELSE 0 END <= 9
        ORDER BY doc_id
        """
    ).df()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert (got["n_blocks"] == (want["nw"] + 9) // 10).all()
    # text survives: blocks joined by newline reassemble the source words
    row = got.iloc[0]
    src = duckdb.sql(
        f"SELECT text FROM read_parquet('{sf_dir}/documents.parquet') "
        f"WHERE doc_id = {row.doc_id}"
    ).fetchone()[0]
    assert row.text.replace("\n", " ") == src
