"""WARC/1.0 container codec (ISO 28500) — the web-crawl ingestion
surface: gzipped WARC files are how Common-Crawl-style corpora arrive,
and "parse the WARC, keep the responses, extract the payload" is the
first stage of every web-scale text pipeline.

Implements the real framing rules, not a toy line format:

- one **gzip member per record** (the ``.warc.gz`` convention —
  mandatory for random access / record-level splitting; readers MUST
  handle multi-member streams, which naive ``gzip.decompress`` does),
- CRLF header discipline: version line, ``Name: value`` header block,
  blank line, exactly ``Content-Length`` payload octets, then the
  mandatory two-CRLF record separator,
- case-insensitive header names,
- ``response`` record payloads are full HTTP/1.1 messages (status
  line + headers + CRLF + body) — the body has to be dug out of the
  HTTP framing, exactly like a real crawl extract,
- non-response records (``warcinfo``, ``request``) interleaved and
  skipped by type, never by position.

Every length in the framing is arithmetic in the record's inputs, so
the whole encode → gzip → multi-member split → WARC parse → HTTP parse
chain is hash-checkable against a closed-form SQL twin.

Reference surface: pyroSAR reads scene archives as opaque containers
with member framing (drivers.py getFileObj / examine zip+tar walking);
this is the analogous container walk for the web-text modality.
"""

from __future__ import annotations

import zlib

_CRLF = b"\r\n"
_VERSION = b"WARC/1.0"

# fixed HTTP response header block (lengths are part of the SQL twin's
# closed-form arithmetic — keep in sync with warc_http_overhead())
_HTTP_CONTENT_TYPE = b"text/plain; charset=utf-8"


def build_http_response(body: bytes, status: int = 200) -> bytes:
    """Minimal deterministic HTTP/1.1 response message."""
    reason = {200: b"OK", 404: b"Not Found", 503: b"Service Unavailable"}[status]
    return (
        b"HTTP/1.1 %d %s\r\n" % (status, reason)
        + b"Content-Type: %s\r\n" % _HTTP_CONTENT_TYPE
        + b"Content-Length: %d\r\n" % len(body)
        + _CRLF
        + body
    )


def warc_http_overhead(body_len: int, status: int = 200) -> int:
    """Closed-form length of the HTTP framing around a body of
    ``body_len`` octets — the twin of ``len(build_http_response(b)) -
    len(b)``, used by the SQL oracle."""
    reason_len = {200: 2, 404: 9, 503: 19}[status]
    status_line = 9 + 3 + 1 + reason_len + 2  # 'HTTP/1.1 ' NNN ' ' reason CRLF
    ctype = 14 + len(_HTTP_CONTENT_TYPE) + 2  # 'Content-Type: ' ... CRLF
    clen = 16 + len(str(body_len)) + 2  # 'Content-Length: ' digits CRLF
    return status_line + ctype + clen + 2  # + blank line


def build_warc_record(
    warc_type: str,
    record_id: str,
    date: str,
    payload: bytes,
    target_uri: str | None = None,
) -> bytes:
    """One WARC/1.0 record with canonical header order."""
    headers = [
        (b"WARC-Type", warc_type.encode()),
        (b"WARC-Record-ID", b"<urn:uuid:%s>" % record_id.encode()),
        (b"WARC-Date", date.encode()),
    ]
    if target_uri is not None:
        headers.append((b"WARC-Target-URI", target_uri.encode()))
    headers.append((b"Content-Length", str(len(payload)).encode()))
    head = _VERSION + _CRLF
    for name, value in headers:
        head += name + b": " + value + _CRLF
    return head + _CRLF + payload + _CRLF + _CRLF


def gzip_member(data: bytes) -> bytes:
    """One deterministic gzip member (mtime pinned to 0)."""
    co = zlib.compressobj(9, zlib.DEFLATED, 16 + 15)
    # wbits 16+15 emits a gzip wrapper; zlib writes mtime=0 itself
    return co.compress(data) + co.flush()


def split_gzip_members(blob: bytes) -> list[bytes]:
    """Decompress a multi-member gzip stream into per-member payloads.

    ``zlib.decompress`` stops at the first member; real ``.warc.gz``
    readers must loop over ``unused_data``.
    """
    out: list[bytes] = []
    rest = blob
    while rest:
        dec = zlib.decompressobj(16 + 15)
        out.append(dec.decompress(rest))
        out[-1] += dec.flush()
        if not dec.eof:
            raise ValueError("truncated gzip member")
        rest = dec.unused_data
    return out


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(_CRLF):
        if not line:
            continue
        name, _, value = line.partition(b":")
        if not _:
            raise ValueError(f"malformed header line: {line[:60]!r}")
        headers[name.strip().lower().decode()] = value.strip().decode()
    return headers


def parse_warc_record(data: bytes) -> tuple[dict[str, str], bytes]:
    """One decompressed member → (warc headers, payload octets)."""
    if not data.startswith(_VERSION + _CRLF):
        raise ValueError(f"not a WARC/1.0 record: {data[:20]!r}")
    head_end = data.index(_CRLF + _CRLF)
    headers = _parse_headers(data[len(_VERSION) + 2 : head_end])
    length = int(headers["content-length"])
    start = head_end + 4
    payload = data[start : start + length]
    if len(payload) != length:
        raise ValueError("payload shorter than Content-Length")
    if data[start + length : start + length + 4] != _CRLF + _CRLF:
        raise ValueError("missing record separator")
    return headers, payload


def parse_http_response(payload: bytes) -> tuple[int, dict[str, str], bytes]:
    """HTTP/1.1 message → (status, headers, body by Content-Length)."""
    line_end = payload.index(_CRLF)
    parts = payload[:line_end].split(b" ", 2)
    if parts[0] != b"HTTP/1.1":
        raise ValueError(f"not HTTP/1.1: {parts[0]!r}")
    status = int(parts[1])
    head_end = payload.index(_CRLF + _CRLF, line_end)
    headers = _parse_headers(payload[line_end + 2 : head_end])
    body = payload[head_end + 4 :]
    length = int(headers.get("content-length", len(body)))
    return status, headers, body[:length]


def parse_warc_gz(blob: bytes) -> list[tuple[dict[str, str], bytes]]:
    """Full ``.warc.gz`` shard → list of (warc headers, payload)."""
    return [parse_warc_record(m) for m in split_gzip_members(blob)]
