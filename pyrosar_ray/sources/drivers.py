"""Format drivers: per-row metadata parsing with magic-byte dispatch.

Engine twin of the reference's driver zoo (identify/ID subclasses,
pyroSAR/drivers.py:69-120 + the per-format parser classes at
drivers.py:795-2525): every scene blob is sniffed against a registry of
format parsers; the first parser whose magic matches wins. Parsing
failures NEVER raise — the row comes back with ``sensor=None`` and an
``error`` string, surfaced as metrics (the reference swallows identify
failures the same way, drivers.py:115-119).

The registry is user-extensible (``register_driver``), mirroring the
reference's ``__subclasses__`` discovery (drivers.py:109-119). The
formats here are deterministic synthetic stand-ins (an XML-ish
manifest, a fixed-offset big-endian binary header, a key=value text
header) that exercise the same parsing shapes as SAFE / CEOS_PSR / ESA:
XML field extraction, ``struct.unpack`` fixed offsets with 1e-6 coord
scaling, and key=value harvesting.
"""

from __future__ import annotations

import re
import struct
from collections.abc import Callable

import pyarrow as pa
from ray.data import Dataset

#: parsed-record fields every driver must populate (engine's __LOCAL__;
#: reference contract: pyroSAR/config.py:20-25, enforced drivers.py:220-231)
RECORD_FIELDS = ("sensor", "acquisition_mode", "orbit", "start", "lines", "samples")


# --------------------------------------------------------------- formats


def encode_xmlish(meta: dict) -> bytes:
    body = "".join(f"<{k}>{v}</{k}>" for k, v in meta.items())
    return f"<scene>{body}</scene>".encode()


def parse_xmlish(blob: bytes) -> dict:
    """SAFE-style: field extraction from an XML manifest."""
    text = blob.decode("utf-8", "strict")
    out = {}
    for key in RECORD_FIELDS:
        m = re.search(f"<{key}>([^<]*)</{key}>", text)
        if m is None:
            raise ValueError(f"missing field {key}")
        out[key] = m.group(1)
    out["lines"] = int(out["lines"])
    out["samples"] = int(out["samples"])
    return out


_CEOS_MAGIC = b"CEOS"
_CEOS_FMT = ">4s4s4sB15sii ii".replace(" ", "")


def encode_ceosish(meta: dict, lon_udeg: int = 0, lat_udeg: int = 0) -> bytes:
    """Fixed-offset big-endian binary header (CEOS_PSR shape)."""
    return struct.pack(
        _CEOS_FMT,
        _CEOS_MAGIC,
        meta["sensor"].encode().ljust(4),
        meta["acquisition_mode"].encode().ljust(4),
        ord(meta["orbit"]),
        meta["start"].encode(),
        int(meta["lines"]),
        int(meta["samples"]),
        lon_udeg,
        lat_udeg,
    )


def parse_ceosish(blob: bytes) -> dict:
    """CEOS-style: struct.unpack at fixed offsets; µdeg coords ÷ 1e6
    (reference scaling: drivers.py:1174-1175)."""
    magic, sensor, mode, orbit, start, lines, samples, lon_u, lat_u = struct.unpack(
        _CEOS_FMT, blob[: struct.calcsize(_CEOS_FMT)]
    )
    if magic != _CEOS_MAGIC:
        raise ValueError("bad magic")
    return {
        "sensor": sensor.decode().strip(),
        "acquisition_mode": mode.decode().strip(),
        "orbit": chr(orbit),
        "start": start.decode(),
        "lines": lines,
        "samples": samples,
        "lon": lon_u / 1e6,
        "lat": lat_u / 1e6,
    }


def encode_kvish(meta: dict) -> bytes:
    return ("HDR1\n" + "\n".join(f"{k.upper()}={v}" for k, v in meta.items())).encode()


def parse_kvish(blob: bytes) -> dict:
    """ESA MPH/SPH-style key=value text header."""
    text = blob.decode("utf-8", "strict")
    if not text.startswith("HDR1\n"):
        raise ValueError("bad header")
    kv = dict(line.split("=", 1) for line in text.splitlines()[1:] if "=" in line)
    out = {k: kv[k.upper()] for k in RECORD_FIELDS}
    out["lines"] = int(out["lines"])
    out["samples"] = int(out["samples"])
    return out


# ------------------------------------------------------- archive members


def list_members(blob: bytes) -> list[str]:
    """Member names of a zip/tar scene blob, sorted (deterministic order;
    reference sorts before extraction, drivers.py:751,767)."""
    import io
    import tarfile
    import zipfile

    bio = io.BytesIO(blob)
    if zipfile.is_zipfile(bio):
        bio.seek(0)
        with zipfile.ZipFile(bio) as zf:
            return sorted(zf.namelist())
    bio.seek(0)
    try:
        with tarfile.open(fileobj=bio) as tf:
            return sorted(m.name for m in tf.getmembers())
    except tarfile.TarError as err:
        raise ValueError("blob is neither zip nor tar") from err


def find_members(blob: bytes, pattern: str) -> list[str]:
    """Members matching a regex (ID.findfiles, drivers.py:372-427)."""
    rx = re.compile(pattern)
    return [m for m in list_members(blob) if rx.search(m)]


def get_member(blob: bytes, name: str) -> bytes:
    """Random access to one member of a zip/tar scene blob
    (getFileObj, drivers.py:2528-2575) — in-task, no filesystem."""
    import io
    import tarfile
    import zipfile

    bio = io.BytesIO(blob)
    if zipfile.is_zipfile(bio):
        bio.seek(0)
        with zipfile.ZipFile(bio) as zf:
            return zf.read(name)
    bio.seek(0)
    with tarfile.open(fileobj=bio) as tf:
        fh = tf.extractfile(name)
        if fh is None:
            raise KeyError(name)
        return fh.read()


# -------------------------------------------------------------- registry

#: fmt → (sniff, parse); sniff returns bool on raw bytes
DRIVERS: dict[str, tuple[Callable[[bytes], bool], Callable[[bytes], dict]]] = {
    "xmlish": (lambda b: b.startswith(b"<scene>"), parse_xmlish),
    "ceosish": (lambda b: b.startswith(_CEOS_MAGIC), parse_ceosish),
    "kvish": (lambda b: b.startswith(b"HDR1\n"), parse_kvish),
}


def register_driver(fmt: str, sniff: Callable[[bytes], bool], parse: Callable[[bytes], dict]):
    """Extension point: add a new format driver (reference equivalent:
    subclassing ID, drivers.py:109-119)."""
    DRIVERS[fmt] = (sniff, parse)


def identify(blob: bytes) -> dict | None:
    """Try every registered driver until one sniffs + parses; None if all
    fail (reference: identify's loop, drivers.py:109-119)."""
    for _fmt, (sniff, parse) in DRIVERS.items():
        try:
            if sniff(blob):
                return parse(blob)
        except Exception:  # noqa: BLE001 - parity: failures are swallowed
            continue
    return None


def identify_many(
    blobs: Dataset, blob_col: str = "blob", sortkey: str | None = "start"
) -> Dataset:
    """Parse a blob Dataset into metadata records, dropping failures.

    Mirrors identify_many (drivers.py:123-186): parse fan-out, failures
    dropped (kept as null-sensor rows with ``error`` until the filter),
    optional sort by attribute. Stateless map_batches; the sort is the
    only wide op.
    """

    def _parse(batch: pa.Table) -> pa.Table:
        records = []
        for blob in batch[blob_col].to_pylist():
            rec = identify(blob)
            if rec is None:
                rec = {k: None for k in RECORD_FIELDS}
                rec["error"] = "identify failed"
            else:
                rec["error"] = None
            records.append(rec)
        out = {
            k: pa.array([r.get(k) for r in records])
            for k in (*RECORD_FIELDS, "error")
        }
        keep = [c for c in batch.column_names if c != blob_col]
        tab = pa.table(out)
        for c in keep:
            tab = tab.append_column(c, batch[c])
        return tab

    parsed = blobs.map_batches(_parse, batch_format="pyarrow")
    ok = parsed.map_batches(
        lambda b: b.filter(pa.compute.is_valid(b["sensor"])), batch_format="pyarrow"
    )
    if sortkey:
        ok = ok.sort(sortkey)
    return ok
