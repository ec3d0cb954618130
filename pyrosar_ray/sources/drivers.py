"""Format drivers: per-row metadata parsing with magic-byte dispatch.

Engine twin of the reference's driver zoo (identify/ID subclasses,
pyroSAR/drivers.py:69-120 + the per-format parser classes at
drivers.py:795-2525): every scene blob is sniffed against a registry of
format parsers; the first parser whose magic matches wins. Parsing
failures NEVER raise — the row comes back with ``sensor=None`` and an
``error`` string, surfaced as metrics (the reference swallows identify
failures the same way, drivers.py:115-119).

Drivers registered by default:

- the four structurally-real grammars in :mod:`.formats` — SAFE
  (manifest + annotation XML), CEOS_PSR (big-endian leader records),
  ESA (MPH/SPH + binary geolocation ADS), TSX (annotation + GEOREF
  with the >180° longitude wrap);
- three compact synthetic formats (XML-ish, fixed-offset binary,
  key=value) kept for cheap high-volume fixtures — they carry the SAME
  full 16-attribute contract.

Every parser must populate all of ``RECORD_FIELDS`` (the reference's
__LOCAL__ contract, pyroSAR/config.py:20-25, enforced at
drivers.py:220-231); ``identify_many`` validates and emits an Arrow
table typed per ``catalog.schema.SCENE_SCHEMA``.
"""

from __future__ import annotations

import re
import struct
from collections.abc import Callable

import pyarrow as pa
from ray.data import Dataset

from ..catalog.schema import LOCAL_ATTRS, SCENE_SCHEMA
from .formats.common import WKT4326

#: parsed-record fields every driver must populate (engine's __LOCAL__;
#: reference contract: pyroSAR/config.py:20-25, enforced drivers.py:220-231)
RECORD_FIELDS = LOCAL_ATTRS


# --------------------------------------------------------------- formats

_STR_FIELDS = ("sensor", "acquisition_mode", "orbit", "start", "stop", "product", "projection")
_INT_FIELDS = ("lines", "samples", "orbitNumber_abs", "orbitNumber_rel", "cycleNumber", "frameNumber")


def _encode_compound(meta: dict) -> dict:
    """Render list/tuple attrs as flat strings for the text formats."""
    out = {k: meta[k] for k in (*_STR_FIELDS, *_INT_FIELDS)}
    out["coordinates"] = " ".join(f"{lon!r},{lat!r}" for lon, lat in meta["coordinates"])
    out["polarizations"] = " ".join(meta["polarizations"])
    rg, az = meta["spacing"]
    out["spacing"] = f"{rg!r} {az!r}"
    return out


def _decode_compound(out: dict) -> dict:
    for k in _INT_FIELDS:
        out[k] = int(out[k])
    out["coordinates"] = [
        tuple(float(v) for v in pair.split(",")) for pair in out["coordinates"].split()
    ]
    out["polarizations"] = out["polarizations"].split()
    rg, az = out["spacing"].split()
    out["spacing"] = (float(rg), float(az))
    return out


def encode_xmlish(meta: dict) -> bytes:
    body = "".join(f"<{k}>{v}</{k}>" for k, v in _encode_compound(meta).items())
    return f"<scene>{body}</scene>".encode()


def parse_xmlish(blob: bytes) -> dict:
    """SAFE-style shape: field extraction from an XML manifest."""
    text = blob.decode("utf-8", "strict")
    out = {}
    for key in RECORD_FIELDS:
        m = re.search(f"<{key}>(.*?)</{key}>", text, re.DOTALL)
        if m is None:
            raise ValueError(f"missing field {key}")
        out[key] = m.group(1)
    return _decode_compound(out)


_CEOS_MAGIC = b"CEOS"
_CEOS_HEAD = ">4s4s4sB4s15s15siiiiiiddB"
_CEOS_PAIR = ">ii"
_POL_BITS = ("HH", "VV", "HV", "VH")


def encode_ceosish(meta: dict) -> bytes:
    """Fixed-offset big-endian binary header (CEOS_PSR shape); corner
    coordinates as µdeg ints (reference scaling drivers.py:1174-1175)."""
    polflags = 0
    for i, p in enumerate(_POL_BITS):
        if p in meta["polarizations"]:
            polflags |= 1 << i
    rg, az = meta["spacing"]
    head = struct.pack(
        _CEOS_HEAD,
        _CEOS_MAGIC,
        meta["sensor"].encode().ljust(4),
        meta["acquisition_mode"].encode().ljust(4),
        ord(meta["orbit"]),
        meta["product"].encode().ljust(4)[:4],
        meta["start"].encode(),
        meta["stop"].encode(),
        int(meta["lines"]),
        int(meta["samples"]),
        int(meta["orbitNumber_abs"]),
        int(meta["orbitNumber_rel"]),
        int(meta["cycleNumber"]),
        int(meta["frameNumber"]),
        float(rg),
        float(az),
        polflags,
    )
    coords = b"".join(
        struct.pack(_CEOS_PAIR, round(lon * 1e6), round(lat * 1e6))
        for lon, lat in meta["coordinates"]
    )
    return head + struct.pack("B", len(meta["coordinates"])) + coords


def parse_ceosish(blob: bytes) -> dict:
    """CEOS-style shape: struct.unpack at fixed offsets; µdeg coords ÷ 1e6."""
    head_len = struct.calcsize(_CEOS_HEAD)
    (
        magic, sensor, mode, orbit, product, start, stop,
        lines, samples, onum_abs, onum_rel, cyc, frame, rg, az, polflags,
    ) = struct.unpack(_CEOS_HEAD, blob[:head_len])
    if magic != _CEOS_MAGIC:
        raise ValueError("bad magic")
    (ncoords,) = struct.unpack_from("B", blob, head_len)
    pair_len = struct.calcsize(_CEOS_PAIR)
    coords = []
    for i in range(ncoords):
        lon_u, lat_u = struct.unpack_from(_CEOS_PAIR, blob, head_len + 1 + i * pair_len)
        coords.append((lon_u / 1e6, lat_u / 1e6))
    return {
        "sensor": sensor.decode().strip(),
        "acquisition_mode": mode.decode().strip(),
        "orbit": chr(orbit),
        "product": product.decode().strip(),
        "start": start.decode(),
        "stop": stop.decode(),
        "lines": lines,
        "samples": samples,
        "orbitNumber_abs": onum_abs,
        "orbitNumber_rel": onum_rel,
        "cycleNumber": cyc,
        "frameNumber": frame,
        "spacing": (rg, az),
        "polarizations": [p for i, p in enumerate(_POL_BITS) if polflags & (1 << i)],
        "coordinates": coords,
        "projection": WKT4326,
    }


def encode_kvish(meta: dict) -> bytes:
    body = "\n".join(f"{k.upper()}={v}" for k, v in _encode_compound(meta).items())
    return ("HDR1\n" + body).encode()


def parse_kvish(blob: bytes) -> dict:
    """ESA MPH/SPH-style key=value text header."""
    text = blob.decode("utf-8", "strict")
    if not text.startswith("HDR1\n"):
        raise ValueError("bad header")
    kv = dict(line.split("=", 1) for line in text.splitlines()[1:] if "=" in line)
    out = {k: kv[k.upper()] for k in RECORD_FIELDS}
    return _decode_compound(out)


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


def _register_defaults() -> dict:
    from .formats import (
        parse_ceos_ers,
        parse_ceos_psr,
        parse_dimap,
        parse_eorc_psr,
        parse_esa,
        parse_safe,
        parse_tsx,
        sniff_ceos_ers,
        sniff_ceos_psr,
        sniff_dimap,
        sniff_eorc_psr,
        sniff_esa,
        sniff_safe,
        sniff_tsx,
    )

    return {
        # real grammars first — archive sniffs share one member listing
        "SAFE": (sniff_safe, parse_safe),
        "CEOS_PSR": (sniff_ceos_psr, parse_ceos_psr),
        "TSX": (sniff_tsx, parse_tsx),
        "ESA": (sniff_esa, parse_esa),
        "BEAM_DIMAP": (sniff_dimap, parse_dimap),
        "CEOS_ERS": (sniff_ceos_ers, parse_ceos_ers),
        "EORC_PSR": (sniff_eorc_psr, parse_eorc_psr),
        # compact synthetic formats (same 16-attr contract)
        "xmlish": (lambda b, m=None: b.startswith(b"<scene>"), parse_xmlish),
        "ceosish": (lambda b, m=None: b.startswith(_CEOS_MAGIC), parse_ceosish),
        "kvish": (lambda b, m=None: b.startswith(b"HDR1\n"), parse_kvish),
    }


#: fmt → (sniff, parse); sniff takes (blob, members|None)
DRIVERS: dict[str, tuple[Callable, Callable[[bytes], dict]]] = _register_defaults()


def register_driver(fmt: str, sniff: Callable, parse: Callable[[bytes], dict]):
    """Extension point: add a new format driver (reference equivalent:
    subclassing ID, drivers.py:109-119). ``sniff(blob, members)`` gets the
    archive member listing when the blob is a zip/tar, else None."""
    DRIVERS[fmt] = (sniff, parse)


def identify(blob) -> dict | None:
    """Try every registered driver until one sniffs + parses; None if all
    fail (reference: identify's loop, drivers.py:109-119). Accepts bytes
    (the engine's native blob column) or a filesystem path — the
    reference's ``identify(filename)`` spelling — which is read/packed
    via :mod:`.paths` first."""
    import os

    if isinstance(blob, (str, os.PathLike)):
        from .paths import path_to_blob

        blob = path_to_blob(blob)
    members: list[str] | None = None
    if blob[:2] == b"PK" or (len(blob) > 262 and blob[257:262] == b"ustar"):
        try:
            members = list_members(blob)
        except ValueError:
            members = None
    for _fmt, (sniff, parse) in DRIVERS.items():
        try:
            hit = sniff(blob, members) if members is not None else sniff(blob, None)
            if hit:
                return parse(blob)
        except Exception:  # noqa: BLE001 - parity: failures are swallowed
            continue
    return None


# ----------------------------------------------------- record → Arrow


def _normalize(value, name: str):
    if value is None:
        return None
    if name == "coordinates":
        return [{"lon": float(lon), "lat": float(lat)} for lon, lat in value]
    if name == "spacing":
        if isinstance(value, (tuple, list)):
            return {"rg": float(value[0]), "az": float(value[1])}
        # OCN products carry spacing = -1 (drivers.py:2260)
        return {"rg": float(value), "az": float(value)}
    if name == "polarizations":
        return [str(p) for p in value]
    return value


def records_to_table(records: list[dict]) -> pa.Table:
    """Parsed record dicts → Arrow table typed per SCENE_SCHEMA (+error)."""
    cols = {}
    for name in LOCAL_ATTRS:
        typ = SCENE_SCHEMA.field(name).type
        cols[name] = pa.array([_normalize(r.get(name), name) for r in records], type=typ)
    cols["error"] = pa.array(
        [r.get("error") for r in records], type=pa.string()
    )
    return pa.table(cols)


def identify_many(
    blobs: Dataset,
    blob_col: str = "blob",
    sortkey: str | None = "start",
    keep_cols: tuple[str, ...] | None = None,
) -> Dataset:
    """Parse a blob Dataset into 16-attribute metadata records.

    Mirrors identify_many (drivers.py:123-186): parse fan-out, failures
    dropped (kept as null-sensor rows with ``error`` until the filter),
    optional sort by attribute. Each successful record is validated
    against the full contract (the reference raises KeyError on a
    missing standardized attribute, drivers.py:220-231; the engine
    converts that to a dropped error row). Stateless map_batches; the
    sort is the only wide op.
    """
    from ..catalog.schema import validate_record

    def _parse(batch: pa.Table) -> pa.Table:
        records = []
        for blob in batch[blob_col].to_pylist():
            rec = identify(blob)
            if rec is None:
                rec = {"error": "identify failed"}
            else:
                try:
                    validate_record(rec)
                    rec["error"] = None
                except KeyError as err:
                    rec = {"error": str(err)}
            records.append(rec)
        tab = records_to_table(records)
        for c in batch.column_names:
            if c == blob_col:
                continue
            if keep_cols is None or c in keep_cols:
                tab = tab.append_column(c, batch[c])
        return tab

    parsed = blobs.map_batches(_parse, batch_format="pyarrow")
    ok = parsed.map_batches(
        lambda b: b.filter(pa.compute.is_valid(b["sensor"])), batch_format="pyarrow"
    )
    if sortkey:
        ok = ok.sort(sortkey)
    return ok


def derive_catalog_columns(records: Dataset) -> Dataset:
    """Parsed records → reference catalog columns, vectorized.

    Appends outname_base (drivers.py:584-608), hh/vv/hv/vh 0/1 flags
    (archive.py:476-477) and the bbox corners xmin/ymin/xmax/ymax
    (getCorners, drivers.py:479-492) — segmented numpy reductions over
    the flattened list columns, no per-row Python. Assumes every record
    carries ≥1 coordinate and ≥1 polarization (the contract validated
    by identify_many).
    """
    import numpy as np
    import pyarrow.compute as pc

    from ..functions.names import outname_base_array

    def _derive(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            out = batch.append_column("outname_base", pa.array([], type=pa.string()))
            for p in ("hh", "vv", "hv", "vh"):
                out = out.append_column(p, pa.array([], type=pa.int32()))
            for name in ("xmin", "ymin", "xmax", "ymax"):
                out = out.append_column(name, pa.array([], type=pa.float64()))
            return out
        coords = batch["coordinates"].combine_chunks()
        flat = pc.list_flatten(coords)
        lens = pc.list_value_length(coords).to_numpy()
        off = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)
        lon = flat.field("lon").to_numpy()
        lat = flat.field("lat").to_numpy()
        xmin = np.minimum.reduceat(lon, off)
        xmax = np.maximum.reduceat(lon, off)
        ymin = np.minimum.reduceat(lat, off)
        ymax = np.maximum.reduceat(lat, off)

        pols = batch["polarizations"].combine_chunks()
        pflat = pc.list_flatten(pols).to_numpy(zero_copy_only=False)
        plens = pc.list_value_length(pols).to_numpy()
        poff = np.concatenate([[0], np.cumsum(plens)[:-1]]).astype(np.int64)
        flags = {}
        for p in ("hh", "vv", "hv", "vh"):
            hit = (pflat == p.upper()).astype(np.int32)
            flags[p] = np.minimum(np.add.reduceat(hit, poff), 1) if len(pflat) else np.zeros(len(batch), np.int32)

        base = outname_base_array(
            batch["sensor"].to_pandas(),
            batch["acquisition_mode"].to_pandas(),
            batch["orbit"].to_pandas(),
            batch["start"].to_pandas(),
        )
        out = batch.append_column("outname_base", pa.array(base, type=pa.string()))
        for p in ("hh", "vv", "hv", "vh"):
            out = out.append_column(p, pa.array(flags[p], type=pa.int32()))
        for name, arr in (("xmin", xmin), ("ymin", ymin), ("xmax", xmax), ("ymax", ymax)):
            out = out.append_column(name, pa.array(arr, type=pa.float64()))
        return out

    return records.map_batches(_derive, batch_format="pyarrow")
