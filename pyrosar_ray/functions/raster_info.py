"""GDAL-free raster metadata probe — ``ID.gdalinfo`` parity.

Reference semantics (pyroSAR/drivers.py:429-477): ``gdal.Open`` on the
scene's raster header, then emit ``samples``/``lines``/``bands``, the
GCP projection, the GCP list, and every driver metadata item passed
through literal parsing, a date-normalization attempt, and µdeg scaling
of any key matching ``LAT|LONG`` (÷ 1e6, drivers.py:474-476).

GDAL is not available in this engine's environment, so the probe reads
the containers the engine itself produces/consumes natively:

- classic little-endian (Geo)TIFF — the tiled layout of
  ``functions.tiff.encode_geotiff`` (IFD walk only; tile payloads are
  never touched, so probing a 100 MB raster costs a few KB of reads);
- PNG — IHDR fields (``functions.png`` holds the full codec);
- ENVI header + raw pairs — ``functions.sar.parse_envi_hdr`` grammar.

Every branch lands in the same reference-shaped dict so downstream
stages dispatch on content, not container.
"""

from __future__ import annotations

import re
import struct
from typing import Any

from .dates import parse_date

#: ENVI data-type code → (numpy kind, bits) — mirrors functions.sar
_ENVI_BITS = {1: 8, 2: 16, 3: 32, 4: 32, 5: 64, 12: 16, 13: 32, 14: 64, 15: 64}
_ENVI_KIND = {1: "uint", 2: "int", 3: "int", 4: "float", 5: "float",
              12: "uint", 13: "uint", 14: "int", 15: "uint"}

#: PNG color type → band count
_PNG_BANDS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

_LATLONG = re.compile("LAT|LONG")


def parse_literal(x: str) -> Any:
    """int → float → str fallback (reference ancillary.parse_literal)."""
    for cast in (int, float):
        try:
            return cast(x)
        except (TypeError, ValueError):
            continue
    return x


def _normalize_extra(items: dict[str, str]) -> dict[str, Any]:
    """Replay drivers.py:466-477 on a metadata item dict: literal-parse
    each value, try date normalization, scale µdeg LAT/LONG keys."""
    out: dict[str, Any] = {}
    for key, raw in items.items():
        val = parse_literal(str(raw).strip())
        try:
            val = parse_date(str(val))
        except ValueError:
            pass
        if _LATLONG.search(key) and isinstance(val, (int, float)):
            val = val / 1e6
        out[key] = val
    return out


def tiff_info(blob: bytes) -> dict:
    """IFD-only probe of the engine's tiled little-endian GeoTIFF."""
    from .tiff import _ASCII, _read_values

    if blob[:4] != b"II*\x00":
        raise ValueError("not a little-endian classic TIFF")
    (ifd,) = struct.unpack_from("<I", blob, 4)
    (n,) = struct.unpack_from("<H", blob, ifd)
    tags: dict[int, list] = {}
    for i in range(n):
        tag, typ, count = struct.unpack_from("<HHI", blob, ifd + 2 + i * 12)
        raw = blob[ifd + 2 + i * 12 + 8 : ifd + 2 + i * 12 + 12]
        tags[tag] = _read_values(blob, typ, count, raw)

    bits = tags[258][0]
    sfmt = tags.get(339, [1])[0]
    kind = {1: "uint", 2: "int", 3: "float"}[sfmt]
    scale = tags.get(33550, [1.0, 1.0, 0.0])
    tie = tags.get(33922, [0.0] * 6)
    band_names = None
    extra: dict[str, str] = {}
    if 42112 in tags:
        band_names = re.findall(r'role="description">([^<]*)</Item>', tags[42112][0])
        for k, v in re.findall(r'<Item name="([^"]+)">([^<]*)</Item>', tags[42112][0]):
            if k != "DESCRIPTION":
                extra[k] = v
    nodata = tags.get(42113)
    projection = None
    if 34735 in tags:
        keys = tags[34735]
        # GeoKey directory: 4-word header then (key, loc, count, value)
        # quads; 2048 = GeographicTypeGeoKey carries the EPSG code
        for j in range(4, len(keys) - 3, 4):
            if keys[j] == 2048 and keys[j + 1] == 0:
                projection = f"EPSG:{keys[j + 3]}"
    return {
        "driver": "GTiff",
        "samples": tags[256][0],
        "lines": tags[257][0],
        "bands": tags.get(277, [1])[0],
        "dtype": f"{kind}{bits}",
        "projection": projection,
        "gcps": [],
        "geotransform": (tie[3], scale[0], 0.0, tie[4], 0.0, -scale[1]),
        "nodata": float(nodata[0]) if nodata else None,
        "band_names": band_names,
        "extra": _normalize_extra(extra),
    }


def png_info(blob: bytes) -> dict:
    """IHDR probe of a PNG blob."""
    if blob[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    length, tag = struct.unpack_from(">I4s", blob, 8)
    if tag != b"IHDR":
        raise ValueError("corrupt PNG: first chunk is not IHDR")
    w, h, depth, color = struct.unpack_from(">IIBB", blob, 16)
    return {
        "driver": "PNG",
        "samples": w,
        "lines": h,
        "bands": _PNG_BANDS[color],
        "dtype": f"uint{depth}",
        "projection": None,
        "gcps": [],
        "geotransform": None,
        "nodata": None,
        "band_names": None,
        "extra": {},
    }


def jpeg_info(blob: bytes) -> dict:
    """SOF probe of a JPEG blob: marker walk to the frame header —
    size, band count, precision and entropy layout (baseline vs
    progressive) at header-only cost, no entropy decode."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    while pos + 4 <= len(blob):
        if blob[pos] != 0xFF:
            raise ValueError(f"corrupt JPEG: expected marker at byte {pos}")
        marker = blob[pos + 1]
        pos += 2
        if marker in (0xD8,) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9 or marker == 0xDA:
            break  # EOI / entropy data before any SOF
        (seglen,) = struct.unpack_from(">H", blob, pos)
        if marker in (0xC0, 0xC1, 0xC2):
            precision, h, w, ncomp = struct.unpack_from(">BHHB", blob, pos + 2)
            return {
                "driver": "JPEG",
                "samples": w,
                "lines": h,
                "bands": ncomp,
                "dtype": f"uint{precision}",
                "projection": None,
                "gcps": [],
                "geotransform": None,
                "nodata": None,
                "band_names": None,
                "extra": {"progressive": marker == 0xC2},
            }
        pos += seglen
    raise ValueError("corrupt JPEG: no frame header found")


def envi_info(hdr_text: str) -> dict:
    """Header probe of an ENVI raster (``functions.sar.envi_hdr`` grammar)."""
    from .sar import parse_envi_hdr

    h = parse_envi_hdr(hdr_text)
    code = int(h.get("data type", 4))
    geotransform = None
    if "map info" in h:
        parts = [p.strip() for p in h["map info"].split(",")]
        ulx, uly = float(parts[3]), float(parts[4])
        xres, yres = float(parts[5]), float(parts[6])
        geotransform = (ulx, xres, 0.0, uly, 0.0, -yres)
    known = {"samples", "lines", "bands", "data type", "map info",
             "coordinate system string", "header offset", "file type",
             "interleave", "byte order", "description", "band names"}
    extra = {k: v for k, v in h.items() if k not in known}
    return {
        "driver": "ENVI",
        "samples": int(h["samples"]),
        "lines": int(h["lines"]),
        "bands": int(h.get("bands", 1)),
        "dtype": f"{_ENVI_KIND[code]}{_ENVI_BITS[code]}",
        "projection": h.get("coordinate system string"),
        "gcps": [],
        "geotransform": geotransform,
        "nodata": parse_literal(h["data ignore value"])
        if "data ignore value" in h
        else None,
        "band_names": [b.strip() for b in h["band names"].split(",")]
        if "band names" in h
        else None,
        "extra": _normalize_extra(extra),
    }


def raster_info(blob: bytes | None = None, hdr_text: str | None = None) -> dict:
    """Sniff the container and return the gdalinfo-shaped metadata dict.

    ``hdr_text`` routes to the ENVI branch (raw payloads carry no
    magic); otherwise the blob's magic bytes decide.
    """
    if hdr_text is not None:
        return envi_info(hdr_text)
    if blob is None:
        raise ValueError("need a raster blob or an ENVI header")
    if blob[:4] == b"II*\x00":
        return tiff_info(blob)
    if blob[:8] == b"\x89PNG\r\n\x1a\n":
        return png_info(blob)
    if blob[:2] == b"\xff\xd8":
        return jpeg_info(blob)
    if blob[:6] in (b"GIF87a", b"GIF89a"):
        from .gif import gif_info

        return gif_info(blob)
    if blob[:4] == b"qoif":
        from .qoi import parse_qoi_header

        q = parse_qoi_header(blob)
        return {
            "driver": "QOI",
            "samples": q["w"],
            "lines": q["h"],
            "bands": q["channels"],
            "dtype": "uint8",
            "projection": None,
            "gcps": [],
            "geotransform": None,
            "nodata": None,
            "band_names": None,
            "extra": {"colorspace": q["colorspace"]},
        }
    if blob[:4] == b"ENVI":
        return envi_info(blob.decode("utf-8", "replace"))
    raise ValueError(
        "unrecognized raster container (expected TIFF, PNG, JPEG or ENVI)"
    )
