"""Pure-Python tiled GeoTIFF writer/reader (stdlib zlib + numpy).

The reference exports every processed product as a tiled GeoTIFF via
``gdal_translate`` (pyroSAR/snap/auxil.py:489-535: ``-co TILED=YES``,
per-layer nodata, band-interleaved). GDAL is absent in this container,
so the engine writes the format directly: classic little-endian TIFF,
deflate-compressed tiles, GeoTIFF georeferencing keys
(ModelPixelScale/ModelTiepoint/GeoKeyDirectory, EPSG:4326), GDAL's
ASCII nodata tag and band-description metadata — the exact tag set a
GDAL reader needs to open the product losslessly.

Multi-band arrays are written planar (PlanarConfiguration=2), matching
``-co INTERLEAVE=BAND``. The bundled reader exists for verification
round-trips and tests; it handles what the writer emits (and
uncompressed variants).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# numpy dtype → (bits per sample, TIFF SampleFormat)
_DTYPES = {
    "uint8": (8, 1),
    "uint16": (16, 1),
    "int16": (16, 2),
    "int32": (32, 2),
    "float32": (32, 3),
    "float64": (64, 3),
}
_FORMATS = {v: k for k, v in _DTYPES.items()}

_SHORT, _LONG, _DOUBLE, _ASCII = 3, 4, 12, 2


def _gdal_metadata(band_names: list[str] | None) -> str | None:
    if not band_names:
        return None
    items = "".join(
        f'<Item name="DESCRIPTION" sample="{i}" role="description">{n}</Item>'
        for i, n in enumerate(band_names)
    )
    return f"<GDALMetadata>{items}</GDALMetadata>"


def encode_geotiff(
    data: np.ndarray,
    *,
    ulx: float,
    uly: float,
    xres: float,
    yres: float,
    nodata: float | None = None,
    band_names: list[str] | None = None,
    tile: int = 256,
    compress: bool = True,
) -> bytes:
    """Encode (h, w) or (bands, h, w) → tiled GeoTIFF bytes.

    ``yres`` is the positive pixel height (north-up raster, row 0 at
    ``uly``). Tiles are deflate-compressed unless ``compress=False``.
    """
    arr = np.ascontiguousarray(data)
    if arr.ndim == 2:
        arr = arr[None]
    bands, h, w = arr.shape
    key = str(arr.dtype)
    if key not in _DTYPES:
        raise ValueError(f"unsupported dtype {arr.dtype}")
    bits, sfmt = _DTYPES[key]
    if band_names is not None and len(band_names) != bands:
        raise ValueError("band_names length must match band count")

    across = -(-w // tile)
    down = -(-h // tile)
    payloads: list[bytes] = []
    for b in range(bands):
        for ty in range(down):
            for tx in range(across):
                block = np.zeros((tile, tile), dtype=arr.dtype)
                ys, xs = ty * tile, tx * tile
                sub = arr[b, ys : ys + tile, xs : xs + tile]
                block[: sub.shape[0], : sub.shape[1]] = sub
                raw = block.tobytes()
                payloads.append(zlib.compress(raw, 6) if compress else raw)

    # ---- lay out the file: header, tile data, external arrays, IFD
    out = bytearray(b"II*\x00\x00\x00\x00\x00")  # IFD offset patched last

    def _align() -> None:
        if len(out) % 2:
            out.append(0)

    offsets, counts = [], []
    for p in payloads:
        _align()
        offsets.append(len(out))
        counts.append(len(p))
        out.extend(p)

    def _external(payload: bytes) -> int:
        _align()
        pos = len(out)
        out.extend(payload)
        return pos

    entries: list[tuple[int, int, int, bytes | int]] = []

    def _tag(tag: int, typ: int, values, ascii_val: str | None = None) -> None:
        """Queue one IFD entry; external payloads are written immediately."""
        if typ == _ASCII:
            payload = ascii_val.encode() + b"\x00"
            count = len(payload)
        else:
            fmt = {_SHORT: "H", _LONG: "I", _DOUBLE: "d"}[typ]
            vals = values if isinstance(values, (list, tuple)) else [values]
            count = len(vals)
            payload = struct.pack(f"<{count}{fmt}", *vals)
        if len(payload) <= 4:
            entries.append((tag, typ, count, payload.ljust(4, b"\x00")))
        else:
            entries.append((tag, typ, count, _external(payload)))

    spp = bands
    _tag(256, _LONG, w)
    _tag(257, _LONG, h)
    _tag(258, _SHORT, [bits] * spp)
    _tag(259, _SHORT, 8 if compress else 1)
    _tag(262, _SHORT, 1)  # BlackIsZero
    _tag(277, _SHORT, spp)
    _tag(284, _SHORT, 2 if spp > 1 else 1)
    _tag(322, _SHORT, tile)
    _tag(323, _SHORT, tile)
    _tag(324, _LONG, offsets)
    _tag(325, _LONG, counts)
    _tag(339, _SHORT, [sfmt] * spp)
    _tag(33550, _DOUBLE, [abs(xres), abs(yres), 0.0])
    _tag(33922, _DOUBLE, [0.0, 0.0, 0.0, ulx, uly, 0.0])
    # GeoKeys: geographic model, pixel-is-area, EPSG:4326
    _tag(
        34735,
        _SHORT,
        [1, 1, 0, 3, 1024, 0, 1, 2, 1025, 0, 1, 1, 2048, 0, 1, 4326],
    )
    md = _gdal_metadata(band_names)
    if md is not None:
        _tag(42112, _ASCII, None, ascii_val=md)
    if nodata is not None:
        _tag(42113, _ASCII, None, ascii_val=repr(float(nodata)) if not float(nodata).is_integer() else str(int(nodata)))

    _align()
    ifd_pos = len(out)
    out.extend(struct.pack("<H", len(entries)))
    for tag, typ, count, val in sorted(entries):
        out.extend(struct.pack("<HHI", tag, typ, count))
        out.extend(val if isinstance(val, bytes) else struct.pack("<I", val))
    out.extend(b"\x00\x00\x00\x00")  # no next IFD
    struct.pack_into("<I", out, 4, ifd_pos)
    return bytes(out)


def _read_values(blob: bytes, typ: int, count: int, raw: bytes) -> list:
    size = {_SHORT: 2, _LONG: 4, _DOUBLE: 8, _ASCII: 1}[typ]
    total = size * count
    payload = raw[:4] if total <= 4 else blob[
        struct.unpack("<I", raw)[0] : struct.unpack("<I", raw)[0] + total
    ]
    if typ == _ASCII:
        return [payload[:count].rstrip(b"\x00").decode()]
    fmt = {_SHORT: "H", _LONG: "I", _DOUBLE: "d"}[typ]
    return list(struct.unpack(f"<{count}{fmt}", payload[:total]))


def decode_geotiff(blob: bytes) -> dict:
    """Parse writer-produced GeoTIFF bytes → dict with ``data`` (bands,
    h, w), ``ulx/uly/xres/yres``, ``nodata``, ``band_names``."""
    if blob[:4] != b"II*\x00":
        raise ValueError("not a little-endian classic TIFF")
    (ifd,) = struct.unpack_from("<I", blob, 4)
    (n,) = struct.unpack_from("<H", blob, ifd)
    tags: dict[int, list] = {}
    for i in range(n):
        tag, typ, count = struct.unpack_from("<HHI", blob, ifd + 2 + i * 12)
        raw = blob[ifd + 2 + i * 12 + 8 : ifd + 2 + i * 12 + 12]
        tags[tag] = _read_values(blob, typ, count, raw)

    w, h = tags[256][0], tags[257][0]
    spp = tags.get(277, [1])[0]
    bits = tags[258][0]
    sfmt = tags.get(339, [1])[0]
    comp = tags.get(259, [1])[0]
    tile_w, tile_h = tags[322][0], tags[323][0]
    dtype = np.dtype(_FORMATS[(bits, sfmt)])
    across, down = -(-w // tile_w), -(-h // tile_h)
    if comp not in (1, 8):
        raise NotImplementedError(f"compression {comp} unsupported")

    data = np.zeros((spp, h, w), dtype=dtype)
    per_band = across * down
    for idx, (off, cnt) in enumerate(zip(tags[324], tags[325])):
        payload = blob[off : off + cnt]
        if comp == 8:
            payload = zlib.decompress(payload)
        block = np.frombuffer(payload, dtype=dtype).reshape(tile_h, tile_w)
        b, rest = divmod(idx, per_band)
        ty, tx = divmod(rest, across)
        ys, xs = ty * tile_h, tx * tile_w
        data[b, ys : ys + tile_h, xs : xs + tile_w] = block[
            : min(tile_h, h - ys), : min(tile_w, w - xs)
        ]

    scale = tags.get(33550, [1.0, 1.0, 0.0])
    tie = tags.get(33922, [0.0] * 6)
    nodata = tags.get(42113)
    band_names = None
    if 42112 in tags:
        import re

        band_names = re.findall(r'role="description">([^<]*)</Item>', tags[42112][0])
    return {
        "data": data,
        "ulx": tie[3],
        "uly": tie[4],
        "xres": scale[0],
        "yres": scale[1],
        "nodata": float(nodata[0]) if nodata else None,
        "band_names": band_names,
    }
