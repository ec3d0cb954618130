"""Pure-Python PNG codec (stdlib zlib + numpy) — no imaging library.

Un-stubs the engine's compressed-image path: the reference hands
png/quicklook encoding to GDAL/PIL (pyroSAR/drivers.py:2083-2132 writes
a quicklook PNG into a KMZ); this container ships neither, so the codec
is implemented from the PNG spec directly. Scope: 8-bit greyscale /
grey+alpha / RGB / RGBA, all five scanline filters, non-interlaced —
exactly what the engine's quicklook and image stages emit. Palette,
16-bit and Adam7 inputs raise ``NotImplementedError`` loudly.

Decode is vectorized per scanline (filters None/Sub/Up are fully
numpy; Average/Paeth walk pixels along x with numpy channel vectors).
Encode applies one fixed filter per image (deterministic bytes for a
given input — required so re-runs and different cluster sizes produce
byte-identical blobs).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type → samples per pixel
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}  # channels → color type


def _chunk(tag: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + tag + payload + struct.pack(">I", crc)


def encode_png(arr: np.ndarray, *, filter_type: int = 1, level: int = 6) -> bytes:
    """Encode an 8-bit image array to PNG bytes.

    ``arr``: (h, w) greyscale, or (h, w, c) with c in {1, 2, 3, 4}.
    ``filter_type``: the per-scanline filter applied to EVERY row
    (0=None 1=Sub 2=Up 3=Average 4=Paeth); fixed per image for
    deterministic output.
    """
    if arr.dtype != np.uint8:
        raise ValueError(f"encode_png wants uint8, got {arr.dtype}")
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3 or arr.shape[2] not in _COLOR_TYPE:
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, w, c = arr.shape
    if not 0 <= filter_type <= 4:
        raise ValueError(f"filter_type must be 0..4, got {filter_type}")

    data = arr.astype(np.int16)  # room for the filter subtractions
    left = np.zeros_like(data)
    left[:, 1:] = data[:, :-1]
    up = np.zeros_like(data)
    up[1:] = data[:-1]
    if filter_type == 0:
        filt = data
    elif filter_type == 1:
        filt = data - left
    elif filter_type == 2:
        filt = data - up
    elif filter_type == 3:
        filt = data - (left + up) // 2
    else:  # Paeth
        ul = np.zeros_like(data)
        ul[1:, 1:] = data[:-1, :-1]
        p = left + up - ul
        pa_, pb, pc_ = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
        pred = np.where((pa_ <= pb) & (pa_ <= pc_), left, np.where(pb <= pc_, up, ul))
        filt = data - pred
    rows = (filt & 0xFF).astype(np.uint8).reshape(h, w * c)
    raw = np.empty((h, 1 + w * c), dtype=np.uint8)
    raw[:, 0] = filter_type
    raw[:, 1:] = rows

    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[c], 0, 0, 0)
    idat = zlib.compress(raw.tobytes(), level)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def _unfilter(raw: np.ndarray, h: int, w: int, c: int) -> np.ndarray:
    """Reverse per-scanline filtering. raw: (h, 1 + w*c) uint8."""
    ftypes = raw[:, 0]
    out = np.zeros((h, w, c), dtype=np.uint8)
    prev = np.zeros((w, c), dtype=np.uint8)
    for y in range(h):
        row = raw[y, 1:].reshape(w, c).astype(np.int16)
        f = int(ftypes[y])
        if f == 0:
            recon = row
        elif f == 1:  # Sub: per-channel cumulative sum mod 256
            recon = np.cumsum(row, axis=0, dtype=np.int64) & 0xFF
        elif f == 2:  # Up
            recon = (row + prev) & 0xFF
        elif f == 3:  # Average — left dependency forces an x walk
            recon = np.empty((w, c), dtype=np.int16)
            left = np.zeros(c, dtype=np.int16)
            pv = prev.astype(np.int16)
            for x in range(w):
                left = (row[x] + (left + pv[x]) // 2) & 0xFF
                recon[x] = left
        elif f == 4:  # Paeth
            recon = np.empty((w, c), dtype=np.int16)
            left = np.zeros(c, dtype=np.int16)
            ul = np.zeros(c, dtype=np.int16)
            pv = prev.astype(np.int16)
            for x in range(w):
                u = pv[x]
                p = left + u - ul
                pa_, pb, pc_ = np.abs(p - left), np.abs(p - u), np.abs(p - ul)
                pred = np.where(
                    (pa_ <= pb) & (pa_ <= pc_), left, np.where(pb <= pc_, u, ul)
                )
                left = (row[x] + pred) & 0xFF
                recon[x] = left
                ul = u
        else:
            raise ValueError(f"bad PNG filter type {f} on row {y}")
        prev = recon.astype(np.uint8)
        out[y] = prev
    return out


def decode_png(blob: bytes, *, verify_crc: bool = True) -> np.ndarray:
    """Decode PNG bytes → (h, w) or (h, w, c) uint8 array.

    Supports bit depth 8, color types 0/2/4/6, non-interlaced. Raises
    ``ValueError`` on malformed bytes or CRC mismatch and
    ``NotImplementedError`` on palette/16-bit/interlaced inputs.
    """
    if blob[:8] != _SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(blob):
        (length,) = struct.unpack_from(">I", blob, pos)
        tag = blob[pos + 4 : pos + 8]
        payload = blob[pos + 8 : pos + 8 + length]
        if len(payload) != length:
            raise ValueError("truncated PNG chunk")
        if verify_crc:
            (crc,) = struct.unpack_from(">I", blob, pos + 8 + length)
            if crc != (zlib.crc32(tag + payload) & 0xFFFFFFFF):
                raise ValueError(f"CRC mismatch in {tag!r} chunk")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8:
        raise NotImplementedError(f"bit depth {depth} unsupported (8 only)")
    if ctype not in _CHANNELS:
        raise NotImplementedError(f"color type {ctype} unsupported (palette?)")
    if interlace:
        raise NotImplementedError("Adam7 interlacing unsupported")
    if comp or filt:
        raise ValueError("bad IHDR compression/filter method")
    c = _CHANNELS[ctype]
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    expect = h * (1 + w * c)
    if len(raw) != expect:
        raise ValueError(f"decompressed size {len(raw)} != expected {expect}")
    out = _unfilter(raw.reshape(h, 1 + w * c), h, w, c)
    return out[:, :, 0] if c == 1 else out
