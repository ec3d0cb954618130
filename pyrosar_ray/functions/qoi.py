"""QOI ("Quite OK Image") codec, pure Python/numpy.

The modern lossless interchange format (qoiformat.org, spec v1.0 —
public domain): a single-pass byte stream over raster order with four
cheap predictors and no entropy coder, which makes it fully algorithmic
(no spec data tables — same implementability class as PNG/GIF here,
unlike the MPEG audio codecs; see ROADMAP).

Chunk grammar (decoder state: previous pixel, 64-slot running index
keyed by ``(3r+5g+7b+11a) % 64``):

- ``0xFE r g b``        QOI_OP_RGB   (alpha carried over)
- ``0xFF r g b a``      QOI_OP_RGBA
- ``0b00iiiiii``        QOI_OP_INDEX running-index lookup
- ``0b01rrggbb``        QOI_OP_DIFF  per-channel diff −2..1 (bias 2)
- ``0b10gggggg rrrrbbbb`` QOI_OP_LUMA dg −32..31, dr−dg / db−dg −8..7
- ``0b11cccccc``        QOI_OP_RUN   run 1..62 (63/64 reserved = RGB/RGBA)

End marker: seven 0x00 bytes then 0x01. Encode is the canonical greedy
chain (run → index → diff → luma → rgb). Both directions walk pixels in
a Python loop — bounded here by the synthetic table's ≤32×32 rasters;
wide-batch decode parallelism comes from the actor pool, not the
per-blob kernel (same stance as the GIF LZW walk).
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"qoif"


def encode_qoi(arr: np.ndarray, colorspace: int = 0) -> bytes:
    """(h, w, 3|4) uint8 → QOI bytes."""
    if arr.ndim != 3 or arr.shape[2] not in (3, 4) or arr.dtype != np.uint8:
        raise ValueError("encode_qoi wants (h, w, 3|4) uint8")
    h, w, ch = arr.shape
    px = arr.reshape(-1, ch)
    if ch == 3:
        px = np.concatenate([px, np.full((len(px), 1), 255, np.uint8)], axis=1)
    out = bytearray(_MAGIC + struct.pack(">IIBB", w, h, ch, colorspace))
    index = [(0, 0, 0, 0)] * 64
    prev = (0, 0, 0, 255)
    run = 0
    for r, g, b, a in map(tuple, px.tolist()):
        cur = (r, g, b, a)
        if cur == prev:
            run += 1
            if run == 62:
                out.append(0xC0 | (run - 1))
                run = 0
            continue
        if run:
            out.append(0xC0 | (run - 1))
            run = 0
        slot = (r * 3 + g * 5 + b * 7 + a * 11) % 64
        if index[slot] == cur:
            out.append(slot)
        else:
            index[slot] = cur
            if a == prev[3]:
                dr = (r - prev[0] + 128) % 256 - 128
                dg = (g - prev[1] + 128) % 256 - 128
                db = (b - prev[2] + 128) % 256 - 128
                if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                    out.append(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
                elif -32 <= dg <= 31 and -8 <= dr - dg <= 7 and -8 <= db - dg <= 7:
                    out.append(0x80 | (dg + 32))
                    out.append(((dr - dg + 8) << 4) | (db - dg + 8))
                else:
                    out += bytes((0xFE, r, g, b))
            else:
                out += bytes((0xFF, r, g, b, a))
        prev = cur
    if run:
        out.append(0xC0 | (run - 1))
    out += b"\x00" * 7 + b"\x01"
    return bytes(out)


def parse_qoi_header(blob: bytes) -> dict:
    """Header probe without decoding: w, h, channels, colorspace."""
    if len(blob) < 14 or blob[:4] != _MAGIC:
        raise ValueError("not a QOI stream")
    w, h, ch, cs = struct.unpack_from(">IIBB", blob, 4)
    if ch not in (3, 4) or cs not in (0, 1):
        raise ValueError(f"bad QOI header (channels={ch}, colorspace={cs})")
    if not (0 < w < 1 << 24 and 0 < h < 1 << 24):
        raise ValueError("unreasonable QOI dimensions")
    return {"w": w, "h": h, "channels": ch, "colorspace": cs}


def decode_qoi(blob: bytes) -> np.ndarray:
    """QOI bytes → (h, w, channels) uint8."""
    hdr = parse_qoi_header(blob)
    w, h, ch = hdr["w"], hdr["h"], hdr["channels"]
    n = w * h
    if len(blob) < 14 + 8:
        raise ValueError("truncated QOI stream")
    if blob[-8:] != b"\x00" * 7 + b"\x01":
        raise ValueError("missing QOI end marker")
    data = blob[14:-8]
    out = np.empty((n, 4), dtype=np.uint8)
    index = [(0, 0, 0, 0)] * 64
    r, g, b, a = 0, 0, 0, 255
    pos = 0
    i = 0
    ln = len(data)
    while i < n:
        if pos >= ln:
            raise ValueError("QOI stream exhausted before all pixels")
        byte = data[pos]
        pos += 1
        if byte == 0xFE:
            r, g, b = data[pos], data[pos + 1], data[pos + 2]
            pos += 3
        elif byte == 0xFF:
            r, g, b, a = data[pos], data[pos + 1], data[pos + 2], data[pos + 3]
            pos += 4
        else:
            tag = byte >> 6
            if tag == 0:
                r, g, b, a = index[byte]
                out[i] = (r, g, b, a)
                i += 1
                continue
            if tag == 1:
                r = (r + ((byte >> 4) & 3) - 2) % 256
                g = (g + ((byte >> 2) & 3) - 2) % 256
                b = (b + (byte & 3) - 2) % 256
            elif tag == 2:
                dg = (byte & 0x3F) - 32
                nxt = data[pos]
                pos += 1
                r = (r + dg + ((nxt >> 4) & 0x0F) - 8) % 256
                g = (g + dg) % 256
                b = (b + dg + (nxt & 0x0F) - 8) % 256
            else:  # run
                run = (byte & 0x3F) + 1
                if i + run > n:
                    raise ValueError("QOI run overflows the pixel count")
                out[i : i + run] = (r, g, b, a)
                i += run
                continue
        index[(r * 3 + g * 5 + b * 7 + a * 11) % 64] = (r, g, b, a)
        out[i] = (r, g, b, a)
        i += 1
    return out[:, :ch].reshape(h, w, ch)
