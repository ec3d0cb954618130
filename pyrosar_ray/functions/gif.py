"""Pure-Python GIF codec (GIF87a/89a, LZW) — no imaging library.

Completes the engine's legacy web-image trio (PNG: functions/png.py,
JPEG: functions/jpeg.py): GIF is implemented from the public
specification — logical screen descriptor, global/local color tables,
the variable-width LSB-first LZW entropy layer (clear/EOI codes, width
growth to 12 bits, the KwKwK case), 4-pass row interlacing, and
multi-frame streams (graphic-control extensions, frame composition for
the "keep" disposal methods). Everything is deterministic: a given
array encodes to identical bytes on every run and cluster size.

Unlike mp3/aac (whose Huffman code TABLES are spec data that cannot be
reproduced reliably from memory), LZW is a pure algorithm — both sides
of the round trip derive from first principles, and hand-built code
streams pin the decoder against the construction rules themselves.
"""

from __future__ import annotations

import struct

import numpy as np

#: interlace pass geometry: (start row, step)
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


# ------------------------------------------------------------------ LZW


def lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """Decode a GIF LZW code stream (already de-sub-blocked) to indices."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    # classic LSB-first bit accumulator (a numpy slice per code is ~4x
    # slower at GIF's typical 3-9 bit widths)
    buf = 0
    nbits = 0
    bytepos = 0
    nbytes = len(data)

    def read_code() -> int:
        nonlocal buf, nbits, bytepos
        while nbits < width and bytepos < nbytes:
            buf |= data[bytepos] << nbits
            bytepos += 1
            nbits += 8
        if nbits == 0:
            return eoi  # truncated stream: treat as end
        code = buf & ((1 << width) - 1)
        buf >>= width
        nbits = max(0, nbits - width)
        return code

    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    while True:
        code = read_code()
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"corrupt GIF: LZW code {code} out of range")
        out.extend(entry)
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
        # width grows when the NEXT code could not be represented
        if len(table) == (1 << width) and width < 12:
            width += 1
        prev = entry
    return list(out)


def lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    """Encode palette indices as a GIF LZW code stream (standard greedy
    dictionary build, clear-code reset at the 4096-entry cap)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out_bits: list[int] = []

    width = min_code_size + 1

    def emit(code: int) -> None:
        for b in range(width):
            out_bits.append((code >> b) & 1)

    def fresh_table() -> dict[bytes, int]:
        return {bytes([i]): i for i in range(clear)}

    table = fresh_table()
    next_code = eoi + 1
    emit(clear)
    seq = b""
    for ix in indices:
        cand = seq + bytes([ix])
        if cand in table:
            seq = cand
            continue
        emit(table[seq])
        table[cand] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            # decoder widens after READING the code that filled the
            # table; the encoder must widen one step later (the +1)
            width += 1
        if next_code > 4095:
            emit(clear)
            table = fresh_table()
            next_code = eoi + 1
            width = min_code_size + 1
        seq = bytes([ix])
    if seq:
        emit(table[seq])
    emit(eoi)
    packed = np.packbits(
        np.array(out_bits + [0] * (-len(out_bits) % 8), dtype=np.uint8),
        bitorder="little",
    )
    return packed.tobytes()


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out.extend(chunk)
    out.append(0)
    return bytes(out)


def _read_sub_blocks(blob: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        n = blob[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out.extend(blob[pos : pos + n])
        pos += n


# ------------------------------------------------------------------ encode


def encode_gif(
    frames: "np.ndarray | list[np.ndarray]",
    *,
    interlace: bool = False,
    delay_cs: int = 4,
) -> bytes:
    """Encode one (h, w, 3) uint8 frame — or a list of same-shape frames
    (animation) — as GIF89a bytes.

    The palette is the exact set of distinct colors (≤ 256 across all
    frames; more raises — the engine quantizes upstream if needed), so
    the round trip is lossless. Deterministic palette order: sorted by
    packed RGB value.
    """
    if isinstance(frames, np.ndarray):
        frames = [frames]
    if not frames:
        raise ValueError("no frames")
    for f in frames:
        if f.dtype != np.uint8 or f.ndim != 3 or f.shape[2] != 3:
            raise ValueError("frames must be (h, w, 3) uint8")
        if f.shape != frames[0].shape:
            raise ValueError("all frames must share one shape")
    h, w = frames[0].shape[:2]
    packed_all = [
        (f[:, :, 0].astype(np.int64) << 16)
        | (f[:, :, 1].astype(np.int64) << 8)
        | f[:, :, 2].astype(np.int64)
        for f in frames
    ]
    colors = np.unique(np.concatenate([p.ravel() for p in packed_all]))
    if len(colors) > 256:
        raise ValueError(f"{len(colors)} distinct colors (GIF caps at 256)")
    # palette size = next power of two >= max(2, ncolors); table bits
    ncol = max(2, int(len(colors)))
    table_bits = max(1, int(np.ceil(np.log2(ncol))))
    table_size = 1 << table_bits
    palette = np.zeros((table_size, 3), dtype=np.uint8)
    palette[: len(colors), 0] = (colors >> 16) & 0xFF
    palette[: len(colors), 1] = (colors >> 8) & 0xFF
    palette[: len(colors), 2] = colors & 0xFF

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out.append(0x80 | (table_bits - 1))  # GCT present, 2^table_bits entries
    out += bytes([0, 0])  # background index, aspect
    out += palette.tobytes()
    if len(frames) > 1:
        # NETSCAPE2.0 loop extension (loop forever)
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"

    min_code_size = max(2, table_bits)
    for pk in packed_all:
        idx = np.searchsorted(colors, pk.ravel()).astype(np.int64)
        if len(frames) > 1:
            out += b"\x21\xf9\x04" + bytes([0x04]) + struct.pack("<H", delay_cs) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
        if interlace:
            out.append(0x40)
            rows = idx.reshape(h, w)
            order = [y for s, st in _INTERLACE for y in range(s, h, st)]
            idx = rows[order].ravel()
        else:
            out.append(0x00)
        out.append(min_code_size)
        out += _sub_blocks(lzw_encode(idx.tolist(), min_code_size))
    out.append(0x3B)  # trailer
    return bytes(out)


# ------------------------------------------------------------------ decode


def decode_gif(blob: bytes) -> np.ndarray:
    """Decode the FIRST frame of a GIF to (h, w, 3) uint8 RGB."""
    return gif_frames(blob)[0]


def gif_frames(blob: bytes) -> list[np.ndarray]:
    """Decode every frame of a GIF to full-canvas (h, w, 3) uint8 RGB.

    Frames with the "do not dispose" / unspecified disposal methods
    composite onto the previous canvas (sub-rectangle placement +
    transparency honored); "restore to background" clears the frame's
    rectangle to the background color first.
    """
    if blob[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF stream")
    w, h = struct.unpack_from("<HH", blob, 6)
    flags = blob[10]
    bg_index = blob[11]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(blob[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n

    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None:
        canvas[:] = gct[bg_index % len(gct)]
    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0

    while pos < len(blob):
        marker = blob[pos]
        pos += 1
        if marker == 0x3B:  # trailer
            break
        if marker == 0x21:  # extension
            label = blob[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                size = blob[pos]
                gc = blob[pos + 1 : pos + 1 + size]
                disposal = (gc[0] >> 2) & 0x07
                transparent = gc[3] if gc[0] & 0x01 else None
                pos += 1 + size
                if blob[pos] != 0:
                    raise ValueError("corrupt GIF: unterminated GCE")
                pos += 1
            else:  # skip any other extension's sub-blocks
                _, pos = _read_sub_blocks(blob, pos)
            continue
        if marker != 0x2C:
            raise ValueError(f"corrupt GIF: unexpected block 0x{marker:02X}")
        fx, fy, fw, fh = struct.unpack_from("<HHHH", blob, pos)
        iflags = blob[pos + 8]
        pos += 9
        if iflags & 0x80:  # local color table
            n = 2 << (iflags & 0x07)
            lct = np.frombuffer(blob[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        else:
            lct = gct
        if lct is None:
            raise ValueError("corrupt GIF: no color table")
        min_code_size = blob[pos]
        pos += 1
        data, pos = _read_sub_blocks(blob, pos)
        idx = np.array(lzw_decode(data, min_code_size), dtype=np.int64)
        if len(idx) < fw * fh:
            raise ValueError("corrupt GIF: short frame data")
        idx = idx[: fw * fh].reshape(fh, fw)
        if iflags & 0x40:  # interlaced: invert the 4-pass row order
            order = [y for s, st in _INTERLACE for y in range(s, fh, st)]
            rows = np.empty_like(idx)
            rows[order] = idx
            idx = rows
        if int(idx.max(initial=0)) >= len(lct):
            raise ValueError("corrupt GIF: palette index out of range")
        if disposal == 2 and gct is not None:  # restore to background
            canvas[fy : fy + fh, fx : fx + fw] = gct[bg_index % len(gct)]
        region = canvas[fy : fy + fh, fx : fx + fw]
        pix = lct[idx]
        if transparent is not None:
            mask = idx != transparent
            region[mask] = pix[mask]
        else:
            region[:] = pix
        frames.append(canvas.copy())
        transparent = None
    if not frames:
        raise ValueError("corrupt GIF: no image data")
    return frames


def gif_info(blob: bytes) -> dict:
    """Header-only probe (raster_info shape): size, frame count,
    palette size, interlace of the first frame."""
    if blob[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h = struct.unpack_from("<HH", blob, 6)
    flags = blob[10]
    pos = 13
    ncol = 0
    if flags & 0x80:
        ncol = 2 << (flags & 0x07)
        pos += 3 * ncol
    nframes = 0
    interlaced = False
    while pos < len(blob):
        marker = blob[pos]
        pos += 1
        if marker == 0x3B:
            break
        if marker == 0x21:
            pos += 1
            _, pos = _read_sub_blocks(blob, pos)
            continue
        if marker != 0x2C:
            raise ValueError(f"corrupt GIF: unexpected block 0x{marker:02X}")
        iflags = blob[pos + 8]
        if nframes == 0:
            interlaced = bool(iflags & 0x40)
        pos += 9
        if iflags & 0x80:
            pos += 3 * (2 << (iflags & 0x07))
        pos += 1  # min code size
        _, pos = _read_sub_blocks(blob, pos)
        nframes += 1
    return {
        "driver": "GIF",
        "samples": w,
        "lines": h,
        "bands": 3,
        "dtype": "uint8",
        "projection": None,
        "gcps": [],
        "geotransform": None,
        "nodata": None,
        "band_names": None,
        "extra": {"frames": nframes, "palette": ncol, "interlaced": interlaced},
    }
