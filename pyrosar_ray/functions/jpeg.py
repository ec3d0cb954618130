"""Pure-numpy baseline JPEG codec (ITU-T T.81 sequential DCT).

Un-stubs the engine's dominant real-image format: the reference hands
jpeg decode to GDAL/PIL (pyroSAR/drivers.py:429-477 quicklook/decode
paths); this container ships neither, so the codec is implemented from
the public JPEG specification directly, mirroring the approach of
``functions/png.py``.

Scope:

- **Decoder**: baseline sequential Huffman (SOF0/1), 8-bit samples,
  grayscale or 3-component YCbCr, any sampling factors up to 2×2
  (4:4:4, 4:2:2, 4:4:0, 4:2:0), restart intervals (DRI/RSTn), all
  tables read from the stream (DQT 8/16-bit, DHT) — **plus progressive
  Huffman (SOF2)**: spectral selection and successive approximation
  per T.81 Annex G.2 (interleaved/non-interleaved DC first + DC
  refinement raw bits, per-component AC first with EOBn run coding,
  AC refinement with correction bits, restart resets of predictors
  and EOB runs). Arithmetic coding, 12-bit and hierarchical modes
  raise ``NotImplementedError`` loudly.
- **Encoder**: baseline sequential, quality-scaled Annex-K quantization
  tables, standard Annex-K Huffman tables, 4:4:4 or 4:2:0, grayscale
  or RGB input. Deterministic bytes for a given input (no RNG, fixed
  tables) — required so re-runs and different cluster sizes produce
  byte-identical blobs. :func:`encode_jpeg_progressive` emits a
  multi-scan SOF2 stream (DC first/refine + banded AC first/refine per
  component, G.1.2.3 EOB-run and correction-bit coding) used to pin
  the progressive decode paths; lossy fidelity is identical to
  baseline at the same quality (same DCT + quantization, different
  entropy layout only).

The Huffman bit-walk is scalar Python (documented trade-off; one actor
decodes one image at a time inside ``map_batches``); everything after
entropy decode — dequantize, de-zigzag, IDCT, upsample, color convert —
is vectorized numpy over ALL blocks of a component at once.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------- constants

#: zigzag scan: position k in the scan reads raster index _ZIGZAG[k]
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
assert sorted(_ZIGZAG.tolist()) == list(range(64))

#: Annex K.1 luminance / K.2 chrominance base quantization tables (raster order)
_QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
_QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K.3 standard Huffman tables: (BITS[1..16], HUFFVAL)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
for _bits, _vals in (
    (_DC_LUMA_BITS, _DC_LUMA_VALS),
    (_DC_CHROMA_BITS, _DC_CHROMA_VALS),
    (_AC_LUMA_BITS, _AC_LUMA_VALS),
    (_AC_CHROMA_BITS, _AC_CHROMA_VALS),
):
    assert sum(_bits) == len(_vals)

#: orthonormal 8-point DCT-II basis: fdct F = _DCT @ B @ _DCT.T, idct B = _DCT.T @ F @ _DCT
_DCT = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _c = np.sqrt(0.125) if _u == 0 else 0.5
        _DCT[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """Quality-scaled (luma, chroma) quantization tables (libjpeg convention)."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    luma = np.clip((_QUANT_LUMA * scale + 50) // 100, 1, 255)
    chroma = np.clip((_QUANT_CHROMA * scale + 50) // 100, 1, 255)
    return luma.astype(np.int64), chroma.astype(np.int64)


# ---------------------------------------------------------------- huffman


class _HuffDecoder:
    """Canonical Huffman decoder (F.2.2.3 DECODE procedure)."""

    def __init__(self, bits: list[int], vals: list[int]):
        if len(bits) != 16 or sum(bits) != len(vals):
            raise ValueError("invalid Huffman table")
        self.vals = vals
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code, k = 0, 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1


def _build_encode_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) for canonical codes from BITS/HUFFVAL."""
    table: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first reader over stuffing-stripped entropy bytes.

    Classic byte-fed bit accumulator — ~3x faster than indexing an
    unpacked numpy bit array one scalar at a time (the Huffman walk is
    the scalar-Python hot spot of the decoder)."""

    __slots__ = ("data", "nbytes", "bytepos", "buf", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.nbytes = len(data)
        self.bytepos = 0
        self.buf = 0
        self.nbits = 0

    def _fill(self, need: int) -> None:
        while self.nbits < need and self.bytepos < self.nbytes:
            self.buf = (self.buf << 8) | self.data[self.bytepos]
            self.bytepos += 1
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill(1)
            if self.nbits == 0:
                return 0  # past-the-end pad (spec: 1s; 0 also safe here)
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill(n)
        if self.nbits >= n:
            self.nbits -= n
            return (self.buf >> self.nbits) & ((1 << n) - 1)
        # stream end: take what's left, zero-pad at the low end
        v = (self.buf & ((1 << self.nbits) - 1)) << (n - self.nbits)
        self.buf = 0
        self.nbits = 0
        return v

    def decode(self, table: _HuffDecoder) -> int:
        # peek 16 bits once and walk lengths arithmetically (F.2.2.3):
        # one fill + integer compares instead of a read_bit call per bit
        self._fill(16)
        avail = self.nbits
        if avail >= 16:
            window = (self.buf >> (avail - 16)) & 0xFFFF
        else:
            window = (self.buf << (16 - avail)) & 0xFFFF  # zero-pad past end
        maxcode = table.maxcode
        mincode = table.mincode
        for length in range(1, 17):
            code = window >> (16 - length)
            mc = maxcode[length]
            if mc >= 0 and mincode[length] <= code <= mc:
                take = min(length, avail)
                self.nbits = avail - take
                self.buf &= (1 << self.nbits) - 1
                return table.vals[table.valptr[length] + code - mincode[length]]
        raise ValueError("corrupt JPEG: Huffman code longer than 16 bits")


def _extend(v: int, size: int) -> int:
    """F.2.2.1 EXTEND: map ``size`` raw bits to a signed amplitude."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


# ---------------------------------------------------------------- decoder


class _Component:
    __slots__ = ("cid", "h", "v", "tq", "td", "ta", "blocks", "dc_pred", "nblk_x", "nblk_y")

    def __init__(self, cid: int, h: int, v: int, tq: int):
        self.cid, self.h, self.v, self.tq = cid, h, v, tq
        self.dc_pred = 0


def decode_jpeg(blob: bytes) -> np.ndarray:
    """JPEG bytes → (h, w, 3) uint8 RGB, or (h, w) for grayscale files."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    comps: list[_Component] = []
    height = width = 0
    restart_interval = 0
    progressive = False
    blocks_ready = False

    while pos < len(blob):
        if pos + 1 >= len(blob):
            raise ValueError("truncated JPEG stream")
        if blob[pos] != 0xFF:
            raise ValueError(f"corrupt JPEG: expected marker at byte {pos}")
        marker = blob[pos + 1]
        pos += 2
        if marker == 0xD8:  # stray SOI
            continue
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7:  # RSTn outside a scan
            continue
        (seglen,) = struct.unpack(">H", blob[pos : pos + 2])
        seg = blob[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq == 0:
                    zz = np.frombuffer(seg[i : i + 64], dtype=np.uint8).astype(np.int64)
                    i += 64
                else:
                    zz = np.frombuffer(seg[i : i + 128], dtype=">u2").astype(np.int64)
                    i += 128
                table = np.zeros(64, dtype=np.int64)
                table[_ZIGZAG] = zz  # stored in zigzag order → raster
                qtables[tq] = table
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                i += 17 + n
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffDecoder(bits, vals)
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            precision = seg[0]
            if precision != 8:
                raise NotImplementedError(f"{precision}-bit JPEG not supported")
            progressive = marker == 0xC2
            height, width = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append(_Component(cid, hv >> 4, hv & 0x0F, tq))
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential (SOF0/SOF1) and progressive "
                f"Huffman (SOF2) JPEG are supported; got SOF marker "
                f"0x{marker:02X} (lossless/arithmetic/hierarchical)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_comps = []
            for c in range(ns):
                cs, tdta = seg[1 + 2 * c : 3 + 2 * c]
                comp = next(x for x in comps if x.cid == cs)
                comp.td, comp.ta = tdta >> 4, tdta & 0x0F
                scan_comps.append(comp)
            pos += seglen
            if progressive:
                if not blocks_ready:
                    _alloc_blocks(comps, width, height)
                    blocks_ready = True
                ss, se, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
                pos = _decode_scan_progressive(
                    blob, pos, scan_comps, comps, width, height,
                    huff_dc, huff_ac, restart_interval,
                    ss, se, ahal >> 4, ahal & 0x0F,
                )
            else:
                pos = _decode_scan(
                    blob, pos, scan_comps, width, height,
                    huff_dc, huff_ac, restart_interval,
                )
            continue
        pos += seglen

    if not comps or height == 0:
        raise ValueError("corrupt JPEG: no frame decoded")
    if any(getattr(c, "blocks", None) is None for c in comps):
        raise ValueError("corrupt JPEG: frame header but no scan data")
    planes = [_assemble_plane(c, qtables, width, height, comps) for c in comps]
    if len(planes) == 1:
        return planes[0]
    if len(planes) != 3:
        raise NotImplementedError(f"{len(planes)}-component JPEG not supported")
    y, cb, cr = (p.astype(np.float64) for p in planes)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=2).round(), 0, 255).astype(np.uint8)


def _entropy_segments(blob: bytes, pos: int) -> tuple[list[bytes], int]:
    """Slice entropy bytes up to the next non-RST marker: strip 0xFF00
    stuffing, split at RSTn boundaries. Returns (segments, end_pos)."""
    segments: list[bytes] = []
    cur = bytearray()
    i = pos
    while i < len(blob):
        byte = blob[i]
        if byte == 0xFF:
            nxt = blob[i + 1] if i + 1 < len(blob) else 0xD9
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break  # real marker ends the scan
        cur.append(byte)
        i += 1
    segments.append(bytes(cur))
    return segments, i


def _alloc_blocks(comps, width, height) -> None:
    """Allocate the MCU-padded per-component coefficient arrays once;
    progressive scans accumulate into them across SOS segments."""
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    for c in comps:
        c.nblk_x = mcus_x * c.h
        c.nblk_y = mcus_y * c.v
        c.blocks = np.zeros((c.nblk_y * c.nblk_x, 64), dtype=np.int32)
        c.dc_pred = 0


def _noninterleaved_grid(comp, comps, width, height) -> tuple[int, int]:
    """Block grid of one component in a non-interleaved scan (A.2.2):
    ceil over the component's OWN sample dimensions, not the MCU pad."""
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    cw = -(-width * comp.h // hmax)
    ch = -(-height * comp.v // vmax)
    return -(-ch // 8), -(-cw // 8)


def _decode_scan_progressive(
    blob, pos, scan_comps, comps, width, height, huff_dc, huff_ac,
    restart_interval, ss, se, ah, al,
):
    """Entropy-decode one progressive scan (T.81 G.2) into the
    accumulated coefficient arrays; returns the new stream position.

    Four scan kinds, keyed on (ss, ah): DC first (ss=0, ah=0 — Huffman
    size + diff bits, value << al), DC refinement (ss=0, ah>0 — one raw
    bit per block ORed at al), AC first (ss>0, ah=0 — run/size with EOBn
    end-of-band run coding), AC refinement (ss>0, ah>0 — newly-nonzero
    coefficients plus one correction bit per already-nonzero
    coefficient). Restart markers reset DC predictors and the EOB run.
    """
    dc_scan = ss == 0
    if dc_scan and se != 0:
        raise ValueError("corrupt JPEG: DC progressive scan with Se != 0")
    if not dc_scan and len(scan_comps) != 1:
        raise ValueError("corrupt JPEG: interleaved progressive AC scan")

    if len(scan_comps) > 1 or dc_scan:
        # MCU-interleaved traversal (DC scans; a 1-component DC scan of a
        # 1-component frame degenerates to the same order)
        hmax = max(c.h for c in comps)
        vmax = max(c.v for c in comps)
        mcus_x = -(-width // (8 * hmax))
        mcus_y = -(-height // (8 * vmax))
        if len(scan_comps) == 1 and len(comps) > 1:
            # non-interleaved single-component DC scan
            c = scan_comps[0]
            gby, gbx = _noninterleaved_grid(c, comps, width, height)
            units = [(c, by * c.nblk_x + bx) for by in range(gby) for bx in range(gbx)]
        else:
            units = []
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    for c in scan_comps:
                        for v in range(c.v):
                            for h in range(c.h):
                                units.append(
                                    (c, (my * c.v + v) * c.nblk_x + (mx * c.h + h))
                                )
    else:
        c = scan_comps[0]
        gby, gbx = _noninterleaved_grid(c, comps, width, height)
        units = [(c, by * c.nblk_x + bx) for by in range(gby) for bx in range(gbx)]

    segments, end = _entropy_segments(blob, pos)
    p1 = 1 << al
    m1 = -p1

    unit = 0
    nunits = len(units)
    for segment in segments:
        if unit >= nunits:
            break
        reader = _BitReader(segment)
        for c in scan_comps:
            c.dc_pred = 0  # predictor reset at restart boundaries
        eobrun = 0
        limit = min(nunits, unit + restart_interval) if restart_interval else nunits
        while unit < limit:
            comp, blk_i = units[unit]
            coef = comp.blocks[blk_i]
            if dc_scan and ah == 0:  # DC first
                size = reader.decode(huff_dc[comp.td])
                diff = _extend(reader.read_bits(size), size)
                comp.dc_pred += diff
                coef[0] = comp.dc_pred << al
            elif dc_scan:  # DC refinement: one raw bit
                if reader.read_bit():
                    coef[0] = int(coef[0]) | p1
            elif ah == 0:  # AC first
                if eobrun > 0:
                    eobrun -= 1
                else:
                    ac_tab = huff_ac[comp.ta]
                    k = ss
                    while k <= se:
                        rs = reader.decode(ac_tab)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:
                                k += 16  # ZRL
                                continue
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += reader.read_bits(r)
                            break  # EOBn: this block is run member 1
                        k += r
                        if k > se:
                            raise ValueError("corrupt JPEG: AC run past band end")
                        coef[k] = _extend(reader.read_bits(s), s) << al
                        k += 1
            else:  # AC refinement (G.2.2)
                ac_tab = huff_ac[comp.ta]
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = reader.decode(ac_tab)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r != 15:
                                eobrun = (1 << r)
                                if r:
                                    eobrun += reader.read_bits(r)
                                break  # correction tail handled below
                            s_val = 0  # ZRL: skip 16 zero-history coeffs
                        else:
                            if s != 1:
                                raise ValueError(
                                    "corrupt JPEG: AC refinement size != 1"
                                )
                            s_val = p1 if reader.read_bit() else m1
                        while k <= se:
                            v = int(coef[k])
                            if v != 0:
                                if reader.read_bit() and (v & p1) == 0:
                                    coef[k] = v + (p1 if v >= 0 else m1)
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if s_val and k <= se:
                            coef[k] = s_val
                        k += 1
                if eobrun > 0:
                    # EOB run: only correction bits through the band end
                    while k <= se:
                        v = int(coef[k])
                        if v != 0:
                            if reader.read_bit() and (v & p1) == 0:
                                coef[k] = v + (p1 if v >= 0 else m1)
                        k += 1
                    eobrun -= 1
            unit += 1
    return end


def _decode_scan(blob, pos, scan_comps, width, height, huff_dc, huff_ac, restart_interval):
    """Entropy-decode one interleaved baseline scan; returns new position."""
    hmax = max(c.h for c in scan_comps)
    vmax = max(c.v for c in scan_comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    nmcu = mcus_x * mcus_y
    for c in scan_comps:
        c.nblk_x = mcus_x * c.h
        c.nblk_y = mcus_y * c.v
        c.blocks = np.zeros((c.nblk_y * c.nblk_x, 64), dtype=np.int32)
        c.dc_pred = 0

    segments, i = _entropy_segments(blob, pos)

    mcu = 0
    for seg_idx, segment in enumerate(segments):
        reader = _BitReader(segment)
        for c in scan_comps:
            c.dc_pred = 0  # predictors reset at every restart boundary
        limit = min(nmcu, mcu + restart_interval) if restart_interval else nmcu
        while mcu < limit:
            mcu_y, mcu_x = divmod(mcu, mcus_x)
            for c in scan_comps:
                dc_tab, ac_tab = huff_dc[c.td], huff_ac[c.ta]
                for v in range(c.v):
                    for h in range(c.h):
                        coef = np.zeros(64, dtype=np.int32)
                        size = reader.decode(dc_tab)
                        diff = _extend(reader.read_bits(size), size)
                        c.dc_pred += diff
                        coef[0] = c.dc_pred
                        k = 1
                        while k < 64:
                            rs = reader.decode(ac_tab)
                            run, ssss = rs >> 4, rs & 0x0F
                            if ssss == 0:
                                if run == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise ValueError("corrupt JPEG: AC run past block end")
                            coef[k] = _extend(reader.read_bits(ssss), ssss)
                            k += 1
                        blk_y = mcu_y * c.v + v
                        blk_x = mcu_x * c.h + h
                        c.blocks[blk_y * c.nblk_x + blk_x] = coef
            mcu += 1
        if restart_interval and seg_idx < len(segments) - 1 and mcu >= nmcu:
            break
    return i


def _assemble_plane(comp, qtables, width, height, all_comps) -> np.ndarray:
    """Dequantize + IDCT all blocks of one component, upsample to full size."""
    hmax = max(c.h for c in all_comps)
    vmax = max(c.v for c in all_comps)
    q = qtables[comp.tq]
    deq = comp.blocks.astype(np.float64)
    # de-zigzag: scan position k holds raster index _ZIGZAG[k]
    raster = np.zeros_like(deq)
    raster[:, _ZIGZAG] = deq
    raster *= q[None, :]
    blocks = raster.reshape(-1, 8, 8)
    pix = np.einsum("ux,nuv,vy->nxy", _DCT, blocks, _DCT)  # IDCT
    pix = np.clip(pix + 128.0, 0, 255)
    ny, nx = comp.nblk_y, comp.nblk_x
    plane = (
        pix.reshape(ny, nx, 8, 8).transpose(0, 2, 1, 3).reshape(ny * 8, nx * 8)
    )
    # upsample to the luma grid, crop to frame
    ry, rx = vmax // comp.v, hmax // comp.h
    if ry > 1:
        plane = np.repeat(plane, ry, axis=0)
    if rx > 1:
        plane = np.repeat(plane, rx, axis=1)
    return plane[:height, :width].round().astype(np.uint8)


# ---------------------------------------------------------------- encoder


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            byte = ((self.acc << pad) | ((1 << pad) - 1)) & 0xFF  # pad with 1s
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self.nbits, self.acc = 0, 0
        return bytes(self.out)


def _csize(v: int) -> int:
    """Bit category of a DC difference / AC amplitude."""
    return int(abs(v)).bit_length()


def _fdct_quant(plane: np.ndarray, qtable: np.ndarray) -> np.ndarray:
    """(H, W) level-shifted plane → (nblocks, 64) quantized zigzag coeffs."""
    h, w = plane.shape
    blocks = (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )
    coef = np.einsum("ux,nxy,vy->nuv", _DCT, blocks, _DCT).reshape(-1, 64)
    q = np.round(coef / qtable[None, :]).astype(np.int32)
    return q[:, _ZIGZAG]  # raster → zigzag scan order


def _pad_to(arr: np.ndarray, my: int, mx: int) -> np.ndarray:
    """Edge-replicate pad to multiples of (my, mx)."""
    h, w = arr.shape
    return np.pad(arr, ((0, -h % my), (0, -w % mx)), mode="edge")


def _prepare_components(arr: np.ndarray, quality: int, subsampling: str):
    """Shared encoder front half: color transform, subsampling, FDCT +
    quantization over the MCU-padded grid. Returns
    (comp_blocks, comp_nblk, factors, mcus, size, qtables, gray)."""
    if arr.dtype != np.uint8:
        raise ValueError(f"encode_jpeg wants uint8, got {arr.dtype}")
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError("subsampling must be '4:4:4' or '4:2:0'")
    gray = arr.ndim == 2
    if not gray and (arr.ndim != 3 or arr.shape[2] != 3):
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, w = arr.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    luma_q, chroma_q = quality_tables(quality)

    if gray:
        planes = [arr.astype(np.float64) - 128.0]
        factors = [(1, 1)]
    else:
        rgb = arr.astype(np.float64)
        y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
        cb = 128.0 - 0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] + 0.5 * rgb[:, :, 2]
        cr = 128.0 + 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] - 0.081312 * rgb[:, :, 2]
        if subsampling == "4:2:0":
            factors = [(2, 2), (1, 1), (1, 1)]
            cbp = _pad_to(cb, 2, 2)
            crp = _pad_to(cr, 2, 2)
            cb = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean(axis=(1, 3))
        else:
            factors = [(1, 1), (1, 1), (1, 1)]
        planes = [y - 128.0, cb - 128.0, cr - 128.0]

    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # quantized zigzag blocks per component, in raster block order
    comp_blocks: list[np.ndarray] = []
    comp_nblk: list[tuple[int, int]] = []
    for plane, (fh, fv) in zip(planes, factors):
        nby, nbx = mcus_y * fv, mcus_x * fh
        padded = _pad_to(plane, 1, 1)
        padded = np.pad(
            padded,
            ((0, nby * 8 - padded.shape[0]), (0, nbx * 8 - padded.shape[1])),
            mode="edge",
        )
        qt = luma_q if len(comp_blocks) == 0 else chroma_q
        comp_blocks.append(_fdct_quant(padded, qt))
        comp_nblk.append((nby, nbx))
    return (
        comp_blocks, comp_nblk, factors, (mcus_y, mcus_x), (h, w),
        (luma_q, chroma_q), gray,
    )


def encode_jpeg(
    arr: np.ndarray, quality: int = 90, subsampling: str = "4:4:4"
) -> bytes:
    """Encode an 8-bit image to baseline JPEG bytes.

    ``arr``: (h, w) grayscale or (h, w, 3) RGB uint8.
    ``subsampling``: '4:4:4' (default, highest fidelity) or '4:2:0'.
    """
    (
        comp_blocks, comp_nblk, factors, (mcus_y, mcus_x), (h, w),
        (luma_q, chroma_q), gray,
    ) = _prepare_components(arr, quality, subsampling)

    dc_tabs = [_build_encode_table(_DC_LUMA_BITS, _DC_LUMA_VALS)]
    ac_tabs = [_build_encode_table(_AC_LUMA_BITS, _AC_LUMA_VALS)]
    if not gray:
        dc_tabs.append(_build_encode_table(_DC_CHROMA_BITS, _DC_CHROMA_VALS))
        ac_tabs.append(_build_encode_table(_AC_CHROMA_BITS, _AC_CHROMA_VALS))

    writer = _BitWriter()
    dc_pred = [0] * len(factors)
    for mcu_y in range(mcus_y):
        for mcu_x in range(mcus_x):
            for ci, (fh, fv) in enumerate(factors):
                tab_i = 0 if ci == 0 else 1
                dct_tab, act_tab = dc_tabs[tab_i], ac_tabs[tab_i]
                nby, nbx = comp_nblk[ci]
                for v in range(fv):
                    for hh in range(fh):
                        blk = comp_blocks[ci][
                            (mcu_y * fv + v) * nbx + (mcu_x * fh + hh)
                        ]
                        diff = int(blk[0]) - dc_pred[ci]
                        dc_pred[ci] = int(blk[0])
                        size = _csize(diff)
                        code, length = dct_tab[size]
                        writer.write(code, length)
                        if size:
                            amp = diff if diff >= 0 else diff + (1 << size) - 1
                            writer.write(amp, size)
                        nz = np.nonzero(blk[1:])[0]
                        prev = 0
                        for idx in nz:
                            run = int(idx) - prev
                            prev = int(idx) + 1
                            while run >= 16:
                                code, length = act_tab[0xF0]  # ZRL
                                writer.write(code, length)
                                run -= 16
                            val = int(blk[1 + idx])
                            size = _csize(val)
                            code, length = act_tab[(run << 4) | size]
                            writer.write(code, length)
                            amp = val if val >= 0 else val + (1 << size) - 1
                            writer.write(amp, size)
                        if prev <= 62:
                            code, length = act_tab[0x00]  # EOB
                            writer.write(code, length)
    entropy = writer.flush()

    # ---- assemble the stream
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"

    def _dqt(tq: int, table: np.ndarray) -> bytes:
        return (
            b"\xff\xdb"
            + struct.pack(">H", 67)
            + bytes([tq])
            + bytes(int(x) for x in table[_ZIGZAG])
        )

    out += _dqt(0, luma_q)
    if not gray:
        out += _dqt(1, chroma_q)

    ncomp = 1 if gray else 3
    sof = bytearray(struct.pack(">BHHB", 8, h, w, ncomp))
    for ci, (fh, fv) in enumerate(factors):
        sof += bytes([ci + 1, (fh << 4) | fv, 0 if ci == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof

    def _dht(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
        payload = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload

    out += _dht(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS)
    out += _dht(1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS)
    if not gray:
        out += _dht(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS)
        out += _dht(1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS)

    sos = bytearray([ncomp])
    for ci in range(ncomp):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])  # Ss, Se, Ah/Al (baseline fixed)
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 arrays."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float((diff * diff).mean())
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


# ----------------------------------------------------- progressive encoder

#: flat AC Huffman table for progressive scans: every RS byte 0..254 at
#: 8 bits, 255 at 9 bits (canonical; the all-ones 8-bit pattern stays a
#: reserved prefix per C.2). Frequency-blind — entropy coding is
#: lossless, so fidelity is unchanged; only the byte count pays.
_FLAT_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0, 0]
_FLAT_AC_VALS = list(range(256))


def encode_jpeg_progressive(
    arr: np.ndarray, quality: int = 90, subsampling: str = "4:4:4"
) -> bytes:
    """Encode an 8-bit image as a progressive (SOF2) JPEG stream.

    Scan script (exercises every T.81 G.2 decode path): interleaved DC
    first at Al=1 → per-component AC first over bands 1-5 and 6-63 at
    Al=2 (EOBn runs + ZRL) → interleaved DC refinement (raw bits) →
    per-component AC refinement passes (Ah=2→Al=1, then Ah=1→Al=0) with
    G.1.2.3 correction-bit buffering. Pixel fidelity equals
    :func:`encode_jpeg` at the same quality: identical DCT +
    quantization, only the entropy-layer layout differs.
    """
    (
        comp_blocks, comp_nblk, factors, (mcus_y, mcus_x), (h, w),
        (luma_q, chroma_q), gray,
    ) = _prepare_components(arr, quality, subsampling)
    ncomp = len(factors)
    vmax = max(f[1] for f in factors)
    hmax = max(f[0] for f in factors)

    dc_enc = [_build_encode_table(_DC_LUMA_BITS, _DC_LUMA_VALS)]
    if not gray:
        dc_enc.append(_build_encode_table(_DC_CHROMA_BITS, _DC_CHROMA_VALS))
    ac_flat = _build_encode_table(_FLAT_AC_BITS, _FLAT_AC_VALS)

    def _grid(ci: int) -> tuple[int, int, int]:
        fh, fv = factors[ci]
        ch = -(-h * fv // vmax)  # component sample dims (ceil)
        cw = -(-w * fh // hmax)
        return -(-ch // 8), -(-cw // 8), comp_nblk[ci][1]

    # ---- scan emitters (each returns flushed entropy bytes)
    def dc_first_scan(al: int) -> bytes:
        wtr = _BitWriter()
        pred = [0] * ncomp
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci, (fh, fv) in enumerate(factors):
                    tab = dc_enc[0 if ci == 0 else 1]
                    nbx = comp_nblk[ci][1]
                    for v in range(fv):
                        for hh in range(fh):
                            blk = comp_blocks[ci][(my * fv + v) * nbx + (mx * fh + hh)]
                            val = int(blk[0]) >> al  # arithmetic shift (spec pt. transform)
                            diff = val - pred[ci]
                            pred[ci] = val
                            size = _csize(diff)
                            code, length = tab[size]
                            wtr.write(code, length)
                            if size:
                                amp = diff if diff >= 0 else diff + (1 << size) - 1
                                wtr.write(amp, size)
        return wtr.flush()

    def dc_refine_scan(al: int) -> bytes:
        wtr = _BitWriter()
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci, (fh, fv) in enumerate(factors):
                    nbx = comp_nblk[ci][1]
                    for v in range(fv):
                        for hh in range(fh):
                            blk = comp_blocks[ci][(my * fv + v) * nbx + (mx * fh + hh)]
                            wtr.write((int(blk[0]) >> al) & 1, 1)
        return wtr.flush()

    def ac_first_scan(ci: int, ss: int, se: int, al: int) -> bytes:
        wtr = _BitWriter()
        eobrun = 0

        def flush_eobrun():
            nonlocal eobrun
            if eobrun > 0:
                nbits = eobrun.bit_length() - 1
                code, length = ac_flat[nbits << 4]
                wtr.write(code, length)
                if nbits:
                    wtr.write(eobrun, nbits)  # low bits = eobrun - (1 << nbits)
                eobrun = 0

        gby, gbx, nbx = _grid(ci)
        for by in range(gby):
            for bx in range(gbx):
                blk = comp_blocks[ci][by * nbx + bx]
                r = 0
                for k in range(ss, se + 1):
                    v = int(blk[k])
                    av = abs(v) >> al  # magnitude shift (G.1.2.2)
                    if av == 0:
                        r += 1
                        continue
                    flush_eobrun()
                    while r > 15:
                        code, length = ac_flat[0xF0]
                        wtr.write(code, length)
                        r -= 16
                    size = av.bit_length()
                    sv = av if v >= 0 else -av
                    code, length = ac_flat[(r << 4) | size]
                    wtr.write(code, length)
                    amp = sv if sv >= 0 else sv + (1 << size) - 1
                    wtr.write(amp, size)
                    r = 0
                if r > 0:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eobrun()
        flush_eobrun()
        return wtr.flush()

    def ac_refine_scan(ci: int, ss: int, se: int, al: int) -> bytes:
        wtr = _BitWriter()
        eobrun = 0
        be: list[int] = []  # correction bits buffered until the next symbol

        def flush_eobrun():
            nonlocal eobrun
            if eobrun > 0:
                nbits = eobrun.bit_length() - 1
                code, length = ac_flat[nbits << 4]
                wtr.write(code, length)
                if nbits:
                    wtr.write(eobrun, nbits)
                eobrun = 0
            for b in be:
                wtr.write(b, 1)
            be.clear()

        p1 = 1 << al
        gby, gbx, nbx = _grid(ci)
        for by in range(gby):
            for bx in range(gbx):
                blk = comp_blocks[ci][by * nbx + bx]
                absv = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
                eob = 0  # 1-based offset just past the last newly-nonzero coef
                for i, t in enumerate(absv):
                    if t == 1:
                        eob = i + 1
                r = 0
                br: list[int] = []  # this block's pending correction bits
                for i, t in enumerate(absv):
                    if t == 0:
                        r += 1
                        continue
                    while r > 15 and i < eob:
                        flush_eobrun()
                        code, length = ac_flat[0xF0]
                        wtr.write(code, length)
                        r -= 16
                        for b in br:
                            wtr.write(b, 1)
                        br.clear()
                    if t > 1:  # already nonzero: buffer its correction bit
                        br.append(t & 1)
                        continue
                    flush_eobrun()
                    code, length = ac_flat[(r << 4) | 1]
                    wtr.write(code, length)
                    wtr.write(1 if int(blk[ss + i]) >= 0 else 0, 1)
                    for b in br:
                        wtr.write(b, 1)
                    br.clear()
                    r = 0
                if r > 0 or br:
                    eobrun += 1
                    be.extend(br)
                    if eobrun == 0x7FFF or len(be) > 900:
                        flush_eobrun()
        flush_eobrun()
        return wtr.flush()

    # ---- assemble the stream
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"

    def _dqt(tq: int, table: np.ndarray) -> bytes:
        return (
            b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq])
            + bytes(int(x) for x in table[_ZIGZAG])
        )

    out += _dqt(0, luma_q)
    if not gray:
        out += _dqt(1, chroma_q)

    sof = bytearray(struct.pack(">BHHB", 8, h, w, ncomp))
    for ci, (fh, fv) in enumerate(factors):
        sof += bytes([ci + 1, (fh << 4) | fv, 0 if ci == 0 else 1])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof  # SOF2

    def _dht(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
        payload = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload

    out += _dht(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS)
    if not gray:
        out += _dht(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS)
    out += _dht(1, 0, _FLAT_AC_BITS, _FLAT_AC_VALS)

    def _sos(specs: list[tuple[int, int, int]], ss: int, se: int, ah: int, al: int, entropy: bytes):
        nonlocal out
        hdr = bytearray([len(specs)])
        for cid, td, ta in specs:
            hdr += bytes([cid, (td << 4) | ta])
        hdr += bytes([ss, se, (ah << 4) | al])
        out += b"\xff\xda" + struct.pack(">H", 2 + len(hdr)) + hdr + entropy

    all_specs = [(ci + 1, 0 if ci == 0 else 1, 0) for ci in range(ncomp)]
    _sos(all_specs, 0, 0, 0, 1, dc_first_scan(1))
    for ci in range(ncomp):
        spec = [(ci + 1, 0, 0)]
        _sos(spec, 1, 5, 0, 2, ac_first_scan(ci, 1, 5, 2))
        _sos(spec, 6, 63, 0, 2, ac_first_scan(ci, 6, 63, 2))
    _sos(all_specs, 0, 0, 1, 0, dc_refine_scan(0))
    for ci in range(ncomp):
        spec = [(ci + 1, 0, 0)]
        _sos(spec, 1, 5, 2, 1, ac_refine_scan(ci, 1, 5, 1))
        _sos(spec, 6, 63, 2, 1, ac_refine_scan(ci, 6, 63, 1))
        _sos(spec, 1, 5, 1, 0, ac_refine_scan(ci, 1, 5, 0))
        _sos(spec, 6, 63, 1, 0, ac_refine_scan(ci, 6, 63, 0))
    out += b"\xff\xd9"
    return bytes(out)
