"""FLAC codec, pure Python/numpy — full decoder, fixed-predictor encoder.

Closes the lossless-audio leg of the codec matrix (functions/wav.py =
containers + G.711, functions/png.py / jpeg.py = images): the engine's
audio rows can now carry real ``.flac`` payloads. Decoder implements
the complete frame layer of the public FLAC format spec:

- STREAMINFO metadata (blocksizes, rate, channels, bps, total samples,
  raw-PCM MD5) + skip of all other metadata block types
- frame header sync/blocksize/rate/channel-assignment/bps codes,
  UTF-8-coded frame number, CRC-8 check
- subframe types CONSTANT, VERBATIM, FIXED (orders 0-4, inverted with
  nested cumsums — no per-sample Python), and LPC (any order; the
  quantized-coefficient recurrence is inherently sequential, kept as a
  bounded python loop over warmup+block), wasted-bits unpacking
- rice / rice2 residual partitions incl. escape-to-raw, zigzag
- stereo decorrelation: left/side, right/side, mid/side
- frame CRC-16 check

Encoder is the standard "subset" fixed-predictor path: per-block best
fixed order by absolute residual sum, single rice partition with the
optimal parameter, independent channels, UTF-8 frame numbers, both
CRCs — enough to produce files any FLAC decoder reads, and to
round-trip bit-exactly through this decoder (asserted via the
STREAMINFO MD5 like real ``flac -t``).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_BLOCKSIZE = 4096

# ---------------------------------------------------------------------------
# CRCs (FLAC frame header CRC-8 poly 0x07, frame CRC-16 poly 0x8005)
# ---------------------------------------------------------------------------


def _make_crc8_table() -> np.ndarray:
    tab = np.zeros(256, dtype=np.uint8)
    for i in range(256):
        c = i
        for _ in range(8):
            c = ((c << 1) ^ 0x07 if c & 0x80 else c << 1) & 0xFF
        tab[i] = c
    return tab


def _make_crc16_table() -> np.ndarray:
    tab = np.zeros(256, dtype=np.uint16)
    for i in range(256):
        c = i << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005 if c & 0x8000 else c << 1) & 0xFFFF
        tab[i] = c
    return tab


_CRC8 = _make_crc8_table()
_CRC16 = _make_crc16_table()


def crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = int(_CRC8[c ^ b])
    return c


def crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = ((c << 8) & 0xFFFF) ^ int(_CRC16[((c >> 8) ^ b) & 0xFF])
    return c


# ---------------------------------------------------------------------------
# bit I/O
# ---------------------------------------------------------------------------


class BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._nbits += nbits
        while self._nbits >= 8:
            self._nbits -= 8
            self.buf.append((self._acc >> self._nbits) & 0xFF)
        self._acc &= (1 << self._nbits) - 1

    def write_unary(self, q: int) -> None:
        # q zero bits then a one (FLAC unary)
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self._nbits:
            self.write(0, 8 - self._nbits)

    def getvalue(self) -> bytes:
        assert self._nbits == 0
        return bytes(self.buf)


class BitReader:
    """Bit reader over an unpacked bit array (fast unary via argmax)."""

    def __init__(self, data: bytes, start_byte: int = 0):
        self.data = data
        self.nbits_total = len(data) * 8
        self.pos = start_byte * 8
        self._ones = np.flatnonzero(
            np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        ).tolist()
        self._cur = 0  # amortized unary cursor (pos only ever advances)

    def read(self, nbits: int) -> int:
        # one int.from_bytes window per call (the per-bit Python loop was
        # the rice-residual hot path); works for any width
        if nbits == 0:
            return 0
        pos = self.pos
        end = pos + nbits
        if end > self.nbits_total:
            raise ValueError("flac: bitstream exhausted")
        first = pos >> 3
        last = (end + 7) >> 3
        window = int.from_bytes(self.data[first:last], "big")
        self.pos = end
        return (window >> ((last << 3) - end)) & ((1 << nbits) - 1)

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        return v - (1 << nbits) if v & (1 << (nbits - 1)) else v

    def read_unary(self) -> int:
        # cursor walk instead of a searchsorted per call: pos only
        # advances, so the total walk is O(#one-bits) per stream
        ones = self._ones
        cur = self._cur
        n = len(ones)
        pos = self.pos
        while cur < n and ones[cur] < pos:
            cur += 1
        if cur >= n:
            raise ValueError("flac: unary ran off stream")
        t = ones[cur]
        self._cur = cur + 1
        self.pos = t + 1
        return t - pos

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def byte_pos(self) -> int:
        return self.pos >> 3


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _utf8_number(n: int) -> bytes:
    """FLAC's extended-UTF-8 coding of the frame number."""
    if n < 0x80:
        return bytes([n])
    out = []
    nbytes = 2
    while n >= (1 << (5 * nbytes + 1)) and nbytes < 7:
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead | (n >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _read_utf8_number(r: BitReader) -> int:
    first = r.read(8)
    if first < 0x80:
        return first
    nbytes = 0
    mask = 0x80
    while first & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("flac: bad UTF-8 frame number")
    val = first & (0xFF >> (nbytes + 1))
    for _ in range(nbytes - 1):
        b = r.read(8)
        if (b & 0xC0) != 0x80:
            raise ValueError("flac: bad UTF-8 continuation")
        val = (val << 6) | (b & 0x3F)
    return val


def _zigzag(res: np.ndarray) -> np.ndarray:
    return (res << 1) ^ (res >> 63)


def _unzigzag(u: np.ndarray) -> np.ndarray:
    return (u >> 1) ^ -(u & 1)


# ---------------------------------------------------------------------------
# encoder (fixed predictors, independent channels)
# ---------------------------------------------------------------------------


def encode_flac(
    pcm: np.ndarray, rate: int, bps: int = 16, blocksize: int = _BLOCKSIZE
) -> bytes:
    """int16 PCM (n,) mono or (n, 2) stereo → FLAC bytes."""
    pcm = np.asarray(pcm, dtype=np.int64)
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    n, channels = pcm.shape

    md5 = hashlib.md5()
    inter = pcm.astype("<i2") if bps == 16 else pcm.astype("<i4")
    md5.update(inter.reshape(-1).tobytes())

    sizes = [min(blocksize, n - s) for s in range(0, n, blocksize)] or [n]
    out = bytearray(b"fLaC")
    si = BitWriter()
    si.write(min(sizes), 16)
    si.write(max(sizes), 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    body = si.getvalue() + md5.digest()
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body  # last block

    for frame_no, start in enumerate(range(0, n, blocksize)):
        block = pcm[start : start + blocksize]
        out += _encode_frame(block, frame_no, rate, bps, channels)
    return bytes(out)


def _encode_frame(block, frame_no, rate, bps, channels) -> bytes:
    bs = len(block)
    w = BitWriter()
    w.write(0b11111111111110, 14)
    w.write(0, 1)  # reserved
    w.write(0, 1)  # fixed blocking
    w.write(0b0111, 4)  # blocksize: 16-bit at end
    w.write(0b0000, 4)  # sample rate from STREAMINFO
    w.write(channels - 1, 4)  # independent channels
    w.write({8: 0b001, 12: 0b010, 16: 0b100, 20: 0b101, 24: 0b110}[bps], 3)
    w.write(0, 1)
    w.align()
    header = w.getvalue() + _utf8_number(frame_no) + struct.pack(">H", bs - 1)
    header += bytes([crc8(header)])

    body = BitWriter()
    for ch in range(channels):
        _encode_subframe(body, block[:, ch], bps)
    body.align()
    frame = header + body.getvalue()
    return frame + struct.pack(">H", crc16(frame))


def _encode_subframe(w: BitWriter, x: np.ndarray, bps: int) -> None:
    if (x == x[0]).all():
        w.write(0, 1)
        w.write(0b000000, 6)  # CONSTANT
        w.write(0, 1)
        w.write(int(x[0]), bps)
        return
    # best fixed order by absolute residual sum
    best_order, best_res, best_cost = 0, x, int(np.abs(x).sum())
    res = x
    for order in range(1, min(5, len(x))):
        res = np.diff(res)
        cost = int(np.abs(res).sum())
        if cost < best_cost:
            best_order, best_res, best_cost = order, res, cost
    w.write(0, 1)
    w.write(0b001000 | best_order, 6)  # FIXED
    w.write(0, 1)  # no wasted bits
    for v in x[:best_order]:
        w.write(int(v), bps)
    u = _zigzag(best_res.astype(np.int64))
    mean = max(float(u.mean()), 0.1) if len(u) else 0.1
    param = min(max(int(np.log2(mean)) if mean >= 1 else 0, 0), 14)
    w.write(0b00, 2)  # rice, 4-bit params
    w.write(0, 4)  # partition order 0
    w.write(param, 4)
    for v in u.tolist():
        w.write_unary(v >> param)
        w.write(v, param)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def parse_flac_streaminfo(blob: bytes) -> dict:
    """Parse the metadata layer only (STREAMINFO + block walk)."""
    if blob[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos, info, blocks = 4, None, []
    while True:
        hdr = blob[pos]
        btype, last = hdr & 0x7F, bool(hdr & 0x80)
        length = int.from_bytes(blob[pos + 1 : pos + 4], "big")
        body = blob[pos + 4 : pos + 4 + length]
        blocks.append(btype)
        if btype == 0:
            if length != 34:
                raise ValueError("flac: STREAMINFO must be 34 bytes")
            bits = int.from_bytes(body, "big")

            def f(hi, lo):  # bit positions counted from LSB of the 272
                return (bits >> lo) & ((1 << (hi - lo)) - 1)

            info = {
                "min_blocksize": f(272, 256),
                "max_blocksize": f(256, 240),
                "rate": f(192, 172),
                "channels": f(172, 169) + 1,
                "bps": f(169, 164) + 1,
                "total_samples": f(164, 128),
                "md5": body[18:34],
            }
        pos += 4 + length
        if last:
            break
    if info is None:
        raise ValueError("flac: missing STREAMINFO")
    info["frames_offset"] = pos
    info["metadata_blocks"] = blocks
    return info


_BPS_CODES = {0b001: 8, 0b010: 12, 0b100: 16, 0b101: 20, 0b110: 24}
_RATE_CODES = {
    0b0001: 88200, 0b0010: 176400, 0b0011: 192000, 0b0100: 8000,
    0b0101: 16000, 0b0110: 22050, 0b0111: 24000, 0b1000: 32000,
    0b1001: 44100, 0b1010: 48000, 0b1011: 96000,
}


def decode_flac(blob: bytes) -> tuple[np.ndarray, int, dict]:
    """FLAC bytes → (int PCM (n,) or (n, ch), rate, streaminfo).

    Verifies frame CRC-8/CRC-16 and, when STREAMINFO carries one, the
    decoded-PCM MD5 (``md5_ok`` key) — the same end-to-end check
    ``flac -t`` performs.
    """
    info = parse_flac_streaminfo(blob)
    r = BitReader(blob, info["frames_offset"])
    total, channels = info["total_samples"], info["channels"]
    if total == 0:
        raise ValueError("flac: streams with unknown total_samples unsupported")
    out = np.zeros((total, channels), dtype=np.int64)
    got = 0
    n_frames = 0
    while got < total:
        start_byte = r.byte_pos()
        samples = _decode_frame(r, blob, info, start_byte)[: total - got]
        out[got : got + len(samples)] = samples
        got += len(samples)
        n_frames += 1
    info["n_frames"] = n_frames

    if info["bps"] == 16:
        raw = out.astype("<i2").reshape(-1).tobytes()
    else:
        raw = out.astype("<i4").reshape(-1).tobytes()
    info["md5_ok"] = (
        info["md5"] == b"\x00" * 16 or hashlib.md5(raw).digest() == info["md5"]
    )
    pcm = out[:, 0] if channels == 1 else out
    return pcm, info["rate"], info


def _decode_frame(r: BitReader, blob: bytes, info: dict, start_byte: int):
    if r.read(14) != 0b11111111111110:
        raise ValueError("flac: lost frame sync")
    r.read(1)  # reserved
    r.read(1)  # blocking strategy
    bs_code = r.read(4)
    rate_code = r.read(4)
    chan_code = r.read(4)
    bps_code = r.read(3)
    r.read(1)
    _read_utf8_number(r)
    if bs_code == 0b0110:
        bs = r.read(8) + 1
    elif bs_code == 0b0111:
        bs = r.read(16) + 1
    elif bs_code == 0b0001:
        bs = 192
    elif 0b0010 <= bs_code <= 0b0101:
        bs = 576 << (bs_code - 2)
    elif bs_code >= 0b1000:
        bs = 256 << (bs_code - 8)
    else:
        raise ValueError(f"flac: reserved blocksize code {bs_code}")
    if rate_code == 0b1100:
        r.read(8)
    elif rate_code in (0b1101, 0b1110):
        r.read(16)
    elif rate_code != 0 and rate_code not in _RATE_CODES:
        raise ValueError(f"flac: bad sample-rate code {rate_code}")
    bps = info["bps"] if bps_code == 0 else _BPS_CODES[bps_code]
    r.align()
    header_end = r.byte_pos()
    if crc8(blob[start_byte:header_end]) != r.read(8):
        raise ValueError("flac: frame header CRC-8 mismatch")

    if chan_code < 8:
        channels = chan_code + 1
        chans = [_decode_subframe(r, bs, bps) for _ in range(channels)]
        block = np.stack(chans, axis=1)
    elif chan_code == 8:  # left/side
        left = _decode_subframe(r, bs, bps)
        side = _decode_subframe(r, bs, bps + 1)
        block = np.stack([left, left - side], axis=1)
    elif chan_code == 9:  # right/side
        side = _decode_subframe(r, bs, bps + 1)
        right = _decode_subframe(r, bs, bps)
        block = np.stack([right + side, right], axis=1)
    elif chan_code == 10:  # mid/side
        mid = _decode_subframe(r, bs, bps)
        side = _decode_subframe(r, bs, bps + 1)
        m = (mid << 1) | (side & 1)
        block = np.stack([(m + side) >> 1, (m - side) >> 1], axis=1)
    else:
        raise ValueError(f"flac: reserved channel assignment {chan_code}")
    r.align()
    body_end = r.byte_pos()
    if crc16(blob[start_byte:body_end]) != r.read(16):
        raise ValueError("flac: frame CRC-16 mismatch")
    if block.shape[1] != info["channels"]:
        raise ValueError("flac: channel count changed mid-stream")
    return block


def _decode_subframe(r: BitReader, bs: int, bps: int) -> np.ndarray:
    if r.read(1):
        raise ValueError("flac: subframe padding bit set")
    stype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.read_unary() + 1
        bps -= wasted
    if stype == 0b000000:
        x = np.full(bs, r.read_signed(bps), dtype=np.int64)
    elif stype == 0b000001:
        x = np.array([r.read_signed(bps) for _ in range(bs)], dtype=np.int64)
    elif 0b001000 <= stype <= 0b001100:
        order = stype & 0x07
        warm = [r.read_signed(bps) for _ in range(order)]
        res = _decode_residual(r, bs, order)
        x = _restore_fixed(np.array(warm, dtype=np.int64), res, order, bs)
    elif stype >= 0b100000:
        order = (stype & 0x1F) + 1
        warm = [r.read_signed(bps) for _ in range(order)]
        precision = r.read(4) + 1
        if precision == 16:
            raise ValueError("flac: invalid LPC precision escape")
        shift = r.read_signed(5)
        if shift < 0:
            raise ValueError("flac: negative LPC shift")
        coefs = [r.read_signed(precision) for _ in range(order)]
        res = _decode_residual(r, bs, order)
        x = np.empty(bs, dtype=np.int64)
        x[:order] = warm
        c = coefs  # newest-first per spec
        for i in range(order, bs):
            acc = 0
            for j in range(order):
                acc += c[j] * x[i - 1 - j]
            x[i] = res[i - order] + (acc >> shift)
    else:
        raise ValueError(f"flac: reserved subframe type {stype:#08b}")
    return x << wasted if wasted else x


def _restore_fixed(warm: np.ndarray, res: np.ndarray, order: int, bs: int) -> np.ndarray:
    """Invert the order-k finite difference with k nested cumsums,
    re-seeding each difference level from the warmup samples."""
    if order == 0:
        return res
    levels = [warm]
    for _ in range(1, order):
        levels.append(np.diff(levels[-1]))
    seq = res
    for k in range(order - 1, -1, -1):
        seq = levels[k][-1] + np.cumsum(seq)
    x = np.empty(bs, dtype=np.int64)
    x[:order] = warm
    x[order:] = seq
    return x


def _decode_residual(r: BitReader, bs: int, order: int) -> np.ndarray:
    method = r.read(2)
    if method > 1:
        raise ValueError(f"flac: reserved residual method {method}")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    porder = r.read(4)
    nparts = 1 << porder
    out = np.empty(bs - order, dtype=np.int64)
    pos = 0
    for p in range(nparts):
        m = (bs >> porder) - (order if p == 0 else 0)
        param = r.read(plen)
        if param == escape:
            raw_bits = r.read(5)
            vals = np.array(
                [r.read_signed(raw_bits) if raw_bits else 0 for _ in range(m)],
                dtype=np.int64,
            )
            out[pos : pos + m] = vals
        else:
            u = np.empty(m, dtype=np.int64)
            for i in range(m):
                q = r.read_unary()
                u[i] = (q << param) | r.read(param)
            out[pos : pos + m] = _unzigzag(u)
        pos += m
    return out
