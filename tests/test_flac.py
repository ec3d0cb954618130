"""FLAC codec goldens (functions/flac.py).

Encoder-paths are pinned by lossless round-trip + STREAMINFO MD5 (the
`flac -t` check); decoder-only paths (LPC, mid/side, rice2, escape
partitions, partition order > 0) are pinned with hand-built frames.
"""

import struct

import numpy as np
import pytest

from pyrosar_ray.functions.flac import (
    BitReader,
    BitWriter,
    _utf8_number,
    _read_utf8_number,
    crc8,
    crc16,
    decode_flac,
    encode_flac,
    parse_flac_streaminfo,
)


def test_lossless_roundtrip_mono():
    rng = np.random.RandomState(0)
    t = np.arange(9000)
    pcm = (6000 * np.sin(2 * np.pi * 440 * t / 16000) + rng.randn(9000) * 50).astype(
        np.int16
    )
    blob = encode_flac(pcm, 16000)
    assert len(blob) < 2 * len(pcm)  # actually compresses a tone
    dec, rate, info = decode_flac(blob)
    assert rate == 16000 and (dec == pcm).all() and info["md5_ok"]
    assert info["n_frames"] == 3  # 4096+4096+808


def test_lossless_roundtrip_stereo_and_edges():
    rng = np.random.RandomState(1)
    pcm = (rng.randn(5000) * 3000).astype(np.int16)
    st = np.stack([pcm, (pcm // 2).astype(np.int16)], axis=1)
    dec, rate, info = decode_flac(encode_flac(st, 44100))
    assert rate == 44100 and dec.shape == (5000, 2) and (dec == st).all()
    for sig in (
        np.zeros(100, np.int16),
        np.full(5000, -7, np.int16),
        np.array([1, -2, 3], np.int16),
        rng.randint(-32768, 32767, 4096).astype(np.int16),
    ):
        d, _, i = decode_flac(encode_flac(sig, 8000))
        assert (d == sig).all() and i["md5_ok"]


def test_blocksize_parameter_and_streaminfo():
    pcm = np.arange(-1300, 1300, dtype=np.int16)
    blob = encode_flac(pcm, 16000, blocksize=1024)
    si = parse_flac_streaminfo(blob)
    assert (si["min_blocksize"], si["max_blocksize"]) == (552, 1024)
    assert si["total_samples"] == 2600
    dec, _, info = decode_flac(blob)
    assert info["n_frames"] == 3 and (dec == pcm).all()


def test_utf8_frame_numbers():
    r = lambda b: _read_utf8_number(BitReader(b))
    for n in (0, 1, 127, 128, 500, 10_000, 1 << 20, 1 << 30):
        assert r(_utf8_number(n)) == n


# ---------------------------------------------------------------------------
# hand-built frames for decoder-only paths
# ---------------------------------------------------------------------------


def _stream(frames, n_total, channels=1, rate=8000, bps=16):
    si = BitWriter()
    si.write(16, 16)
    si.write(65535, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(n_total, 36)
    body = si.getvalue() + b"\x00" * 16  # zero MD5 → check skipped
    return b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body + b"".join(frames)


def _frame(subframe_writers, bs, chan_code):
    w = BitWriter()
    w.write(0b11111111111110, 14)
    w.write(0, 2)
    w.write(0b0111, 4)  # 16-bit blocksize at end
    w.write(0, 4)  # rate from STREAMINFO
    w.write(chan_code, 4)
    w.write(0b100, 3)  # 16 bps
    w.write(0, 1)
    w.align()
    header = w.getvalue() + _utf8_number(0) + struct.pack(">H", bs - 1)
    header += bytes([crc8(header)])
    body = BitWriter()
    for fn in subframe_writers:
        fn(body)
    body.align()
    frame = header + body.getvalue()
    return frame + struct.pack(">H", crc16(frame))


def _write_residual(w, res, param, method=0, porder=0, order=0, bs=None):
    w.write(method, 2)
    w.write(porder, 4)
    plen = 4 if method == 0 else 5
    u = [(v << 1) ^ (v >> 63) for v in np.asarray(res, dtype=np.int64).tolist()]
    nparts = 1 << porder
    pos = 0
    for p in range(nparts):
        m = (bs >> porder) - (order if p == 0 else 0)
        w.write(param, plen)
        for v in u[pos : pos + m]:
            w.write_unary(v >> param)
            w.write(v, param)
        pos += m


def test_lpc_subframe_decodes():
    # LPC order 2, coefs [2, -1], shift 0 == fixed order-2 prediction
    x = (200 * np.sin(np.arange(64) / 3)).astype(np.int64)
    res = x[2:] - (2 * x[1:-1] - x[:-2])

    def lpc(w):
        w.write(0, 1)
        w.write(0b100000 | 1, 6)  # LPC, order-1 = 1 → order 2
        w.write(0, 1)
        w.write(int(x[0]), 16)
        w.write(int(x[1]), 16)
        w.write(3, 4)  # precision-1 → 4 bits
        w.write(0, 5)  # shift 0
        w.write(2, 4)  # coef c0 = 2
        w.write(-1, 4)  # coef c1 = -1
        _write_residual(w, res, param=6, order=2, bs=64)

    blob = _stream([_frame([lpc], 64, chan_code=0)], 64)
    dec, _, info = decode_flac(blob)
    assert (dec == x).all()


def test_mid_side_and_left_side_decode():
    l_val, r_val = 1000, 250
    mid, side = (l_val + r_val) >> 1, l_val - r_val

    def const(value, bits):
        def w_(w):
            w.write(0, 1)
            w.write(0, 6)
            w.write(0, 1)
            w.write(value, bits)
        return w_

    # mid/side (chan 10): side subframe carries bps+1 bits
    blob = _stream([_frame([const(mid, 16), const(side, 17)], 32, 10)], 32, channels=2)
    dec, _, _ = decode_flac(blob)
    assert (dec[:, 0] == l_val).all() and (dec[:, 1] == r_val).all()
    # left/side (chan 8)
    blob = _stream([_frame([const(l_val, 16), const(side, 17)], 32, 8)], 32, channels=2)
    dec, _, _ = decode_flac(blob)
    assert (dec[:, 0] == l_val).all() and (dec[:, 1] == r_val).all()
    # right/side (chan 9)
    blob = _stream([_frame([const(side, 17), const(r_val, 16)], 32, 9)], 32, channels=2)
    dec, _, _ = decode_flac(blob)
    assert (dec[:, 0] == l_val).all() and (dec[:, 1] == r_val).all()


def test_rice2_and_partition_order():
    x = np.arange(64, dtype=np.int64) * 3 - 50
    res = np.diff(x)  # fixed order 1

    def fixed1(w):
        w.write(0, 1)
        w.write(0b001000 | 1, 6)
        w.write(0, 1)
        w.write(int(x[0]), 16)
        _write_residual(w, res, param=4, method=1, porder=1, order=1, bs=64)

    dec, _, _ = decode_flac(_stream([_frame([fixed1], 64, 0)], 64))
    assert (dec == x).all()


def test_escape_partition_raw_residual():
    x = np.array([5, -3, 12, 7, -9, 0, 4, -2] * 4, dtype=np.int64)

    def verb_escape(w):
        w.write(0, 1)
        w.write(0b001000, 6)  # FIXED order 0 → residual == signal
        w.write(0, 1)
        w.write(0, 2)  # method rice
        w.write(0, 4)  # porder 0
        w.write(0xF, 4)  # escape
        w.write(5, 5)  # 5 raw bits, signed
        for v in x.tolist():
            w.write(v, 5)

    dec, _, _ = decode_flac(_stream([_frame([verb_escape], 32, 0)], 32))
    assert (dec == x).all()


def test_wasted_bits():
    x = np.array([8, 16, -24, 32] * 8, dtype=np.int64)  # all multiples of 8

    def waste3(w):
        w.write(0, 1)
        w.write(0, 6)  # CONSTANT (value 8 >> 3 = 1 in bps-3 bits)
        w.write(1, 1)  # wasted-bits flag
        w.write_unary(2)  # unary 2 → wasted = 3
        w.write(1, 13)

    dec, _, _ = decode_flac(_stream([_frame([waste3], 32, 0)], 32))
    assert (dec == 8).all()


def test_crc_corruption_detected():
    pcm = np.arange(100, dtype=np.int16)
    blob = bytearray(encode_flac(pcm, 8000))
    blob[-10] ^= 0x40  # flip a payload bit in the last frame
    with pytest.raises(ValueError):
        decode_flac(bytes(blob))


def test_md5_is_real():
    pcm = np.arange(-500, 500, dtype=np.int16)
    blob = encode_flac(pcm, 8000)
    info = parse_flac_streaminfo(blob)
    import hashlib
    assert info["md5"] == hashlib.md5(pcm.astype("<i2").tobytes()).digest()


def test_decode_audio_flac_dispatch():
    from pyrosar_ray.sources.audio import decode_audio, synth_audio, synth_flac

    pcm = synth_audio(4)[: 1600 + (4 % 37) * 32]
    assert (decode_audio(synth_flac(4), "flac") == pcm).all()
