"""QOI codec goldens (functions/qoi.py).

Lossless, so the pin is exact round-trip identity across op-covering
inputs, plus hand-built spec vectors that force each chunk type's bit
layout (a decoder that misreads DIFF bias or LUMA nibble order fails
the byte-level goldens, not just its own encoder's dialect).
"""

import struct

import numpy as np
import pytest

from pyrosar_ray.functions.qoi import decode_qoi, encode_qoi, parse_qoi_header


def _hdr(w, h, ch=3, cs=0):
    return b"qoif" + struct.pack(">IIBB", w, h, ch, cs)


_END = b"\x00" * 7 + b"\x01"


def test_spec_vectors_each_op():
    # RGB op then RUN of 2: three pixels of (10, 20, 30)
    blob = _hdr(3, 1) + bytes((0xFE, 10, 20, 30)) + bytes((0xC0 | 1,)) + _END
    assert (decode_qoi(blob) == [[[10, 20, 30]] * 3]).all()
    # DIFF op: start (0,0,0,255); code 0b01_11_01_00 → dr+1 dg-1 db-2
    blob = _hdr(2, 1) + bytes((0xFE, 10, 20, 30), ) + bytes((0x40 | (3 << 4) | (1 << 2) | 0,)) + _END
    assert (decode_qoi(blob)[0, 1] == [11, 19, 28]).all()
    # LUMA op: dg=5 → 0x80|37; dr-dg=-3 → nibble 5; db-dg=7 → nibble 15
    blob = _hdr(2, 1) + bytes((0xFE, 100, 100, 100)) + bytes((0x80 | 37, (5 << 4) | 15)) + _END
    assert (decode_qoi(blob)[0, 1] == [102, 105, 112]).all()
    # INDEX op: pixel A, pixel B, then index back to A
    a, b = (10, 20, 30), (1, 2, 3)
    slot = (10 * 3 + 20 * 5 + 30 * 7 + 255 * 11) % 64
    blob = _hdr(3, 1) + bytes((0xFE, *a)) + bytes((0xFE, *b)) + bytes((slot,)) + _END
    assert (decode_qoi(blob)[0, 2] == a).all()
    # RGBA op changes alpha
    blob = _hdr(1, 1, ch=4) + bytes((0xFF, 9, 8, 7, 100)) + _END
    assert (decode_qoi(blob)[0, 0] == [9, 8, 7, 100]).all()


def test_roundtrip_identity_op_coverage():
    rng = np.random.default_rng(5)
    imgs = [
        rng.integers(0, 256, (16, 16, 3), dtype=np.uint8),      # rgb/luma heavy
        np.full((24, 24, 3), 7, np.uint8),                      # one long run
        (np.add.outer(np.arange(32), np.arange(32))[..., None]
         % 256 * np.ones(3)).astype(np.uint8),                  # diff/luma
        (rng.integers(0, 4, (32, 24, 3)) * 85).astype(np.uint8),  # index hits
        rng.integers(0, 256, (8, 8, 4), dtype=np.uint8),        # rgba
        np.zeros((1, 1, 3), np.uint8),
        np.zeros((1, 200, 3), np.uint8),                        # run > 62
    ]
    for a in imgs:
        blob = encode_qoi(a)
        hdr = parse_qoi_header(blob)
        assert (hdr["w"], hdr["h"], hdr["channels"]) == (a.shape[1], a.shape[0], a.shape[2])
        assert np.array_equal(decode_qoi(blob), a)
    flat = np.full((24, 24, 3), 7, np.uint8)
    assert len(encode_qoi(flat)) < 40  # runs actually compress


def test_corrupt_streams_raise_controlled():
    good = encode_qoi(np.arange(48, dtype=np.uint8).reshape(4, 4, 3))
    with pytest.raises(ValueError):
        decode_qoi(good[:10])  # truncated header
    with pytest.raises(ValueError):
        decode_qoi(good[:-1])  # missing end marker
    with pytest.raises(ValueError):
        decode_qoi(_hdr(4, 4) + _END)  # exhausted before pixels
    with pytest.raises(ValueError):
        decode_qoi(_hdr(1, 1) + bytes((0xC0 | 5,)) + _END)  # run overflow
    with pytest.raises(ValueError):
        parse_qoi_header(_hdr(4, 4, ch=2))
    with pytest.raises(ValueError):
        encode_qoi(np.zeros((4, 4), np.uint8))
    rng = np.random.default_rng(9)
    for _ in range(60):  # fuzz law: decode-or-controlled-raise
        blob = _hdr(3, 3) + rng.integers(0, 256, 12, np.uint8).tobytes() + _END
        try:
            out = decode_qoi(blob)
            assert out.shape == (3, 3, 3)
        except (ValueError, IndexError):
            pass


def test_decode_image_and_raster_info_dispatch():
    from pyrosar_ray.functions.raster_info import raster_info
    from pyrosar_ray.stages.images import decode_image

    arr = (np.arange(16 * 16 * 3) % 256).astype(np.uint8).reshape(16, 16, 3)
    blob = encode_qoi(arr)
    assert np.array_equal(decode_image(blob, 16, 16, "qoi"), arr)
    info = raster_info(blob)
    assert info["driver"] == "QOI" and (info["samples"], info["lines"]) == (16, 16)
    assert info["bands"] == 3 and info["extra"] == {"colorspace": 0}


def test_image_table_qoi_slice():
    from pyrosar_ray.sources.images import synth_image

    # seeds divisible by 17 but not 7/11/13 carry fmt='qoi' and the blob
    # round-trips to the exact synth pixels (lossless slice contract)
    seed = 34
    assert seed % 7 and seed % 11 and seed % 13 and seed % 17 == 0
    arr, w, h = synth_image(seed)
    assert np.array_equal(decode_qoi(encode_qoi(arr)), arr)
