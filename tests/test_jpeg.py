"""Pure-numpy baseline JPEG codec (functions/jpeg.py)."""

import numpy as np
import pytest

from pyrosar_ray.functions.jpeg import (
    _csize,
    _extend,
    decode_jpeg,
    encode_jpeg,
    psnr,
    quality_tables,
)


def _gradient(h, w):
    y = np.linspace(0, 255, h)[:, None]
    x = np.linspace(0, 255, w)[None, :]
    r = np.clip(y + 0 * x, 0, 255)
    g = np.clip(x + 0 * y, 0, 255)
    b = np.clip((y + x) / 2, 0, 255)
    return np.stack([r, g, b], axis=2).astype(np.uint8)


def test_roundtrip_rgb_gradient_high_psnr():
    arr = _gradient(48, 64)
    blob = encode_jpeg(arr, quality=95)
    back = decode_jpeg(blob)
    assert back.shape == arr.shape
    assert psnr(arr, back) >= 40.0


def test_roundtrip_synthetic_image_psnr():
    from pyrosar_ray.sources.images import synth_image

    # the synthetic images carry a high-frequency noise field — the
    # hardest content for DCT coding; quality 98 clears the 40 dB bar
    arr, w, h = synth_image(12345)
    blob = encode_jpeg(arr, quality=98)
    back = decode_jpeg(blob)
    assert back.shape == (h, w, 3)
    assert psnr(arr, back) >= 40.0


def test_roundtrip_grayscale():
    rng = np.random.RandomState(3)
    arr = (rng.rand(30, 50) * 100 + 60).astype(np.uint8)
    blob = encode_jpeg(arr, quality=95)
    back = decode_jpeg(blob)
    assert back.ndim == 2 and back.shape == arr.shape
    assert psnr(arr, back) >= 40.0


def test_roundtrip_420_subsampling():
    arr = _gradient(33, 41)  # odd sizes exercise MCU padding + crop
    blob = encode_jpeg(arr, quality=95, subsampling="4:2:0")
    back = decode_jpeg(blob)
    assert back.shape == arr.shape
    # chroma is halved: bar is lower but still high on smooth content
    assert psnr(arr, back) >= 35.0


def test_odd_sizes_and_tiny_images():
    for h, w in [(1, 1), (7, 9), (8, 8), (17, 23)]:
        arr = _gradient(h, w)
        back = decode_jpeg(encode_jpeg(arr, quality=95))
        assert back.shape == arr.shape
        assert psnr(arr, back) >= 35.0


def test_encode_deterministic():
    arr = _gradient(24, 24)
    assert encode_jpeg(arr, quality=80) == encode_jpeg(arr, quality=80)


def test_quality_scales_size_and_fidelity():
    rng = np.random.RandomState(7)
    arr = np.clip(
        _gradient(40, 40).astype(np.int16) + rng.randint(-20, 20, (40, 40, 3)),
        0,
        255,
    ).astype(np.uint8)
    lo = encode_jpeg(arr, quality=20)
    hi = encode_jpeg(arr, quality=95)
    assert len(lo) < len(hi)
    assert psnr(arr, decode_jpeg(lo)) < psnr(arr, decode_jpeg(hi))


def test_rejects_non_jpeg_and_progressive():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
    # craft SOI + a minimal SOF2 (progressive) frame header
    import struct

    sof2 = b"\xff\xc2" + struct.pack(">H", 11) + struct.pack(">BHHB", 8, 8, 8, 1) + b"\x01\x11\x00"
    with pytest.raises(NotImplementedError):
        decode_jpeg(b"\xff\xd8" + sof2 + b"\xff\xd9")


def test_extend_and_csize():
    assert _extend(0, 0) == 0
    assert _extend(1, 1) == 1 and _extend(0, 1) == -1
    assert _extend(0b11, 2) == 3 and _extend(0b00, 2) == -3
    assert _csize(0) == 0 and _csize(1) == 1 and _csize(-1) == 1
    assert _csize(255) == 8 and _csize(-512) == 10


def test_quality_tables_bounds():
    l50, c50 = quality_tables(50)
    assert (l50 >= 1).all() and (l50 <= 255).all()
    l95, _ = quality_tables(95)
    assert (l95 <= l50).all()
    with pytest.raises(ValueError):
        quality_tables(0)


def test_decode_image_gate_handles_jpeg():
    from pyrosar_ray.stages.images import decode_image

    arr = _gradient(16, 16)
    blob = encode_jpeg(arr, quality=95)
    out = decode_image(blob, 16, 16, "jpeg")
    assert out.shape == (16, 16, 3)
    assert psnr(arr, out) >= 40.0
