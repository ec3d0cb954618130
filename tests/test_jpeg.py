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


def test_rejects_non_jpeg_and_lossless():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
    import struct

    # SOF3 (lossless) still raises; SOF2 (progressive) is now decoded,
    # so a progressive frame header WITHOUT scan data is a corrupt-file
    # ValueError rather than NotImplementedError
    hdr = struct.pack(">H", 11) + struct.pack(">BHHB", 8, 8, 8, 1) + b"\x01\x11\x00"
    with pytest.raises(NotImplementedError):
        decode_jpeg(b"\xff\xd8" + b"\xff\xc3" + hdr + b"\xff\xd9")
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8" + b"\xff\xc2" + hdr + b"\xff\xd9")


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


# ---------------------------------------------------------------- progressive


def test_progressive_equals_baseline_bit_for_bit():
    """Progressive (SOF2) and baseline (SOF0) streams of the same image
    at the same quality decode to IDENTICAL pixels: both layouts carry
    the same quantized coefficients, so any entropy-layer bug (EOB
    runs, ZRL, successive-approximation bits) breaks equality."""
    from pyrosar_ray.functions.jpeg import encode_jpeg_progressive

    rng = np.random.RandomState(11)
    cases = [
        ((16, 16), "4:4:4", 90),
        ((24, 40, 3), "4:4:4", 85),
        ((30, 50, 3), "4:2:0", 75),
        ((17, 23, 3), "4:2:0", 95),  # odd dims + padded chroma grid
        ((8, 8), "4:4:4", 50),
    ]
    for shape, sub, q in cases:
        arr = rng.randint(0, 256, shape).astype(np.float64)
        for _ in range(2):  # slight blur → realistic spectra
            arr = (arr + np.roll(arr, 1, 0) + np.roll(arr, 1, 1)) / 3.0
        arr = arr.astype(np.uint8)
        base = decode_jpeg(encode_jpeg(arr, quality=q, subsampling=sub))
        blob = encode_jpeg_progressive(arr, quality=q, subsampling=sub)
        assert blob[2:4] != b"\xff\xc0" and b"\xff\xc2" in blob[:200]  # SOF2
        assert np.array_equal(base, decode_jpeg(blob)), (shape, sub, q)


def test_progressive_adversarial_spectra():
    """Shapes chosen to force each G.2 code path: constant images
    (corpus-length EOB runs), impulses (ZRL), checkerboard (highest-k
    coefficient only), dense noise at q=95 (correction bits everywhere)
    and q=10 (heavy quantization)."""
    from pyrosar_ray.functions.jpeg import encode_jpeg_progressive

    rng = np.random.RandomState(3)
    imp = np.full((48, 48), 128, np.uint8)
    imp[::7, ::5] = 255
    cases = [
        (np.full((64, 128, 3), 130, np.uint8), "4:2:0", 75),
        (np.full((40, 40), 200, np.uint8), "4:4:4", 90),
        (rng.randint(0, 256, (56, 72, 3)).astype(np.uint8), "4:2:0", 95),
        (rng.randint(0, 256, (56, 72, 3)).astype(np.uint8), "4:4:4", 10),
        (imp, "4:4:4", 90),
        ((np.indices((32, 32)).sum(0) % 2 * 255).astype(np.uint8), "4:4:4", 50),
    ]
    for arr, sub, q in cases:
        base = decode_jpeg(encode_jpeg(arr, quality=q, subsampling=sub))
        prog = decode_jpeg(encode_jpeg_progressive(arr, quality=q, subsampling=sub))
        assert np.array_equal(base, prog)


def test_progressive_psnr_and_decode_image_path():
    """Progressive blobs meet the same ≥40 dB bar as baseline at q=98
    and flow through the stage-level decode_image dispatcher."""
    from pyrosar_ray.functions.jpeg import encode_jpeg_progressive, psnr
    from pyrosar_ray.stages.images import decode_image

    rng = np.random.RandomState(5)
    arr = rng.randint(0, 256, (32, 48, 3)).astype(np.float64)
    for _ in range(3):
        arr = (arr + np.roll(arr, 1, 0) + np.roll(arr, 1, 1)) / 3.0
    arr = arr.astype(np.uint8)
    blob = encode_jpeg_progressive(arr, quality=98)
    out = decode_jpeg(blob)
    assert psnr(arr, out) >= 40.0
    via_stage = decode_image(blob, 48, 32, "jpeg")
    assert np.array_equal(via_stage, out)
