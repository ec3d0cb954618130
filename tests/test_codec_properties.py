"""Property-based codec tests (hypothesis) — wav/G.711, FLAC, MP4.

Round-trip laws hold for arbitrary payloads, not just the synthesis
contract's tones: these run a few hundred random cases per law with
shrinking, complementing the closed-form goldens.
"""

import struct
import zlib

import numpy as np
from hypothesis import given, settings, strategies as st

from pyrosar_ray.functions.flac import decode_flac, encode_flac
from pyrosar_ray.functions.mp4 import encode_mp4, extract_frames, parse_mp4
from pyrosar_ray.functions.wav import (
    alaw_compress,
    alaw_expand,
    decode_wav,
    encode_wav,
    ulaw_compress,
    ulaw_expand,
)

pcm_arrays = st.lists(
    st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=600
).map(lambda v: np.array(v, dtype=np.int16))


@settings(max_examples=60, deadline=None)
@given(pcm_arrays)
def test_wav_pcm16_container_roundtrip_exact(pcm):
    dec, rate = decode_wav(encode_wav(pcm, 16000, "pcm16"))
    assert rate == 16000 and (dec == pcm).all()


@settings(max_examples=60, deadline=None)
@given(pcm_arrays)
def test_g711_requantization_is_idempotent(pcm):
    # companding a signal twice equals companding it once (the decode
    # levels are fixed points of the quantizer)
    for comp, exp in ((ulaw_compress, ulaw_expand), (alaw_compress, alaw_expand)):
        once = exp(comp(pcm))
        twice = exp(comp(once))
        assert (once == twice).all()


@settings(max_examples=40, deadline=None)
@given(pcm_arrays, st.sampled_from([1, 64, 256, 4096]))
def test_flac_lossless_any_signal_any_blocksize(pcm, blocksize):
    dec, rate, info = decode_flac(encode_flac(pcm, 8000, blocksize=blocksize))
    assert rate == 8000 and (dec == pcm).all() and info["md5_ok"]


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.binary(min_size=1, max_size=300), min_size=1, max_size=20),
    st.sampled_from([10, 25, 30]),
    st.integers(min_value=1, max_value=5),
)
def test_mp4_frames_roundtrip_any_sizes(frames, fps, spc):
    blob = encode_mp4(frames, 16, 16, fps, samples_per_chunk=spc)
    info = parse_mp4(blob)
    assert info["n_frames"] == len(frames)
    assert info["n_chunks"] == (len(frames) + spc - 1) // spc
    assert extract_frames(blob, range(len(frames))) == frames


# ------------------------------------------------------------ image codecs

_dims = st.integers(min_value=1, max_value=40)


@settings(max_examples=40, deadline=None)
@given(
    _dims, _dims,
    st.sampled_from([1, 2, 3, 4]),
    st.sampled_from(["uint8", "uint16"]),
    st.integers(min_value=0, max_value=4),
    st.booleans(),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_png_lossless_any_shape_depth_filter_layout(h, w, c, dt, ft, il, seed):
    """PNG identity law: any shape × channels × depth × filter ×
    interlace round-trips exactly."""
    from pyrosar_ray.functions.png import decode_png, encode_png

    rng = np.random.RandomState(seed)
    hi = 256 if dt == "uint8" else 65536
    arr = rng.randint(0, hi, (h, w, c)).astype(dt)
    out = decode_png(encode_png(arr, filter_type=ft, interlace=il))
    want = arr[:, :, 0] if c == 1 else arr
    assert out.dtype == want.dtype and np.array_equal(out, want)


@settings(max_examples=40, deadline=None)
@given(
    _dims, _dims,
    st.integers(min_value=1, max_value=256),
    st.booleans(),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_gif_lossless_any_palette(h, w, ncolors, il, seed):
    """GIF identity law: any ≤256-color image round-trips exactly in
    both scan layouts (exercises LZW width growth on large palettes)."""
    from pyrosar_ray.functions.gif import decode_gif, encode_gif

    rng = np.random.RandomState(seed)
    pal = rng.randint(0, 256, (ncolors, 3)).astype(np.uint8)
    arr = pal[rng.randint(0, ncolors, (h, w))]
    assert np.array_equal(decode_gif(encode_gif(arr, interlace=il)), arr)


@settings(max_examples=25, deadline=None)
@given(
    st.integers(min_value=1, max_value=33),
    st.integers(min_value=1, max_value=33),
    st.sampled_from(["4:4:4", "4:2:0"]),
    st.integers(min_value=5, max_value=98),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_jpeg_progressive_equals_baseline_any_input(h, w, sub, q, seed):
    """JPEG layout-equivalence law: for ANY input and quality, the
    progressive and baseline streams decode to identical pixels."""
    from pyrosar_ray.functions.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(seed)
    arr = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(arr, quality=q, subsampling=sub))
    prog = decode_jpeg(encode_jpeg_progressive(arr, quality=q, subsampling=sub))
    assert np.array_equal(base, prog)


# ------------------------------------------------------- corrupt-blob fuzz

_CONTROLLED = (ValueError, NotImplementedError, KeyError, IndexError,
               EOFError, OverflowError, MemoryError, struct.error, zlib.error)


def _decoders():
    from pyrosar_ray.functions.flac import decode_flac
    from pyrosar_ray.functions.gif import decode_gif
    from pyrosar_ray.functions.jpeg import decode_jpeg
    from pyrosar_ray.functions.mp4 import parse_mp4
    from pyrosar_ray.functions.png import decode_png
    from pyrosar_ray.functions.wav import decode_wav

    return {
        "png": decode_png,
        "jpeg": decode_jpeg,
        "gif": decode_gif,
        "flac": decode_flac,
        "wav": decode_wav,
        "mp4": parse_mp4,
    }


@settings(max_examples=80, deadline=None)
@given(st.binary(min_size=0, max_size=300), st.sampled_from(
    ["png", "jpeg", "gif", "flac", "wav", "mp4"]))
def test_decoders_reject_random_bytes_loudly(blob, which):
    """At corpus scale corrupt blobs are a certainty: every decoder must
    either parse or raise a CONTROLLED exception — never hang, crash the
    interpreter, or loop."""
    try:
        _decoders()[which](blob)
    except _CONTROLLED:
        pass


@settings(max_examples=60, deadline=None)
@given(
    st.sampled_from(["png", "jpeg", "gif", "flac", "wav"]),
    st.floats(min_value=0.05, max_value=0.98),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_decoders_survive_truncation(which, frac, seed):
    """Truncating a VALID stream anywhere either decodes (tail pad
    semantics) or raises controlled — the half-written-object-store
    case."""
    rng = np.random.RandomState(seed)
    if which == "png":
        from pyrosar_ray.functions.png import encode_png

        blob = encode_png(rng.randint(0, 256, (9, 7, 3)).astype(np.uint8))
    elif which == "jpeg":
        from pyrosar_ray.functions.jpeg import encode_jpeg

        blob = encode_jpeg(rng.randint(0, 256, (9, 7, 3)).astype(np.uint8))
    elif which == "gif":
        from pyrosar_ray.functions.gif import encode_gif

        pal = rng.randint(0, 256, (4, 3)).astype(np.uint8)
        blob = encode_gif(pal[rng.randint(0, 4, (9, 7))])
    elif which == "flac":
        blob = encode_flac(rng.randint(-999, 999, 300).astype(np.int16), 8000)
    else:
        blob = encode_wav(rng.randint(-999, 999, 300).astype(np.int16), 8000)
    cut = blob[: max(1, int(len(blob) * frac))]
    try:
        _decoders()[which](cut)
    except _CONTROLLED:
        pass


@settings(max_examples=30, deadline=None)
@given(st.floats(min_value=0.05, max_value=0.98),
       st.integers(min_value=0, max_value=2**31 - 1))
def test_mp4_parse_survives_truncation(frac, seed):
    rng = np.random.RandomState(seed)
    frames = [rng.bytes(40) for _ in range(4)]
    blob = encode_mp4(frames, 4, 2, 10)
    cut = blob[: max(1, int(len(blob) * frac))]
    try:
        parse_mp4(cut)
    except _CONTROLLED:
        pass
