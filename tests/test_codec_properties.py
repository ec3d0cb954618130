"""Property-based codec tests (hypothesis) — wav/G.711, FLAC, MP4.

Round-trip laws hold for arbitrary payloads, not just the synthesis
contract's tones: these run a few hundred random cases per law with
shrinking, complementing the closed-form goldens.
"""

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
