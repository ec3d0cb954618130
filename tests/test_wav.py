"""RIFF/WAVE container + G.711 companding goldens (functions/wav.py).

Reference surface: the container probe half of drivers.py
getFileObj/gdalinfo — here for audio, the format the engine's
multimodal audio rows use when they carry real files.
"""

import numpy as np
import pytest

from pyrosar_ray.functions.wav import (
    alaw_compress,
    alaw_expand,
    decode_wav,
    encode_wav,
    parse_wav,
    ulaw_compress,
    ulaw_expand,
)

ALL_CODES = np.arange(256, dtype=np.uint8)


def test_ulaw_code_roundtrip_except_negative_zero():
    rt = ulaw_compress(ulaw_expand(ALL_CODES))
    bad = ALL_CODES[rt != ALL_CODES]
    # G.711 µ-law has two zero codes (0xFF, 0x7F); encoders emit 0xFF
    assert bad.tolist() == [0x7F]


def test_alaw_code_roundtrip_all_256():
    assert (alaw_compress(alaw_expand(ALL_CODES)) == ALL_CODES).all()


def test_g711_spec_identities():
    # closed-form table values from the G.711 segment law
    assert ulaw_expand(np.array([0xFF], np.uint8))[0] == 0  # positive zero
    assert ulaw_expand(np.array([0x7F], np.uint8))[0] == 0  # negative zero
    assert ulaw_expand(np.array([0x00], np.uint8))[0] == -32124  # neg max
    assert ulaw_expand(np.array([0x80], np.uint8))[0] == 32124  # pos max
    assert int(np.abs(ulaw_expand(ALL_CODES)).max()) == 32124
    assert int(np.abs(alaw_expand(ALL_CODES)).max()) == 32256
    # monotone within the positive half (codes 0x80.. are positive in ulaw
    # after inversion; check via sorted unique level count instead)
    assert len(np.unique(ulaw_expand(ALL_CODES))) == 255  # two zeros collide
    assert len(np.unique(alaw_expand(ALL_CODES))) == 256


def test_ulaw_encode_decode_snr():
    rng = np.random.RandomState(7)
    pcm = (rng.randn(8000) * 6000).clip(-32768, 32767).astype(np.int16)
    for compress, expand, floor_db in (
        (ulaw_compress, ulaw_expand, 33.0),
        (alaw_compress, alaw_expand, 33.0),
    ):
        dec = expand(compress(pcm)).astype(np.float64)
        err = dec - pcm
        snr = 10 * np.log10((pcm.astype(np.float64) ** 2).mean() / (err**2).mean())
        assert snr > floor_db


@pytest.mark.parametrize("codec,exp_chunks", [
    ("pcm16", ["fmt ", "data"]),
    ("pcm8", ["fmt ", "fact", "data"]),
    ("ulaw", ["fmt ", "fact", "data"]),
    ("alaw", ["fmt ", "fact", "data"]),
])
def test_wav_container_roundtrip(codec, exp_chunks):
    rng = np.random.RandomState(3)
    pcm = (rng.randn(1601) * 9000).clip(-32768, 32767).astype(np.int16)
    blob = encode_wav(pcm, 8000, codec)
    info = parse_wav(blob)
    assert info["chunks"] == exp_chunks
    assert info["rate"] == 8000
    assert info["channels"] == 1
    assert info["n_samples"] == 1601
    dec, rate = decode_wav(blob)
    assert rate == 8000 and len(dec) == 1601
    if codec == "pcm16":
        assert (dec == pcm).all()
    # odd payload (1601 bytes for the 8-bit codecs) must pad to word size
    if codec != "pcm16":
        assert len(blob) % 2 == 0


def test_wav_skips_unknown_chunks_and_padding():
    pcm = np.arange(-50, 50, dtype=np.int16)
    body = b"INFO" + b"IART" + (1).to_bytes(4, "little") + b"p"  # 13 bytes, odd
    extra = b"LIST" + (13).to_bytes(4, "little") + body + b"\x00"
    blob = encode_wav(pcm, 16000, "pcm16", extra_chunk=extra)
    info = parse_wav(blob)
    assert info["chunks"] == ["fmt ", "LIST", "data"]
    dec, _ = decode_wav(blob)
    assert (dec == pcm).all()


def test_wav_rejects_garbage():
    with pytest.raises(ValueError):
        parse_wav(b"RIFX....WAVE")
    with pytest.raises(ValueError):
        parse_wav(b"RIFF" + (100).to_bytes(4, "little") + b"WAVE")  # truncated
    pcm = np.zeros(16, np.int16)
    blob = bytearray(encode_wav(pcm, 16000, "pcm16"))
    blob[20:22] = (0x55).to_bytes(2, "little")  # unknown fmt code
    with pytest.raises(ValueError):
        decode_wav(bytes(blob))


def test_decode_audio_dispatch():
    from pyrosar_ray.sources.audio import decode_audio, synth_audio, synth_wav

    pcm = synth_audio(11)
    assert (decode_audio(pcm.tobytes(), "pcm16") == pcm).all()
    assert (decode_audio(ulaw_compress(pcm).tobytes(), "ulaw")
            == ulaw_expand(ulaw_compress(pcm))).all()
    assert (decode_audio(alaw_compress(pcm).tobytes(), "alaw")
            == alaw_expand(alaw_compress(pcm))).all()
    dec = decode_audio(synth_wav(11), "wav")
    assert len(dec) == len(pcm)
    with pytest.raises(NotImplementedError):
        decode_audio(b"\xff\xfb\x90", "mp3")
