"""IMA/DVI ADPCM codec goldens (functions/adpcm.py + the WAV 0x0011 leg).

The codec is lossy, so the pin is decoder PARITY: ``decode(encode(x))``
must equal the encoder's internal reconstruction bit-exactly (both run
the identical clamped quantizer state machine). Quality is pinned with
a PSNR floor on smooth signals; the spec step machine is pinned with a
hand-walked two-sample golden; the container leg with the 20-byte fmt /
fact / md5-sidecar layout arithmetic.
"""

import hashlib
import struct

import numpy as np
import pytest

from pyrosar_ray.functions.adpcm import (
    INDEX_TABLE,
    STEP_TABLE,
    adpcm_decode,
    adpcm_encode,
    samples_per_block,
)
from pyrosar_ray.functions.wav import decode_wav, encode_wav, parse_wav


def test_step_table_shape():
    assert len(STEP_TABLE) == 89
    assert STEP_TABLE[0] == 7 and STEP_TABLE[88] == 32767
    assert (np.diff(STEP_TABLE) > 0).all()
    assert list(INDEX_TABLE) == [-1, -1, -1, -1, 2, 4, 6, 8]


def test_hand_walked_golden():
    # seed 0, step index 0 (step 7). Sample 100: diff=100 >= 7,4(?),
    # greedy bits: b2=(100>=7)->1, rem 93; b1=(93>=3)->1, rem 90;
    # b0=(90>=1)->1 -> code 0b0111, recon = 0 + 7 + 3 + 1 + 0 (step>>3=0)
    # = 11, index 0+8=8 (step 16). Next sample -50: diff=-61, mag 61:
    # b2=(61>=16)->1 rem 45; b1=(45>=8)->1 rem 37; b0=(37>=4)->1 ->
    # code 0b1111, recon = 11 - (2+4+8+16) = -19, index 8+8=16.
    pcm = np.array([0, 100, -50], dtype=np.int16)
    stream, recon = adpcm_encode(pcm, 6)  # spb = 5
    assert list(recon) == [0, 11, -19]
    # block layout: predictor 0, index 0, reserved, nibbles 7 then 15
    assert stream[:4] == b"\x00\x00\x00\x00"
    assert stream[4] == 0x7 | (0xF << 4)
    dec = adpcm_decode(stream, 6, 3)
    assert list(dec) == [0, 11, -19]


def test_decoder_parity_and_psnr():
    rng = np.random.default_rng(3)
    for n, block in ((1, 6), (121, 64), (122, 64), (9000, 256), (14321, 64)):
        x = np.cumsum(rng.integers(-700, 700, n)).clip(-32768, 32767).astype(np.int16)
        stream, recon = adpcm_encode(x, block)
        assert len(stream) % block == 0
        dec = adpcm_decode(stream, block, n)
        assert np.array_equal(dec, recon)
    tone = (8000 * np.sin(np.arange(14000) * 0.05)).astype(np.int16)
    _, recon = adpcm_encode(tone, 64)
    err = tone.astype(np.float64) - recon.astype(np.float64)
    psnr = 10 * np.log10(32768.0**2 / (err**2).mean())
    assert psnr >= 40.0


def test_saturation_clamps():
    x = np.array([32767, -32768, 32767, -32768] * 50, dtype=np.int16)
    stream, recon = adpcm_encode(x, 64)
    dec = adpcm_decode(stream, 64, len(x))
    assert np.array_equal(dec, recon)
    assert dec.max() <= 32767 and dec.min() >= -32768


def test_corrupt_streams_raise_controlled():
    with pytest.raises(ValueError):
        adpcm_decode(b"\x00" * 63, 64)  # not whole blocks
    with pytest.raises(ValueError):
        adpcm_decode(b"", 64)
    bad = bytearray(adpcm_encode(np.arange(200, dtype=np.int16), 64)[0])
    bad[2] = 200  # step index > 88
    with pytest.raises(ValueError):
        adpcm_decode(bytes(bad), 64)
    with pytest.raises(ValueError):
        samples_per_block(5)
    with pytest.raises(ValueError):
        adpcm_decode(b"\x00" * 64, 64, n_samples=500)  # > carried
    rng = np.random.default_rng(11)
    for _ in range(50):  # fuzz law: parse-or-controlled-raise
        blob = rng.integers(0, 256, 128, dtype=np.uint8).tobytes()
        try:
            adpcm_decode(blob, 64)
        except ValueError:
            pass


def test_wav_container_leg():
    tone = (6000 * np.sin(np.arange(10000) * 0.03)).astype(np.int16)
    blob = encode_wav(tone, 16000, "ima", ima_block=64)
    info = parse_wav(blob)
    assert info["codec"] == "ima_adpcm" and info["bits"] == 4
    assert info["block_align"] == 64 and info["fact_samples"] == 10000
    assert info["n_samples"] == 10000
    # 20-byte fmt: cbSize=2 + wSamplesPerBlock
    fmt_off = blob.index(b"fmt ")
    csize, code = struct.unpack_from("<IH", blob, fmt_off + 4)
    assert csize == 20 and code == 0x0011
    cb, spb = struct.unpack_from("<HH", blob, fmt_off + 24)
    assert cb == 2 and spb == samples_per_block(64) == 121
    pcm, rate = decode_wav(blob)
    assert rate == 16000 and len(pcm) == 10000
    err = tone.astype(np.float64) - pcm.astype(np.float64)
    assert 10 * np.log10(32768.0**2 / (err**2).mean()) >= 40.0


def test_synth_sidecar_md5_contract():
    from pyrosar_ray.sources.audio import synth_adpcm

    for i in (1, 3, 73):
        blob = synth_adpcm(i)
        info = parse_wav(blob)
        pcm, _ = decode_wav(blob)
        n = 8000 + (i % 37) * 160
        n_blocks = (n + 120) // 121
        assert info["n_samples"] == n == len(pcm)
        assert len(blob) == 84 + 64 * n_blocks
        assert hashlib.md5(pcm.astype("<i2").tobytes()).digest() == info["md5"]
        # a corrupted nibble must flip the sidecar check (byte 100 sits
        # in the first block's payload — the tail bytes may be padding
        # nibbles beyond the fact count, which decode trims)
        bad = bytearray(blob)
        bad[100] ^= 0x0F
        pcm2, _ = decode_wav(bytes(bad))
        assert hashlib.md5(pcm2.astype("<i2").tobytes()).digest() != info["md5"]
