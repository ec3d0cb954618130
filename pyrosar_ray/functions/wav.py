"""RIFF/WAVE container codec + ITU-T G.711 companding, pure numpy.

The real-format leg of the audio surface (mirrors functions/png.py and
functions/jpeg.py for images): the reference decodes audio-like rasters
through GDAL (reference drivers.py getFileObj/gdalinfo surface); this
engine's audio rows carry a ``bytes`` column whose format tag selects a
decoder in ``sources/audio.py``.  ``fmt="wav"`` now decodes a genuine
RIFF/WAVE container rather than requiring an external codec library:

- chunk walker with the classic gotchas handled: odd-size chunks are
  padded to word boundaries, unknown chunks (``LIST``, ``cue ``,
  ``bext``) are skipped, ``fmt `` may be 16/18/40 bytes long
- format codes 0x0001 PCM (8-bit unsigned / 16-bit signed LE),
  0x0006 A-law and 0x0007 µ-law (G.711)
- G.711 expand is the classic public-domain table law (Sun g711.c
  formulation of ITU-T G.711); compress is the segment/truncation law,
  vectorized via ``np.searchsorted`` over the segment ends.  Both
  directions satisfy ``compress(expand(code)) == code`` for all 256
  codes, which pins the tables bit-exactly.

Everything is vectorized; no per-sample Python in any path.
"""

from __future__ import annotations

import struct

import numpy as np

WAVE_PCM = 0x0001
WAVE_ALAW = 0x0006
WAVE_ULAW = 0x0007
WAVE_IMA_ADPCM = 0x0011

_FMT_NAMES = {
    WAVE_PCM: "pcm",
    WAVE_ALAW: "alaw",
    WAVE_ULAW: "ulaw",
    WAVE_IMA_ADPCM: "ima_adpcm",
}

# --------------------------------------------------------------------------
# G.711 companding (µ-law BIAS 0x84 / 14-bit, A-law 13-bit segment law)
# --------------------------------------------------------------------------

_USEG = np.array([0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF])
_ASEG = np.array([0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF])


def ulaw_expand(codes: np.ndarray) -> np.ndarray:
    """µ-law byte codes → int16 linear PCM (max magnitude 32124)."""
    u = (~np.asarray(codes, dtype=np.uint8)).astype(np.int32)
    t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
    return np.where(u & 0x80, 0x84 - t, t - 0x84).astype(np.int16)


def ulaw_compress(pcm: np.ndarray) -> np.ndarray:
    """int16 linear PCM → µ-law byte codes (segment/truncation law)."""
    x = np.asarray(pcm, dtype=np.int32) >> 2  # 16 → 14 bit
    mask = np.where(x < 0, 0x7F, 0xFF)
    x = np.minimum(np.abs(x) + 0x21, 0x1FFF)  # bias 0x84 >> 2, clip
    seg = np.searchsorted(_USEG, x)
    code = (seg << 4) | ((x >> (seg + 1)) & 0x0F)
    return (code ^ mask).astype(np.uint8)


def alaw_expand(codes: np.ndarray) -> np.ndarray:
    """A-law byte codes → int16 linear PCM (max magnitude 32256)."""
    a = np.asarray(codes, dtype=np.uint8).astype(np.int32) ^ 0x55
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    t = np.where(seg == 0, t + 8, (t + 0x108) << np.maximum(seg - 1, 0))
    return np.where(a & 0x80, t, -t).astype(np.int16)


def alaw_compress(pcm: np.ndarray) -> np.ndarray:
    """int16 linear PCM → A-law byte codes (13-bit segment law)."""
    x = np.asarray(pcm, dtype=np.int32) >> 3  # 16 → 13 bit
    mask = np.where(x >= 0, 0xD5, 0x55)
    x = np.where(x >= 0, x, -x - 1)
    seg = np.searchsorted(_ASEG, x)
    shift = np.where(seg < 2, 1, seg)
    code = np.where(seg >= 8, 0x7F, (np.minimum(seg, 7) << 4) | ((x >> shift) & 0x0F))
    return (code ^ mask).astype(np.uint8)


# --------------------------------------------------------------------------
# RIFF/WAVE container
# --------------------------------------------------------------------------


def encode_wav(
    pcm: np.ndarray,
    rate: int,
    codec: str = "pcm16",
    extra_chunk: bytes | None = None,
    ima_block: int = 64,
) -> bytes:
    """int16 mono PCM → WAV bytes in the requested on-disk codec.

    ``codec``: ``pcm16`` | ``pcm8`` (unsigned, 8-bit) | ``ulaw`` | ``alaw``
    | ``ima`` (IMA/DVI ADPCM, format 0x0011, ``ima_block`` bytes per
    block). Compressed/8-bit forms carry the spec-required ``fact``
    chunk (dwSampleLength) and the 18-byte fmt chunk with cbSize=0; IMA
    uses the 20-byte fmt (cbSize=2, wSamplesPerBlock).
    ``extra_chunk``, when given, is inserted verbatim before ``data`` to
    exercise reader skip logic (a fully-formed chunk incl. header).
    """
    pcm = np.asarray(pcm, dtype=np.int16)
    if codec == "ima":
        from .adpcm import adpcm_encode, samples_per_block

        payload, _ = adpcm_encode(pcm, ima_block)
        spb = samples_per_block(ima_block)
        byte_rate = (rate * ima_block + spb - 1) // spb
        fmt_chunk = struct.pack(
            "<4sIHHIIHHHH",
            b"fmt ", 20, WAVE_IMA_ADPCM, 1, rate, byte_rate, ima_block, 4, 2, spb,
        )
        fact = struct.pack("<4sII", b"fact", 4, len(pcm))
        data = struct.pack("<4sI", b"data", len(payload)) + payload
        if len(payload) % 2:
            data += b"\x00"
        body = b"WAVE" + fmt_chunk + fact + (extra_chunk or b"") + data
        return struct.pack("<4sI", b"RIFF", len(body)) + body
    if codec == "pcm16":
        fmt_code, bits, payload = WAVE_PCM, 16, pcm.astype("<i2").tobytes()
    elif codec == "pcm8":
        fmt_code, bits = WAVE_PCM, 8
        payload = (((pcm.astype(np.int32) + 32768) >> 8).astype(np.uint8)).tobytes()
    elif codec == "ulaw":
        fmt_code, bits, payload = WAVE_ULAW, 8, ulaw_compress(pcm).tobytes()
    elif codec == "alaw":
        fmt_code, bits, payload = WAVE_ALAW, 8, alaw_compress(pcm).tobytes()
    else:
        raise ValueError(f"unknown wav codec {codec!r}")

    block_align = bits // 8  # mono
    byte_rate = rate * block_align
    if fmt_code == WAVE_PCM and bits == 16:
        fmt_chunk = struct.pack(
            "<4sIHHIIHH", b"fmt ", 16, fmt_code, 1, rate, byte_rate, block_align, bits
        )
        fact = b""
    else:
        # non-PCM (and 8-bit here, for reader coverage): 18-byte fmt + fact
        fmt_chunk = struct.pack(
            "<4sIHHIIHHH",
            b"fmt ", 18, fmt_code, 1, rate, byte_rate, block_align, bits, 0,
        )
        fact = struct.pack("<4sII", b"fact", 4, len(pcm))

    data = struct.pack("<4sI", b"data", len(payload)) + payload
    if len(payload) % 2:  # word alignment pad byte (outside the chunk size)
        data += b"\x00"
    body = b"WAVE" + fmt_chunk + fact + (extra_chunk or b"") + data
    return struct.pack("<4sI", b"RIFF", len(body)) + body


def parse_wav(blob: bytes) -> dict:
    """Parse a WAV container without decoding samples.

    Returns fmt_code, codec (name), channels, rate, byte_rate,
    block_align, bits, n_samples (from the data chunk size), data byte
    offset/length, and the list of chunk ids encountered, in order.
    """
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    riff_size = struct.unpack_from("<I", blob, 4)[0]
    if riff_size + 8 > len(blob):
        raise ValueError("truncated RIFF payload")

    info: dict = {"chunks": []}
    pos = 12
    while pos + 8 <= riff_size + 8:
        cid, csize = struct.unpack_from("<4sI", blob, pos)
        body = pos + 8
        if body + csize > len(blob):
            raise ValueError(f"truncated chunk {cid!r}")
        info["chunks"].append(cid.decode("latin-1"))
        if cid == b"fmt ":
            if csize < 16:
                raise ValueError("fmt chunk too short")
            (fmt_code, ch, rate, byte_rate, block_align, bits) = struct.unpack_from(
                "<HHIIHH", blob, body
            )
            info.update(
                fmt_code=fmt_code,
                codec=_FMT_NAMES.get(fmt_code, f"0x{fmt_code:04x}"),
                channels=ch,
                rate=rate,
                byte_rate=byte_rate,
                block_align=block_align,
                bits=bits,
            )
        elif cid == b"fact":
            info["fact_samples"] = struct.unpack_from("<I", blob, body)[0]
        elif cid == b"md5 ":
            # engine sidecar: digest of the decoded PCM (lossy-codec
            # bit-exactness pin, the FLAC STREAMINFO-MD5 analogue)
            info["md5"] = blob[body : body + csize]
        elif cid == b"data":
            info["data_offset"] = body
            info["data_size"] = csize
        pos = body + csize + (csize & 1)  # odd chunks pad to word boundary

    if "fmt_code" not in info:
        raise ValueError("missing fmt chunk")
    if "data_offset" not in info:
        raise ValueError("missing data chunk")
    if info["fmt_code"] == WAVE_IMA_ADPCM:
        from .adpcm import samples_per_block

        carried = info["data_size"] // info["block_align"] * samples_per_block(
            info["block_align"]
        )
        info["n_samples"] = info.get("fact_samples", carried)
    else:
        info["n_samples"] = info["data_size"] // info["block_align"]
    return info


def decode_wav(blob: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (int16 mono PCM, sample rate).

    PCM 8 (unsigned) / 16-bit LE, A-law and µ-law payloads decode; other
    format codes raise ValueError with the code named.
    """
    info = parse_wav(blob)
    raw = blob[info["data_offset"] : info["data_offset"] + info["data_size"]]
    code, bits = info["fmt_code"], info["bits"]
    if code == WAVE_PCM and bits == 16:
        pcm = np.frombuffer(raw, dtype="<i2")
    elif code == WAVE_PCM and bits == 8:
        pcm = ((np.frombuffer(raw, dtype=np.uint8).astype(np.int32) - 128) << 8).astype(
            np.int16
        )
    elif code == WAVE_ULAW:
        pcm = ulaw_expand(np.frombuffer(raw, dtype=np.uint8))
    elif code == WAVE_ALAW:
        pcm = alaw_expand(np.frombuffer(raw, dtype=np.uint8))
    elif code == WAVE_IMA_ADPCM:
        from .adpcm import adpcm_decode

        if info["channels"] != 1:
            raise ValueError("IMA ADPCM decode is mono-only here")
        return (
            adpcm_decode(raw, info["block_align"], info.get("fact_samples")),
            info["rate"],
        )
    else:
        raise ValueError(f"unsupported wav format code 0x{code:04x} / {bits} bits")
    if info["channels"] != 1:
        pcm = pcm.reshape(-1, info["channels"]).mean(axis=1).astype(np.int16)
    return pcm, info["rate"]
