"""Synthetic audio source + PCM decode — the audio leg of the multimodal
surface (binary column + typed metadata, like sources/images.py).

Deterministic per-id synthesis so tests and the SQL twin can recompute
the metadata arithmetically: sample count, amplitude and tone frequency
all derive from ``doc_id`` by modular arithmetic (no RNG), and the
waveform is a quantized sine. Compressed codecs (mp3/flac/ogg) are
stubbed behind a try-import like jpeg in stages/images.py — no codec
libraries ship in this container; raw pcm16 decode is real.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..pipelines.tables import read_parquet_clean as _read_parquet

SAMPLE_RATE = 16_000


def synth_audio(doc_id: int) -> np.ndarray:
    """Deterministic int16 mono PCM for an id.

    ``n_samples = 8000 + (id % 37)·160`` (always a multiple of 16 →
    integral millisecond durations), ``amp = 8000 + (id % 7)·1000``,
    ``freq = 200 + (id % 12)·50`` Hz.
    """
    n = 8_000 + (doc_id % 37) * 160
    amp = 8_000 + (doc_id % 7) * 1_000
    freq = 200.0 + (doc_id % 12) * 50.0
    t = np.arange(n, dtype=np.float64)
    return np.round(amp * np.sin(2.0 * np.pi * freq * t / SAMPLE_RATE)).astype(
        np.int16
    )


def decode_audio(blob: bytes, fmt: str) -> np.ndarray:
    """bytes → int16 PCM samples.

    Native decoders: raw ``pcm16``, raw G.711 ``ulaw``/``alaw`` byte
    streams, and ``wav`` RIFF containers (PCM 8/16-bit, A-law, µ-law —
    functions/wav.py). Perceptual codecs (mp3/flac/ogg) still require a
    codec library absent from this container.
    """
    if fmt == "pcm16":
        return np.frombuffer(blob, dtype="<i2")
    if fmt == "ulaw":
        from ..functions.wav import ulaw_expand

        return ulaw_expand(np.frombuffer(blob, dtype=np.uint8))
    if fmt == "alaw":
        from ..functions.wav import alaw_expand

        return alaw_expand(np.frombuffer(blob, dtype=np.uint8))
    if fmt == "wav":
        from ..functions.wav import decode_wav

        return decode_wav(blob)[0]
    if fmt == "flac":
        from ..functions.flac import decode_flac

        pcm, _, info = decode_flac(blob)
        if not info["md5_ok"]:
            raise ValueError("flac: decoded PCM fails the STREAMINFO MD5")
        return pcm.astype(np.int16)
    try:  # pragma: no cover - no audio codec libs in this container
        import soundfile  # noqa: F401
    except ImportError as err:  # pragma: no cover
        raise NotImplementedError(
            f"decode of fmt={fmt!r} requires an audio codec library "
            "(soundfile/librosa); pcm16/ulaw/alaw/wav/flac decode natively"
        ) from err


def audio_from_documents(sf_dir: str):
    """One synthetic audio row per document: (audio_id, bytes, rate, fmt,
    n_declared, caption)."""
    import ray.data

    docs = _read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def _make(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        pcm = [synth_audio(i) for i in ids]
        return pa.table(
            {
                "audio_id": pa.array([f"aud-{i:012d}" for i in ids], type=pa.string()),
                "bytes": pa.array([p.tobytes() for p in pcm], type=pa.binary()),
                "rate": pa.array([SAMPLE_RATE] * len(ids), type=pa.int32()),
                "fmt": pa.array(["pcm16"] * len(ids), type=pa.string()),
                "caption": batch["text"],
            }
        )

    return docs.map_batches(_make, batch_format="pyarrow", batch_size=128)


def wav_codec_for(doc_id: int) -> str:
    """Deterministic on-disk codec for a synthetic WAV row."""
    return ("pcm16", "ulaw", "alaw", "pcm8")[doc_id % 4]


def synth_wav(doc_id: int) -> bytes:
    """Deterministic WAV container for an id: the synth_audio tone
    wrapped in RIFF with an id-keyed codec; every 5th row carries an
    odd-sized LIST chunk so readers must handle word-alignment padding."""
    from ..functions.wav import encode_wav

    extra = None
    if doc_id % 5 == 0:
        body = b"INFO" + b"IART" + (1).to_bytes(4, "little") + b"p"  # 13 bytes
        extra = b"LIST" + (13).to_bytes(4, "little") + body + b"\x00"  # + pad
    return encode_wav(synth_audio(doc_id), SAMPLE_RATE, wav_codec_for(doc_id), extra)


FLAC_BLOCKSIZE = 1024


def synth_flac(doc_id: int) -> bytes:
    """Deterministic FLAC stream for an id: the synth tone truncated to
    ``1600 + (id % 37)·32`` samples, encoded at blocksize 1024 so every
    stream spans 2-3 frames (multi-frame decode exercised per row)."""
    from ..functions.flac import encode_flac

    n = 1600 + (doc_id % 37) * 32
    return encode_flac(synth_audio(doc_id)[:n], SAMPLE_RATE, blocksize=FLAC_BLOCKSIZE)


def flac_audio_from_documents(sf_dir: str):
    """One FLAC row per EVEN document id (decode is ~ms-scale per clip;
    the slice keeps the correctness gate snappy at sf0.01)."""
    import pyarrow.compute as pc

    docs = _read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def _make(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.equal(pc.bit_wise_and(batch["doc_id"], 1), 0))
        ids = batch["doc_id"].to_pylist()
        return pa.table(
            {
                "audio_id": pa.array([f"flc-{i:012d}" for i in ids], type=pa.string()),
                "bytes": pa.array([synth_flac(i) for i in ids], type=pa.binary()),
                "rate": pa.array([SAMPLE_RATE] * len(ids), type=pa.int32()),
                "fmt": pa.array(["flac"] * len(ids), type=pa.string()),
                "caption": batch["text"],
            }
        )

    return docs.map_batches(_make, batch_format="pyarrow", batch_size=128)


ADPCM_BLOCK = 64


def synth_adpcm(doc_id: int) -> bytes:
    """Deterministic IMA-ADPCM WAV for an id: the synth tone compressed
    4:1 with a ``md5 `` sidecar chunk carrying the digest of the
    decoder's expected PCM — the lossy-codec analogue of FLAC's
    STREAMINFO MD5, so the correctness gate pins decode bit-exactness
    even though the codec itself is lossy."""
    import hashlib

    from ..functions.adpcm import adpcm_encode
    from ..functions.wav import encode_wav

    pcm = synth_audio(doc_id)
    _, recon = adpcm_encode(pcm, ADPCM_BLOCK)
    digest = hashlib.md5(recon.astype("<i2").tobytes()).digest()
    sidecar = b"md5 " + (16).to_bytes(4, "little") + digest
    return encode_wav(pcm, SAMPLE_RATE, "ima", extra_chunk=sidecar, ima_block=ADPCM_BLOCK)


def adpcm_audio_from_documents(sf_dir: str):
    """One IMA-ADPCM WAV row per ODD document id (the even ids carry the
    FLAC slice — together the two compressed codecs tile the corpus)."""
    import pyarrow.compute as pc

    docs = _read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def _make(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.equal(pc.bit_wise_and(batch["doc_id"], 1), 1))
        ids = batch["doc_id"].to_pylist()
        return pa.table(
            {
                "audio_id": pa.array([f"ima-{i:012d}" for i in ids], type=pa.string()),
                "bytes": pa.array([synth_adpcm(i) for i in ids], type=pa.binary()),
                "rate": pa.array([SAMPLE_RATE] * len(ids), type=pa.int32()),
                "fmt": pa.array(["wav"] * len(ids), type=pa.string()),
                "caption": batch["text"],
            }
        )

    return docs.map_batches(_make, batch_format="pyarrow", batch_size=128)


def wav_audio_from_documents(sf_dir: str):
    """One synthetic WAV-container row per document (audio_id, bytes,
    fmt='wav', caption) — the real-container twin of
    ``audio_from_documents``."""
    docs = _read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def _make(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        return pa.table(
            {
                "audio_id": pa.array([f"wav-{i:012d}" for i in ids], type=pa.string()),
                "bytes": pa.array([synth_wav(i) for i in ids], type=pa.binary()),
                "rate": pa.array([SAMPLE_RATE] * len(ids), type=pa.int32()),
                "fmt": pa.array(["wav"] * len(ids), type=pa.string()),
                "caption": batch["text"],
            }
        )

    return docs.map_batches(_make, batch_format="pyarrow", batch_size=128)
