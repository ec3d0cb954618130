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
    """bytes → int16 PCM samples. pcm16 decodes natively; codecs need a lib."""
    if fmt == "pcm16":
        return np.frombuffer(blob, dtype="<i2")
    try:  # pragma: no cover - no audio codec libs in this container
        import soundfile  # noqa: F401
    except ImportError as err:  # pragma: no cover
        raise NotImplementedError(
            f"decode of fmt={fmt!r} requires an audio codec library "
            "(soundfile/librosa); pcm16 decodes natively in this sandbox"
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
