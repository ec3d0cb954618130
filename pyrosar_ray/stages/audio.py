"""Audio compute stages: decode + per-clip feature extraction.

Same actor-pool shape as the image stages (stages/images.py memory
rule): MB-scale binary rows ride zero-copy Arrow into the actor, decode
to numpy once, and every feature is a vectorized reduction over the
sample array — no per-sample Python. Bounded ``batch_size`` keeps
payload × concurrency inside the worker heap.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from ..sources.audio import decode_audio


class AudioFeatures:
    """Actor-pool stage: decode → duration / peak / RMS / zero-crossings.

    ``on_error='skip'`` mirrors the image stage's corpus-scale policy:
    a corrupt clip drops its row (counted under
    ``audio_features/corrupt_rows`` on the cluster-wide collector)
    instead of failing the job; the default stays strict.
    """

    def __init__(self, on_error: str = "raise"):
        if on_error not in ("raise", "skip"):
            raise ValueError("on_error must be 'raise' or 'skip'")
        self.skip = on_error == "skip"
        self.collector = None
        if self.skip:
            from ..state.metrics import get_collector

            self.collector = get_collector()

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        rates = batch["rate"].to_pylist()
        n_samples, duration_ms, peak, rms, zcr, keep = [], [], [], [], [], []
        peak_abs, energy = [], []
        n_bad = 0
        for i, (blob, fmt, rate) in enumerate(zip(blobs, fmts, rates)):
            try:
                pcm_i = decode_audio(blob, fmt).astype(np.int64)
            except Exception:
                if not self.skip:
                    raise
                n_bad += 1
                continue
            keep.append(i)
            pcm = pcm_i.astype(np.float64)
            n = len(pcm)
            n_samples.append(n)
            duration_ms.append(n * 1000.0 / rate)
            peak.append(float(np.abs(pcm).max()) if n else 0.0)
            rms.append(float(np.sqrt((pcm**2).mean())) if n else 0.0)
            signs = np.signbit(pcm)
            zcr.append(int((signs[1:] != signs[:-1]).sum()) if n > 1 else 0)
            # integer-exact reductions over the decoded samples (the
            # oracle-hashable feature set: no float summation order,
            # no libm on the Ray side)
            peak_abs.append(int(np.abs(pcm_i).max()) if n else 0)
            energy.append(int((pcm_i * pcm_i).sum()) if n else 0)
        if n_bad and self.collector is not None:
            self.collector.add.remote("audio_features", "corrupt_rows", float(n_bad))
        base = batch if not self.skip else batch.take(keep)
        return pa.table(
            {
                "audio_id": base["audio_id"],
                "n_samples": pa.array(n_samples, type=pa.int64()),
                "duration_ms": pa.array(duration_ms, type=pa.float64()),
                "peak": pa.array(peak, type=pa.float64()),
                "rms": pa.array([round(v, 4) for v in rms], type=pa.float64()),
                "zcr": pa.array(zcr, type=pa.int64()),
                "peak_abs": pa.array(peak_abs, type=pa.int64()),
                "energy": pa.array(energy, type=pa.int64()),
            }
        )


def audio_features(
    clips: Dataset,
    concurrency=(1, 4),
    batch_size: int = 64,
    on_error: str = "raise",
) -> Dataset:
    """Per-clip audio features over a binary PCM column."""
    return clips.map_batches(
        AudioFeatures,
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
        fn_constructor_kwargs={"on_error": on_error},
    )


class WavMeta:
    """Actor-pool stage: real RIFF/WAVE container parse + decode count.

    Every column is derivable arithmetically from the id by the SQL twin
    (``audio_wav_meta``), but the Ray side computes them the honest way:
    ``parse_wav`` walks the chunk list (incl. odd-size LIST padding) and
    ``decode_wav`` runs the full G.711/PCM expand, so a parser or
    companding bug breaks the hash.
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.wav import decode_wav, parse_wav

        codec, bits, n_samples, n_decoded, n_chunks, nbytes, dur = (
            [], [], [], [], [], [], []
        )
        for blob in batch["bytes"].to_pylist():
            info = parse_wav(blob)
            name = info["codec"]
            if name == "pcm":
                name = f"pcm{info['bits']}"
            pcm, rate = decode_wav(blob)
            codec.append(name)
            bits.append(info["bits"])
            n_samples.append(info["n_samples"])
            n_decoded.append(len(pcm))
            n_chunks.append(len(info["chunks"]))
            nbytes.append(len(blob))
            dur.append(info["n_samples"] * 1000.0 / rate)
        return pa.table(
            {
                "audio_id": batch["audio_id"],
                "codec": pa.array(codec, type=pa.string()),
                "bits": pa.array(bits, type=pa.int64()),
                "n_samples": pa.array(n_samples, type=pa.int64()),
                "n_decoded": pa.array(n_decoded, type=pa.int64()),
                "n_chunks": pa.array(n_chunks, type=pa.int64()),
                "container_bytes": pa.array(nbytes, type=pa.int64()),
                "duration_ms": pa.array(dur, type=pa.float64()),
            }
        )


def wav_meta(clips: Dataset, concurrency=(1, 4), batch_size: int = 64) -> Dataset:
    """Container-level WAV metadata via the real RIFF parser."""
    return clips.map_batches(
        WavMeta,
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )


class FlacMeta:
    """Actor-pool stage: full FLAC decode + STREAMINFO parse per clip.

    ``md5_ok`` is the real ``flac -t`` check — decoded PCM hashed and
    compared against the STREAMINFO MD5 — so any rice/predictor/CRC bug
    flips a hash-checked column.
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.flac import decode_flac

        cols = {k: [] for k in (
            "rate", "channels", "bps", "total_samples", "n_frames",
            "decoded_n", "md5_ok",
        )}
        for blob in batch["bytes"].to_pylist():
            pcm, rate, info = decode_flac(blob)
            cols["rate"].append(rate)
            cols["channels"].append(info["channels"])
            cols["bps"].append(info["bps"])
            cols["total_samples"].append(info["total_samples"])
            cols["n_frames"].append(info["n_frames"])
            cols["decoded_n"].append(len(pcm))
            cols["md5_ok"].append(bool(info["md5_ok"]))
        return pa.table(
            {
                "audio_id": batch["audio_id"],
                "rate": pa.array(cols["rate"], type=pa.int64()),
                "channels": pa.array(cols["channels"], type=pa.int64()),
                "bps": pa.array(cols["bps"], type=pa.int64()),
                "total_samples": pa.array(cols["total_samples"], type=pa.int64()),
                "n_frames": pa.array(cols["n_frames"], type=pa.int64()),
                "decoded_n": pa.array(cols["decoded_n"], type=pa.int64()),
                "md5_ok": pa.array(cols["md5_ok"], type=pa.bool_()),
            }
        )


class AdpcmMeta:
    """Actor-pool stage: IMA-ADPCM WAV parse + full decode per clip.

    ``recon_ok`` compares the decoded PCM's MD5 against the stream's
    ``md5 `` sidecar chunk (written by the encoder from its internal
    reconstruction) — any quantizer/step-table/nibble-order bug flips a
    hash-checked boolean even though the codec is lossy.
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib

        from ..functions.wav import decode_wav, parse_wav

        cols = {k: [] for k in (
            "codec", "bits", "block_align", "n_blocks", "n_samples",
            "n_decoded", "recon_ok", "container_bytes", "duration_ms",
        )}
        for blob in batch["bytes"].to_pylist():
            info = parse_wav(blob)
            pcm, rate = decode_wav(blob)
            digest = hashlib.md5(pcm.astype("<i2").tobytes()).digest()
            cols["codec"].append(info["codec"])
            cols["bits"].append(info["bits"])
            cols["block_align"].append(info["block_align"])
            cols["n_blocks"].append(info["data_size"] // info["block_align"])
            cols["n_samples"].append(info["n_samples"])
            cols["n_decoded"].append(len(pcm))
            cols["recon_ok"].append(digest == info.get("md5"))
            cols["container_bytes"].append(len(blob))
            cols["duration_ms"].append(len(pcm) * 1000.0 / rate)
        return pa.table(
            {
                "audio_id": batch["audio_id"],
                "codec": pa.array(cols["codec"], type=pa.string()),
                "bits": pa.array(cols["bits"], type=pa.int64()),
                "block_align": pa.array(cols["block_align"], type=pa.int64()),
                "n_blocks": pa.array(cols["n_blocks"], type=pa.int64()),
                "n_samples": pa.array(cols["n_samples"], type=pa.int64()),
                "n_decoded": pa.array(cols["n_decoded"], type=pa.int64()),
                "recon_ok": pa.array(cols["recon_ok"], type=pa.bool_()),
                "container_bytes": pa.array(cols["container_bytes"], type=pa.int64()),
                "duration_ms": pa.array(cols["duration_ms"], type=pa.float64()),
            }
        )


def adpcm_meta(clips: Dataset, concurrency=(1, 8), batch_size: int = 64) -> Dataset:
    """Per-clip IMA-ADPCM verification + metadata."""
    return clips.map_batches(
        AdpcmMeta,
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )


def flac_meta(clips: Dataset, concurrency=(1, 8), batch_size: int = 64) -> Dataset:
    """Per-clip FLAC stream verification + metadata."""
    return clips.map_batches(
        FlacMeta,
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )


def frame_energies(
    clips: Dataset,
    frame: int = 1024,
    hop: int = 512,
    concurrency=(1, 4),
    batch_size: int = 32,
) -> Dataset:
    """Short-time frame energies: one output row per (clip, frame).

    The audio twin of video frame sampling (stages/images.py
    FrameSampler): a flat expansion whose fan-out is ``n/hop`` rows per
    clip, computed with one strided-view power reduction per clip.
    """

    def _frames(batch: pa.Table) -> pa.Table:
        ids, idxs, energies = [], [], []
        for aid, blob, fmt in zip(
            batch["audio_id"].to_pylist(),
            batch["bytes"].to_pylist(),
            batch["fmt"].to_pylist(),
        ):
            pcm = decode_audio(blob, fmt).astype(np.float64)
            if len(pcm) < frame:
                continue
            n_frames = (len(pcm) - frame) // hop + 1
            view = np.lib.stride_tricks.as_strided(
                pcm,
                shape=(n_frames, frame),
                strides=(pcm.strides[0] * hop, pcm.strides[0]),
            )
            e = (view**2).mean(axis=1)
            ids.extend([aid] * n_frames)
            idxs.extend(range(n_frames))
            energies.extend(np.round(e, 4).tolist())
        return pa.table(
            {
                "audio_id": pa.array(ids, type=pa.string()),
                "frame_idx": pa.array(idxs, type=pa.int64()),
                "energy": pa.array(energies, type=pa.float64()),
            }
        )

    return clips.map_batches(
        _frames, batch_format="pyarrow", concurrency=concurrency, batch_size=batch_size
    )
