"""Audio modality: synth source, PCM decode, features, frame energies."""

import numpy as np
import pytest
import ray

from pyrosar_ray.sources.audio import SAMPLE_RATE, decode_audio, synth_audio
from pyrosar_ray.stages.audio import audio_features, frame_energies


def test_synth_audio_deterministic_params():
    pcm = synth_audio(123)
    assert pcm.dtype == np.int16
    assert len(pcm) == 8000 + (123 % 37) * 160
    amp = 8000 + (123 % 7) * 1000
    assert np.abs(pcm.astype(np.int64)).max() <= amp
    assert np.array_equal(pcm, synth_audio(123))


def test_decode_roundtrip_and_codec_stub():
    pcm = synth_audio(5)
    assert np.array_equal(decode_audio(pcm.tobytes(), "pcm16"), pcm)
    with pytest.raises(NotImplementedError):
        decode_audio(b"\x00" * 16, "mp3")


def test_audio_features_closed_form():
    """A full-period sine: RMS ≈ amp/√2, ZCR = 2 crossings per period."""
    import pandas as pd

    rate = SAMPLE_RATE
    amp, freq, n = 10_000.0, 400.0, 16_000  # 400 Hz for exactly 400 periods
    t = np.arange(n, dtype=np.float64)
    pcm = np.round(amp * np.sin(2 * np.pi * freq * t / rate)).astype(np.int16)
    ds = ray.data.from_pandas(
        pd.DataFrame(
            {
                "audio_id": ["a"],
                "bytes": [pcm.tobytes()],
                "rate": [rate],
                "fmt": ["pcm16"],
            }
        )
    )
    out = audio_features(ds, concurrency=1).to_pandas().iloc[0]
    assert out["n_samples"] == n
    assert out["duration_ms"] == 1000.0
    assert abs(out["rms"] - amp / np.sqrt(2)) / amp < 0.01
    # 2 sign flips per period x 400 periods (quantization keeps it exact
    # here because samples at the zero crossings are nonzero-adjacent)
    assert abs(out["zcr"] - 2 * 400) <= 2
    assert out["peak"] <= amp


def test_frame_energies_fanout():
    import pandas as pd

    pcm = synth_audio(7)
    ds = ray.data.from_pandas(
        pd.DataFrame(
            {
                "audio_id": ["x"],
                "bytes": [pcm.tobytes()],
                "rate": [SAMPLE_RATE],
                "fmt": ["pcm16"],
            }
        )
    )
    out = frame_energies(ds, frame=1024, hop=512, concurrency=1).to_pandas()
    expect = (len(pcm) - 1024) // 512 + 1
    assert len(out) == expect
    assert out["frame_idx"].tolist() == list(range(expect))
    assert (out["energy"] >= 0).all()
    # matches a direct per-frame computation
    direct = np.round((pcm.astype(np.float64)[:1024] ** 2).mean(), 4)
    assert out["energy"].iloc[0] == direct


def test_audio_features_skip_policy(sf_dir):
    """on_error='skip': corrupt clips drop and count; default raises."""
    import pyarrow as pa
    import pytest as _pytest

    from pyrosar_ray.sources.audio import audio_from_documents
    from pyrosar_ray.stages.audio import audio_features
    from pyrosar_ray.state import metrics

    clips = audio_from_documents(sf_dir).limit(30)

    def _poison(batch: pa.Table) -> pa.Table:
        ids = batch["audio_id"].to_pylist()
        fmts = [
            "flac" if int(i.split("-")[-1]) % 6 == 0 else f
            for i, f in zip(ids, batch["fmt"].to_pylist())
        ]
        blobs = [
            b"fLaCgarbage" if int(i.split("-")[-1]) % 6 == 0 else b
            for i, b in zip(ids, batch["bytes"].to_pylist())
        ]
        return batch.set_column(
            batch.schema.get_field_index("bytes"), "bytes",
            pa.array(blobs, type=pa.binary()),
        ).set_column(
            batch.schema.get_field_index("fmt"), "fmt",
            pa.array(fmts, type=pa.string()),
        )

    poisoned = clips.map_batches(_poison, batch_format="pyarrow")
    metrics.reset()
    out = audio_features(poisoned, on_error="skip").to_pandas()
    n_bad = metrics.snapshot().get("audio_features/corrupt_rows", 0)
    assert n_bad >= 1 and len(out) == 30 - n_bad
    with _pytest.raises(Exception):
        audio_features(poisoned).to_pandas()
