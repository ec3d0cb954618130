"""ISO-BMFF container goldens (functions/mp4.py).

Reference surface: the container probe half of drivers.py
getFileObj/gdalinfo, here for the video rows of the multimodal table.
"""

import struct

import numpy as np
import pytest

from pyrosar_ray.functions.mp4 import (
    encode_mp4,
    extract_frames,
    iter_boxes,
    parse_mp4,
)


def _frames(n, size=100, key=7):
    return [bytes([(key * 31 + f) % 251]) * size for f in range(n)]


def test_roundtrip_short_last_chunk():
    frames = [bytes([(i * 37) % 251]) * (100 + 10 * i) for i in range(7)]
    blob = encode_mp4(frames, 24, 16, 30, samples_per_chunk=3)
    info = parse_mp4(blob)
    assert (info["brand"], info["codec"]) == ("isom", "raw ")
    assert (info["w"], info["h"]) == (24, 16)
    assert info["n_frames"] == 7
    assert info["n_chunks"] == 3  # 3+3+1: short last chunk, 2-entry stsc
    assert info["fps"] == 30
    assert info["duration_ms"] == 233.0  # floor(7000/30) at timescale 1000
    assert extract_frames(blob, range(7)) == frames


def test_even_chunks_and_sync_table():
    frames = _frames(6, 64)
    blob = encode_mp4(frames, 8, 8, 25, samples_per_chunk=3, sync_every=2)
    info = parse_mp4(blob)
    assert info["n_chunks"] == 2
    assert info["sync_samples"].tolist() == [1, 3, 5]
    assert extract_frames(blob, [0, 5]) == [frames[0], frames[5]]


def test_single_frame():
    blob = encode_mp4([b"xyz"], 4, 4, 10)
    info = parse_mp4(blob)
    assert info["n_frames"] == 1 and info["n_chunks"] == 1
    assert extract_frames(blob, [0]) == [b"xyz"]


def test_box_walker_largesize_and_to_eof():
    # hand-built: one largesize box + one size-0 (to EOF) box
    payload = b"ABCDEFGH"
    large = struct.pack(">I4sQ", 1, b"bigb", 16 + len(payload)) + payload
    tail = struct.pack(">I4s", 0, b"tail") + b"xy"
    boxes = list(iter_boxes(large + tail, 0, len(large + tail)))
    assert [b[0] for b in boxes] == [b"bigb", b"tail"]
    assert (large + tail)[boxes[0][1] : boxes[0][2]] == payload
    assert (large + tail)[boxes[1][1] : boxes[1][2]] == b"xy"


def test_rejects_garbage():
    with pytest.raises(ValueError):
        parse_mp4(b"\x00\x00\x00\x08free")  # no ftyp/moov
    blob = bytearray(encode_mp4([b"abc"], 4, 4, 10))
    blob[0:4] = (1 << 30).to_bytes(4, "big")  # absurd ftyp size
    with pytest.raises(ValueError):
        parse_mp4(bytes(blob))
    with pytest.raises(ValueError):
        encode_mp4([b"x"], 4, 4, 7)  # 7 does not divide 90000


def test_frame_sampler_mp4_branch(ray_session):
    import pyarrow as pa
    import ray.data

    from pyrosar_ray.stages.images import sample_frames

    frames = _frames(9, 144, key=3)
    blob = encode_mp4(frames, 8, 6, 30)
    vids = ray.data.from_arrow(
        pa.table(
            {
                "image_id": pa.array(["v1"], type=pa.string()),
                "bytes": pa.array([blob], type=pa.binary()),
                "w": pa.array([8], type=pa.int32()),
                "h": pa.array([6], type=pa.int32()),
                "fmt": pa.array(["mp4"], type=pa.string()),
                "caption": pa.array([""], type=pa.string()),
            }
        )
    )
    out = sample_frames(vids, step=2).to_pandas().sort_values("frame")
    assert out["frame"].tolist() == [0, 2, 4, 6, 8]
    assert [b for b in out["bytes"]] == [frames[f] for f in (0, 2, 4, 6, 8)]


def test_synth_mp4_contract():
    from pyrosar_ray.sources.images import synth_mp4

    for i in (0, 1, 2, 3, 6, 10, 25):
        info = parse_mp4(synth_mp4(i))
        n = 4 + i % 7
        assert info["n_frames"] == n
        assert info["n_chunks"] == (n + 2) // 3
        assert info["fps"] == (30, 25, 15, 10)[i % 4]
        assert info["w"] == 8 and info["h"] == 6
        first = extract_frames(synth_mp4(i), [0])[0]
        assert first == bytes([(i * 31) % 251]) * (8 * 6 * 3)
