"""GIF codec (functions/gif.py): LZW, interlace, animation, probes."""

import numpy as np
import pytest

from pyrosar_ray.functions.gif import (
    decode_gif,
    encode_gif,
    gif_frames,
    gif_info,
    lzw_decode,
    lzw_encode,
)


def _paletted(shape, ncolors, seed=0):
    rng = np.random.RandomState(seed)
    pal = rng.randint(0, 256, (ncolors, 3)).astype(np.uint8)
    return pal[rng.randint(0, ncolors, shape)]


def test_roundtrip_shapes_palettes_interlace():
    """Lossless identity across palette sizes (2..256), odd shapes and
    both scan layouts."""
    for seed, (shape, ncolors) in enumerate(
        [((8, 8), 2), ((17, 23), 7), ((30, 50), 256), ((1, 1), 1), ((5, 200), 100)]
    ):
        arr = _paletted(shape, ncolors, seed)
        for il in (False, True):
            blob = encode_gif(arr, interlace=il)
            assert blob[:6] == b"GIF89a"
            out = decode_gif(blob)
            assert np.array_equal(out, arr), (shape, ncolors, il)


def test_lzw_width_growth_and_reset():
    """Dictionary growth through every code width and past the 4096-entry
    clear-code reset survives the round trip."""
    idx = (np.arange(30000) % 5).tolist()  # long repeats → deep dictionary
    assert lzw_decode(lzw_encode(idx, 3), 3) == idx
    rng = np.random.RandomState(2)
    idx2 = rng.randint(0, 250, 20000).tolist()  # high entropy → fast growth
    assert lzw_decode(lzw_encode(idx2, 8), 8) == idx2


def test_lzw_hand_built_vectors():
    """Decoder pinned against hand-derived LZW streams (not the encoder):
    the KwKwK case and a plain literal run."""
    # min_code_size=2: clear=4, eoi=5, first dict code=6, width starts 3.
    # Stream: CLEAR, 1, 1 -> decodes 1,1 and builds code 6 = b"\x01\x01"
    # then 6 (KwKwK had we used it fresh) -> appends "\x01\x01"
    def bits(codes, widths):
        out = []
        for c, wd in zip(codes, widths):
            out.extend((c >> b) & 1 for b in range(wd))
        return np.packbits(
            np.array(out + [0] * (-len(out) % 8), dtype=np.uint8), bitorder="little"
        ).tobytes()

    data = bits([4, 1, 1, 6, 5], [3, 3, 3, 3, 3])
    assert lzw_decode(data, 2) == [1, 1, 1, 1]
    # true KwKwK: CLEAR, 2, then code 6 BEFORE it exists -> prev+prev[0]
    data2 = bits([4, 2, 6, 5], [3, 3, 3, 3])
    assert lzw_decode(data2, 2) == [2, 2, 2]
    # out-of-range code is a loud error (7 fits the 3-bit width but is
    # past the table, whose next free slot is 6)
    with pytest.raises(ValueError):
        lzw_decode(bits([4, 2, 7, 5], [3, 3, 3, 3]), 2)


def test_animation_frames_and_composition():
    """Multi-frame streams return full canvases per frame; the NETSCAPE
    loop block and graphic-control extensions parse."""
    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    rng = np.random.RandomState(3)
    f1 = pal[rng.randint(0, 4, (10, 12))]
    f2 = pal[rng.randint(0, 4, (10, 12))]
    blob = encode_gif([f1, f2], delay_cs=10)
    frames = gif_frames(blob)
    assert len(frames) == 2
    assert np.array_equal(frames[0], f1)
    assert np.array_equal(frames[1], f2)
    info = gif_info(blob)
    assert info["extra"]["frames"] == 2 and info["extra"]["palette"] == 4


def test_info_and_dispatch():
    """raster_info sniffs GIF; the stage-level decode_image dispatches."""
    from pyrosar_ray.functions.raster_info import raster_info
    from pyrosar_ray.stages.images import decode_image

    arr = _paletted((14, 9), 5, seed=4)
    blob = encode_gif(arr, interlace=True)
    info = raster_info(blob)
    assert (info["driver"], info["samples"], info["lines"]) == ("GIF", 9, 14)
    assert info["extra"]["interlaced"] is True
    assert np.array_equal(decode_image(blob, 9, 14, "gif"), arr)


def test_encoder_guards():
    rng = np.random.RandomState(5)
    with pytest.raises(ValueError):
        encode_gif(rng.randint(0, 256, (40, 40, 3)).astype(np.uint8))  # >256 colors
    with pytest.raises(ValueError):
        encode_gif([])
    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF")


def test_encode_deterministic():
    arr = _paletted((16, 16), 12, seed=6)
    assert encode_gif(arr) == encode_gif(arr)
    assert encode_gif(arr, interlace=True) == encode_gif(arr, interlace=True)


def test_frame_sampler_gif_container():
    """Animated GIF flows through the video frame-sampling stage: every
    step-th full canvas emits as a raw RGB frame row."""
    import pandas as pd
    import ray
    import ray.data as rd

    from pyrosar_ray.stages.images import FrameSampler

    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [9, 9, 9]], np.uint8)
    rng = np.random.RandomState(7)
    fr = [pal[rng.randint(0, 4, (6, 8))] for _ in range(5)]
    blob = encode_gif(fr)
    df = pd.DataFrame(
        [{"image_id": "vid-0", "bytes": blob, "w": 8, "h": 6, "fmt": "gif",
          "caption": "anim"}]
    )
    out = (
        rd.from_pandas(df)
        .map_batches(FrameSampler, batch_format="pyarrow", concurrency=1,
                     fn_constructor_kwargs={"step": 2})
        .to_pandas()
        .sort_values("frame", ignore_index=True)
    )
    assert out["frame"].tolist() == [0, 2, 4]
    for _, row in out.iterrows():
        got = np.frombuffer(row["bytes"], np.uint8).reshape(6, 8, 3)
        assert np.array_equal(got, fr[row["frame"]])
