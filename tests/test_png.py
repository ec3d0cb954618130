"""PNG codec + KMZ quicklook tests (pure-Python, no imaging library)."""

import zipfile
import zlib

import numpy as np
import pytest

from pyrosar_ray.functions.png import decode_png, encode_png


def _rand(shape, seed=0):
    return np.random.RandomState(seed).randint(0, 256, size=shape, dtype=np.uint16).astype(np.uint8)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("channels", [None, 1, 2, 3, 4])
def test_roundtrip_all_filters_and_colortypes(filter_type, channels):
    shape = (13, 17) if channels is None else (13, 17, channels)
    arr = _rand(shape, seed=filter_type * 10 + (channels or 0))
    out = decode_png(encode_png(arr, filter_type=filter_type))
    want = arr[:, :, 0] if channels == 1 else arr
    assert out.shape == want.shape
    assert np.array_equal(out, want)


def test_encode_deterministic():
    arr = _rand((32, 24, 3), seed=7)
    assert encode_png(arr) == encode_png(arr)


def test_decode_rejects_corruption():
    blob = bytearray(encode_png(_rand((8, 8, 3))))
    blob[40] ^= 0xFF  # flip a byte inside IDAT
    with pytest.raises((ValueError, zlib.error)):
        decode_png(bytes(blob))
    with pytest.raises(ValueError):
        decode_png(b"notapng" + bytes(16))


def test_decode_rejects_unsupported():
    import struct

    from pyrosar_ray.functions.png import _SIGNATURE, _chunk

    # 16-bit and Adam7 are now decoded; sub-byte depths and palette
    # color remain loud NotImplementedErrors
    ihdr4 = struct.pack(">IIBBBBB", 4, 4, 4, 0, 0, 0, 0)
    with pytest.raises(NotImplementedError):
        decode_png(_SIGNATURE + _chunk(b"IHDR", ihdr4))
    ihdr_pal = struct.pack(">IIBBBBB", 4, 4, 8, 3, 0, 0, 0)
    with pytest.raises(NotImplementedError):
        decode_png(_SIGNATURE + _chunk(b"IHDR", ihdr_pal))


def test_sub_filter_compresses_ramp():
    # a horizontal ramp is constant under Sub → compresses far better
    ramp = np.tile(np.arange(200, dtype=np.uint8), (50, 1))
    rgb = np.repeat(ramp[:, :, None], 3, axis=2)
    assert len(encode_png(rgb, filter_type=1)) < len(encode_png(rgb, filter_type=0)) / 4


def test_export_kmz_real_zip(tmp_path):
    from pyrosar_ray.functions.sar import export_kmz

    rgb = _rand((16, 16, 3), seed=3)
    rgb[0, :] = 0  # black row → transparent
    out = tmp_path / "scene.kmz"
    bbox = {"xmin": 11.0, "xmax": 12.0, "ymin": 51.0, "ymax": 52.0}
    export_kmz(rgb, str(out), name="S1A__IW___A_20150222T170750", bbox=bbox)
    with zipfile.ZipFile(out) as z:
        assert sorted(z.namelist()) == ["doc.kml", "quick-look.png"]
        kml = z.read("doc.kml").decode()
        assert "S1A__IW___A_20150222T170750" in kml and "<north>52.0</north>" in kml
        arr = decode_png(z.read("quick-look.png"))
    assert arr.shape == (16, 16, 4)
    assert (arr[0, :, 3] == 0).all()  # black row transparent
    assert (arr[1:, :, 3] == 255).all()
    assert np.array_equal(arr[1:, :, :3], rgb[1:])


def test_adam7_and_16bit_roundtrip_exhaustive():
    """Lossless identity across depth (8/16) x filter (0-4) x layout
    (plain/Adam7) x shapes incl. single-row/column and sub-8px images
    whose late Adam7 passes are empty."""
    rng = np.random.RandomState(9)
    for shape in [(1, 1), (7, 3), (8, 8), (9, 17, 3), (16, 5, 4), (2, 2, 2), (1, 13, 3)]:
        for dt in (np.uint8, np.uint16):
            hi = 256 if dt == np.uint8 else 65536
            arr = rng.randint(0, hi, shape).astype(dt)
            for ft in range(5):
                for il in (False, True):
                    out = decode_png(encode_png(arr, filter_type=ft, interlace=il))
                    assert out.dtype == arr.dtype and np.array_equal(out, arr), (
                        shape, dt, ft, il,
                    )


def test_adam7_matches_plain_layout():
    """Interlaced and sequential streams of one image decode identically
    (pixel permutation only — any pass-geometry bug breaks this)."""
    rng = np.random.RandomState(10)
    arr = rng.randint(0, 65536, (21, 34, 4)).astype(np.uint16)
    a = decode_png(encode_png(arr, interlace=True, filter_type=4))
    b = decode_png(encode_png(arr, filter_type=2))
    assert np.array_equal(a, b)
