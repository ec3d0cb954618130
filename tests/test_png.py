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

    # every legal IHDR decodes now; illegal combinations stay loud
    ihdr_rgb4 = struct.pack(">IIBBBBB", 4, 4, 4, 2, 0, 0, 0)  # sub-byte RGB: illegal
    with pytest.raises(NotImplementedError):
        decode_png(_SIGNATURE + _chunk(b"IHDR", ihdr_rgb4))
    ihdr_ct5 = struct.pack(">IIBBBBB", 4, 4, 8, 5, 0, 0, 0)  # color type 5: illegal
    with pytest.raises(NotImplementedError):
        decode_png(_SIGNATURE + _chunk(b"IHDR", ihdr_ct5))
    ihdr_pal = struct.pack(">IIBBBBB", 4, 4, 8, 3, 0, 0, 0)  # palette sans PLTE
    with pytest.raises(ValueError):
        decode_png(_SIGNATURE + _chunk(b"IHDR", ihdr_pal) + _chunk(b"IDAT", b"") + _chunk(b"IEND", b""))


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


def _hand_png(w, h, depth, ctype, rows_payload, extra_chunks=(), interlace=0):
    """Assemble a PNG from hand-built (already filtered) scanline bytes."""
    import struct
    import zlib

    from pyrosar_ray.functions.png import _SIGNATURE, _chunk

    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    out = _SIGNATURE + _chunk(b"IHDR", ihdr)
    for tag, payload in extra_chunks:
        out += _chunk(tag, payload)
    out += _chunk(b"IDAT", zlib.compress(rows_payload)) + _chunk(b"IEND", b"")
    return out


def test_palette_decode_with_and_without_trns():
    """Hand-built 4-bit palette image: indices pack MSB-first two per
    byte; PLTE lookup yields RGB, tRNS extends to RGBA."""
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 7, 8, 9])  # 4 entries
    # 3x2 image, indices: row0 = 0,1,2  row1 = 3,0,1 (pad nibble = 0)
    rows = bytes([0, 0x01, 0x20]) + bytes([0, 0x30, 0x10])
    blob = _hand_png(3, 2, 4, 3, rows, [(b"PLTE", plte)])
    out = decode_png(blob)
    assert out.shape == (2, 3, 3)
    assert out[0].tolist() == [[255, 0, 0], [0, 255, 0], [0, 0, 255]]
    assert out[1].tolist() == [[7, 8, 9], [255, 0, 0], [0, 255, 0]]
    # with tRNS: entry 0 transparent, others default opaque
    blob_a = _hand_png(3, 2, 4, 3, rows, [(b"PLTE", plte), (b"tRNS", bytes([0]))])
    out_a = decode_png(blob_a)
    assert out_a.shape == (2, 3, 4)
    assert out_a[0, 0, 3] == 0 and out_a[0, 1, 3] == 255
    assert np.array_equal(out_a[:, :, :3], out)
    # out-of-range index is a loud error
    bad = _hand_png(3, 2, 4, 3, bytes([0, 0xF1, 0x20, 0, 0x30, 0x10]), [(b"PLTE", plte)])
    with pytest.raises(ValueError):
        decode_png(bad)


def test_subbyte_greyscale_scales_to_8bit():
    """1-bit greyscale: bits unpack MSB-first, 1 → 255; Sub filter on
    the byte stream still applies."""
    # 10x2: row0 = 1010101010 (0xAA, 0x80), row1 = all ones (0xFF, 0xC0)
    rows = bytes([0, 0xAA, 0x80]) + bytes([0, 0xFF, 0xC0])
    out = decode_png(_hand_png(10, 2, 1, 0, rows))
    assert out.shape == (2, 10)
    assert out[0].tolist() == [255, 0] * 5
    assert (out[1] == 255).all()
    # 2-bit: values 0..3 scale to 0/85/170/255
    rows2 = bytes([0, 0b00011011])  # 4px: 0,1,2,3
    out2 = decode_png(_hand_png(4, 1, 2, 0, rows2))
    assert out2.tolist() == [[0, 85, 170, 255]]


def test_palette_adam7_interleave():
    """8-bit palette + Adam7: pass geometry must hold for indexed rows."""
    import zlib

    from pyrosar_ray.functions.png import _ADAM7

    rng = np.random.RandomState(4)
    w, h = 9, 6
    idx = rng.randint(0, 4, (h, w)).astype(np.uint8)
    parts = []
    for x0, y0, dx, dy in _ADAM7:
        sub = idx[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for r in sub:
            parts.append(bytes([0]) + r.tobytes())
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 7, 8, 9])
    blob = _hand_png(w, h, 8, 3, b"".join(parts), [(b"PLTE", plte)], interlace=1)
    out = decode_png(blob)
    lut = np.frombuffer(plte, np.uint8).reshape(-1, 3)
    assert np.array_equal(out, lut[idx])
