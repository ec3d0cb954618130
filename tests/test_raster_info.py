"""gdalinfo-parity raster probe (functions/raster_info.py)."""

import numpy as np
import pandas as pd
import pytest
import ray

from pyrosar_ray.functions.png import encode_png
from pyrosar_ray.functions.raster_info import (
    envi_info,
    parse_literal,
    png_info,
    raster_info,
    tiff_info,
)
from pyrosar_ray.functions.sar import envi_hdr
from pyrosar_ray.functions.tiff import encode_geotiff


def _tif(dtype="float32", bands=2):
    data = np.arange(bands * 20 * 30, dtype=dtype).reshape(bands, 20, 30)
    return encode_geotiff(
        data,
        ulx=11.0,
        uly=52.0,
        xres=0.01,
        yres=0.02,
        nodata=-99.0,
        band_names=["VV", "VH"][:bands],
        tile=16,
    )


def test_tiff_info_roundtrip():
    info = tiff_info(_tif())
    assert (info["samples"], info["lines"], info["bands"]) == (30, 20, 2)
    assert info["dtype"] == "float32"
    assert info["projection"] == "EPSG:4326"
    assert info["geotransform"] == (11.0, 0.01, 0.0, 52.0, 0.0, -0.02)
    assert info["nodata"] == -99.0
    assert info["band_names"] == ["VV", "VH"]
    assert info["driver"] == "GTiff"


def test_png_info():
    arr = np.zeros((7, 9, 3), dtype=np.uint8)
    info = png_info(encode_png(arr))
    assert (info["samples"], info["lines"], info["bands"]) == (9, 7, 3)
    assert info["dtype"] == "uint8"
    assert info["projection"] is None and info["geotransform"] is None


def test_envi_info():
    hdr = envi_hdr(samples=120, lines=60, ulx=10.0, uly=51.0, step=0.5, dtype=2)
    info = envi_info(hdr)
    assert (info["samples"], info["lines"], info["bands"]) == (120, 60, 1)
    assert info["dtype"] == "int16"
    assert info["geotransform"] == (10.0, 0.5, 0.0, 51.0, 0.0, -0.5)
    assert "WGS 84" in info["projection"]


def test_raster_info_dispatch():
    assert raster_info(_tif())["driver"] == "GTiff"
    assert raster_info(encode_png(np.zeros((2, 2), dtype=np.uint8)))["driver"] == "PNG"
    hdr = envi_hdr(samples=2, lines=2, ulx=0, uly=0, step=1.0)
    assert raster_info(hdr.encode())["driver"] == "ENVI"
    assert raster_info(hdr_text=hdr)["driver"] == "ENVI"
    with pytest.raises(ValueError):
        raster_info(b"\x00\x01\x02\x03garbage")


def test_extra_metadata_udeg_scaling():
    """drivers.py:474-476 — LAT/LONG metadata items scale by 1e-6."""
    from pyrosar_ray.functions.raster_info import _normalize_extra

    out = _normalize_extra(
        {"FIRST_NEAR_LAT": "50295261", "ORBIT": "117", "MISSION": "ERS1",
         "PROC_TIME": "2015-12-12T23:44:11.000"}
    )
    assert out["FIRST_NEAR_LAT"] == 50.295261
    assert out["ORBIT"] == 117
    assert out["MISSION"] == "ERS1"
    assert out["PROC_TIME"] == "20151212T234411"


def test_parse_literal():
    assert parse_literal("42") == 42
    assert parse_literal("4.5") == 4.5
    assert parse_literal("x1") == "x1"


def test_raster_info_columns_stage():
    from pyrosar_ray.stages.images import raster_info_columns

    blobs = [_tif(), encode_png(np.zeros((4, 5), dtype=np.uint8))]
    ds = ray.data.from_pandas(
        pd.DataFrame({"image_id": ["a", "b"], "blob": blobs})
    )
    out = raster_info_columns(ds).to_pandas().sort_values("image_id")
    assert out["driver"].tolist() == ["GTiff", "PNG"]
    assert out["samples"].tolist() == [30, 5]
    assert out["lines"].tolist() == [20, 4]
    row = out.iloc[0]
    assert row["ulx"] == 11.0 and row["yres"] == 0.02 and row["nodata"] == -99.0
    assert np.isnan(out.iloc[1]["ulx"]) and np.isnan(out.iloc[1]["nodata"])


def test_jpeg_probe_header_only():
    """raster_info sniffs JPEG blobs: size/bands/precision plus the
    progressive flag, without entropy decode."""
    import numpy as np

    from pyrosar_ray.functions.jpeg import encode_jpeg, encode_jpeg_progressive
    from pyrosar_ray.functions.raster_info import raster_info

    arr = np.random.RandomState(0).randint(0, 256, (24, 40, 3)).astype(np.uint8)
    info = raster_info(encode_jpeg(arr, quality=80))
    assert (info["driver"], info["samples"], info["lines"], info["bands"]) == (
        "JPEG", 40, 24, 3,
    )
    assert info["dtype"] == "uint8" and info["extra"]["progressive"] is False
    pinfo = raster_info(encode_jpeg_progressive(arr[:, :, 0], quality=80))
    assert (pinfo["bands"], pinfo["extra"]["progressive"]) == (1, True)
    import pytest

    with pytest.raises(ValueError):
        raster_info(b"\xff\xd8\xff\xd9")  # SOI+EOI, no frame
