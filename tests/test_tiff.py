"""Tiled GeoTIFF codec + snap.writer product-export tests."""

import os

import numpy as np
import pytest

from pyrosar_ray.functions.names import writer_band_name, writer_nodata
from pyrosar_ray.functions.tiff import decode_geotiff, encode_geotiff


@pytest.mark.parametrize("dtype", ["uint8", "int16", "float32", "float64"])
def test_roundtrip_dtypes(dtype):
    rng = np.random.RandomState(3)
    arr = (rng.uniform(-100, 100, size=(37, 61)) if dtype.startswith("float")
           else rng.randint(0, 100, size=(37, 61))).astype(dtype)
    blob = encode_geotiff(arr, ulx=11.0, uly=52.0, xres=0.01, yres=0.01,
                          nodata=-32768, tile=16)
    out = decode_geotiff(blob)
    assert out["data"].shape == (1, 37, 61)
    assert np.array_equal(out["data"][0], arr)
    assert out["data"].dtype == arr.dtype
    assert (out["ulx"], out["uly"]) == (11.0, 52.0)
    assert (out["xres"], out["yres"]) == (0.01, 0.01)
    assert out["nodata"] == -32768.0


def test_multiband_planar_with_names():
    rng = np.random.RandomState(5)
    arr = rng.uniform(0, 1, size=(3, 40, 33)).astype(np.float32)
    blob = encode_geotiff(arr, ulx=0.0, uly=1.0, xres=0.5, yres=0.25,
                          band_names=["VV_gamma0-rtc", "VH_gamma0-rtc", "DEM"],
                          tile=32)
    out = decode_geotiff(blob)
    assert np.array_equal(out["data"], arr)
    assert out["band_names"] == ["VV_gamma0-rtc", "VH_gamma0-rtc", "DEM"]
    assert out["nodata"] is None


def test_uncompressed_and_exact_tile_fit():
    arr = np.arange(64 * 64, dtype=np.int32).reshape(64, 64)
    blob = encode_geotiff(arr, ulx=0, uly=0, xres=1, yres=1, tile=32,
                          compress=False)
    assert np.array_equal(decode_geotiff(blob)["data"][0], arr)


def test_deflate_compresses_smooth_data():
    arr = np.zeros((256, 256), dtype=np.float32)
    small = encode_geotiff(arr, ulx=0, uly=0, xres=1, yres=1)
    big = encode_geotiff(arr, ulx=0, uly=0, xres=1, yres=1, compress=False)
    assert len(small) < len(big) / 20


def test_writer_band_name_grammar():
    # backscatter rules (snap/auxil.py:499-515)
    assert writer_band_name("Gamma0_VV") == "VV_gamma0-elp"
    assert writer_band_name("Gamma0_VV", rtc=True) == "VV_gamma0-rtc"
    assert writer_band_name("Sigma0_HH", rtc=True) == "HH_sigma0-elp"
    assert writer_band_name("Sigma0_HH", rtc=True, sigma0_rtc=True) == "HH_sigma0-rtc"
    assert writer_band_name("Gamma0_VH", db=True) == "VH_gamma0-elp_db"
    # laundering rules (snap/auxil.py:516-525)
    assert writer_band_name("elevation") == "DEM"
    assert writer_band_name("scatteringArea_VV") == "scatteringArea"
    assert writer_band_name("gammaSigmaRatio_HH") == "gammaSigmaRatio"
    assert writer_band_name("NESZ_VH") == "VH_NESZ"
    assert writer_band_name("layover_shadow_mask_VV") == "layoverShadowMask"


def test_writer_nodata_policy():
    assert writer_nodata("DEM") == -32768.0
    assert writer_nodata("DEM", dem_nodata=-9999.0) == -9999.0
    assert writer_nodata("layoverShadowMask") == 255.0
    assert writer_nodata("VV_gamma0-rtc") == 0.0


def test_write_products_stage(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data

    rng = np.random.RandomState(11)
    src_base = "S1A__IW___A_20150222T170750_mli_geo_norm"
    rows_in = []
    for band in ["Gamma0_VV", "Gamma0_VH", "elevation", "layover_shadow_mask_VV"]:
        data = rng.uniform(0, 2, size=(20, 30)).astype(np.float32)
        rows_in.append(
            {
                "src_base": src_base,
                "band": band,
                "data": data.tobytes(),
                "rows": 20,
                "cols": 30,
                "ulx": 11.0,
                "uly": 52.0,
                "xres": 0.001,
                "yres": 0.001,
            }
        )
    from pyrosar_ray.stages.raster_sink import write_products

    ds = ray.data.from_arrow(pa.Table.from_pylist(rows_in))
    out = write_products(ds, str(tmp_path), suffix="mli_geo_norm", rtc=True)
    manifest = out.to_pandas().sort_values("band").reset_index(drop=True)
    assert not manifest["skipped"].any()
    names = sorted(os.path.basename(p) for p in manifest["path"])
    assert names == [
        f"{src_base.replace('mli_geo_norm', t)}.tif"
        for t in sorted(["VV_gamma0-rtc", "VH_gamma0-rtc", "DEM", "layoverShadowMask"])
    ]
    # round-trip one product and check nodata policy took
    dem_path = [p for p in manifest["path"] if "DEM" in p][0]
    got = decode_geotiff(open(dem_path, "rb").read())
    assert got["nodata"] == -32768.0
    assert got["band_names"] == ["DEM"]
    want = np.frombuffer(rows_in[2]["data"], dtype=np.float32).reshape(20, 30)
    assert np.array_equal(got["data"][0], want)
    # idempotent: a second run skips every file
    again = write_products(ds, str(tmp_path), suffix="mli_geo_norm", rtc=True)
    assert again.to_pandas()["skipped"].all()


def test_write_rasters_gtiff(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data

    data = np.linspace(0, 1, 12 * 8).astype(np.float32)
    ds = ray.data.from_arrow(
        pa.Table.from_pylist(
            [
                {
                    "tile": "N51E011",
                    "data": data.tobytes(),
                    "rows": 12,
                    "cols": 8,
                    "ulx": 11.0,
                    "uly": 52.0,
                    "xres": 0.125,
                    "yres": 0.0833,
                    "nodata": -32768.0,
                }
            ]
        )
    )
    from pyrosar_ray.stages.raster_sink import write_rasters

    manifest = write_rasters(ds, str(tmp_path), fmt="gtiff").to_pandas()
    assert manifest["path"][0].endswith("N51E011.tif")
    got = decode_geotiff(open(manifest["path"][0], "rb").read())
    assert np.array_equal(got["data"][0], data.reshape(12, 8))
    assert got["nodata"] == -32768.0


def test_decode_image_dispatches_tiff():
    """uint8 multi-band GeoTIFF rows decode through the image stage."""
    import numpy as np

    from pyrosar_ray.functions.tiff import encode_geotiff
    from pyrosar_ray.stages.images import decode_image

    rng = np.random.RandomState(8)
    arr = rng.randint(0, 256, (3, 12, 20)).astype(np.uint8)  # (bands, h, w)
    blob = encode_geotiff(arr, ulx=0.0, uly=0.0, xres=1.0, yres=1.0)
    out = decode_image(blob, 20, 12, "tiff")
    assert out.shape == (12, 20, 3)
    assert np.array_equal(out, np.moveaxis(arr, 0, 2))
    # single-band float32 rasters clip + replicate to RGB
    f = (rng.rand(6, 7) * 300).astype(np.float32)
    blob2 = encode_geotiff(f[None], ulx=0.0, uly=0.0, xres=1.0, yres=1.0)
    out2 = decode_image(blob2, 7, 6, "tif")
    assert out2.shape == (6, 7, 3)
    assert np.array_equal(out2[:, :, 0], np.clip(f, 0, 255).astype(np.uint8))
