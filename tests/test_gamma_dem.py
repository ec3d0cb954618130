"""GAMMA DEM product assembly twins (reference gamma/dem.py +
gamma/auxil.py ISPPar/par2hdr)."""

import numpy as np
import pytest

from pyrosar_ray.functions.gamma_dem import (
    DEM_GEOIDS,
    dem_autocreate_plan,
    dem_import,
    fill,
    interp_ad,
    par_to_envi,
    parse_isp_par,
    swap,
    write_dem_par,
)


def test_dem_par_roundtrip():
    text = write_dem_par(
        width=3600, nlines=1800, corner_lat=52.0, corner_lon=11.0,
        post_lat=-8.333333e-4, post_lon=8.333333e-4,
    )
    par = parse_isp_par(text)
    assert par["filetype"] == "dem"
    assert par["width"] == 3600 and par["nlines"] == 1800
    # unit suffixes strip ISPPar-style ('52.0000000  decimal degrees')
    assert par["corner_lat"] == pytest.approx(52.0)
    assert par["post_lat"] == pytest.approx(-8.333333e-4)
    assert par["ellipsoid_ra"] == pytest.approx(6378137.0)
    assert par["DEM_projection"] == "EQA"
    assert par["data_format"] == "REAL*4"


def test_isp_par_value_grammar():
    """The ISPPar literal rules (gamma/auxil.py:120-143): float lists
    stop at the first non-float; '20.0970 dB' collapses to a scalar;
    whitespace-bearing strings stay strings."""
    text = "\n".join(
        [
            "Gamma Interferometric SAR Processor (ISP) - Image Parameter File",
            "sensor:    TSX-1",
            "title: a string with spaces",
            "calibration_gain:   20.0970 dB",
            "image_geometry: SLANT_RANGE",
            "map_coords:  52.0 11.0 0.0",
            "center_time:   55988.5  s",
            "empty_field:",
        ]
    )
    par = parse_isp_par(text)
    assert par["filetype"] == "isp"
    assert par["sensor"] == "TSX-1"
    assert par["title"] == "a string with spaces"
    assert par["calibration_gain"] == pytest.approx(20.097)
    assert par["map_coords"] == [52.0, 11.0, 0.0]
    assert par["center_time"] == pytest.approx(55988.5)
    with pytest.raises(RuntimeError, match="unknown parameter file type"):
        parse_isp_par("some other file\nsensor: X")


def test_par_to_envi_eqa_halfpixel_shift():
    par = parse_isp_par(
        write_dem_par(width=100, nlines=50, corner_lat=52.0, corner_lon=11.0,
                      post_lat=-0.01, post_lon=0.01)
    )
    envi = par_to_envi(par, nodata=0)
    assert envi["samples"] == 100 and envi["lines"] == 50
    assert envi["data_type"] == 4 and envi["byte_order"] == 1
    assert envi["data_ignore_value"] == 0
    mi = envi["map_info"]
    # GAMMA pixel-center → ENVI UL corner: NW half-pixel shift
    assert mi[0] == "Geographic Lat/Lon"
    assert mi[3] == pytest.approx(11.0 - 0.005)
    assert mi[4] == pytest.approx(52.0 + 0.005)
    with pytest.raises(TypeError, match="unsupported data type"):
        par_to_envi({"width": 1, "nlines": 1, "data_format": "REAL*8"})
    with pytest.raises(RuntimeError, match="unsupported projection"):
        par_to_envi({**par, "DEM_projection": "SCH"})


def test_par_to_envi_utm_hemisphere():
    par = {
        "width": 10, "nlines": 10, "data_format": "INTEGER*2",
        "DEM_projection": "UTM", "false_northing": 10000000.0,
        "corner_east": 500000.0, "corner_north": 4000000.0,
        "post_east": 90.0, "post_north": -90.0, "projection_zone": 33,
    }
    envi = par_to_envi(par)
    assert envi["map_info"][8] == "South"
    assert envi["data_type"] == 2
    par["false_northing"] = 0.0
    assert par_to_envi(par)["map_info"][8] == "North"


def test_interp_ad_fills_supported_voids_only():
    rng = np.random.RandomState(7)
    arr = rng.uniform(100.0, 200.0, size=(32, 32))
    arr[10:13, 10:13] = 0.0  # small void, densely supported
    out = interp_ad(arr, r_max=9, np_min=40, np_max=81, w_mode=2)
    assert (out[10:13, 10:13] != 0).all()
    assert out[10:13, 10:13].min() > 100.0 and out[10:13, 10:13].max() < 200.0
    # untouched pixels identical
    mask = arr != 0
    np.testing.assert_array_equal(out[mask], arr[mask])
    # an unsupported void (nearly empty raster) stays 0
    sparse = np.zeros((32, 32))
    sparse[0, 0] = 5.0
    assert (interp_ad(sparse)[1:, 1:] == 0).all()


def test_interp_ad_inverse_distance_golden():
    """4 equidistant valid neighbors → exact mean regardless of w_mode;
    asymmetric neighbors weight closer points higher under w_mode=2."""
    arr = np.full((9, 9), 100.0)
    arr[4, 4] = 0.0
    out = interp_ad(arr, np_min=4, np_max=81, w_mode=2)
    assert out[4, 4] == pytest.approx(100.0)
    arr2 = np.zeros((3, 5))
    arr2[1, 0] = 10.0   # d² = 4 from the gap at (1, 2)
    arr2[1, 4] = 10.0   # d² = 4
    arr2[0, 2] = 40.0   # d² = 1
    arr2[2, 2] = 40.0   # d² = 1
    out2 = interp_ad(arr2, r_max=2, np_min=4, np_max=4, w_mode=2)
    # (10/4 + 10/4 + 40 + 40) / (1/4 + 1/4 + 1 + 1) = 85/2.5 = 34
    assert out2[1, 2] == pytest.approx(34.0)
    with pytest.raises(ValueError):
        interp_ad(arr2, w_mode=3)


def test_fill_chain_semantics():
    """0 → 1 BEFORE void replacement (true zeros are data, not voids)."""
    dem = np.full((16, 16), 50.0)
    dem[3, 3] = 0.0        # sea level: preserved as 1
    dem[8, 8] = -32768.0   # SRTM void: interpolated
    out = fill(dem)
    assert out[3, 3] == 1.0
    assert out[8, 8] != 0.0 and 1.0 < out[8, 8] <= 50.0
    assert out[0, 0] == 50.0


def test_swap_validation():
    arr = np.arange(6, dtype=np.int16)
    swapped = swap(arr)
    assert swapped.dtype.byteorder == ">"
    np.testing.assert_array_equal(swapped.astype(np.int16), arr)
    with pytest.raises(IOError, match="not supported"):
        swap(np.arange(4, dtype=np.uint8))


def test_dem_import_gflg_semantics():
    from tests.test_geoid import planar_grid

    arr = np.array([[100.0, -32768.0], [200.0, 300.0]])
    gt = (10.0, 1.0, 0.0, 50.0, 0.0, -1.0)
    # gflg 0: NODATA → valid near-zero, heights untouched
    out0, par0 = dem_import(arr, gt, geoid=None)
    assert out0[0, 0] == 100.0
    assert 0 < out0[0, 1] < 1e-5
    assert par0["width"] == 2 and par0["nlines"] == 2
    # pixel-center registration: corner = UL corner + half pixel
    assert par0["corner_lat"] == pytest.approx(49.5)
    assert par0["corner_lon"] == pytest.approx(10.5)
    # gflg 2: offset added to heights; NODATA cells = the offset alone
    grid = planar_grid()
    out2, _ = dem_import(arr, gt, geoid="EGM96", geoid_grid=grid)
    n = grid.undulation(np.array([[49.5, 49.5], [48.5, 48.5]]),
                        np.array([[10.5, 11.5], [10.5, 11.5]]))
    assert out2[0, 0] == pytest.approx(100.0 + n[0, 0])
    assert out2[0, 1] == pytest.approx(n[0, 1])  # NODATA → offset alone
    assert out2[1, 1] == pytest.approx(300.0 + n[1, 1])


def test_dem_autocreate_plan_matrix():
    plan = dem_autocreate_plan("SRTM 3Sec", geoid_mode="gamma")
    assert plan["dem_import_geoid"] == "EGM96"
    assert plan["dem_create_geoid_convert"] is False
    plan = dem_autocreate_plan("Copernicus 30m Global DEM", geoid_mode="gdal")
    assert plan["dem_create_geoid_convert"] is True
    assert plan["dem_import_geoid"] is None
    assert plan["geoid"] == "EGM2008"
    # ellipsoidal DEMs convert nowhere
    plan = dem_autocreate_plan("TDX90m")
    assert plan["geoid"] is None and plan["dem_import_geoid"] is None
    assert DEM_GEOIDS["GETASSE30"] is None
    with pytest.raises(RuntimeError, match="tr needs to be defined"):
        dem_autocreate_plan("SRTM 3Sec", t_srs=32633)
    with pytest.raises(RuntimeError, match="'demType' is not supported"):
        dem_autocreate_plan("ASTER")
    with pytest.raises(RuntimeError, match="'geoid_mode' is not supported"):
        dem_autocreate_plan("SRTM 3Sec", geoid_mode="proj")
    assert dem_autocreate_plan("SRTM 3Sec", t_srs=32633, tr=(90, 90))["epsg"] == 32633
