"""SAR physics + ERS pass lookup kernels (pure python, Ray-free)."""

from datetime import datetime

import numpy as np
import pytest

from pyrosar_ray.functions.sar import (
    ERS1_CUTOVER,
    RESOLUTION_STD_DEV,
    PassTable,
    create_dummy_dem,
    envi_hdr,
    get_resolution_nesz,
    irw_broadening,
    rgba_quicklook,
    s1_resolution,
)


def test_resolution_nesz_goldens():
    # reference ERS/mapping.py table values (drivers.py:1795-1801 consumer)
    assert get_resolution_nesz("ERS1", "IMP", "IS2", "19950101") == (
        25.04, 21.51, 26.8, 26)
    assert get_resolution_nesz("ERS2", "IMS", "IS2", "20000101") == (
        5.33, 9.83, 23.1, 21.5)
    assert get_resolution_nesz("ASAR", "IMP", "IS7", "20050101") == (
        26.59, 22.14, 23, 20.4)
    # IMS range resolution is swath-independent; NESZ is per swath
    assert get_resolution_nesz("ASAR", "IMS", "IS1", "20050101") == (
        5.77, 8.43, 25.1, 19.2)
    assert get_resolution_nesz("ASAR", "APS", "IS5", "20050101") == (
        4.3, 8.39, 21.4, 19)
    # wide-swath modes override NESZ and drop swath granularity
    assert get_resolution_nesz("ASAR", "WSM", "WS", "20050101") == (
        150, 150, 19.5, 23.5)
    assert get_resolution_nesz("ASAR", "WSS", "WS", "20050101") == (
        None, None, None, None)


def test_resolution_nesz_app_cutover():
    # APP range resolution switches on the 2009-05-28 processor update;
    # the reference compares the raw date STRING, so a timestamped stamp
    # on the cutover day already selects the new value (kept bug-for-bug)
    assert get_resolution_nesz("ASAR", "APP", "IS2", "20090528")[0] == 25.23
    assert get_resolution_nesz("ASAR", "APP", "IS2", "20090529")[0] == 24.10
    assert get_resolution_nesz("ASAR", "APP", "IS2", "20090528T120000")[0] == 24.10
    # IS1 published identical figures either side of the cutover
    assert get_resolution_nesz("ASAR", "APP", "IS1", "20120101")[0] == 31.22


def test_resolution_nesz_raises_like_reference():
    # the reference's nested-dict lookup raises KeyError on unknown combos
    with pytest.raises(KeyError):
        get_resolution_nesz("ERS1", "IMP", "IS3", "19950101")
    with pytest.raises(KeyError):
        get_resolution_nesz("ERS1", "APP", "IS2", "19950101")
    with pytest.raises(KeyError):
        get_resolution_nesz("ASAR", "IMP", "WS", "20050101")
    with pytest.raises(KeyError):
        get_resolution_nesz("RS2", "IMP", "IS2", "20050101")
    assert RESOLUTION_STD_DEV[("ASAR", "APP")] == 10
    assert RESOLUTION_STD_DEV[("ASAR", "WSS")] is None


def test_irw_broadening_table():
    assert irw_broadening(0.52) == 1.54
    assert irw_broadening(0.75) == 1.13
    with pytest.raises(ValueError):
        irw_broadening(0.99)


def test_s1_resolution_slant_vs_ground():
    swath = {
        "wrg": 0.52, "brg": 56.5e6, "lbrg": 56.5e6,
        "waz": 0.52, "baz": 327.0, "lbaz": 327.0,
        "sp_az": 13.9, "ti_az": 2.05e-3,
    }
    rg, az = s1_resolution([swath])
    # IW SLC ballpark: ~3.6 m slant range, ~22 m azimuth
    assert 3.0 < rg < 4.5
    assert 15.0 < az < 30.0
    rg_g, _ = s1_resolution([swath], image_geometry="GROUND_RANGE", incidence=39.0)
    assert rg_g == pytest.approx(rg / np.sin(np.radians(39.0)))


def _table():
    return PassTable(
        [
            ("ERS1", datetime(1995, 1, 1), datetime(1995, 6, 30), "C", 10, 7),
            ("ERS2", datetime(1995, 1, 1), datetime(1999, 12, 31), "A", 20, 42),
        ]
    )


def test_passdb_direct_hit():
    res = _table().lookup("ERS1", datetime(1995, 3, 1))
    assert res == {
        "satellite": "ERS1",
        "phase": "C",
        "cycleNumber": 10,
        "passNumber": 7,
        "orbitNumber_rel": 4,  # ceil(7/2)
    }


def test_passdb_cutover_substitution():
    # after the 1996-06-02 cutover ERS1 queries use the ERS2 table but
    # report the requested satellite name
    res = _table().lookup("ERS1", datetime(1997, 1, 1))
    assert res["satellite"] == "ERS1" and res["passNumber"] == 42
    assert ERS1_CUTOVER.year == 1996


def test_passdb_fallback_and_invalid():
    # ERS1 window miss before cutover → ERS2 fallback (reference retry)
    res = _table().lookup("ERS1", datetime(1995, 8, 1))
    assert res["passNumber"] == 42
    with pytest.raises(ValueError):
        _table().lookup("ERS3", datetime(1995, 1, 1))


def test_rgba_quicklook():
    rgb = np.zeros((2, 2, 3), dtype=np.uint8)
    rgb[0, 0] = (10, 20, 30)
    rgba = rgba_quicklook(rgb)
    assert rgba.shape == (2, 2, 4)
    assert rgba[0, 0, 3] == 255 and rgba[1, 1, 3] == 0


def test_dummy_dem_and_envi_hdr():
    dem = create_dummy_dem({"xmin": 10, "xmax": 12, "ymin": 50, "ymax": 53})
    assert dem["data"].shape == (1, 1) and dem["data"].sum() == 0
    assert dem["geotransform"] == (10.0, 2.0, 0.0, 53.0, 0.0, -3.0)
    hdr = envi_hdr(3600, 3600, 11.0, 52.0, 1 / 3600)
    assert "samples = 3600" in hdr and "ENVI" in hdr.splitlines()[0]


def test_aux_sentinel_urls_golden():
    import pytest

    from pyrosar_ray.functions.osv import aux_sentinel_urls

    urls = aux_sentinel_urls("2021-01-30T10:00:00", "2021-02-02T05:00:00")
    assert urls == [
        "http://aux.sentinel1.eo.esa.int/POEORB/2021/01/30/",
        "http://aux.sentinel1.eo.esa.int/POEORB/2021/01/31/",
        "http://aux.sentinel1.eo.esa.int/POEORB/2021/02/01/",
        "http://aux.sentinel1.eo.esa.int/POEORB/2021/02/02/",
    ]
    assert aux_sentinel_urls("2021-01-30", "2021-01-30", "RES")[0].startswith(
        "http://aux.sentinel1.eo.esa.int/RESORB/"
    )
    with pytest.raises(IOError):
        aux_sentinel_urls("2021-01-30", "2021-01-31", "FOO")


def test_step_auxdata_urls_golden():
    import pytest

    from pyrosar_ray.functions.osv import step_auxdata_urls

    urls = step_auxdata_urls("S1A", "2021-01-15", "2021-02-10")
    # one month before the start month through the stop month
    assert urls == [
        "https://step.esa.int/auxdata/orbits/Sentinel-1/POEORB/S1A/2020/12/",
        "https://step.esa.int/auxdata/orbits/Sentinel-1/POEORB/S1A/2021/01/",
        "https://step.esa.int/auxdata/orbits/Sentinel-1/POEORB/S1A/2021/02/",
    ]
    both = step_auxdata_urls(["S1A", "S1B"], "2021-01-15", "2021-01-20", "RES")
    assert len(both) == 4 and both[2].endswith("RESORB/S1B/2020/12/")
    with pytest.raises(RuntimeError):
        step_auxdata_urls("S1A", "2021-01-15", "2021-02-10", "FOO")


def test_envi_reader_roundtrip():
    import numpy as np

    from pyrosar_ray.functions.sar import envi_hdr, parse_envi_hdr, read_envi

    arr = np.arange(20, dtype=">i2").reshape(4, 5)
    hdr = envi_hdr(5, 4, 10.0, 50.0, 0.1)
    h = parse_envi_hdr(hdr)
    assert h["samples"] == "5" and h["lines"] == "4"
    assert h["map info"].startswith("Geographic Lat/Lon")
    out = read_envi(arr.tobytes(), hdr)
    assert (out == arr.astype("i2")).all()
    # little-endian float path
    f = np.linspace(0, 1, 6, dtype="<f4").reshape(2, 3)
    hdr_f = envi_hdr(3, 2, 0.0, 0.0, 1.0, dtype=4, byte_order=0)
    assert np.allclose(read_envi(f.tobytes(), hdr_f), f)
    # multi-band refused
    import pytest

    with pytest.raises(ValueError, match="single-band"):
        read_envi(b"", hdr_f.replace("bands = 1", "bands = 2"))
