"""ENVI/GAMMA raster sink: atomic writes, resume-skip, sidecar shape."""

import os

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from pyrosar_ray.stages.raster_sink import gamma_par, write_rasters


def _raster_ds(names, n=4):
    rows = []
    for i, name in enumerate(names):
        arr = np.full((n, n), float(i), dtype=np.float32)
        rows.append(
            {
                "tile": name,
                "data": arr.tobytes(),
                "rows": n,
                "cols": n,
                "ulx": 11.0 + i,
                "uly": 52.0,
                "xres": 0.25,
                "yres": 0.25,
                "nodata": -32768.0,
            }
        )
    return rd.from_arrow(pa.Table.from_pylist(rows))


def test_envi_sink_roundtrip(ray_session, tmp_path):
    out = str(tmp_path / "envi")
    manifest = write_rasters(_raster_ds(["N52E011", "N52E012"]), out).take_all()
    assert sorted(m["name"] for m in manifest) == ["N52E011", "N52E012"]
    assert all(not m["skipped"] for m in manifest)
    arr = np.fromfile(f"{out}/N52E012.img", dtype=np.float32).reshape(4, 4)
    assert (arr == 1.0).all()
    hdr = open(f"{out}/N52E012.hdr").read()
    assert "ENVI" in hdr and "samples = 4" in hdr and "data type = 4" in hdr
    assert "12.0" in hdr  # ulx in map info


def test_envi_sink_resume_skips(ray_session, tmp_path):
    out = str(tmp_path / "envi2")
    write_rasters(_raster_ds(["A"]), out).take_all()
    before = os.path.getmtime(f"{out}/A.img")
    manifest = write_rasters(_raster_ds(["A", "B"]), out).take_all()
    by_name = {m["name"]: m for m in manifest}
    assert by_name["A"]["skipped"] and not by_name["B"]["skipped"]
    assert os.path.getmtime(f"{out}/A.img") == before  # untouched


def test_gamma_sink_par(ray_session, tmp_path):
    out = str(tmp_path / "gamma")
    write_rasters(_raster_ds(["N52E011"]), out, fmt="gamma").take_all()
    assert os.path.exists(f"{out}/N52E011")
    par = open(f"{out}/N52E011.par").read()
    assert "DEM_projection: EQA" in par
    assert "width: 4" in par and "nlines: 4" in par
    assert "corner_lat: 52.0000000" in par
    assert "post_lat: -2.5000000e-01" in par
    assert "REAL*4" in par


def test_gamma_par_int16():
    par = gamma_par("t", 2, 3, 0.0, 1.0, 0.5, 0.5, dtype="int16")
    assert "INTEGER*2" in par


def test_sink_rejects_unknown_format(ray_session, tmp_path):
    with pytest.raises(ValueError):
        write_rasters(_raster_ds(["X"]), str(tmp_path), fmt="cog")
