"""build_vrt / vrt_check_sources: reference __buildvrt contract
(auxdata.py:532-604, 1716-1740) without GDAL."""

import os
import xml.etree.ElementTree as ET

import numpy as np
import pytest

from pyrosar_ray.functions.tiff import encode_geotiff
from pyrosar_ray.functions.vrt import build_vrt, tap_bounds, vrt_check_sources


def _tile(path, ulx, uly, value, n=10, res=0.1, nodata=-32768.0):
    data = np.full((1, n, n), value, dtype=np.float32)
    blob = encode_geotiff(data, ulx=ulx, uly=uly, xres=res, yres=res, nodata=nodata)
    with open(path, "wb") as fh:
        fh.write(blob)
    return path


@pytest.fixture()
def tiles(tmp_path):
    # two 1°x1°-style adjacent tiles on a 0.1° grid
    a = _tile(str(tmp_path / "a.tif"), ulx=10.0, uly=51.0, value=1.0)
    b = _tile(str(tmp_path / "b.tif"), ulx=11.0, uly=51.0, value=2.0)
    return tmp_path, [a, b]


def test_vrt_layout_and_rects(tiles):
    tmp_path, paths = tiles
    vrt = str(tmp_path / "mosaic.vrt")
    extent = {"xmin": 10.25, "ymin": 50.25, "xmax": 11.75, "ymax": 50.85}
    build_vrt(paths, vrt, extent, dst_nodata=0, hide_nodata=True)
    root = ET.parse(vrt).getroot()
    # TAP: bounds snap outward to the 0.1 grid
    gt = [float(v) for v in root.find("GeoTransform").text.split(",")]
    assert gt[0] == pytest.approx(10.2) and gt[3] == pytest.approx(50.9)
    assert gt[1] == pytest.approx(0.1) and gt[5] == pytest.approx(-0.1)
    assert root.get("rasterXSize") == "16" and root.get("rasterYSize") == "7"
    band = root.find("VRTRasterBand")
    assert band.get("dataType") == "Float32"
    assert band.find("NoDataValue").text == "0.0"
    assert band.find("HideNoDataValue").text == "1"
    sources = band.findall("ComplexSource")
    assert len(sources) == 2
    # tile a: crop starts 0.2° into the tile (col 2), VRT top is 50.9 so
    # the tile's row offset is (51.0-50.9)/0.1 = 1
    sa, sb = sources
    assert sa.find("SourceFilename").get("relativeToVRT") == "1"
    assert sa.find("SourceFilename").text == "a.tif"
    assert sa.find("SrcRect").attrib == {
        "xOff": "2", "yOff": "1", "xSize": "8", "ySize": "7"}
    assert sa.find("DstRect").attrib == {
        "xOff": "0", "yOff": "0", "xSize": "8", "ySize": "7"}
    # tile b starts at VRT column (11.0-10.2)/0.1 = 8
    assert sb.find("SrcRect").attrib == {
        "xOff": "0", "yOff": "1", "xSize": "8", "ySize": "7"}
    assert sb.find("DstRect").attrib == {
        "xOff": "8", "yOff": "0", "xSize": "8", "ySize": "7"}
    assert sa.find("NODATA").text == "-32768.0"


def test_dst_datatype_override_and_tile_drop(tiles):
    tmp_path, paths = tiles
    vrt = str(tmp_path / "m.vrt")
    # extent intersects only tile a; int16 override rewrites dataType
    build_vrt(paths, vrt, {"xmin": 10.1, "ymin": 50.2, "xmax": 10.9,
                           "ymax": 50.9}, dst_datatype="int16")
    root = ET.parse(vrt).getroot()
    assert root.find("VRTRasterBand").get("dataType") == "Int16"
    assert len(root.findall(".//ComplexSource")) == 1


def test_no_tap_keeps_bounds(tiles):
    tmp_path, paths = tiles
    vrt = str(tmp_path / "n.vrt")
    extent = {"xmin": 10.0, "ymin": 50.0, "xmax": 12.0, "ymax": 51.0}
    build_vrt(paths, vrt, extent, tap=False)
    gt = [float(v) for v in
          ET.parse(vrt).getroot().find("GeoTransform").text.split(",")]
    assert gt[0] == 10.0 and gt[3] == 51.0


def test_tap_bounds_outward():
    ext = tap_bounds({"xmin": 0.26, "ymin": -0.31, "xmax": 1.01, "ymax": 0.99}, 0.25, 0.25)
    assert ext == {"xmin": 0.25, "ymin": -0.5, "xmax": 1.25, "ymax": 1.0}


def test_check_sources(tiles):
    tmp_path, paths = tiles
    vrt = str(tmp_path / "c.vrt")
    extent = {"xmin": 10.0, "ymin": 50.0, "xmax": 12.0, "ymax": 51.0}
    build_vrt(paths, vrt, extent)
    vrt_check_sources(vrt)  # all present
    os.remove(paths[1])
    with pytest.raises(RuntimeError, match="missing VRT source file"):
        vrt_check_sources(vrt)
    # a None source text is a ValueError (reference parity)
    bad = str(tmp_path / "bad.vrt")
    with open(bad, "w") as fh:
        fh.write("<VRTDataset><VRTRasterBand><SimpleSource>"
                 "<SourceFilename></SourceFilename>"
                 "</SimpleSource></VRTRasterBand></VRTDataset>")
    with pytest.raises(ValueError):
        vrt_check_sources(bad)
    vrt_check_sources(str(tmp_path / "absent.vrt"))  # no-op like reference


def test_mosaic_vrt_over_sink_manifest(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data as rd

    from pyrosar_ray.stages.raster_sink import mosaic_vrt, write_rasters

    rows = []
    for i, name in enumerate(["N52E011", "N52E012"]):
        arr = np.full((4, 4), float(i), dtype=np.float32)
        rows.append(
            {"tile": name, "data": arr.tobytes(), "rows": 4, "cols": 4,
             "ulx": 11.0 + i, "uly": 52.0, "xres": 0.25, "yres": 0.25,
             "nodata": -32768.0}
        )
    out = str(tmp_path / "sink")
    manifest = write_rasters(
        rd.from_arrow(pa.Table.from_pylist(rows)), out, fmt="gtiff"
    )
    vrt = mosaic_vrt(
        manifest,
        str(tmp_path / "sink" / "mosaic.vrt"),
        {"xmin": 11.0, "ymin": 51.0, "xmax": 13.0, "ymax": 52.0},
    )
    vrt_check_sources(vrt)
    root = ET.parse(vrt).getroot()
    assert root.get("rasterXSize") == "8" and root.get("rasterYSize") == "4"
    assert len(root.findall(".//ComplexSource")) == 2
    # envi manifests are rejected
    manifest2 = write_rasters(
        rd.from_arrow(pa.Table.from_pylist(rows)), str(tmp_path / "envi")
    )
    with pytest.raises(ValueError, match="gtiff manifest"):
        mosaic_vrt(manifest2, str(tmp_path / "x.vrt"),
                   {"xmin": 11.0, "ymin": 51.0, "xmax": 13.0, "ymax": 52.0})
