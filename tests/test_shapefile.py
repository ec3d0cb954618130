"""Pure-Python shapefile writer: structure, round-trip, laundering."""

import struct

import pandas as pd
import pytest

from pyrosar_ray.catalog.shapefile import (
    LAUNDER_NAMES,
    read_shapefile,
    write_shapefile,
)


@pytest.fixture
def catalog_df():
    return pd.DataFrame(
        {
            "scene": ["/d/a.zip", "/d/b.zip"],
            "sensor": ["S1A", "PSR2"],
            "acquisition_mode": ["IW", "FBD"],
            "orbitNumber_abs": [4703, 4521],
            "cycleNumber": [29, 22],
            "incidence": [39.1, 32.4],
            "xmin": [8.0, -62.9],
            "ymin": [50.2, -11.4],
            "xmax": [12.0, -62.1],
            "ymax": [52.2, -10.6],
        }
    )


def test_shapefile_roundtrip(tmp_path, catalog_df):
    path = write_shapefile(catalog_df, str(tmp_path / "cat"))
    assert path.endswith(".shp")
    back = read_shapefile(path)
    assert len(back) == 2
    assert back["xmin"].tolist() == [8.0, -62.9]
    assert back["ymax"].tolist() == [52.2, -10.6]
    # laundered DBF names, 10-char limit
    assert "acq_mode" in back.columns
    assert "orbit_abs" in back.columns
    assert "cycleNr" in back.columns
    assert back["acq_mode"].tolist() == ["IW", "FBD"]
    assert back["orbit_abs"].tolist() == [4703, 4521]
    assert back["incidence"].iloc[0] == pytest.approx(39.1)
    assert back["sensor"].tolist() == ["S1A", "PSR2"]


def test_shapefile_binary_structure(tmp_path, catalog_df):
    path = write_shapefile(catalog_df, str(tmp_path / "cat2.shp"))
    raw = open(path, "rb").read()
    # magic, file length in 16-bit words, version, shape type POLYGON
    assert struct.unpack(">i", raw[0:4])[0] == 9994
    assert struct.unpack(">i", raw[24:28])[0] * 2 == len(raw)
    assert struct.unpack("<i", raw[28:32])[0] == 1000
    assert struct.unpack("<i", raw[32:36])[0] == 5
    # global bbox covers both features
    xmin, ymin, xmax, ymax = struct.unpack("<4d", raw[36:68])
    assert (xmin, ymax) == (-62.9, 52.2)
    # shx indexes both records
    shx = open(path[:-4] + ".shx", "rb").read()
    assert (len(shx) - 100) // 8 == 2
    # prj present
    assert "WGS_1984" in open(path[:-4] + ".prj").read()


def test_shapefile_empty(tmp_path):
    df = pd.DataFrame(
        {"scene": [], "xmin": [], "ymin": [], "xmax": [], "ymax": []}
    )
    path = write_shapefile(df, str(tmp_path / "empty"))
    assert len(read_shapefile(path)) == 0


def test_launder_map_matches_reference():
    # archive.py:694-699
    assert LAUNDER_NAMES == {
        "acquisition_mode": "acq_mode",
        "orbitNumber_abs": "orbit_abs",
        "orbitNumber_rel": "orbit_rel",
        "cycleNumber": "cycleNr",
        "frameNumber": "frameNr",
        "outname_base": "outname",
    }
