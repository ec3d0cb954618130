"""Tile-grid grammar parity (golden IDs from the reference test suite)."""

import numpy as np

from pyrosar_ray.functions.tiles import (
    dem_tile_ids,
    expand_bbox_tiles,
    hgt_tiles,
    intrange,
    tile_names_1deg,
)

EXT_DE = {"xmin": 11.5, "xmax": 11.9, "ymin": 51.1, "ymax": 51.5}
EXT_SOUTH = {"xmin": -58.9, "xmax": -58.5, "ymin": -51.5, "ymax": -51.1}


def test_hgt_golden_s1():
    # S1 golden scene covers 15 1-degree tiles
    tiles = hgt_tiles(8.017178, 12.0268, 50.295261, 52.183979)
    assert len(tiles) == 15
    assert tiles[0] == "N50E008.hgt"
    assert "N51E011.hgt" in tiles


def test_hgt_golden_psr2():
    tiles = hgt_tiles(-62.9005207, -62.1629744, -11.4233051, -10.6783401)
    assert len(tiles) == 2
    assert tiles == ["S12W063.hgt", "S11W063.hgt"]


def test_intrange_golden():
    ext = {"xmin": 11, "xmax": 12, "ymin": 51, "ymax": 51.5}
    assert intrange(ext, 1) == (range(51, 52), range(11, 12))
    assert intrange(ext, 5) == (range(50, 55, 5), range(10, 15, 5))
    assert intrange(ext, 15) == (range(45, 60, 15), range(0, 15, 15))


def test_dem_ids_golden_north():
    assert dem_tile_ids(EXT_DE, "AW3D30") == ["N050E010/N051E011.tar.gz"]
    assert dem_tile_ids(EXT_DE, "SRTM 1Sec HGT") == ["N51E011.SRTMGL1.hgt.zip"]
    assert dem_tile_ids(EXT_DE, "SRTM 3Sec") == ["srtm_39_02.zip"]
    assert dem_tile_ids(EXT_DE, "Copernicus 30m Global DEM") == [
        "Copernicus_DSM_COG_10_N51_00_E011_00_DEM.tif"
    ]
    assert dem_tile_ids(EXT_DE, "TDX90m") == ["DEM/N51/E010/TDM1_DEM__30_N51E011.zip"]


def test_dem_ids_golden_south():
    assert dem_tile_ids(EXT_SOUTH, "AW3D30") == ["S055W060/S052W059.tar.gz"]
    assert dem_tile_ids(EXT_SOUTH, "SRTM 1Sec HGT") == ["S52W059.SRTMGL1.hgt.zip"]
    assert dem_tile_ids(EXT_SOUTH, "SRTM 3Sec") == ["srtm_25_23.zip"]


def test_dem_ids_unknown():
    import pytest

    with pytest.raises(ValueError):
        dem_tile_ids(EXT_DE, "foobar")


def test_expand_bbox_tiles_matches_scalar():
    rng = np.random.default_rng(7)
    xmin = rng.uniform(-170, 160, 20)
    ymin = rng.uniform(-70, 60, 20)
    xmax = xmin + rng.uniform(0.1, 4.0, 20)
    ymax = ymin + rng.uniform(0.1, 4.0, 20)
    row_idx, lat, lon = expand_bbox_tiles(xmin, xmax, ymin, ymax)
    names = tile_names_1deg(lat, lon)
    for i in range(20):
        expected = [t[:-4] for t in hgt_tiles(xmin[i], xmax[i], ymin[i], ymax[i])]
        got = list(names[row_idx == i])
        assert got == expected, i
