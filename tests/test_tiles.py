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


def test_vectorized_dem_expansion_matches_scalar():
    """__ray_entry__'s vectorized AW3D30/GETASSE30 expansions agree with
    the golden-tested scalar dem_tile_ids grammar."""
    import pyarrow as pa

    from __ray_entry__ import q_dem_aw3d30, q_dem_getasse30  # noqa: E402
    from pyrosar_ray.functions.tiles import dem_tile_ids
    from pyrosar_ray.pipelines.tables import load_scenes

    scenes = load_scenes("/root/testdata/sf0.001").limit(50).to_pandas()
    aw = q_dem_aw3d30("/root/testdata/sf0.001").to_pandas()
    ge = q_dem_getasse30("/root/testdata/sf0.001").to_pandas()
    for _, sc in scenes.head(10).iterrows():
        extent = {"xmin": sc.xmin, "xmax": sc.xmax, "ymin": sc.ymin, "ymax": sc.ymax}
        want_aw = sorted(dem_tile_ids(extent, "AW3D30"))
        got_aw = sorted(aw[aw.scene_key == sc.scene_key]["tile"])
        assert got_aw == want_aw
        want_ge = sorted(dem_tile_ids(extent, "GETASSE30"))
        got_ge = sorted(ge[ge.scene_key == sc.scene_key]["tile"])
        assert got_ge == want_ge


def test_utm_mgrs_zone_goldens_and_exceptions():
    """Known designators: Berlin 33U, Oslo 32V (Norway widening),
    Longyearbyen 33X (Svalbard), Sydney 56H, band edges."""
    import numpy as np

    from pyrosar_ray.functions.tiles import utm_mgrs_zone

    pts = {
        # (lon, lat) in centidegrees -> expected (zone, band)
        (1340, 5250): (33, "U"),   # Berlin 13.40E 52.50N
        (1075, 5991): (32, "V"),   # Oslo 10.75E 59.91N (Norway: else 32 anyway)
        (575, 5800): (32, "V"),    # 5.75E 58.0N — would be 31 without Norway rule
        (1560, 7822): (33, "X"),   # Longyearbyen 15.60E 78.22N (else 33 anyway)
        (800, 7800): (31, "X"),    # 8E 78N — would be 32 but X skips it
        (2200, 7800): (35, "X"),   # 22E 78N — would be 34 but X skips it
        (15121, -3387): (56, "H"), # Sydney 151.21E 33.87S
        (-17999, 0): (1, "N"),     # west edge
        (3500, 8399): (37, "X"),   # 35E 83.99N — Svalbard zone 37 range
        (17999, 8399): (60, "X"),  # band X outside Svalbard: normal zone
        (0, -8000): (31, "C"),     # south UTM limit
    }
    lon = np.array([k[0] for k in pts], dtype=np.int64)
    lat = np.array([k[1] for k in pts], dtype=np.int64)
    zone, band = utm_mgrs_zone(lon, lat)
    got = list(zip(zone.tolist(), band.tolist()))
    assert got == list(pts.values())
