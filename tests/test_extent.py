"""Extent/consensus aggregates + DEM oversampling kernels.

Golden values mirror the reference semantics: commonextent is the
intersection of footprints (auxdata.py:606-632), hgt() the buffered 1°
union rectangle (gamma/dem.py:525-573), the nodata guard raises on
disagreement (gamma/dem.py:609-613), and ovs divides metric posting by
the target spacing with a haversine degree→meter conversion at the
raster center (gamma/util.py:1362-1400)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from pyrosar_ray.functions.dem import haversine, ovs_factors, ovs_from_latlon
from pyrosar_ray.stages.extent import common_extent, hgt_union, nodata_consensus


def _scenes(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "xmin": pa.array([r[0] for r in rows], type=pa.float64()),
                "ymin": pa.array([r[1] for r in rows], type=pa.float64()),
                "xmax": pa.array([r[2] for r in rows], type=pa.float64()),
                "ymax": pa.array([r[3] for r in rows], type=pa.float64()),
            }
        )
    )


def test_common_extent_intersection():
    ds = _scenes([(8.0, 50.0, 12.0, 52.0), (9.5, 50.5, 13.0, 53.0), (9.0, 49.0, 12.5, 52.5)])
    ext = common_extent(ds)
    assert ext == {"xmin": 9.5, "ymin": 50.5, "xmax": 12.0, "ymax": 52.0}


def test_common_extent_buffer():
    ds = _scenes([(8.0, 50.0, 12.0, 52.0)])
    ext = common_extent(ds, buffer=0.5)
    assert ext == {"xmin": 7.5, "ymin": 49.5, "xmax": 12.5, "ymax": 52.5}


def test_common_extent_empty_raises():
    with pytest.raises(ValueError):
        common_extent(_scenes([]))


def test_hgt_union_golden():
    # two scenes: union rectangle spans lat 50..52, lon 8..12 inclusive
    ds = _scenes([(8.1, 50.2, 9.9, 51.1), (11.2, 51.5, 11.9, 52.2)])
    tiles = hgt_union(ds)["tile"].to_pylist()
    # 3 lat rows x 4 lon cols = 12 names, full rectangle incl. the gap
    assert len(tiles) == 12
    assert tiles[0] == "N50E008.hgt"
    assert "N51E010.hgt" in tiles  # covers the hole between the scenes
    assert tiles[-1] == "N52E011.hgt"


def test_hgt_union_southern():
    ds = _scenes([(-62.9, -11.4, -62.1, -10.6)])
    tiles = hgt_union(ds)["tile"].to_pylist()
    assert tiles == ["S12W063.hgt", "S11W063.hgt"]


def test_nodata_consensus():
    ds = ray.data.from_arrow(pa.table({"nodata": pa.array([-32768.0] * 5)}))
    assert nodata_consensus(ds) == -32768.0


def test_nodata_consensus_conflict_raises():
    ds = ray.data.from_arrow(pa.table({"nodata": pa.array([-32768.0, 0.0])}))
    with pytest.raises(RuntimeError, match="different nodata"):
        nodata_consensus(ds)


def test_haversine_equator_degree():
    # one degree of longitude at the equator ~ 111.19 km for R=6371 km
    d = float(haversine(0.0, 0.0, 0.0, 1.0))
    assert d == pytest.approx(6371000.0 * np.pi / 180.0, rel=1e-9)


def test_ovs_metric_posting():
    lat, lon = ovs_factors(-40.0, 40.0, 20.0)
    assert (float(lat), float(lon)) == (2.0, 2.0)


def test_ovs_degree_posting():
    # 3 arcsec SRTM posting at ~51N: post_north ~ 92.66 m, post_east ~ 58 m
    res = 1.0 / 1200.0
    ovs_lat, ovs_lon = ovs_from_latlon(
        corner_lat=52.0, corner_lon=11.0, post_lat=-res, post_lon=res,
        nlines=1201, width=1201, spacing=20.0,
    )
    lat_c = 52.0 - res * (1201 // 2)
    lon_c = 11.0 + res * (1201 // 2)
    want_north = float(haversine(lat_c, lon_c, lat_c + res, lon_c)) / 20.0
    want_east = float(haversine(lat_c, lon_c, lat_c, lon_c + res)) / 20.0
    assert float(ovs_lat) == pytest.approx(want_north)
    assert float(ovs_lon) == pytest.approx(want_east)
    # sanity: ~4.63x north, ~2.9x east at this latitude
    assert 4.5 < float(ovs_lat) < 4.7
    assert 2.8 < float(ovs_lon) < 3.0


def test_ovs_vectorized():
    lat, lon = ovs_factors(np.array([-40.0, 20.0]), np.array([40.0, 10.0]), 10.0)
    assert lat.tolist() == [4.0, 2.0]
    assert lon.tolist() == [4.0, 1.0]
