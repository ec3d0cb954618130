"""RayArchive select semantics (reference: tests/test_archive.py)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from pyrosar_ray.catalog.archive import RayArchive
from pyrosar_ray.derive import scenes_from_orders
from pyrosar_ray.functions.geometry import bbox_ring, polygon_wkb


@pytest.fixture(scope="module")
def archive(sf_dir):
    orders = pq.read_table(f"{sf_dir}/orders.parquet", columns=["o_orderkey"])
    scenes = scenes_from_orders(orders["o_orderkey"].to_numpy())
    return RayArchive.ingest(rd.from_arrow(scenes), materialize=True), scenes.to_pandas()


def test_ingest_sizes(archive):
    ar, df = archive
    ndata, ndup = ar.size()
    ngroups = df.groupby(["outname_base", "product"]).ngroups
    assert ndata == ngroups
    assert ndata + ndup == len(df)


def test_select_sensor_in(archive):
    ar, df = archive
    winners = df.sort_values("scene").drop_duplicates(["outname_base", "product"])
    got = ar.select(sensor=["S1A", "S1B"]).count()
    assert got == (winners.sensor.isin(["S1A", "S1B"])).sum()


def test_select_dates_strict_and_overlap(archive):
    ar, df = archive
    winners = df.sort_values("scene").drop_duplicates(["outname_base", "product"])
    lo, hi = "20150301T000000", "20150401T000000"
    strict = ar.select(mindate=lo, maxdate=hi).count()
    assert strict == ((winners.start >= lo) & (winners.stop <= hi)).sum()
    loose = ar.select(mindate=lo, maxdate=hi, date_strict=False).count()
    assert loose == ((winners.stop >= lo) & (winners.start <= hi)).sum()


def test_select_malformed_dates_and_unknown_kwargs_ignored(archive):
    # reference behavior: malformed dates / unknown kwargs ignored with a log
    ar, df = archive
    all_rows = ar.select().count()
    got = ar.select(mindate="foo", maxdate="bar", foobar="foobar").count()
    assert got == all_rows


def test_select_polarizations(archive):
    ar, df = archive
    winners = df.sort_values("scene").drop_duplicates(["outname_base", "product"])
    got = ar.select(polarizations=["VV"]).count()
    assert got == (winners.vv == 1).sum()


def test_select_return_values(archive):
    ar, _ = archive
    out = ar.select(
        vv=1, return_value=["mindate", "geometry_wkt", "geometry_wkb"]
    ).take(1)[0]
    assert set(out) == {"mindate", "geometry_wkt", "geometry_wkb"}
    assert out["geometry_wkt"].startswith("POLYGON((")
    assert isinstance(out["geometry_wkb"], bytes)


def test_select_invalid_return_value_raises(archive):
    ar, _ = archive
    with pytest.raises(ValueError):
        ar.select(return_value=["foobar"])


def test_select_spatial(archive):
    ar, df = archive
    winners = df.sort_values("scene").drop_duplicates(["outname_base", "product"])
    q = polygon_wkb(bbox_ring(0.0, 0.0, 20.0, 20.0))
    got = ar.select(vectorobject_wkb=q).count()
    expected = (
        (winners.xmin <= 20.0)
        & (winners.xmax >= 0.0)
        & (winners.ymin <= 20.0)
        & (winners.ymax >= 0.0)
    ).sum()
    assert got == expected


def test_is_registered(archive):
    ar, df = archive
    row = df.iloc[0]
    assert ar.is_registered(row["outname_base"], row["product"])
    assert not ar.is_registered("NOPE_XX___A_20000101T000000", "GRD")
