"""Golden-value conformance for the scalar kernels (FIXTURES.md §7)."""

from datetime import datetime

import numpy as np
import pytest

from pyrosar_ray.functions.dates import parse_date, seconds, seconds_array
from pyrosar_ray.functions.grouping import groupby, groupbyTime, session_ids
from pyrosar_ray.functions.multilook import multilook_factors
from pyrosar_ray.functions.names import (
    outname_base,
    outname_base_array,
    parse_datasetname,
    parse_datasetname_batch,
)


def test_seconds_golden():
    assert seconds("test_20151212T234411") == 3658952651.0


def test_seconds_array():
    names = ["test_20151212T234411", "x_20150222T170750_y"]
    arr = seconds_array(names)
    assert arr[0] == 3658952651.0
    assert arr[1] == seconds(names[1])


def test_parse_date():
    assert parse_date(datetime(2006, 11, 21)) == "20061121T000000"
    assert parse_date("20151212T234411") == "20151212T234411"
    assert parse_date("2015-12-12T23:44:11.000000") == "20151212T234411"
    with pytest.raises(ValueError):
        parse_date("foobar")


def test_outname_base():
    assert outname_base("S1A", "IW", "A", "20150222T170750") == "S1A__IW___A_20150222T170750"
    assert outname_base("PSR2", "FBD", "A", "20140909T043342") == "PSR2_FBD__A_20140909T043342"
    arr = outname_base_array(["S1A"], ["IW"], ["A"], ["20150222T170750"])
    assert arr[0] == "S1A__IW___A_20150222T170750"


def test_parse_datasetname_golden():
    meta = parse_datasetname("S1A__IW___A_20150309T173017_VV_grd_mli_geo_norm_db.tif")
    assert meta["sensor"] == "S1A"
    assert meta["acquisition_mode"] == "IW"
    assert meta["orbit"] == "A"
    assert meta["start"] == "20150309T173017"
    assert meta["polarization"] == "VV"
    assert meta["proc_steps"] == ["grd", "mli", "geo", "norm", "db"]
    assert meta["outname_base"] == "S1A__IW___A_20150309T173017"
    assert meta["extensions"] is None
    assert parse_datasetname("not_a_product.txt") is None


def test_parse_datasetname_batch():
    df = parse_datasetname_batch(
        ["S1A__IW___A_20150309T173017_VV_grd_mli_geo_norm_db.tif", "garbage"]
    )
    assert df["outname_base"].iloc[0] == "S1A__IW___A_20150309T173017"
    assert df["sensor"].isna().iloc[1]


def test_multilook_factors_golden():
    assert multilook_factors(2, 13, 10, "SLANT_RANGE", 39) == (4, 1)
    with pytest.raises(ValueError):
        multilook_factors(2, 13, 10, "NONSENSE", 39)


def test_groupby_time_golden():
    # 2 groups, first of size 2 (gap 60s)
    names = ["a_20200101T120000", "a_20200101T120100", "a_20200101T120300"]
    groups = groupbyTime(names, seconds, 60)
    assert len(groups) == 2
    assert len(groups[0]) == 2
    assert groups[1] == names[2]  # singleton unwrapped
    # chaining: consecutive 60s gaps → one group of 3
    names = ["a_20200101T120000", "a_20200101T120100", "a_20200101T120200"]
    groups = groupbyTime(names, seconds, 60)
    assert len(groups) == 1
    assert len(groups[0]) == 3


def test_groupby_attribute():
    names = [
        "S1A__IW___A_20150309T173017_VV_grd.tif",
        "S1A__IW___A_20150309T173017_VH_grd.tif",
        "S1A__IW___D_20150310T173017_VV_grd.tif",
    ]
    groups = groupby(names, "orbit")
    assert [len(g) for g in groups] == [2, 1]


def test_session_ids():
    ts = np.array([0.0, 30.0, 120.0, 130.0, 400.0])
    ids = session_ids(ts, 60.0)
    assert ids.tolist() == [0, 0, 1, 1, 2]
    assert session_ids(np.array([]), 60.0).tolist() == []


def test_find_datasets_predicates(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from pyrosar_ray.stages.datasets import find_datasets

    names = [
        "/d/S1A__IW___A_20150523T122350_VV_grd_mli_db.tif",
        "/d/S1A__IW___A_20140101T000000_VV_grd_mli.tif",
        "/d/TSX1_SM___D_20150601T010203_HH_grd_mli_db.tif",
        "/d/PSR2_FBD__A_20150701T050607_HH_grd_mli_db.tif",
        "not_a_product.txt",
    ]
    files = rd.from_arrow(pa.table({"filename": pa.array(names)}))
    # sensor tuple + start window + ordered proc_steps
    got = find_datasets(
        files,
        sensor=("S1A", "TSX1"),
        start="20150101T000000",
        proc_steps=["grd", "mli", "db"],
    ).take_all()
    assert sorted(r["filename"] for r in got) == sorted([names[0], names[2]])
    # stop keeps start <= value; exact polarization match
    got2 = find_datasets(files, stop="20141231T000000").take_all()
    assert [r["filename"] for r in got2] == [names[1]]
    got3 = find_datasets(files, polarization="HH").take_all()
    assert sorted(r["sensor"] for r in got3) == ["PSR2", "TSX1"]
    # grammar misses are always dropped
    assert len(find_datasets(files).take_all()) == 4


def test_osv_filename_grammar():
    import numpy as np

    from pyrosar_ray.functions.osv import (
        OSV_PATTERN,
        format_osv_name,
        osv_date,
        osv_subdir_batch,
        parse_osv_batch,
        sort_by_date,
    )
    import re

    names = format_osv_name(
        ["S1A", "S1B"], ["POE", "RES"],
        ["20150527T122852", "20150528T000000"],
        ["20150505T225944", "20150401T120000"],
        ["20150507T005944", "20150402T120000"],
    )
    assert names[0] == (
        "S1A_OPER_AUX_POEORB_OPOD_20150527T122852_"
        "V20150505T225944_20150507T005944.EOF"
    )
    for n in names:
        assert re.fullmatch(OSV_PATTERN, n)
    df = parse_osv_batch(names)
    assert df["sensor"].tolist() == ["S1A", "S1B"]
    assert df["type"].tolist() == ["POEORB", "RESORB"]
    assert osv_date(names, "stop")[1] == "20150402T120000"
    assert osv_subdir_batch(names).tolist() == [
        "POEORB/S1A/2015/05", "RESORB/S1B/2015/04",
    ]
    assert sort_by_date(names, "start").tolist() == [names[1], names[0]]
    # malformed name -> null row, no exception
    bad = parse_osv_batch(np.array(["not_an_eof.txt"], dtype=object))
    assert bad["sensor"].isna().all()
