"""RayArchive maintenance ops: drop_element, cleanup, unique dirs, export."""

import pandas as pd
import pyarrow as pa
import ray.data

from pyrosar_ray.catalog.archive import RayArchive


def _catalog():
    rows = pd.DataFrame(
        {
            "scene_key": [1, 2, 3],
            "outname_base": ["A", "B", "C"],
            "product": ["GRD", "GRD", "SLC"],
            "scene": ["/d1/a.zip", "/d1/b.zip", "/d2/c.zip"],
        }
    )
    dups = pd.DataFrame({"outname_base": ["A"], "scene": ["/d9/a2.zip"]})
    return RayArchive(ray.data.from_pandas(rows), ray.data.from_pandas(dups))


def test_drop_element_promotes_single_duplicate():
    arch = _catalog()
    out = arch.drop_element("A", "GRD")
    data = out.data.to_pandas().sort_values("outname_base")
    assert data["outname_base"].tolist() == ["A", "B", "C"]
    promoted = data[data["outname_base"] == "A"]
    assert promoted["scene"].tolist() == ["/d9/a2.zip"]  # duplicate took over
    assert out.duplicates.count() == 0


def test_drop_element_without_duplicate():
    arch = _catalog()
    out = arch.drop_element("B", "GRD")
    assert out.data.count() == 2
    assert out.duplicates.count() == 1  # untouched


def test_cleanup_drops_vanished():
    arch = _catalog()
    out = arch.cleanup(lambda p: p != "/d1/b.zip")
    assert sorted(out.data.to_pandas()["outname_base"]) == ["A", "C"]


def test_unique_directories():
    arch = _catalog()
    dirs = sorted(arch.get_unique_directories().to_pandas()["directory"])
    assert dirs == ["/d1", "/d2"]


def test_export_parquet(tmp_path):
    arch = _catalog()
    arch.export(str(tmp_path / "cat"), fmt="parquet")
    back = ray.data.read_parquet(str(tmp_path / "cat"))
    assert back.count() == 3


def test_custom_fields_queryable():
    rows = pd.DataFrame(
        {
            "scene_key": [1, 2],
            "outname_base": ["A", "B"],
            "product": ["GRD", "GRD"],
            "scene": ["/d/a.zip", "/d/b.zip"],
            "cloud_cover": [10, 90],
        }
    )
    arch = RayArchive(ray.data.from_pandas(rows), custom_fields=("cloud_cover",))
    out = arch.select(cloud_cover=10, return_value=["scene", "cloud_cover"]).to_pandas()
    assert out["scene"].tolist() == ["/d/a.zip"]
    # without registration the kwarg is ignored-with-warning (both rows)
    arch2 = RayArchive(ray.data.from_pandas(rows))
    assert arch2.select(cloud_cover=10).count() == 2


def test_scene_catalog_protocol():
    from pyrosar_ray.catalog.protocol import SceneCatalog, StaticCatalog

    rows = pd.DataFrame(
        {
            "scene_key": [1],
            "outname_base": ["A"],
            "product": ["GRD"],
            "scene": ["/d/a.zip"],
            "sensor": ["S1A"],
        }
    )
    cat = StaticCatalog(ray.data.from_pandas(rows))
    assert isinstance(cat, SceneCatalog)
    with cat as c:
        assert c.select(sensor="S1A").count() == 1


def test_archive_move_rewrites_paths(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from pyrosar_ray.catalog.archive import RayArchive

    data = rd.from_arrow(
        pa.table(
            {
                "scene": ["/old/a.zip", "/old/b.zip", "/other/c.zip"],
                "outname_base": ["A", "B", "C"],
                "product": ["GRD", "GRD", "GRD"],
            }
        )
    )
    dups = rd.from_arrow(
        pa.table(
            {
                "scene": ["/old/a.zip"],
                "outname_base": ["A2"],
                "product": ["GRD"],
            }
        )
    )
    arch = RayArchive(data, dups)
    moved, double = arch.move(["/old/a.zip", "/old/b.zip", "/dupe/b.zip"], "/new")
    # same-basename collision is reported and left in place
    assert double == ["/dupe/b.zip"]
    got = sorted(r["scene"] for r in moved.data.take_all())
    assert got == ["/new/a.zip", "/new/b.zip", "/other/c.zip"]
    # duplicates table rewritten too
    assert moved.duplicates.take_all()[0]["scene"] == "/new/a.zip"


def test_osv_maintenance_ops(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from pyrosar_ray.stages.asof import clean_res, osv_extreme_date

    names = [
        "S1A_OPER_AUX_POEORB_OPOD_20150527T122852_V20150505T225944_20150507T005944.EOF",
        "S1A_OPER_AUX_POEORB_OPOD_20150528T122852_V20150506T225944_20150508T005944.EOF",
        "S1A_OPER_AUX_RESORB_OPOD_20150507T000000_V20150506T225944_20150507T003000.EOF",
        "S1A_OPER_AUX_RESORB_OPOD_20150509T000000_V20150508T225944_20150509T003000.EOF",
    ]
    files = rd.from_arrow(pa.table({"filename": pa.array(names)}))
    assert osv_extreme_date(files, "POE", "stop", "max") == "20150508T005944"
    assert osv_extreme_date(files, "RES", "start", "min") == "20150506T225944"
    assert osv_extreme_date(files, "POE", "stop", "max", name_col="filename") is not None
    # RES file stopping before the POE max is dropped; the later one kept
    kept = sorted(r["filename"] for r in clean_res(files).take_all())
    assert names[2] not in kept
    assert names[3] in kept and names[0] in kept
    # empty type -> None; clean_res then no-op
    poe_only = rd.from_arrow(pa.table({"filename": pa.array(names[:2])}))
    assert osv_extreme_date(poe_only, "RES", "stop", "max") is None


def test_export_shapefile_row_cap(tmp_path, monkeypatch):
    # the .shp single-file bound must fail loudly BEFORE the driver
    # accumulates an unbounded catalog (round-3 verdict: bounded export)
    import pytest

    rows = pd.DataFrame(
        {
            "scene_key": [1, 2, 3],
            "outname_base": ["A", "B", "C"],
            "xmin": [0.0, 1.0, 2.0],
            "ymin": [0.0, 1.0, 2.0],
            "xmax": [1.0, 2.0, 3.0],
            "ymax": [1.0, 2.0, 3.0],
        }
    )
    arch = RayArchive(ray.data.from_pandas(rows))
    monkeypatch.setattr(RayArchive, "SHP_EXPORT_MAX_ROWS", 2)
    with pytest.raises(ValueError, match="single-file bound"):
        arch.export(str(tmp_path / "cat"), fmt="shp")
    # under the cap the streamed path still writes a real shapefile
    monkeypatch.setattr(RayArchive, "SHP_EXPORT_MAX_ROWS", 10)
    arch.export(str(tmp_path / "ok"), fmt="shp")
    assert (tmp_path / "ok.shp").exists()
