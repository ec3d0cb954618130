"""Real-grammar driver round-trips against the reference's golden anchors.

Golden values: /root/reference/tests/test_drivers.py:23-55 (S1 + PSR2
records) and tests/test_archive.py:48-53 (footprint WKT) — reproduced
here from PARSED structurally-real blobs, not hand-built rows.
"""

import numpy as np
import pytest

from pyrosar_ray.catalog.schema import validate_record
from pyrosar_ray.functions.geometry import corners
from pyrosar_ray.functions.names import outname_base
from pyrosar_ray.functions.tiles import hgt_tiles
from pyrosar_ray.sources.drivers import identify
from pyrosar_ray.sources.formats import (
    WKT4326,
    build_ceos_psr_blob,
    build_esa_blob,
    build_safe_blob,
    build_tsx_blob,
    parse_ceos_psr,
    parse_esa,
    parse_safe,
    parse_tsx,
    safe_geo_grid,
)

#: the reference's S1A GRD golden record (tests/test_drivers.py:23-39)
S1_META = {
    "sensor": "S1A",
    "acquisition_mode": "IW",
    "orbit": "A",
    "start": "20150222T170750",
    "stop": "20150222T170815",
    "product": "GRD",
    "samples": 25368,
    "lines": 16685,
    "orbitNumber_abs": 4703,
    "orbitNumber_rel": 131,
    "cycleNumber": 29,
    "frameNumber": 159,
    "polarizations": ["VV", "VH"],
    "spacing": (10.0, 9.998647),
    "coordinates": [
        (8.505644, 50.295261),
        (12.0268, 50.688881),
        (11.653832, 52.183979),
        (8.017178, 51.788181),
    ],
    "projection": WKT4326,
    "incidence": 39.1,
    "looks": (1.0, 1.0),
    "IPF_version": 2.43,
}

#: the reference's PSR2 golden record (tests/test_drivers.py:40-55)
PSR2_META = {
    "sensor": "PSR2",
    "acquisition_mode": "FBD",
    "orbit": "A",
    "start": "20140909T043342",
    "stop": "20140909T043352",
    "product": "1.5",
    "samples": 12870,
    "lines": 13160,
    "orbitNumber_abs": 4521,
    "orbitNumber_rel": 4521 % 207,
    "cycleNumber": 4521 // 207 + 1,
    "frameNumber": 5100,
    "polarizations": ["HH", "HV"],
    "spacing": (6.25, 6.25),
    "coordinates": [
        (-62.9005207, -11.4233051),
        (-62.1629744, -11.3233051),
        (-62.2629744, -10.6783401),
        (-62.8005207, -10.7783401),
    ],
    "projection": WKT4326,
}


def test_safe_golden_roundtrip():
    blob = build_safe_blob(S1_META)
    rec = parse_safe(blob)
    validate_record(rec)
    for key in (
        "sensor", "acquisition_mode", "orbit", "start", "stop", "product",
        "samples", "lines", "orbitNumber_abs", "orbitNumber_rel",
        "cycleNumber", "frameNumber", "polarizations",
    ):
        assert rec[key] == S1_META[key], key
    assert rec["spacing"] == (10.0, 9.998647)
    # gml (lat,lon) text reversed back to (lon,lat) exactly
    assert rec["coordinates"] == S1_META["coordinates"]
    c = corners(np.array(rec["coordinates"]))
    assert c == {"xmin": 8.017178, "xmax": 12.0268, "ymin": 50.295261, "ymax": 52.183979}
    assert len(hgt_tiles(c["xmin"], c["xmax"], c["ymin"], c["ymax"])) == 15
    assert (
        outname_base(rec["sensor"], rec["acquisition_mode"], rec["orbit"], rec["start"])
        == "S1A__IW___A_20150222T170750"
    )
    assert rec["IPF_version"] == 2.43
    assert identify(blob)["sensor"] == "S1A"  # registry dispatch


def test_safe_stripmap_mode_from_swath():
    meta = dict(S1_META, acquisition_mode="S3")
    rec = parse_safe(build_safe_blob(meta))
    assert rec["acquisition_mode"] == "S3"  # SM scenes report the swath


def test_safe_ocn_sentinels():
    meta = dict(S1_META, product="OCN")
    rec = parse_safe(build_safe_blob(meta))
    assert rec["spacing"] == -1 and rec["samples"] == -1 and rec["lines"] == -1


def test_safe_geo_grid_full_fields():
    pts = [
        {
            "azimuthTime": f"2015-02-22T17:07:{50 + i % 10:02d}.{i:06d}",
            "slantRangeTime": 5.33e-3 + i * 1e-6,
            "line": i * 100,
            "pixel": i * 250,
            "latitude": 50.3 + i * 0.1,
            "longitude": 8.5 + i * 0.2,
            "height": float(i),
            "incidenceAngle": 29.0 + i,
            "elevationAngle": 26.0 + i,
        }
        for i in range(6)
    ]
    blob = build_safe_blob(S1_META, grid_points=pts)
    rows = safe_geo_grid(blob)
    assert len(rows) == 6  # one annotation group (first pol) × 6 points
    row = rows[3]
    assert row["swath"] == "IW"
    assert row["azimuthTime"] == "2015-02-22T17:07:53.000003"
    assert row["slantRangeTime"] == 5.33e-3 + 3e-6
    assert row["line"] == 300 and row["pixel"] == 750
    assert row["incidenceAngle"] == 32.0 and row["elevationAngle"] == 29.0
    assert row["lon"] == 8.5 + 3 * 0.2 and row["lat"] == 50.3 + 3 * 0.1


def test_ceos_psr_golden_roundtrip():
    blob = build_ceos_psr_blob(PSR2_META)
    rec = parse_ceos_psr(blob)
    validate_record(rec)
    for key in (
        "sensor", "acquisition_mode", "orbit", "start", "stop", "product",
        "samples", "lines", "orbitNumber_abs", "orbitNumber_rel",
        "cycleNumber", "frameNumber", "polarizations",
    ):
        assert rec[key] == PSR2_META[key], key
    assert rec["spacing"] == (6.25, 6.25)
    c = corners(np.array(rec["coordinates"]))
    assert c == {
        "xmin": -62.9005207,
        "xmax": -62.1629744,
        "ymin": -11.4233051,
        "ymax": -10.6783401,
    }
    assert len(hgt_tiles(c["xmin"], c["xmax"], c["ymin"], c["ymax"])) == 2
    assert (
        outname_base(rec["sensor"], rec["acquisition_mode"], rec["orbit"], rec["start"])
        == "PSR2_FBD__A_20140909T043342"
    )
    assert identify(blob)["sensor"] == "PSR2"


def test_tsx_lon_wrap():
    meta = dict(
        PSR2_META,
        sensor="TSX1",
        acquisition_mode="SM",
        product="MGD",
        orbit="D",
        polarizations=["HH"],
        spacing=(1.25, 1.1),
        coordinates=[(-170.5, 64.0), (-169.8, 64.1), (-169.9, 65.0), (179.9, 64.9)],
    )
    rec = parse_tsx(build_tsx_blob(meta))
    validate_record(rec)
    assert rec["sensor"] == "TSX1" and rec["product"] == "MGD"
    assert rec["orbit"] == "D" and rec["acquisition_mode"] == "SM"
    assert rec["spacing"] == (1.25, 1.1)
    # lon > 180 wrapped back west; lon 179.9 untouched
    lons = [lon for lon, _ in rec["coordinates"]]
    assert lons[3] == 179.9
    assert lons[0] == pytest.approx(-170.5, abs=1e-9)
    assert all(-180 <= x <= 180 for x in lons)
    assert identify(build_tsx_blob(meta))["sensor"] == "TSX1"


def test_esa_golden_roundtrip():
    meta = dict(
        PSR2_META,
        sensor="ASAR",
        acquisition_mode="IMP",
        orbit="D",
        polarizations=["VV"],
        spacing=(12.5, 12.5),
        coordinates=[(11.0, 50.0), (12.0, 50.1), (12.1, 51.0), (10.9, 50.9)],
    )
    blob = build_esa_blob(meta)
    rec = parse_esa(blob)
    validate_record(rec)
    assert rec["sensor"] == "ASAR"
    assert rec["product"] == "PRI" and rec["image_geometry"] == "GROUND_RANGE"
    assert rec["acquisition_mode"] == "IMP"
    assert rec["orbit"] == "D"
    assert rec["start"] == meta["start"] and rec["stop"] == meta["stop"]
    assert rec["spacing"] == (12.5, 12.5)
    assert rec["polarizations"] == ["VV"]
    assert rec["samples"] == meta["samples"] and rec["lines"] == meta["lines"]
    assert rec["orbitNumber_abs"] == meta["orbitNumber_abs"]
    # ADS tie points span the footprint bbox at µdeg precision
    c = corners(np.array(rec["coordinates"]))
    assert c["xmin"] == pytest.approx(10.9, abs=1e-6)
    assert c["ymax"] == pytest.approx(51.0, abs=1e-6)
    assert identify(blob)["sensor"] == "ASAR"
    # published acquisition characteristics joined from the NESZ table
    # (reference drivers.py:1795-1801 / ERS/mapping.py)
    assert rec["resolution"] == (24.90, 22.14)
    assert rec["nesz"] == (21.8, 20.5)
    # SLC modes flip the geometry
    slc = parse_esa(build_esa_blob(dict(meta, acquisition_mode="IMS")))
    assert slc["product"] == "SLC" and slc["image_geometry"] == "SLANT_RANGE"
    assert slc["resolution"] == (5.77, 8.43)
    # swath is honoured end-to-end through the SPH grammar
    is5 = parse_esa(build_esa_blob(dict(meta, acquisition_mode="IMS", swath="IS5")))
    assert is5["nesz"] == (21.4, 19)


def test_identify_many_real_blobs():
    import ray.data

    from pyrosar_ray.sources.drivers import identify_many

    blobs = [
        build_safe_blob(S1_META),
        build_ceos_psr_blob(PSR2_META),
        b"garbage blob",
    ]
    ds = ray.data.from_items([{"blob": b, "path": f"p{i}"} for i, b in enumerate(blobs)])
    out = identify_many(ds).to_pandas()
    assert len(out) == 2
    assert set(out["sensor"]) == {"S1A", "PSR2"}
    # full contract columns present and typed
    assert out["spacing"].iloc[0] is not None
    assert list(out["start"]) == sorted(out["start"])


def test_blob_ingest_to_archive():
    """Blob table → identify_many → derive_catalog_columns → RayArchive.

    The full contract loop: parsed records flow into the catalog with
    dedup routing (reference: identify → Archive.insert)."""
    import pyarrow as pa
    import ray.data

    from pyrosar_ray.catalog.archive import RayArchive
    from pyrosar_ray.derive import scene_blobs
    from pyrosar_ray.sources.drivers import derive_catalog_columns, identify_many

    tab = scene_blobs(np.arange(1, 41))
    # a duplicate identity: key 6 encoded again under a different path
    dup = scene_blobs(np.array([6]))
    combined = pa.concat_tables([tab, dup])
    paths = pa.array([f"/in/scene-{i}.blob" for i in range(len(combined))])
    ds = ray.data.from_arrow(combined.append_column("scene", paths))

    recs = identify_many(ds, keep_cols=("scene_key", "scene"))
    cat = derive_catalog_columns(recs)
    archive = RayArchive.ingest(cat, materialize=True)
    n_data, n_dup = archive.size()
    assert n_data == 40 and n_dup == 1  # the re-encoded key 6 routes to duplicates
    assert archive.select(sensor="PSR2").count() > 0
