"""BEAM-DIMAP grammar round-trips (reference drivers.py:795-946)."""

import pytest

from pyrosar_ray.sources.drivers import identify
from pyrosar_ray.sources.formats import (
    WKT4326,
    build_dimap_blob,
    parse_dimap,
    sniff_dimap,
)

DIM_META = {
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
    "polarizations": ["VH", "VV"],
    "spacing": (10.0, 9.998647),
    "looks": (1.0, 1.0),
    "coordinates": [
        (8.505644, 50.295261),
        (12.0268, 50.688881),
        (11.653832, 52.183979),
        (8.017178, 51.788181),
    ],
    "incidence_near": 30.2,
    "incidence_far": 46.0,
    "swath": "IW",
    "IPF_version": "Sentinel-1 IPF 002.43",
    "projection": WKT4326,
}


def test_dimap_s1_roundtrip():
    blob = build_dimap_blob(DIM_META)
    assert sniff_dimap(blob)
    rec = parse_dimap(blob)
    for key in (
        "sensor", "acquisition_mode", "orbit", "start", "stop", "product",
        "samples", "lines", "orbitNumber_abs", "orbitNumber_rel",
        "cycleNumber", "polarizations", "coordinates", "swath",
    ):
        assert rec[key] == DIM_META[key], key
    assert rec["spacing"] == (10.0, 9.998647)
    assert rec["incidence"] == pytest.approx((30.2 + 46.0) / 2)
    assert rec["frameNumber"] == 159  # data_take_id present
    assert rec["image_geometry"] == "GROUND_RANGE"
    assert rec["IPF_version"] == "Sentinel-1 IPF 002.43"
    # registry dispatch picks the BEAM_DIMAP driver
    assert identify(blob)["sensor"] == "S1A"


def test_dimap_esa_product_table():
    # ENVISAT: mode from PRODUCT_TYPE[4:7], product from the APS/IMP table
    meta = dict(DIM_META, sensor="ASAR", acquisition_mode="IMP")
    rec = parse_dimap(build_dimap_blob(meta))
    assert rec["sensor"] == "ASAR"
    assert rec["acquisition_mode"] == "IMP"
    assert rec["product"] == "PRI"
    for mode, product in [("IMS", "SLC"), ("WSM", "MR"), ("APS", "SLC")]:
        rec = parse_dimap(build_dimap_blob(dict(meta, acquisition_mode=mode, swath=mode)))
        assert rec["product"] == product
    with pytest.raises(RuntimeError, match="unsupported acquisition mode"):
        parse_dimap(build_dimap_blob(dict(meta, acquisition_mode="XXX", swath="XXX")))


def test_dimap_fallback_chains():
    # orbit_cycle omitted -> CYCLE; data_take_id omitted -> ABS_ORBIT
    blob = build_dimap_blob(DIM_META, omit=("orbit_cycle",))
    assert parse_dimap(blob)["cycleNumber"] == 29
    blob = build_dimap_blob(DIM_META, omit=("data_take_id",))
    assert parse_dimap(blob)["frameNumber"] == DIM_META["orbitNumber_abs"]


def test_dimap_99999_sentinel_and_midswath_incidence():
    # sentinel near/far angles fall through to the midswath list mean
    meta = dict(DIM_META)
    meta.pop("incidence_near")
    meta.pop("incidence_far")
    meta["incidence_mid"] = [38.0, 40.0]
    rec = parse_dimap(build_dimap_blob(meta))
    assert rec["incidence"] == pytest.approx(39.0)
    # no incidence information at all -> hard error, like the reference
    meta["incidence_mid"] = []
    with pytest.raises(ValueError, match="incident angle"):
        parse_dimap(build_dimap_blob(meta))


def test_dimap_polarization_filtering():
    # '-'-combined entries and empties are dropped; distinct set kept
    meta = dict(DIM_META, polarizations=["VV", "VV", "VV-VH"])
    rec = parse_dimap(build_dimap_blob(meta))
    assert rec["polarizations"] == ["VV"]


def test_dimap_wkt_fallback():
    meta = dict(DIM_META)
    meta.pop("projection")
    rec = parse_dimap(build_dimap_blob(meta))
    assert rec["projection"] == WKT4326
    # explicit WKT is left-stripped
    rec2 = parse_dimap(build_dimap_blob(DIM_META))
    assert rec2["projection"] == WKT4326


def test_tie_point_grid_incidence_fallback():
    """The reference's THIRD incidence fallback (drivers.py:912-918):
    no near/far attrs, no mid-swath attrs -> read the .data sidecar's
    tie-point grid and average the nonzero pixels."""
    import numpy as np

    from pyrosar_ray.sources.formats.dimap import build_dimap_product_zip

    grid = np.zeros((12, 9), dtype=np.float32)
    grid[3:9, 2:7] = np.linspace(29.0, 46.0, 30).reshape(6, 5)
    blob = build_dimap_product_zip(
        dict(DIM_META), omit=("incidence_near", "incidence_far"), incidence_grid=grid
    )
    rec = parse_dimap(blob)
    assert rec["incidence"] == pytest.approx(float(np.mean(grid[grid != 0])))
    # the rest of the record parses identically through the zip path
    assert rec["sensor"] == "S1A"
    assert rec["samples"] == dict(DIM_META)["samples"]


def test_tie_point_grid_missing_raises():
    from pyrosar_ray.sources.formats.dimap import build_dimap_product_zip

    blob = build_dimap_product_zip(
        dict(DIM_META), omit=("incidence_near", "incidence_far")
    )
    with pytest.raises(ValueError, match="cannot read the incident angle"):
        parse_dimap(blob)


def test_zip_product_identify_routes_to_dimap():
    import numpy as np

    from pyrosar_ray.sources.drivers import identify
    from pyrosar_ray.sources.formats.dimap import build_dimap_product_zip

    grid = np.full((4, 4), 38.5, dtype=np.float32)
    blob = build_dimap_product_zip(
        dict(DIM_META), omit=("incidence_near", "incidence_far"), incidence_grid=grid
    )
    rec = identify(blob)
    assert rec is not None and rec["sensor"] == "S1A"
