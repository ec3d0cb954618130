"""Parameter-validation matrix for the geocode plan builder — the
engine twin of the reference's Test_geocode_opts suite
(tests/test_snap.py:48-136)."""

import pytest

from pyrosar_ray.plan import build_geocode, group_by_workers, split

S1_GRD = {
    "sensor": "S1A",
    "product": "GRD",
    "acquisition_mode": "IW",
    "polarizations": ["VV", "VH"],
    "xmin": 11.0,
    "xmax": 13.0,
    "ymin": 51.0,
    "ymax": 52.0,
}


def test_default_chain_and_grouping():
    plan = build_geocode(S1_GRD)
    ops = [n.operator for n in plan.nodes]
    assert ops == [
        "Read",
        "Remove-GRD-Border-Noise",
        "Calibration",
        "ThermalNoiseRemoval",
        "Apply-Orbit-File",
        "Multilook",
        "Terrain-Flattening",
        "Terrain-Correction",
        "LinearToFromdB",
        "Write",
    ]
    # reference golden: n=2 -> 4 groups, n=100 -> 1 (tests/test_snap.py:34-37)
    assert len(group_by_workers(plan, 2)) == 4
    assert len(group_by_workers(plan, 100)) == 1
    assert len(split(plan, group_by_workers(plan, 2))) == 4


def test_infile_type():
    with pytest.raises(TypeError):
        build_geocode(123)


def test_pol():
    with pytest.raises(RuntimeError):
        build_geocode(S1_GRD, polarizations=1)
    with pytest.raises(RuntimeError):
        build_geocode(S1_GRD, polarizations="foobar")
    plan = build_geocode(S1_GRD, polarizations="VV")
    cal = [n for n in plan.nodes if n.operator == "Calibration"][0]
    assert cal.parameters["selectedPolarisations"] == ["VV"]


def test_pol_list():
    plan = build_geocode(S1_GRD, polarizations=["VV", "VH"])
    cal = [n for n in plan.nodes if n.operator == "Calibration"][0]
    assert cal.parameters["selectedPolarisations"] == ["VV", "VH"]


def test_geotype():
    with pytest.raises(RuntimeError):
        build_geocode(S1_GRD, geocoding_type="foobar")
    build_geocode(S1_GRD, geocoding_type="SAR simulation cross correlation")


def test_srs():
    with pytest.raises(RuntimeError):
        build_geocode(S1_GRD, t_srs="foobar")
    plan = build_geocode(S1_GRD, t_srs=32632)
    tc = [n for n in plan.nodes if n.operator == "Terrain-Correction"][0]
    assert tc.parameters["crs"] == "EPSG:32632"


def test_scaling():
    with pytest.raises(RuntimeError):
        build_geocode(S1_GRD, scaling="foobar")
    ops = [n.operator for n in build_geocode(S1_GRD, scaling="linear").nodes]
    assert "LinearToFromdB" not in ops


def test_shp():
    # disjoint box -> guard fires; overlapping box -> Subset node
    with pytest.raises(RuntimeError):
        build_geocode(
            S1_GRD, shapefile={"xmin": 20, "xmax": 21, "ymin": 53, "ymax": 54}
        )
    plan = build_geocode(
        S1_GRD, shapefile={"xmin": 11.5, "xmax": 12.0, "ymin": 51.2, "ymax": 51.8}
    )
    assert "Subset" in [n.operator for n in plan.nodes]


def test_export_extra():
    with pytest.raises(RuntimeError):
        build_geocode(S1_GRD, export_extra=["foobar"])
    plan = build_geocode(S1_GRD, export_extra=["localIncidenceAngle"])
    tc = [n for n in plan.nodes if n.operator == "Terrain-Correction"][0]
    assert tc.parameters["auxiliary"] == ["localIncidenceAngle"]
    with pytest.raises(RuntimeError):
        build_geocode(S1_GRD, export_extra=["scatteringArea"], terrain_flattening=False)
    with pytest.raises(ValueError):
        build_geocode(S1_GRD, export_extra=["gammaSigmaRatio"], refarea="gamma0")
    build_geocode(S1_GRD, export_extra=["gammaSigmaRatio"], refarea=["sigma0", "gamma0"])


def test_external_dem(tmp_path):
    with pytest.raises(RuntimeError):
        build_geocode(S1_GRD, external_dem="foobar")
    dem = tmp_path / "dem.tif"
    dem.write_bytes(b"x")
    plan = build_geocode(S1_GRD, external_dem=str(dem))
    tc = [n for n in plan.nodes if n.operator == "Terrain-Correction"][0]
    assert tc.parameters["externalDEMFile"] == str(dem)


def test_speckle_filter():
    with pytest.raises(ValueError):
        build_geocode(S1_GRD, speckle_filter="foobar")
    plan = build_geocode(S1_GRD, speckle_filter="Refined Lee")
    assert "Speckle-Filter" in [n.operator for n in plan.nodes]


def test_refarea():
    with pytest.raises(ValueError):
        build_geocode(S1_GRD, terrain_flattening=False, refarea="foobar")
    plan = build_geocode(S1_GRD, terrain_flattening=True, refarea="gamma0")
    tf = [n for n in plan.nodes if n.operator == "Terrain-Flattening"][0]
    assert tf.parameters["outputSigma0"] is False


def test_unsupported_sensor_and_modes():
    with pytest.raises(RuntimeError, match="sensor not supported"):
        build_geocode({**S1_GRD, "sensor": "XYZ"})
    slc = {**S1_GRD, "product": "SLC"}
    assert "TOPSAR-Deburst" in [n.operator for n in build_geocode(slc).nodes]
    with pytest.raises(RuntimeError, match="acquisition mode"):
        build_geocode({**slc, "acquisition_mode": "WV"})
    # stripmap S1-S6 SLC: no deburst
    ops = [n.operator for n in build_geocode({**slc, "acquisition_mode": "S3"}).nodes]
    assert "TOPSAR-Deburst" not in ops
