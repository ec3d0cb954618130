"""Plan model: grouping/split semantics vs the reference's golden counts."""

from pyrosar_ray.plan import Node, Plan, geocode_plan, group_by_workers, split


def test_geocode_plan_consistent():
    p = geocode_plan()
    assert p.is_consistent()
    # suffix = ordered operator abbreviations (Read/Write contribute none)
    assert p.suffix() == "bnr_Cal_NR_Orb_ML_TF_TC_dB"
    assert p.suffix(stop="Multilook") == "bnr_Cal_NR_Orb_ML"


def test_group_by_workers_golden_counts():
    p = geocode_plan()
    # reference golden (tests/test_snap.py:34-37): the geocode chain at
    # n=2 gives 4 groups (ThermalNoiseRemoval pulled into Calibration's
    # group), n=100 gives 1
    groups = group_by_workers(p, 2)
    assert len(groups) == 4
    assert len(group_by_workers(p, 100)) == 1
    # co-location: ThermalNoiseRemoval rides with its source Calibration
    tn_group = [g for g in groups if "ThermalNoiseRemoval" in g][0]
    assert "Calibration" in tn_group
    # Read heads the first group, Write tails the last
    assert groups[0][0] == "Read"
    assert groups[-1][-1] == "Write"


def test_split_links_intermediates():
    p = geocode_plan()
    groups = group_by_workers(p, 2)
    subs = split(p, groups)
    assert len(subs) == 4  # reference golden: 4 temp workflows
    for sub in subs:
        assert sub.is_consistent()
        assert any(x.operator == "Read" for x in sub)
        assert any(x.operator == "Write" for x in sub)
    # the second sub-plan reads the first's intermediate product
    read2 = [x for x in subs[1] if x.operator == "Read"][0]
    write1 = [x for x in subs[0] if x.operator == "Write"][-1]
    assert read2.parameters["file"] == write1.parameters["file"]


def test_inconsistent_plan_detected():
    p = Plan([Node("A", "OpA", {}, ["missing"])])
    assert not p.is_consistent()


def test_value2str_coercions():
    from pyrosar_ray.plan import Node, value2str

    # reference snap/auxil.py:1433-1455 semantics
    assert value2str(True) == "true"
    assert value2str(False) == "false"
    assert value2str([1, 2, 3]) == "1,2,3"
    assert value2str(["VV", "VH"]) == "VV,VH"
    assert value2str(None) is None
    assert value2str(20.5) == "20.5"
    assert value2str(7) == "7"
    node = Node("tc", "Terrain-Correction",
                parameters={"demName": None, "nodataValueAtSea": False,
                            "sourceBands": ["Gamma0_VV"], "pixelSpacingInMeter": 20.0})
    assert node.parameters_str() == {
        "demName": None, "nodataValueAtSea": "false",
        "sourceBands": "Gamma0_VV", "pixelSpacingInMeter": "20.0",
    }
