"""CEOS_ERS + EORC_PSR real-grammar round-trips.

Reference: /root/reference/pyroSAR/drivers.py:948-1053 (CEOS_ERS leader
offsets) and drivers.py:1442-1588 (EORC path product line indices).
"""

from datetime import datetime

import pytest

from pyrosar_ray.functions.sar import PassTable
from pyrosar_ray.sources.drivers import identify
from pyrosar_ray.sources.formats import (
    build_ceos_ers_blob,
    build_eorc_psr_blob,
    parse_ceos_ers,
    parse_eorc_psr,
    sniff_ceos_ers,
    sniff_eorc_psr,
)

ERS_META = {
    "sensor": "ERS1",
    "acquisition_mode": "IMP",
    "orbit": "A",
    "start": "19920507T123456",
    "stop": "19920507T123511",
    "samples": 4900,
    "lines": 26569,
    "orbitNumber_abs": 4322,
    "orbitNumber_rel": 343,
    "cycleNumber": 86,
    "frameNumber": 2961,
    "spacing": (12.5, 12.5),
    "looks": (1.0, 5.0),
    "incidence": 23.0,
    "heading": 100.1,
    "cal_k": 674000.0,
    "coordinates": [
        (11.0, 50.1),
        (12.1, 50.3),
        (12.4, 51.2),
        (11.3, 51.4),
    ],
}

EORC_META = {
    "sensor": "PSR2",
    "acquisition_mode": "FBD",
    "orbit": "A",
    "start": "20140909",
    "product": "1.5",
    "samples": 12870,
    "lines": 13160,
    "orbitNumber_rel": 87,
    "cycleNumber": 22,
    "spacing": (6.25, 6.25),
    "incidence": 32.4,
    "k_dB": -83.0,
    "polarizations": ["HH", "HV"],
    "coordinates": [
        (-62.9, -11.42),
        (-62.16, -11.32),
        (-62.26, -10.67),
        (-62.8, -10.77),
    ],
}


def _pass_table():
    return PassTable(
        [
            ("ERS1", datetime(1992, 1, 1), datetime(1993, 1, 1), "C", 86, 686),
            ("ERS2", datetime(1995, 6, 1), datetime(2011, 9, 5), "A", 1, 2),
        ]
    )


def test_ceos_ers_roundtrip():
    blob = build_ceos_ers_blob(ERS_META)
    assert sniff_ceos_ers(blob, _members(blob))
    rec = parse_ceos_ers(blob, pass_table=_pass_table())
    for key in (
        "sensor", "acquisition_mode", "orbit", "start", "stop",
        "samples", "lines", "orbitNumber_abs", "frameNumber", "looks",
    ):
        assert rec[key] == ERS_META[key], key
    assert rec["product"] == "PRI"  # IMP
    assert rec["polarizations"] == ["VV"]
    assert rec["spacing"] == (12.5, 12.5)
    # pass-db wiring: cycle from the table, rel orbit = ceil(pass/2)
    assert rec["cycleNumber"] == 86
    assert rec["orbitNumber_rel"] == 343
    assert rec["heading"] == pytest.approx(100.1, abs=1e-3)
    # calibration: k_db = -10 log10(K)
    assert rec["k_db"] == pytest.approx(-58.287, abs=1e-3)
    assert rec["sc_db"] == 59.61
    assert rec["coordinates"] == ERS_META["coordinates"]
    assert identify(blob)["sensor"] == "ERS1"


def test_ceos_ers_slc_and_level0():
    rec = parse_ceos_ers(build_ceos_ers_blob(dict(ERS_META, acquisition_mode="IMS")))
    assert rec["product"] == "SLC"
    assert rec["cycleNumber"] == -1  # no pass table supplied
    with pytest.raises(RuntimeError, match="level 0"):
        parse_ceos_ers(
            build_ceos_ers_blob(dict(ERS_META, acquisition_mode="IM_", level="0P"))
        )


def test_ceos_ers_descending_from_heading():
    rec = parse_ceos_ers(build_ceos_ers_blob(dict(ERS_META, orbit="D", heading=275.0)))
    assert rec["orbit"] == "D"


def test_eorc_psr_roundtrip():
    blob = build_eorc_psr_blob(EORC_META)
    assert sniff_eorc_psr(blob, _members(blob))
    rec = parse_eorc_psr(blob)
    for key in (
        "sensor", "acquisition_mode", "orbit", "product",
        "samples", "lines", "orbitNumber_rel", "cycleNumber",
        "incidence", "k_dB",
    ):
        assert rec[key] == EORC_META[key], key
    assert rec["start"] == rec["stop"] == "20140909"
    # 207 orbits per cycle arithmetic
    assert rec["orbitNumber_abs"] == 207 * 21 + 87
    assert sorted(rec["polarizations"]) == ["HH", "HV"]
    assert rec["spacing"] == (6.25, 6.25)
    assert rec["coordinates"] == EORC_META["coordinates"]
    assert "ITRF97" in rec["projection"]
    assert identify(blob)["sensor"] == "PSR2"


def _members(blob):
    from pyrosar_ray.sources.drivers import list_members

    return list_members(blob)
