"""ALOS-2/PALSAR-2 EORC Path-product grammar (HDR + facter_m.dat).

Parser parity targets (reference ``EORC_PSR.scanMetadata``,
/root/reference/pyroSAR/drivers.py:1442-1588; NDX-150019 format spec):

- the HDR member name matches the ``patterns.eorc_psr`` grammar
  (patterns.py:65-76); polarizations come from the ``sar...`` image
  member names ([HV]{2} substring)
- both HDR and facter_m.dat are LINE-INDEXED text files read after
  stripping every space; HDR line 2 = sensor, 3 = product, 5 = cycle,
  6 = observation date (start == stop, date-only, exactly like the
  reference), 7 = relative orbit, 9 = orbit direction, 33-40 = the
  corner quad as alternating lat/lon lines, 51/52 = spacing, 64 =
  calibration constant k_dB, 73 = processing facility
- facter_m line 50/51 = samples/lines, 119 = incidence angle
- ``orbitNumber_abs = 207·(cycle-1) + orbitNumber_rel`` (the PALSAR-2
  orbitsPerCycle arithmetic; the engine coerces cycle to int — the
  reference leaves it a string and would TypeError on this line, a
  known upstream bug)
- frameNumber: the reference stores ``''``; the engine uses -1 so the
  record stays schema-typed (int32)
- projection pinned to the ITRF97/GRS80 WKT (``crsConvert(4918)``)

The builder emits the same member set with synthetic content so the
round-trip (build → blob → parse) is testable without JAXA media.
"""

from __future__ import annotations

import re

from .common import zip_blob

#: HDR member grammar (reference patterns.py:65-76)
PATTERN = (
    r"^PSR2-"
    r"(?P<prodlevel>SLTR)_"
    r"(?P<pathnr>RSP[0-9]{3})_"
    r"(?P<date>[0-9]{8})"
    r"(?P<mode>FBD|WBD)"
    r"(?P<beam>[0-9]{2})"
    r"(?P<orbit_dir>A|D)"
    r"(?P<look_dir>L|R)_"
    r"(?P<replay_id1>[0-9A-Z]{16})-"
    r"(?P<replay_id2>[0-9A-Z]{5})_"
    r"(?P<internal>[0-9]{3})_"
    r"HDR$"
)

#: ITRF97 / GRS80 (the engine's pinned crsConvert(4918, 'wkt'))
WKT4918 = (
    'GEOGCS["ITRF97",DATUM["International_Terrestrial_Reference_Frame_1997",'
    'SPHEROID["GRS 1980",6378137,298.257222101,AUTHORITY["EPSG","7019"]],'
    'AUTHORITY["EPSG","6655"]],PRIMEM["Greenwich",0,AUTHORITY["EPSG","8901"]],'
    'UNIT["degree",0.0174532925199433,AUTHORITY["EPSG","9122"]],'
    'AUTHORITY["EPSG","4918"]]'
)

ORBITS_PER_CYCLE = 207


def _lines(n: int, assignments: dict[int, object]) -> str:
    rows = [""] * n
    for idx, value in assignments.items():
        rows[idx] = f"{value}"
    return "\n".join(rows)


# ----------------------------------------------------------------- builder


def build_eorc_psr_blob(meta: dict) -> bytes:
    """Deterministic EORC path-product zip: HDR + facter_m.dat + images."""
    cycle = meta["cycleNumber"]
    rel = meta["orbitNumber_rel"]
    date = meta["start"][:8]
    rg, az = meta["spacing"]
    coords = meta["coordinates"][:4]
    hdr_assign: dict[int, object] = {
        2: meta["sensor"],
        3: meta["product"],
        5: cycle,
        6: date,
        7: rel,
        9: meta["orbit"],
        12: meta["acquisition_mode"],
        51: rg,
        52: az,
        64: meta.get("k_dB", -83.0),
        73: meta.get("proc_facility", "EORC"),
    }
    for i, (lon, lat) in enumerate(coords):
        hdr_assign[33 + 2 * i] = lat
        hdr_assign[34 + 2 * i] = lon
    hdr = _lines(80, hdr_assign)
    facter = _lines(
        180,
        {
            50: float(meta["samples"]),
            51: float(meta["lines"]),
            119: meta.get("incidence", 32.4),
            168: "4.33420",
            170: "4.33520",
        },
    )
    hdr_name = (
        f"PSR2-SLTR_RSP{rel % 1000:03d}_{date}{meta['acquisition_mode']}"
        f"54{meta['orbit']}L_0123456789ABCDEF-01234_001_HDR"
    )
    members = {hdr_name: hdr.encode(), "facter_m.dat": facter.encode()}
    for pol in meta.get("polarizations", ["HH"]):
        members[f"sar_q2_{pol}_{date}"] = b"\0" * 16
    return zip_blob(members)


# ------------------------------------------------------------------ parser


def sniff_eorc_psr(blob: bytes, members=None) -> bool:
    return members is not None and any(
        re.match(PATTERN, m.split("/")[-1]) for m in members
    )


def parse_eorc_psr(blob: bytes) -> dict:
    """HDR + facter_m scan → full 16-attribute record + extras."""
    from ..drivers import get_member, list_members

    members = list_members(blob)
    hdr_name = next(
        m for m in members if re.match(PATTERN, m.split("/")[-1])
    )
    header = [
        line.replace(" ", "")
        for line in get_member(blob, hdr_name).decode().split("\n")
    ]
    facter_names = [m for m in members if m.split("/")[-1] == "facter_m.dat"]
    facter_m = (
        [
            line.replace(" ", "")
            for line in get_member(blob, facter_names[0]).decode().split("\n")
        ]
        if facter_names
        else []
    )

    meta: dict = {}
    meta["polarizations"] = [
        re.search("[HV]{2}", m.split("/")[-1]).group(0)
        for m in members
        if re.match("^sar.", m.split("/")[-1])
    ]
    meta["product"] = header[3]
    meta["start"] = str(header[6])
    meta["stop"] = str(header[6])
    meta["sensor"] = header[2]
    meta["acquisition_mode"] = header[12]

    lat = list(map(float, (header[33], header[35], header[37], header[39])))
    lon = list(map(float, (header[34], header[36], header[38], header[40])))
    meta["coordinates"] = list(zip(lon, lat))
    meta["projection"] = WKT4918

    meta["orbitNumber_rel"] = int(header[7])
    meta["cycleNumber"] = int(header[5])
    meta["frameNumber"] = -1  # the reference stores '' (untyped)
    meta["orbitNumber_abs"] = int(
        ORBITS_PER_CYCLE * (meta["cycleNumber"] - 1) + meta["orbitNumber_rel"]
    )

    meta["lines"] = int(float(facter_m[51]))
    meta["samples"] = int(float(facter_m[50]))
    meta["incidence"] = float(facter_m[119])
    meta["proc_facility"] = header[73]
    meta["spacing"] = (float(header[51]), float(header[52]))
    meta["orbit"] = header[9]
    meta["k_dB"] = float(header[64])
    return meta
