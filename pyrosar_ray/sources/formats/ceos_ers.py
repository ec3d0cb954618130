"""ERS CEOS grammar: the LEA_01.001 binary leader + product-id filename.

Parser parity targets (reference ``CEOS_ERS.scanMetadata``,
/root/reference/pyroSAR/drivers.py:948-1053; record layout per
ER-IS-EPO-GS-5902-3 Annex C):

- the product id comes from the container name, matched against the
  ``patterns.ceos_ers`` grammar (patterns.py:30-43); the image-mode
  triplet maps to product SLC (IMS/APS/WSS) or PRI, and level-0
  (``IM__0``) products are rejected
- the leader splits at fixed offsets: file descriptor record (720 B),
  data set summary record (1886 B), map projection data record
  (1620 B), platform position data record (length from the big-endian
  int at its offset +8), facility related data record (12288 B)
- DSS fields: sensor [396:412], heading [468:476] (orbit = 'D' when
  > 180), incidence [484:492], processing facility/system/version
  [1045:1077], looks [1174:1206], pixel spacings [1686:1718] stored
  azimuth-then-range, start/stop timestamps [1814:1838]/[1862:1886],
  absolute orbit + frame as the two integers in [36:68]
- MPD fields: samples [60:76], lines [76:92], the corner quad from
  [1072:1200] as latitude-then-longitude pairs emitted (lon, lat)
- FRD fields: antenna flag [658:662] and the calibration constant K
  [662:678] → ``k_db = -10·log10(K)``; ``sc_db`` is the fixed
  per-sensor table (ERS1 59.61, ERS2 60)
- relative orbit and cycle come from the ERS pass database
  (functions.sar.PassTable — the engine twin of ``passdb_query``);
  without a table they are set to -1 (the reference hard-requires its
  bundled sqlite db)

The builder writes the same record layout with synthetic content so the
round-trip (build → blob → parse) is testable without ESA media.
"""

from __future__ import annotations

import math
import re
import struct
from datetime import datetime

from .common import WKT4326, parse_date, zip_blob

#: container-name grammar (reference patterns.py:30-43)
PATTERN = (
    r"(?P<product_id>(?:SAR|ASA)_(?:IM(?:S|P|G|M|_)|AP(?:S|P|G|M|_)"
    r"|WV(?:I|S|W|_)|WS(?:M|S|_))_[012B][CP])"
    r"(?P<processing_stage_flag>[A-Z])"
    r"(?P<originator_ID>[A-Z\-]{3})"
    r"(?P<start_day>[0-9]{8})_"
    r"(?P<start_time>[0-9]{6})_"
    r"(?P<duration>[0-9]{8})"
    r"(?P<phase>[0-9A-Z]{1})"
    r"(?P<cycle>[0-9]{3})_"
    r"(?P<relative_orbit>[0-9]{5})_"
    r"(?P<absolute_orbit>[0-9]{5})_"
    r"(?P<counter>[0-9]{4,})\."
    r"(?P<satellite_ID>[EN][12])"
    r"(?P<extension>(?:\.zip|\.tar\.gz|\.PS|))$"
)

PATTERN_PID = (
    r"(?P<sat_id>(?:SAR|ASA))_"
    r"(?P<image_mode>(?:IM(?:S|P|G|M|_)|AP(?:S|P|G|M|_)|WV(?:I|S|W|_)|WS(?:M|S|_)))_"
    r"(?P<processing_level>[012B][CP])"
)

_FDR_LEN = 720
_DSS_LEN = 1886
_MPD_LEN = 1620
_FRD_LEN = 12288

_SC_DB = {"ERS1": 59.61, "ERS2": 60}


def _put(buf: bytearray, start: int, end: int, value) -> None:
    text = f"{value}"[: end - start].ljust(end - start)
    buf[start:end] = text.encode("ascii")


def _stamp_to_dss(stamp: str) -> str:
    """``YYYYmmddTHHMMSS`` → the 24-char DSS time field."""
    t = datetime.strptime(stamp, "%Y%m%dT%H%M%S")
    return t.strftime("%d-%b-%Y %H:%M:%S.000").upper()


# ----------------------------------------------------------------- builder


def build_ceos_ers_blob(meta: dict, ppd_length: int = 1024) -> bytes:
    """Deterministic LEA_01.001 zip with the real record offsets."""
    heading = meta.get("heading", 275.0 if meta["orbit"] == "D" else 100.0)
    rg, az = meta["spacing"]
    looks = meta.get("looks", (1.0, 5.0))

    dss = bytearray(b" " * _DSS_LEN)
    _put(dss, 36, 68, f"ORBIT {meta['orbitNumber_abs']:05d} FRAME {meta['frameNumber']:04d}")
    _put(dss, 396, 412, meta["sensor"])
    _put(dss, 468, 476, f"{heading:7.3f}")
    _put(dss, 484, 492, f"{meta.get('incidence', 23.0):7.3f}")
    _put(dss, 1045, 1061, meta.get("proc_facility", "UK-PAF"))
    _put(dss, 1061, 1069, meta.get("proc_system", "VMP"))
    _put(dss, 1069, 1077, meta.get("proc_version", "6.8"))
    _put(dss, 1174, 1190, f"{looks[0]:.6f}")
    _put(dss, 1190, 1206, f"{looks[1]:.6f}")
    _put(dss, 1686, 1702, f"{az:.6f}")  # azimuth first in the record
    _put(dss, 1702, 1718, f"{rg:.6f}")
    _put(dss, 1814, 1838, _stamp_to_dss(meta["start"]))
    _put(dss, 1862, 1886, _stamp_to_dss(meta["stop"]))

    mpd = bytearray(b" " * _MPD_LEN)
    _put(mpd, 60, 76, meta["samples"])
    _put(mpd, 76, 92, meta["lines"])
    # corner quad, latitude field before longitude field per point
    for i, (lon, lat) in enumerate(meta["coordinates"][:4]):
        base = 1072 + i * 32
        _put(mpd, base, base + 16, f"{lat:.6f}")
        _put(mpd, base + 16, base + 32, f"{lon:.6f}")

    ppd = bytearray(b" " * ppd_length)
    ppd[8:12] = struct.pack(">i", ppd_length)

    frd = bytearray(b" " * _FRD_LEN)
    _put(frd, 658, 662, meta.get("antenna_flag", 1))
    _put(frd, 662, 678, f"{meta.get('cal_k', 674000.0):.1f}")

    lea = bytes(bytearray(b" " * _FDR_LEN) + dss + mpd + ppd + frd)
    name = product_name(meta)
    return zip_blob({f"{name}/LEA_01.001": lea, f"{name}/VDF_DAT.001": b" " * 360})


def product_name(meta: dict) -> str:
    """Synthesize a pattern-conformant ERS product id from a record."""
    mode = meta["acquisition_mode"]
    level = meta.get("level", "1P")
    sat = {"ERS1": "E1", "ERS2": "E2"}[meta["sensor"]]
    day, tod = meta["start"].split("T")
    return (
        f"SAR_{mode}_{level}"
        f"X"
        f"ESA"
        f"{day}_{tod}_"
        f"00000018"
        f"C"
        f"{meta.get('cycleNumber', 0) % 1000:03d}_"
        f"{meta['orbitNumber_rel'] % 100000:05d}_"
        f"{meta['orbitNumber_abs'] % 100000:05d}_"
        f"{meta['frameNumber']:04d}."
        f"{sat}"
    )


# ------------------------------------------------------------------ parser


def _find_product_id(members: list[str]):
    for m in members:
        head = m.split("/")[0]
        match = re.match(PATTERN, head)
        if match:
            return match
    return None


def sniff_ceos_ers(blob: bytes, members=None) -> bool:
    return (
        members is not None
        and any(m.split("/")[-1] == "LEA_01.001" for m in members)
        and _find_product_id(members) is not None
    )


def parse_ceos_ers(blob: bytes, pass_table=None) -> dict:
    """LEA_01.001 leader + product id → full 16-attribute record + extras.

    ``pass_table`` is a :class:`pyrosar_ray.functions.sar.PassTable`
    supplying cycle/relative-orbit; ``None`` leaves them -1.
    """
    from ..drivers import get_member, list_members

    members = list_members(blob)
    match = _find_product_id(members)
    if match is None:
        raise ValueError("no CEOS ERS product id in the container")
    match2 = re.match(PATTERN_PID, match.group("product_id"))

    if re.search("IM__0", match.group("product_id")):
        raise RuntimeError("product level 0 not supported (yet)")

    meta: dict = {}
    meta["acquisition_mode"] = match2.group("image_mode")
    meta["product"] = (
        "SLC" if meta["acquisition_mode"] in ("IMS", "APS", "WSS") else "PRI"
    )

    lea_name = next(m for m in members if m.split("/")[-1] == "LEA_01.001")
    lea = get_member(blob, lea_name)
    dss = lea[_FDR_LEN : _FDR_LEN + _DSS_LEN]
    mpd_start = _FDR_LEN + _DSS_LEN
    mpd = lea[mpd_start : mpd_start + _MPD_LEN]
    ppd_start = mpd_start + _MPD_LEN
    ppd_length = struct.unpack(">i", lea[ppd_start + 8 : ppd_start + 12])[0]
    frd_start = ppd_start + ppd_length
    frd = lea[frd_start : frd_start + _FRD_LEN]

    meta["sensor"] = dss[396:412].strip().decode()
    meta["start"] = parse_date(dss[1814:1838].decode().strip())
    meta["stop"] = parse_date(dss[1862:1886].decode().strip())
    meta["polarizations"] = ["VV"]
    meta["looks"] = (float(dss[1174:1190]), float(dss[1190:1206]))
    meta["heading"] = float(dss[468:476])
    meta["orbit"] = "D" if meta["heading"] > 180 else "A"
    orbit_number, frame_number = map(
        int, re.findall("[0-9]+", dss[36:68].decode())
    )
    meta["orbitNumber_abs"] = orbit_number
    meta["frameNumber"] = frame_number
    if pass_table is not None:
        info = pass_table.lookup(
            meta["sensor"], datetime.strptime(meta["start"], "%Y%m%dT%H%M%S")
        )
    else:
        info = None
    meta["cycleNumber"] = info["cycleNumber"] if info else -1
    meta["orbitNumber_rel"] = info["orbitNumber_rel"] if info else -1
    spacing_azimuth = float(dss[1686:1702])
    spacing_range = float(dss[1702:1718])
    meta["spacing"] = (spacing_range, spacing_azimuth)
    meta["incidence_angle"] = float(dss[484:492])
    meta["proc_facility"] = dss[1045:1061].strip().decode()
    meta["proc_system"] = dss[1061:1069].strip().decode()
    meta["proc_version"] = dss[1069:1077].strip().decode()

    meta["antenna_flag"] = int(frd[658:662])
    meta["k_db"] = -10 * math.log(float(frd[662:678]), 10)
    meta["sc_db"] = _SC_DB[meta["sensor"]]

    meta["samples"] = int(mpd[60:76])
    meta["lines"] = int(mpd[76:92])
    corners = []
    for i in range(4):
        base = 1072 + i * 32
        lat = float(mpd[base : base + 16])
        lon = float(mpd[base + 16 : base + 32])
        corners.append((lon, lat))
    meta["coordinates"] = corners
    meta["projection"] = WKT4326
    return meta
