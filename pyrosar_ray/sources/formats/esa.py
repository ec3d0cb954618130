"""ERS/ENVISAT (ESA) grammar: MPH/SPH text headers + binary geolocation ADS.

Parser parity targets (reference ``ESA.scanMetadata``,
/root/reference/pyroSAR/drivers.py:1622-1812):

- KEY=value / KEY="value" decode with unit suffixes stripped at '<'
  (drivers.py:1660-1676); FIRST/LAST_{NEAR,MID,FAR}_{LAT,LONG} scaled
  by 1e-6
- MPH is the first 1247 bytes; SPH descriptor size =
  SPH_SIZE − DSD_SIZE × NUM_DSD; then NUM_DSD dataset descriptors
- GEOLOCATION GRID ADS binary granules (dsr layout lengths
  [12,1,4,4,4,220,22,12,220,3,19], drivers.py:1711-1752): MJD2000
  zero-doppler times ('>lLL' days/seconds/µs), 11 tie points per
  first/last line with µdeg int lat/lon
- sensor/mode from the product id (ASA/SAR + IM?/AP?/WV?/WS? grammar);
  IM__0 level-0 rejected; product ∈ {SLC, PRI, MR} by mode suffix
- polarizations from SPH TX_RX_POLAR keys; orbit/start/stop/spacing/
  looks/samples from MPH/SPH; lines from DSD MDS1 NUM_DSR

The builder emits a structurally-real product file with synthetic
content. The engine reads the product id from the MPH PRODUCT field
(the reference uses the file name, which a blob does not have).
"""

from __future__ import annotations

import re
import struct
from datetime import datetime, timedelta, timezone

from ...functions.sar import get_resolution_nesz
from .common import WKT4326

PATTERN_PID = (
    r"(?P<sat_id>(?:SAR|ASA))_"
    r"(?P<image_mode>(?:IM(?:S|P|G|M|_)|AP(?:S|P|G|M|_)|WV(?:I|S|W|_)|WS(?:M|S|_)))_"
    r"(?P<processing_level>[012B][CP])"
)
PATTERN_NAME = (
    r"(?P<product_id>(?:SAR|ASA)_(?:IM(?:S|P|G|M|_)|AP(?:S|P|G|M|_)|"
    r"WV(?:I|S|W|_)|WS(?:M|S|_))_[012B][CP])"
    r"(?P<processing_stage_flag>[A-Z])"
    r"(?P<originator_ID>[A-Z\-]{3})"
    r"(?P<start_day>[0-9]{8})_"
    r"(?P<start_time>[0-9]{6})_"
    r"(?P<duration>[0-9]{8})"
    r"(?P<phase>[0-9A-Z])"
    r"(?P<cycle>[0-9]{3})_"
    r"(?P<relative_orbit>[0-9]{5})_"
    r"(?P<absolute_orbit>[0-9]{5})_"
    r"(?P<counter>[0-9]{4,})\."
    r"(?P<satellite_ID>[EN][12])"
)

_MPH_SIZE = 1247
_DSR_LENGTHS = [12, 1, 4, 4, 4, 220, 22, 12, 220, 3, 19]
_DSR_SIZE = sum(_DSR_LENGTHS)  # 521
_MJD2000 = datetime(2000, 1, 1, tzinfo=timezone.utc)

SENSOR_LOOKUP = {"N1": "ASAR", "E1": "ERS1", "E2": "ERS2"}


# ----------------------------------------------------------------- builder


def _kv_block(pairs: list[tuple[str, str]], size: int) -> bytes:
    text = "\n".join(f"{k}={v}" for k, v in pairs) + "\n"
    raw = text.encode("ascii")
    if len(raw) > size:
        raise ValueError(f"block overflow: {len(raw)} > {size}")
    return raw + b" " * (size - len(raw))


def _mjd2000_bytes(dt: datetime) -> bytes:
    delta = dt - _MJD2000
    return struct.pack(">lLL", delta.days, delta.seconds, delta.microseconds)


def build_esa_blob(meta: dict, granules: list[dict] | None = None) -> bytes:
    """Deterministic ESA product file (raw bytes, not an archive).

    ``meta``: 16-attribute values; mode inferred from acquisition_mode
    ('IMP' → PRI etc.). ``granules``: optional geolocation granule dicts
    with keys first/last_time (datetime), line_num, num_lines,
    tie_points (list of 11 dicts with sample_number, slant_range_time,
    incident_angle, latitude, longitude), swath.
    """
    mode = meta["acquisition_mode"]
    sat_id = {"ASAR": "N1", "ERS1": "E1", "ERS2": "E2"}[meta["sensor"]]
    pid = "ASA" if meta["sensor"] == "ASAR" else "SAR"
    start, stop = meta["start"], meta["stop"]
    product_name = (
        f"{pid}_{mode}_1PNUPA{start[:8]}_{start[9:15]}_00000018"
        f"{meta['cycleNumber'] % 10}{meta['cycleNumber']:03d}_"
        f"{meta['orbitNumber_rel']:05d}_{meta['orbitNumber_abs']:05d}_"
        f"00042.{sat_id}"
    )

    def _esa_time(stamp: str) -> str:
        dt = datetime.strptime(stamp, "%Y%m%dT%H%M%S")
        return dt.strftime("%d-%b-%Y %H:%M:%S.%f").upper()

    if granules is None:
        granules = _default_granules(meta)
    n_granules = len(granules)
    ads_size = n_granules * _DSR_SIZE

    sph_descr_size = 2048
    dsd_size = 280
    num_dsd = 2
    sph_size = sph_descr_size + dsd_size * num_dsd
    ds_offset = _MPH_SIZE + sph_size

    mph_pairs = [
        ("PRODUCT", f'"{product_name}"'),
        ("SENSING_START", f'"{_esa_time(start)}"'),
        ("SENSING_STOP", f'"{_esa_time(stop)}"'),
        ("ABS_ORBIT", f"+{meta['orbitNumber_abs']:010d}"),
        ("REL_ORBIT", f"+{meta['orbitNumber_rel']:010d}"),
        ("CYCLE", f"+{meta['cycleNumber']:03d}"),
        ("SPH_SIZE", f"+{sph_size:010d}<bytes>"),
        ("NUM_DSD", f"+{num_dsd:010d}"),
        ("DSD_SIZE", f"+{dsd_size:010d}<bytes>"),
    ]
    mph = _kv_block(mph_pairs, _MPH_SIZE)

    # corner keys (µdeg ints) + acquisition fields
    coords = meta["coordinates"]
    lons = [c[0] for c in coords]
    lats = [c[1] for c in coords]
    rg_sp, az_sp = meta["spacing"]
    looks_rg, looks_az = meta.get("looks", (1, 1))
    pol_entries = [("MDS1_TX_RX_POLAR", '"V/V"'), ("MDS2_TX_RX_POLAR", '""')]
    if meta["sensor"] == "ASAR" and len(meta.get("polarizations", [])) > 1:
        pol_entries = [
            (f"MDS{i + 1}_TX_RX_POLAR", f'"{p[0]}/{p[1]}"')
            for i, p in enumerate(meta["polarizations"])
        ]
    sph_pairs = [
        ("SPH_DESCRIPTOR", '"Image Mode Precision Image"'),
        # wide-swath products carry the WS swath id; stripmap defaults IS2
        ("SWATH", f'"{meta.get("swath", "WS" if mode in ("WSM", "WSS") else "IS2")}"'),
        ("PASS", '"ASCENDING"' if meta["orbit"] == "A" else '"DESCENDING"'),
        ("FIRST_NEAR_LAT", f"{round(lats[0] * 1e6):+011d}<10-6degN>"),
        ("FIRST_NEAR_LONG", f"{round(lons[0] * 1e6):+011d}<10-6degE>"),
        ("FIRST_MID_LAT", f"{round((lats[0] + lats[1]) / 2 * 1e6):+011d}<10-6degN>"),
        ("FIRST_MID_LONG", f"{round((lons[0] + lons[1]) / 2 * 1e6):+011d}<10-6degE>"),
        ("FIRST_FAR_LAT", f"{round(lats[1] * 1e6):+011d}<10-6degN>"),
        ("FIRST_FAR_LONG", f"{round(lons[1] * 1e6):+011d}<10-6degE>"),
        ("LAST_NEAR_LAT", f"{round(lats[3] * 1e6):+011d}<10-6degN>"),
        ("LAST_NEAR_LONG", f"{round(lons[3] * 1e6):+011d}<10-6degE>"),
        ("LAST_MID_LAT", f"{round((lats[2] + lats[3]) / 2 * 1e6):+011d}<10-6degN>"),
        ("LAST_MID_LONG", f"{round((lons[2] + lons[3]) / 2 * 1e6):+011d}<10-6degE>"),
        ("LAST_FAR_LAT", f"{round(lats[2] * 1e6):+011d}<10-6degN>"),
        ("LAST_FAR_LONG", f"{round(lons[2] * 1e6):+011d}<10-6degE>"),
        *pol_entries,
        ("RANGE_SPACING", f"{rg_sp:+.6f}<m>"),
        ("AZIMUTH_SPACING", f"{az_sp:+.6f}<m>"),
        ("RANGE_LOOKS", f"+{int(looks_rg):03d}"),
        ("AZIMUTH_LOOKS", f"+{int(looks_az):03d}"),
        ("LINE_LENGTH", f"+{meta['samples']:06d}<samples>"),
    ]
    sph_descr = _kv_block(sph_pairs, sph_descr_size)

    dsd_geo = _kv_block(
        [
            ("DS_NAME", '"GEOLOCATION GRID ADS"'),
            ("DS_TYPE", "A"),
            ("DS_OFFSET", f"+{ds_offset:021d}<bytes>"),
            ("DS_SIZE", f"+{ads_size:021d}<bytes>"),
            ("NUM_DSR", f"+{n_granules:010d}"),
            ("DSR_SIZE", f"+{_DSR_SIZE:010d}<bytes>"),
        ],
        dsd_size,
    )
    dsd_mds = _kv_block(
        [
            ("DS_NAME", '"MDS1"'),
            ("DS_TYPE", "M"),
            ("DS_OFFSET", f"+{ds_offset + ads_size:021d}<bytes>"),
            ("DS_SIZE", f"+{0:021d}<bytes>"),
            ("NUM_DSR", f"+{meta['lines']:010d}"),
            ("DSR_SIZE", f"+{0:010d}<bytes>"),
        ],
        dsd_size,
    )

    ads = bytearray()
    for g in granules:
        rec = bytearray()
        rec += _mjd2000_bytes(g["first_time"])
        rec += struct.pack("B", 0)
        rec += struct.pack(">L", g["line_num"])
        rec += struct.pack(">L", g["num_lines"])
        rec += struct.pack(">f", g.get("sub_sat_track", 0.0))
        rec += _tie_point_bytes(g["tie_points_first"])
        rec += b" " * 22
        rec += _mjd2000_bytes(g["last_time"])
        rec += _tie_point_bytes(g["tie_points_last"])
        rec += g.get("swath", "IS2").ljust(3).encode()
        rec += b" " * 19
        assert len(rec) == _DSR_SIZE
        ads += rec

    return bytes(mph + sph_descr + dsd_geo + dsd_mds + bytes(ads))


def _tie_point_bytes(points: list[dict]) -> bytes:
    if len(points) != 11:
        raise ValueError("tie-point group carries exactly 11 points")
    out = b"".join(struct.pack(">L", p["sample_number"]) for p in points)
    out += b"".join(struct.pack(">f", p["slant_range_time"]) for p in points)
    out += b"".join(struct.pack(">f", p["incident_angle"]) for p in points)
    out += b"".join(struct.pack(">l", round(p["latitude"] * 1e6)) for p in points)
    out += b"".join(struct.pack(">l", round(p["longitude"] * 1e6)) for p in points)
    return out


def _default_granules(meta: dict) -> list[dict]:
    """Two granules spanning the footprint bbox — 11 tie points per edge."""
    coords = meta["coordinates"]
    lons = [c[0] for c in coords]
    lats = [c[1] for c in coords]
    xmin, xmax = min(lons), max(lons)
    ymin, ymax = min(lats), max(lats)
    t0 = datetime.strptime(meta["start"], "%Y%m%dT%H%M%S").replace(tzinfo=timezone.utc)
    t1 = datetime.strptime(meta["stop"], "%Y%m%dT%H%M%S").replace(tzinfo=timezone.utc)

    def _edge(lat: float) -> list[dict]:
        return [
            {
                "sample_number": 1 + i * 500,
                "slant_range_time": 5.5e-3 + i * 1e-5,
                "incident_angle": 19.2 + i * 0.7,
                "latitude": lat,
                "longitude": xmin + (xmax - xmin) * i / 10,
            }
            for i in range(11)
        ]

    mid = t0 + (t1 - t0) / 2
    half = meta["lines"] // 2
    return [
        {
            "first_time": t0,
            "last_time": mid,
            "line_num": 1,
            "num_lines": half,
            "tie_points_first": _edge(ymin),
            "tie_points_last": _edge((ymin + ymax) / 2),
        },
        {
            "first_time": mid,
            "last_time": t1,
            "line_num": 1 + half,
            "num_lines": meta["lines"] - half,
            "tie_points_first": _edge((ymin + ymax) / 2),
            "tie_points_last": _edge(ymax),
        },
    ]


# ------------------------------------------------------------------ parser

_COORD_KEYS = frozenset(
    f"{x}_{y}_{z}"
    for x in ("FIRST", "LAST")
    for y in ("NEAR", "MID", "FAR")
    for z in ("LAT", "LONG")
)


def _val_convert(val: str):
    try:
        return int(val)
    except ValueError:
        try:
            return float(val)
        except ValueError:
            if re.search("[0-9]{2}-[A-Z]{3}-[0-9]{4}", val):
                return datetime.strptime(val, "%d-%b-%Y %H:%M:%S.%f").replace(
                    tzinfo=timezone.utc
                )
            return val


def _decode(raw: str) -> dict:
    """KEY=value lines; units stripped at '<'; coord keys × 1e-6
    (reference decode closure, drivers.py:1660-1676)."""
    out = {}
    for line in raw.split("\n"):
        m = re.match(r'(?P<key>[A-Z0-9_]+)\=(")?(?P<value>.*?)("|<|$)', line)
        if m:
            val = _val_convert(str(m.group("value")).strip())
            if m.group("key") in _COORD_KEYS:
                val *= 10**-6
            out[m.group("key")] = val
    return out


def sniff_esa(blob: bytes, members=None) -> bool:
    return blob.startswith(b'PRODUCT="') and b"SPH_SIZE" in blob[:_MPH_SIZE]


def parse_esa(blob: bytes) -> dict:
    meta: dict = {}
    origin: dict = {}
    mph = blob[:_MPH_SIZE].decode("ascii")
    origin["MPH"] = _decode(mph)

    product_name = origin["MPH"]["PRODUCT"]
    match = re.match(PATTERN_NAME, product_name)
    if match is None:
        raise ValueError(f"unrecognized ESA product id: {product_name!r}")
    match2 = re.match(PATTERN_PID, match.group("product_id"))
    if re.search("IM__0", match.group("product_id")):
        raise ValueError("product level 0 not supported")

    meta["sensor"] = SENSOR_LOOKUP[match.group("satellite_ID")]
    meta["acquisition_mode"] = match2.group("image_mode")
    meta["image_geometry"] = "GROUND_RANGE"
    if meta["acquisition_mode"] in ("APS", "IMS", "WSS"):
        meta["product"] = "SLC"
        meta["image_geometry"] = "SLANT_RANGE"
    elif meta["acquisition_mode"] in ("APP", "IMP"):
        meta["product"] = "PRI"
    elif meta["acquisition_mode"] in ("APM", "IMM", "WSM"):
        meta["product"] = "MR"
    else:
        raise ValueError(f"unsupported acquisition mode: {meta['acquisition_mode']}")

    sph_size = origin["MPH"]["SPH_SIZE"]
    dsd_size = origin["MPH"]["DSD_SIZE"]
    dsd_num = origin["MPH"]["NUM_DSD"]
    sph_descr_size = sph_size - dsd_size * dsd_num
    pos = _MPH_SIZE
    origin["SPH"] = _decode(blob[pos : pos + sph_descr_size].decode("ascii"))
    pos += sph_descr_size
    datasets = {}
    for _ in range(dsd_num):
        dsd = _decode(blob[pos : pos + dsd_size].decode("ascii"))
        datasets[dsd.pop("DS_NAME")] = dsd
        pos += dsd_size
    origin["DSD"] = datasets
    meta["origin"] = origin

    geo_dsd = datasets["GEOLOCATION GRID ADS"]
    geo = blob[geo_dsd["DS_OFFSET"] : geo_dsd["DS_OFFSET"] + geo_dsd["DS_SIZE"]]
    dsr_size = geo_dsd["DSR_SIZE"]
    granules_raw = [geo[i : i + dsr_size] for i in range(0, len(geo), dsr_size)]

    keys = [
        "first_zero_doppler_time", "attach_flag", "line_num", "num_lines",
        "sub_sat_track", "first_line_tie_points", "spare",
        "last_zero_doppler_time", "last_line_tie_points", "swath_number",
    ]
    origin["GEOLOCATION_GRID_ADS"] = []
    for granule in granules_raw:
        start = 0
        values = {}
        for i, key in enumerate(keys):
            value = granule[start : sum(_DSR_LENGTHS[: i + 1])]
            if key in ("first_zero_doppler_time", "last_zero_doppler_time"):
                days, secs, micros = struct.unpack(">lLL", value)
                value = _MJD2000 + timedelta(
                    days=days, seconds=secs, microseconds=micros
                )
            elif key == "attach_flag":
                value = struct.unpack("B", value)[0]
            elif key in ("line_num", "num_lines"):
                value = struct.unpack(">L", value)[0]
            elif key == "sub_sat_track":
                value = struct.unpack(">f", value)[0]
            elif key in ("first_line_tie_points", "last_line_tie_points"):
                sample_numbers = struct.unpack(">" + "L" * 11, value[0:44])
                slant_range_times = struct.unpack(">" + "f" * 11, value[44:88])
                incident_angles = struct.unpack(">" + "f" * 11, value[88:132])
                latitudes = [x / 1e6 for x in struct.unpack(">" + "l" * 11, value[132:176])]
                longitudes = [x / 1e6 for x in struct.unpack(">" + "l" * 11, value[176:220])]
                value = [
                    {
                        "sample_number": sample_numbers[j],
                        "slant_range_time": slant_range_times[j],
                        "incident_angle": incident_angles[j],
                        "latitude": latitudes[j],
                        "longitude": longitudes[j],
                    }
                    for j in range(11)
                ]
            elif key == "swath_number":
                value = value.decode("ascii").strip()
            if key != "spare":
                values[key] = value
            start += _DSR_LENGTHS[i]
        origin["GEOLOCATION_GRID_ADS"].append(values)

    lon, lat = [], []
    for granule in origin["GEOLOCATION_GRID_ADS"]:
        for group in ("first", "last"):
            for pt in granule[f"{group}_line_tie_points"]:
                lat.append(pt["latitude"])
                lon.append(pt["longitude"])
    meta["coordinates"] = list(zip(lon, lat))

    if meta["sensor"] == "ASAR":
        pols = [y for x, y in origin["SPH"].items() if "TX_RX_POLAR" in x]
        pols = [x.replace("/", "") for x in pols if isinstance(x, str) and len(x) == 3]
        meta["polarizations"] = sorted(pols)
    else:
        meta["polarizations"] = ["VV"]

    meta["orbit"] = origin["SPH"]["PASS"][0]
    meta["start"] = origin["MPH"]["SENSING_START"].strftime("%Y%m%dT%H%M%S")
    meta["stop"] = origin["MPH"]["SENSING_STOP"].strftime("%Y%m%dT%H%M%S")
    meta["spacing"] = (origin["SPH"]["RANGE_SPACING"], origin["SPH"]["AZIMUTH_SPACING"])
    meta["looks"] = (origin["SPH"]["RANGE_LOOKS"], origin["SPH"]["AZIMUTH_LOOKS"])
    meta["samples"] = origin["SPH"]["LINE_LENGTH"]
    meta["lines"] = origin["DSD"]["MDS1"]["NUM_DSR"]
    meta["orbitNumber_abs"] = origin["MPH"]["ABS_ORBIT"]
    meta["orbitNumber_rel"] = origin["MPH"]["REL_ORBIT"]
    meta["cycleNumber"] = origin["MPH"]["CYCLE"]
    meta["frameNumber"] = origin["MPH"]["ABS_ORBIT"]

    angles = [
        pt["incident_angle"]
        for g in origin["GEOLOCATION_GRID_ADS"]
        for grp in ("first", "last")
        for pt in g[f"{grp}_line_tie_points"]
    ]
    meta["incidence_nr"] = min(angles)
    meta["incidence_fr"] = max(angles)
    meta["incidence"] = (meta["incidence_nr"] + meta["incidence_fr"]) / 2

    # published acquisition characteristics absent from the product file
    # (reference drivers.py:1795-1801). NOTE: called unconditionally like
    # the reference, so APM/IMM medium-resolution products raise KeyError
    # here exactly as they do upstream (the table has no MR rows) —
    # kept bug-for-bug.
    res_rg, res_az, nesz_nr, nesz_fr = get_resolution_nesz(
        sensor=meta["sensor"],
        mode=meta["acquisition_mode"],
        swath_id=origin["SPH"]["SWATH"],
        date=meta["start"],
    )
    meta["resolution"] = (res_rg, res_az)
    meta["nesz"] = (nesz_nr, nesz_fr)

    meta["projection"] = WKT4326
    return meta


def esa_geo_grid(blob: bytes) -> list[dict]:
    """Tie-point rows per granule first/last line (drivers.py:1843-1869)."""
    meta = parse_esa(blob)
    rows = []
    for granule in meta["origin"]["GEOLOCATION_GRID_ADS"]:
        line_first = granule["line_num"]
        line_last = granule["line_num"] + granule["num_lines"] - 1
        for group in ("first", "last"):
            az_time = granule[f"{group}_zero_doppler_time"]
            line = line_first if group == "first" else line_last
            for pt in granule[f"{group}_line_tie_points"]:
                rows.append(
                    {
                        "swath": granule["swath_number"],
                        "azimuthTime": az_time.isoformat(),
                        "slantRangeTime": pt["slant_range_time"],
                        "line": line,
                        "pixel": pt["sample_number"],
                        "incidenceAngle": pt["incident_angle"],
                        "lon": pt["longitude"],
                        "lat": pt["latitude"],
                    }
                )
    return rows
