"""ALOS PALSAR-1/2 CEOS grammar: big-endian leader (LED) records.

Parser parity targets (reference ``CEOS_PSR.scanMetadata``,
/root/reference/pyroSAR/drivers.py:1199-1460):

- file descriptor: total length at bytes 8:12 ('>i'), record counts and
  lengths as ASCII ints at fixed offsets (180:240, 252:264), sensor from
  the 'AL1'/'AL2' code at 48:51
- LED filename grammar (patterns.ceos_psr1/2) → acquisition_mode, product
- dataSetSummary: scene id at 20:52 (orbit/frame via per-sensor regexes),
  lines×2 at 324:332, samples×2 at 332:340, incidence at 484:492,
  wavelength×100 at 500:516
- mapProjectionData: corner lats at 1072/1104/1136/1168, lons at
  1088/1120/1152/1184 (16-char ASCII floats), zipped (lon, lat)
- orbitsPerCycle 671 (PSR1) / 207 (PSR2) → rel orbit + cycle number
- summary.txt KEY="value" pairs; polarizations from IMG-* member names
- start/stop from Img_SceneStartDateTime/EndDateTime ('%Y%m%d %H:%M:%S.%f')

The builder emits a structurally-real leader with synthetic content.
"""

from __future__ import annotations

import re
import struct

from .common import WKT4326, parse_date, tar_blob

PATTERN_PSR1 = (
    r"^LED-ALPSR"
    r"(?P<sub>P|S)"
    r"(?P<orbit>[0-9]{5})"
    r"(?P<frame>[0-9]{4})-"
    r"(?P<mode>[HWDPC])"
    r"(?P<level>1\.[015])"
    r"(?P<proc>G|_)"
    r"(?P<proj>[UPML_])"
    r"(?P<orbit_dir>A|D)$"
)
PATTERN_PSR2 = (
    r"^LED-ALOS2"
    r"(?P<orbit>[0-9]{5})"
    r"(?P<frame>[0-9]{4})-"
    r"(?P<date>[0-9]{6})-"
    r"(?P<mode>SBS|UBS|UBD|HBS|HBD|HBQ|FBS|FBD|FBQ|WBS|WBD|WWS|WWD|VBS|VBD)"
    r"(?P<look_dir>L|R)"
    r"(?P<level>1\.0|1\.1|1\.5|2\.1|3\.1)"
    r"(?P<proc>[GR_])"
    r"(?P<proj>[UPML_])"
    r"(?P<orbit_dir>A|D)$"
)

_DSS_LEN = 4096
_MPD_LEN = 4680
ORBITS_PER_CYCLE = {"PSR1": 671, "PSR2": 207}


def _put(buf: bytearray, offset: int, data: bytes) -> None:
    buf[offset : offset + len(data)] = data


def _ascii_int(value: int, width: int) -> bytes:
    return str(int(value)).rjust(width).encode()


# ----------------------------------------------------------------- builder


def build_ceos_psr_blob(meta: dict) -> bytes:
    """Deterministic CEOS tar: LED leader + summary.txt + IMG-* members.

    ``meta`` needs the 16-attribute values; only PSR2 naming is emitted
    (the parser handles both grammars).
    """
    orbit_abs = int(meta["orbitNumber_abs"])
    frame = int(meta["frameNumber"])
    obs_day = meta["start"][2:8]  # YYmmdd
    level = meta["product"]
    mode = meta["acquisition_mode"]
    orbit_dir = meta["orbit"]
    led_name = f"LED-ALOS2{orbit_abs:05d}{frame:04d}-{obs_day}-{mode}R{level}GU{orbit_dir}"

    fd = bytearray(b" " * 720)
    _put(fd, 8, struct.pack(">i", 720))
    _put(fd, 48, b"AL2")
    _put(fd, 180, _ascii_int(1, 6))          # dss_n
    _put(fd, 186, _ascii_int(_DSS_LEN, 6))   # dss_l
    _put(fd, 192, _ascii_int(1, 6))          # mpd_n
    _put(fd, 198, _ascii_int(_MPD_LEN, 6))   # mpd_l
    for off in (204, 210, 216, 222, 228, 234, 252, 258):
        _put(fd, off, _ascii_int(0, 6))      # ppd/adr/rdr/dqs zeroed

    dss = bytearray(b" " * _DSS_LEN)
    scene_id = f"ALOS2{orbit_abs:05d}{frame:04d}-{obs_day}" + " " * 11
    _put(dss, 20, scene_id.encode())
    _put(dss, 324, _ascii_int(meta["lines"] // 2, 8))
    _put(dss, 332, _ascii_int(meta["samples"] // 2, 8))
    _put(dss, 484, f"{meta.get('incidence', 36.6):8.3f}".encode())
    _put(dss, 500, f"{meta.get('wavelength_cm', 22.9) / 100.0:16.7f}".encode())
    looks_rg, looks_az = meta.get("looks", (4.0, 4.0))
    _put(dss, 1174, f"{looks_az:16.7f}".encode())
    _put(dss, 1190, f"{looks_rg:16.7f}".encode())
    orbit_txt = {"A": "ASCENDING", "D": "DESCENDING"}[orbit_dir]
    _put(dss, 1534, orbit_txt[:8].ljust(8).encode())
    rg_sp, az_sp = meta["spacing"]
    _put(dss, 1686, f"{az_sp:16.7f}".encode())
    _put(dss, 1702, f"{rg_sp:16.7f}".encode())
    if level == "1.5":
        _put(dss, 148, f"{meta.get('heading_scene', 349.0):16.7f}".encode())
        _put(dss, 468, f"{meta.get('heading', 349.0):8.3f}".encode())

    mpd = bytearray(b" " * _MPD_LEN)
    # projdesc left blank → geographic WGS84 branch (drivers.py:1303-1341)
    coords = meta["coordinates"]
    if len(coords) != 4:
        raise ValueError("CEOS map projection record carries exactly 4 corners")
    for i, (lon, lat) in enumerate(coords):
        _put(mpd, 1072 + 32 * i, f"{lat:16.7f}".encode())
        _put(mpd, 1088 + 32 * i, f"{lon:16.7f}".encode())

    led = bytes(fd) + bytes(dss) + bytes(mpd)
    start_txt = (
        f"{meta['start'][:8]} {meta['start'][9:11]}:{meta['start'][11:13]}:"
        f"{meta['start'][13:15]}.000"
    )
    stop_txt = (
        f"{meta['stop'][:8]} {meta['stop'][9:11]}:{meta['stop'][11:13]}:"
        f"{meta['stop'][13:15]}.000"
    )
    summary = (
        f'Img_SceneStartDateTime="{start_txt}"\n'
        f'Img_SceneEndDateTime="{stop_txt}"\n'
        f'Pdi_NoOfLines="{meta["lines"]}"\n'
        f'Pdi_NoOfPixels="{meta["samples"]}"'
    )
    members = {led_name: led, "summary.txt": summary.encode()}
    for pol in meta["polarizations"]:
        members[f"IMG-{pol}-ALOS2{orbit_abs:05d}{frame:04d}-{obs_day}-{mode}R{level}GU{orbit_dir}"] = b""
    return tar_blob(members)


# ------------------------------------------------------------------ parser


def _led_member(members: list[str]):
    for pattern in (PATTERN_PSR1, PATTERN_PSR2):
        for m in members:
            match = re.match(pattern, m.split("/")[-1])
            if match:
                return m, match
    return None, None


def sniff_ceos_psr(blob: bytes, members: list[str] | None = None) -> bool:
    if members is None:
        from ..drivers import list_members

        try:
            members = list_members(blob)
        except ValueError:
            return False
    return _led_member(members)[0] is not None


def _parse_summary(text: str) -> dict:
    out = {}
    for key, val in re.findall(r'([A-Za-z0-9_]+)\s*=\s*"([^"]*)"', text):
        try:
            out[key] = int(val)
        except ValueError:
            try:
                out[key] = float(val)
            except ValueError:
                out[key] = val
    return out


def parse_ceos_psr(blob: bytes) -> dict:
    from ..drivers import get_member, list_members

    members = list_members(blob)
    led_name, match = _led_member(members)
    if led_name is None:
        raise ValueError("no CEOS leader member")
    led = get_member(blob, led_name)

    meta: dict = {}
    summary_members = [m for m in members if re.search("summary|workreport", m)]
    if summary_members:
        meta.update(_parse_summary(get_member(blob, summary_members[0]).decode()))

    meta["polarizations"] = [
        re.search("[HV]{2}", m.split("/")[-1]).group(0)
        for m in members
        if m.split("/")[-1].startswith("IMG-")
    ]

    meta["start"] = parse_date(str(meta["Img_SceneStartDateTime"]))
    meta["stop"] = parse_date(str(meta["Img_SceneEndDateTime"]))

    p1 = struct.unpack(">i", led[8:12])[0]
    fd = led[:p1]
    dss_n, dss_l = int(fd[180:186]), int(fd[186:192])
    mpd_n, mpd_l = int(fd[192:198]), int(fd[198:204])
    meta["sensor"] = {"AL1": "PSR1", "AL2": "PSR2"}[fd[48:51].decode()]

    if meta["sensor"] == "PSR1":
        meta["acquisition_mode"] = match.group("sub") + match.group("mode")
    else:
        meta["acquisition_mode"] = match.group("mode")
    meta["product"] = match.group("level")

    p0, p1 = p1, p1 + dss_l * dss_n
    dss = led[p0:p1]
    mpd = led[p1 : p1 + mpd_l * mpd_n] if mpd_n > 0 else None

    if mpd is not None:
        lat = [float(mpd[o : o + 16]) for o in (1072, 1104, 1136, 1168)]
        lon = [float(mpd[o : o + 16]) for o in (1088, 1120, 1152, 1184)]
        meta["coordinates"] = list(zip(lon, lat))
        # blank projdesc → geographic WGS84 (drivers.py:1306-1341 default)
        meta["projection"] = WKT4326

    scene_id = dss[20:52].decode("ascii")
    if meta["sensor"] == "PSR1":
        pattern = (
            r"(?P<sat_id>[A-Z]{2})(?P<sensor_id>[A-Z]{3})(?P<sensor_id_sub>[A-Z])"
            r"(?P<orbitNumber>[0-9]{5})(?P<frameNumber>[0-9]{4})"
        )
    else:
        pattern = (
            r"(?P<sat_id>[A-Z0-9]{5})(?P<orbitNumber>[0-9]{5})"
            r"(?P<frameNumber>[0-9]{4})-(?P<obs_day>[0-9]{6})[ ]{11}"
        )
    sid = re.match(pattern, scene_id)
    per_cycle = ORBITS_PER_CYCLE[meta["sensor"]]
    meta["orbitNumber_abs"] = int(sid.group("orbitNumber"))
    meta["orbitNumber_rel"] = meta["orbitNumber_abs"] % per_cycle
    meta["cycleNumber"] = meta["orbitNumber_abs"] // per_cycle + 1
    meta["frameNumber"] = int(sid.group("frameNumber"))

    try:
        meta["lines"] = int(dss[324:332]) * 2
    except ValueError:
        meta["lines"] = meta.get("Pdi_NoOfLines")
    try:
        meta["samples"] = int(dss[332:340]) * 2
    except ValueError:
        meta["samples"] = meta.get("Pdi_NoOfPixels")
    meta["incidence"] = float(dss[484:492])
    meta["wavelength"] = float(dss[500:516]) * 100  # cm
    try:
        azlks = float(dss[1174:1190])
        rlks = float(dss[1190:1206])
        meta["looks"] = (rlks, azlks)
    except ValueError:
        meta["looks"] = (None, None)
    meta["orbit"] = dss[1534:1542].decode().strip()[0]
    try:
        spacing_az = float(dss[1686:1702])
        spacing_rg = float(dss[1702:1718])
        meta["spacing"] = (spacing_rg, spacing_az)
    except ValueError:
        meta["spacing"] = (None, None)
    return meta
