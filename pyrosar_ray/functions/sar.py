"""SAR physics + auxiliary scalar kernels.

Behavioral reimplementations (no code reuse) of the reference's
remaining scalar operators:

- ``s1_resolution`` — Sentinel-1 mid-swath resolution from Hamming
  window coefficients and IRW broadening factors
  (pyroSAR/drivers.py:2134-2203)
- ``passdb_lookup`` — ERS pass interval lookup with the ERS1→ERS2
  substitution after the cutoff date and ``orbitNumber_rel =
  ceil(pass/2)`` (pyroSAR/ERS/auxil.py:83-129); the pass table is a
  broadcastable numpy struct, the lookup vectorized searchsorted
- ``rgba_quicklook`` — per-pixel black→transparent RGBA rewrite of the
  KMZ quicklook export (pyroSAR/drivers.py:2083-2132)
- ``create_dummy_dem`` — 1×1-px zero raster spanning an extent, the
  all-ocean fallback (pyroSAR/auxdata.py:634-661)
- ``envi_hdr`` — ENVI header synthesis for raw binary tiles
  (pyroSAR/auxdata.py:1552-1596)
"""

from __future__ import annotations

from datetime import datetime
from math import ceil, radians, sin

import numpy as np

_C = 299792458.0

#: Sentinel-1 product definition: Hamming window coefficient → IRW
#: broadening factor (reference table drivers.py:2173-2174)
_HAMMING_COEFFS = (0.52, 0.6, 0.61, 0.62, 0.63, 0.65, 0.70, 0.72, 0.73, 0.75)
_B_FACTORS = (1.54, 1.32, 1.3, 1.28, 1.27, 1.24, 1.18, 1.16, 1.15, 1.13)


def irw_broadening(window_coefficient: float) -> float:
    """IRW broadening factor for a Hamming window coefficient."""
    return _B_FACTORS[_HAMMING_COEFFS.index(window_coefficient)]


#: ESA-published acquisition characteristics absent from ERS-1/2 and
#: ENVISAT ASAR product metadata (reference: pyroSAR/ERS/mapping.py:3-252).
#: NESZ is an instrument+swath property (mode-independent for ASAR), so it
#: is factored out of the per-mode resolution tables: swath → (near-range
#: NESZ, far-range NESZ) in dB.
_ASAR_NESZ = {
    "IS1": (25.1, 19.2),
    "IS2": (21.8, 20.5),
    "IS3": (22.6, 20.5),
    "IS4": (22.3, 19.1),
    "IS5": (21.4, 19),
    "IS6": (24, 21.2),
    "IS7": (23, 20.4),
}

#: ASAR range resolution [m] per mode and swath. APP carries a pre/post
#: 2009-05-28 pair (processor update changed the ground-range resolution).
_ASAR_RES_RG = {
    "IMP": {"IS1": 30.86, "IS2": 24.90, "IS3": 24.84, "IS4": 25.56,
            "IS5": 25.73, "IS6": 26.15, "IS7": 26.59},
    "IMS": {s: 5.77 for s in _ASAR_NESZ},
    "APP": {"IS1": (31.22, 31.22), "IS2": (25.23, 24.10),
            "IS3": (24.74, 24.30), "IS4": (25.46, 25.30),
            "IS5": (25.70, 25.35), "IS6": (26.07, 25.90),
            "IS7": (26.53, 26.32)},
    "APS": {s: 4.3 for s in _ASAR_NESZ},
    "WSM": {"WS": 150},
    "WSS": {"WS": None},
}

#: ASAR azimuth resolution [m] per mode (swath-independent).
_ASAR_RES_AZ = {"IMP": 22.14, "IMS": 8.43, "APP": 27.45, "APS": 8.39,
                "WSM": 150, "WSS": None}

#: ASAR NESZ overrides for the wide-swath modes.
_ASAR_WS_NESZ = {"WSM": (19.5, 23.5), "WSS": (None, None)}

#: ERS-1/2 characteristics: (sensor, mode) → (res_rg, res_az, nesz_nr,
#: nesz_fr); ERS only images swath IS2.
_ERS_RES_NESZ = {
    ("ERS1", "IMP"): (25.04, 21.51, 26.8, 26),
    ("ERS1", "IMS"): (5.32, 9.66, 26.8, 26),
    ("ERS2", "IMP"): (21.63, 25.19, 23.1, 21.5),
    ("ERS2", "IMS"): (5.33, 9.83, 23.1, 21.5),
}

#: 1-sigma uncertainty [%] of the published resolution figures per
#: (sensor, mode) (reference 'std_dev' entries).
RESOLUTION_STD_DEV = {
    ("ERS1", "IMP"): 20, ("ERS1", "IMS"): 20,
    ("ERS2", "IMP"): 20, ("ERS2", "IMS"): 20,
    ("ASAR", "IMP"): 5, ("ASAR", "IMS"): 5,
    ("ASAR", "APP"): 10, ("ASAR", "APS"): 10,
    ("ASAR", "WSM"): 20, ("ASAR", "WSS"): None,
}


def get_resolution_nesz(
    sensor: str, mode: str, swath_id: str, date: str
) -> tuple[float | None, float | None, float | None, float | None]:
    """Range/azimuth resolution and near/far-range NESZ lookup.

    Twin of the reference's table function (pyroSAR/ERS/mapping.py:254-286):
    returns ``(res_rg, res_az, nesz_nr, nesz_fr)`` for an ERS-1/2 or ASAR
    acquisition; raises ``KeyError`` for unknown sensor/mode/swath combos
    exactly like the reference's nested-dict lookup. The APP cutover uses
    the reference's raw string comparison ``date > '20090528'``, so a full
    ``YYYYmmddTHHMMSS`` stamp ON the cutover day already selects the new
    value while a bare ``'20090528'`` does not — kept bug-for-bug.
    """
    if sensor in ("ERS1", "ERS2"):
        if swath_id != "IS2":
            raise KeyError(swath_id)
        res_rg, res_az, nesz_nr, nesz_fr = _ERS_RES_NESZ[(sensor, mode)]
        return res_rg, res_az, nesz_nr, nesz_fr
    if sensor != "ASAR":
        raise KeyError(sensor)
    res_rg = _ASAR_RES_RG[mode][swath_id]
    if mode == "APP":
        res_rg = res_rg[1] if date > "20090528" else res_rg[0]
    nesz_nr, nesz_fr = _ASAR_WS_NESZ.get(mode) or _ASAR_NESZ[swath_id]
    return res_rg, _ASAR_RES_AZ[mode], nesz_nr, nesz_fr


def s1_resolution(
    swaths: list[dict],
    image_geometry: str = "SLANT_RANGE",
    incidence: float | None = None,
) -> tuple[float, float]:
    """Mid-swath (range, azimuth) resolution, median over sub-swaths.

    Each swath dict carries the annotation fields: ``wrg brg lbrg``
    (range window coefficient, processing & look bandwidth), ``waz baz
    lbaz`` (azimuth equivalents) and ``sp_az ti_az`` (azimuth pixel
    spacing & time interval). GROUND_RANGE geometry divides the range
    resolution by sin(incidence) (drivers.py:2199-2200).
    """
    res_rg, res_az = [], []
    for sw in swaths:
        lrg = sw["brg"] / sw["lbrg"]
        res_rg.append(0.886 * _C / (2 * sw["brg"]) * irw_broadening(sw["wrg"]) * lrg)
        laz = sw["baz"] / sw["lbaz"]
        vsat = sw["sp_az"] / sw["ti_az"]
        res_az.append(0.886 * vsat / sw["baz"] * irw_broadening(sw["waz"]) * laz)
    rg = float(np.median(res_rg))
    az = float(np.median(res_az))
    if image_geometry == "GROUND_RANGE":
        rg /= sin(radians(incidence))
    return rg, az


# ----------------------------------------------------------------- ERS

#: after this timestamp ERS-1 acquisitions use the ERS-2 pass table
ERS1_CUTOVER = datetime.strptime("1996-06-02 21:59:26.618659", "%Y-%m-%d %H:%M:%S.%f")


class PassTable:
    """Broadcastable ERS pass-interval table with vectorized lookup.

    Rows: (satellite, start, end, phase, cycle, pass_number), intervals
    non-overlapping per satellite. Lookup semantics mirror
    passdb_query: ERS1 after the cutover (or with no ERS1 row covering
    the time) falls through to the ERS2 table; the returned
    ``orbitNumber_rel`` is ``ceil(pass/2)``.
    """

    def __init__(self, rows: list[tuple]):
        self.tables = {}
        for sat in ("ERS1", "ERS2"):
            rs = sorted(r for r in rows if r[0] == sat)
            starts = np.array([r[1] for r in rs], dtype="datetime64[us]")
            ends = np.array([r[2] for r in rs], dtype="datetime64[us]")
            meta = [(r[3], r[4], r[5]) for r in rs]
            self.tables[sat] = (starts, ends, meta)

    def _probe(self, sat: str, t: np.datetime64):
        starts, ends, meta = self.tables[sat]
        if len(starts) == 0:
            return None
        i = int(np.searchsorted(starts, t, side="right")) - 1
        if i < 0 or t > ends[i]:
            return None
        return meta[i]

    def lookup(self, satellite: str, acqtime: datetime) -> dict | None:
        if satellite not in ("ERS1", "ERS2"):
            raise ValueError(
                f"satellite must be either 'ERS1' or 'ERS2', was '{satellite}'"
            )
        sat = "ERS2" if satellite == "ERS1" and acqtime > ERS1_CUTOVER else satellite
        t = np.datetime64(acqtime, "us")
        hit = self._probe(sat, t) or self._probe("ERS2", t)
        if hit is None:
            return None
        phase, cycle, pass_number = hit
        return {
            "satellite": satellite,
            "phase": phase,
            "cycleNumber": cycle,
            "passNumber": pass_number,
            "orbitNumber_rel": int(ceil(pass_number / 2.0)),
        }


# ------------------------------------------------------------ raster aux


def rgba_quicklook(rgb: np.ndarray) -> np.ndarray:
    """RGB uint8 → RGBA with black pixels fully transparent."""
    rgb = np.asarray(rgb, dtype=np.uint8)
    alpha = np.where((rgb == 0).all(axis=2), 0, 255).astype(np.uint8)
    return np.dstack([rgb, alpha])


_KML_TEMPLATE = """<?xml version="1.0" encoding="UTF-8"?>
<kml xmlns="http://www.opengis.net/kml/2.2">
  <GroundOverlay>
    <name>{name}</name>
    <Icon><href>quick-look.png</href></Icon>
    <LatLonBox>
      <north>{north}</north><south>{south}</south>
      <east>{east}</east><west>{west}</west>
    </LatLonBox>
  </GroundOverlay>
</kml>
"""


def export_kmz(
    rgb: np.ndarray,
    outname: str,
    *,
    name: str,
    bbox: dict,
    na_transparent: bool = True,
) -> None:
    """Write a real KMZ quicklook: doc.kml + quick-look.png in a zip.

    Engine twin of ``ID.quicklook`` (pyroSAR/drivers.py:2083-2132): the
    reference repackages the scene's bundled overlay KML and PNG,
    rewriting black pixels transparent via PIL; here the KML is built
    from the scene's bbox and the PNG is encoded by the pure-Python
    codec (functions/png.py) — no imaging library needed.
    ``name`` plays the reference's outname_base title substitution.
    """
    import zipfile

    from .png import encode_png

    arr = rgba_quicklook(rgb) if na_transparent else np.asarray(rgb, dtype=np.uint8)
    kml = _KML_TEMPLATE.format(
        name=name,
        north=bbox["ymax"],
        south=bbox["ymin"],
        east=bbox["xmax"],
        west=bbox["xmin"],
    )
    with zipfile.ZipFile(outname, "w") as out:
        out.writestr("doc.kml", kml)
        out.writestr("quick-look.png", encode_png(arr))


def create_dummy_dem(extent: dict, res: float = 0.001) -> dict:
    """Zero-elevation raster descriptor spanning an extent (ocean fallback).

    Mirrors the reference's 1-px dummy (auxdata.py:634-661): data is a
    1×1 zero array; the geotransform stretches it over the extent.
    """
    xmin, ymax = float(extent["xmin"]), float(extent["ymax"])
    width = float(extent["xmax"]) - xmin
    height = ymax - float(extent["ymin"])
    return {
        "data": np.zeros((1, 1), dtype=np.float32),
        "geotransform": (xmin, width, 0.0, ymax, 0.0, -height),
        "nodata": None,
        "crs": "EPSG:4326",
    }


def envi_hdr(samples: int, lines: int, ulx: float, uly: float, step: float,
             dtype: int = 2, byte_order: int = 1) -> str:
    """Synthesize an ENVI header for a raw binary tile
    (reference shape: auxdata.py:1552-1596)."""
    return "\n".join(
        [
            "ENVI",
            f"samples = {samples}",
            f"lines = {lines}",
            "bands = 1",
            "header offset = 0",
            "file type = ENVI Standard",
            f"data type = {dtype}",
            "interleave = bsq",
            f"byte order = {byte_order}",
            f"map info = {{Geographic Lat/Lon, 1, 1, {ulx}, {uly}, {step}, {step}, WGS-84}}",
            "coordinate system string = {GEOGCS[\"WGS 84\",DATUM[\"WGS_1984\","
            "SPHEROID[\"WGS 84\",6378137,298.257223563]],PRIMEM[\"Greenwich\",0],"
            "UNIT[\"degree\",0.0174532925199433]]}",
        ]
    )


_ENVI_NP_DTYPES = {
    1: "u1", 2: "i2", 3: "i4", 4: "f4", 5: "f8",
    12: "u2", 13: "u4", 14: "i8", 15: "u8",
}


def parse_envi_hdr(text: str) -> dict:
    """ENVI header grammar → dict (the reader for :func:`envi_hdr` and
    for SNAP's tie-point-grid sidecars): ``key = value`` lines, braces
    for multi-valued entries, keys lower-cased."""
    out: dict = {}
    key, buf = None, None
    for line in text.splitlines():
        line = line.strip()
        if not line or line == "ENVI":
            continue
        if buf is not None:
            buf += " " + line
            if line.endswith("}"):
                out[key] = buf.strip("{} ")
                key, buf = None, None
            continue
        if "=" not in line:
            continue
        key, _, val = (x.strip() for x in line.partition("="))
        key = key.lower()
        if val.startswith("{") and not val.endswith("}"):
            buf = val
        else:
            out[key] = val.strip("{} ")
            key = None
    return out


def read_envi(img: bytes, hdr_text: str) -> "np.ndarray":
    """Decode a single-band ENVI raster from its raw bytes + header.

    The GDAL-free read the reference's BEAM_DIMAP incidence fallback
    needs (drivers.py:912-918 opens ``incident_angle.img`` with GDAL):
    dtype/shape/byte-order from the header, one ``np.frombuffer``.
    """
    h = parse_envi_hdr(hdr_text)
    samples, lines = int(h["samples"]), int(h["lines"])
    bands = int(h.get("bands", 1))
    if bands != 1:
        raise ValueError(f"only single-band ENVI rasters are supported (bands={bands})")
    code = int(h.get("data type", 4))
    if code not in _ENVI_NP_DTYPES:
        raise ValueError(f"unsupported ENVI data type code {code}")
    endian = ">" if int(h.get("byte order", 0)) == 1 else "<"
    dt = np.dtype(endian + _ENVI_NP_DTYPES[code])
    offset = int(h.get("header offset", 0))
    arr = np.frombuffer(img, dtype=dt, count=samples * lines, offset=offset)
    return arr.reshape(lines, samples)
