"""BEAM-DIMAP grammar: the SNAP ``.dim`` XML product header.

Parser parity targets (reference ``BEAM_DIMAP.scanMetadata``,
/root/reference/pyroSAR/drivers.py:795-946):

- attributes live under ``MDElem[@name='Abstracted_Metadata']`` as
  ``MDATTR[@name=...]`` elements; a value of ``99999``/``99999.0`` is a
  missing-data sentinel treated like an absent attribute
- fallback chains: ``cycleNumber`` ← ``orbit_cycle`` | ``CYCLE``,
  ``frameNumber`` ← ``data_take_id`` | ``ABS_ORBIT``
- the MISSION → sensor map (ENVISAT→ASAR, SENTINEL-1x→S1x, ERS1/2)
- S1 sensors read ACQUISITION_MODE + the ``PRODUCT_TYPE`` element;
  ASAR/ERS derive mode from ``PRODUCT_TYPE[4:7]`` and product from the
  APS/IMS/WSS→SLC, APP/IMP→PRI, APM/IMM/WSM→MR table
- polarizations = distinct ``MDATTR[@desc='Polarization']`` texts,
  dropping empties and '-'-combined entries
- spacing rounded to 6 digits; ``srgr_flag`` → GROUND/SLANT_RANGE
- start/stop parsed from ``PRODUCT_SCENE_RASTER_*_TIME`` in
  ``%d-%b-%Y %H:%M:%S.%f`` form
- incidence: mean of ``incidence_near``/``incidence_far`` when present,
  else the mean of all ``incidenceAngleMidSwath`` attributes, else the
  nonzero mean of the ``.data/tie_point_grids/incident_angle.img``
  sidecar raster (drivers.py:912-918) — the sidecar travels inside a
  zipped SNAP product blob and is decoded with the GDAL-free ENVI
  reader (functions/sar.read_envi)
- projection from the ``WKT`` element (left-stripped), else EPSG:4326
- the corner quad is assembled from the eight
  ``{first,last}_{far,near}_{lat,long}`` attributes in near→far order

The builder emits the same structure with synthetic content so the
round-trip (build → blob → parse) is testable without SNAP output.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from statistics import mean

from .common import WKT4326, parse_date

_MISSIONS = {
    "ENVISAT": "ASAR",
    "ERS1": "ERS1",
    "ERS2": "ERS2",
    "SENTINEL-1A": "S1A",
    "SENTINEL-1B": "S1B",
    "SENTINEL-1C": "S1C",
    "SENTINEL-1D": "S1D",
}
_MISSIONS_INV = {v: k for k, v in _MISSIONS.items()}

#: ESA product-type → product level (reference drivers.py:850-858)
_ESA_PRODUCTS = {
    "APS": "SLC", "IMS": "SLC", "WSS": "SLC",
    "APP": "PRI", "IMP": "PRI",
    "APM": "MR", "IMM": "MR", "WSM": "MR",
}


def _stamp_to_dimap(stamp: str) -> str:
    """``YYYYmmddTHHMMSS`` → ``DD-MON-YYYY HH:MM:SS.000000``."""
    import time

    t = time.strptime(stamp, "%Y%m%dT%H%M%S")
    return time.strftime("%d-%b-%Y %H:%M:%S.000000", t).upper()


# ----------------------------------------------------------------- builder


def build_dimap_blob(meta: dict, omit: tuple[str, ...] = ()) -> bytes:
    """Deterministic ``.dim`` XML with the real DIMAP element layout.

    ``omit`` drops named MDATTRs (to exercise the parser's fallback
    chains); a meta value of ``99999`` round-trips as the sentinel.
    """
    sensor = meta["sensor"]
    mission = _MISSIONS_INV[sensor]
    is_s1 = sensor.startswith("S1")
    rg, az = meta["spacing"]
    looks = meta.get("looks", (1.0, 1.0))
    pols = meta.get("polarizations", ["VV"])
    srgr = 1 if meta.get("image_geometry", "GROUND_RANGE") == "GROUND_RANGE" else 0
    passdir = {"A": "ASCENDING", "D": "DESCENDING"}[meta["orbit"]]

    attrs: list[tuple[str, object]] = [("MISSION", mission)]
    if is_s1:
        attrs.append(("ACQUISITION_MODE", meta["acquisition_mode"]))
    else:
        # e.g. 'ASA_IMP_1P' with mode at [4:7]
        attrs.append(("PRODUCT_TYPE", f"ASA_{meta['acquisition_mode']}_1P"))
    attrs += [
        ("Processing_system_identifier", meta.get("IPF_version", "ESA 6.07")),
        ("PASS", passdir),
        ("range_spacing", rg),
        ("azimuth_spacing", az),
        ("range_looks", float(looks[0])),
        ("azimuth_looks", float(looks[1])),
        ("ABS_ORBIT", meta["orbitNumber_abs"]),
        ("REL_ORBIT", meta["orbitNumber_rel"]),
        ("orbit_cycle", meta.get("cycleNumber", 99999)),
        ("CYCLE", meta.get("cycleNumber", 99999)),
        ("data_take_id", meta.get("frameNumber", 99999)),
        ("SWATH", meta.get("swath", meta["acquisition_mode"])),
        ("srgr_flag", srgr),
        ("incidence_near", meta.get("incidence_near", 99999)),
        ("incidence_far", meta.get("incidence_far", 99999)),
    ]
    (fnlon, fnlat), (lnlon, lnlat), (lflon, lflat), (fflon, fflat) = meta["coordinates"]
    attrs += [
        ("first_near_lat", fnlat), ("first_near_long", fnlon),
        ("first_far_lat", fflat), ("first_far_long", fflon),
        ("last_near_lat", lnlat), ("last_near_long", lnlon),
        ("last_far_lat", lflat), ("last_far_long", lflon),
    ]
    md = "".join(
        f'<MDATTR name="{k}" type="ascii">{v}</MDATTR>'
        for k, v in attrs
        if k not in omit
    )
    pol_md = "".join(
        f'<MDATTR name="mds{i + 1}_tx_rx_polar" desc="Polarization" type="ascii">{p}'
        "</MDATTR>"
        for i, p in enumerate(pols)
    )
    inc_mid = "".join(
        f'<MDATTR name="incidenceAngleMidSwath" type="float64">{v!r}</MDATTR>'
        for v in meta.get("incidence_mid", [])
    )
    prod_type_el = (
        f"<PRODUCT_TYPE>{meta['product']}</PRODUCT_TYPE>" if is_s1 else ""
    )
    wkt = meta.get("projection")
    wkt_el = f"<WKT>  {wkt}</WKT>" if wkt else ""
    xml = (
        '<?xml version="1.0" encoding="ISO-8859-1"?>\n'
        "<Dimap_Document>"
        "<Metadata_Id>"
        '<METADATA_FORMAT version="2.12.1">DIMAP</METADATA_FORMAT>'
        "</Metadata_Id>"
        f"<Production>{prod_type_el}"
        f"<PRODUCT_SCENE_RASTER_START_TIME>{_stamp_to_dimap(meta['start'])}"
        "</PRODUCT_SCENE_RASTER_START_TIME>"
        f"<PRODUCT_SCENE_RASTER_STOP_TIME>{_stamp_to_dimap(meta['stop'])}"
        "</PRODUCT_SCENE_RASTER_STOP_TIME>"
        "</Production>"
        f"<Coordinate_Reference_System>{wkt_el}</Coordinate_Reference_System>"
        "<Raster_Dimensions>"
        f"<NCOLS>{meta['samples']}</NCOLS>"
        f"<NROWS>{meta['lines']}</NROWS>"
        f"<NBANDS>{meta.get('bands', len(pols))}</NBANDS>"
        "</Raster_Dimensions>"
        "<Image_Interpretation><Spectral_Band_Info>"
        f"<BAND_RASTER_WIDTH>{meta['samples']}</BAND_RASTER_WIDTH>"
        f"<BAND_RASTER_HEIGHT>{meta['lines']}</BAND_RASTER_HEIGHT>"
        "</Spectral_Band_Info></Image_Interpretation>"
        "<Dataset_Sources>"
        '<MDElem name="metadata">'
        '<MDElem name="Abstracted_Metadata">'
        f"{md}{pol_md}{inc_mid}"
        "</MDElem>"
        "</MDElem>"
        "</Dataset_Sources>"
        "</Dimap_Document>"
    )
    return xml.encode("iso-8859-1")


# ------------------------------------------------------------------ parser


def sniff_dimap(blob: bytes, members=None) -> bool:
    if members is None:
        return b"<Dimap_Document" in blob[:512]
    # zipped SNAP product: the .dim header plus its .data sidecar dir
    return any(m.endswith(".dim") for m in members)


class _Missing(RuntimeError):
    pass


def _get_by_name(root, attr, section: str = "Abstracted_Metadata") -> str:
    """MDATTR lookup with the 99999 sentinel and list fallback chains
    (reference drivers.py:820-833)."""
    if isinstance(attr, (list, tuple)):
        for item in attr:
            try:
                return _get_by_name(root, item, section)
            except _Missing:
                continue
        raise _Missing("|".join(attr))
    element = root.find(f'.//MDElem[@name="{section}"]')
    out = None if element is None else element.find(f'.//MDATTR[@name="{attr}"]')
    if out is None or out.text in ("99999", "99999.0"):
        raise _Missing(attr)
    return out.text


def _split_product_zip(blob: bytes) -> tuple[bytes, dict[str, bytes]]:
    """A zipped SNAP product → (the .dim header, sidecar members keyed
    by path inside the ``.data`` directory)."""
    import io
    import zipfile

    with zipfile.ZipFile(io.BytesIO(blob)) as zf:
        names = zf.namelist()
        dim_name = next(n for n in sorted(names) if n.endswith(".dim"))
        sidecar = {
            n: zf.read(n)
            for n in names
            if ".data/" in n and not n.endswith("/")
        }
        return zf.read(dim_name), sidecar


def parse_dimap(blob: bytes) -> dict:
    """Full 16-attribute record + extras from a ``.dim`` header.

    Accepts either the bare ``.dim`` XML or a zipped SNAP product
    (``.dim`` + ``.data`` sidecar directory); in the latter case the
    tie-point-grid incidence raster is available as the reference's
    third incidence fallback (drivers.py:912-918).
    """
    sidecar: dict[str, bytes] = {}
    if blob[:2] == b"PK":
        blob, sidecar = _split_product_zip(blob)
    root = ET.fromstring(blob.decode("iso-8859-1"))
    get = lambda attr: _get_by_name(root, attr)  # noqa: E731

    meta: dict = {}
    meta["sensor"] = _MISSIONS[get("MISSION")]
    if meta["sensor"].startswith("S1"):
        meta["acquisition_mode"] = get("ACQUISITION_MODE")
        meta["product"] = root.find(".//PRODUCT_TYPE").text
    elif meta["sensor"] in ("ASAR", "ERS1", "ERS2"):
        product_type = get("PRODUCT_TYPE")
        meta["acquisition_mode"] = product_type[4:7]
        try:
            meta["product"] = _ESA_PRODUCTS[meta["acquisition_mode"]]
        except KeyError:
            raise RuntimeError(
                f"unsupported acquisition mode: '{meta['acquisition_mode']}'"
            ) from None
    else:
        raise RuntimeError(f"unknown sensor {meta['sensor']}")

    meta["IPF_version"] = get("Processing_system_identifier")
    meta["orbit"] = get("PASS")[0]
    pols = [x.text for x in root.findall('.//MDATTR[@desc="Polarization"]')]
    meta["polarizations"] = sorted({x for x in pols if x and "-" not in x})
    meta["spacing"] = (
        round(float(get("range_spacing")), 6),
        round(float(get("azimuth_spacing")), 6),
    )
    meta["looks"] = (float(get("range_looks")), float(get("azimuth_looks")))
    meta["samples"] = int(root.find(".//BAND_RASTER_WIDTH").text)
    meta["lines"] = int(root.find(".//BAND_RASTER_HEIGHT").text)
    meta["bands"] = int(root.find(".//NBANDS").text)
    meta["orbitNumber_abs"] = int(get("ABS_ORBIT"))
    meta["orbitNumber_rel"] = int(get("REL_ORBIT"))
    meta["cycleNumber"] = int(get(["orbit_cycle", "CYCLE"]))
    meta["frameNumber"] = int(get(["data_take_id", "ABS_ORBIT"]))
    meta["swath"] = get("SWATH")
    meta["image_geometry"] = (
        "GROUND_RANGE" if bool(int(get("srgr_flag"))) else "SLANT_RANGE"
    )
    meta["start"] = parse_date(
        root.find(".//PRODUCT_SCENE_RASTER_START_TIME").text
    )
    meta["stop"] = parse_date(root.find(".//PRODUCT_SCENE_RASTER_STOP_TIME").text)

    # incidence fallback chain (drivers.py:901-921): near/far attrs →
    # mid-swath attrs → the tie-point-grid sidecar raster (nonzero mean)
    try:
        inc_near = float(get("incidence_near"))
        inc_far = float(get("incidence_far"))
        meta["incidence"] = (inc_near + inc_far) / 2
    except _Missing:
        inc_elements = root.findall('.//MDATTR[@name="incidenceAngleMidSwath"]')
        if inc_elements:
            meta["incidence"] = mean(float(x.text) for x in inc_elements)
        else:
            meta["incidence"] = _tie_point_incidence(sidecar)

    wkt = root.find(".//WKT")
    meta["projection"] = wkt.text.lstrip() if wkt is not None else WKT4326

    coords = {
        key: float(get(key))
        for key in (
            f"{a}_{b}_{c}"
            for a in ("first", "last")
            for b in ("far", "near")
            for c in ("lat", "long")
        )
    }
    meta["coordinates"] = [
        (coords["first_near_long"], coords["first_near_lat"]),
        (coords["last_near_long"], coords["last_near_lat"]),
        (coords["last_far_long"], coords["last_far_lat"]),
        (coords["first_far_long"], coords["first_far_lat"]),
    ]
    return meta


def _tie_point_incidence(sidecar: dict[str, bytes]) -> float:
    """Mean of the nonzero tie-point-grid incidence pixels
    (drivers.py:912-918, GDAL replaced by the ENVI reader)."""
    import numpy as np

    from ...functions.sar import read_envi

    img_name = next(
        (
            n
            for n in sorted(sidecar)
            if n.endswith("tie_point_grids/incident_angle.img")
        ),
        None,
    )
    if img_name is None:
        raise ValueError("cannot read the incident angle")
    hdr_name = img_name[: -len(".img")] + ".hdr"
    if hdr_name not in sidecar:
        raise ValueError("cannot read the incident angle")
    arr = read_envi(sidecar[img_name], sidecar[hdr_name].decode("ascii"))
    return float(np.mean(arr[arr != 0]))


def build_dimap_product_zip(
    meta: dict,
    omit: tuple[str, ...] = (),
    incidence_grid=None,
) -> bytes:
    """Zip a ``.dim`` header with its ``.data`` sidecar directory —
    the on-disk shape of a SNAP product, as one archivable blob.

    ``incidence_grid`` (a float32 2-D array) lands as
    ``<name>.data/tie_point_grids/incident_angle.img`` + ``.hdr``
    (ENVI), feeding the parser's third incidence fallback.
    """
    import io
    import zipfile

    import numpy as np

    from ...functions.sar import envi_hdr

    name = meta.get("name", "product")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(f"{name}.dim", build_dimap_blob(meta, omit=omit))
        if incidence_grid is not None:
            arr = np.ascontiguousarray(incidence_grid, dtype=">f4")
            base = f"{name}.data/tie_point_grids/incident_angle"
            zf.writestr(f"{base}.img", arr.tobytes())
            zf.writestr(
                f"{base}.hdr",
                envi_hdr(arr.shape[1], arr.shape[0], 0.0, 0.0, 1.0,
                         dtype=4, byte_order=1),
            )
    return buf.getvalue()
