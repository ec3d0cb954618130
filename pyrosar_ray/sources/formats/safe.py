"""Sentinel-1 SAFE grammar: manifest.safe + annotation XML.

Parser parity targets (reference ``SAFE.scanMetadata``,
/root/reference/pyroSAR/drivers.py:2205-2299):

- product/mode/swath from the ``s1sarl1`` namespace (s1sarl2 fallback)
- start/stop from ``safe:startTime``/``stopTime`` → YYYYmmddTHHMMSS
- footprint from ``gml:coordinates`` — "lat,lon" pairs REVERSED to
  (lon, lat) tuples (drivers.py:2228-2229)
- orbit pass first letter; orbit/cycle/datatake numbers; polarization
  list; sensor from familyName ('SENTINEL-1' → 'S1') + number
- IPF version from the ``safe:software`` version attribute
- per-swath annotation aggregation (drivers.py:2263-2292): annotations
  of the FIRST polarization group → MEDIAN of pixel spacings, looks and
  mid-swath incidence; SUM of samples and lines; heading wrapped +360
- OCN products carry spacing/samples/lines = -1 (drivers.py:2259-2262)

The builder emits the same structure with synthetic content so the
round-trip (build → blob → parse) is testable without real ESA data.
"""

from __future__ import annotations

import re
import statistics
import xml.etree.ElementTree as ET
from itertools import groupby

from .common import WKT4326, parse_date, stamp_to_iso, zip_blob

#: annotation dataset filename grammar (reference pattern_ds, drivers.py:1901-1910)
PATTERN_DS = (
    r"^s1[abcd]-"
    r"(?P<swath>s[1-6]|iw[1-3]?|ew[1-5]?|wv[1-2]|n[1-6])-"
    r"(?P<product>slc|grd|ocn)-"
    r"(?P<pol>hh|hv|vv|vh)-"
    r"(?P<start>[0-9]{8}t[0-9]{6})-"
    r"(?P<stop>[0-9]{8}t[0-9]{6})-"
    r"(?:[0-9]{6})-(?:[0-9a-f]{6})-"
    r"(?P<id>[0-9]{3})"
    r"\.xml$"
)

_NS = {
    "xfdu": "urn:ccsds:schema:xfdu:1",
    "safe": "http://www.esa.int/safe/sentinel-1.0",
    "s1": "http://www.esa.int/safe/sentinel-1.0/sentinel-1",
    "s1sarl1": "http://www.esa.int/safe/sentinel-1.0/sentinel-1/sar/level-1",
    "s1sarl2": "http://www.esa.int/safe/sentinel-1.0/sentinel-1/sar/level-2",
    "gml": "http://www.opengis.net/gml",
}


def get_namespaces(xml_text: str) -> dict[str, str]:
    """Harvest xmlns declarations (engine twin of xml_util.getNamespaces)."""
    found = dict(re.findall(r'xmlns:([\w.-]+)="([^"]+)"', xml_text))
    return {**_NS, **found}


# ----------------------------------------------------------------- builder


def _manifest_xml(meta: dict) -> str:
    start_iso = stamp_to_iso(meta["start"])
    stop_iso = stamp_to_iso(meta["stop"])
    # gml coordinates are "lat,lon" space-separated — REVERSED vs storage
    coords = " ".join(f"{lat},{lon}" for lon, lat in meta["coordinates"])
    pols = "".join(
        f"<s1sarl1:transmitterReceiverPolarisation>{p}"
        "</s1sarl1:transmitterReceiverPolarisation>"
        for p in meta["polarizations"]
    )
    passdir = {"A": "ASCENDING", "D": "DESCENDING"}[meta["orbit"]]
    mode = meta["acquisition_mode"]
    # stripmap scenes carry mode=SM + the S[1-6] swath (drivers.py:2221-2224)
    mode_el = "SM" if re.fullmatch(r"S[1-6]", mode) else mode
    swath_el = mode
    ipf = meta.get("IPF_version", 2.72)
    return (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        "<xfdu:XFDU "
        + " ".join(f'xmlns:{k}="{v}"' for k, v in _NS.items() if k != "s1sarl2")
        + ">"
        "<metadataSection>"
        f"<s1sarl1:productType>{meta['product']}</s1sarl1:productType>"
        f"<s1sarl1:mode>{mode_el}</s1sarl1:mode>"
        f"<s1sarl1:swath>{swath_el}</s1sarl1:swath>"
        f"<safe:startTime>{start_iso}</safe:startTime>"
        f"<safe:stopTime>{stop_iso}</safe:stopTime>"
        f"<gml:coordinates>{coords}</gml:coordinates>"
        f"<s1:pass>{passdir}</s1:pass>"
        f'<safe:orbitNumber type="start">{meta["orbitNumber_abs"]}</safe:orbitNumber>'
        f'<safe:orbitNumber type="stop">{meta["orbitNumber_abs"]}</safe:orbitNumber>'
        f'<safe:relativeOrbitNumber type="start">{meta["orbitNumber_rel"]}</safe:relativeOrbitNumber>'
        f'<safe:relativeOrbitNumber type="stop">{meta["orbitNumber_rel"]}</safe:relativeOrbitNumber>'
        f"<safe:cycleNumber>{meta['cycleNumber']}</safe:cycleNumber>"
        f"<s1sarl1:missionDataTakeID>{meta['frameNumber']}</s1sarl1:missionDataTakeID>"
        f"{pols}"
        "<s1sarl1:productClass>S</s1sarl1:productClass>"
        "<safe:platform>"
        f"<safe:familyName>SENTINEL-1</safe:familyName>"
        f"<safe:number>{meta['sensor'][-1]}</safe:number>"
        "</safe:platform>"
        f'<safe:software name="Sentinel-1 IPF" version="{ipf}"/>'
        "<s1sarl1:sliceProductFlag>false</s1sarl1:sliceProductFlag>"
        "</metadataSection>"
        "</xfdu:XFDU>"
    )


def _grid_points_xml(grid_points) -> str:
    pts = []
    for gp in grid_points:
        pts.append(
            "<geolocationGridPoint>"
            f"<azimuthTime>{gp['azimuthTime']}</azimuthTime>"
            f"<slantRangeTime>{gp['slantRangeTime']!r}</slantRangeTime>"
            f"<line>{gp['line']}</line>"
            f"<pixel>{gp['pixel']}</pixel>"
            f"<latitude>{gp['latitude']!r}</latitude>"
            f"<longitude>{gp['longitude']!r}</longitude>"
            f"<height>{gp.get('height', 0.0)!r}</height>"
            f"<incidenceAngle>{gp['incidenceAngle']!r}</incidenceAngle>"
            f"<elevationAngle>{gp['elevationAngle']!r}</elevationAngle>"
            "</geolocationGridPoint>"
        )
    return "".join(pts)


def _annotation_xml(meta: dict, grid_points) -> str:
    swath = meta["acquisition_mode"]
    rg, az = meta["spacing"]
    looks_rg, looks_az = meta.get("looks", (1.0, 1.0))
    return (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        "<product>"
        "<adsHeader>"
        f"<swath>{swath}</swath>"
        "</adsHeader>"
        "<generalAnnotation><productInformation>"
        f"<platformHeading>{meta.get('heading', -12.0)!r}</platformHeading>"
        f"<projection>{meta.get('image_geometry', 'Ground Range').replace('_', ' ').title()}</projection>"
        "</productInformation></generalAnnotation>"
        "<imageAnnotation><imageInformation>"
        f"<numberOfSamples>{meta['samples']}</numberOfSamples>"
        f"<numberOfLines>{meta['lines']}</numberOfLines>"
        f"<incidenceAngleMidSwath>{meta.get('incidence', 38.5)!r}</incidenceAngleMidSwath>"
        "</imageInformation>"
        "<processingInformation><swathProcParamsList><swathProcParams>"
        f"<rangeProcessing><numberOfLooks>{looks_rg!r}</numberOfLooks></rangeProcessing>"
        f"<azimuthProcessing><numberOfLooks>{looks_az!r}</numberOfLooks></azimuthProcessing>"
        "</swathProcParams></swathProcParamsList></processingInformation>"
        "</imageAnnotation>"
        f"<imageDataInfo><rangePixelSpacing>{rg!r}</rangePixelSpacing>"
        f"<azimuthPixelSpacing>{az!r}</azimuthPixelSpacing></imageDataInfo>"
        "<geolocationGrid><geolocationGridPointList>"
        + _grid_points_xml(grid_points or [])
        + "</geolocationGridPointList></geolocationGrid>"
        "</product>"
    )


def build_safe_blob(meta: dict, grid_points=None) -> bytes:
    """Deterministic SAFE zip: manifest.safe + one annotation per pol.

    ``meta`` must carry the 16-attribute contract values (plus optional
    looks/incidence/heading/IPF_version extras); ``grid_points`` is an
    optional list of tie-point dicts shared by every annotation.
    """
    sensor_l = meta["sensor"].lower()  # s1a
    mode_l = meta["acquisition_mode"].lower()
    prod_l = meta["product"][:3].lower()
    start_l = meta["start"].lower()
    stop_l = meta["stop"].lower()
    members = {"manifest.safe": _manifest_xml(meta).encode()}
    ann = _annotation_xml(meta, grid_points).encode()
    for i, pol in enumerate(meta["polarizations"]):
        name = (
            f"annotation/{sensor_l}-{mode_l}-{prod_l}-{pol.lower()}-"
            f"{start_l}-{stop_l}-{meta['orbitNumber_abs']:06d}-00abc1-"
            f"{i + 1:03d}.xml"
        )
        members[name] = ann
    return zip_blob(members)


# ------------------------------------------------------------------ parser


def sniff_safe(blob: bytes, members: list[str] | None = None) -> bool:
    if not blob.startswith(b"PK"):
        return False
    if members is None:
        from ..drivers import list_members

        try:
            members = list_members(blob)
        except ValueError:
            return False
    return any(m.split("/")[-1] == "manifest.safe" for m in members)


def _first_pol_annotations(members: list[str]) -> list[str]:
    """Annotation files of the first polarization group (drivers.py:2265-2267)."""
    rx = re.compile(PATTERN_DS)
    anns = [m for m in members if rx.match(m.split("/")[-1])]
    key = lambda x: re.search("-[vh]{2}-", x).group()  # noqa: E731
    groups = groupby(sorted(anns, key=key), key=key)
    grouped = [list(v) for _, v in groups]
    return grouped[0] if grouped else []


def parse_safe(blob: bytes) -> dict:
    """manifest + annotation scan → full 16-attribute record + extras."""
    from ..drivers import get_member, list_members

    members = list_members(blob)
    manifest_name = next(
        m for m in members if m.split("/")[-1] == "manifest.safe"
    )
    text = get_member(blob, manifest_name).decode()
    ns = get_namespaces(text)
    tree = ET.fromstring(text)

    meta: dict = {}
    key = "s1sarl1"
    obj_prod = tree.find(f".//{key}:productType", ns)
    if obj_prod is None:
        key = "s1sarl2"
        obj_prod = tree.find(f".//{key}:productType", ns)
    meta["product"] = obj_prod.text

    acqmode = tree.find(f".//{key}:mode", ns).text
    if acqmode == "SM":
        meta["acquisition_mode"] = tree.find(f".//{key}:swath", ns).text
    else:
        meta["acquisition_mode"] = acqmode

    meta["start"] = parse_date(tree.find(".//safe:startTime", ns).text)
    meta["stop"] = parse_date(tree.find(".//safe:stopTime", ns).text)
    # (lat,lon) text pairs reversed to (lon,lat) — drivers.py:2228-2229
    meta["coordinates"] = [
        tuple(float(y) for y in x.split(","))[::-1]
        for x in tree.find(".//gml:coordinates", ns).text.split()
    ]
    meta["orbit"] = tree.find(".//s1:pass", ns).text[0]
    meta["orbitNumber_abs"] = int(
        tree.find('.//safe:orbitNumber[@type="start"]', ns).text
    )
    meta["orbitNumber_rel"] = int(
        tree.find('.//safe:relativeOrbitNumber[@type="start"]', ns).text
    )
    meta["cycleNumber"] = int(tree.find(".//safe:cycleNumber", ns).text)
    meta["frameNumber"] = int(tree.find(f".//{key}:missionDataTakeID", ns).text)
    meta["polarizations"] = [
        x.text for x in tree.findall(f".//{key}:transmitterReceiverPolarisation", ns)
    ]
    family = tree.find(".//safe:familyName", ns).text.replace("ENTINEL-", "")
    number = tree.find(".//safe:number", ns).text
    meta["sensor"] = family + number
    meta["IPF_version"] = float(tree.find(".//safe:software", ns).attrib["version"])
    meta["projection"] = WKT4326

    if meta["product"] == "OCN":
        meta["spacing"] = -1
        meta["samples"] = -1
        meta["lines"] = -1
        return meta

    ann_trees = [
        ET.fromstring(get_member(blob, m).decode())
        for m in _first_pol_annotations(members)
    ]
    if not ann_trees:
        raise ValueError("SAFE blob has no annotation datasets")
    med = statistics.median
    sp_rg = [float(t.find(".//rangePixelSpacing").text) for t in ann_trees]
    sp_az = [float(t.find(".//azimuthPixelSpacing").text) for t in ann_trees]
    meta["spacing"] = (med(sp_rg), med(sp_az))
    looks_rg = [float(t.find(".//rangeProcessing/numberOfLooks").text) for t in ann_trees]
    looks_az = [float(t.find(".//azimuthProcessing/numberOfLooks").text) for t in ann_trees]
    meta["looks"] = (med(looks_rg), med(looks_az))
    meta["samples"] = sum(
        int(t.find(".//imageAnnotation/imageInformation/numberOfSamples").text)
        for t in ann_trees
    )
    meta["lines"] = sum(
        int(t.find(".//imageAnnotation/imageInformation/numberOfLines").text)
        for t in ann_trees
    )
    heading = med(float(t.find(".//platformHeading").text) for t in ann_trees)
    meta["heading"] = heading if heading > 0 else heading + 360
    meta["incidence"] = med(
        float(t.find(".//incidenceAngleMidSwath").text) for t in ann_trees
    )
    meta["image_geometry"] = (
        ann_trees[0].find(".//projection").text.replace(" ", "_").upper()
    )
    return meta


def safe_geo_grid(blob: bytes) -> list[dict]:
    """Full tie-point rows of the first pol group's annotations.

    One row per geolocationGridPoint with the reference's complete field
    set (drivers.py:1979-2014): swath, azimuthTime (ISO µs), slantRangeTime,
    line, pixel, incidenceAngle, elevationAngle + (lon, lat, height).
    """
    from ..drivers import get_member, list_members

    members = list_members(blob)
    rows = []
    for m in _first_pol_annotations(members):
        tree = ET.fromstring(get_member(blob, m).decode())
        swath = tree.find(".//adsHeader/swath").text
        for point in tree.findall(".//geolocationGridPoint"):
            vals = {child.tag: child.text for child in point}
            rows.append(
                {
                    "swath": swath,
                    "azimuthTime": vals["azimuthTime"],
                    "slantRangeTime": float(vals["slantRangeTime"]),
                    "line": int(vals["line"]),
                    "pixel": int(vals["pixel"]),
                    "lon": float(vals["longitude"]),
                    "lat": float(vals["latitude"]),
                    "height": float(vals["height"]),
                    "incidenceAngle": float(vals["incidenceAngle"]),
                    "elevationAngle": float(vals["elevationAngle"]),
                }
            )
    return rows
