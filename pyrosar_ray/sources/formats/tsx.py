"""TerraSAR-X / TanDEM-X grammar: annotation XML + GEOREF grid.

Parser parity targets (reference ``TSX.scanMetadata``,
/root/reference/pyroSAR/drivers.py:2354-2393):

- sensor from generalHeader/mission with '-' stripped (TSX-1 → TSX1)
- product from orderInfo/productVariant; orbit from orbitDirection[0]
- polarisationList/polLayer list; abs/rel orbit, cycle, uniqueDataTakeID
- imagingMode; start/stop from sceneInfo timeUTC
- spacing = (columnSpacing, rowSpacing); samples = numberOfColumns,
  lines = numberOfRows; looks; center incidenceAngle
- GEOREF.xml gridPoint lat/lon with the WEST-DIRECTION WRAP:
  lon − 360 when lon > 180 (drivers.py:2388-2389) — coordinates beyond
  the antimeridian come back into [−180, 180]
"""

from __future__ import annotations

from xml.etree import ElementTree as ET

from .common import WKT4326, parse_date, stamp_to_iso, tar_blob

# ----------------------------------------------------------------- builder


def build_tsx_blob(meta: dict, grid_lonlat: list[tuple[float, float]] | None = None) -> bytes:
    """Deterministic TSX tar: main annotation XML + GEOREF.xml.

    ``grid_lonlat``: raw (lon, lat) grid points AS WRITTEN by the
    processor — i.e. possibly with lon in [0, 360); the parser applies
    the >180 wrap. Defaults to the footprint ``meta['coordinates']``
    (wrapped into [0,360) when negative, exercising the wrap path).
    """
    sensor_dash = meta["sensor"][:-1] + "-" + meta["sensor"][-1]  # TSX1 → TSX-1
    passdir = {"A": "ASCENDING", "D": "DESCENDING"}[meta["orbit"]]
    rg_sp, az_sp = meta["spacing"]
    looks_rg, looks_az = meta.get("looks", (1.0, 1.0))
    pols = "".join(
        f"<polLayer>{p}</polLayer>" for p in meta["polarizations"]
    )
    name = (
        f"{meta['sensor']}_SAR__{meta['product']}_____"
        f"{meta['acquisition_mode']}_S_SRA_{meta['start']}_{meta['stop']}.xml"
    )
    main = (
        '<?xml version="1.0"?>\n'
        "<level1Product>"
        "<generalHeader>"
        f"<mission>{sensor_dash}</mission>"
        "</generalHeader>"
        "<productComponents><orderInfo>"
        f"<productVariant>{meta['product']}</productVariant>"
        "</orderInfo></productComponents>"
        "<productInfo>"
        "<missionInfo>"
        f"<orbitDirection>{passdir}</orbitDirection>"
        f"<absOrbit>{meta['orbitNumber_abs']}</absOrbit>"
        f"<relOrbit>{meta['orbitNumber_rel']}</relOrbit>"
        f"<orbitCycle>{meta['cycleNumber']}</orbitCycle>"
        "</missionInfo>"
        "<inputData>"
        f"<uniqueDataTakeID>{meta['frameNumber']}</uniqueDataTakeID>"
        "</inputData>"
        "<acquisitionInfo>"
        f"<imagingMode>{meta['acquisition_mode']}</imagingMode>"
        f"<polarisationList>{pols}</polarisationList>"
        "</acquisitionInfo>"
        "<sceneInfo>"
        f"<start><timeUTC>{stamp_to_iso(meta['start'])}</timeUTC></start>"
        f"<stop><timeUTC>{stamp_to_iso(meta['stop'])}</timeUTC></stop>"
        "<sceneCenterCoord>"
        f"<incidenceAngle>{meta.get('incidence', 33.8)!r}</incidenceAngle>"
        "</sceneCenterCoord>"
        "</sceneInfo>"
        "<imageDataInfo><imageRaster>"
        f"<rowSpacing>{az_sp!r}</rowSpacing>"
        f"<columnSpacing>{rg_sp!r}</columnSpacing>"
        f"<numberOfColumns>{meta['samples']}</numberOfColumns>"
        f"<numberOfRows>{meta['lines']}</numberOfRows>"
        f"<rangeLooks>{looks_rg!r}</rangeLooks>"
        f"<azimuthLooks>{looks_az!r}</azimuthLooks>"
        "</imageRaster></imageDataInfo>"
        "</productInfo>"
        "</level1Product>"
    )
    if grid_lonlat is None:
        # processor-style west-direction encoding: negative lons go out
        # as lon+360 (the parser wraps them back with lon−360)
        grid_lonlat = [
            (lon + 360.0 if lon < 0 else lon, lat) for lon, lat in meta["coordinates"]
        ]
    points = "".join(
        f"<gridPoint><lat>{lat!r}</lat><lon>{lon!r}</lon></gridPoint>"
        for lon, lat in grid_lonlat
    )
    georef = (
        '<?xml version="1.0"?>\n'
        f"<geoReference><geolocationGrid>{points}</geolocationGrid></geoReference>"
    )
    return tar_blob({name: main.encode(), "GEOREF.xml": georef.encode()})


# ------------------------------------------------------------------ parser


def sniff_tsx(blob: bytes, members: list[str] | None = None) -> bool:
    if members is None:
        from ..drivers import list_members

        try:
            members = list_members(blob)
        except ValueError:
            return False
    names = [m.split("/")[-1] for m in members]
    return "GEOREF.xml" in names and any(
        n.startswith(("TSX1_SAR__", "TDX1_SAR__", "TDM1_SAR__")) for n in names
    )


def parse_tsx(blob: bytes) -> dict:
    from ..drivers import get_member, list_members

    members = list_members(blob)
    main_name = next(
        m
        for m in members
        if m.split("/")[-1].startswith(("TSX1_SAR__", "TDX1_SAR__", "TDM1_SAR__"))
        and m.endswith(".xml")
    )
    tree = ET.fromstring(get_member(blob, main_name).decode())

    meta: dict = {}
    meta["sensor"] = tree.find(".//generalHeader/mission").text.replace("-", "")
    meta["product"] = tree.find(".//orderInfo/productVariant").text
    meta["orbit"] = tree.find(".//missionInfo/orbitDirection").text[0]
    meta["polarizations"] = [
        x.text for x in tree.findall(".//acquisitionInfo/polarisationList/polLayer")
    ]
    meta["orbitNumber_abs"] = int(tree.find(".//missionInfo/absOrbit").text)
    meta["orbitNumber_rel"] = int(tree.find(".//missionInfo/relOrbit").text)
    meta["cycleNumber"] = int(tree.find(".//missionInfo/orbitCycle").text)
    meta["frameNumber"] = int(tree.find(".//inputData/uniqueDataTakeID").text)
    meta["acquisition_mode"] = tree.find(".//acquisitionInfo/imagingMode").text
    meta["start"] = parse_date(tree.find(".//sceneInfo/start/timeUTC").text)
    meta["stop"] = parse_date(tree.find(".//sceneInfo/stop/timeUTC").text)
    spacing_row = float(tree.find(".//imageDataInfo/imageRaster/rowSpacing").text)
    spacing_col = float(tree.find(".//imageDataInfo/imageRaster/columnSpacing").text)
    meta["spacing"] = (spacing_col, spacing_row)
    meta["samples"] = int(tree.find(".//imageDataInfo/imageRaster/numberOfColumns").text)
    meta["lines"] = int(tree.find(".//imageDataInfo/imageRaster/numberOfRows").text)
    meta["looks"] = (
        float(tree.find(".//imageDataInfo/imageRaster/rangeLooks").text),
        float(tree.find(".//imageDataInfo/imageRaster/azimuthLooks").text),
    )
    meta["incidence"] = float(
        tree.find(".//sceneInfo/sceneCenterCoord/incidenceAngle").text
    )

    georef_name = next(m for m in members if m.split("/")[-1] == "GEOREF.xml")
    gtree = ET.fromstring(get_member(blob, georef_name).decode())
    pts = gtree.findall(".//gridPoint")
    lat = [float(x.find("lat").text) for x in pts]
    lon = [float(x.find("lon").text) for x in pts]
    # west-direction wrap: lon − 360 when lon > 180 (drivers.py:2388-2389)
    lon = [x - 360 if x > 180 else x for x in lon]
    meta["coordinates"] = list(zip(lon, lat))
    meta["projection"] = WKT4326
    return meta
