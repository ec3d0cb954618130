"""SNAP workflow-XML grammar: serialize the engine Plan ↔ graph files.

The reference stores workflows as SNAP gpt graph XML
(``snap/recipes/*.xml``; read/written by ``Workflow`` in
/root/reference/pyroSAR/snap/auxil.py:770-1160). The engine's
:class:`~pyrosar_ray.plan.Plan` is the in-memory model; this module
adds the file grammar so workflows written by the reference (or SNAP
itself) round-trip through the engine:

- ``<graph id="Graph"><version>1.0</version>`` root, one ``<node>`` per
  operator with ``<operator>``, ``<sources>`` holding
  ``sourceProduct[.N]`` refids, and a
  ``<parameters class="com.bc.ceres.binding.dom.XppDomElement">`` block
  of key/value children (value coercion per
  :func:`~pyrosar_ray.plan.value2str`)
- an ``<applicationData id="Presentation">`` trailer (display positions
  are cosmetic; the engine writes a fixed layout and ignores them on
  read, like the reference's consistency checks do)

Also here: the ``parse_node`` twin — the reference scrapes operator
parameter defaults from ``gpt <op> -h`` and caches the XML under
``~/.pyrosar/snap/nodes/<version>/`` (snap/auxil.py:67-190). No SNAP
binary exists in any deployment of this engine, so the defaults come
from a static template registry (values as published in the reference's
own docstrings/recipes), with the same cache-directory contract:
``use_existing=True`` reads a previously written template file, fresh
parses write one. The cache write is idempotent (atomic rename) instead
of lock-guarded — concurrent actors can race safely.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

from .plan import Node, Plan, value2str

_PARAMS_CLASS = "com.bc.ceres.binding.dom.XppDomElement"


# ---------------------------------------------------------- serialization


def plan_to_xml(plan: Plan) -> bytes:
    """Engine Plan → SNAP graph XML (the ``Workflow.write`` shape)."""
    graph = ET.Element("graph", {"id": "Graph"})
    ET.SubElement(graph, "version").text = "1.0"
    for node in plan:
        el = ET.SubElement(graph, "node", {"id": node.id})
        ET.SubElement(el, "operator").text = node.operator
        sources = ET.SubElement(el, "sources")
        for i, src in enumerate(node.sources):
            tag = "sourceProduct" if i == 0 else f"sourceProduct.{i}"
            ET.SubElement(sources, tag, {"refid": src})
        params = ET.SubElement(el, "parameters", {"class": _PARAMS_CLASS})
        for key, value in node.parameters_str().items():
            p = ET.SubElement(params, key)
            p.text = value
    app = ET.SubElement(graph, "applicationData", {"id": "Presentation"})
    ET.SubElement(app, "Description")
    for i, node in enumerate(plan):
        pos = ET.SubElement(app, "node", {"id": node.id})
        ET.SubElement(
            pos, "displayPosition", {"x": str(20.0 + 120.0 * i), "y": "20.0"}
        )
    ET.indent(graph)
    return ET.tostring(graph, encoding="utf-8", xml_declaration=True)


def plan_from_xml(blob: bytes | str) -> Plan:
    """SNAP graph XML → engine Plan.

    Parameter values stay strings (``None`` for empty elements), source
    links come from the ``sourceProduct[.N]`` refids in order, and the
    Presentation block is ignored.
    """
    if isinstance(blob, str):
        blob = blob.encode("utf-8")
    root = ET.fromstring(blob)
    if root.tag != "graph":
        raise ValueError(f"not a SNAP graph document (root: {root.tag!r})")
    plan = Plan()
    for el in root.findall("node"):
        operator = el.find("operator").text
        sources_el = el.find("sources")
        sources: list[str] = []
        if sources_el is not None:
            entries = [
                child
                for child in sources_el
                if child.tag.startswith("sourceProduct")
            ]
            entries.sort(
                key=lambda c: int(c.tag.rsplit(".", 1)[1]) if "." in c.tag else 0
            )
            sources = [c.attrib["refid"] for c in entries]
        params: dict = {}
        params_el = el.find("parameters")
        if params_el is not None:
            for child in params_el:
                params[child.tag] = child.text
        plan.add(Node(el.attrib["id"], operator, params, sources))
    return plan


# -------------------------------------------------------- node templates

#: operator → default parameters (the values the reference's parse_node
#: extracts from gpt help text; anchors: the ThermalNoiseRemoval example
#: in snap/auxil.py:85-91 and the recipe files under snap/recipes/)
NODE_TEMPLATES: dict[str, dict] = {
    "Read": {"file": None, "formatName": None},
    "Write": {"file": None, "formatName": "BEAM-DIMAP"},
    "BandSelect": {"selectedPolarisations": None, "sourceBands": None},
    "Apply-Orbit-File": {
        "orbitType": "Sentinel Precise (Auto Download)",
        "polyDegree": "3",
        "continueOnFail": "false",
    },
    "Calibration": {
        "sourceBands": None,
        "auxFile": "Product Auxiliary File",
        "externalAuxFile": None,
        "outputImageInComplex": "false",
        "outputImageScaleInDb": "false",
        "createGammaBand": "false",
        "createBetaBand": "false",
        "selectedPolarisations": None,
        "outputSigmaBand": "false",
        "outputGammaBand": "false",
        "outputBetaBand": "false",
    },
    "ThermalNoiseRemoval": {
        "selectedPolarisations": None,
        "removeThermalNoise": "true",
        "reIntroduceThermalNoise": "false",
    },
    "Remove-GRD-Border-Noise": {
        "selectedPolarisations": None,
        "borderLimit": "500",
        "trimThreshold": "0.5",
    },
    "TOPSAR-Deburst": {"selectedPolarisations": None},
    "SliceAssembly": {"selectedPolarisations": None},
    "Multilook": {
        "sourceBands": None,
        "nRgLooks": "1",
        "nAzLooks": "1",
        "outputIntensity": "false",
        "grSquarePixel": "true",
    },
    "Terrain-Flattening": {
        "sourceBands": None,
        "demName": "SRTM 1Sec HGT",
        "demResamplingMethod": "BILINEAR_INTERPOLATION",
        "externalDEMFile": None,
        "externalDEMNoDataValue": "0",
        "externalDEMApplyEGM": "false",
        "additionalOverlap": "0.1",
        "oversamplingMultiple": "1.0",
    },
    "Speckle-Filter": {
        "sourceBands": None,
        "filter": "Lee Sigma",
        "filterSizeX": "3",
        "filterSizeY": "3",
        "dampingFactor": "2",
        "estimateENL": "true",
        "enl": "1.0",
        "numLooksStr": "1",
        "windowSize": "7x7",
        "targetWindowSizeStr": "3x3",
        "sigmaStr": "0.9",
        "anSize": "50",
    },
    "Terrain-Correction": {
        "sourceBands": None,
        "demName": "SRTM 1Sec HGT",
        "externalDEMFile": None,
        "externalDEMNoDataValue": "0",
        "externalDEMApplyEGM": "true",
        "demResamplingMethod": "BILINEAR_INTERPOLATION",
        "imgResamplingMethod": "BILINEAR_INTERPOLATION",
        "pixelSpacingInMeter": "0.0",
        "pixelSpacingInDegree": "0.0",
        "mapProjection": "WGS84(DD)",
        "alignToStandardGrid": "false",
        "standardGridOriginX": "0",
        "standardGridOriginY": "0",
        "nodataValueAtSea": "true",
        "saveDEM": "false",
        "saveLatLon": "false",
        "saveIncidenceAngleFromEllipsoid": "false",
        "saveLocalIncidenceAngle": "false",
        "saveProjectedLocalIncidenceAngle": "false",
        "saveSelectedSourceBand": "true",
        "outputComplex": "false",
        "applyRadiometricNormalization": "false",
        "saveSigmaNought": "false",
        "saveGammaNought": "false",
        "saveBetaNought": "false",
        "incidenceAngleForSigma0": "Use projected local incidence angle from DEM",
        "incidenceAngleForGamma0": "Use projected local incidence angle from DEM",
        "auxFile": "Latest Auxiliary File",
    },
    "LinearToFromdB": {"sourceBands": None},
    "Subset": {
        "sourceBands": None,
        "region": None,
        "referenceBand": None,
        "geoRegion": None,
        "subSamplingX": "1",
        "subSamplingY": "1",
        "fullSwath": "false",
        "tiePointGridNames": None,
        "copyMetadata": "true",
    },
    "BandMerge": {"sourceBands": None, "geographicError": "1.0E-5"},
    "BandMaths": {"targetBands": None, "variables": None},
    "Back-Geocoding": {
        "demName": "SRTM 1Sec HGT",
        "demResamplingMethod": "BICUBIC_INTERPOLATION",
        "externalDEMFile": None,
        "externalDEMNoDataValue": "0",
        "resamplingType": "BISINC_5_POINT_INTERPOLATION",
        "maskOutAreaWithoutElevation": "true",
        "outputRangeAzimuthOffset": "false",
        "outputDerampDemodPhase": "false",
        "disableReramp": "false",
    },
}

#: operators taking more than one source product (snap/auxil.py:134)
MULTISOURCE = ("SliceAssembly", "BandMerge", "Back-Geocoding", "CreateStack")


def parse_node(name: str, cache_dir: str | None = None, use_existing: bool = True) -> Node:
    """Operator name → a fresh Node with its default parameters.

    The ``parse_node`` contract (snap/auxil.py:67-190) minus the gpt
    subprocess: unknown operators raise the reference's error; when
    ``cache_dir`` is given, templates are written there as graph XML on
    first use and re-read on later calls (``use_existing=False`` forces
    a rewrite) — the same node-cache layout an operator-plugin can drop
    extra templates into.
    """
    operator = name[:-4] if name.endswith(".xml") else name
    if cache_dir is not None:
        absname = os.path.join(cache_dir, operator + ".xml")
        if use_existing and os.path.isfile(absname):
            with open(absname, "rb") as fh:
                cached = plan_from_xml(fh.read())
            return cached[operator]
    if operator not in NODE_TEMPLATES:
        raise RuntimeError(f"unknown operator '{operator}'")
    node = Node(operator, operator, dict(NODE_TEMPLATES[operator]), [])
    if operator not in ("Read", "ProductSet-Reader"):
        node.sources = ["Read"]
        if operator in MULTISOURCE:
            node.sources.append("Read (2)")
    if cache_dir is not None:
        os.makedirs(cache_dir, exist_ok=True)
        single = Plan()
        single.add(node)
        tmp = absname + ".tmp"
        with open(tmp, "wb") as fh:
            fh.write(plan_to_xml(single))
        os.replace(tmp, absname)
    return Node(node.id, node.operator, dict(node.parameters), list(node.sources))
