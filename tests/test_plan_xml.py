"""SNAP graph-XML grammar round-trips (reference snap/auxil.py:40-190, 770-1160)."""

import pytest

from pyrosar_ray.plan import Node, Plan, geocode_plan
from pyrosar_ray.plan_xml import (
    MULTISOURCE,
    NODE_TEMPLATES,
    parse_node,
    plan_from_xml,
    plan_to_xml,
)


def test_plan_xml_roundtrip_geocode():
    p = geocode_plan()
    blob = plan_to_xml(p)
    again = plan_from_xml(blob)
    assert again.ids() == p.ids()
    for a, b in zip(p, again):
        assert a.operator == b.operator
        assert a.sources == b.sources
        # values pass through value2str on write; compare the coerced form
        assert {k: v for k, v in b.parameters.items()} == a.parameters_str()
    assert again.is_consistent()
    assert again.suffix() == p.suffix()


def test_plan_xml_grammar_shape():
    p = Plan()
    p.add(Node("Read", "Read", {"file": "x.zip", "formatName": "SENTINEL-1"}, []))
    p.add(
        Node(
            "Calibration",
            "Calibration",
            {"selectedPolarisations": ["VH", "VV"], "outputBetaBand": True},
            ["Read"],
        )
    )
    text = plan_to_xml(p).decode()
    # the reference recipe grammar (snap/recipes/base.xml)
    assert '<graph id="Graph">' in text
    assert "<version>1.0</version>" in text
    assert '<parameters class="com.bc.ceres.binding.dom.XppDomElement">' in text
    assert '<sourceProduct refid="Read" />' in text or '<sourceProduct refid="Read"/>' in text
    # value2str coercions land in the XML
    assert "<selectedPolarisations>VH,VV</selectedPolarisations>" in text
    assert "<outputBetaBand>true</outputBetaBand>" in text
    assert '<applicationData id="Presentation">' in text


def test_plan_from_xml_external_graph():
    # a graph the engine did not write: SNAP-style hand-written file with
    # a multi-source node and an empty parameter
    xml = """<graph id="Graph">
      <version>1.0</version>
      <node id="Read"><operator>Read</operator><sources/>
        <parameters class="com.bc.ceres.binding.dom.XppDomElement">
          <file>a.zip</file><formatName/></parameters></node>
      <node id="Read (2)"><operator>Read</operator><sources/>
        <parameters class="com.bc.ceres.binding.dom.XppDomElement">
          <file>b.zip</file></parameters></node>
      <node id="SliceAssembly"><operator>SliceAssembly</operator>
        <sources>
          <sourceProduct.1 refid="Read (2)"/>
          <sourceProduct refid="Read"/>
        </sources>
        <parameters class="com.bc.ceres.binding.dom.XppDomElement">
          <selectedPolarisations>VV</selectedPolarisations></parameters></node>
      <applicationData id="Presentation"><Description/></applicationData>
    </graph>"""
    p = plan_from_xml(xml)
    assert p.ids() == ["Read", "Read (2)", "SliceAssembly"]
    # source order restored from the .N suffixes regardless of file order
    assert p["SliceAssembly"].sources == ["Read", "Read (2)"]
    assert p["Read"].parameters == {"file": "a.zip", "formatName": None}
    assert p.is_consistent()


def test_plan_from_xml_rejects_non_graph():
    with pytest.raises(ValueError, match="not a SNAP graph"):
        plan_from_xml("<notagraph/>")


def test_parse_node_defaults():
    # the reference's docstring anchor (snap/auxil.py:85-91)
    tnr = parse_node("ThermalNoiseRemoval")
    assert tnr.parameters == {
        "selectedPolarisations": None,
        "removeThermalNoise": "true",
        "reIntroduceThermalNoise": "false",
    }
    # .xml suffix tolerated; unknown operator → reference error text
    assert parse_node("Calibration.xml").operator == "Calibration"
    with pytest.raises(RuntimeError, match="unknown operator 'Blub'"):
        parse_node("Blub")
    # BandMerge carries the reference's extra default (snap/auxil.py:183)
    assert parse_node("BandMerge").parameters["geographicError"] == "1.0E-5"
    # multi-source operators get the second source slot
    for op in MULTISOURCE:
        if op in NODE_TEMPLATES:
            assert parse_node(op).sources == ["Read", "Read (2)"]
    assert parse_node("Read").sources == []


def test_parse_node_cache(tmp_path):
    cache = str(tmp_path / "nodes" / "1.0.0")
    n1 = parse_node("Terrain-Correction", cache_dir=cache)
    import os

    fname = os.path.join(cache, "Terrain-Correction.xml")
    assert os.path.isfile(fname)
    # a mutated cache file is what use_existing=True returns...
    text = open(fname).read().replace(
        "<demName>SRTM 1Sec HGT</demName>", "<demName>Copernicus 30m Global DEM</demName>"
    )
    open(fname, "w").write(text)
    n2 = parse_node("Terrain-Correction", cache_dir=cache)
    assert n2.parameters["demName"] == "Copernicus 30m Global DEM"
    # ...and use_existing=False re-writes the pristine template
    n3 = parse_node("Terrain-Correction", cache_dir=cache, use_existing=False)
    assert n3.parameters["demName"] == "SRTM 1Sec HGT"
    assert parse_node("Terrain-Correction", cache_dir=cache).parameters["demName"] == "SRTM 1Sec HGT"
    # returned nodes are detached copies
    n1.parameters["demName"] = "mutated"
    assert NODE_TEMPLATES["Terrain-Correction"]["demName"] == "SRTM 1Sec HGT"
