"""Config/examine twin tests: INI store, properties layers, install checks."""

import os

import pytest

from pyrosar_ray.state.config import (
    EngineConfig,
    PropertiesStore,
    SNAP_SUFFICES,
    decode_property,
    encode_property,
    examine_gamma,
    examine_snap_install,
    gamma_version,
    get_suffix,
    read_properties,
)


# ------------------------------------------------------------ suffix table


def test_get_suffix_reference_anchors():
    # reference docstring example (examine.py:303-306) + data-file rows
    assert get_suffix("Terrain-Flattening") == "TF"
    assert get_suffix("Apply-Orbit-File") == "Orb"
    assert get_suffix("SliceAssembly") == "Asm"
    assert get_suffix("Speckle-Filter") == "Spk"
    assert get_suffix("TOPSAR-Merge") == "mrg"
    # unknown operator → None, dropped from product names
    assert get_suffix("Remove-GRD-Border-Noise") is None
    assert get_suffix("NotAnOperator") is None
    assert len(SNAP_SUFFICES) == 55


def test_plan_suffix_uses_authoritative_table():
    from pyrosar_ray.plan import Plan, Node

    p = Plan()
    p.add(Node("Read", "Read", {}, []))
    p.add(Node("SliceAssembly", "SliceAssembly", {}, ["Read"]))
    p.add(Node("Speckle-Filter", "Speckle-Filter", {}, ["SliceAssembly"]))
    p.add(Node("Mystery-Op", "Mystery-Op", {}, ["Speckle-Filter"]))
    # Asm/Spk from the data table; the unknown operator contributes nothing
    assert p.suffix() == "Asm_Spk"


# --------------------------------------------------------------- INI store


def test_engine_config_roundtrip(tmp_path):
    cfg = EngineConfig(str(tmp_path))
    cfg.add_section("SNAP")
    cfg.set("SNAP", "etc", "/opt/snap/etc")
    assert cfg["SNAP"] == {"etc": "/opt/snap/etc"}
    assert cfg.sections == ["SNAP"]
    assert cfg.keys("SNAP") == ["etc"]
    # persisted: a fresh instance over the same path sees the data
    again = EngineConfig(str(tmp_path))
    assert again["SNAP"]["etc"] == "/opt/snap/etc"


def test_engine_config_error_surfaces(tmp_path):
    cfg = EngineConfig(str(tmp_path))
    with pytest.raises(AttributeError, match="does not exist"):
        cfg["NOPE"]
    with pytest.raises(AttributeError, match="does not exist"):
        cfg.set("NOPE", "k", "v")
    cfg.add_section("S")
    with pytest.raises(RuntimeError, match="section already exists"):
        cfg.add_section("S")
    cfg.set("S", "k", "v")
    with pytest.raises(RuntimeError, match="Value already exists."):
        cfg.set("S", "k", "other")
    cfg.set("S", "k", "other", overwrite=True)
    assert cfg["S"]["k"] == "other"
    with pytest.raises(AttributeError, match="Key .* does not exist"):
        cfg.remove_option("S", "missing")
    cfg.remove_option("S", "k")
    assert cfg.keys("S") == []


def test_engine_config_list_json_encoding(tmp_path):
    cfg = EngineConfig(str(tmp_path))
    cfg.add_section("S")
    cfg.set("S", "modes", ["IW", "EW"])
    # the reference JSON-encodes list values (config.py:210-211)
    assert cfg["S"]["modes"] == '["IW", "EW"]'


# --------------------------------------------------------- properties files


def test_decode_encode_property():
    assert decode_property("None") is None
    assert decode_property("true") is True
    assert decode_property("False") is False
    assert decode_property("42") == 42
    assert decode_property("2.5") == 2.5
    assert decode_property("http\\://step.esa.int") == "http://step.esa.int"
    assert encode_property("http://x") == "http\\://x"
    assert encode_property(["-J-Xmx2G", "-Dx=1"]) == "-J-Xmx2G -Dx\\=1".replace(
        "\\=", "="
    )


def _write(path, text):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(text)


def test_read_properties_grammar(tmp_path):
    p = str(tmp_path / "snap.properties")
    _write(
        p,
        "# a full-line comment that is not a key\n"
        "snap.userdir = /data/aux\n"
        "#snap.jai.tileCacheSize = 1024\n"
        'snap.home = "/opt/snap"\n'
        "snap.parallelism=4\n",
    )
    d = read_properties(p)
    assert d["snap.userdir"] == "/data/aux"
    assert d["snap.jai.tileCacheSize"] is None  # commented key is visible
    assert d["snap.home"] == "/opt/snap"  # quotes stripped
    assert d["snap.parallelism"] == 4


def test_properties_store_layering_and_writes(tmp_path):
    install = tmp_path / "snap"
    user = tmp_path / "userhome" / ".snap"
    _write(
        str(install / "etc" / "snap.properties"),
        "snap.userdir = /install/aux\nsnap.parallelism = 2\n",
    )
    _write(
        str(user / "etc" / "snap.properties"),
        "snap.userdir = /user/aux\n",
    )
    _write(
        str(install / "etc" / "snap.conf"),
        "default_options = -J-Xmx2G -J-Xverify:none\n",
    )
    store = PropertiesStore(str(install), str(user))
    # user layer wins; untouched keys fall through to the install layer
    assert store["snap.userdir"] == "/user/aux"
    assert store["snap.parallelism"] == 2
    assert store["default_options"] == ["-J-Xmx2G", "-J-Xverify:none"]
    assert store.userpath == "/user/aux"
    with pytest.raises(KeyError):
        store["no.such.key"]
    # writes land in the USER file only, replacing in place
    store["snap.parallelism"] = 8
    assert store["snap.parallelism"] == 8
    user_text = open(user / "etc" / "snap.properties").read()
    assert "snap.parallelism = 8" in user_text
    install_text = open(install / "etc" / "snap.properties").read()
    assert "snap.parallelism = 2" in install_text
    # None re-comments the key in the user layer
    store["snap.userdir"] = None
    assert "#snap.userdir =" in open(user / "etc" / "snap.properties").read()
    # type guard (examine.py:557-558)
    with pytest.raises(TypeError, match="invalid type"):
        store["snap.parallelism"] = {"not": "allowed"}


def test_properties_store_userpath_fallback(tmp_path):
    install = tmp_path / "i"
    user = tmp_path / "u"
    store = PropertiesStore(str(install), str(user))
    # no snap.userdir anywhere → the user layer root
    assert store.userpath == str(user)


# ---------------------------------------------------------- install checks


def _fake_snap(root, with_gpt=True, etc_files=None):
    os.makedirs(root / "bin", exist_ok=True)
    (root / "bin" / "snap").write_text("#!/bin/sh\n")
    if with_gpt:
        (root / "bin" / "gpt").write_text("#!/bin/sh\n")
    os.makedirs(root / "etc", exist_ok=True)
    names = etc_files if etc_files is not None else [
        "snap.auxdata.properties", "snap.clusters", "snap.conf", "snap.properties",
    ]
    for name in names:
        (root / "etc" / name).write_text("")
    return str(root / "bin" / "snap")


def test_examine_snap_install(tmp_path):
    good = _fake_snap(tmp_path / "snap")
    found = examine_snap_install([str(tmp_path / "missing"), good])
    assert found is not None
    assert found["path"] == good
    assert found["etc"] == str(tmp_path / "snap" / "etc")
    assert found["gpt"].endswith("/gpt")
    # an executable without the etc layout is NOT a SNAP install
    lone = tmp_path / "appmgr" / "bin"
    os.makedirs(lone)
    (lone / "snap").write_text("")
    assert examine_snap_install([str(lone / "snap")]) is None
    # missing gpt disqualifies
    nogpt = _fake_snap(tmp_path / "snap2", with_gpt=False)
    assert examine_snap_install([nogpt]) is None
    # incomplete etc disqualifies
    partial = _fake_snap(tmp_path / "snap3", etc_files=["snap.conf"])
    assert examine_snap_install([partial]) is None


def test_gamma_version_grammar(tmp_path):
    assert gamma_version("/opt/GAMMA_SOFTWARE-20230712") == "20230712"
    assert gamma_version("/sw/GAMMA_SOFTWARE/20201216") == "20201216"
    with pytest.raises(RuntimeError, match="could not parse"):
        gamma_version("/opt/gamma")


def test_examine_gamma_config_flow(tmp_path):
    cfg = EngineConfig(str(tmp_path))
    with pytest.raises(RuntimeError, match="could not read GAMMA"):
        examine_gamma(cfg)
    out = examine_gamma(cfg, home="/opt/GAMMA_SOFTWARE-20230712")
    assert out == {"home": "/opt/GAMMA_SOFTWARE-20230712", "version": "20230712"}
    assert cfg["GAMMA"]["version"] == "20230712"
    # configured home is remembered when no explicit one is given
    again = examine_gamma(cfg)
    assert again["home"] == "/opt/GAMMA_SOFTWARE-20230712"
    # a new explicit home overrides the configured one
    newer = examine_gamma(cfg, home="/opt/GAMMA_SOFTWARE-20240101")
    assert newer["version"] == "20240101"
    assert cfg["GAMMA"]["home"] == "/opt/GAMMA_SOFTWARE-20240101"
