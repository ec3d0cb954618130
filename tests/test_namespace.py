"""GAMMA Namespace twin + chain-level resume (reference
gamma/auxil.py:266-357; chain semantics gamma/util.py:900-945)."""

import json
import os

import numpy as np
import pytest

from pyrosar_ray.state.namespace import Namespace


def test_reference_api_parity(tmp_path):
    # docstring example (gamma/auxil.py:280-287)
    n = Namespace(directory=str(tmp_path), basename="S1A__IW___A_20180829T170631")
    assert n.pix_geo == "-"
    n.appreciate(["pix_geo"])
    assert n.pix_geo == os.path.join(
        str(tmp_path), "S1A__IW___A_20180829T170631_pix_geo"
    )
    # '.' launders to '_' on access and registration
    n.appreciate(["dem.seg"])
    assert n["dem.seg"].endswith("_dem.seg")
    assert n.isregistered("dem_seg")
    # depreciate → '-' placeholder, still registered
    n.depreciate(["inc_geo"])
    assert n.inc_geo == "-"
    assert n.isregistered("inc_geo")
    assert not n.isappreciated("inc_geo")
    assert n.isappreciated("pix_geo")
    assert sorted(n.getall()) == ["dem_seg", "inc_geo", "pix_geo"]
    assert n.select(["pix_geo", "inc_geo"]) == [n.pix_geo, "-"]
    assert not n.isfile("pix_geo")


def test_ensure_writes_sidecar_and_reuses(tmp_path):
    n = Namespace(str(tmp_path), "scene")
    n.appreciate(["mli"])
    calls = []

    def produce(path):
        calls.append(path)
        with open(path, "wb") as fh:
            fh.write(b"\x00" * 64)

    p1 = n.ensure("mli", produce)
    assert os.path.isfile(p1) and os.path.isfile(p1 + ".lineage.json")
    assert json.load(open(p1 + ".lineage.json"))["bytes"] == 64
    # exist_ok=True: completed product is NOT reproduced
    p2 = n.ensure("mli", produce)
    assert p2 == p1 and len(calls) == 1
    # exist_ok=False: always reproduced
    n.ensure("mli", produce, exist_ok=False)
    assert len(calls) == 2


def test_torn_product_without_sidecar_is_rerun(tmp_path):
    """A file that exists but never got its sidecar (crash mid-producer)
    must NOT be trusted — unlike the reference's bare isfile guard."""
    n = Namespace(str(tmp_path), "scene")
    n.appreciate(["dem_seg_geo"])
    torn = n.dem_seg_geo
    with open(torn, "wb") as fh:
        fh.write(b"partial")
    assert not n.iscomplete("dem_seg_geo")
    calls = []
    n.ensure("dem_seg_geo", lambda p: (calls.append(p), open(p, "wb").write(b"full")))
    assert len(calls) == 1 and open(torn, "rb").read() == b"full"
    assert n.iscomplete("dem_seg_geo")


def test_unappreciated_ensure_raises(tmp_path):
    n = Namespace(str(tmp_path), "scene")
    n.depreciate(["ls_map_geo"])
    with pytest.raises(KeyError):
        n.ensure("ls_map_geo", lambda p: None)


def test_killed_and_resumed_two_stage_chain(tmp_path):
    """The gamma chain shape (gamma/util.py:935-945): stage 1 multilooks,
    stage 2 converts to dB. The first run dies after stage 1; the resume
    reuses the surviving intermediate and only runs stage 2."""
    from pyrosar_ray.functions.raster import linear_to_db, multilook

    src = (np.arange(64, dtype=np.float64).reshape(8, 8) + 1.0)
    stage_calls = {"mli": 0, "db": 0}

    def run_chain(n: Namespace, die_after_mli: bool):
        n.appreciate(["mli", "db"])

        # np.save appends .npy — write at the exact namespace path
        def save_at(path, arr):
            with open(path, "wb") as fh:
                np.lib.format.write_array(fh, arr)

        def make_mli(path):
            stage_calls["mli"] += 1
            save_at(path, multilook(src, 2, 2))

        n.ensure("mli", make_mli)
        if die_after_mli:
            raise RuntimeError("killed")

        def make_db(path):
            stage_calls["db"] += 1
            mli = np.lib.format.read_array(open(n.mli, "rb"))
            save_at(path, linear_to_db(mli))

        n.ensure("db", make_db)
        return np.lib.format.read_array(open(n.db, "rb"))

    n1 = Namespace(str(tmp_path), "S1A__IW___A_20180829T170631")
    with pytest.raises(RuntimeError, match="killed"):
        run_chain(n1, die_after_mli=True)
    assert n1.completed() == ["mli"]

    # fresh process ⇒ fresh Namespace over the same directory
    n2 = Namespace(str(tmp_path), "S1A__IW___A_20180829T170631")
    out = run_chain(n2, die_after_mli=False)
    assert stage_calls == {"mli": 1, "db": 1}  # stage 1 NOT recomputed
    expect = linear_to_db(multilook(src, 2, 2))
    np.testing.assert_allclose(out, expect)
    assert sorted(n2.completed()) == ["db", "mli"]
