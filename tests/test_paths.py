"""Real-archive adapter: identify over on-disk layouts (unpacked .SAFE
directory trees, zips, tars) — the production glue from filesystem paths
to the engine's blob column (reference identify(filename),
drivers.py:69-120)."""

import os
import tarfile
import zipfile

import pytest

from pyrosar_ray.sources.drivers import identify, identify_many
from pyrosar_ray.sources.formats.common import WKT4326
from pyrosar_ray.sources.formats.safe import build_safe_blob
from pyrosar_ray.sources.paths import (
    find_scene_paths,
    identify_path,
    path_to_blob,
    read_scene_paths,
)

S1_META = {
    "sensor": "S1A",
    "acquisition_mode": "IW",
    "orbit": "A",
    "start": "20150222T170750",
    "stop": "20150222T170815",
    "product": "GRD",
    "samples": 25548,
    "lines": 16716,
    "orbitNumber_abs": 4747,
    "orbitNumber_rel": 4747 % 175,
    "cycleNumber": 4747 // 175 + 1,
    "frameNumber": 443,
    "polarizations": ["VV", "VH"],
    "spacing": (10.0, 9.998647),
    "coordinates": [
        (8.017178, 50.295261),
        (12.0268, 50.295261),
        (12.0268, 52.183979),
        (8.017178, 52.183979),
    ],
    "projection": WKT4326,
    "looks": (1, 1),
    "IPF_version": 2.43,
}

SAFE_NAME = "S1A_IW_GRDH_1SDV_20150222T170750_20150222T170815_004747_005E28_82BE.SAFE"


@pytest.fixture()
def safe_tree(tmp_path):
    """Unpack a synthetic SAFE zip into a real on-disk .SAFE directory
    tree — the layout a production user points the engine at."""
    blob = build_safe_blob(S1_META)
    root = tmp_path / SAFE_NAME
    with zipfile.ZipFile(__import__("io").BytesIO(blob)) as zf:
        for member in zf.namelist():
            dest = root / member
            dest.parent.mkdir(parents=True, exist_ok=True)
            dest.write_bytes(zf.read(member))
    return root


def test_identify_unpacked_safe_directory(safe_tree):
    rec = identify_path(safe_tree)
    assert rec is not None
    assert rec["sensor"] == "S1A"
    assert rec["product"] == "GRD"
    assert rec["polarizations"] == ["VV", "VH"]
    assert rec["coordinates"] == S1_META["coordinates"]
    # drivers.identify accepts the path spelling directly (reference parity)
    assert identify(str(safe_tree))["sensor"] == "S1A"
    assert identify(safe_tree)["start"] == S1_META["start"]


def test_packed_dir_matches_original_zip(safe_tree):
    """Directory packing reproduces the original member layout, so the
    parsed record is IDENTICAL to the blob-native parse."""
    from_dir = identify_path(safe_tree)
    from_blob = identify(build_safe_blob(S1_META))
    # member names in the packed zip carry the .SAFE prefix
    names = zipfile.ZipFile(__import__("io").BytesIO(path_to_blob(safe_tree))).namelist()
    assert all(n.startswith(SAFE_NAME + "/") for n in names)
    assert any(n.endswith("manifest.safe") for n in names)
    for key, val in from_blob.items():
        assert from_dir[key] == val, key


def test_identify_zip_and_tar_files(tmp_path, safe_tree):
    blob = build_safe_blob(S1_META)
    zpath = tmp_path / "scene.zip"
    zpath.write_bytes(blob)
    assert identify_path(zpath)["sensor"] == "S1A"

    # tar layouts go through the same member machinery (CEOS et al.);
    # a tar of the SAFE tree is NOT a PK blob so SAFE must not sniff —
    # identify returns None rather than mis-parsing
    tpath = tmp_path / "scene.tar"
    with tarfile.open(tpath, "w") as tf:
        tf.add(safe_tree, arcname=SAFE_NAME)
    assert identify_path(tpath) is None


def test_find_scene_paths(tmp_path, safe_tree):
    (tmp_path / "other").mkdir()
    (tmp_path / "other" / "scene2.zip").write_bytes(build_safe_blob(S1_META))
    (tmp_path / "notes.txt").write_text("not a scene")
    found = find_scene_paths(str(tmp_path))
    names = [os.path.basename(p) for p in found]
    assert SAFE_NAME in names and "scene2.zip" in names
    assert "notes.txt" not in names
    assert "manifest.safe" not in names  # .SAFE dirs are leaves
    assert found == sorted(found)


def test_read_scene_paths_dataset(ray_session, tmp_path, safe_tree):
    (tmp_path / "scene2.zip").write_bytes(
        build_safe_blob({**S1_META, "orbitNumber_abs": 4748})
    )
    ds = read_scene_paths(str(tmp_path))
    parsed = identify_many(ds, keep_cols=("scene",))
    df = parsed.to_pandas().sort_values("scene").reset_index(drop=True)
    assert len(df) == 2
    assert set(df["sensor"]) == {"S1A"}
    assert df["error"].isna().all()
