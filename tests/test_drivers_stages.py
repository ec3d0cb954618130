"""Format drivers (identify), border-noise stage, mosaic, PSNR, CSV import."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from pyrosar_ray.functions.metrics import pixels_match, psnr
from pyrosar_ray.sources.drivers import (
    encode_ceosish,
    encode_kvish,
    encode_xmlish,
    identify,
    identify_many,
    register_driver,
)
from pyrosar_ray.sources.images import images_from_documents
from pyrosar_ray.stages.images import mosaic_tiles, remove_border_noise

from pyrosar_ray.sources.formats import WKT4326

META = {
    "sensor": "S1A",
    "acquisition_mode": "IW",
    "orbit": "A",
    "start": "20150222T170750",
    "stop": "20150222T170815",
    "product": "GRD",
    "lines": 16685,
    "samples": 25368,
    "orbitNumber_abs": 4703,
    "orbitNumber_rel": 131,
    "cycleNumber": 29,
    "frameNumber": 159,
    "polarizations": ["VV", "VH"],
    "spacing": (10.0, 9.998647),
    "coordinates": [(-62.900521, -11.423305), (-62.1, -11.4), (-62.2, -10.7), (-62.9, -10.8)],
    "projection": WKT4326,
}


def test_identify_dispatch_all_formats():
    for enc in (encode_xmlish, encode_kvish, encode_ceosish):
        rec = identify(enc(META))
        assert rec["sensor"] == "S1A" and rec["lines"] == 16685
        assert rec["polarizations"] == ["VV", "VH"]
        assert rec["spacing"] == (10.0, 9.998647)
        # µdeg ÷ 1e6 round-trip for the binary format
        assert rec["coordinates"][0] == (-62.900521, -11.423305)


def test_identify_swallows_garbage():
    assert identify(b"\x00\x01garbage") is None
    assert identify(b"<scene><sensor>S1A</sensor></scene>") is None  # missing fields


def test_register_driver_extension():
    register_driver(
        "magic9", lambda b, m=None: b.startswith(b"M9"), lambda b: dict(META, sensor="X9")
    )
    try:
        assert identify(b"M9whatever")["sensor"] == "X9"
    finally:
        from pyrosar_ray.sources import drivers

        drivers.DRIVERS.pop("magic9")


def test_identify_many_drops_failures_and_sorts():
    metas = [dict(META, start=f"2015022{i}T000000") for i in (3, 1, 2)]
    blobs = [encode_xmlish(metas[0]), b"junk", encode_ceosish(metas[1]), encode_kvish(metas[2])]
    ds = ray.data.from_items([{"blob": b, "path": f"p{i}"} for i, b in enumerate(blobs)])
    out = identify_many(ds).to_pandas()
    assert len(out) == 3
    assert out["start"].tolist() == sorted(out["start"].tolist())
    assert set(out["path"]) == {"p0", "p2", "p3"}


def test_psnr_invariant():
    a = np.zeros((8, 8, 3), dtype=np.uint8)
    assert psnr(a, a) == float("inf")
    b = a.copy()
    b[0, 0, 0] = 2  # tiny error → high PSNR
    assert psnr(a, b) > 40
    assert pixels_match(a, a, lossy=False)
    assert not pixels_match(a, b, lossy=False)
    assert pixels_match(a, b, lossy=True)


def test_remove_border_noise(sf_dir):
    images = images_from_documents(sf_dir).limit(40)
    out = remove_border_noise(images, concurrency=1).to_pandas()
    assert len(out) == 40
    assert (out["valid_fraction"] > 0).all() and (out["valid_fraction"] <= 1).all()
    # left-edge noise strip is zeroed on every image
    row = out.iloc[0]
    arr = np.frombuffer(row["bytes"], dtype=np.uint8).reshape(row["h"], row["w"], 3)
    assert arr[:, 0, :].sum() == 0


def test_mosaic_tiles():
    thumb = 4
    rows = []
    for tile, n in (("T1", 3), ("T2", 1)):
        for i in range(n):
            arr = np.full((thumb, thumb, 3), i + 1, dtype=np.uint8)
            rows.append({"tile": tile, "image_id": f"img-{tile}-{i}", "thumbnail": arr.tobytes()})
    out = mosaic_tiles(ray.data.from_items(rows), thumb=thumb).to_pandas()
    t1 = out[out["tile"] == "T1"].iloc[0]
    assert t1["n_members"] == 3 and t1["mosaic_w"] == 3 * thumb
    stitched = np.frombuffer(t1["mosaic"], dtype=np.uint8).reshape(thumb, 3 * thumb, 3)
    assert stitched[0, 0, 0] == 1 and stitched[0, -1, 0] == 3


def test_archive_from_csv(tmp_path):
    df = pd.DataFrame(
        {
            "outname_base": ["A", "A", "B"],
            "product": ["GRD", "GRD", "SLC"],
            "scene": ["/x/a1.zip", "/x/a2.zip", "/x/b.zip"],
        }
    )
    path = tmp_path / "legacy.csv"
    df.to_csv(path, index=False)
    from pyrosar_ray.catalog.archive import RayArchive

    arch = RayArchive.from_csv(str(path))
    assert arch.size() == (2, 1)


def test_frame_sampler():
    import ray.data as rd

    from pyrosar_ray.stages.images import sample_frames

    w = h = 4
    frames = [np.full((h, w, 3), f, dtype=np.uint8) for f in range(6)]
    blob = b"".join(f.tobytes() for f in frames)
    rows = [{"image_id": "vid-0", "bytes": blob, "w": w, "h": h, "fmt": "rawvideo", "caption": "c"}]
    out = sample_frames(rd.from_items(rows), step=2, concurrency=1).to_pandas()
    assert out["frame"].tolist() == [0, 2, 4]
    first = np.frombuffer(out.iloc[1]["bytes"], dtype=np.uint8)
    assert (first == 2).all()
    assert (out["caption"] == "c").all()


def test_frame_sampler_compressed_is_stubbed():
    import pytest
    import ray.data as rd

    from pyrosar_ray.stages.images import sample_frames

    rows = [{"image_id": "v", "bytes": b"x", "w": 2, "h": 2, "fmt": "mp4", "caption": "c"}]
    with pytest.raises(Exception):
        sample_frames(rd.from_items(rows), concurrency=1).to_pandas()


def test_archive_members_zip_and_tar():
    import io
    import tarfile
    import zipfile

    from pyrosar_ray.sources.drivers import find_members, get_member, list_members

    zbuf = io.BytesIO()
    with zipfile.ZipFile(zbuf, "w") as zf:
        zf.writestr("annotation/s1a-iw-grd.xml", "<x/>")
        zf.writestr("manifest.safe", "MANIFEST")
    zblob = zbuf.getvalue()
    assert list_members(zblob) == ["annotation/s1a-iw-grd.xml", "manifest.safe"]
    assert find_members(zblob, r"manifest\.safe$") == ["manifest.safe"]
    assert get_member(zblob, "manifest.safe") == b"MANIFEST"

    tbuf = io.BytesIO()
    with tarfile.open(fileobj=tbuf, mode="w") as tf:
        data = b"LEADER"
        info = tarfile.TarInfo("LED-ALPSRP066")
        info.size = len(data)
        tf.addfile(info, io.BytesIO(data))
    tblob = tbuf.getvalue()
    assert list_members(tblob) == ["LED-ALPSRP066"]
    assert get_member(tblob, "LED-ALPSRP066") == b"LEADER"

    import pytest

    with pytest.raises(ValueError):
        list_members(b"not an archive")


def test_extra_date_epochs():
    from datetime import datetime

    from pyrosar_ray.functions.dates import mjd2000_to_datetime, seconds_since_1985

    assert seconds_since_1985("19850101T000010") == 10.0
    assert mjd2000_to_datetime(1, 2, 3) == datetime(2000, 1, 2, 0, 0, 2, 3)
