"""Resumable tile-ingest pipeline + metrics collector."""

import os
import shutil

import pyarrow.parquet as pq

from pyrosar_ray.pipelines.tables import load_scenes
from pyrosar_ray.pipelines.tile_ingest import ingest_tiles
from pyrosar_ray.state.lineage import completed_keys, read_manifest


def test_ingest_resume_roundtrip(tmp_path, sf_dir):
    out = str(tmp_path / "tiles")
    manifest = ingest_tiles(load_scenes(sf_dir), out).to_pandas()
    n_bands = len(manifest)
    assert n_bands > 10
    total_rows = manifest["rows"].sum()
    assert completed_keys(out) == set(manifest["key"])

    # finished ingest re-run → nothing left to write
    again = ingest_tiles(load_scenes(sf_dir), out).to_pandas()
    assert len(again) == 0

    # crash simulation: drop two bands → only those re-process, with
    # identical lineage fingerprints
    before = {r["key"]: r["fingerprint"] for r in read_manifest(out)}
    dropped = sorted(completed_keys(out))[:2]
    for b in dropped:
        shutil.rmtree(os.path.join(out, f"key={b}"))
    redo = ingest_tiles(load_scenes(sf_dir), out).to_pandas()
    assert sorted(redo["key"]) == dropped
    after = {r["key"]: r["fingerprint"] for r in read_manifest(out)}
    assert after == before
    assert sum(r["rows"] for r in read_manifest(out)) == total_rows

    # data integrity: per-band files reload to the same totals
    band = dropped[0]
    tab = pq.read_table(os.path.join(out, f"key={band}", "data.parquet"))
    assert set(tab["band"].to_pylist()) == {band}


def test_load_table_routes_lance_directory(tmp_path, monkeypatch, sf_dir):
    """A {name}.lance dataset dir routes through ray.data.read_lance
    (stubbed — the lance package is absent in this container); plain
    parquet dirs keep the parquet reader."""
    import sys
    import types

    import ray.data as rd

    from pyrosar_ray.pipelines import tables

    # parquet path: normal read works
    ds = tables.load_table(sf_dir, "events", columns=["event_id"])
    assert ds.schema().names == ["event_id"]

    # lance path: fake dataset dir + stub module, capture the call
    os.makedirs(tmp_path / "events.lance")
    monkeypatch.setitem(sys.modules, "lance", types.ModuleType("lance"))
    calls = {}

    def _fake_read_lance(path, columns=None, **kw):
        calls["path"], calls["columns"] = path, columns
        return rd.read_parquet(f"{sf_dir}/events.parquet", columns=columns)

    monkeypatch.setattr(rd, "read_lance", _fake_read_lance, raising=False)
    ds = tables.load_table(str(tmp_path), "events", columns=["event_id"])
    assert calls["path"].endswith("events.lance") and calls["columns"] == ["event_id"]
    assert ds.schema().names == ["event_id"]

    # lance dir without the package → actionable error
    monkeypatch.delitem(sys.modules, "lance")
    monkeypatch.setattr(
        "builtins.__import__",
        _blocking_import("lance"),
    )
    try:
        tables.load_table(str(tmp_path), "events")
        assert False, "expected ImportError"
    except ImportError as exc:
        assert "lance" in str(exc)


def _blocking_import(blocked: str):
    real_import = __import__

    def _imp(name, *a, **kw):
        if name == blocked:
            raise ImportError(f"No module named '{blocked}'")
        return real_import(name, *a, **kw)

    return _imp


def test_image_table_roundtrip_parquet_fallback(tmp_path, sf_dir):
    """write_image_table/read_image_table round-trip via the parquet
    fallback with the input_hint schema intact."""
    from pyrosar_ray.sources.images import (
        images_from_documents,
        read_image_table,
        write_image_table,
    )

    out = str(tmp_path / "imgs")
    ds = images_from_documents(sf_dir).limit(20)
    write_image_table(ds, out)
    back = read_image_table(out)
    assert back.count() == 20
    assert set(back.schema().names) == {
        "image_id", "bytes", "w", "h", "fmt", "caption", "phash",
    }


def test_metrics_collector(sf_dir):
    import ray

    from pyrosar_ray.state import metrics

    metrics.reset()
    out_dir = "/tmp/pyrosar_ray_metrics_test"
    shutil.rmtree(out_dir, ignore_errors=True)
    ingest_tiles(load_scenes(sf_dir), out_dir, with_metrics=True).materialize()
    snap = metrics.snapshot()
    assert snap["tile_ingest.expand/rows"] > 0
    assert snap["tile_ingest.expand/batches"] >= 1
    # the structured per-operator sidecar landed next to the lineage
    from pyrosar_ray.state.metrics import read_metrics

    runs = read_metrics(out_dir)
    assert len(runs) == 1 and runs[0]["stages"], runs
    shutil.rmtree(out_dir, ignore_errors=True)


def test_job_module_main(tmp_path, sf_dir):
    """The `ray job submit` entry point runs inside an existing session
    (never re-inits), writes the resumable output + both sidecars and
    returns 0."""
    import json

    from pyrosar_ray.job import main
    from pyrosar_ray.state.metrics import read_metrics

    out = str(tmp_path / "job_out")
    rc = main(["--sf-dir", sf_dir, "--out", out])
    assert rc == 0
    assert len(read_metrics(out)) == 1
    bands = [p for p in os.listdir(out) if p.startswith("key=")]
    assert bands
    with open(os.path.join(out, bands[0], "_lineage.json")) as fh:
        assert json.load(fh)["rows"] > 0
    # resume: immediate rerun writes nothing new, appends a metrics attempt
    rc2 = main(["--sf-dir", sf_dir, "--out", out])
    assert rc2 == 0
    assert len(read_metrics(out)) == 2
