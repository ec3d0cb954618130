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
    shutil.rmtree(out_dir, ignore_errors=True)
