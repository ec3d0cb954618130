"""Partition lineage + checkpoint/resume."""

import json
import os

import pandas as pd
import ray.data

from pyrosar_ray.state.lineage import (
    completed_keys,
    read_manifest,
    resume_filter,
    write_partitioned,
)


def _df(n=60):
    return pd.DataFrame(
        {
            "tile": [f"T{i % 4}" for i in range(n)],
            "val": range(n),
        }
    )


def test_write_resume_roundtrip(tmp_path):
    out = str(tmp_path / "out")
    manifest = write_partitioned(ray.data.from_pandas(_df()), out, "tile").to_pandas()
    assert len(manifest) == 4 and manifest["rows"].sum() == 60
    assert completed_keys(out) == {"T0", "T1", "T2", "T3"}

    # resume drops completed partitions entirely
    resumed = resume_filter(ray.data.from_pandas(_df()), "tile", completed_keys(out))
    assert resumed.count() == 0

    # partial completion: remove one partition → only its rows survive
    import shutil

    shutil.rmtree(os.path.join(out, "key=T2"))
    resumed = resume_filter(ray.data.from_pandas(_df()), "tile", completed_keys(out))
    assert resumed.count() == 15

    records = read_manifest(out)
    assert {r["key"] for r in records} == {"T0", "T1", "T3"}
    assert all(len(r["fingerprint"]) == 16 for r in records)


def test_rerun_is_idempotent(tmp_path):
    out = str(tmp_path / "out")
    write_partitioned(ray.data.from_pandas(_df()), out, "tile").materialize()
    first = {r["key"]: r["fingerprint"] for r in read_manifest(out)}
    write_partitioned(ray.data.from_pandas(_df()), out, "tile").materialize()
    second = {r["key"]: r["fingerprint"] for r in read_manifest(out)}
    assert first == second


def test_stage_metrics_structured(tmp_path):
    """Executed pipeline → one metrics row per physical operator, with
    rows/bytes/time populated; sidecar appends history across runs."""
    from pyrosar_ray.state.metrics import read_metrics, stage_metrics, write_metrics

    ds = (
        ray.data.from_pandas(_df(200))
        .repartition(4)
        .map_batches(lambda b: b, batch_format="pyarrow")
        .materialize()
    )
    m = stage_metrics(ds)
    assert len(m) >= 1
    assert set(m.columns) >= {"operator", "wall_s", "rows_out", "task_cpu_sum_s"}
    # the terminal operator emitted all 200 rows and nonzero wall time
    last = m.iloc[-1]
    assert last["rows_out"] == 200
    assert last["wall_s"] > 0

    out = str(tmp_path / "metrics")
    p1 = write_metrics(ds, out, run_id="a")
    p2 = write_metrics(ds, out, run_id="b")
    assert p1 == p2
    hist = read_metrics(out)
    assert [h["run_id"] for h in hist] == ["a", "b"]
    assert hist[0]["stages"][-1]["rows_out"] == 200
    assert read_metrics(str(tmp_path / "nope")) == []
