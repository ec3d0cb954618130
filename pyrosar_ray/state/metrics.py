"""Per-stage metrics emission — the engine's observability channel.

Every instrumented stage reports (stage, partition/batch, rows, bytes,
error counts) to a named collector actor; the driver snapshots the
counters after a run. This replaces the reference's log files and
error-lock markers (pyroSAR ancillary.py:396-590, snap/util.py:693-696)
with cluster-wide counters that survive task retries (idempotent
accumulate keyed by batch id would dedup retried batches; the engine
records retry totals which is what capacity planning needs).
"""

from __future__ import annotations

import ray

_COLLECTOR_NAME = "pyrosar_ray_metrics"


@ray.remote(num_cpus=0)
class MetricsCollector:
    def __init__(self):
        self.counters: dict[tuple[str, str], float] = {}

    def add(self, stage: str, metric: str, value: float) -> None:
        key = (stage, metric)
        self.counters[key] = self.counters.get(key, 0.0) + value

    def snapshot(self) -> dict:
        return {f"{s}/{m}": v for (s, m), v in sorted(self.counters.items())}

    def reset(self) -> None:
        self.counters.clear()


def get_collector():
    """The session-wide named collector (created on first use)."""
    return MetricsCollector.options(
        name=_COLLECTOR_NAME, get_if_exists=True, lifetime="detached"
    ).remote()


def instrument(ds, stage: str):
    """Pass-through stage that counts rows/batches/null rows per stage."""
    import pyarrow as pa

    collector = get_collector()

    def _count(batch: pa.Table) -> pa.Table:
        collector.add.remote(stage, "rows", float(len(batch)))
        collector.add.remote(stage, "batches", 1.0)
        collector.add.remote(stage, "bytes", float(batch.nbytes))
        return batch

    return ds.map_batches(_count, batch_format="pyarrow")


def snapshot() -> dict:
    return ray.get(get_collector().snapshot.remote())


def reset() -> None:
    ray.get(get_collector().reset.remote())


# ---------------------------------------------------------------------------
# Post-hoc structured stage metrics (from Dataset execution stats)
#
# The collector above counts live, inside the stream; the functions below
# capture the EXECUTED plan's per-operator cost (wall / cpu / udf time,
# rows, bytes, peak task heap) from Dataset.stats()'s underlying summary
# — the work-conservation signal (flat cpu-sum across cluster sizes = no
# coordination overhead) and the sidecar a resumed run compares against.
# Optional-safe on every field so Ray version drift degrades to nulls.
# ---------------------------------------------------------------------------

METRICS_FILE = "_metrics.json"


def _agg(d, key: str, default=None):
    """Pull one aggregate out of a stats dict ({'min','max','mean','sum'})."""
    if isinstance(d, dict):
        v = d.get(key)
        return None if v is None else float(v)
    return default


def stage_metrics(ds):
    """One row per executed physical operator of ``ds`` (pandas DataFrame).

    Columns: operator, wall_s (operator wall-clock), task_wall_sum_s /
    task_cpu_sum_s / udf_sum_s (summed across tasks), rows_out,
    bytes_out, peak_task_heap_mb, nodes. The Dataset must have executed
    (materialize / write / iterated); stats on a lazy plan are empty.
    """
    import pandas as pd

    summary = ds._get_stats_summary()
    rows = []
    for op in getattr(summary, "operators_stats", []) or []:
        rows.append(
            {
                "operator": str(getattr(op, "operator_name", "?")),
                "wall_s": float(getattr(op, "time_total_s", 0.0) or 0.0),
                "task_wall_sum_s": _agg(getattr(op, "wall_time", None), "sum"),
                "task_cpu_sum_s": _agg(getattr(op, "cpu_time", None), "sum"),
                "udf_sum_s": _agg(getattr(op, "udf_time", None), "sum"),
                "rows_out": _agg(getattr(op, "output_num_rows", None), "sum"),
                "bytes_out": _agg(getattr(op, "output_size_bytes", None), "sum"),
                "peak_task_heap_mb": _agg(getattr(op, "memory", None), "max"),
                "nodes": _agg(getattr(op, "node_count", None), "max"),
            }
        )
    return pd.DataFrame(
        rows,
        columns=[
            "operator",
            "wall_s",
            "task_wall_sum_s",
            "task_cpu_sum_s",
            "udf_sum_s",
            "rows_out",
            "bytes_out",
            "peak_task_heap_mb",
            "nodes",
        ],
    )


def write_metrics(ds, out_dir: str, run_id: str = "run") -> str:
    """Persist :func:`stage_metrics` as a JSON sidecar under ``out_dir``.

    Written next to the lineage manifest (``{out_dir}/_metrics.json``)
    via atomic rename, keyed by ``run_id`` + wall timestamp so repeated
    attempts append history instead of clobbering it. Returns the path.
    """
    import json
    import os
    import time

    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, METRICS_FILE)
    history = []
    if os.path.exists(path):
        with open(path) as fh:
            history = json.load(fh)
    history.append(
        {
            "run_id": run_id,
            "ts": time.time(),
            "stages": stage_metrics(ds).to_dict(orient="records"),
        }
    )
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(history, fh)
    os.replace(tmp, path)
    return path


def read_metrics(out_dir: str) -> list[dict]:
    """All recorded metrics runs under ``out_dir`` (driver-side, small)."""
    import json
    import os

    path = os.path.join(out_dir, METRICS_FILE)
    if not os.path.exists(path):
        return []
    with open(path) as fh:
        return json.load(fh)
