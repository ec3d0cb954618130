"""End-to-end resumable tile-ingest pipeline (the M8 lifecycle slice).

scenes → 1° tile expansion → partition by latitude band → idempotent
partition-addressed parquet writes with lineage sidecars → on restart,
anti-join completed bands and process only the remainder. Mirrors the
reference's `processdir` resume (archive.py:1092-1095) and filename-
convention skip (drivers.py:560-582) without any shared-FS locks.

Partition key = the tile's latitude band (``N51`` → one directory per
band, bounded count) rather than the raw tile (64800 dirs) — resumable
granularity should match restart economics, not key cardinality.
"""

from __future__ import annotations

import pyarrow as pa
from ray.data import Dataset

from ..stages.tiling import assign_tiles
from ..state.lineage import completed_keys, resume_filter, write_partitioned
from ..state.metrics import instrument


def _with_band(tiles: Dataset) -> Dataset:
    def _band(batch: pa.Table) -> pa.Table:
        bands = [t[:3] for t in batch["tile"].to_pylist()]
        return batch.append_column("band", pa.array(bands, type=pa.string()))

    return tiles.map_batches(_band, batch_format="pyarrow")


def ingest_tiles(
    scenes: Dataset,
    out_dir: str,
    keep_cols: tuple[str, ...] = ("scene_key",),
    with_metrics: bool = False,
) -> Dataset:
    """Run (or resume) the tile ingest; returns the partition manifest.

    Already-finished latitude bands are skipped via the lineage
    anti-join, so a crashed run re-processes only incomplete bands and
    re-running a finished ingest is a no-op.
    """
    tiles = _with_band(assign_tiles(scenes, keep_cols=keep_cols))
    if with_metrics:
        tiles = instrument(tiles, "tile_ingest.expand")
    done = completed_keys(out_dir)
    remaining = resume_filter(tiles, "band", done)
    manifest = write_partitioned(remaining, out_dir, "band")
    if with_metrics:
        # per-operator cost sidecar next to the lineage manifest, so a
        # resumed attempt can compare stage cost against prior attempts
        manifest = manifest.materialize()
        from ..state.metrics import write_metrics

        write_metrics(manifest, out_dir, run_id=f"attempt-{len(done)}-done")
    return manifest
