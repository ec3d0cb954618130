"""Cluster job driver — the ``ray job submit`` entry point.

The north-star job form: submit this module to a fixed-size Ray
cluster and it streams the image+caption table through the headline
spatial-join + tile-assignment pipeline, writing resumable partitioned
parquet with per-partition lineage sidecars and printing one metrics
JSON line.

    ray job submit --working-dir . -- \
        python -m pyrosar_ray.job --sf-dir /data/sf100 --out /data/tiles

Re-running after a crash skips finished latitude bands (lineage
anti-join in pipelines/tile_ingest.py). In this sandbox the same
driver runs standalone: with no cluster, ``ray.init(address=...)``
falls back to a local session (auto-init guarded — the module never
re-inits inside an existing job/session, per the engine convention).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    parser.add_argument("--out", required=True, help="output directory")
    parser.add_argument("--num-cpus", type=int, default=None,
                        help="local fallback only; ignored on a cluster")
    args = parser.parse_args(argv)

    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False, "logging_level": "ERROR"}
        if args.num_cpus:
            kwargs.update(address="local", num_cpus=args.num_cpus)
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from pyrosar_ray.pipelines.tables import load_scenes
    from pyrosar_ray.pipelines.tile_ingest import ingest_tiles

    t0 = time.time()
    manifest = ingest_tiles(
        load_scenes(args.sf_dir), args.out, with_metrics=True
    ).to_pandas()
    wall = time.time() - t0

    out = {
        "metric": "tile_ingest_job",
        "sf_dir": args.sf_dir,
        "out": args.out,
        "partitions_written": int(len(manifest)),
        "rows_written": int(manifest["rows"].sum()) if len(manifest) else 0,
        "wall_sec": round(wall, 3),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
