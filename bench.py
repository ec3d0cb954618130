"""Benchmark harness — headline pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N}

``--scaling`` runs the headline pipeline (spatial join + tile counts)
twice in FRESH subprocesses at num_cpus=8 and num_cpus=32 on the same
input and reports throughput at both plus scaling efficiency
E = (R32/R8) / (32/8)  (sandbox protocol for the N→4N cluster
criterion; see BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

#: benchmark suite: name → queries() key (all read SF_DIR)
BENCH_QUERIES = (
    "spatial_join",
    "spatial_knn",
    "tile_assign",
    "tile_counts",
    "dedup_data",
    "asof_osv",
    "sessionize",
    "sessionize_ranged",
    "events_stats",
    "embed_topk",
    "doc_minhash_pairs",
    "doc_jaccard_pairs",
    "image_features",
)


def _init_ray(num_cpus: int) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _consume(result) -> int:
    """Materialize a result just enough to count rows (no driver collect)."""
    import pandas as pd
    import pyarrow as pa

    if isinstance(result, (pd.DataFrame, pa.Table)):
        return len(result)
    # ray.data.Dataset: count() executes the pipeline with streaming
    return result.count()


def run_suite(sf_dir: str, num_cpus: int) -> dict:
    _init_ray(num_cpus)
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name in BENCH_QUERIES:
        t0 = time.time()
        rows[name] = _consume(qs[name](sf_dir))
        timings[name] = round(time.time() - t0, 3)
    return {"timings": timings, "rows": rows}


def run_headline(sf_dir: str, num_cpus: int) -> dict:
    """The scaling pipeline: spatial join + point-tile counts, row-counted.

    The point stream is replicated GRAFT_BENCH_MULT× (default 16) with
    distinct ids inside the pipeline, standing in for the target's much
    larger image table so the parallel probe work dominates fixed
    startup costs — both parallelism levels run the identical inflated
    input.
    """
    _init_ray(num_cpus)
    import pyarrow as pa
    import pyarrow.compute as pc

    from pyrosar_ray.functions.tiles import tile_index_1deg, tile_name_from_index
    from pyrosar_ray.pipelines.tables import load_points, load_scenes
    from pyrosar_ray.stages.spatial import spatial_join_points
    from pyrosar_ray.stages.tiling import tile_counts_indexed

    mult = int(os.environ.get("GRAFT_BENCH_MULT", "16"))

    def _replicate(batch: pa.Table) -> pa.Table:
        copies = []
        for r in range(mult):
            ids = pc.add(batch["point_id"], r * 10_000_000_000)
            copies.append(batch.set_column(0, "point_id", ids))
        return pa.concat_tables(copies)

    import pyarrow.parquet as pq

    n_points = pq.ParquetFile(f"{sf_dir}/lineitem.parquet").metadata.num_rows * mult
    t0 = time.time()
    points = load_points(sf_dir).map_batches(_replicate, batch_format="pyarrow")
    pairs = spatial_join_points(load_scenes(sf_dir), points)

    # hot path carries int64 tile indices; names attach to the bounded
    # aggregate at the end (tile_counts_indexed)
    def _point_tiles(batch: pa.Table) -> pa.Table:
        idx = tile_index_1deg(batch["lon"].to_numpy(), batch["lat"].to_numpy())
        return pa.table(
            {
                "scene_key": batch["scene_key"],
                "point_id": batch["point_id"],
                "tile_idx": pa.array(idx),
            }
        )

    counts = tile_counts_indexed(pairs.map_batches(_point_tiles, batch_format="pyarrow"))
    n_tiles = counts.count()
    elapsed = time.time() - t0
    return {
        "elapsed_sec": elapsed,
        "rows_in": n_points,
        "tiles_out": n_tiles,
        "rows_per_sec": n_points / elapsed,
    }


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--scaling", action="store_true")
    parser.add_argument("--headline-only", action="store_true", help="internal: one headline run")
    parser.add_argument("--num-cpus", type=int, default=NUM_CPUS)
    parser.add_argument("--sf-dir", default=SF_DIR)
    args = parser.parse_args()

    if args.headline_only:
        out = run_headline(args.sf_dir, args.num_cpus)
        print(json.dumps(out))
        import ray

        ray.shutdown()
        return

    if args.scaling:
        results = {}
        for n in (8, 32):
            proc = subprocess.run(
                [
                    sys.executable,
                    os.path.abspath(__file__),
                    "--headline-only",
                    "--num-cpus",
                    str(n),
                    "--sf-dir",
                    args.sf_dir,
                ],
                capture_output=True,
                text=True,
                check=True,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            results[n] = json.loads(proc.stdout.strip().splitlines()[-1])
        r8 = results[8]["rows_per_sec"]
        r32 = results[32]["rows_per_sec"]
        print(
            json.dumps(
                {
                    "metric": "spatial_join_tile_scaling",
                    "value": round((r32 / r8) / 4.0, 4),
                    "unit": "efficiency",
                    "throughput_rows_per_sec": {"8": round(r8, 1), "32": round(r32, 1)},
                    "elapsed_sec": {
                        "8": round(results[8]["elapsed_sec"], 2),
                        "32": round(results[32]["elapsed_sec"], 2),
                    },
                    "sf_dir": args.sf_dir,
                }
            )
        )
        return

    suite = run_suite(args.sf_dir, args.num_cpus)
    sf = args.sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "pyrosar_ray_bench_suite",
                "value": round(sum(suite["timings"].values()), 3),
                "unit": "sec",
                "queries": suite["timings"],
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "num_cpus": args.num_cpus,
            }
        )
    )
    import ray

    ray.shutdown()


if __name__ == "__main__":
    main()
