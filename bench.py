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
    "spatial_join_s2",
    "spatial_join_hex",
    "spatial_join_poly",
    "spatial_knn",
    "spatial_knn_rtree",
    "spatial_knn_partitioned",
    "doc_dup_spans",
    "doc_triangles",
    "image_caption_curate",
    "tile_assign",
    "tile_counts",
    "tile_coverage",
    "dedup_data",
    "asof_osv",
    "sessionize",
    "sessionize_ranged",
    "events_stats",
    "embed_topk",
    "doc_minhash_pairs",
    "doc_jaccard_pairs",
    "image_features",
    "doc_curate",
    "raster_footprint",
    "zonal_stats",
    "sample_raster",
    "image_patches",
    "doc_langid_int",
    "video_gif_frames",
    "scene_overlap_area",
    "doc_global_rank",
    "doc_crawl_curate",
    "embed_sq_rerank",
    "noise_power",
    "dem_gamma_import",
    "spatial_radius_join",
    "doc_dsir",
    "raster_contours",
    "raster_pyramid",
    "doc_fuzzy_dedup",
    "events_timetravel",
    "image_mosaic",
    "grid_focal",
    "tpch_q1",
    "tpch_q3",
    "tpch_q7",
    "tpch_q10",
    "tpch_q13",
    "tpch_q14",
    "tpch_q16",
    "tpch_q18",
    "tpch_q19",
    "tpch_q22",
    "tpch_q2",
    "tpch_q4",
    "tpch_q8",
    "tpch_q15",
    "tpch_q17",
    "events_scd2",
    "scene_kcore",
    "events_eqdelete",
    "points_hilbert",
    "events_new_users",
    "orders_copurchase",
    "raster_flowdir",
    "tile_revisit",
    "scene_insar_pairs",
    "image_equalize",
    "orders_rfm",
    "points_hscan",
    "doc_kneser_ney",
    "part_abc",
    "orders_cohort",
    "doc_ccnet_buckets",
    "events_mad",
    "tile_areal",
    "tpch_q9",
    "tpch_q11",
    "tpch_q20",
    "embed_pca",
    "tpch_q12",
    "tpch_q21",
    "doc_gopher_filter",
    "scene_stacks",
    "events_ewma",
    "orders_brand_lift",
    "image_resize_box",
    "spatial_dbscan",
    "orders_trend",
    "events_coincidence",
    "scene_assortativity",
    "points_idw",
    "image_hist_match",
    "orders_skyline",
    "events_sparse_hours",
    "orders_yoy",
    "session_durations",
    "doc_simhash_hist",
    "doc_vocab_growth",
    "dq_lineitem",
    "orders_interarrival",
    "grid_focal_mode",
    "doc_source_overlap",
    "part_hhi",
)


def _init_ray(num_cpus: int) -> None:
    import ray

    if not ray.is_initialized():
        # NOTE: worker_process_setup_hook was tried for the cosmetic-log
        # filters and crashes workers in local mode; the filters install
        # at pyrosar_ray import (driver + every UDF-bearing worker), and
        # reads go through read_parquet_clean so the schema-hash warning
        # never fires in pure-internal read tasks either.
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


def _warmup(sf_dir: str) -> None:
    """Page-cache the input parquet and spin up the Ray worker pool so
    the first timed query measures the engine, not disk and process
    startup (first-run penalty measured at 2-5x on this host)."""
    import glob

    import ray.data

    for path in glob.glob(f"{sf_dir}/*.parquet"):
        with open(path, "rb") as fh:
            while fh.read(1 << 24):
                pass
    ray.data.range(1000, override_num_blocks=32).map_batches(lambda b: b).count()


def run_suite(sf_dir: str, num_cpus: int, repeats: int = 2) -> dict:
    """Per-query best-of-``repeats`` wall time.

    This host is time-shared and its throughput swings several-fold
    between runs (documented in BASELINE.md); a single pass regularly
    charges one arbitrary query 3-5x for a noise burst. The min over
    two passes measures the engine; the per-pass totals are reported
    alongside so the noise is visible, not hidden.
    """
    _init_ray(num_cpus)
    import __ray_entry__ as entrymod

    _warmup(sf_dir)
    qs = entrymod.queries()
    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    pass_totals = []
    for rep in range(repeats):
        total = 0.0
        for name in BENCH_QUERIES:
            t0 = time.time()
            rows[name] = _consume(qs[name](sf_dir))
            t = round(time.time() - t0, 3)
            total += t
            timings[name] = min(timings.get(name, t), t)
        pass_totals.append(round(total, 3))
    return {"timings": timings, "rows": rows, "pass_totals": pass_totals}


def run_headline(sf_dir: str, num_cpus: int) -> dict:
    """The scaling pipeline: image rows through join + tiling + decode.

    The north-star metric is IMAGES/SEC through spatial join + tile
    assignment over an image+caption table, where each row carries an
    image payload — so the representative per-row cost includes the
    decode/feature compute, not just metadata arithmetic. Per row:
    deterministic image synthesis (standing in for Lance blob decode,
    same cost shape), phash + 8x8 thumbnail, centroid -> broadcast-index
    scene join -> tile assignment -> per-batch partial tile counts. The
    consumer is an aggregate, so nothing wider than bounded partials
    ever leaves the actor (fused plan; the pair-emitting join is
    benchmarked by the `spatial_join` suite query).

    GRAFT_BENCH_MULT (default 6) replicates the document ids with
    distinct seeds - identical work at every parallelism level.
    """
    _init_ray(num_cpus)
    import numpy as np
    import pyarrow as pa
    import ray as _ray
    import ray.data

    from pyrosar_ray.stages.spatial import (
        SceneCellIndex,
        build_scene_index,
        materialize_small_side,
    )
    from pyrosar_ray.pipelines.tables import load_scenes
    from pyrosar_ray.pipelines.tables import read_parquet_clean as _read_parquet

    mult = int(os.environ.get("GRAFT_BENCH_MULT", "6"))

    import pyarrow.parquet as pq

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    n_images = n_docs * mult

    def _busy_ticks() -> int:
        with open("/proc/stat") as fh:
            f = fh.readline().split()
        # user+nice+system+irq+softirq (whole host: includes Ray workers)
        return sum(int(f[i]) for i in (1, 2, 3, 6, 7))

    t_setup = time.time()
    stab = materialize_small_side(
        load_scenes(sf_dir), ["scene_key", "xmin", "ymin", "xmax", "ymax"]
    )
    index_ref = _ray.put(build_scene_index(stab, 0, ("scene_key",)))

    # one small parquet file = ONE block by default, which would hand the
    # whole actor stage a single task (serializing the pipeline at any
    # parallelism); split so every worker has input at every level
    docs = _read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id"],
        override_num_blocks=max(num_cpus * 4, 16),
    )

    def _replicate(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        rep = np.repeat(ids, mult) * mult + np.tile(
            np.arange(mult, dtype=np.int64), len(ids)
        )
        return pa.table({"seed": pa.array(rep)})

    class _ImageTileProbe(SceneCellIndex):
        def __init__(self):
            super().__init__(
                index_ref, ("scene_key",), ("point_id", "lon", "lat"), refine="polygon"
            )

        def __call__(self, batch: pa.Table) -> pa.Table:
            from pyrosar_ray.sources.images import average_phash, synth_image
            from pyrosar_ray.stages.images import block_mean_resize

            seeds = batch["seed"].to_numpy()
            phashes = np.empty(len(seeds), dtype=np.int64)
            checksum = 0
            kernel = os.environ.get("GRAFT_BENCH_KERNEL", "image")
            if kernel == "int":
                # CONTROL kernel: identical pipeline shape and row
                # volume, but core-bound integer hashing instead of the
                # memory-bandwidth-bound image ops — isolates plan
                # scalability from the host's DRAM ceiling
                mask = (1 << 64) - 1
                for i, s in enumerate(seeds.tolist()):
                    x = (s * 0x9E3779B97F4A7C15) & mask
                    for _ in range(1500):
                        x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9 & mask
                    phashes[i] = x >> 1
            else:
                for i, s in enumerate(seeds.tolist()):
                    arr, w, h = synth_image(s)  # decode stand-in
                    phashes[i] = average_phash(arr)
                    checksum += int(block_mean_resize(arr, 8, 8).sum())
            # deterministic centroid per image from its phash bits
            ph = phashes.astype(np.uint64)
            lon = (ph % np.uint64(33000)).astype(np.float64) / 100.0 - 170.0
            lat = ((ph >> np.uint64(17)) % np.uint64(13000)).astype(np.float64) / 100.0 - 60.0
            probe = pa.table(
                {
                    "point_id": pa.array(seeds),
                    "lon": pa.array(lon),
                    "lat": pa.array(lat),
                }
            )
            pairs = SceneCellIndex.__call__(self, probe)
            from pyrosar_ray.functions.tiles import tile_index_1deg

            idx = tile_index_1deg(pairs["lon"].to_numpy(), pairs["lat"].to_numpy())
            tiles, counts = np.unique(idx, return_counts=True)
            out = pa.table(
                {
                    "tile_idx": pa.array(tiles.astype(np.int64)),
                    "n": pa.array(counts.astype(np.int64)),
                }
            )
            return out

    replicated = docs.map_batches(_replicate, batch_format="pyarrow")
    if os.environ.get("GRAFT_BENCH_TASKS") == "1":
        # task-mode probe: identical kernels, stateless TaskPool with a
        # per-task index attach (ray.get is zero-copy). Needed for
        # num_cpus=1 — an actor pool would hold the ONLY CPU slot and
        # starve the upstream read/replicate tasks (observed livelock) —
        # and used at BOTH levels of a --scaling pair so the compared
        # plans are identical.
        def _probe_task(batch: pa.Table) -> pa.Table:
            return _ImageTileProbe()(batch)

        partials = replicated.map_batches(
            _probe_task, batch_format="pyarrow", batch_size=512
        )
    else:
        partials = replicated.map_batches(
            _ImageTileProbe,
            batch_format="pyarrow",
            # fixed-size pool (autoscaling ramp-up would leave most of the
            # pool cold for half of this short run), minus one CPU so the
            # upstream read tasks are never starved
            concurrency=max(1, num_cpus - 1),
            batch_size=512,
        )
    # timed window = the streaming execution only; the driver-side scene
    # index build and Ray session setup are identical at every
    # parallelism level and excluded (disclosed in BASELINE.md)
    setup_sec = time.time() - t_setup
    busy0 = _busy_ticks()
    t0 = time.time()
    df = partials.to_pandas()
    totals = df.groupby("tile_idx")["n"].sum()
    n_tiles = int(len(totals))
    elapsed = time.time() - t0
    cpu_sec = (_busy_ticks() - busy0) / os.sysconf("SC_CLK_TCK")
    return {
        "elapsed_sec": elapsed,
        "setup_sec": round(setup_sec, 2),
        "rows_in": n_images,
        "tiles_out": n_tiles,
        "rows_per_sec": n_images / elapsed,
        # work conservation: CPU-seconds consumed per row. Flat across
        # parallelism levels = the plan adds no coordination/serial
        # overhead as workers are added; any wall-clock efficiency loss
        # is host-FP saturation, not plan shape (see BASELINE.md).
        "cpu_sec": round(cpu_sec, 1),
        "cpu_sec_per_krow": round(cpu_sec / n_images * 1000, 3),
    }


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--scaling", action="store_true")
    parser.add_argument("--headline-only", action="store_true", help="internal: one headline run")
    parser.add_argument("--num-cpus", type=int, default=NUM_CPUS)
    parser.add_argument("--repeat", type=int, default=3, help="scaling run pairs")
    parser.add_argument(
        "--pair",
        type=int,
        nargs=2,
        default=(8, 32),
        help="the (N, 4N) parallelism pair for --scaling",
    )
    parser.add_argument("--sf-dir", default=SF_DIR)
    parser.add_argument(
        "--tasks",
        action="store_true",
        help="scaling probe as stateless tasks at BOTH levels (required "
        "for num_cpus=1, where an actor pool would starve the reads)",
    )
    args = parser.parse_args()
    if args.tasks or 1 in tuple(args.pair):
        os.environ["GRAFT_BENCH_TASKS"] = "1"

    if args.headline_only:
        out = run_headline(args.sf_dir, args.num_cpus)
        print(json.dumps(out))
        import ray

        ray.shutdown()
        return

    if args.scaling:
        # interleaved repeats + median: the sandbox's throughput varies
        # several-fold between runs, so a single (8, 32) pair is noise
        import statistics

        # enough rows that streaming compute dominates the per-level
        # actor spawn inside the timed window (callers can override)
        os.environ.setdefault("GRAFT_BENCH_MULT", "30")

        def one_run(n: int) -> dict:
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
            return json.loads(proc.stdout.strip().splitlines()[-1])

        lo, hi = args.pair
        runs = {lo: [], hi: []}
        cpu_rows = {lo: [], hi: []}
        for _ in range(args.repeat):
            for n in (lo, hi):
                r = one_run(n)
                runs[n].append(r["rows_per_sec"])
                if "cpu_sec_per_krow" in r:
                    cpu_rows[n].append(r["cpu_sec_per_krow"])
        med8 = statistics.median(runs[lo])
        med32 = statistics.median(runs[hi])
        print(
            json.dumps(
                {
                    "metric": "spatial_join_tile_scaling",
                    "value": round((med32 / med8) / (hi / lo), 4),
                    "unit": "efficiency",
                    "cpus": {"N": lo, "4N": hi},
                    "throughput_rows_per_sec": {
                        str(lo): round(med8, 1),
                        str(hi): round(med32, 1),
                    },
                    "all_runs_rows_per_sec": {
                        str(lo): [round(x, 1) for x in runs[lo]],
                        str(hi): [round(x, 1) for x in runs[hi]],
                    },
                    "cpu_sec_per_krow": {
                        str(lo): cpu_rows[lo],
                        str(hi): cpu_rows[hi],
                    },
                    "repeat": args.repeat,
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
                "repeats": 2,
                "pass_totals": suite["pass_totals"],
            }
        )
    )
    import ray

    ray.shutdown()


if __name__ == "__main__":
    main()
