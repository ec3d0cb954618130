"""Scale-stress evidence for the cost-based fallbacks (r4 verdict #4).

Exercises each distributed fallback ABOVE its driver bound on synthetic
inputs sized past the sandbox fixtures, printing one JSON line per
stress. Run: python tools/stress_fallbacks.py [--edges 24000000]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import pyarrow as pa


def stress_kcore(n_edges: int) -> dict:
    """Distributed k-core on a synthetic graph past the 20M driver bound.

    Graph: n = n_edges // 6 nodes; each node u emits 6 pseudo-random
    edges (splitmix-style targets), plus a planted clique of 40 nodes —
    average degree ~12 gives a real peel sequence at k=13: the random
    bulk peels away over several rounds, the clique survives.
    """
    import ray
    import ray.data

    from pyrosar_ray.stages.graph import kcore

    n_nodes = n_edges // 6

    def _gen(batch: pa.Table) -> pa.Table:
        u = batch["id"].to_numpy().astype(np.int64)
        us, vs = [], []
        for i in range(6):
            salt = np.uint64(0x9E3779B97F4A7C15 + 0x1234567 * (i + 1))
            with np.errstate(over="ignore"):
                t = ((u.astype(np.uint64) + 1) * salt) >> np.uint64(17)
            v = (t % np.uint64(n_nodes)).astype(np.int64)
            ok = v != u
            us.append(u[ok])
            vs.append(v[ok])
        u2 = np.concatenate(us)
        v2 = np.concatenate(vs)
        return pa.table(
            {"id_a": np.minimum(u2, v2), "id_b": np.maximum(u2, v2)}
        )

    base = ray.data.range(n_nodes, override_num_blocks=64).map_batches(
        _gen, batch_format="pyarrow"
    )
    cl = np.arange(40, dtype=np.int64) + n_nodes  # planted clique nodes
    iu, ju = np.triu_indices(40, k=1)
    clique = ray.data.from_arrow(
        pa.table({"id_a": cl[iu], "id_b": cl[ju]})
    )
    edges = base.union(clique).materialize()
    m = edges.count()
    t0 = time.time()
    core = kcore(
        edges, k=13, mode="distributed", max_rounds=60
    ).to_pandas()
    dist_sec = time.time() - t0
    t0 = time.time()
    drv = kcore(
        edges, k=13, mode="driver", driver_edge_bound=1 << 40
    ).to_pandas()
    drv_sec = time.time() - t0
    same = (
        core.sort_values("doc_id", ignore_index=True).equals(
            drv.sort_values("doc_id", ignore_index=True)
        )
    )
    return {
        "stress": "kcore_distributed",
        "edges": int(m),
        "k": 13,
        "core_nodes": int(len(core)),
        "distributed_sec": round(dist_sec, 1),
        "driver_sec": round(drv_sec, 1),
        "identical_to_driver": bool(same),
    }


def stress_keyed_agg(n_keys: int = 10_000_000, rows: int = 40_000_000) -> dict:
    """keyed_agg at 10^7 distinct keys (r4 item: keys/partition policy)."""
    import ray
    import ray.data

    from pyrosar_ray.stages.agg import keyed_sum

    def _gen(batch: pa.Table) -> pa.Table:
        i = batch["id"].to_numpy().astype(np.int64)
        with np.errstate(over="ignore"):
            k = (
                (i.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
                >> np.uint64(20)
            ).astype(np.int64) % np.int64(n_keys)
        return pa.table({"k": k, "v": i % 97})

    ds = ray.data.range(rows, override_num_blocks=64).map_batches(
        _gen, batch_format="pyarrow"
    )
    t0 = time.time()
    out = keyed_sum(ds, "k", ["v"], num_partitions=64)
    n_out = out.count()
    sec = time.time() - t0
    return {
        "stress": "keyed_agg_1e7_keys",
        "rows": rows,
        "distinct_keys_out": int(n_out),
        "sec": round(sec, 1),
        "keys_per_partition": int(n_out // 64),
    }


def stress_eqdelete(rows: int = 5_000_000, days: int = 40) -> dict:
    """Equality-delete scan past the broadcast bound: synthetic base of
    ``rows`` rows across ``days`` day files, ~10% of keys deleted over
    two commits; the bloom + exact-verify cascade must emit exactly the
    broadcast path's rows."""
    import os
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from pyrosar_ray.stages.mor import eq_scan

    out = tempfile.mkdtemp(prefix="eqstress_")
    os.makedirs(f"{out}/base")
    os.makedirs(f"{out}/eqdel")
    per = rows // days
    for d in range(days):
        ids = np.arange(d * per, (d + 1) * per, dtype=np.int64)
        pq.write_table(
            pa.table(
                {
                    "event_id": ids,
                    "event_type": np.where(ids % 5 == 0, "error", "view"),
                }
            ),
            f"{out}/base/day=2024-01-{d % 28 + 1:02d}x{d:02d}.parquet",
        )
    all_ids = np.arange(rows, dtype=np.int64)
    pq.write_table(
        pa.table({"event_id": all_ids[all_ids % 17 == 3]}),
        f"{out}/eqdel/c1.parquet",
    )
    pq.write_table(
        pa.table({"event_id": all_ids[all_ids % 23 == 7]}),
        f"{out}/eqdel/c2.parquet",
    )
    t0 = time.time()
    broadcast_n = eq_scan(out).count()
    bsec = time.time() - t0
    t0 = time.time()
    cascade_n = eq_scan(out, broadcast_bound=0).count()
    csec = time.time() - t0
    shutil.rmtree(out)
    return {
        "stress": "eqdelete_bloom_cascade",
        "base_rows": rows,
        "delete_keys": int((all_ids % 17 == 3).sum() + (all_ids % 23 == 7).sum()),
        "broadcast_sec": round(bsec, 1),
        "cascade_sec": round(csec, 1),
        "rows_broadcast": int(broadcast_n),
        "rows_cascade": int(cascade_n),
        "identical": bool(broadcast_n == cascade_n),
    }


def main() -> None:
    import ray

    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=24_000_000)
    ap.add_argument(
        "--only", choices=["kcore", "agg", "eqdel"], default=None
    )
    args = ap.parse_args()
    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=32, include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    if args.only in (None, "kcore"):
        print(json.dumps(stress_kcore(args.edges)))
    if args.only in (None, "agg"):
        print(json.dumps(stress_keyed_agg()))
    if args.only in (None, "eqdel"):
        print(json.dumps(stress_eqdelete()))
    ray.shutdown()


if __name__ == "__main__":
    main()
