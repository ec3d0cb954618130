"""Engine-wide block-count determinism harness.

The hash-twin contract implies a stronger property than matching DuckDB
once: every query's canonical result must be IDENTICAL at any input
partitioning — that is what makes N-node and 4N-node clusters produce
the same answer. This harness forces two different read block counts
through the engine-wide read entry point (GRAFT_READ_BLOCKS, honored by
``read_parquet_clean``) and compares canonical value hashes across a
sample of queries covering the main physical patterns: bounded groupby
(tile_counts), corpus top-k (doc_term_topk), sessionization stitch
(sessionize), join + row-local hash split (doc_split_leakfree),
row-local argmin (image_aspect_buckets) and integer sufficient
statistics (events_zscore).
"""

import os

import pandas as pd
import pytest

QUERIES = [
    "tile_counts",
    "doc_term_topk",
    "sessionize",
    "doc_split_leakfree",
    "image_aspect_buckets",
    "events_zscore",
    # crawl chain: shard groupby + WARC/HTML parse + semi join + gate
    "doc_crawl_curate",
    # two-stage ANN cascade: stats exchange + shortlist + rerank merge
    "embed_sq_rerank",
    # six-table join plan: two co-partition exchanges + broadcast dims
    "tpch_q5",
    # clustered write + footer-stats pruned scan (file set must be
    # identical at any read block count)
    "points_zscan",
    # replicated-side co-partition union join (3x3 scene replication,
    # point-cell ownership) — exactly-once must hold at any block count
    "spatial_radius_join",
    # bounded bucket-table exchange + broadcast weights + partial top-k
    "doc_dsir",
    # keyed_sum (hash-partitioned big-key aggregate) + double
    # co-partition join + deterministic top-k
    "tpch_q3",
    # keyed change-stream collapse (per-user ordered runs, lead stitch)
    "events_scd2",
    # MOR time travel: positional sidecar union must be identical at
    # any base read granularity
    "events_timetravel",
    # packed tile-day dedup + partition-domain gap statistics
    "tile_revisit",
    # fused aggregate→join with group_cols (keyed_agg_join: fold per
    # (orderkey, nation, year) inside the join's own exchange)
    "tpch_q7",
    # one-exchange multi-metric rank (multi_global_rank) + NTILE fold
    # through keyed_sum — the rfm chain's 4-exchange plan
    "orders_rfm",
    # DBSCAN: salted-cell pair self-join (exactly-once), broadcast
    # core classification, cost-based CC, border min-label — the full
    # composition must label identically at any block count
    "spatial_dbscan",
    # partition-domain basket exchange + packed-key marginal/pair/count
    # fold into one keyed_sum domain
    "orders_brand_lift",
    # per-key ordered sliding-window dot product (EWMA fixed point)
    "events_ewma",
    # stateless integer quality gate (pure map — the control pattern)
    "doc_gopher_filter",
    # local-prune skyline: per-block pruning depends on block contents,
    # the candidate-union + driver re-run must erase that dependence
    "orders_skyline",
    # replicated-side radius join + floored fixed-point IDW term fold
    "points_idw",
]


def _canonical_hash(result) -> int:
    df = result.to_pandas() if hasattr(result, "to_pandas") else result
    df = df[sorted(df.columns)].sort_values(
        list(sorted(df.columns)), ignore_index=True
    )
    from pandas.util import hash_pandas_object

    return int(hash_pandas_object(df, index=False).sum())


@pytest.mark.parametrize("name", QUERIES)
def test_query_hash_is_block_count_invariant(name, sf_dir):
    import __ray_entry__ as entry

    q = entry.queries()[name]
    hashes = {}
    for blocks in ("2", "16"):
        os.environ["GRAFT_READ_BLOCKS"] = blocks
        try:
            hashes[blocks] = _canonical_hash(q(sf_dir))
        finally:
            os.environ.pop("GRAFT_READ_BLOCKS", None)
    assert hashes["2"] == hashes["16"], (name, hashes)
