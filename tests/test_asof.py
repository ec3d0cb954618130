"""as-of/interval join vs a brute-force oracle (OSV.match semantics)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from pyrosar_ray.stages.asof import IntervalInventory, asof_match

DUR = 100


def _inventory():
    # intervals: id, sensor, tier, start (stop = start + DUR), publish
    rows = [
        (1, "S1A", "POE", 0, 200),
        (2, "S1A", "POE", 50, 300),   # overlaps 1; higher publish
        (3, "S1A", "POE", 50, 300),   # tie with 2 → lower id wins
        (4, "S1A", "RES", 0, 999),    # RES never beats a covering POE
        (5, "S1B", "RES", 0, 10),
        (6, "S1A", "POE", 500, 600),
    ]
    return pa.table(
        {
            "osv_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "sensor": pa.array([r[1] for r in rows]),
            "osv_type": pa.array([r[2] for r in rows]),
            "start_sec": pa.array([r[3] for r in rows], type=pa.int64()),
            "stop_sec": pa.array([r[3] + DUR for r in rows], type=pa.int64()),
            "publish_sec": pa.array([r[4] for r in rows], type=pa.int64()),
        }
    )


def brute_force(inv: pa.Table, sensor: str, t: int) -> int:
    best = None
    for row in inv.to_pylist():
        if row["sensor"] != sensor or not (row["start_sec"] <= t <= row["stop_sec"]):
            continue
        rank = (0 if row["osv_type"] == "POE" else 1, -row["publish_sec"], row["osv_id"])
        if best is None or rank < best[0]:
            best = (rank, row["osv_id"])
    return -1 if best is None else best[1]


def test_interval_inventory_golden():
    inv = IntervalInventory(_inventory(), DUR)
    cases = [
        ("S1A", 25, 1),    # only 1 covers
        ("S1A", 75, 2),    # 1,2,3 cover; 2/3 higher publish; id tie → 2
        ("S1A", 150, 2),   # 2,3 cover (1 stops at 100)
        ("S1A", 300, -1),  # gap
        ("S1A", 550, 6),
        ("S1B", 50, 5),    # RES fallback when no POE exists
        ("S1B", 500, -1),
    ]
    sensors = np.array([c[0] for c in cases], dtype=object)
    ts = np.array([c[1] for c in cases], dtype=np.int64)
    got = inv.match(sensors, ts)
    assert got.tolist() == [c[2] for c in cases]


def test_interval_inventory_matches_bruteforce():
    inv_table = _inventory()
    inv = IntervalInventory(inv_table, DUR)
    rng = np.random.RandomState(3)
    ts = rng.randint(-50, 700, size=300).astype(np.int64)
    sensors = np.where(rng.rand(300) < 0.5, "S1A", "S1B").astype(object)
    got = inv.match(sensors, ts)
    want = [brute_force(inv_table, s, int(t)) for s, t in zip(sensors, ts)]
    assert got.tolist() == want


def test_asof_match_dataset():
    inv_table = _inventory()
    probes = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array(list(range(4)), type=pa.int64()),
                "sensor": pa.array(["S1A", "S1A", "S1B", "S1A"]),
                "t_sec": pa.array([25, 300, 50, 550], type=pa.int64()),
            }
        )
    )
    out = asof_match(probes, inv_table, DUR).to_pandas().sort_values("k")
    assert out["osv_id"].tolist() == [1, -1, 5, 6]


def test_overlap_mask():
    from pyrosar_ray.stages.asof import overlap_mask

    got = overlap_mask(
        np.array([0, 0, 0]), np.array([10, 10, 10]),
        np.array([5, 10, -5]), np.array([15, 20, 0]),
    )
    # touching intervals (start2 == stop1 or stop2 == start1) do NOT overlap
    assert got.tolist() == [True, False, False]


def test_asof_join_backward_semantics(sf_dir):
    """Exact-equal ts hits; earlier-than-all misses; unknown keys null;
    latest-of-several wins."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from pyrosar_ray.stages.asof import asof_join_backward

    right = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 1, 2], type=pa.int64()),
                "rt": pa.array([100, 200, 50], type=pa.int64()),
                "state": pa.array([10, 20, 5], type=pa.int64()),
            }
        )
    )
    left = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
                "k": pa.array([1, 1, 1, 2, 9], type=pa.int64()),
                "t": pa.array([99, 200, 500, 49, 1000], type=pa.int64()),
            }
        )
    )
    out = (
        asof_join_backward(
            left, right, on="t", by="k", right_on="rt", value_cols=("state",)
        )
        .to_pandas()
        .sort_values("id", ignore_index=True)
    )
    vals = out["state"].tolist()
    assert pd.isna(vals[0])          # t=99 before first state at 100
    assert vals[1] == 20             # exact equality is a hit
    assert vals[2] == 20             # latest of several
    assert pd.isna(vals[3])          # key 2 starts at 50, probe at 49
    assert pd.isna(vals[4])          # unknown key
