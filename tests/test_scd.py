"""SCD Type-2 interval build (stages/scd.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from pyrosar_ray.stages.scd import SCD2_SENTINEL, scd2_intervals


def _ds(rows):
    return ray.data.from_pandas(pd.DataFrame(rows))


def test_runs_collapse_and_tile(ray_session):
    """A→A→B→A yields three intervals whose half-open spans tile the
    user's history; only the last is current."""
    t0 = pd.Timestamp("2024-01-01 00:00:00")
    rows = {
        "event_id": [1, 2, 3, 4],
        "ts": [t0, t0 + pd.Timedelta(minutes=1), t0 + pd.Timedelta(minutes=2),
               t0 + pd.Timedelta(minutes=3)],
        "user_id": [7, 7, 7, 7],
        "event_type": ["A", "A", "B", "A"],
    }
    out = (
        scd2_intervals(_ds(rows))
        .to_pandas()
        .sort_values("valid_from", ignore_index=True)
    )
    assert list(out.event_type) == ["A", "B", "A"]
    assert list(out.is_current) == [0, 0, 1]
    # contiguity: each valid_to is the next valid_from; tail is sentinel
    assert list(out.valid_to[:-1]) == list(out.valid_from[1:])
    assert out.valid_to.iloc[-1] == SCD2_SENTINEL
    assert out.valid_from.iloc[0] == "2024-01-01 00:00:00.000000"


def test_same_timestamp_ties_break_on_id(ray_session):
    """Two events at one timestamp order by event_id — the run boundary
    (and both interval stamps) must be deterministic."""
    t0 = pd.Timestamp("2024-01-01 12:00:00.500000")
    rows = {
        "event_id": [10, 11],
        "ts": [t0, t0],
        "user_id": [3, 3],
        "event_type": ["X", "Y"],
    }
    out = (
        scd2_intervals(_ds(rows))
        .to_pandas()
        .sort_values("is_current", ignore_index=True)
    )
    assert list(out.event_type) == ["X", "Y"]  # id order, not hash order
    assert out.valid_to.iloc[0] == out.valid_from.iloc[1]


def test_single_run_per_user_is_current(ray_session):
    rows = {
        "event_id": [1, 2],
        "ts": [pd.Timestamp("2024-01-01"), pd.Timestamp("2024-01-02")],
        "user_id": [1, 2],
        "event_type": ["A", "A"],
    }
    out = scd2_intervals(_ds(rows)).to_pandas()
    assert len(out) == 2
    assert (out.is_current == 1).all()
    assert (out.valid_to == SCD2_SENTINEL).all()


def test_history_tiles_real_table(ray_session):
    """Over the real events table: per user, intervals are disjoint,
    contiguous, cover [first event, sentinel), and consecutive
    intervals never share an attribute value (maximal runs)."""
    import pyarrow.parquet as pq

    sf = "/root/testdata/sf0.001"
    out = scd2_intervals(
        ray.data.read_parquet(f"{sf}/events.parquet")
    ).to_pandas()
    ev = pq.read_table(
        f"{sf}/events.parquet", columns=["user_id", "ts", "event_type"]
    ).to_pandas()
    for uid, grp in out.groupby("user_id"):
        g = grp.sort_values("valid_from")
        assert list(g.valid_to[:-1]) == list(g.valid_from[1:])
        assert g.valid_to.iloc[-1] == SCD2_SENTINEL
        assert int(g.is_current.sum()) == 1
        runs = g.event_type.to_numpy()
        assert (runs[1:] != runs[:-1]).all()
    # total interval count == total change count (vectorized global check)
    ev = ev.sort_values(["user_id", "ts"], kind="mergesort")
    changed = (
        (ev.event_type != ev.event_type.shift())
        | (ev.user_id != ev.user_id.shift())
    )
    assert len(out) == int(changed.sum())


def test_random_streams_match_bruteforce(ray_session):
    """Property: for random keyed streams, the distributed interval
    build equals a single-process pandas reference exactly."""
    rng = np.random.default_rng(42)
    n = 2000
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10**9, n), unit="us"),
            "user_id": rng.integers(0, 37, n),
            "event_type": rng.choice(list("ABCD"), n),
        }
    )
    got = (
        scd2_intervals(ray.data.from_pandas(df).repartition(7))
        .to_pandas()
        .sort_values(["user_id", "valid_from"], ignore_index=True)
    )
    # brute force: per user, sort by (ts, id), collapse runs
    rows = []
    for uid, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"], ignore_index=True)
        run_start = 0
        for i in range(1, len(g) + 1):
            if i == len(g) or g.event_type[i] != g.event_type[run_start]:
                rows.append(
                    (uid, g.event_type[run_start],
                     g.ts[run_start].strftime("%Y-%m-%d %H:%M:%S.%f"),
                     None if i == len(g)
                     else g.ts[i].strftime("%Y-%m-%d %H:%M:%S.%f"))
                )
                run_start = i
    want = pd.DataFrame(
        rows, columns=["user_id", "event_type", "valid_from", "valid_to"]
    )
    want["is_current"] = want.valid_to.isna().astype(np.int64)
    want["valid_to"] = want.valid_to.fillna(SCD2_SENTINEL)
    want = want.sort_values(["user_id", "valid_from"], ignore_index=True)
    want["user_id"] = want["user_id"].astype(np.int64)
    pd.testing.assert_frame_equal(got[want.columns], want)
