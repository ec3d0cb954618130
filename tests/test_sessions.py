"""Sessionization vs a brute-force pandas oracle."""

import numpy as np
import pandas as pd
import ray.data

from pyrosar_ray.stages.sessions import session_counts, sessionize

GAP_US = 1_000_000  # 1 s


def _events(n=300, users=7, seed=1):
    rng = np.random.RandomState(seed)
    ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(
        np.cumsum(rng.randint(1, 3_000_000, size=n)), unit="us"
    )
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.randint(0, users, size=n).astype(np.int64),
            "ts": ts,
        }
    )


def _oracle_counts(df):
    out = {}
    for uid, g in df.groupby("user_id"):
        us = np.sort(g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64))
        out[uid] = 1 + int((np.diff(us) > GAP_US).sum())
    return out


def test_sessionize_and_counts():
    df = _events()
    ds = ray.data.from_pandas(df)
    sess = sessionize(ds, gap_us=GAP_US).to_pandas()
    assert len(sess) == len(df)
    # session ids are dense 0..k per user and nondecreasing in time
    for uid, g in sess.groupby("user_id"):
        g = g.sort_values("ts")
        sid = g["session_id"].to_numpy()
        assert sid[0] == 0 and np.all(np.diff(sid) >= 0) and np.all(np.diff(sid) <= 1)

    counts = session_counts(ds, gap_us=GAP_US).to_pandas()
    want = _oracle_counts(df)
    got = dict(zip(counts["user_id"], counts["n_sessions"]))
    assert got == want


def test_funnel_counts_strict_chaining():
    import pyarrow as pa

    from pyrosar_ray.stages.sessions import funnel_counts

    def ev(uid, typ, us):
        return (uid, typ, us)

    rows = [
        # user 1 completes the funnel in order
        ev(1, "view", 10), ev(1, "click", 20), ev(1, "purchase", 30),
        # user 2: click BEFORE the first view → stalls at view
        ev(2, "click", 5), ev(2, "view", 10),
        # user 3: view + click, purchase before click → stalls at click
        ev(3, "purchase", 1), ev(3, "view", 2), ev(3, "click", 3),
        # user 4: only noise types
        ev(4, "error", 1), ev(4, "signup", 2),
        # user 5: simultaneous view/click (strict > excludes the tie)
        ev(5, "view", 7), ev(5, "click", 7),
    ]
    tab = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[1] for r in rows]),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        }
    )
    out = (
        funnel_counts(ray.data.from_arrow(tab).repartition(3),
                      steps=("view", "click", "purchase"))
        .to_pandas().sort_values("step_idx", ignore_index=True)
    )
    assert out["step"].tolist() == ["view", "click", "purchase"]
    # view: users 1,2,3,5 -> 4 ; click after view: 1,3 -> 2 ; purchase: 1
    assert out["n_users"].tolist() == [4, 2, 1]


def test_retention_matrix_counts():
    import pyarrow as pa

    from pyrosar_ray.stages.sessions import retention_matrix

    day = 86_400_000_000
    rows = [
        (1, 0), (1, 0), (1, 2),      # user 1: cohort 0, active days 0,2
        (2, 0), (2, 1),              # user 2: cohort 0, days 0,1
        (3, 2),                      # user 3: cohort 2, day 2 only
    ]
    tab = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] * day + 5 for r in rows], pa.timestamp("us")),
        }
    )
    out = retention_matrix(ray.data.from_arrow(tab).repartition(2)).to_pandas()
    got = {(int(r.cohort_day), int(r.day_offset)): int(r.n_users)
           for r in out.itertuples()}
    assert got == {(0, 0): 2, (0, 1): 1, (0, 2): 1, (2, 0): 1}


def test_transition_counts_ordered_pairs():
    import pyarrow as pa

    from pyrosar_ray.stages.sessions import transition_counts

    rows = [
        (1, "a", 10, 1), (1, "b", 20, 2), (1, "a", 30, 3),
        (2, "b", 5, 4), (2, "b", 5, 5),  # ts tie broken by event_id
        (3, "c", 1, 6),                   # single event: no pair
    ]
    tab = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[1] for r in rows]),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "event_id": pa.array([r[3] for r in rows], pa.int64()),
        }
    )
    out = transition_counts(ray.data.from_arrow(tab).repartition(2)).to_pandas()
    got = {(r.from_type, r.to_type): int(r.n) for r in out.itertuples()}
    assert got == {("a", "b"): 1, ("b", "a"): 1, ("b", "b"): 1}


def test_sequence_analytics_invariants_on_fixtures():
    """Cross-operator invariants over the real events fixture."""
    import pyarrow.parquet as pq

    from pyrosar_ray.pipelines.tables import read_parquet_clean
    from pyrosar_ray.stages.sessions import (
        funnel_counts,
        retention_matrix,
        transition_counts,
    )

    sf = "/root/testdata/sf0.001"
    events = read_parquet_clean(f"{sf}/events.parquet",
                                columns=["user_id", "event_type", "ts", "event_id"])
    raw = pq.read_table(f"{sf}/events.parquet").to_pandas()

    funnel = (
        funnel_counts(events, steps=("view", "click", "purchase"))
        .to_pandas().sort_values("step_idx")
    )
    assert (funnel["n_users"].diff().dropna() <= 0).all()  # monotone funnel

    trans = transition_counts(events).to_pandas()
    per_user = raw.groupby("user_id").size()
    assert trans["n"].sum() == (per_user - 1).sum()  # every adjacency once

    ret = retention_matrix(events.select_columns(["user_id", "ts"])).to_pandas()
    day0 = ret[ret["day_offset"] == 0]
    assert day0["n_users"].sum() == raw["user_id"].nunique()  # cohorts partition users
