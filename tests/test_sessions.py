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
