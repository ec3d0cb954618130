"""Tumbling / hopping window aggregates (stages/windows.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray


def _events(n=500, seed=3):
    rng = np.random.default_rng(seed)
    ts = np.datetime64("2024-01-01T00:00:00", "us") + rng.integers(
        0, 86_400_000_000, n
    ).astype("timedelta64[us]")
    return pd.DataFrame(
        {
            "ts": ts,
            "event_type": rng.choice(["a", "b", "c"], n),
            "value": rng.normal(10.0, 4.0, n).round(4),
        }
    )


WIDTH = 3_600_000_000
HOP = 900_000_000


def _expected_tumbling(df):
    us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    g = df.assign(
        window_start=us // WIDTH * WIDTH,
        cents=np.floor(df["value"].to_numpy() * 100 + 0.5).astype(np.int64),
    )
    out = g.groupby(["window_start", "event_type"], as_index=False).agg(
        n=("cents", "size"), sum_cents=("cents", "sum")
    )
    return out.sort_values(["window_start", "event_type"]).reset_index(drop=True)


def test_tumbling_matches_pandas():
    from pyrosar_ray.stages.windows import tumbling_window

    df = _events()
    ds = ray.data.from_pandas(df).repartition(7)  # force many batches
    got = (
        tumbling_window(ds, width_us=WIDTH)
        .to_pandas()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["window_start", "event_type", "n", "sum_cents"]],
        _expected_tumbling(df),
        check_dtype=False,
    )


def test_tumbling_boundary_rows_land_in_their_own_window():
    from pyrosar_ray.stages.windows import tumbling_window

    base = np.datetime64("2024-01-01T00:00:00", "us")
    df = pd.DataFrame(
        {
            # one row exactly on the boundary, one 1 µs before
            "ts": [base, base + np.timedelta64(WIDTH - 1, "us"),
                   base + np.timedelta64(WIDTH, "us")],
            "k": ["x", "x", "x"],
            "value": [1.0, 1.0, 1.0],
        }
    )
    out = tumbling_window(
        ray.data.from_pandas(df), width_us=WIDTH, key_col="k"
    ).to_pandas().sort_values("window_start")
    assert out["n"].tolist() == [2, 1]


def test_hopping_fanout_and_counts():
    from pyrosar_ray.stages.windows import hopping_window

    df = _events(300, seed=5)
    ds = ray.data.from_pandas(df).repartition(5)
    got = hopping_window(ds, width_us=WIDTH, hop_us=HOP).to_pandas()
    # every event contributes to exactly width/hop windows
    assert got["n"].sum() == len(df) * (WIDTH // HOP)
    # reference: explicit membership expansion
    us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    base = us // HOP * HOP
    starts = (base[:, None] - np.arange(4) * HOP).ravel()
    exp = (
        pd.DataFrame(
            {"window_start": starts, "event_type": np.repeat(df["event_type"].to_numpy(), 4)}
        )
        .groupby(["window_start", "event_type"], as_index=False)
        .size()
        .rename(columns={"size": "n"})
    )
    merged = got.merge(exp, on=["window_start", "event_type"], suffixes=("_g", "_e"))
    assert len(merged) == len(got) == len(exp)
    assert (merged["n_g"] == merged["n_e"]).all()


def test_hopping_window_membership_invariant():
    """Each event is inside [start, start+width) of every window it's counted in."""
    from pyrosar_ray.stages.windows import hopping_window

    base = np.datetime64("2024-03-05T10:17:23.000001", "us")
    df = pd.DataFrame({"ts": [base], "event_type": ["z"]})
    out = hopping_window(
        ray.data.from_pandas(df), width_us=WIDTH, hop_us=HOP
    ).to_pandas()
    t = base.astype("datetime64[us]").astype(np.int64)
    assert len(out) == WIDTH // HOP
    assert ((out["window_start"] <= t) & (t < out["window_start"] + WIDTH)).all()


def test_window_validation():
    from pyrosar_ray.stages.windows import hopping_window, tumbling_window

    ds = ray.data.from_pandas(_events(10))
    with pytest.raises(ValueError):
        tumbling_window(ds, width_us=0)
    with pytest.raises(ValueError):
        hopping_window(ds, width_us=WIDTH, hop_us=7)  # not a divisor


def test_tumbling_integer_ts_and_no_key():
    from pyrosar_ray.stages.windows import tumbling_window

    tbl = pa.table({"t": pa.array([0, 10, 3_600_000_000], type=pa.int64())})
    out = tumbling_window(
        ray.data.from_arrow(tbl), width_us=WIDTH, ts_col="t", key_col=None, value_col=None
    ).to_pandas().sort_values("window_start")
    assert out["n"].tolist() == [2, 1]


def test_rolling_sum_matches_pandas_window():
    from pyrosar_ray.stages.windows import rolling_sum

    rng = np.random.default_rng(9)
    n = 400
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 5, n),
            "ts": np.datetime64("2024-01-01", "us")
            + rng.integers(0, 10**9, n).astype("timedelta64[us]"),
            "value": rng.normal(10, 3, n).round(3),
        }
    )
    got = (
        rolling_sum(ray.data.from_pandas(df).repartition(4), frame_rows=3)
        .to_pandas()
        .set_index("event_id")["roll_cents"]
    )
    cents = np.floor(df["value"].to_numpy() * 100 + 0.5).astype(np.int64)
    ref = (
        df.assign(cents=cents)
        .sort_values(["ts", "event_id"])
        .groupby("user_id")["cents"]
        .rolling(3, min_periods=1)
        .sum()
        .reset_index(level=0, drop=True)
    )
    ref = pd.Series(
        ref.to_numpy().astype(np.int64), index=df.loc[ref.index, "event_id"].to_numpy()
    )
    for eid in df["event_id"]:
        assert got.loc[eid] == ref.loc[eid]


def test_tumbling_distinct_matches_pandas():
    from pyrosar_ray.stages.windows import tumbling_distinct

    rng = np.random.default_rng(13)
    n = 600
    df = pd.DataFrame(
        {
            "ts": np.datetime64("2024-01-01", "us")
            + rng.integers(0, 86_400_000_000, n).astype("timedelta64[us]"),
            "user_id": rng.integers(0, 20, n),
        }
    )
    got = (
        tumbling_distinct(
            ray.data.from_pandas(df).repartition(6), width_us=WIDTH
        )
        .to_pandas()
        .sort_values("window_start")
        .reset_index(drop=True)
    )
    us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    exp = (
        df.assign(window_start=us // WIDTH * WIDTH)
        .groupby("window_start")["user_id"]
        .nunique()
        .reset_index(name="n_distinct")
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_resample_events_zero_fill(sf_dir):
    """Dense grid spans min..max hour per key; gaps carry n=0/sum=0."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pytest
    import ray.data

    from pyrosar_ray.stages.windows import resample_events

    H = 3_600_000_000
    ts = pd.to_datetime(
        ["2021-01-01 00:10", "2021-01-01 00:50", "2021-01-01 03:30",
         "2021-01-05 12:00"]
    )
    events = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array([1, 1, 1, 2], type=pa.int64()),
                "ts": pa.array(ts, type=pa.timestamp("us")),
                "value": pa.array([1.005, 2.0, 0.999, 5.0]),
            }
        )
    )
    out = (
        resample_events(events, width_us=H)
        .to_pandas()
        .sort_values(["user_id", "bucket_start"], ignore_index=True)
    )
    u1 = out[out.user_id == 1]
    assert len(u1) == 4  # hours 0..3 inclusive
    assert u1.n.tolist() == [2, 0, 0, 1]
    # cents: floor(1.005*100+.5)=101 (IEEE: 1.005*100 = 100.49999...),
    # recomputed the same way the kernel does
    c0 = int(np.floor(1.005 * 100 + 0.5)) + 200
    assert u1.sum_cents.tolist() == [c0, 0, 0, int(np.floor(0.999 * 100 + 0.5))]
    u2 = out[out.user_id == 2]
    assert len(u2) == 1 and u2.n.iloc[0] == 1 and u2.sum_cents.iloc[0] == 500
    with pytest.raises(ValueError):
        resample_events(events, width_us=0)


def test_keyed_cusum_matches_sequential_recursion(ray_session):
    """The closed form (prefix sum − clamped prefix min) equals the
    textbook sequential recursion S_t = max(0, S_{t-1} + x_t − k) on
    random per-key streams, alarms included."""
    import numpy as np
    import pandas as pd
    import ray

    from pyrosar_ray.stages.windows import keyed_cusum

    rng = np.random.default_rng(17)
    n = 4_000
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 40, n),
            "ts": rng.integers(0, 10_000, n),
            "event_id": np.arange(n, dtype=np.int64),
            "cents": rng.integers(-900, 1200, n),
        }
    )
    out = (
        keyed_cusum(
            ray.data.from_pandas(df).repartition(7),
            drift_c=100, threshold_c=1500,
        )
        .to_pandas()
        .sort_values(["user_id", "event_id"], ignore_index=True)
    )
    rows = []
    for uid, g in df.sort_values(["ts", "event_id"]).groupby("user_id"):
        s = 0
        for _, r in g.iterrows():
            s = max(0, s + int(r["cents"]) - 100)
            rows.append((uid, int(r["event_id"]), s, int(s > 1500)))
    want = (
        pd.DataFrame(rows, columns=["user_id", "event_id", "s_c", "alarm"])
        .sort_values(["user_id", "event_id"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(out, want, check_dtype=False)


def test_rolling_ewma_matches_bruteforce():
    from pyrosar_ray.stages.windows import rolling_ewma

    rng = np.random.default_rng(21)
    n = 300
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 4, n),
            "ts": np.datetime64("2024-01-01", "us")
            + rng.integers(0, 10**9, n).astype("timedelta64[us]"),
            "value": rng.normal(10, 3, n).round(2),
        }
    )
    got = (
        rolling_ewma(ray.data.from_pandas(df).repartition(5), frame_rows=16)
        .to_pandas()
        .set_index("event_id")["ewma_fp"]
    )
    cents = np.floor(df["value"].to_numpy() * 100 + 0.5).astype(np.int64)
    ref = {}
    srt = df.assign(cents=cents).sort_values(["ts", "event_id"])
    for _, g in srt.groupby("user_id"):
        c = g["cents"].to_numpy()
        for i, eid in enumerate(g["event_id"].to_numpy()):
            acc = 0
            for j in range(min(16, i + 1)):
                acc += int(c[i - j]) << (15 - j)
            ref[eid] = acc
    assert len(got) == n
    for eid in df["event_id"]:
        assert got.loc[eid] == ref[eid]


def test_events_coincidence_band_kernel_bruteforce():
    """The per-user two-pointer band matches a brute-force time-band
    self-join, including the exact 300s boundary and same-ts ties."""
    import __ray_entry__ as entry
    import os, tempfile, pyarrow.parquet as ppq

    rng = np.random.default_rng(3)
    n = 250
    base = np.datetime64("2024-01-01", "us")
    ts = base + rng.integers(0, 3_600_000_000, n).astype("timedelta64[us]")
    ts[10] = ts[11]                      # tie
    ts[20] = ts[21] + np.timedelta64(300_000_000, "us")  # exact boundary
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": ts,
            "user_id": rng.integers(0, 6, n),
            "event_type": rng.choice(["a", "b", "c"], n),
            "value": np.zeros(n),
            "props": ["{}"] * n,
        }
    )
    with tempfile.TemporaryDirectory() as d:
        ppq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                        os.path.join(d, "events.parquet"))
        got = entry.q_events_coincidence(d).set_index(["type_a", "type_b"])
    t_us = df.ts.to_numpy().astype("datetime64[us]").astype(np.int64)
    want = {}
    for i in range(n):
        for j in range(i + 1, n):
            if (
                df.user_id[i] == df.user_id[j]
                and abs(int(t_us[i]) - int(t_us[j])) <= 300_000_000
                and df.event_type[i] != df.event_type[j]
            ):
                k = tuple(sorted((df.event_type[i], df.event_type[j])))
                want[k] = want.get(k, 0) + 1
    assert len(got) == len(want) > 0
    for k, v in want.items():
        assert got.loc[k, "n_pairs"] == v


def test_skyline_kernel_bruteforce_with_ties():
    from __ray_entry__ import _skyline_kernel

    rng = np.random.default_rng(7)
    n = 400
    # small value ranges force price ties AND exact duplicate pairs
    p = rng.integers(0, 25, n)
    d = rng.integers(0, 25, n)
    keys = np.arange(n, dtype=np.int64)
    k, kp, kd = _skyline_kernel(keys, p.copy(), d.copy())
    keep = set(k.tolist())
    for i in range(n):
        dom = bool(
            ((p >= p[i]) & (d <= d[i]) & ((p > p[i]) | (d < d[i]))).any()
        )
        assert (i not in keep) == dom, i
    # local-prune composition: pruning halves first never loses a
    # global skyline member
    h = n // 2
    k1, p1, d1 = _skyline_kernel(keys[:h], p[:h].copy(), d[:h].copy())
    k2, p2, d2 = _skyline_kernel(keys[h:], p[h:].copy(), d[h:].copy())
    ku, pu, du = (
        np.concatenate([k1, k2]), np.concatenate([p1, p2]),
        np.concatenate([d1, d2]),
    )
    kf, _, _ = _skyline_kernel(ku, pu, du)
    assert set(kf.tolist()) == keep
