"""Merge-on-read positional deletes (stages/mor.py)."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _events(n=120):
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.Timestamp("2024-03-01")
            + pd.to_timedelta(np.arange(n) % 3, unit="D"),
            "event_type": np.where(np.arange(n) % 5 == 0, "error", "view"),
        }
    )


def test_mor_write_scan_roundtrip(ray_session, tmp_path):
    import ray

    from pyrosar_ray.stages.mor import mor_scan, mor_write

    df = _events()
    out = str(tmp_path / "tbl")
    manifest = (
        mor_write(ray.data.from_pandas(df).repartition(4), out)
        .to_pandas()
        .sort_values("day", ignore_index=True)
    )
    assert manifest["day"].tolist() == ["2024-03-01", "2024-03-02", "2024-03-03"]
    assert manifest["n_rows"].sum() == len(df)
    assert manifest["n_deletes"].sum() == (df.event_type == "error").sum()
    # base files have multiple row groups only when the day is big enough
    meta = pq.read_metadata(f"{out}/base/day=2024-03-01.parquet")
    assert meta.num_rows == 40

    got = mor_scan(out).to_pandas().sort_values("event_id", ignore_index=True)
    want = df[df.event_type != "error"].reset_index(drop=True)
    assert got["event_id"].tolist() == want["event_id"].tolist()
    assert (got["event_type"] != "error").all()
    # positions are per-day ranks of event_id among ALL rows (incl. deleted)
    day = got[got.day == "2024-03-01"]
    base_ids = df[df.ts == pd.Timestamp("2024-03-01")].sort_values("event_id")
    expect_pos = {
        eid: i for i, eid in enumerate(base_ids.event_id.to_numpy())
    }
    assert day.set_index("event_id")["pos"].to_dict() == {
        e: expect_pos[e] for e in day.event_id
    }


def test_mor_deletes_are_positional_not_value_based(ray_session, tmp_path):
    """Tamper with a delete sidecar: the scan must follow the POSITIONS,
    dropping a non-error row and resurrecting an error row."""
    import pyarrow as pa
    import ray

    from pyrosar_ray.stages.mor import mor_scan, mor_write

    df = _events(30)  # one day span: ids 0..29 cycle 3 days
    out = str(tmp_path / "tbl")
    mor_write(ray.data.from_pandas(df), out).materialize()
    day = "2024-03-01"
    dels = pq.read_table(f"{out}/deletes/day={day}.parquet")["pos"].to_numpy()
    # shift every delete position by +1 (delete the FOLLOWING row instead)
    pq.write_table(
        pa.table({"pos": pa.array((dels + 1).astype(np.int64))}),
        f"{out}/deletes/day={day}.parquet",
    )
    got = mor_scan(out).to_pandas()
    day_rows = got[got.day == day]
    # the original error rows at shifted-away positions SURVIVE
    assert (day_rows.event_type == "error").any()
    # and the rows at the shifted positions are gone despite being 'view'
    base = pq.read_table(f"{out}/base/day={day}.parquet").to_pandas()
    dropped = base.iloc[dels + 1]
    assert not day_rows.event_id.isin(dropped.event_id).any()


def test_schema_evolution_alignment(ray_session, tmp_path):
    """Old-generation rows get declared defaults, new rows keep values;
    target-schema casts apply; union streams both generations."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from pyrosar_ray.stages.evolve import align_to_schema, read_evolved

    out = tmp_path / "tbl"
    (out / "gen1").mkdir(parents=True)
    (out / "gen2").mkdir()
    pq.write_table(
        pa.table({"id": pa.array([1, 2], type=pa.int32())}),
        str(out / "gen1" / "a.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "id": pa.array([3], type=pa.int64()),
                "tag": pa.array(["x"], type=pa.string()),
            }
        ),
        str(out / "gen2" / "b.parquet"),
    )
    schema = {"id": pa.int64(), "tag": pa.string(), "score": pa.int64()}
    got = (
        read_evolved(str(out), schema, defaults={"tag": "none"})
        .to_pandas()
        .sort_values("id", ignore_index=True)
    )
    assert got["id"].tolist() == [1, 2, 3]  # int32 cast up to int64
    assert got["tag"].tolist() == ["none", "none", "x"]
    assert got["score"].isna().all()  # no default → typed nulls

    # align_to_schema on an empty batch keeps the schema (Ray skips the
    # UDF entirely on a 0-row plan, so materialize to force it)
    ds = align_to_schema(
        ray.data.from_arrow(pa.table({"id": pa.array([], type=pa.int64())})),
        schema,
    ).materialize()
    sch = ds.schema()
    assert sch is None or sch.names == ["id", "tag", "score"]


def test_time_travel_snapshots(ray_session, tmp_path):
    import ray

    from pyrosar_ray.stages.mor import mor_scan, mor_write_snapshots

    df = _events()
    out = str(tmp_path / "tt")
    preds = {
        1: lambda g: (g["event_type"] == "error").to_numpy(),
        2: lambda g: (g["event_id"].to_numpy() % 7 == 0),
    }
    manifest = mor_write_snapshots(
        ray.data.from_pandas(df).repartition(3), out, preds
    ).to_pandas()
    assert {"n_deletes_s1", "n_deletes_s2"} <= set(manifest.columns)

    s0 = mor_scan(out, snapshot=0).to_pandas()
    s1 = mor_scan(out, snapshot=1).to_pandas()
    s2 = mor_scan(out, snapshot=2).to_pandas()
    # snapshot 0 = the original commit, nothing deleted
    assert sorted(s0["event_id"]) == sorted(df["event_id"])
    # snapshot monotonicity: later snapshots only shrink
    assert set(s2["event_id"]) <= set(s1["event_id"]) <= set(s0["event_id"])
    assert set(s1["event_id"]) == set(
        df.loc[df["event_type"] != "error", "event_id"]
    )
    want2 = df.loc[
        (df["event_type"] != "error") & (df["event_id"] % 7 != 0), "event_id"
    ]
    assert set(s2["event_id"]) == set(want2)


def test_time_travel_deletes_are_positional(ray_session, tmp_path):
    # tamper with snapshot 2's sidecar: shifting one POSITION changes
    # which row drops, regardless of row values
    import ray

    from pyrosar_ray.stages.mor import mor_scan, mor_write_snapshots

    df = _events()
    out = str(tmp_path / "tt2")
    preds = {1: lambda g: (g["event_id"].to_numpy() == 3)}
    mor_write_snapshots(
        ray.data.from_pandas(df).repartition(2), out, preds
    ).to_pandas()
    day = "2024-03-01"
    path = f"{out}/deletes/s1/day={day}.parquet"
    pos = pq.read_table(path)["pos"].to_numpy()
    import pyarrow as pa

    pq.write_table(pa.table({"pos": pa.array(pos + 1)}), path)
    got = mor_scan(out, snapshot=1).to_pandas()
    # event 3 survives, its positional successor in the day file dropped
    day_rows = df[df["ts"] == pd.Timestamp(day)].sort_values("event_id")
    victim = day_rows["event_id"].to_numpy()[
        np.searchsorted(day_rows["event_id"].to_numpy(), 3) + 1
    ]
    assert 3 in set(got["event_id"]) and victim not in set(got["event_id"])


# ---------------------------------------------------------------- equality


def _eq_layout(tmp_path):
    import pandas as pd

    import ray

    from pyrosar_ray.stages.mor import eq_write

    t0 = pd.Timestamp("2024-01-01")
    df = pd.DataFrame(
        {
            "event_id": np.arange(40, dtype=np.int64),
            "ts": [t0 + pd.Timedelta(hours=int(h) * 13) for h in range(40)],
            "event_type": ["error" if i % 5 == 0 else "view" for i in range(40)],
        }
    )
    out = str(tmp_path / "eq")
    eq_write(
        ray.data.from_pandas(df),
        out,
        {
            1: lambda g: g["event_type"].to_numpy() == "error",
            2: lambda g: g["event_id"].to_numpy() % 7 == 3,
        },
    ).materialize()
    return out, df


def test_eq_scan_as_of(ray_session, tmp_path):
    from pyrosar_ray.stages.mor import eq_scan

    out, df = _eq_layout(tmp_path)
    full = eq_scan(out, as_of=0).to_pandas()
    assert len(full) == 40  # no commit applied
    c1 = eq_scan(out, as_of=1).to_pandas()
    assert set(c1.event_id) == set(df[df.event_type != "error"].event_id)
    c2 = eq_scan(out, as_of=None).to_pandas()
    want = df[(df.event_type != "error") & (df.event_id % 7 != 3)]
    assert set(c2.event_id) == set(want.event_id)


def test_eq_deletes_survive_compaction_reorder(ray_session, tmp_path):
    """THE property that distinguishes equality from positional deletes:
    rewrite a base file with its rows reversed (a compaction reorder)
    and the equality scan still returns exactly the same rows — a
    positional sidecar would now delete the wrong rows."""
    import pyarrow.parquet as pq_

    from pyrosar_ray.stages.mor import eq_scan

    out, _ = _eq_layout(tmp_path)
    before = eq_scan(out).to_pandas().sort_values("event_id", ignore_index=True)

    base_dir = f"{out}/base"
    fname = sorted(os.listdir(base_dir))[0]
    tab = pq_.read_table(f"{base_dir}/{fname}")
    reversed_tab = tab.take(pa.array(np.arange(len(tab))[::-1]))
    pq_.write_table(reversed_tab, f"{base_dir}/{fname}", row_group_size=7)

    after = eq_scan(out).to_pandas().sort_values("event_id", ignore_index=True)
    pd.testing.assert_frame_equal(
        before[["event_id", "event_type"]], after[["event_id", "event_type"]]
    )


def test_compact_preserves_scan_and_resets_sidecars(ray_session, tmp_path):
    """mor_compact folds the deletes into the base: the visible rows are
    identical before and after (by VALUE — positions legitimately
    re-densify), sidecars come back empty, and a fresh scan needs no
    anti-filter."""
    import ray

    from pyrosar_ray.stages.mor import mor_compact, mor_scan, mor_write

    out = str(tmp_path / "mor")
    mor_write(ray.data.from_pandas(_events()), out).materialize()
    before = (
        mor_scan(out)
        .to_pandas()
        .sort_values("event_id", ignore_index=True)[["event_id", "event_type"]]
    )
    manifest = mor_compact(out).to_pandas()
    after_scan = mor_scan(out).to_pandas()
    after = after_scan.sort_values("event_id", ignore_index=True)[
        ["event_id", "event_type"]
    ]
    pd.testing.assert_frame_equal(before, after)
    assert int(manifest.n_rows.sum()) == len(before)
    # sidecars reset: every delete file is now empty
    deldir = f"{out}/deletes"
    for f in os.listdir(deldir):
        assert len(pq.read_table(f"{deldir}/{f}")) == 0
    # positions re-densified per day: 0..n-1 with no gaps
    for day, grp in after_scan.groupby("day"):
        assert sorted(grp.pos) == list(range(len(grp)))


def test_eq_scan_bloom_cascade_identical(ray_session, tmp_path):
    """Past the broadcast bound, eq_scan switches to the bloom +
    exact-verify cascade (membership.bloom_anti_join) and must emit
    EXACTLY the broadcast path's rows — bloom false positives ride the
    exact anti-join, none are dropped."""
    from pyrosar_ray.stages.mor import eq_scan

    out, _ = _eq_layout(tmp_path)
    want = (
        eq_scan(out)
        .to_pandas()
        .sort_values(["event_id"], ignore_index=True)
    )
    # broadcast_bound=0 forces the cascade on the same layout; a tiny
    # m_bits in the underlying bloom would raise the FP fraction but
    # correctness is independent of it (exact verify)
    got = (
        eq_scan(out, broadcast_bound=0)
        .to_pandas()
        .sort_values(["event_id"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(
        got[want.columns.tolist()], want, check_dtype=False
    )

    # as_of composes with the cascade too
    want1 = (
        eq_scan(out, as_of=1).to_pandas().sort_values("event_id", ignore_index=True)
    )
    got1 = (
        eq_scan(out, as_of=1, broadcast_bound=0)
        .to_pandas()
        .sort_values("event_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(
        got1[want1.columns.tolist()], want1, check_dtype=False
    )
