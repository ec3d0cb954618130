"""Merge-on-read positional deletes (stages/mor.py)."""

import numpy as np
import pandas as pd
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
