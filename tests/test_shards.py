"""Shard layout + blob concat (stages/packing.py shard_layout/concat_shards)."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from pyrosar_ray.stages.packing import concat_shards, shard_layout
from pyrosar_ray.stages.sampling import hash_bucket


def _items(n=200, seed=7):
    rng = np.random.default_rng(seed)
    ids = np.arange(n, dtype=np.int64)
    sizes = rng.integers(1, 50, n).astype(np.int64)
    blobs = [bytes(rng.integers(0, 256, s, dtype=np.uint8)) for s in sizes]
    tab = pa.table(
        {
            "key": pa.array(ids),
            "name": pa.array([f"item-{i:06d}" for i in ids]),
            "size": pa.array(sizes),
            "blob": pa.array(blobs, pa.binary()),
        }
    )
    return ray.data.from_arrow(tab).repartition(5), tab.to_pandas()


def test_shard_layout_offsets_exact():
    ds, df = _items()
    out = (
        shard_layout(ds, num_shards=8, hash_col="key", id_col="name",
                     size_col="size")
        .to_pandas()
        .sort_values(["shard", "name"], ignore_index=True)
    )
    df["shard"] = hash_bucket(df["key"].to_numpy(), 8)
    want = df.sort_values(["shard", "name"], ignore_index=True)
    want["offset"] = want.groupby("shard")["size"].cumsum() - want["size"]
    assert (out["offset"].to_numpy() == want["offset"].to_numpy()).all()
    assert (out["nbytes"].to_numpy() == want["size"].to_numpy()).all()
    # offsets are dense: last offset + size == shard total
    tot = out.groupby("shard").tail(1)
    agg = out.groupby("shard")["nbytes"].sum()
    assert ((tot["offset"] + tot["nbytes"]).to_numpy() == agg.to_numpy()).all()


def test_concat_shards_digest_matches_layout():
    ds, df = _items(60, seed=3)
    out = (
        concat_shards(ds, num_shards=4, hash_col="key", id_col="name",
                      bytes_col="blob")
        .to_pandas()
        .sort_values("shard", ignore_index=True)
    )
    df["shard"] = hash_bucket(df["key"].to_numpy(), 4)
    for row in out.itertuples():
        part = df[df["shard"] == row.shard].sort_values("name")
        blob = b"".join(part["blob"])
        assert row.n_items == len(part)
        assert row.total_bytes == len(blob)
        assert row.sha256 == hashlib.sha256(blob).hexdigest()


def test_shard_layout_rejects_bad_count():
    ds, _ = _items(10)
    with pytest.raises(ValueError):
        shard_layout(ds, num_shards=0, hash_col="key", id_col="name",
                     size_col="size")
