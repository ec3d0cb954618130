"""Dataset loaders for the sf-dir parquet tables + derived spatial tables.

The spatial engine operates on scene footprints and geolocated points;
both are derived deterministically from the driver's TPC-H-ish tables by
the kernels in :mod:`pyrosar_ray.derive` (each has an exact SQL twin so
the DuckDB oracle reproduces them bit-for-bit). Loads always prune to
the columns actually consumed (scale rule: never ship unused columns out
of storage).
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data
from ray.data import Dataset

from ..derive import (
    points_from_lineitem,
    quad_corners_from_keys,
    scenes_from_orders,
)


def _strip_block_metadata(block: pa.Table) -> pa.Table:
    """Zero-copy removal of key/value schema metadata from a read block."""
    return block.replace_schema_metadata(None)


def read_parquet_clean(path: str, columns: list[str] | None = None, **kw) -> Dataset:
    """``ray.data.read_parquet`` with key/value schema metadata stripped.

    pyarrow's ``Schema.__hash__`` raises ``unhashable type: 'dict'`` on
    any schema carrying metadata (the testdata files all carry a
    ``pandas`` block), which defeats Ray's block-schema dedup fast path
    and spams ``Failed to hash the schemas`` warnings from every read
    task. The strip runs as the read's block UDF: zero-copy (metadata
    lives on the schema object, not the buffers — unlike passing
    ``schema=``, which makes pyarrow cast every batch, measured ~20%
    slower on the largest read), and, because the UDF lives in this
    package, every read worker imports pyrosar_ray at task start and
    gets the cosmetic-log filters before the first block materializes.
    Engine-wide read entry point — use this instead of
    ``ray.data.read_parquet``.
    """
    kw.setdefault("_block_udf", _strip_block_metadata)
    # GRAFT_READ_BLOCKS forces the read's block count — the
    # determinism-harness knob: every hash-twin query must produce the
    # identical canonical hash at ANY block count (cluster-size
    # independence, tested in tests/test_determinism.py)
    import os

    ov = os.environ.get("GRAFT_READ_BLOCKS")
    if ov and "override_num_blocks" not in kw:
        kw["override_num_blocks"] = int(ov)
    return ray.data.read_parquet(path, columns=columns, **kw)


def load_table(sf_dir: str, name: str, columns: list[str] | None = None) -> Dataset:
    """Read one driver table, Lance-first per BASELINE.json's input_hint.

    A ``{name}.lance`` dataset directory takes precedence and is read
    via ``ray.data.read_lance`` with column pushdown; otherwise the
    ``{name}.parquet`` file with the identical schema is read. The
    ``lance`` package is absent in this container, so the parquet path
    is what tests exercise — the routing itself is covered by a stubbed
    test (tests/test_tile_ingest.py).
    """
    lance_path = f"{sf_dir}/{name}.lance"
    if os.path.isdir(lance_path):
        try:
            import lance  # noqa: F401
        except ImportError as exc:  # pragma: no cover - env constraint
            raise ImportError(
                f"{lance_path} is a Lance dataset but the 'lance' package "
                "is not installed; convert to parquet or install lance"
            ) from exc
        return ray.data.read_lance(lance_path, columns=columns)
    return read_parquet_clean(f"{sf_dir}/{name}.parquet", columns=columns)


def load_scenes(sf_dir: str) -> Dataset:
    """Scene catalog Dataset derived from orders (columns pruned at read)."""
    ds = load_table(sf_dir, "orders", columns=["o_orderkey"])

    def _derive(batch: pa.Table) -> pa.Table:
        return scenes_from_orders(batch["o_orderkey"].to_numpy())

    return ds.map_batches(_derive, batch_format="pyarrow")


def load_scene_quads(sf_dir: str) -> Dataset:
    """Scene catalog with convex CCW quad footprint corners appended.

    The quad model mirrors real SAR acquisition footprints (corner
    coordinates from identify(), reference drivers.py) — not
    axis-aligned; the point-in-polygon join path consumes these.
    """
    ds = load_table(sf_dir, "orders", columns=["o_orderkey"])

    def _derive(batch: pa.Table) -> pa.Table:
        keys = batch["o_orderkey"].to_numpy()
        out = scenes_from_orders(keys)
        for name, arr in quad_corners_from_keys(keys).items():
            out = out.append_column(name, pa.array(arr))
        return out

    return ds.map_batches(_derive, batch_format="pyarrow")


def load_points(sf_dir: str) -> Dataset:
    """Geolocated point Dataset derived from lineitem (columns pruned)."""
    ds = load_table(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber"])

    def _derive(batch: pa.Table) -> pa.Table:
        return points_from_lineitem(
            batch["l_orderkey"].to_numpy(), batch["l_linenumber"].to_numpy()
        )

    return ds.map_batches(_derive, batch_format="pyarrow")


def load_partsupp(sf_dir: str, num_partitions: int = 64) -> Dataset:
    """Derived partsupp Dataset: the distinct (l_partkey, l_suppkey)
    pairs of lineitem with deterministic availqty / supplycost columns
    (see :func:`pyrosar_ray.derive.partsupp_values` and its SQL twin).

    One packed-key dedup exchange (pair packed pk·2^20+sk, suppkey
    guarded < 2^20); attributes compute vectorized after the dedup.
    Columns: ps_partkey, ps_suppkey, ps_availqty, ps_supplycost_c.
    """
    import numpy as np

    from ..derive import partsupp_values
    from ..stages.agg import keyed_sum

    li = load_table(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])

    def _pack(batch: pa.Table) -> pa.Table:
        import numpy as _np

        pk = batch["l_partkey"].to_numpy()
        sk = batch["l_suppkey"].to_numpy()
        if len(sk) and int(sk.max()) >= (1 << 20):
            raise ValueError("partsupp pack: suppkey >= 2^20")
        packed = _np.unique(pk * (1 << 20) + sk)
        return pa.table(
            {"ps": packed, "one": _np.ones(len(packed), dtype=_np.int64)}
        )

    deduped = keyed_sum(
        li.map_batches(_pack, batch_format="pyarrow"), "ps", ["one"],
        num_partitions=num_partitions,
    )

    def _unpack(batch: pa.Table) -> pa.Table:
        packed = batch["ps"].to_numpy()
        pk = packed >> 20
        sk = packed & ((1 << 20) - 1)
        availqty, supplycost_c = partsupp_values(pk, sk)
        return pa.table(
            {
                "ps_partkey": pk,
                "ps_suppkey": sk,
                "ps_availqty": availqty,
                "ps_supplycost_c": supplycost_c,
            }
        )

    return deduped.map_batches(_unpack, batch_format="pyarrow")
