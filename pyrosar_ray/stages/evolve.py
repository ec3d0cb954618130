"""Schema-evolution scan — reading a table whose files span schema
generations (the lakehouse column-add path: old files simply lack the
new columns; a rewrite of 100 TB to add a column is never acceptable,
so the SCAN must align).

- :func:`evolved_write` — writes generation-1 files (doc_id, text) and
  generation-2 files (+ lang, + quality) side by side, as a real
  column-add migration leaves them.
- :func:`read_evolved` — one Ray read per generation directory, each
  aligned to the TARGET schema inside ``map_batches`` (missing columns
  materialize as the declared default or typed nulls — never inferred,
  never file-order dependent), then a streaming union. Alignment is
  per batch and zero-copy for present columns.
"""

from __future__ import annotations

import os

import pyarrow as pa
from ray.data import Dataset

from ..pipelines.tables import read_parquet_clean


def evolved_write(docs_path: str, out_dir: str) -> dict:
    """Split the documents table into two schema generations on disk."""
    import pyarrow.parquet as pq

    os.makedirs(f"{out_dir}/gen1", exist_ok=True)
    os.makedirs(f"{out_dir}/gen2", exist_ok=True)
    tab = pq.read_table(
        docs_path, columns=["doc_id", "text", "lang", "n_chars"]
    )
    ids = tab["doc_id"].to_numpy()
    old = tab.filter(pa.array(ids % 2 == 0)).select(["doc_id", "text"])
    new = tab.filter(pa.array(ids % 2 == 1)).rename_columns(
        ["doc_id", "text", "lang", "quality"]
    )
    pq.write_table(old, f"{out_dir}/gen1/part-0.parquet")
    pq.write_table(new, f"{out_dir}/gen2/part-0.parquet")
    return {"gen1_rows": len(old), "gen2_rows": len(new)}


def align_to_schema(
    ds: Dataset,
    schema: dict[str, pa.DataType],
    defaults: dict[str, object] | None = None,
) -> Dataset:
    """Project every batch onto ``schema``: present columns cast,
    missing ones filled with the default (or typed nulls)."""
    defaults = defaults or {}

    def _align(batch: pa.Table) -> pa.Table:
        n = len(batch)
        cols = {}
        for name, typ in schema.items():
            if name in batch.column_names:
                cols[name] = batch[name].cast(typ)
            elif name in defaults:
                cols[name] = pa.array([defaults[name]] * n, type=typ)
            else:
                cols[name] = pa.nulls(n, type=typ)
        return pa.table(cols)

    return ds.map_batches(_align, batch_format="pyarrow")


def read_evolved(
    out_dir: str,
    schema: dict[str, pa.DataType],
    defaults: dict[str, object] | None = None,
) -> Dataset:
    """Union all generation directories under ``out_dir``, aligned."""
    gens = sorted(
        d for d in os.listdir(out_dir)
        if os.path.isdir(f"{out_dir}/{d}")
    )
    if not gens:
        raise ValueError(
            f"read_evolved: no generation subdirectories under {out_dir!r}"
        )
    parts = [
        align_to_schema(read_parquet_clean(f"{out_dir}/{g}"), schema, defaults)
        for g in gens
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out
