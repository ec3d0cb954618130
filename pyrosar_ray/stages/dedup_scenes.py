"""Exact scene dedup with deterministic first-wins routing.

Reference semantics (pyroSAR/archive.py:563-577): identity key is
(outname_base, product); the first arrival goes to the ``data`` table,
later arrivals with the same key but a different file land in
``duplicates`` (keyed (outname_base, scene)); an exact re-arrival is
dropped. The reference's "first" is transaction arrival order — a
single-process notion. The engine replaces it with a TOTAL ORDER (the
``scene`` path, ascending) so N-node and 4N-node runs route the same
rows identically (SURVEY.md §7.4-2).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset
from ray.data.aggregate import Min


def mark_duplicates(scenes: Dataset, winners_via: str = "driver") -> Dataset:
    """Append ``is_duplicate`` (bool): False for the per-identity winner.

    Winner = minimum ``scene`` path within each (outname_base, product)
    group. Physical plan (no per-group Python):

    1. winner per identity key: per-batch partial min + driver merge
       (default — the winner table is catalog-sized metadata) or a
       distributed ``groupby.aggregate(Min)`` (``winners_via='shuffle'``
       for identity-key spaces too large to merge driver-side);
    2. the winner table is broadcast once via ``ray.put``; each batch
       marks ``scene != winner`` with one hash-map probe per row.

    If the identity-key space ever outgrew worker memory, step 2 becomes
    a hash-partitioned join on the identity key instead of a broadcast
    (same semantics, one more shuffle).
    """
    if winners_via == "shuffle":
        winners = (
            scenes.select_columns(["outname_base", "product", "scene"])
            .groupby(["outname_base", "product"])
            .aggregate(Min("scene", alias_name="winner"))
        )
        wdf = winners.to_pandas()
    else:
        # per-batch partial min → driver merge: the winner table is one
        # row per identity key (catalog metadata), so collecting partials
        # driver-side skips the all-to-all entirely
        def _partial(batch: pa.Table) -> pa.Table:
            df = batch.select(["outname_base", "product", "scene"]).to_pandas()
            part = df.groupby(["outname_base", "product"], as_index=False)["scene"].min()
            return pa.Table.from_pandas(part, preserve_index=False)

        partials = scenes.select_columns(["outname_base", "product", "scene"]).map_batches(
            _partial, batch_format="pyarrow"
        )
        wdf = (
            partials.to_pandas()
            .groupby(["outname_base", "product"], as_index=False)["scene"]
            .min()
            .rename(columns={"scene": "winner"})
        )
    wtab = pa.Table.from_pandas(wdf, preserve_index=False)
    ref = ray.put(wtab)

    class _Mark:
        def __init__(self):
            tab = ray.get(ref)
            keys = [
                f"{b}\x00{p}"
                for b, p in zip(tab["outname_base"].to_pylist(), tab["product"].to_pylist())
            ]
            self.winner = dict(zip(keys, tab["winner"].to_pylist()))

        def __call__(self, batch: pa.Table) -> pa.Table:
            keys = [
                f"{b}\x00{p}"
                for b, p in zip(
                    batch["outname_base"].to_pylist(), batch["product"].to_pylist()
                )
            ]
            scene = batch["scene"].to_pylist()
            lookup = self.winner
            dup = pa.array([lookup[k] != s for k, s in zip(keys, scene)])
            return batch.append_column("is_duplicate", dup)

    return scenes.map_batches(_Mark, batch_format="pyarrow", concurrency=(1, 4))


def split_registered(marked: Dataset) -> tuple[Dataset, Dataset]:
    """(data, duplicates) Datasets from a marked stream.

    ``duplicates`` carries the reference's two-column schema
    (outname_base, scene) — pyroSAR/archive.py:415-418.
    """
    def _keep(flag: bool):
        def _f(batch: pa.Table) -> pa.Table:
            mask = batch["is_duplicate"].to_numpy(zero_copy_only=False) == flag
            return batch.filter(pa.array(mask))

        return _f

    data = (
        marked.map_batches(_keep(False), batch_format="pyarrow")
        .drop_columns(["is_duplicate"])
    )
    dup = (
        marked.map_batches(_keep(True), batch_format="pyarrow")
        .select_columns(["outname_base", "scene"])
    )
    return data, dup


def filter_scenelist(candidates: Dataset, registered_keys: set[str]) -> Dataset:
    """Anti-join of candidate scenes vs already-registered scene basenames.

    Reference: Archive.filter_scenelist (pyroSAR/archive.py:717-745) —
    drop candidates whose basename is already in data ∪ duplicates. The
    registered set is broadcast (ray.put happens implicitly via closure
    capture of the frozenset) and filtered vectorized per batch.
    """
    frozen = frozenset(registered_keys)

    def _filter(batch: pa.Table) -> pa.Table:
        names = pd.Series(batch["scene"].to_pylist()).map(lambda p: p.rsplit("/", 1)[-1])
        keep = ~names.isin(frozen)
        return batch.filter(pa.array(keep.to_numpy()))

    return candidates.map_batches(_filter, batch_format="pyarrow")
