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

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset
from ray.data.aggregate import Min

from . import table_from_pandas


def mark_duplicates(
    scenes: Dataset, winners_via: str = "driver", materialize_input: bool = True
) -> Dataset:
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

    The input executes twice (winner pass + mark pass); catalog streams
    are metadata-sized, so they are pinned once via ``materialize()``
    rather than recomputed — pass ``materialize_input=False`` for inputs
    too large to pin (they will recompute instead).
    """
    if materialize_input:
        scenes = scenes.materialize()
    if winners_via == "shuffle":
        winners = (
            scenes.select_columns(["outname_base", "product", "scene"])
            .groupby(["outname_base", "product"])
            .aggregate(Min("scene", alias_name="winner"))
        )
        wdf = winners.to_pandas()
        wtab = table_from_pandas(wdf)
    else:
        # per-batch partial min → driver merge: the winner table is one
        # row per identity key (catalog metadata), so collecting partials
        # driver-side skips the all-to-all entirely; Arrow's C++ hash
        # aggregate does both combine levels
        def _agg(tab: pa.Table) -> pa.Table:
            out = pa.TableGroupBy(tab, ["outname_base", "product"]).aggregate(
                [("scene", "min")]
            )
            return out.rename_columns(["outname_base", "product", "scene"])

        partials = scenes.select_columns(["outname_base", "product", "scene"]).map_batches(
            _agg, batch_format="pyarrow"
        )
        from .spatial import materialize_small_side

        merged = materialize_small_side(partials, ["outname_base", "product", "scene"])
        wtab = _agg(merged).rename_columns(["outname_base", "product", "winner"])
    ref = ray.put(wtab)

    class _Mark:
        def __init__(self):
            # hash index over the broadcast winners, built ONCE per actor
            tab = ray.get(ref)
            combined = pc.binary_join_element_wise(
                tab["outname_base"], tab["product"], "\x00"
            )
            self.index = pd.Index(combined.to_pandas())
            self.winner_scene = tab["winner"].to_numpy(zero_copy_only=False)

        def __call__(self, batch: pa.Table) -> pa.Table:
            combined = pc.binary_join_element_wise(
                batch["outname_base"].combine_chunks(),
                batch["product"].combine_chunks(),
                "\x00",
            )
            pos = self.index.get_indexer(pd.Index(combined.to_pandas()))
            # A key absent from the winner table (possible when the winner
            # pass and mark pass recompute a non-materialized input, or on
            # caller-supplied winner drift) must not be compared against an
            # arbitrary winner row: treat it as its own winner (not dup).
            found = pos >= 0
            dup = np.zeros(len(pos), dtype=bool)
            if found.any():
                scene = batch["scene"].to_numpy(zero_copy_only=False)
                dup[found] = self.winner_scene[pos[found]] != scene[found]
            return batch.append_column("is_duplicate", pa.array(dup))

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
