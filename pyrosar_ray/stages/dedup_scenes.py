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
from ray.data import Dataset


def mark_duplicates(scenes: Dataset) -> Dataset:
    """Append ``is_duplicate`` (bool): False for the per-identity winner.

    Winner = minimum ``scene`` path within each (outname_base, product)
    group. Identity groups are tiny (collisions, not content groups), so
    a plain hash groupby + per-group sort is shuffle-bounded by the
    input size with no skew risk.
    """

    def _route(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values("scene", kind="mergesort")
        group = group.assign(is_duplicate=[False] + [True] * (len(group) - 1))
        return group

    return scenes.groupby(["outname_base", "product"]).map_groups(
        _route, batch_format="pandas"
    )


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
