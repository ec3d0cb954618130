"""find_datasets: metadata-filtered selection over a product-file listing.

Engine twin of the reference's ``ancillary.find_datasets``
(``/root/reference/pyroSAR/ancillary.py:282-329``): there, a directory
is globbed for pyroSAR-named products, each name is parsed with
``parse_datasetname`` and filtered by attribute predicates in a Python
loop. Here the listing is a Dataset of file paths (the distributed
analog of the directory walk — e.g. an object-store inventory), names
are parsed with the vectorized grammar kernel, and every predicate is a
pandas mask:

- ``start=v``  keeps rows with ``v <= start``;
- ``stop=v``   keeps rows with ``v >= start`` (only the start stamp is
  in the filename, same asymmetry as the reference);
- a tuple value is a membership test;
- ``proc_steps=[...]`` matches the exact ordered step list;
- any other value is an exact match.

Non-matching names (grammar misses) are dropped, mirroring the
reference's ``finder(patterns.pyrosar)`` pre-filter.
"""

from __future__ import annotations

import pandas as pd
from ray.data import Dataset

from ..functions.names import parse_datasetname_batch


def find_datasets(files: Dataset, path_col: str = "filename", **filters) -> Dataset:
    """Filter a file-path Dataset by parsed product-name metadata.

    Returns the parsed metadata rows (filename + grammar fields) of all
    matching products. Pure per-batch work — no shuffle; predicates are
    vectorized string/equality masks.
    """

    def _filter(df: pd.DataFrame) -> pd.DataFrame:
        meta = parse_datasetname_batch(df[path_col].to_numpy(dtype=object))
        keep = meta["outname_base"].notna()
        for key, val in filters.items():
            if key == "start":
                keep &= meta["start"].notna() & (meta["start"] >= val)
            elif key == "stop":
                keep &= meta["start"].notna() & (meta["start"] <= val)
            elif isinstance(val, tuple):
                keep &= meta[key].isin(val)
            elif key == "proc_steps":
                # ordered exact match: compare the joined step string
                want = "_".join(val) if isinstance(val, list) else val
                keep &= meta[key] == want
            else:
                keep &= meta[key] == val
        out = meta[keep.fillna(False)].reset_index(drop=True)
        return out.astype({c: "object" for c in out.columns})

    return files.map_batches(_filter, batch_format="pandas")
