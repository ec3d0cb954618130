"""Datacube export model: measurement merging + ingestion specs.

Engine twin of the reference's datacube_util (pyroSAR/datacube_util.py):

- ``merge_measurements`` — the ``Dataset.__add__`` semantics
  (datacube_util.py:170-213): per-polarization product files merge into
  one logical dataset keyed by identity; non-measurement attributes
  must agree across members (attribute-equality guard raises on
  mismatch); measurements end up keyed by polarization
  (datacube_util.py:162-166).
- ``ingestion_spec`` — the ingestion definition with explicit x/y
  chunking where ``tile_size = resolution × chunking`` per axis
  (datacube_util.py:714-718).
- ``write_product_sidecar`` — the indexing/ingestion YAML sidecar
  (datacube_util.py:610-735), written as YAML when available (pyyaml
  ships with Ray) with a JSON fallback.
"""

from __future__ import annotations

import json
import os

import pandas as pd
from ray.data import Dataset

#: columns that identify/measure rather than describe; everything else
#: must be equal across merged members
MEASUREMENT_COLS = ("polarization", "path")
KEY_COL = "outname_base"


def merge_measurements(ds: Dataset) -> Dataset:
    """One row per identity: measurements dict keyed by polarization.

    Input rows: (outname_base, polarization, path, *attrs). Attribute
    columns must be identical within a group — mismatches raise, like
    the reference's __add__ guard.
    """

    def _merge(group: pd.DataFrame) -> pd.DataFrame:
        attrs = [c for c in group.columns if c not in MEASUREMENT_COLS and c != KEY_COL]
        for col in attrs:
            if group[col].nunique(dropna=False) > 1:
                raise RuntimeError(
                    f"cannot merge measurements: attribute mismatch on {col!r}"
                )
        group = group.sort_values("polarization", kind="mergesort")
        measurements = dict(zip(group["polarization"], group["path"]))
        row = {KEY_COL: [group[KEY_COL].iloc[0]], "measurements": [json.dumps(measurements)]}
        for col in attrs:
            row[col] = [group[col].iloc[0]]
        return pd.DataFrame(row)

    return ds.groupby(KEY_COL).map_groups(_merge, batch_format="pandas")


def ingestion_spec(
    product_name: str,
    resolution: tuple[float, float],
    chunking: tuple[int, int],
    crs: str = "EPSG:4326",
) -> dict:
    """Ingestion definition; tile_size = resolution × chunking per axis."""
    res_x, res_y = resolution
    chunk_x, chunk_y = chunking
    return {
        "source_type": product_name,
        "output_type": f"{product_name}_ingested",
        "storage": {
            "crs": crs,
            "resolution": {"x": res_x, "y": -abs(res_y)},
            "chunking": {"x": chunk_x, "y": chunk_y, "time": 1},
            "tile_size": {"x": res_x * chunk_x, "y": abs(res_y) * chunk_y},
        },
    }


def product_definition(
    name: str, measurements: list[str], dtype: str = "float32", nodata: float = 0.0
) -> dict:
    """Minimal ODC-style product definition (datacube_util.py:332-767)."""
    return {
        "name": name,
        "metadata_type": "eo",
        "measurements": [
            {"name": m, "dtype": dtype, "nodata": nodata, "units": "1"}
            for m in sorted(measurements)
        ],
    }


def write_product_sidecar(spec: dict, path: str) -> str:
    """Write a product/ingestion sidecar (YAML if available, else JSON)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    try:
        import yaml

        with open(path, "w") as fh:
            yaml.safe_dump(spec, fh, sort_keys=False)
    except ImportError:  # pragma: no cover
        path = os.path.splitext(path)[0] + ".json"
        with open(path, "w") as fh:
            json.dump(spec, fh, indent=2)
    return path
