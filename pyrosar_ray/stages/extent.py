"""Distributed extent / consensus aggregates over scene catalogs.

Three small global aggregates the reference computes driver-side over
Python lists, re-expressed as Ray Data tree aggregates so they hold at
catalog scale (every one reduces per-block partials to a handful of
scalars — no shuffle, no materialization of the big side):

- :func:`common_extent` — the INTERSECTION extent of all footprints
  (max of mins, min of maxes) plus an optional buffer; reference
  ``auxdata.py:606-632`` (``DEMHandler.__commonextent`` +
  ``__applybuffer`` at ``auxdata.py:504-511``).
- :func:`hgt_union` — the buffered 1° tile-name union covering ALL
  scenes: global min/max of the floored corner coordinates, expanded to
  the full ``[min..max]`` lat × lon rectangle of ``.hgt`` names;
  reference ``gamma/dem.py:525-573`` (``hgt``).
- :func:`nodata_consensus` — the single nodata value shared by every
  raster, raising when rasters disagree; reference
  ``gamma/dem.py:609-613``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Max, Min

from ..functions.tiles import format_lat, format_lon

EXTENT_COLS = ("xmin", "ymin", "xmax", "ymax")


def common_extent(scenes: Dataset, buffer: float | None = None) -> dict:
    """Common (intersection) extent of all scene bboxes, plus buffer.

    One distributed Min/Max aggregate — per-block partials combine to
    four scalars, so the plan is a tree reduce regardless of catalog
    size. Empty catalogs raise (the reference falls back to a global
    extent only when no geometries were configured at all).
    """
    agg = scenes.aggregate(
        Max("xmin", alias_name="xmin"),
        Max("ymin", alias_name="ymin"),
        Min("xmax", alias_name="xmax"),
        Min("ymax", alias_name="ymax"),
    )
    if agg.get("xmin") is None:
        raise ValueError("common_extent of an empty scene catalog")
    ext = {k: float(agg[k]) for k in EXTENT_COLS}
    if buffer is not None:
        ext["xmin"] -= buffer
        ext["ymin"] -= buffer
        ext["xmax"] += buffer
        ext["ymax"] += buffer
    return ext


def common_extent_table(scenes: Dataset, buffer: float | None = None) -> pa.Table:
    """:func:`common_extent` as a one-row Arrow table (query surface)."""
    ext = common_extent(scenes, buffer)
    return pa.table({k: pa.array([ext[k]], type=pa.float64()) for k in EXTENT_COLS})


def hgt_union(scenes: Dataset) -> pa.Table:
    """1° HGT tile names covering the union rectangle of all scenes.

    Reference semantics (``gamma/dem.py:558-573``): every scene
    contributes ``floor`` of its four corner coordinates; the global
    ``[min..max]`` integer ranges (upper bound inclusive — the extra 1°
    buffer) expand to the full lat × lon rectangle of names. The
    floors are computed per-batch and min/max-reduced, so only four
    scalars leave the cluster; the name expansion is driver-side and
    bounded (≤ 180 × 360).
    """

    def _floors(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lat_lo": pc.floor(batch["ymin"]),
                "lat_hi": pc.floor(batch["ymax"]),
                "lon_lo": pc.floor(batch["xmin"]),
                "lon_hi": pc.floor(batch["xmax"]),
            }
        )

    agg = scenes.map_batches(_floors, batch_format="pyarrow").aggregate(
        Min("lat_lo", alias_name="lat_lo"),
        Max("lat_hi", alias_name="lat_hi"),
        Min("lon_lo", alias_name="lon_lo"),
        Max("lon_hi", alias_name="lon_hi"),
    )
    if agg.get("lat_lo") is None:
        return pa.table({"tile": pa.array([], type=pa.string())})
    lats = range(int(agg["lat_lo"]), int(agg["lat_hi"]) + 1)
    lons = range(int(agg["lon_lo"]), int(agg["lon_hi"]) + 1)
    names = [format_lat(y) + format_lon(x) + ".hgt" for y in lats for x in lons]
    return pa.table({"tile": pa.array(names, type=pa.string())})


def nodata_consensus(rasters: Dataset, col: str = "nodata"):
    """The single nodata value shared by all rasters.

    Per-batch ``pc.unique`` partials (a few scalars per block) are
    re-uniqued driver-side; more than one distinct value raises, exactly
    like the reference's pre-mosaic guard (``gamma/dem.py:609-613``).
    """

    def _uniq(batch: pa.Table) -> pa.Table:
        return pa.table({col: pc.unique(batch[col])})

    parts = rasters.select_columns([col]).map_batches(_uniq, batch_format="pyarrow")
    values = np.unique(np.concatenate([b[col].to_numpy() for b in parts.iter_batches(batch_format="pyarrow")] or [np.array([])]))
    if len(values) > 1:
        raise RuntimeError("different nodata values are not permitted")
    return values[0] if len(values) else None
