"""Raster sinks: ENVI / GAMMA flat-binary writers as Dataset stages.

Engine twin of the reference's writer endpoints — ``snap.writer``'s
ENVI/GeoTIFF product export (the GeoTIFF encode needs GDAL, absent
here; ENVI raw + header is the GDAL-free on-disk format the reference
itself uses for GETASSE30 via ``getasse30_hdr``, auxdata.py:1552-1596)
and the GAMMA side's image + text-parameter-file pairs
(``gamma/dem.py`` writes ``<name>`` + ``<name>.par``).

Ray-side design: a raster Dataset (``tile, data, rows, cols, ulx, uly,
xres, yres, nodata`` — the schema produced by
:mod:`~pyrosar_ray.stages.dem_load`) is written one file pair per row
from inside ``map_batches`` tasks, atomically (tmp + rename) and
idempotently (an existing header marks the raster done, so a resumed
run skips finished files — the same restart economics as the lineage
parquet writer). The returned manifest Dataset (one row per raster)
is the pipeline's consumable output; nothing materializes driver-side.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from ..functions.sar import envi_hdr

#: ENVI data-type codes for the payload dtypes this engine produces
_ENVI_DTYPE = {"int16": 2, "float32": 4}


def gamma_par(
    title: str, rows: int, cols: int, ulx: float, uly: float,
    xres: float, yres: float, dtype: str = "float32",
) -> str:
    """GAMMA EQA DEM parameter text (the ``<name>.par`` sidecar shape
    the reference's gamma DEM pipeline produces, gamma/dem.py)."""
    fmt = {"float32": "REAL*4", "int16": "INTEGER*2"}[dtype]
    return "\n".join(
        [
            "Gamma DIFF&GEO DEM/MAP parameter file",
            f"title: {title}",
            "DEM_projection: EQA",
            f"data_format: {fmt}",
            f"width: {cols}",
            f"nlines: {rows}",
            f"corner_lat: {uly:.7f} decimal degrees",
            f"corner_lon: {ulx:.7f} decimal degrees",
            f"post_lat: {-abs(yres):.7e} decimal degrees",
            f"post_lon: {abs(xres):.7e} decimal degrees",
            "ellipsoid_name: WGS 84",
            "datum_name: WGS 1984",
        ]
    )


def write_rasters(
    rasters: Dataset,
    out_dir: str,
    fmt: str = "envi",
    name_col: str = "tile",
    dtype: str = "float32",
) -> Dataset:
    """Write each raster row as a flat-binary file + sidecar; returns the
    manifest (name, path, rows, cols, bytes, skipped).

    ``fmt='envi'`` writes ``<name>.img`` + ``<name>.hdr``;
    ``fmt='gamma'`` writes ``<name>`` + ``<name>.par``. Writes are
    atomic (tmp + rename, sidecar last) and idempotent — a present
    sidecar marks the raster complete and the row is skipped, so a
    failed run resumes where it stopped.
    """
    if fmt not in ("envi", "gamma"):
        raise ValueError(f"unsupported raster sink format: {fmt!r}")
    os.makedirs(out_dir, exist_ok=True)
    code = _ENVI_DTYPE[dtype]

    def _write(batch: pa.Table) -> pa.Table:
        out = {"name": [], "path": [], "rows": [], "cols": [], "bytes": [], "skipped": []}
        for i in range(len(batch)):
            name = str(batch[name_col][i].as_py()).replace("/", "_")
            rows = int(batch["rows"][i].as_py())
            cols = int(batch["cols"][i].as_py())
            if fmt == "envi":
                data_path = os.path.join(out_dir, f"{name}.img")
                side_path = os.path.join(out_dir, f"{name}.hdr")
            else:
                data_path = os.path.join(out_dir, name)
                side_path = os.path.join(out_dir, f"{name}.par")
            if os.path.exists(side_path):
                out["skipped"].append(True)
                out["name"].append(name)
                out["path"].append(data_path)
                out["rows"].append(rows)
                out["cols"].append(cols)
                out["bytes"].append(os.path.getsize(data_path))
                continue
            payload = np.frombuffer(batch["data"][i].as_py(), dtype=np.float32)
            if dtype != "float32":
                payload = payload.astype(dtype)
            raw = payload.tobytes()
            ulx = float(batch["ulx"][i].as_py())
            uly = float(batch["uly"][i].as_py())
            xres = float(batch["xres"][i].as_py())
            yres = float(batch["yres"][i].as_py())
            if fmt == "envi":
                sidecar = envi_hdr(cols, rows, ulx, uly, xres, dtype=code)
            else:
                sidecar = gamma_par(name, rows, cols, ulx, uly, xres, yres, dtype)
            tmp = data_path + ".tmp"
            with open(tmp, "wb") as fh:
                fh.write(raw)
            os.rename(tmp, data_path)
            with open(side_path + ".tmp", "w") as fh:
                fh.write(sidecar)
            os.rename(side_path + ".tmp", side_path)
            out["skipped"].append(False)
            out["name"].append(name)
            out["path"].append(data_path)
            out["rows"].append(rows)
            out["cols"].append(cols)
            out["bytes"].append(len(raw))
        return pa.table(
            {
                "name": pa.array(out["name"], type=pa.string()),
                "path": pa.array(out["path"], type=pa.string()),
                "rows": pa.array(out["rows"], type=pa.int64()),
                "cols": pa.array(out["cols"], type=pa.int64()),
                "bytes": pa.array(out["bytes"], type=pa.int64()),
                "skipped": pa.array(out["skipped"], type=pa.bool_()),
            }
        )

    return rasters.map_batches(_write, batch_format="pyarrow")
