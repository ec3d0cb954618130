"""Raster sinks: ENVI / GAMMA / tiled-GeoTIFF writers as Dataset stages.

Engine twin of the reference's writer endpoints — ``snap.writer``'s
tiled-GeoTIFF product export (snap/auxil.py:439-551; encoded here by
the pure-Python writer in functions/tiff.py, no GDAL), the ENVI raw +
header format the reference uses for GETASSE30 (``getasse30_hdr``,
auxdata.py:1552-1596), and the GAMMA side's image + text-parameter-file
pairs (``gamma/dem.py`` writes ``<name>`` + ``<name>.par``).

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
    if fmt not in ("envi", "gamma", "gtiff"):
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
            elif fmt == "gtiff":
                # self-describing single file: the tif is its own sidecar
                data_path = side_path = os.path.join(out_dir, f"{name}.tif")
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
            if fmt == "gtiff":
                from ..functions.tiff import encode_geotiff

                nodata = None
                if "nodata" in batch.column_names:
                    nodata = batch["nodata"][i].as_py()
                raw = encode_geotiff(
                    payload.reshape(rows, cols),
                    ulx=ulx,
                    uly=uly,
                    xres=xres,
                    yres=yres,
                    nodata=nodata,
                    band_names=[name],
                )
                tmp = data_path + ".tmp"
                with open(tmp, "wb") as fh:
                    fh.write(raw)
                os.rename(tmp, data_path)
            else:
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


def mosaic_vrt(manifest: Dataset, vrtfile: str, extent: dict, **vrt_kwargs) -> str:
    """VRT epilogue over a ``write_rasters(fmt='gtiff')`` manifest: one
    small XML windowing every written tile into ``extent`` (the
    reference builds exactly this after its tile downloads,
    auxdata.py:532). Driver-side by design — a mosaic's manifest is
    bounded by its tile count, and the reference's gdalbuildvrt call is
    a driver epilogue too. Skipped (resumed) rows are included: their
    files exist by the sink's idempotency contract.
    """
    from ..functions.vrt import build_vrt

    rows = sorted(manifest.take_all(), key=lambda r: r["name"])
    paths = [r["path"] for r in rows]
    bad = [p for p in paths if not p.endswith(".tif")]
    if bad:
        raise ValueError(
            f"mosaic_vrt needs a gtiff manifest; got {bad[0]!r} — "
            "write_rasters(fmt='gtiff')"
        )
    return build_vrt(paths, vrtfile, extent, **vrt_kwargs)


def write_products(
    bands: Dataset,
    out_dir: str,
    *,
    suffix: str,
    rtc: bool = False,
    sigma0_rtc: bool = False,
    dem_nodata: float | None = -32768.0,
    tile: int = 256,
) -> Dataset:
    """snap.writer parity: per-band GeoTIFF export with the reference's
    rename grammar and nodata policy (snap/auxil.py:439-551).

    Input rows: ``src_base`` (the workflow product basename containing
    ``suffix``), ``band`` (the .img basename, e.g. ``Gamma0_VV`` or
    ``elevation``), ``data`` (float32 bytes), ``rows/cols/ulx/uly/
    xres/yres``. Each band becomes one tiled GeoTIFF named by the
    writer grammar (``<base>_<pol>_<refarea>-<correction>[_db].tif``
    for backscatter; laundered layer names otherwise) with the
    per-layer nodata (DEM → ``dem_nodata``, mask → 255, else 0).
    Atomic + idempotent like :func:`write_rasters`; returns the
    manifest Dataset.
    """
    from ..functions.names import writer_band_name, writer_nodata

    os.makedirs(out_dir, exist_ok=True)
    db = "dB" in suffix

    def _write(batch: pa.Table) -> pa.Table:
        from ..functions.tiff import encode_geotiff

        out = {"band": [], "path": [], "nodata": [], "skipped": []}
        for i in range(len(batch)):
            src_base = str(batch["src_base"][i].as_py())
            band = str(batch["band"][i].as_py())
            token = writer_band_name(band, rtc=rtc, sigma0_rtc=sigma0_rtc, db=db)
            nodata = writer_nodata(token, dem_nodata)
            name_new = src_base.replace(suffix, token) + ".tif"
            path = os.path.join(out_dir, name_new)
            out["band"].append(band)
            out["path"].append(path)
            out["nodata"].append(nodata)
            if os.path.exists(path):
                out["skipped"].append(True)
                continue
            rows = int(batch["rows"][i].as_py())
            cols = int(batch["cols"][i].as_py())
            data = np.frombuffer(batch["data"][i].as_py(), dtype=np.float32)
            blob = encode_geotiff(
                data.reshape(rows, cols),
                ulx=float(batch["ulx"][i].as_py()),
                uly=float(batch["uly"][i].as_py()),
                xres=float(batch["xres"][i].as_py()),
                yres=float(batch["yres"][i].as_py()),
                nodata=nodata,
                band_names=[token],
                tile=tile,
            )
            with open(path + ".tmp", "wb") as fh:
                fh.write(blob)
            os.rename(path + ".tmp", path)
            out["skipped"].append(False)
        return pa.table(
            {
                "band": pa.array(out["band"], type=pa.string()),
                "path": pa.array(out["path"], type=pa.string()),
                "nodata": pa.array(out["nodata"], type=pa.float64()),
                "skipped": pa.array(out["skipped"], type=pa.bool_()),
            }
        )

    return bands.map_batches(_write, batch_format="pyarrow")
