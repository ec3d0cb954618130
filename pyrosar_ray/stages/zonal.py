"""Zonal statistics: raster pixels aggregated into vector zones.

The classic geospatial map-algebra reduction (reference shape: the
pixel-area / gc_map normalization stages feeding per-region stats,
gamma geocode chain) expressed Ray-Data-first: decode each raster
batch, assign every valid pixel's CENTER to a zone (here the integer
degree cell of the pixel center — the same 1° tiling the HGT/DEM
stages use), pre-aggregate per zone INSIDE the batch, then merge the
bounded partials with one small ``groupby().aggregate(Sum)``.

Scale shape: the exchange carries one row per (batch, zone) — zones
touched per scene are O(extent/zone size), so the shuffle is
catalog-sized, never pixel-sized. Pixel work is one vectorized
meshgrid + bincount per raster; nodata pixels drop before aggregation.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset
from ray.data.aggregate import Sum

from ..functions.tiff import decode_geotiff


def zonal_stats(
    rasters: Dataset,
    blob_col: str = "blob",
) -> Dataset:
    """Per-1°-zone pixel statistics over a GeoTIFF blob table.

    Input rows carry encoded GeoTIFF bytes (geotransform + nodata read
    from the container, not trusted from the table). Output: one row
    per (zone_lon, zone_lat) with ``px_count`` (valid pixels),
    ``v_sum`` (integer pixel-value sum) and ``img_count`` (rasters
    touching the zone).

    Zone assignment is by pixel CENTER: ``floor(ulx + (x+0.5)*xres)``,
    ``floor(uly - (y+0.5)*yres)`` — exact when the geotransform is
    dyadic, matching the center-sample rasterize contract
    (stages/footprint.rasterize_quads).
    """

    def _partials(batch: pa.Table) -> pa.Table:
        zl_all, zb_all, cnt_all, sum_all, img_all = [], [], [], [], []
        for blob in batch[blob_col].to_pylist():
            info = decode_geotiff(blob)
            data = info["data"][0]
            h, w = data.shape
            nodata = info["nodata"]
            valid = (
                np.ones((h, w), dtype=bool) if nodata is None else data != nodata
            )
            x = np.arange(w, dtype=np.float64)
            y = np.arange(h, dtype=np.float64)
            zlon = np.floor(info["ulx"] + (x + 0.5) * info["xres"]).astype(np.int64)
            zlat = np.floor(info["uly"] - (y + 0.5) * info["yres"]).astype(np.int64)
            # per-raster zone partials via one bincount over dense zone ids
            zx = zlon[None, :].repeat(h, axis=0)[valid]
            zy = zlat[:, None].repeat(w, axis=1)[valid]
            if not len(zx):
                continue
            key = (zy - zy.min()) * (zx.max() - zx.min() + 1) + (zx - zx.min())
            uniq, inv = np.unique(key, return_inverse=True)
            cnt = np.bincount(inv, minlength=len(uniq))
            vs = np.bincount(
                inv, weights=data[valid].astype(np.float64), minlength=len(uniq)
            )
            nx = zx.max() - zx.min() + 1
            zl_all.append(uniq % nx + zx.min())
            zb_all.append(uniq // nx + zy.min())
            cnt_all.append(cnt.astype(np.int64))
            sum_all.append(np.rint(vs).astype(np.int64))
            img_all.append(np.ones(len(uniq), dtype=np.int64))
        if not zl_all:
            e = pa.array([], type=pa.int64())
            return pa.table(
                {
                    "zone_lon": e,
                    "zone_lat": e,
                    "px_count": e,
                    "v_sum": e,
                    "img_count": e,
                }
            )
        # combine across the batch's rasters so the exchange sees one
        # row per (batch, zone) — img_count sums exactly because each
        # raster row lives in exactly one batch
        import pandas as pd

        df = pd.DataFrame(
            {
                "zone_lon": np.concatenate(zl_all),
                "zone_lat": np.concatenate(zb_all),
                "px_count": np.concatenate(cnt_all),
                "v_sum": np.concatenate(sum_all),
                "img_count": np.concatenate(img_all),
            }
        )
        agg = (
            df.groupby(["zone_lon", "zone_lat"], as_index=False)
            .sum()
            .astype(np.int64)
        )
        return pa.Table.from_pandas(agg, preserve_index=False)

    return (
        rasters.map_batches(_partials, batch_format="pyarrow", batch_size=64)
        .groupby(["zone_lon", "zone_lat"])
        .aggregate(
            Sum("px_count", alias_name="px_count"),
            Sum("v_sum", alias_name="v_sum"),
            Sum("img_count", alias_name="img_count"),
        )
    )
