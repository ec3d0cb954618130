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

from . import table_from_pandas


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
        return table_from_pandas(agg)

    return (
        rasters.map_batches(_partials, batch_format="pyarrow", batch_size=64)
        .groupby(["zone_lon", "zone_lat"])
        .aggregate(
            Sum("px_count", alias_name="px_count"),
            Sum("v_sum", alias_name="v_sum"),
            Sum("img_count", alias_name="img_count"),
        )
    )


def sample_raster(
    rasters: Dataset,
    points: Dataset,
    point_cols: tuple[str, str, str] = ("point_id", "lon", "lat"),
    id_col: str = "image_id",
    blob_col: str = "blob",
) -> Dataset:
    """Point-in-raster pixel sampling (the geospatial "extract values
    to points" op): each point is matched to every raster whose grid
    contains it and the covering pixel's value is read out of the
    decoded band. Output: (point_id, image_id, ix, iy, v) — int64.

    Plan (north-star shape):

    1. **Header probe** — container headers only (raster_info_columns,
       metadata cost) build a catalog-sized extent table.
    2. **Broadcast prune** — the extent catalog rides the existing
       broadcast cell-index spatial join, PADDED one pixel on every
       side so the join's half-open bbox convention can never drop a
       true edge hit; the point stream never shuffles here.
    3. **Co-group exchange** — candidate pairs and raster rows union
       on a typed schema and co-locate with ONE groupby(image) sort
       exchange, so each blob moves once and is decoded once per
       group — never duplicated per point (a pair-side equi-join
       would copy the blob onto every point row).
    4. **Vectorized lookup** — exact half-open containment
       ``ix = floor((lon-ulx)/xres) in [0, samples)`` (top/left edges
       in, bottom/right out) decides inside the kernel; nodata pixels
       drop.
    """
    from .images import raster_info_columns
    from .spatial import spatial_join_points

    pid, plon, plat = point_cols
    headers = raster_info_columns(rasters, blob_col=blob_col, id_col=id_col)

    def _extent(batch: pa.Table) -> pa.Table:
        ulx = batch["ulx"].to_numpy()
        uly = batch["uly"].to_numpy()
        xres = batch["xres"].to_numpy()
        yres = batch["yres"].to_numpy()
        w = batch["samples"].to_numpy()
        h = batch["lines"].to_numpy()
        return pa.table(
            {
                "scene_key": batch[id_col],
                "xmin": pa.array(ulx - xres),
                "xmax": pa.array(ulx + (w + 1) * xres),
                "ymin": pa.array(uly - (h + 1) * yres),
                "ymax": pa.array(uly + yres),
            }
        )

    extents = headers.map_batches(_extent, batch_format="pyarrow")
    pairs = spatial_join_points(
        extents, points, point_cols=(pid, plon, plat), strategy="broadcast"
    )

    def _pair_side(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table(
            {
                id_col: batch["scene_key"].combine_chunks().cast(pa.int64()),
                pid: batch[pid].combine_chunks().cast(pa.int64()),
                plon: batch[plon],
                plat: batch[plat],
                blob_col: pa.array([None] * n, type=pa.binary()),
            }
        )

    def _raster_side(batch: pa.Table) -> pa.Table:
        n = len(batch)
        null_i = pa.array([None] * n, type=pa.int64())
        null_f = pa.array([None] * n, type=pa.float64())
        return pa.table(
            {
                id_col: batch[id_col].combine_chunks().cast(pa.int64()),
                pid: null_i,
                plon: null_f,
                plat: null_f,
                blob_col: batch[blob_col],
            }
        )

    unioned = pairs.map_batches(_pair_side, batch_format="pyarrow").union(
        rasters.map_batches(_raster_side, batch_format="pyarrow")
    )

    def _lookup(group) -> pa.Table:
        import pandas as pd

        empty = pa.table(
            {
                pid: pa.array([], type=pa.int64()),
                id_col: pa.array([], type=pa.int64()),
                "ix": pa.array([], type=pa.int64()),
                "iy": pa.array([], type=pa.int64()),
                "v": pa.array([], type=pa.int64()),
            }
        )
        blobs = group[blob_col].dropna()
        pts = group[group[pid].notna()]
        if not len(blobs) or not len(pts):
            return empty
        info = decode_geotiff(blobs.iloc[0])
        data = info["data"][0]
        h, w = data.shape
        lon = pts[plon].to_numpy(dtype=np.float64)
        lat = pts[plat].to_numpy(dtype=np.float64)
        ix = np.floor((lon - info["ulx"]) / info["xres"]).astype(np.int64)
        iy = np.floor((info["uly"] - lat) / info["yres"]).astype(np.int64)
        ok = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
        ix, iy = ix[ok], iy[ok]
        v = data[iy, ix]
        if info["nodata"] is not None:
            valid = v != info["nodata"]
            ix, iy, v = ix[valid], iy[valid], v[valid]
            ok[np.flatnonzero(ok)[~valid]] = False
        return pa.table(
            {
                pid: pa.array(pts[pid].to_numpy(dtype=np.int64)[ok]),
                id_col: pa.array(
                    np.full(int(ok.sum()), int(group[id_col].iloc[0]), dtype=np.int64)
                ),
                "ix": pa.array(ix),
                "iy": pa.array(iy),
                "v": pa.array(np.rint(v.astype(np.float64)).astype(np.int64)),
            }
        )

    return unioned.groupby(id_col).map_groups(_lookup, batch_format="pandas")


def label_regions(mask: np.ndarray) -> np.ndarray:
    """4-connected component labels over a boolean mask; each region is
    labeled by the MINIMUM linear index (y·w + x) it contains (a
    canonical, orientation-free label). Iterative vectorized min
    propagation — converges in O(component diameter) whole-array
    passes, each one four shifted ``np.minimum`` ops; fine for tile-
    sized rasters (a production run labels per tile, not per scene).
    Returns int64 labels, -1 outside the mask."""
    h, w = mask.shape
    labels = np.where(
        mask, np.arange(h * w, dtype=np.int64).reshape(h, w), np.int64(-1)
    )
    big = np.int64(h * w)
    cur = np.where(mask, labels, big)
    while True:
        nxt = cur.copy()
        nxt[1:, :] = np.minimum(nxt[1:, :], cur[:-1, :])
        nxt[:-1, :] = np.minimum(nxt[:-1, :], cur[1:, :])
        nxt[:, 1:] = np.minimum(nxt[:, 1:], cur[:, :-1])
        nxt[:, :-1] = np.minimum(nxt[:, :-1], cur[:, 1:])
        nxt = np.where(mask, nxt, big)
        if np.array_equal(nxt, cur):
            break
        cur = nxt
    return np.where(mask, cur, np.int64(-1))


#: Marching-squares segment templates. Cell corners are the four pixel
#: CENTERS (TL, TR, BR, BL) of a 2×2 window; the case code packs the
#: above-threshold bits as TL=8, TR=4, BR=2, BL=1. Segment endpoints sit
#: at edge MIDPOINTS, expressed in half-grid integers (coordinates
#: doubled so midpoints stay exact): relative to cell (y, x) the
#: midpoints are T=(0,1), R=(1,2), B=(2,1), L=(1,0). Saddle cases 5/10
#: use the fixed convention (no center-value disambiguation):
#: 5 (TR+BL) → (T,R)+(B,L), 10 (TL+BR) → (T,L)+(B,R). Rows of the
#: table: code → ((dy0,dx0,dy1,dx1), ...) in template endpoint order.
_MS_SEGMENTS: dict[int, tuple[tuple[int, int, int, int], ...]] = {
    0: (), 15: (),
    1: ((1, 0, 2, 1),), 14: ((1, 0, 2, 1),),      # L-B
    2: ((2, 1, 1, 2),), 13: ((2, 1, 1, 2),),      # B-R
    3: ((1, 0, 1, 2),), 12: ((1, 0, 1, 2),),      # L-R
    4: ((0, 1, 1, 2),), 11: ((0, 1, 1, 2),),      # T-R
    6: ((0, 1, 2, 1),), 9: ((0, 1, 2, 1),),       # T-B
    7: ((0, 1, 1, 0),), 8: ((0, 1, 1, 0),),       # T-L
    5: ((0, 1, 1, 2), (2, 1, 1, 0)),              # saddle: T-R, B-L
    10: ((0, 1, 1, 0), (2, 1, 1, 2)),             # saddle: T-L, B-R
}

# dense lookup arrays for the vectorized kernel: first segment for every
# non-trivial code, second segment only for the saddles
_MS_T1 = np.full((16, 4), -1, dtype=np.int64)
_MS_T2 = np.full((16, 4), -1, dtype=np.int64)
for _code, _segs in _MS_SEGMENTS.items():
    if _segs:
        _MS_T1[_code] = _segs[0]
    if len(_segs) > 1:
        _MS_T2[_code] = _segs[1]


def marching_squares(mask: np.ndarray) -> np.ndarray:
    """Contour segments of a boolean mask as an (n, 7) int64 array of
    (cell_y, cell_x, code, y0, x0, y1, x1) rows — endpoints on the
    half-grid (doubled coordinates). Fully vectorized: one shift-add
    for the case codes, template gathers for the segments."""
    b = mask.astype(np.int64)
    code = 8 * b[:-1, :-1] + 4 * b[:-1, 1:] + 2 * b[1:, 1:] + b[1:, :-1]
    cy, cx = np.nonzero((code != 0) & (code != 15))
    c = code[cy, cx]
    rows = [np.column_stack([cy, cx, c, _MS_T1[c]])]
    sad = (c == 5) | (c == 10)
    if sad.any():
        rows.append(
            np.column_stack([cy[sad], cx[sad], c[sad], _MS_T2[c[sad]]])
        )
    out = np.concatenate(rows, axis=0)
    # offsets → absolute half-grid endpoints
    out[:, 3] += 2 * out[:, 0]
    out[:, 5] += 2 * out[:, 0]
    out[:, 4] += 2 * out[:, 1]
    out[:, 6] += 2 * out[:, 1]
    return out


def raster_contours(
    rasters: Dataset, threshold: float = 50.0, id_col: str = "image_id"
) -> Dataset:
    """Iso-contour extraction (marching squares) over decoded rasters —
    the raster→vector polyline primitive complementing
    :func:`raster_regions` (which vectorizes areas). Threshold the band
    (nodata counts as below, like the region mask), compute the 16-case
    code per 2×2 pixel window, emit one row per contour segment with
    exact half-grid integer endpoints. Row-local per raster — a pure
    streaming scan, zero shuffle; pixel work is one vectorized
    shift-add + template gather per raster.

    Rows: (image_id, cell_y, cell_x, code, y0, x0, y1, x1); endpoint
    coordinates are doubled (half-grid) so edge midpoints stay integer.
    """
    cols = ["image_id", "cell_y", "cell_x", "code", "y0", "x0", "y1", "x1"]

    def _contours(batch: pa.Table) -> pa.Table:
        parts, ids = [], []
        for img_id, blob in zip(
            batch[id_col].to_pylist(), batch["blob"].to_pylist()
        ):
            info = decode_geotiff(blob)
            data = info["data"][0]
            mask = data >= threshold
            if info["nodata"] is not None:
                mask &= data != info["nodata"]
            segs = marching_squares(mask)
            if len(segs):
                parts.append(segs)
                ids.append(np.full(len(segs), img_id, dtype=np.int64))
        if not parts:
            return pa.table({c: pa.array([], type=pa.int64()) for c in cols})
        allseg = np.concatenate(parts, axis=0)
        allid = np.concatenate(ids)
        return pa.table(
            {"image_id": pa.array(allid)}
            | {c: pa.array(allseg[:, i]) for i, c in enumerate(cols[1:])}
        )

    return rasters.map_batches(_contours, batch_format="pyarrow")


def _halve(s: np.ndarray, c: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """One pyramid level: 2×2 block-sum of (sum, count) planes with
    zero-padding to even dims (GDAL's ceil(dim/2) overview sizing)."""
    h, w = s.shape
    h2, w2 = (h + 1) // 2, (w + 1) // 2
    sp = np.zeros((h2 * 2, w2 * 2), dtype=np.int64)
    cp = np.zeros_like(sp)
    sp[:h, :w] = s
    cp[:h, :w] = c
    return (
        sp.reshape(h2, 2, w2, 2).sum(axis=(1, 3)),
        cp.reshape(h2, 2, w2, 2).sum(axis=(1, 3)),
    )


def raster_pyramid(
    rasters: Dataset, levels: int = 3, id_col: str = "image_id"
) -> Dataset:
    """COG-style overview pyramid: cascaded 2× reductions of the decoded
    band, carried as exact integer ``(sum, count)`` planes so the
    nodata-aware mean at any level is a lossless pair, never a rounded
    float — the associativity that makes overview building a
    pre-aggregation (level k's blocks are sums of level k-1's blocks,
    and equal one grouping of the base pixels by ``y>>k, x>>k``).
    Row-local per raster, zero shuffle.

    Rows per (raster, level): level dims, ``n_cells`` (cells with ≥1
    valid pixel), ``px_sum`` (total valid-pixel sum — level-invariant by
    construction, a built-in conservation check), and two
    position-weighted checksums (``Σ sum_cell·(idx+1)``,
    ``Σ count_cell·(idx+1)``) that pin every cell of the level grid.
    """
    cols = [
        "image_id", "level", "w", "h", "n_cells",
        "px_sum", "sum_checksum", "cnt_checksum",
    ]

    def _pyr(batch: pa.Table) -> pa.Table:
        out: dict[str, list[int]] = {c: [] for c in cols}
        for img_id, blob in zip(
            batch[id_col].to_pylist(), batch["blob"].to_pylist()
        ):
            info = decode_geotiff(blob)
            data = info["data"][0]
            valid = (
                np.ones_like(data, dtype=bool)
                if info["nodata"] is None
                else data != info["nodata"]
            )
            s = np.where(valid, np.rint(data.astype(np.float64)), 0).astype(
                np.int64
            )
            c = valid.astype(np.int64)
            for level in range(1, levels + 1):
                s, c = _halve(s, c)
                h, w = s.shape
                idx = np.arange(1, h * w + 1, dtype=np.int64).reshape(h, w)
                out["image_id"].append(img_id)
                out["level"].append(level)
                out["w"].append(w)
                out["h"].append(h)
                out["n_cells"].append(int((c > 0).sum()))
                out["px_sum"].append(int(s.sum()))
                out["sum_checksum"].append(int((s * idx).sum()))
                out["cnt_checksum"].append(int((c * idx).sum()))
        return pa.table({k: pa.array(v, type=pa.int64()) for k, v in out.items()})

    return rasters.map_batches(_pyr, batch_format="pyarrow")


def raster_regions(
    rasters: Dataset, threshold: float = 50.0, id_col: str = "image_id"
) -> Dataset:
    """Connected-region extraction over decoded rasters (the SAR
    water-mask / change-blob primitive): threshold the band (nodata
    excluded), label 4-connected regions, emit per-region stats.
    Row-local per raster — a pure streaming scan, zero shuffle.

    Rows: (image_id, label, n_pixels, min_y, min_x, max_y, max_x),
    label = the region's minimum linear pixel index.
    """

    def _regions(batch: pa.Table) -> pa.Table:
        import pandas as pd

        out = []
        ids = batch[id_col].to_pylist()
        for img_id, blob in zip(ids, batch["blob"].to_pylist()):
            info = decode_geotiff(blob)
            data = info["data"][0]
            nodata = info["nodata"]
            mask = data >= threshold
            if nodata is not None:
                mask &= data != nodata
            labels = label_regions(mask)
            h, w = mask.shape
            flat = labels.ravel()
            sel = flat >= 0
            if not sel.any():
                continue
            ys, xs = np.divmod(np.flatnonzero(sel), w)
            df = pd.DataFrame({"label": flat[sel], "y": ys, "x": xs})
            agg = df.groupby("label").agg(
                n_pixels=("label", "size"),
                min_y=("y", "min"), min_x=("x", "min"),
                max_y=("y", "max"), max_x=("x", "max"),
            ).reset_index()
            agg.insert(0, "image_id", img_id)
            out.append(agg)
        if not out:
            return pa.table(
                {
                    "image_id": pa.array([], type=pa.int64()),
                    "label": pa.array([], type=pa.int64()),
                    "n_pixels": pa.array([], type=pa.int64()),
                    "min_y": pa.array([], type=pa.int64()),
                    "min_x": pa.array([], type=pa.int64()),
                    "max_y": pa.array([], type=pa.int64()),
                    "max_x": pa.array([], type=pa.int64()),
                }
            )
        import pandas as pd

        return table_from_pandas(
            pd.concat(out, ignore_index=True).astype("int64")
        )

    return rasters.map_batches(_regions, batch_format="pyarrow")
