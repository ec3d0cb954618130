"""GDAL-free VRT mosaic XML: the reference's ``__buildvrt`` contract.

pyroSAR crops a DEM tile mosaic to a target extent WITHOUT resampling —
the VRT preserves the source pixel grid and simply windows each tile
into the output (reference ``auxdata.py:532-604``); ``tap`` aligns the
output bounds to the resolution grid (gdalbuildvrt
``targetAlignedPixels``), ``dst_datatype`` rewrites the band's
``dataType`` attribute after the build (``auxdata.py:600-604``), and
``vrt_check_sources`` (``auxdata.py:1716-1740``) validates that every
``SourceFilename`` in an existing VRT resolves to a file.

GDAL is absent in this container, so the XML is emitted directly — the
element layout (VRTDataset/GeoTransform/VRTRasterBand/ComplexSource
with SrcRect/DstRect) follows the public VRT format description. The
build itself is a driver-side epilogue over the (bounded) manifest a
raster sink returns: one small XML per mosaic, exactly like the
reference's gdalbuildvrt call.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

import numpy as np

#: numpy dtype name → GDAL type name (the reference's spatialist Dtype map)
GDAL_DTYPES = {
    "uint8": "Byte",
    "int16": "Int16",
    "uint16": "UInt16",
    "int32": "Int32",
    "uint32": "UInt32",
    "float32": "Float32",
    "float64": "Float64",
}

_WGS84_WKT = (
    'GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,'
    '298.257223563]],PRIMEM["Greenwich",0],UNIT["degree",'
    '0.0174532925199433],AUTHORITY["EPSG","4326"]]'
)


def _fmt(v: float) -> str:
    return repr(float(v))


def tap_bounds(extent: dict, xres: float, yres: float) -> dict:
    """gdalbuildvrt ``targetAlignedPixels``: expand the bounds outward
    to the next multiple of the resolution (floor mins, ceil maxs)."""
    return {
        "xmin": np.floor(extent["xmin"] / xres) * xres,
        "ymin": np.floor(extent["ymin"] / yres) * yres,
        "xmax": np.ceil(extent["xmax"] / xres) * xres,
        "ymax": np.ceil(extent["ymax"] / yres) * yres,
    }


def build_vrt(
    tiles: list[str],
    vrtfile: str,
    extent: dict,
    src_nodata: "int | float | None" = None,
    dst_nodata: "int | float | None" = None,
    hide_nodata: bool = False,
    resolution: "tuple[float, float] | None" = None,
    tap: bool = True,
    dst_datatype: "str | None" = None,
    headers: "list[dict] | None" = None,
) -> str:
    """Write a VRT windowing ``tiles`` into ``extent``; returns the path.

    ``tiles`` are GeoTIFF files our codec can probe; ``headers`` lets a
    caller that already holds the manifest rows (ulx/uly/xres/yres/
    nodata/rows/cols/dtype per tile) skip the re-read. Defaults mirror
    the reference: ``src_nodata``/``resolution`` come from the FIRST
    tile; ``dst_nodata=None`` leaves the source nodata in effect.
    """
    if not tiles:
        raise ValueError("build_vrt needs at least one tile")
    if headers is None:
        from .tiff import decode_geotiff

        headers = []
        for path in tiles:
            with open(path, "rb") as fh:
                info = decode_geotiff(fh.read())
            headers.append(
                {
                    "ulx": info["ulx"],
                    "uly": info["uly"],
                    "xres": info["xres"],
                    "yres": info["yres"],
                    "nodata": info["nodata"],
                    "rows": info["data"].shape[1],
                    "cols": info["data"].shape[2],
                    "dtype": str(info["data"].dtype),
                }
            )
    if src_nodata is None:
        src_nodata = headers[0].get("nodata")
    if resolution is None:
        xres, yres = float(headers[0]["xres"]), float(headers[0]["yres"])
    else:
        xres, yres = float(resolution[0]), float(resolution[1])
    ext = tap_bounds(extent, xres, yres) if tap else dict(extent)
    xsize = int(round((ext["xmax"] - ext["xmin"]) / xres))
    ysize = int(round((ext["ymax"] - ext["ymin"]) / yres))

    root = ET.Element(
        "VRTDataset", rasterXSize=str(xsize), rasterYSize=str(ysize)
    )
    srs = ET.SubElement(root, "SRS", dataAxisToSRSAxisMapping="2,1")
    srs.text = _WGS84_WKT
    gt = ET.SubElement(root, "GeoTransform")
    gt.text = ", ".join(
        _fmt(v) for v in (ext["xmin"], xres, 0.0, ext["ymax"], 0.0, -yres)
    )
    dtype = (
        GDAL_DTYPES[dst_datatype.lower()]
        if dst_datatype is not None
        else GDAL_DTYPES.get(str(headers[0].get("dtype", "float32")), "Float32")
    )
    band = ET.SubElement(root, "VRTRasterBand", dataType=dtype, band="1")
    nodata_out = dst_nodata if dst_nodata is not None else src_nodata
    if nodata_out is not None:
        nd = ET.SubElement(band, "NoDataValue")
        nd.text = _fmt(nodata_out)
        if hide_nodata:
            hide = ET.SubElement(band, "HideNoDataValue")
            hide.text = "1"

    vrt_dir = os.path.dirname(os.path.abspath(vrtfile))
    for path, hdr in zip(tiles, headers):
        t_ulx, t_uly = float(hdr["ulx"]), float(hdr["uly"])
        t_cols, t_rows = int(hdr["cols"]), int(hdr["rows"])
        # georeferenced intersection of tile and output extents
        ixmin = max(ext["xmin"], t_ulx)
        ixmax = min(ext["xmax"], t_ulx + t_cols * xres)
        iymax = min(ext["ymax"], t_uly)
        iymin = max(ext["ymin"], t_uly - t_rows * yres)
        if ixmin >= ixmax or iymin >= iymax:
            continue  # tile outside the crop — gdalbuildvrt drops it too
        src_x = int(round((ixmin - t_ulx) / xres))
        src_y = int(round((t_uly - iymax) / yres))
        w = int(round((ixmax - ixmin) / xres))
        h = int(round((iymax - iymin) / yres))
        dst_x = int(round((ixmin - ext["xmin"]) / xres))
        dst_y = int(round((ext["ymax"] - iymax) / yres))
        tag = "ComplexSource" if src_nodata is not None else "SimpleSource"
        source = ET.SubElement(band, tag)
        fn_abs = os.path.abspath(path)
        relative = os.path.dirname(fn_abs) == vrt_dir
        fn = ET.SubElement(
            source, "SourceFilename", relativeToVRT="1" if relative else "0"
        )
        fn.text = os.path.basename(fn_abs) if relative else fn_abs
        sb = ET.SubElement(source, "SourceBand")
        sb.text = "1"
        ET.SubElement(
            source,
            "SourceProperties",
            RasterXSize=str(t_cols),
            RasterYSize=str(t_rows),
            DataType=dtype,
        )
        ET.SubElement(
            source,
            "SrcRect",
            xOff=str(src_x),
            yOff=str(src_y),
            xSize=str(w),
            ySize=str(h),
        )
        ET.SubElement(
            source,
            "DstRect",
            xOff=str(dst_x),
            yOff=str(dst_y),
            xSize=str(w),
            ySize=str(h),
        )
        if src_nodata is not None:
            nd = ET.SubElement(source, "NODATA")
            nd.text = _fmt(src_nodata)

    ET.indent(root)
    tmp = vrtfile + ".tmp"
    ET.ElementTree(root).write(tmp, encoding="utf-8", xml_declaration=False)
    os.replace(tmp, vrtfile)  # atomic, like every sidecar in this engine
    return vrtfile


def vrt_check_sources(fname: str) -> None:
    """Validate every SourceFilename of an existing VRT resolves to a
    file (reference ``vrt_check_sources``, auxdata.py:1716 — same
    error types and message)."""
    if not os.path.isfile(fname):
        return
    tree = ET.parse(fname)
    for el in tree.findall(".//SourceFilename"):
        source = el.text
        if source is None:
            raise ValueError("encountered None value as source file name")
        if not os.path.isabs(source):
            source = os.path.normpath(
                os.path.join(os.path.dirname(fname), source)
            )
        if not os.path.isfile(source):
            raise RuntimeError(f"missing VRT source file: {source}")
