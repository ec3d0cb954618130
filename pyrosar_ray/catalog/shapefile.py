"""Pure-Python ESRI Shapefile writer (Archive.export2shp without GDAL).

The reference exports its catalog through ``gdal.VectorTranslate``
(``/root/reference/pyroSAR/archive.py:668-715``), including a 10-char
DBF column-name laundering map. GDAL is absent in this environment, and
the ESRI Shapefile format is a fixed public spec (ESRI whitepaper,
1998), so the engine writes the four sidecar files directly:

- ``.shp`` — 100-byte header + one POLYGON record per row (outer ring
  clockwise, closed);
- ``.shx`` — the record-offset index;
- ``.dbf`` — dBASE III attribute table (``C`` for strings, ``N`` for
  numbers, names laundered exactly like the reference and truncated to
  the format's 10-character limit);
- ``.prj`` — the EPSG:4326 WKT.

Geometry comes from the catalog's bbox columns (every footprint in the
catalog is stored with its extent); attribute columns are everything
else. All byte packing is vectorized-enough for catalog-sized tables
(the export is a driver-side small-side dump, same as the reference's).
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pandas as pd

#: reference launder map (archive.py:694-699) — DBF names are <= 10 chars
LAUNDER_NAMES = {
    "acquisition_mode": "acq_mode",
    "orbitNumber_abs": "orbit_abs",
    "orbitNumber_rel": "orbit_rel",
    "cycleNumber": "cycleNr",
    "frameNumber": "frameNr",
    "outname_base": "outname",
}

_WGS84_PRJ = (
    'GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",SPHEROID["WGS_1984",'
    '6378137.0,298.257223563]],PRIMEM["Greenwich",0.0],'
    'UNIT["Degree",0.0174532925199433]]'
)


def _launder(name: str) -> str:
    return LAUNDER_NAMES.get(name, name)[:10]


def _polygon_record(xmin, ymin, xmax, ymax) -> bytes:
    """One POLYGON content block: bbox ring, clockwise, closed."""
    ring = [
        (xmin, ymin), (xmin, ymax), (xmax, ymax), (xmax, ymin), (xmin, ymin)
    ]
    content = struct.pack("<i", 5)  # shape type: polygon
    content += struct.pack("<4d", xmin, ymin, xmax, ymax)
    content += struct.pack("<2i", 1, len(ring))  # numparts, numpoints
    content += struct.pack("<i", 0)  # part 0 starts at point 0
    for x, y in ring:
        content += struct.pack("<2d", x, y)
    return content


def _dbf_fields(df: pd.DataFrame) -> list[tuple[str, str, int, int]]:
    fields = []
    for col in df.columns:
        s = df[col]
        if pd.api.types.is_integer_dtype(s):
            fields.append((_launder(col), "N", 18, 0))
        elif pd.api.types.is_float_dtype(s):
            fields.append((_launder(col), "N", 24, 15))
        else:
            width = int(min(max(s.astype(str).str.len().max() or 1, 1), 254))
            fields.append((_launder(col), "C", width, 0))
    return fields


def _dbf_bytes(df: pd.DataFrame) -> bytes:
    fields = _dbf_fields(df)
    header_size = 32 + 32 * len(fields) + 1
    record_size = 1 + sum(w for _, _, w, _ in fields)
    out = bytearray()
    out += struct.pack(
        "<BBBBIHH20x", 0x03, 26, 8, 17, len(df), header_size, record_size
    )
    for name, typ, width, dec in fields:
        out += struct.pack(
            "<11sc4xBB14x", name.encode("ascii"), typ.encode("ascii"), width, dec
        )
    out += b"\x0d"
    for _, row in df.iterrows():
        out += b" "
        for (name, typ, width, dec), col in zip(fields, df.columns):
            v = row[col]
            if typ == "N":
                if dec:
                    text = f"{float(v):.{dec}f}"[:width].rjust(width)
                else:
                    text = str(int(v))[:width].rjust(width)
            else:
                text = str(v)[:width].ljust(width)
            out += text.encode("ascii", "replace")
    out += b"\x1a"
    return bytes(out)


def write_shapefile(
    df: pd.DataFrame,
    path: str,
    bbox_cols: tuple[str, str, str, str] = ("xmin", "ymin", "xmax", "ymax"),
) -> str:
    """Write ``df`` as ``path``(.shp/.shx/.dbf/.prj); returns the .shp path.

    Rows become bbox POLYGON features; all non-bbox columns become DBF
    attributes (laundered names). Mirrors the reference's
    ``export2shp`` ergonomics: the extension is appended when missing
    and parent directories are created.
    """
    if not path.endswith(".shp"):
        path += ".shp"
    dirname = os.path.dirname(path)
    if dirname:
        os.makedirs(dirname, exist_ok=True)

    xs0 = df[bbox_cols[0]].to_numpy(dtype=np.float64)
    ys0 = df[bbox_cols[1]].to_numpy(dtype=np.float64)
    xs1 = df[bbox_cols[2]].to_numpy(dtype=np.float64)
    ys1 = df[bbox_cols[3]].to_numpy(dtype=np.float64)

    records = [
        _polygon_record(xs0[i], ys0[i], xs1[i], ys1[i]) for i in range(len(df))
    ]
    shp = bytearray()
    shx = bytearray()
    offset_words = 50  # header = 100 bytes
    body = bytearray()
    for i, content in enumerate(records):
        words = len(content) // 2
        body += struct.pack(">2i", i + 1, words) + content
        shx += struct.pack(">2i", offset_words, words)
        offset_words += 4 + words

    if len(df):
        bbox = (xs0.min(), ys0.min(), xs1.max(), ys1.max())
    else:
        bbox = (0.0, 0.0, 0.0, 0.0)

    def _header(total_bytes: int) -> bytes:
        head = struct.pack(">i20xi", 9994, total_bytes // 2)
        head += struct.pack("<2i", 1000, 5)
        head += struct.pack("<4d", *bbox)
        head += struct.pack("<4d", 0.0, 0.0, 0.0, 0.0)  # z/m ranges
        return head

    shp = _header(100 + len(body)) + bytes(body)
    shx_full = _header(100 + len(shx)) + bytes(shx)

    attrs = df.drop(columns=list(bbox_cols))
    with open(path, "wb") as fh:
        fh.write(shp)
    with open(path[:-4] + ".shx", "wb") as fh:
        fh.write(shx_full)
    with open(path[:-4] + ".dbf", "wb") as fh:
        fh.write(_dbf_bytes(attrs))
    with open(path[:-4] + ".prj", "w") as fh:
        fh.write(_WGS84_PRJ)
    return path


def read_shapefile(path: str) -> pd.DataFrame:
    """Minimal reader for round-trip verification: bbox per feature +
    DBF attributes. Not a general SHP reader — polygons written by
    :func:`write_shapefile` only."""
    with open(path, "rb") as fh:
        data = fh.read()
    pos = 100
    rows = []
    while pos < len(data):
        _, words = struct.unpack(">2i", data[pos : pos + 8])
        content = data[pos + 8 : pos + 8 + words * 2]
        xmin, ymin, xmax, ymax = struct.unpack("<4d", content[4:36])
        rows.append({"xmin": xmin, "ymin": ymin, "xmax": xmax, "ymax": ymax})
        pos += 8 + words * 2
    geo = pd.DataFrame(rows)

    with open(path[:-4] + ".dbf", "rb") as fh:
        dbf = fh.read()
    nrec, hsize, rsize = struct.unpack("<IHH", dbf[4:12])
    fields = []
    fpos = 32
    while dbf[fpos] != 0x0D:
        name = dbf[fpos : fpos + 11].split(b"\x00")[0].decode()
        typ = chr(dbf[fpos + 11])
        width = dbf[fpos + 16]
        fields.append((name, typ, width))
        fpos += 32
    recs = []
    for i in range(nrec):
        start = hsize + i * rsize + 1
        rec = {}
        off = start
        for name, typ, width in fields:
            raw = dbf[off : off + width].decode("ascii").strip()
            rec[name] = (
                (float(raw) if "." in raw else int(raw)) if typ == "N" and raw else raw
            )
            off += width
        recs.append(rec)
    attrs = pd.DataFrame(recs)
    return pd.concat([geo, attrs], axis=1)
