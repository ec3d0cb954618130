"""Shared helpers for the format-driver grammars."""

from __future__ import annotations

import io
import tarfile
import time
import zipfile

#: EPSG:4326 WKT — the engine's pinned rendering of the reference's
#: ``crsConvert(4326, 'wkt')`` (drivers.py:1920 etc.; exact text varies
#: by GDAL build, so the engine pins one canonical string).
WKT4326 = (
    'GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,'
    '298.257223563,AUTHORITY["EPSG","7030"]],AUTHORITY["EPSG","6326"]],'
    'PRIMEM["Greenwich",0,AUTHORITY["EPSG","8901"]],UNIT["degree",'
    '0.0174532925199433,AUTHORITY["EPSG","9122"]],'
    'AUTHORITY["EPSG","4326"]]'
)

#: the time formats the reference normalizes (drivers.py:2595-2600)
_TIME_FORMATS = (
    "%d-%b-%Y %H:%M:%S.%f",
    "%Y%m%d%H%M%S%f",
    "%Y-%m-%dT%H:%M:%S.%f",
    "%Y-%m-%dT%H:%M:%S.%fZ",
    "%Y%m%d %H:%M:%S.%f",
)


def parse_date(x: str) -> str:
    """Normalize any known product time format to ``YYYYmmddTHHMMSS``
    (reference: drivers.py:2578-2606)."""
    for fmt in _TIME_FORMATS:
        try:
            return time.strftime("%Y%m%dT%H%M%S", time.strptime(x, fmt))
        except ValueError:
            continue
    raise ValueError(f"unknown time format: {x!r}")


def stamp_to_iso(stamp: str, frac: str = "000000") -> str:
    """``YYYYmmddTHHMMSS`` → ``YYYY-mm-ddTHH:MM:SS.ffffff`` (builder side)."""
    d, t = stamp.split("T")
    return f"{d[:4]}-{d[4:6]}-{d[6:8]}T{t[:2]}:{t[2:4]}:{t[4:6]}.{frac}"


def zip_blob(members: dict[str, bytes]) -> bytes:
    """Deterministic in-memory zip of name → bytes (fixed timestamps)."""
    bio = io.BytesIO()
    with zipfile.ZipFile(bio, "w", zipfile.ZIP_DEFLATED) as zf:
        for name in sorted(members):
            info = zipfile.ZipInfo(name, date_time=(2020, 1, 1, 0, 0, 0))
            zf.writestr(info, members[name])
    return bio.getvalue()


def tar_blob(members: dict[str, bytes]) -> bytes:
    """Deterministic in-memory tar of name → bytes (fixed timestamps)."""
    bio = io.BytesIO()
    with tarfile.open(fileobj=bio, mode="w") as tf:
        for name in sorted(members):
            data = members[name]
            info = tarfile.TarInfo(name)
            info.size = len(data)
            info.mtime = 1577836800  # 2020-01-01
            tf.addfile(info, io.BytesIO(data))
    return bio.getvalue()
