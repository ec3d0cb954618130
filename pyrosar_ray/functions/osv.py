"""Sentinel-1 orbit-state-vector (EOF) filename grammar kernels.

Engine twins of the reference OSV file-management surface
(``/root/reference/pyroSAR/S1/auxil.py:114-692``), minus the network
retrieval (out of scope — no network in any deployment target):

- :data:`OSV_PATTERN_FINE` — the exact filename grammar
  (``auxil.py:125-130``): sensor, orbit type, publish stamp, validity
  start/stop stamps
- :func:`format_osv_name` / :func:`parse_osv_batch` — build/parse EOF
  names (vectorized ``str.extract``; the reference's ``_parse``)
- :func:`osv_date` — extract one date type (``OSV.date``)
- :func:`osv_subdir_batch` — the storage layout
  ``{TYPE}ORB/{sensor}/{year}/{month}`` (``OSV._subdir``)
- :func:`sort_by_date` — filename sort by an embedded stamp
  (``OSV.sortByDate``); stamps sort lexicographically, so this is a
  plain string argsort over the extracted column

All kernels operate on arrays/Series so they run per-batch inside
``map_batches`` without row loops.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

OSV_PATTERN = r"S1[ABCD]_OPER_AUX_(?:POE|RES)ORB_OPOD_[0-9TV_]{48}\.EOF"

OSV_PATTERN_FINE = (
    r"(?P<sensor>S1[ABCD])_OPER_AUX_"
    r"(?P<type>(?:POE|RES)ORB)_OPOD_"
    r"(?P<publish>[0-9]{8}T[0-9]{6})_V"
    r"(?P<start>[0-9]{8}T[0-9]{6})_"
    r"(?P<stop>[0-9]{8}T[0-9]{6})\.EOF"
)


def format_osv_name(sensor, osv_type, publish, start, stop) -> np.ndarray:
    """EOF filenames from component arrays (stamps ``YYYYmmddTHHMMSS``).

    ``osv_type`` is the 3-letter tier (``POE``/``RES``)."""
    s = pd.Series(sensor, dtype="string")
    t = pd.Series(osv_type, dtype="string")
    out = (
        s + "_OPER_AUX_" + t + "ORB_OPOD_"
        + pd.Series(publish, dtype="string") + "_V"
        + pd.Series(start, dtype="string") + "_"
        + pd.Series(stop, dtype="string") + ".EOF"
    )
    return out.to_numpy(dtype=object)


def parse_osv_batch(names) -> pd.DataFrame:
    """Vectorized EOF-name destructure (reference ``OSV._parse``).

    Non-matching names yield all-null rows."""
    s = pd.Series(names, dtype="string")
    df = s.str.extract(OSV_PATTERN_FINE)
    df["filename"] = s
    return df


def osv_date(names, datetype: str = "start") -> np.ndarray:
    """One date column from EOF names (reference ``OSV.date``)."""
    if datetype not in ("publish", "start", "stop"):
        raise ValueError(f"unknown datetype: {datetype!r}")
    return parse_osv_batch(names)[datetype].to_numpy(dtype=object)


def osv_subdir_batch(names) -> np.ndarray:
    """Storage subdirectory per file: ``{TYPE}ORB/{sensor}/{year}/{month}``
    from the validity START date (reference ``OSV._subdir``)."""
    df = parse_osv_batch(names)
    out = (
        df["type"] + "/" + df["sensor"] + "/"
        + df["start"].str.slice(0, 4) + "/" + df["start"].str.slice(4, 6)
    )
    return out.to_numpy(dtype=object)


def sort_by_date(names, datetype: str = "start") -> np.ndarray:
    """Filenames sorted ascending by an embedded stamp
    (reference ``OSV.sortByDate``; stable for equal stamps)."""
    stamps = pd.Series(osv_date(names, datetype), dtype="string")
    order = np.argsort(stamps.to_numpy(dtype=object), kind="stable")
    return np.asarray(names, dtype=object)[order]


# ------------------------------------------------------ remote URL grammar


def aux_sentinel_urls(start, stop, osv_type: str = "POE") -> list[str]:
    """Daily listing URLs of the ESA aux archive for a validity window.

    Reference skeleton (S1/auxil.py:204-233):
    ``http://aux.sentinel1.eo.esa.int/{type}ORB/{Y}/{m:02d}/{d:02d}/``,
    walked one day at a time from ``start``. The network walk stops when
    a day's listing has no file or only files past ``stop``; the
    deterministic equivalent is every day of [start, stop] inclusive.
    """
    if osv_type not in ("POE", "RES"):
        raise IOError('type must be either "POE" or "RES"')
    days = np.arange(
        np.datetime64(pd.Timestamp(start).date(), "D"),
        np.datetime64(pd.Timestamp(stop).date(), "D") + np.timedelta64(1, "D"),
    )
    stamps = pd.DatetimeIndex(days)
    return [
        f"http://aux.sentinel1.eo.esa.int/{osv_type}ORB/"
        f"{t.year}/{t.month:02d}/{t.day:02d}/"
        for t in stamps
    ]


def step_auxdata_urls(sensors, start, stop, osv_type: str = "POE") -> list[str]:
    """Monthly listing URLs of the STEP auxdata mirror.

    Reference skeleton (S1/auxil.py:245-263): ``https://step.esa.int/
    auxdata/orbits/Sentinel-1/{type}ORB/{sensor}/{Y}/{m:02d}/``, walked
    per sensor from one month BEFORE ``start``'s month (an OSV covering
    the window may be filed under the previous month) through ``stop``'s
    month. File hrefs append ``/{filename}.zip``.
    """
    if osv_type not in ("POE", "RES"):
        raise RuntimeError("osvtype must be either 'POE' or 'RES'")
    if isinstance(sensors, str):
        sensors = [sensors]
    first = pd.Timestamp(start).to_period("M") - 1
    last = pd.Timestamp(stop).to_period("M")
    months = pd.period_range(first, last, freq="M")
    return [
        f"https://step.esa.int/auxdata/orbits/Sentinel-1/{osv_type}ORB/"
        f"{sens}/{m.year}/{m.month:02d}/"
        for sens in sensors
        for m in months
    ]
