"""Date/time kernels.

Reference semantics: pyroSAR/drivers.py:2578-2606 (parse_date),
pyroSAR/ancillary.py:217-234 (seconds). Golden anchors:
``seconds('test_20151212T234411') == 3658952651.0`` and
``parse_date(datetime(2006,11,21)) == '20061121T000000'``.
"""

from __future__ import annotations

import re
from datetime import datetime

import numpy as np
import pandas as pd

STANDARD = "%Y%m%dT%H%M%S"

# the timestamp formats the reference accepts, tried in order
_FORMATS = (
    "%Y%m%dT%H%M%S",
    "%Y-%m-%dT%H:%M:%S.%f",
    "%Y-%m-%dT%H:%M:%S.%fZ",
    "%Y%m%d %H:%M:%S.%f",
    "%d-%b-%Y %H:%M:%S.%f",
    "%Y%m%d%H%M%S%f",
)

_TS15 = re.compile(r"[0-9T]{15}")
_EPOCH_1900 = datetime(1900, 1, 1)


def parse_date(x: str | datetime) -> str:
    """Normalize a timestamp to ``YYYYmmddTHHMMSS``."""
    if isinstance(x, datetime):
        return x.strftime(STANDARD)
    if not isinstance(x, str):
        raise ValueError(f"identification of time format failed: {x}")
    for fmt in _FORMATS:
        try:
            return datetime.strptime(x.strip(), fmt).strftime(STANDARD)
        except ValueError:
            continue
    raise ValueError(f"identification of time format failed: {x}")


def seconds(name: str) -> float:
    """Seconds between the first 15-char timestamp in ``name`` and 1900-01-01."""
    ts = _TS15.findall(name)[0]
    td = datetime.strptime(ts, STANDARD) - _EPOCH_1900
    return td.total_seconds()


def extract_stamp(names) -> pd.Series:
    """Vectorized extraction of the first ``YYYYmmddTHHMMSS`` stamp per name."""
    return pd.Series(names, dtype="string").str.extract(r"([0-9T]{15})", expand=False)


def seconds_array(names) -> np.ndarray:
    """Vectorized ``seconds`` over a sequence of strings (C-level strptime)."""
    stamps = extract_stamp(names)
    dt = pd.to_datetime(stamps, format=STANDARD)
    return ((dt - pd.Timestamp(_EPOCH_1900)).dt.total_seconds()).to_numpy()


_EPOCH_1985 = datetime(1985, 1, 1)
_EPOCH_2000 = datetime(2000, 1, 1)


def seconds_since_1985(stamp: str) -> float:
    """ERS auxiliary epoch: seconds since 1985-01-01
    (reference ERS/auxil.py:61-63)."""
    return (datetime.strptime(stamp, STANDARD) - _EPOCH_1985).total_seconds()


def mjd2000_to_datetime(days: int, seconds: int, microseconds: int) -> datetime:
    """ESA MJD2000 (days, seconds, µs) triplet → datetime
    (reference drivers.py:1721-1725)."""
    from datetime import timedelta

    return _EPOCH_2000 + timedelta(days=days, seconds=seconds, microseconds=microseconds)


def stamp_to_datetime64(stamps) -> np.ndarray:
    """``YYYYmmddTHHMMSS`` string sequence → datetime64[s] (vectorized)."""
    return pd.to_datetime(pd.Series(stamps), format=STANDARD).to_numpy().astype("datetime64[s]")
