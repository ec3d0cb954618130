"""Grouping kernels: attribute grouping and time-gap session grouping.

Reference semantics: pyroSAR/ancillary.py:40-70 (groupby) and
pyroSAR/ancillary.py:73-108 (groupbyTime — session windows where a new
group starts when the gap to the LAST element of the current group
exceeds ``time``; singleton groups are returned unwrapped).
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np

from .names import parse_datasetname


def groupby(images: list[str], attribute: str) -> list[list[str]]:
    """Group product filenames by a parsed metadata attribute (sorted runs)."""
    keyed = sorted(images, key=lambda x: parse_datasetname(x)[attribute])
    out: list[list[str]] = []
    last_key = object()
    for name in keyed:
        key = parse_datasetname(name)[attribute]
        if key == last_key:
            out[-1].append(name)
        else:
            out.append([name])
            last_key = key
    return out


def groupbyTime(
    images: list[str], function: Callable[[str], Any], time: float
) -> list[Any]:
    """Session-window grouping by time gap vs. the current group's last element."""
    srcfiles = sorted(images, key=function)
    groups = [[srcfiles[0]]]
    for item in srcfiles[1:]:
        if abs(function(item) - function(groups[-1][-1])) <= time:
            groups[-1].append(item)
        else:
            groups.append([item])
    return [g[0] if len(g) == 1 else g for g in groups]


def session_ids(ts_sorted: np.ndarray, gap: float) -> np.ndarray:
    """Vectorized session-id assignment over a SORTED timestamp array.

    A new session starts when the difference to the previous element
    exceeds ``gap`` (groupbyTime's chaining rule: for sorted input,
    gap-to-last-element == gap-to-previous). Returns int64 ids from 0.
    """
    ts = np.asarray(ts_sorted, dtype=np.float64)
    if len(ts) == 0:
        return np.zeros(0, dtype=np.int64)
    breaks = np.diff(ts) > gap
    return np.concatenate([[0], np.cumsum(breaks)]).astype(np.int64)
