"""Multilook factor grid search.

Reference semantics: pyroSAR/ancillary.py:111-214. Golden anchor:
``multilook_factors(2, 13, 10, 'SLANT_RANGE', 39) == (4, 1)``.
"""

from __future__ import annotations

from math import radians, sin

import numpy as np


def multilook_factors(
    source_rg: float,
    source_az: float,
    target: float,
    geometry: str,
    incidence: float,
) -> tuple[int, int]:
    """Pick (range looks, azimuth looks) approximating a square pixel.

    Cost = |rg_out - target'| + |az_out - target'| + |rg_out - az_out|
    minimized over a small grid; ties broken by smaller rglks+azlks.
    """
    sp_az = float(source_az)
    if geometry == "SLANT_RANGE":
        sp_rg = source_rg / sin(radians(incidence))
    elif geometry == "GROUND_RANGE":
        sp_rg = float(source_rg)
    else:
        raise ValueError("parameter 'geometry' must be either 'SLANT_RANGE' or 'GROUND_RANGE'")
    sp_target = max(sp_az, sp_rg, float(target))

    rglks_init = int(round(sp_target / sp_rg))
    azlks_init = int(round(sp_target / sp_az))

    # vectorized grid search over the candidate window
    rg = np.arange(1, rglks_init + 6, dtype=np.float64)
    az = np.arange(1, azlks_init + 6, dtype=np.float64)
    rg_out = (sp_rg * rg)[:, None]
    az_out = (sp_az * az)[None, :]
    cost = np.abs(rg_out - sp_target) + np.abs(az_out - sp_target) + np.abs(rg_out - az_out)
    looks_sum = rg[:, None] + az[None, :]
    # primary: min cost; secondary: min rglks+azlks; grid order is the
    # reference's iteration order (rg outer, az inner) so strict-< on cost
    # plus the looks tie-break reproduces its winner exactly
    best_cost = cost.min()
    cand = np.argwhere(cost == best_cost)
    sums = looks_sum[cost == best_cost]
    winner = cand[np.argmin(sums)]  # argmin keeps the first (= reference's iteration order)
    return int(rg[winner[0]]), int(az[winner[1]])
