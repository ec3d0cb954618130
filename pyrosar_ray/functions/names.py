"""Product-name grammar kernels.

Reference semantics: outname_base (pyroSAR/drivers.py:584-608), the
``pyrosar`` filename regex (pyroSAR/patterns.py:18-28) and
parse_datasetname (pyroSAR/ancillary.py:237-279).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

# same grammar as the reference's unified naming scheme:
# sensor(<=4, '_'-padded) _ mode(<=4) _ orbit(A|D) _ start(15) [_ extensions]
# [_ polarization _ proc_steps] [.tif|.nc]
PYROSAR_PATTERN = (
    r"(?:.*[/\\]|)"
    r"(?P<outname_base>"
    r"(?P<sensor>[A-Z0-9]{1,4})_+"
    r"(?P<acquisition_mode>[A-Z0-9]{1,4})_+"
    r"(?P<orbit>[AD])_"
    r"(?P<start>[0-9T]{15})"
    r"(?:_(?P<extensions>\w*?)|)"
    r")_*"
    r"(?:(?P<polarization>[HV]{2})_"
    r"(?P<proc_steps>[\w-]*)|)"
    r"(?P<filetype>(?:.tif|.nc|))$"
)

_PYROSAR_RE = re.compile(PYROSAR_PATTERN)


def outname_base(sensor: str, acquisition_mode: str, orbit: str, start: str) -> str:
    """Standardized scene identity string, e.g. ``S1A__IW___A_20150523T122350``."""
    return f"{sensor:_<4}_{acquisition_mode:_<4}_{orbit}_{start}"


def outname_base_array(sensor, acquisition_mode, orbit, start) -> np.ndarray:
    """Vectorized outname_base over string arrays."""
    s = pd.Series(sensor, dtype="string").str.pad(4, side="right", fillchar="_")
    m = pd.Series(acquisition_mode, dtype="string").str.pad(4, side="right", fillchar="_")
    out = s + "_" + m + "_" + pd.Series(orbit, dtype="string") + "_" + pd.Series(start, dtype="string")
    return out.to_numpy(dtype=object)


def parse_datasetname(name: str) -> dict | None:
    """Destructure a product filename into its metadata fields.

    Returns None when the name does not match the grammar. ``proc_steps``
    is split on '_'; empty ``extensions`` becomes None; ``outname_base``
    is stripped of trailing underscores.
    """
    match = _PYROSAR_RE.match(name)
    if not match:
        return None
    out = match.groupdict()
    if out["extensions"] == "":
        out["extensions"] = None
    if out["proc_steps"] is not None:
        out["proc_steps"] = out["proc_steps"].split("_")
    out["filename"] = name
    out["outname_base"] = out["outname_base"].strip("_")
    return out


def parse_datasetname_batch(names) -> pd.DataFrame:
    """Vectorized parse_datasetname: one row per input name.

    Non-matching names yield all-null fields (the reference returns None;
    permissiveness is surfaced as nulls, not exceptions).
    """
    s = pd.Series(names, dtype="string")
    df = s.str.extract(_PYROSAR_RE)
    df["extensions"] = df["extensions"].replace("", pd.NA)
    df["outname_base"] = df["outname_base"].str.rstrip("_")
    df["filename"] = s
    return df


# ----------------------------------------------------- snap.writer grammar

_REFAREA_RE = re.compile(r"(?P<refarea>(?:Sig|Gam)ma0)_(?P<pol>[HV]{2})")


def writer_band_name(basename: str, *, rtc: bool = False,
                     sigma0_rtc: bool = False, db: bool = False) -> str:
    """The reference's product-band rename grammar
    (snap/auxil.py:497-525): backscatter bands become
    ``<pol>_<refarea>-<correction>[_db]``; auxiliary layers are
    laundered (elevation→DEM, per-pol scatteringArea/gammaSigmaRatio
    collapsed, NE[BGS]Z pol-prefixed, layover_shadow_mask→
    layoverShadowMask)."""
    match = _REFAREA_RE.search(basename)
    if match:
        refarea, pol = match.groups()
        correction = "elp"
        if rtc and (refarea == "Gamma0" or (refarea == "Sigma0" and sigma0_rtc)):
            correction = "rtc"
        suffix = f"{refarea.lower()}-{correction}" + ("_db" if db else "")
        return f"{pol}_{suffix}"
    base = basename.replace("elevation", "DEM")
    base = re.sub(r"scatteringArea_[HV]{2}", "scatteringArea", base)
    base = re.sub(r"gammaSigmaRatio_[HV]{2}", "gammaSigmaRatio", base)
    base = re.sub(r"(NE[BGS]Z)_([HV]{2})", r"\g<2>_\g<1>", base)
    base = re.sub(r"layover_shadow_mask(_[HV]{2})?", "layoverShadowMask", base)
    return base


def writer_nodata(basename: str, dem_nodata: float | None = -32768.0) -> float | None:
    """Per-layer nodata policy (snap/auxil.py:526-533): elevation →
    the DEM's nodata (SRTM 1Sec HGT = -32768), layover-shadow mask →
    255, everything else → 0."""
    if re.search("elevation|DEM", basename):
        return dem_nodata
    if re.search("layoverShadowMask|layover_shadow_mask", basename):
        return 255.0
    return 0.0
