"""The canonical scene-record contract (the reference's __LOCAL__ set).

Every format driver must populate the 16 standardized attributes
(pyroSAR/config.py:20-25); the reference raises KeyError on a missing
one (drivers.py:220-231). This module pins the engine's Arrow schema
for the full contract and provides the same must-be-complete check for
record dicts and Arrow tables.
"""

from __future__ import annotations

import pyarrow as pa

#: the 16 standardized metadata attributes, reference order
LOCAL_ATTRS = (
    "acquisition_mode",
    "coordinates",
    "cycleNumber",
    "frameNumber",
    "lines",
    "orbit",
    "orbitNumber_abs",
    "orbitNumber_rel",
    "polarizations",
    "product",
    "projection",
    "samples",
    "sensor",
    "spacing",
    "start",
    "stop",
)

#: Arrow types per attribute (SURVEY.md §1.3 mapping)
SCENE_SCHEMA = pa.schema(
    [
        ("acquisition_mode", pa.string()),
        ("coordinates", pa.list_(pa.struct([("lon", pa.float64()), ("lat", pa.float64())]))),
        ("cycleNumber", pa.int32()),
        ("frameNumber", pa.int32()),
        ("lines", pa.int32()),
        ("orbit", pa.string()),
        ("orbitNumber_abs", pa.int32()),
        ("orbitNumber_rel", pa.int32()),
        ("polarizations", pa.list_(pa.string())),
        ("product", pa.string()),
        ("projection", pa.string()),
        ("samples", pa.int32()),
        ("spacing", pa.struct([("rg", pa.float64()), ("az", pa.float64())])),
        ("sensor", pa.string()),
        ("start", pa.string()),
        ("stop", pa.string()),
    ]
)


def validate_record(record: dict) -> None:
    """Raise KeyError listing every missing standardized attribute
    (reference behavior: drivers.py:220-231)."""
    missing = [a for a in LOCAL_ATTRS if a not in record or record[a] is None]
    if missing:
        raise KeyError(
            "missing standardized metadata attributes: " + ", ".join(missing)
        )


def validate_table(table: pa.Table) -> None:
    """Raise KeyError if any standardized attribute column is absent."""
    missing = [a for a in LOCAL_ATTRS if a not in table.column_names]
    if missing:
        raise KeyError(
            "missing standardized metadata columns: " + ", ".join(missing)
        )
