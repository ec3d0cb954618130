"""map_groups hygiene: typed empty blocks.

Ray's sort-based ``groupby().map_groups`` hands UDFs EMPTY group frames
at range-split boundaries; a pandas return for those (even dtype-typed)
becomes a SCHEMA-LESS empty block. Downstream exchanges then hit the
schema-unification slow path — measured 12-27 s instead of ~2 s for an
identical 38k-row aggregate at sf0.1 (dup_ngram_stats, round 3) — plus
the cosmetic 'Failed to hash the schemas' warnings.

``typed_groups(schema)`` wraps a group UDF so every empty input/output
returns a typed Arrow table and every pandas output is cast onto the
declared schema; non-empty Arrow outputs pass through untouched.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
import pyarrow as pa

from . import table_from_pandas


def empty_table(schema: dict[str, pa.DataType]) -> pa.Table:
    return pa.table({c: pa.array([], type=t) for c, t in schema.items()})


def typed_groups(schema: dict[str, pa.DataType]) -> Callable:
    """Decorator for map_groups UDFs: pin the output schema."""
    pa_schema = pa.schema(schema)

    def deco(fn: Callable) -> Callable:
        def wrapped(group):
            if not len(group):
                return empty_table(schema)
            out = fn(group)
            if isinstance(out, pd.DataFrame):
                if not len(out):
                    return empty_table(schema)
                return table_from_pandas(
                    out[list(schema)]).cast(pa_schema)
            if isinstance(out, pa.Table) and not len(out):
                return empty_table(schema)
            return out

        return wrapped

    return deco
