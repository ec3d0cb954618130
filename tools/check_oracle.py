"""Local replica of the driver's correctness gate.

Runs every queries() entry and its oracle_sql() twin over one sf dir and
compares row count, schema (sorted column names) and an order-insensitive
value hash. Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd
import pyarrow as pa


def to_pandas(result) -> pd.DataFrame:
    if hasattr(result, "to_pandas"):
        try:
            return result.to_pandas()
        except TypeError:
            pass
    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    raise TypeError(type(result))


def canonical(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), ignore_index=True)


def value_hash(df: pd.DataFrame) -> str:
    from pandas.util import hash_pandas_object

    return str(hash_pandas_object(canonical(df), index=False).sum())


def main() -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    import time

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ours = to_pandas(fn(sf_dir))
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: ray side raised {type(exc).__name__}: {exc}")
            failures += 1
            continue
        elapsed = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(ours)} rows, {elapsed:.1f}s)")
            continue
        try:
            theirs = con.execute(oracles[name]).fetch_df()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: oracle raised {type(exc).__name__}: {exc}")
            failures += 1
            continue
        problems = []
        if len(ours) != len(theirs):
            problems.append(f"rows {len(ours)} != {len(theirs)}")
        if sorted(ours.columns) != sorted(theirs.columns):
            problems.append(f"cols {sorted(ours.columns)} != {sorted(theirs.columns)}")
        else:
            a, b = canonical(ours), canonical(theirs)
            for col in a.columns:
                if str(a[col].dtype) != str(b[col].dtype):
                    problems.append(f"dtype[{col}] {a[col].dtype} != {b[col].dtype}")
            if not problems and value_hash(ours) != value_hash(theirs):
                diff = a.compare(b) if a.shape == b.shape else None
                problems.append(
                    "value hash mismatch"
                    + (f"; first diffs:\n{diff.head(5)}" if diff is not None and len(diff) else "")
                )
        if problems:
            print(f"FAIL {name}: " + "; ".join(str(p) for p in problems))
            failures += 1
        else:
            print(f"ok   {name}: {len(ours)} rows match ({elapsed:.1f}s)")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
