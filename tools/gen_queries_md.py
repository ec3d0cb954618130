"""Regenerate QUERIES.md from the __ray_entry__ registry."""

from __future__ import annotations

import inspect
import sys

sys.path.insert(0, "/root/repo")

import __ray_entry__ as e

HEADER = """# QUERIES — the driver-facing pipeline inventory

One row per `queries()` entry (the correctness gate surface), in
registry order — the driver's correctness window covers the first 50.
`oracle` = hash-checked against the DuckDB twin in `oracle_sql()`;
rows-only queries have no exact SQL twin (float/ML/RNG payloads),
each documented in its docstring.

| query | oracle | summary |
| --- | --- | --- |
"""


def summary(fn) -> str:
    doc = inspect.getdoc(fn) or ""
    text = " ".join(doc.split())
    if len(text) > 105:
        text = text[:105] + "..."
    return text


def main() -> None:
    qs = e.queries()
    oracles = e.oracle_sql()
    rows = []
    for name, fn in qs.items():
        kind = "hash" if name in oracles else "rows-only"
        rows.append(f"| {name} | {kind} | {summary(fn)} |")
    n_hash = sum(1 for n in qs if n in oracles)
    in_window = list(qs)[:50]
    missing_twin = [n for n in in_window if n not in oracles]
    footer = (
        f"\n{len(qs)} queries, {n_hash} hash twins; in-window (first 50) "
        f"without a twin: {missing_twin if missing_twin else 'none'}.\n"
    )
    with open("/root/repo/QUERIES.md", "w") as fh:
        fh.write(HEADER + "\n".join(rows) + "\n" + footer)
    print(f"{len(qs)} queries, {n_hash} twins, window gaps: {missing_twin}")


if __name__ == "__main__":
    main()
