"""Brute-force parity for the fourth-session TPC-H plan-family queries.

The oracle gate (tools/check_oracle.py) proves Ray == DuckDB; these pin
the plan-level claims a hash can't see — the distributed COUNT DISTINCT
really deduplicates same-group multi-part suppliers, the Q22 integer
cross-multiply reproduces the float mean comparison, and the Q13 left
join preserves zero-order customers.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_q16_distinct_not_pairs(ray_session):
    """supplier_cnt must be COUNT(DISTINCT suppkey), not pair count —
    a supplier shipping two parts of one (brand, type, size) group
    counts once."""
    import __ray_entry__ as e

    out = e.queries()["tpch_q16"](SF).to_pandas()

    li = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
    ).to_pandas()
    part = pq.read_table(
        f"{SF}/part.parquet",
        columns=["p_partkey", "p_brand", "p_type", "p_size"],
    ).to_pandas()
    part = part[
        (part.p_brand != "Brand#1")
        & (part.p_size.isin([1, 4, 7, 10, 13, 16, 19, 22]))
    ]
    j = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    ref = (
        j.groupby(["p_brand", "p_type", "p_size"])["l_suppkey"]
        .nunique()
        .reset_index(name="supplier_cnt")
    )
    ref["p_size"] = ref["p_size"].astype(np.int64)
    got = out.sort_values(["p_brand", "p_type", "p_size"], ignore_index=True)
    want = ref.sort_values(["p_brand", "p_type", "p_size"], ignore_index=True)
    pd.testing.assert_frame_equal(
        got[want.columns].astype({"supplier_cnt": np.int64}), want
    )
    # and the pair count differs somewhere, or the test proves nothing
    pairs = (
        j.drop_duplicates(["l_partkey", "l_suppkey"])
        .groupby(["p_brand", "p_type", "p_size"])
        .size()
    )
    assert (pairs.to_numpy() != want["supplier_cnt"].to_numpy()).any()


def test_q22_cross_multiply_equals_mean_rule(ray_session):
    """bal_c * cnt > sum_c must pick exactly the customers a float mean
    comparison picks (money is 2-decimal, so cents are exact)."""
    import __ray_entry__ as e

    out = e.queries()["tpch_q22"](SF).to_pandas()

    cust = pq.read_table(
        f"{SF}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal"],
    ).to_pandas()
    orders = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    ).to_pandas()
    bal_c = np.floor(cust.c_acctbal.to_numpy() * 100.0 + 0.5).astype(np.int64)
    pos = bal_c[bal_c > 0]
    rich = cust[bal_c * len(pos) > pos.sum()]
    recent = set(
        orders.loc[orders.o_orderdate >= pd.Timestamp("1999-01-01"), "o_custkey"]
    )
    lapsed = rich[~rich.c_custkey.isin(recent)]
    ref = (
        lapsed.assign(
            bal_c=np.floor(lapsed.c_acctbal.to_numpy() * 100.0 + 0.5).astype(
                np.int64
            )
        )
        .groupby("c_nationkey")
        .agg(numcust=("c_custkey", "size"), totacctbal_c=("bal_c", "sum"))
        .reset_index()
    )
    got = out.sort_values("c_nationkey", ignore_index=True)
    want = ref.sort_values("c_nationkey", ignore_index=True).astype(
        {"c_nationkey": np.int64, "numcust": np.int64, "totacctbal_c": np.int64}
    )
    pd.testing.assert_frame_equal(got[want.columns], want)
    # the float-mean rule agrees (the exactness claim)
    float_rich = cust[cust.c_acctbal.to_numpy() * 100.0 > pos.mean()]
    assert set(float_rich.c_custkey) == set(rich.c_custkey)


def test_q13_zero_customers_survive(ray_session):
    """Customers with no qualifying orders must appear in the c_count=0
    bucket — the LEFT-join zero-preservation the inner-join plan loses."""
    import __ray_entry__ as e

    out = e.queries()["tpch_q13"](SF).to_pandas()

    cust = pq.read_table(f"{SF}/customer.parquet", columns=["c_custkey"]).to_pandas()
    orders = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
    ).to_pandas()
    counts = (
        orders[orders.o_orderpriority != "4-NOT SPECIFIED"]
        .groupby("o_custkey")
        .size()
    )
    per_cust = cust.c_custkey.map(counts).fillna(0).astype(np.int64)
    ref = per_cust.value_counts().rename_axis("c_count").reset_index(
        name="custdist"
    )
    got = out.sort_values("c_count", ignore_index=True)
    want = ref.sort_values("c_count", ignore_index=True).astype(
        {"c_count": np.int64, "custdist": np.int64}
    )
    pd.testing.assert_frame_equal(got[want.columns], want)
    assert int(out["custdist"].sum()) == len(cust)
