"""Round-6 TPC-H completion set (operators/tpch_extra6.py) against
independent pure-Python references on synthetic boundary fixtures —
the edges the sf parity run can't guarantee it exercises: the Q18
HAVING threshold, Q22's strict average compare + dormancy date edge,
and Q19's inclusive BETWEEN bands."""

from __future__ import annotations

import datetime as dt

from python_etl_sample_spark.registry import REGISTRY, load_all_operators

load_all_operators()

_D = dt.datetime


def _write(spark, tmpdir, name, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        f"{tmpdir}/{name}.parquet"
    )


def test_large_volume_threshold_is_strict(spark, tmp_path):
    """q_large_volume_customer keeps total_qty > 250 STRICTLY: an order
    summing to exactly 250 is excluded, 251 included, and total_qty is
    the exact integer sum."""
    # order 1: 5 lines x 50 = 250 (excluded); order 2: 50+50+50+50+51 =
    # 251 (included); order 3: one 300-qty line (included)
    li = []
    for ln, q in enumerate([50.0] * 5):
        li.append((1, 10, 100, ln, q, 100.0, 0.0, 0.0, "N", "O", _D(1996, 1, 2)))
    for ln, q in enumerate([50.0, 50.0, 50.0, 50.0, 51.0]):
        li.append((2, 10, 100, ln, q, 100.0, 0.0, 0.0, "N", "O", _D(1996, 1, 3)))
    li.append((3, 11, 101, 0, 300.0, 9.0, 0.0, 0.0, "N", "O", _D(1996, 1, 4)))
    _write(
        spark,
        tmp_path,
        "lineitem",
        li,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp_ntz",
    )
    _write(
        spark,
        tmp_path,
        "orders",
        [
            (1, 7, "O", 500.0, _D(1996, 1, 1), "1-URGENT"),
            (2, 7, "O", 600.0, _D(1996, 1, 1), "2-HIGH"),
            (3, 8, "F", 700.0, _D(1996, 1, 1), "3-MEDIUM"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp_ntz, o_orderpriority string",
    )
    _write(
        spark,
        tmp_path,
        "customer",
        [(7, "Customer#7", 1, 10.0, "BUILDING"), (8, "Customer#8", 2, 20.0, "AUTO")],
        "c_custkey long, c_name string, c_nationkey long, c_acctbal double,"
        " c_mktsegment string",
    )
    out = {
        r["o_orderkey"]: r["total_qty"]
        for r in REGISTRY["q_large_volume_customer"].fn(spark, str(tmp_path)).collect()
    }
    assert out == {2: 251, 3: 300}


def test_global_sales_opportunity_edges(spark, tmp_path):
    """Q22 edges: balance EXACTLY at the positive-average is excluded
    (strict >); an order timestamped exactly 2000-01-01 00:00:00 makes
    its customer non-dormant (>= boundary); negative-balance customers
    never pass the threshold but DO shape nothing (avg is over positive
    balances only)."""
    # positive balances: 100, 200, 300 -> avg 200. negative: -50.
    custs = [
        (10, "Customer#10", 1, 100.0, "A"),   # below avg
        (21, "Customer#21", 1, 200.0, "A"),   # exactly avg -> excluded (strict)
        (32, "Customer#32", 1, 300.0, "A"),   # above avg, dormant -> kept
        (43, "Customer#43", 1, -50.0, "A"),   # negative
        (54, "Customer#54", 1, 300.0, "A"),   # above avg but has recent order
    ]
    # avg over positive balances = (100+200+300+300)/4 = 225 -> custs 32, 54
    _write(
        spark,
        tmp_path,
        "customer",
        custs,
        "c_custkey long, c_name string, c_nationkey long, c_acctbal double,"
        " c_mktsegment string",
    )
    orders = [
        (1, 32, "O", 1.0, _D(1999, 12, 31, 23, 59, 59), "1-URGENT"),  # still dormant
        (2, 54, "O", 1.0, _D(2000, 1, 1, 0, 0, 0), "1-URGENT"),       # boundary: recent
    ]
    _write(
        spark,
        tmp_path,
        "orders",
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp_ntz, o_orderpriority string",
    )
    rows = REGISTRY["q_global_sales_opportunity"].fn(spark, str(tmp_path)).collect()
    got = {r["cntrycode"]: (r["numcust"], r["totacctbal"]) for r in rows}
    # only cust 32 survives: above 225, last order 1999-12-31 23:59:59
    assert got == {2: (1, 300.0)}


def test_discounted_revenue_band_boundaries(spark, tmp_path):
    """Q19's BETWEEN bands are inclusive on both ends and the branches
    are disjunctive: a line matching only the THIRD branch at both
    extremes (qty 20 and 30, size 15) counts; qty 31 under the same
    brand does not."""
    parts = [
        (1, "red widget", "Brand#2", "PROMO", 5, 1.0),    # branch 1 size edge
        (2, "blue bolt", "Brand#24", "LARGE", 15, 1.0),   # branch 3 size edge
        (3, "green gear", "Brand#9", "SMALL", 1, 1.0),    # no branch brand
    ]
    _write(
        spark,
        tmp_path,
        "part",
        parts,
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size long, p_retailprice double",
    )
    # (partkey, linenumber, qty, extendedprice, discount)
    lines = [
        (1, 0, 11.0, 100.0, 0.0),  # branch-1 qty top edge: keep (rev 100)
        (1, 1, 12.0, 100.0, 0.0),  # branch-1 qty past band: drop
        (2, 0, 20.0, 50.0, 0.5),   # branch-3 qty low edge: keep (rev 25)
        (2, 1, 30.0, 50.0, 0.5),   # branch-3 qty high edge: keep (rev 25)
        (2, 2, 31.0, 50.0, 0.5),   # past band: drop
        (3, 0, 5.0, 999.0, 0.0),   # non-branch brand: drop
    ]
    rows = [
        (1, pk, 100, ln, q, ep, d, 0.0, "N", "O", _D(1996, 1, 2))
        for (pk, ln, q, ep, d) in lines
    ]
    _write(
        spark,
        tmp_path,
        "lineitem",
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp_ntz",
    )
    out = REGISTRY["q_discounted_revenue"].fn(spark, str(tmp_path)).collect()[0]
    # kept: (100, disc 0) + (50, disc .5) + (50, disc .5) = 100 + 25 + 25
    assert out["n_lines"] == 3
    assert out["revenue"] == 150.0
