"""OLAP rollups (operators/olap.py): hand-checked integer-cents money
math and the plan shapes that make the star queries scale (top-k =
TakeOrderedAndProject, dimensions broadcast)."""

import datetime as dt

from pyspark.sql import functions as F

from validate_spark.operators.olap import (
    local_supplier_volume,
    pricing_summary,
    top_revenue_orders,
)

SF = "/root/testdata/sf0.001"


def test_pricing_summary_hand_checked(spark):
    t = dt.datetime(1997, 1, 1)
    li = spark.createDataFrame(
        [
            # qty, price, disc, tax
            ("A", "F", 2.00, 100.00, 0.10, 0.05, t),
            ("A", "F", 3.00, 50.00, 0.00, 0.00, t),
            ("N", "O", 1.00, 10.00, 0.05, 0.02, t),
            # past cutoff: excluded
            ("N", "O", 9.00, 99.00, 0.00, 0.00, dt.datetime(1999, 1, 1)),
        ],
        "l_returnflag string, l_linestatus string, l_quantity double, "
        "l_extendedprice double, l_discount double, l_tax double, "
        "l_shipdate timestamp",
    )
    out = {(r["l_returnflag"], r["l_linestatus"]): r
           for r in pricing_summary(li).collect()}
    af = out[("A", "F")]
    # disc_price = 100*0.9 + 50*1.0 = 140; charge = 90*1.05 + 50 = 144.5
    assert af["n"] == 2 and af["sum_qty"] == 5.0
    assert af["sum_base_price"] == 150.0
    assert af["sum_disc_price"] == 140.0
    assert af["sum_charge"] == 144.5
    assert af["avg_qty"] == 2.5 and af["avg_disc"] == 0.05
    no = out[("N", "O")]
    assert no["n"] == 1 and no["sum_disc_price"] == 9.5
    assert abs(no["sum_charge"] - 9.69) < 1e-9


def test_top_revenue_is_take_ordered(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    o = spark.read.parquet(f"{SF}/orders.parquet")
    c = spark.read.parquet(f"{SF}/customer.parquet")
    out = top_revenue_orders(li, o, c, k=5)
    rows = out.collect()
    assert len(rows) <= 5
    revs = [r["revenue"] for r in rows]
    assert revs == sorted(revs, reverse=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # per-task k-heaps + one k-row merge, never a global sort
    assert "TakeOrderedAndProject" in plan


def test_local_supplier_volume_broadcasts_dims(spark):
    out = local_supplier_volume(
        spark.read.parquet(f"{SF}/lineitem.parquet"),
        spark.read.parquet(f"{SF}/orders.parquet"),
        spark.read.parquet(f"{SF}/customer.parquet"),
        spark.read.parquet(f"{SF}/supplier.parquet"),
        spark.read.parquet(f"{SF}/nation.parquet"),
        spark.read.parquet(f"{SF}/region.parquet"),
    )
    rows = out.collect()
    # nations of one region only, each with positive revenue
    assert 0 < len(rows) <= 25
    assert all(r["revenue"] > 0 for r in rows)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "BroadcastNestedLoopJoin" not in plan


def test_order_priority_semi_join_no_duplication(spark):
    from validate_spark.operators.olap import order_priority_counts

    t0 = dt.datetime(1997, 8, 1)
    o = spark.createDataFrame(
        [
            (1, t0, "1-URGENT"),           # 2 late lines -> counts ONCE
            (2, t0, "1-URGENT"),           # only on-time lines -> out
            (3, t0, "3-MEDIUM"),           # 1 late line -> counts
            (4, dt.datetime(1998, 1, 1), "3-MEDIUM"),  # outside quarter
        ],
        "o_orderkey long, o_orderdate timestamp, o_orderpriority string",
    )
    li = spark.createDataFrame(
        [
            (1, dt.datetime(1997, 9, 1)),
            (1, dt.datetime(1997, 9, 2)),
            (2, dt.datetime(1997, 7, 1)),
            (3, dt.datetime(1997, 8, 15)),
            (4, dt.datetime(1998, 2, 1)),
        ],
        "l_orderkey long, l_shipdate timestamp",
    )
    out = {r["o_orderpriority"]: r["order_count"]
           for r in order_priority_counts(o, li).collect()}
    # the 2-late-line order counts once: semi join, not inner
    assert out == {"1-URGENT": 1, "3-MEDIUM": 1}
    plan = order_priority_counts(o, li)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "LeftSemi" in plan


def test_customer_distribution_keeps_zero_bucket(spark):
    from validate_spark.operators.olap import customer_order_distribution

    c = spark.createDataFrame(
        [(1,), (2,), (3,)], "c_custkey long"
    )
    o = spark.createDataFrame(
        [
            (10, 1, "3-MEDIUM"),
            (11, 1, "3-MEDIUM"),
            (12, 2, "1-URGENT"),  # excluded -> cust 2 lands in bucket 0
        ],
        "o_orderkey long, o_custkey long, o_orderpriority string",
    )
    out = {r["c_count"]: r["custdist"]
           for r in customer_order_distribution(c, o).collect()}
    assert out == {2: 1, 0: 2}


def test_idle_rich_customers_threshold_and_anti_join(spark):
    from validate_spark.operators.olap import idle_rich_customers

    # positive balances: 100, 200, 300 -> avg 200; "rich" = bal > 200
    c = spark.createDataFrame(
        [(1, 7, 100.0), (2, 7, 200.0), (3, 7, 300.0), (4, 8, 250.0),
         (5, 8, -50.0)],
        "c_custkey long, c_nationkey int, c_acctbal double",
    )
    o = spark.createDataFrame(
        [(100, 3, dt.datetime(2000, 6, 1)),   # cust 3 recent -> not idle
         (101, 4, dt.datetime(1999, 1, 1))],  # cust 4 old only -> idle
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    )
    rows = idle_rich_customers(c, o).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["c_nationkey"] == 8 and r["numcust"] == 1
    assert r["totacctbal"] == 250.0
