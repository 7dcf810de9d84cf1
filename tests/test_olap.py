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
