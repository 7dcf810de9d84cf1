"""Classic OLAP rollups over the TPC-H-shaped tables — the analytics
half of the engine beside validation (the task's tables `lineitem
orders customer supplier nation region` are the canonical star
schema; a reference user's daily reporting queries must run here
too).

Money math is ALL-INTEGER internally: a double sum at ~10^8 scale
carries addition-order error bigger than the round-6 tick (documented
in q117's sibling note), so prices/discounts/taxes become exact int64
cents / basis units first —
    disc_price_e4 = price_cents * (100 - disc_cents)       (1e-4 units)
    charge_e6     = disc_price_e4 * (100 + tax_cents)      (1e-6 units)
sums stay exact (suite-scale bound ~1e15 « 2^63), and only the final
display division produces a double (identical in both engines, then
round-6). Sort keys for top-k are the exact integers, never doubles.

Plans: star joins leave dimension sides broadcast-able (Catalyst/AQE
picks broadcast under threshold — at 10^12-row fact scale the big
dims degrade to shuffle joins on the same expression); aggregates are
map-side partial; top-k is orderBy().limit() = TakeOrderedAndProject
(per-task heaps, no global sort).

Reference seed: gookit/validate has no aggregation surface at all —
this is the dataset-level extension (SURVEY.md §2.9) applied to the
star schema.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _cents(col: str) -> Column:
    # round(x*100) is half-up on positives in both engines; 2-dec
    # source doubles land >1e-10 from tie boundaries, so the rounds
    # agree; try_cast keeps a malformed row a NULL, never a job abort
    return F.round(F.col(col) * 100).try_cast("long")


def pricing_summary(lineitem: DataFrame, *, cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1 shape: per (returnflag, linestatus) pricing rollup of
    everything shipped on or before ``cutoff``. One map-side-partial
    aggregate; NULL measures drop from their sums but count(*) counts
    the row (same in the SQL replay — stated, not silent)."""
    li = lineitem.filter(
        F.col("l_shipdate").try_cast("timestamp")
        <= F.to_timestamp(F.lit(cutoff))
    )
    qty_c = _cents("l_quantity")
    price_c = _cents("l_extendedprice")
    disc_c = _cents("l_discount")
    tax_c = _cents("l_tax")
    disc_price_e4 = price_c * (F.lit(100) - disc_c)
    charge_e6 = disc_price_e4 * (F.lit(100) + tax_c)
    g = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(qty_c).alias("_sq"),
        F.sum(price_c).alias("_sp"),
        F.sum(disc_price_e4).alias("_sdp"),
        F.sum(charge_e6).alias("_sc"),
        F.sum(disc_c).alias("_sd"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    return g.select(
        "l_returnflag",
        "l_linestatus",
        F.round(d("_sq") / 100, 6).alias("sum_qty"),
        F.round(d("_sp") / 100, 6).alias("sum_base_price"),
        F.round(d("_sdp") / 10000, 6).alias("sum_disc_price"),
        F.round(d("_sc") / 1000000, 6).alias("sum_charge"),
        F.round(d("_sq") / (F.lit(100) * F.col("n")), 6).alias("avg_qty"),
        F.round(d("_sp") / (F.lit(100) * F.col("n")), 6).alias("avg_price"),
        F.round(d("_sd") / (F.lit(100) * F.col("n")), 6).alias("avg_disc"),
        "n",
    )


def top_revenue_orders(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    *,
    segment: str = "BUILDING",
    date: str = "1998-01-01",
    k: int = 10,
) -> DataFrame:
    """TPC-H Q3 shape: top-k open orders by revenue for one market
    segment (orders placed before ``date``, lines shipped after it).
    The top-k ORDERS BY THE EXACT INT64 revenue (1e-4 units) with the
    order key as tiebreak — a double sort key could flip near-ties
    across engines; the display double is derived after the cut."""
    c = customer.filter(F.col("c_mktsegment") == segment).select("c_custkey")
    o = orders.filter(
        F.col("o_orderdate").try_cast("timestamp") < F.to_timestamp(F.lit(date))
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    li = lineitem.filter(
        F.col("l_shipdate").try_cast("timestamp") > F.to_timestamp(F.lit(date))
    ).select(
        "l_orderkey",
        (_cents("l_extendedprice") * (F.lit(100) - _cents("l_discount")))
        .alias("_rev_e4"),
    )
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).join(
        c, o["o_custkey"] == c["c_custkey"]
    )
    g = j.groupBy("o_orderkey", "o_orderdate", "o_orderpriority").agg(
        F.sum("_rev_e4").alias("_rev")
    )
    return (
        g.orderBy(F.col("_rev").desc(), F.col("o_orderkey").asc())
        .limit(k)
        .select(
            "o_orderkey",
            "o_orderdate",
            "o_orderpriority",
            F.round(F.col("_rev").cast("double") / 10000, 6).alias("revenue"),
        )
    )


def local_supplier_volume(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    *,
    region_name: str = "ASIA",
) -> DataFrame:
    """TPC-H Q5 shape: revenue per nation within one region where the
    lineitem's supplier and the order's customer share the nation
    (the "local supplier" condition). Five-way star join — the three
    true dimensions (supplier, nation, region) stay broadcast-sized
    at any fact scale; customer/orders degrade to shuffle equi-joins
    on the same expression when they outgrow the threshold."""
    r = region.filter(F.col("r_name") == region_name).select("r_regionkey")
    n = nation.join(
        F.broadcast(r), nation["n_regionkey"] == r["r_regionkey"]
    ).select("n_nationkey", "n_name")
    s = supplier.join(
        F.broadcast(n), supplier["s_nationkey"] == n["n_nationkey"]
    ).select("s_suppkey", "s_nationkey", "n_name")
    li = lineitem.select(
        "l_orderkey",
        "l_suppkey",
        (_cents("l_extendedprice") * (F.lit(100) - _cents("l_discount")))
        .alias("_rev_e4"),
    )
    j = (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
    )
    return (
        j.groupBy("n_name")
        .agg(F.sum("_rev_e4").alias("_rev"))
        .select(
            "n_name",
            F.round(F.col("_rev").cast("double") / 10000, 6).alias("revenue"),
        )
    )
