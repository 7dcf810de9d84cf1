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


def order_priority_counts(
    orders: DataFrame,
    lineitem: DataFrame,
    *,
    start: str = "1997-07-01",
    end: str = "1997-10-01",
) -> DataFrame:
    """TPC-H Q4 shape: per-priority count of orders placed in one
    quarter that have at least one line shipped AFTER the order date
    (the schema here has no commit/receipt dates, so "late-shipping
    line exists" is the adapted existence predicate — stated, not
    silent). The EXISTS is a LEFT SEMI join: the fact side is never
    widened, duplicates never multiply the count, and the join carries
    a compound condition (key equality + cross-table inequality) that
    Catalyst executes as a shuffled semi join with the inequality as a
    post-join residual — no cartesian anywhere."""
    o = orders.filter(
        (F.col("o_orderdate").try_cast("timestamp")
         >= F.to_timestamp(F.lit(start)))
        & (F.col("o_orderdate").try_cast("timestamp")
           < F.to_timestamp(F.lit(end)))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = lineitem.select("l_orderkey", "l_shipdate")
    sem = o.join(
        li,
        (o["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"].try_cast("timestamp")
           > o["o_orderdate"].try_cast("timestamp")),
        "left_semi",
    )
    return (
        sem.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("order_count"))
    )


def customer_order_distribution(
    customer: DataFrame,
    orders: DataFrame,
    *,
    exclude_priority: str = "1-URGENT",
) -> DataFrame:
    """TPC-H Q13 shape: distribution of customers by how many
    (non-excluded) orders they placed, INCLUDING the zero-order
    customers — the left outer join is the whole point (an inner join
    silently drops the c_count=0 bucket, the largest one). count() is
    over the order key so NULL (no match) rows count 0. Two shuffles
    by construction (custkey join+agg share one exchange; the second
    groupBy is on the derived count)."""
    o = orders.filter(F.col("o_orderpriority") != exclude_priority).select(
        "o_orderkey", "o_custkey"
    )
    per_cust = (
        customer.select("c_custkey")
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("long").alias("custdist"))
    )


def idle_rich_customers(
    customer: DataFrame,
    orders: DataFrame,
    *,
    since: str = "2000-01-01",
) -> DataFrame:
    """TPC-H Q22 shape: per-nation count + balance of customers whose
    account balance beats the global positive-balance average and who
    placed NO order since ``since`` (the churned-capital report). The
    global average is a one-row aggregate cross-joined back (broadcast
    NLJ of a single row — free at any scale); the comparison is
    INTEGER CROSS-MULTIPLICATION (bal_cents * n_pos > sum_pos_cents),
    so no float ever decides membership (working-notes rule). "No
    recent order" is a LEFT ANTI join on custkey with the date filter
    pushed into the orders SCAN (filtering after the join would keep
    the full fact table in the exchange). Money stays int64 cents
    until display."""
    bal_c = _cents("c_acctbal")
    c = customer.select("c_custkey", "c_nationkey", bal_c.alias("_bal_c"))
    pos = c.filter(F.col("_bal_c") > 0).agg(
        F.sum("_bal_c").alias("_sum_pos"),
        F.count(F.lit(1)).cast("long").alias("_n_pos"),
    )
    rich = (
        c.crossJoin(F.broadcast(pos))
        .filter(F.col("_bal_c") * F.col("_n_pos") > F.col("_sum_pos"))
        .select("c_custkey", "c_nationkey", "_bal_c")
    )
    recent = orders.filter(
        F.col("o_orderdate").try_cast("timestamp")
        >= F.to_timestamp(F.lit(since))
    ).select("o_custkey")
    idle = rich.join(
        recent, rich["c_custkey"] == F.col("o_custkey"), "left_anti"
    )
    return idle.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("numcust"),
        F.round(F.sum("_bal_c").cast("double") / 100, 6).alias("totacctbal"),
    )
