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


def nation_volume_shipping(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    *,
    nation_a: str = "NATION_1",
    nation_b: str = "NATION_2",
    start: str = "1996-01-01",
    end: str = "1998-01-01",
) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume — revenue per
    (supplier nation, customer nation, ship year) for the two flow
    directions between ``nation_a`` and ``nation_b``.

    Plan: nation is filtered to TWO rows before either join, so both
    nation joins broadcast for free; the disjunctive direction filter
    ((A,B) or (B,A)) runs AFTER both nation names are attached — on a
    fact row that already passed the per-side nation semi filter, so
    the surviving stream is the union of both directions only. The
    year is extracted once into the aggregate key (YEAR over the
    try_cast timestamp is identical in DuckDB's year()).
    """
    n2 = nation.filter(F.col("n_name").isin(nation_a, nation_b)).select(
        "n_nationkey", "n_name"
    )
    s = supplier.join(
        F.broadcast(n2), supplier["s_nationkey"] == n2["n_nationkey"]
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    c = customer.join(
        F.broadcast(n2), customer["c_nationkey"] == n2["n_nationkey"]
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    ts = F.col("l_shipdate").try_cast("timestamp")
    li = lineitem.filter(
        (ts >= F.to_timestamp(F.lit(start))) & (ts < F.to_timestamp(F.lit(end)))
    ).select(
        "l_orderkey",
        "l_suppkey",
        F.year(ts).alias("l_year"),
        (_cents("l_extendedprice") * (F.lit(100) - _cents("l_discount")))
        .alias("_rev_e4"),
    )
    j = (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            ((F.col("supp_nation") == nation_a)
             & (F.col("cust_nation") == nation_b))
            | ((F.col("supp_nation") == nation_b)
               & (F.col("cust_nation") == nation_a))
        )
    )
    return (
        j.groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("_rev_e4").alias("_rev"))
        .select(
            "supp_nation",
            "cust_nation",
            "l_year",
            F.round(F.col("_rev").cast("double") / 10000, 6).alias("revenue"),
        )
    )


def returned_item_customers(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    *,
    start: str = "1997-01-01",
    end: str = "1997-04-01",
    k: int = 20,
) -> DataFrame:
    """TPC-H Q10 shape: the k customers who returned the most revenue
    (returnflag = 'R') on orders placed in one quarter — the "who is
    sending product back" report.

    Plan: orders carries the date filter into its scan; the customer
    and nation dimensions broadcast; the k-cut orders by the EXACT
    int64 revenue with custkey tiebreak (TakeOrderedAndProject — a
    double sort key could flip near-ties between engines)."""
    ots = F.col("o_orderdate").try_cast("timestamp")
    o = orders.filter(
        (ots >= F.to_timestamp(F.lit(start))) & (ots < F.to_timestamp(F.lit(end)))
    ).select("o_orderkey", "o_custkey")
    li = lineitem.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey",
        (_cents("l_extendedprice") * (F.lit(100) - _cents("l_discount")))
        .alias("_rev_e4"),
    )
    cn = customer.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        customer["c_nationkey"] == F.col("n_nationkey"),
    ).select("c_custkey", "c_name", "c_acctbal", "n_name")
    g = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_custkey")
        .agg(F.sum("_rev_e4").alias("_rev"))
    )
    return (
        g.join(F.broadcast(cn), g["o_custkey"] == cn["c_custkey"])
        .orderBy(F.col("_rev").desc(), F.col("c_custkey").asc())
        .limit(k)
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            F.round(F.col("c_acctbal"), 2).alias("c_acctbal"),
            F.round(F.col("_rev").cast("double") / 10000, 6).alias("revenue"),
        )
    )


def promo_revenue_share(
    lineitem: DataFrame,
    part: DataFrame,
    *,
    start: str = "1997-03-01",
    end: str = "1997-04-01",
) -> DataFrame:
    """TPC-H Q14 shape: share of one month's revenue that came from
    promotional parts (p_type = 'PROMO' in this schema's single-word
    type domain). ONE broadcast join + one global conditional
    aggregate; the ratio is the only double and is derived from two
    exact int64 sums, so round-6 is engine-stable."""
    ts = F.col("l_shipdate").try_cast("timestamp")
    li = lineitem.filter(
        (ts >= F.to_timestamp(F.lit(start))) & (ts < F.to_timestamp(F.lit(end)))
    ).select(
        "l_partkey",
        (_cents("l_extendedprice") * (F.lit(100) - _cents("l_discount")))
        .alias("_rev_e4"),
    )
    p = part.select("p_partkey", "p_type")
    j = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
    g = j.agg(
        F.sum(F.when(F.col("p_type") == "PROMO", F.col("_rev_e4"))
              .otherwise(F.lit(0))).alias("_promo"),
        F.sum("_rev_e4").alias("_total"),
    )
    return g.select(
        F.round(F.col("_promo").cast("double") / 10000, 6).alias("promo_revenue"),
        F.round(F.col("_total").cast("double") / 10000, 6).alias("total_revenue"),
        F.round(
            F.lit(100.0) * F.col("_promo").cast("double")
            / F.col("_total").cast("double"),
            6,
        ).alias("promo_share_pct"),
    )


def top_suppliers(
    lineitem: DataFrame,
    supplier: DataFrame,
    *,
    start: str = "1997-01-01",
    end: str = "1997-04-01",
) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) whose quarterly revenue equals
    the GLOBAL maximum — ties all surface (the reference query's view
    + subquery equality, not a LIMIT 1 that would break ties
    arbitrarily).

    Plan: one groupBy(suppkey) aggregate, then the one-row global max
    re-aggregated from it and cross-joined back (broadcast NLJ of a
    single row — free at any scale); membership compares the two EXACT
    int64 revenues, no float ever decides the winner."""
    ts = F.col("l_shipdate").try_cast("timestamp")
    li = lineitem.filter(
        (ts >= F.to_timestamp(F.lit(start))) & (ts < F.to_timestamp(F.lit(end)))
    ).select(
        "l_suppkey",
        (_cents("l_extendedprice") * (F.lit(100) - _cents("l_discount")))
        .alias("_rev_e4"),
    )
    per_supp = li.groupBy("l_suppkey").agg(F.sum("_rev_e4").alias("_rev"))
    mx = per_supp.agg(F.max("_rev").alias("_max_rev"))
    win = per_supp.crossJoin(F.broadcast(mx)).filter(
        F.col("_rev") == F.col("_max_rev")
    )
    s = supplier.select("s_suppkey", "s_name")
    return (
        win.join(F.broadcast(s), win["l_suppkey"] == s["s_suppkey"])
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("_rev").cast("double") / 10000, 6)
            .alias("total_revenue"),
        )
    )


def small_quantity_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    *,
    brand: str = "Brand#1",
    max_size: int = 20,
) -> DataFrame:
    """TPC-H Q17 shape: yearly-averaged revenue lost to small orders —
    lines of one brand's small parts whose quantity is below 20% of
    that PART's average quantity (the correlated scalar subquery).

    Plan: the brand's parts are a broadcast-sized dimension; the
    per-part average is a groupBy over the SEMI-REDUCED lineitem
    (only the brand's partkeys aggregate), broadcast back onto the
    same reduced stream — the fact table is scanned once and shuffled
    once on partkey; both branches of the self-dependency share that
    reduction. The 20%-of-average test is INTEGER CROSS-MULTIPLIED
    (qty_c * 5 * n_lines < sum_qty_c), so no float decides membership;
    the /7.0 yearly display division is the only double."""
    p = part.filter(
        (F.col("p_brand") == brand) & (F.col("p_size") <= max_size)
    ).select("p_partkey")
    li = lineitem.select(
        "l_partkey",
        _cents("l_quantity").alias("_qty_c"),
        _cents("l_extendedprice").alias("_price_c"),
    ).join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")).drop(
        "p_partkey"
    )
    per_part = li.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.sum("_qty_c").alias("_sum_qty_c"),
        F.count(F.lit(1)).cast("long").alias("_n"),
    )
    j = li.join(F.broadcast(per_part), li["l_partkey"] == F.col("_pk")).filter(
        F.col("_qty_c") * F.lit(5) * F.col("_n") < F.col("_sum_qty_c")
    )
    return j.agg(
        F.round(F.sum("_price_c").cast("double") / 100 / 7.0, 6)
        .alias("avg_yearly"),
        F.count(F.lit(1)).cast("long").alias("n_small_lines"),
    )


def large_volume_customers(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    *,
    min_qty: float = 140.0,
) -> DataFrame:
    """TPC-H Q18 shape: customers who placed at least one order whose
    TOTAL line quantity exceeds ``min_qty`` — the HAVING-driven semi
    pattern (aggregate first, the qualifying keys then re-join).

    Plan: ONE groupBy(orderkey) over lineitem produces the per-order
    quantity; the qualifying orders are a tiny frame that broadcasts
    into both the orders and customer lookups — the fact table never
    joins unreduced. The HAVING threshold compares EXACT int64
    quantity-cents. Output ordered by the exact total then keys."""
    qty_c = _cents("l_quantity")
    per_order = lineitem.groupBy("l_orderkey").agg(
        F.sum(qty_c).alias("_sum_qty_c")
    )
    big = per_order.filter(
        F.col("_sum_qty_c") > F.lit(int(round(min_qty * 100)))
    )
    o = orders.select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    c = customer.select("c_custkey", "c_name")
    j = (
        o.join(F.broadcast(big), o["o_orderkey"] == big["l_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
    )
    return j.select(
        "c_custkey",
        "c_name",
        "o_orderkey",
        "o_orderdate",
        F.round(F.col("o_totalprice"), 2).alias("o_totalprice"),
        F.round(F.col("_sum_qty_c").cast("double") / 100, 6).alias("total_qty"),
    )


def disjunctive_revenue(
    lineitem: DataFrame,
    part: DataFrame,
) -> DataFrame:
    """TPC-H Q19 shape: revenue from three OR'd brand/size/quantity
    bands — the disjunctive-predicate join. The three bands (fixed
    here, as in the reference query's parameter template):
      Brand#1, size 1-15,  qty  1-11
      Brand#2, size 10-30, qty 10-20
      Brand#3, size 20-50, qty 20-30

    Plan: the partkey equi-join is the join CONDITION (broadcast hash
    join); the OR-of-ANDs is a post-join residual — Catalyst cannot
    split a disjunction across sides, but each disjunct's single-side
    conjuncts (qty bands on the fact side, brand+size on the
    broadcast side) are pushed as a derived OR filter into each scan,
    so neither input streams rows that satisfy NO band."""
    qty = F.col("l_quantity")
    li = lineitem.filter(
        ((qty >= 1) & (qty <= 11))
        | ((qty >= 10) & (qty <= 20))
        | ((qty >= 20) & (qty <= 30))
    ).select(
        "l_partkey",
        "l_quantity",
        (_cents("l_extendedprice") * (F.lit(100) - _cents("l_discount")))
        .alias("_rev_e4"),
    )
    sz = F.col("p_size")
    p = part.filter(
        ((F.col("p_brand") == "Brand#1") & (sz >= 1) & (sz <= 15))
        | ((F.col("p_brand") == "Brand#2") & (sz >= 10) & (sz <= 30))
        | ((F.col("p_brand") == "Brand#3") & (sz >= 20) & (sz <= 50))
    ).select("p_partkey", "p_brand", "p_size")
    j = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"]).filter(
        ((F.col("p_brand") == "Brand#1")
         & (F.col("p_size").between(1, 15))
         & (qty.between(1, 11)))
        | ((F.col("p_brand") == "Brand#2")
           & (F.col("p_size").between(10, 30))
           & (qty.between(10, 20)))
        | ((F.col("p_brand") == "Brand#3")
           & (F.col("p_size").between(20, 50))
           & (qty.between(20, 30)))
    )
    return j.agg(
        F.round(F.sum("_rev_e4").cast("double") / 10000, 6).alias("revenue"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
    )


def waiting_suppliers(
    lineitem: DataFrame,
    orders: DataFrame,
    supplier: DataFrame,
    *,
    late_days: int = 90,
    k: int = 25,
) -> DataFrame:
    """TPC-H Q21 shape: suppliers who SOLELY kept a multi-supplier
    order waiting — an order has >1 distinct supplier, exactly ONE of
    them shipped late, and this is that supplier. "Late" is adapted to
    this schema (no commit/receipt dates): shipped more than
    ``late_days`` after the order date — stated, not silent.

    Plan: the reference's EXISTS(other supplier) AND NOT EXISTS(other
    LATE supplier) double correlated subquery is re-expressed as TWO
    STACKED AGGREGATES — per (orderkey, suppkey) fold line-level
    lateness, then per orderkey count suppliers and late suppliers and
    keep groups with (n_supp > 1, n_late = 1), whose single late
    supplier is max(CASE). No self-join of the fact table, no Expand
    (zero distinct aggregates — the first groupBy IS the distinct),
    two key-local shuffles total. The k-cut orders by count desc,
    suppkey asc (TakeOrderedAndProject)."""
    li = lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
    o = orders.select("o_orderkey", "o_orderdate")
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate").try_cast("timestamp")
            > F.col("o_orderdate").try_cast("timestamp")
            + F.expr(f"INTERVAL {int(late_days)} DAYS")
        ).cast("int").alias("_late"),
    )
    per_os = j.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("_late").alias("_supp_late")
    )
    per_o = per_os.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("long").alias("_n_supp"),
        F.sum("_supp_late").cast("long").alias("_n_late"),
        F.max(F.when(F.col("_supp_late") == 1, F.col("l_suppkey")))
        .alias("_late_supp"),
    )
    blamed = per_o.filter(
        (F.col("_n_supp") > 1) & (F.col("_n_late") == 1)
    )
    g = blamed.groupBy(F.col("_late_supp").alias("s_suppkey")).agg(
        F.count(F.lit(1)).cast("long").alias("numwait")
    )
    s = supplier.select(F.col("s_suppkey").alias("_sk"), "s_name")
    return (
        g.join(F.broadcast(s), g["s_suppkey"] == F.col("_sk"))
        .orderBy(F.col("numwait").desc(), F.col("s_suppkey").asc())
        .limit(k)
        .select("s_suppkey", "s_name", "numwait")
    )


def forecast_revenue_change(
    lineitem: DataFrame,
    *,
    start: str = "1997-01-01",
    end: str = "1998-01-01",
    disc_lo: float = 0.02,
    disc_hi: float = 0.04,
    max_qty: float = 24.0,
) -> DataFrame:
    """TPC-H Q6 shape: revenue that WOULD have been earned by dropping
    discounts in a band — a pure scan-filter-aggregate with zero joins,
    the canonical pushdown benchmark (every predicate must reach the
    parquet scan; the aggregate is one map-side-partial sum).

    All three band predicates are INTEGER comparisons on cents (a
    double BETWEEN on 0.02..0.04 invites representation-edge
    disagreements between engines); revenue = price_cents *
    disc_cents sums exactly in int64 (1e-4 units)."""
    ts = F.col("l_shipdate").try_cast("timestamp")
    d_c = _cents("l_discount")
    q_c = _cents("l_quantity")
    li = lineitem.filter(
        (ts >= F.to_timestamp(F.lit(start)))
        & (ts < F.to_timestamp(F.lit(end)))
        & (d_c >= int(round(disc_lo * 100)))
        & (d_c <= int(round(disc_hi * 100)))
        & (q_c < int(round(max_qty * 100)))
    )
    g = li.agg(
        F.sum(_cents("l_extendedprice") * d_c).alias("_rev_e4"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
    )
    return g.select(
        F.round(F.col("_rev_e4").cast("double") / 10000, 6).alias("revenue"),
        "n_lines",
    )
