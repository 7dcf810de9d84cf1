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


def test_nation_volume_directions_and_year(spark):
    from validate_spark.operators.olap import nation_volume_shipping

    t96, t97 = dt.datetime(1996, 6, 1), dt.datetime(1997, 6, 1)
    li = spark.createDataFrame(
        [(1, 10, 100.00, 0.00, t96),     # supp NATION_1 -> cust NATION_2
         (2, 20, 200.00, 0.10, t97),     # supp NATION_2 -> cust NATION_1
         (3, 10, 999.00, 0.00, t96),     # cust NATION_1 == supp nation: drop
         (4, 30, 999.00, 0.00, t96)],    # supplier in a third nation: drop
        "l_orderkey long, l_suppkey long, l_extendedprice double, "
        "l_discount double, l_shipdate timestamp",
    )
    o = spark.createDataFrame(
        [(1, 200), (2, 100), (3, 100), (4, 200)],
        "o_orderkey long, o_custkey long",
    )
    c = spark.createDataFrame(
        [(100, 1), (200, 2)], "c_custkey long, c_nationkey long"
    )
    s = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3)], "s_suppkey long, s_nationkey long"
    )
    n = spark.createDataFrame(
        [(1, "NATION_1"), (2, "NATION_2"), (3, "NATION_3")],
        "n_nationkey long, n_name string",
    )
    rows = {(r["supp_nation"], r["cust_nation"], r["l_year"]): r["revenue"]
            for r in nation_volume_shipping(li, o, c, s, n).collect()}
    assert rows == {
        ("NATION_1", "NATION_2", 1996): 100.0,
        ("NATION_2", "NATION_1", 1997): 180.0,
    }


def test_top_suppliers_keeps_ties(spark):
    from validate_spark.operators.olap import top_suppliers

    t = dt.datetime(1997, 2, 1)
    li = spark.createDataFrame(
        [(1, 100.00, 0.00, t), (2, 50.00, 0.00, t), (2, 50.00, 0.00, t),
         (3, 10.00, 0.00, t),
         (1, 500.00, 0.00, dt.datetime(1998, 6, 1))],  # outside window
        "l_suppkey long, l_extendedprice double, l_discount double, "
        "l_shipdate timestamp",
    )
    s = spark.createDataFrame(
        [(1, "S1"), (2, "S2"), (3, "S3")], "s_suppkey long, s_name string"
    )
    rows = sorted(
        (r["s_suppkey"], r["total_revenue"])
        for r in top_suppliers(li, s).collect()
    )
    # suppliers 1 and 2 tie at 100.00 — both must surface
    assert rows == [(1, 100.0), (2, 100.0)]


def test_small_quantity_cross_multiplied_threshold(spark):
    from validate_spark.operators.olap import small_quantity_revenue

    li = spark.createDataFrame(
        # part 1: quantities 1, 10, 10, 10 -> avg 7.75; 0.2*avg = 1.55:
        # only the qty-1 line (price 70.0) qualifies
        [(1, 1.00, 70.00), (1, 10.00, 10.00), (1, 10.00, 10.00),
         (1, 10.00, 10.00),
         # part 2 (wrong brand): never counted
         (2, 0.50, 999.00)],
        "l_partkey long, l_quantity double, l_extendedprice double",
    )
    p = spark.createDataFrame(
        [(1, "Brand#1", 5), (2, "Brand#9", 5)],
        "p_partkey long, p_brand string, p_size int",
    )
    row = small_quantity_revenue(li, p).collect()[0]
    assert row["n_small_lines"] == 1
    assert row["avg_yearly"] == round(70.0 / 7.0, 6)


def test_large_volume_customers_threshold_is_exact(spark):
    from validate_spark.operators.olap import large_volume_customers

    t = dt.datetime(1997, 1, 1)
    li = spark.createDataFrame(
        [(1, 100.00), (1, 40.00),   # order 1: 140.00 == threshold -> out
         (2, 100.00), (2, 40.01)],  # order 2: 140.01 > threshold -> in
        "l_orderkey long, l_quantity double",
    )
    o = spark.createDataFrame(
        [(1, 7, t, 10.0), (2, 7, t, 20.0)],
        "o_orderkey long, o_custkey long, o_orderdate timestamp, "
        "o_totalprice double",
    )
    c = spark.createDataFrame([(7, "C7")], "c_custkey long, c_name string")
    rows = large_volume_customers(li, o, c, min_qty=140.0).collect()
    assert [(r["o_orderkey"], r["total_qty"]) for r in rows] == [(2, 140.01)]


def test_waiting_suppliers_sole_blame_only(spark):
    from validate_spark.operators.olap import waiting_suppliers

    day0 = dt.datetime(2000, 1, 1)
    late = dt.datetime(2000, 6, 1)    # > 90 days after day0
    ontime = dt.datetime(2000, 1, 15)
    li = spark.createDataFrame(
        # order 1: supplier 10 late, supplier 20 on time -> blame 10
        [(1, 10, late), (1, 20, ontime),
         # order 2: both late -> nobody solely to blame
         (2, 10, late), (2, 20, late),
         # order 3: single-supplier order, late -> excluded (n_supp == 1)
         (3, 10, late),
         # order 4: supplier 20 late via ONE of two lines -> blame 20
         (4, 20, late), (4, 20, ontime), (4, 30, ontime)],
        "l_orderkey long, l_suppkey long, l_shipdate timestamp",
    )
    o = spark.createDataFrame(
        [(1, day0), (2, day0), (3, day0), (4, day0)],
        "o_orderkey long, o_orderdate timestamp",
    )
    s = spark.createDataFrame(
        [(10, "S10"), (20, "S20"), (30, "S30")],
        "s_suppkey long, s_name string",
    )
    rows = {r["s_suppkey"]: r["numwait"]
            for r in waiting_suppliers(li, o, s).collect()}
    assert rows == {10: 1, 20: 1}


def test_disjunctive_join_is_broadcast_no_cartesian(spark):
    from validate_spark.operators.olap import disjunctive_revenue

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    p = spark.read.parquet(f"{SF}/part.parquet")
    out = disjunctive_revenue(li, p)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    row = out.collect()[0]
    assert row["n_lines"] > 0 and row["revenue"] > 0


def test_derived_partsupp_invariants(spark):
    """4 rows per part, distinct (partkey, suppkey) pairs, suppkeys in
    range, cost in [10000, 99999] cents — the arithmetic contract the
    five partsupp oracles replay."""
    from validate_spark.operators.olap import derived_partsupp

    part = spark.read.parquet(f"{SF}/part.parquet")
    supplier = spark.read.parquet(f"{SF}/supplier.parquet")
    ps = derived_partsupp(part, supplier)
    n_part = part.count()
    n_supp = supplier.count()
    rows = ps.collect()
    assert len(rows) == 4 * n_part
    assert len({(r["ps_partkey"], r["ps_suppkey"]) for r in rows}) == len(rows)
    assert all(0 <= r["ps_suppkey"] < n_supp for r in rows)
    assert all(10000 <= r["ps_supplycost_c"] <= 99999 for r in rows)
    assert all(1 <= r["ps_availqty"] <= 9999 for r in rows)
    # map-only derivation: no Exchange in the plan (the 1-row supplier
    # count rides a broadcast, part explodes in place)
    plan = ps._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan


def test_min_cost_supplier_keeps_min_ties_only(spark):
    """Q2 shape: only min-cost (part, supplier) rows survive, all ties
    kept — checked against a driver-side replay of the arithmetic."""
    from validate_spark.operators.olap import min_cost_supplier

    part = spark.read.parquet(f"{SF}/part.parquet")
    supplier = spark.read.parquet(f"{SF}/supplier.parquet")
    nation = spark.read.parquet(f"{SF}/nation.parquet")
    region = spark.read.parquet(f"{SF}/region.parquet")
    out = min_cost_supplier(
        part, supplier, nation, region,
        region_name="EUROPE", p_type="STANDARD", size_lo=10, size_hi=25,
    ).collect()
    # replay: region suppliers, arithmetic partsupp, min per part
    eur = {
        r["s_suppkey"]
        for r in supplier.join(
            nation, F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
        .collect()
    }
    n = supplier.count()
    stride = n // 4 + 1
    pks = {
        r["p_partkey"]
        for r in part.filter(
            (F.col("p_type") == "STANDARD")
            & F.col("p_size").between(10, 25)
        ).collect()
    }
    expect = {}
    for pk in pks:
        cands = [
            ((pk + i * stride) % n, (pk * 131 + ((pk + i * stride) % n) * 17) % 90000 + 10000)
            for i in range(4)
        ]
        cands = [(sk, c) for sk, c in cands if sk in eur]
        if cands:
            mc = min(c for _, c in cands)
            expect[pk] = {(sk, c) for sk, c in cands if c == mc}
    got = {}
    for r in out:
        got.setdefault(r["p_partkey"], set()).add(
            (None, int(round(r["supplycost"] * 100)))
        )
    assert {pk: {c for _, c in v} for pk, v in got.items()} == {
        pk: {c for _, c in v} for pk, v in expect.items()
    }


def test_supplier_part_counts_no_expand(spark):
    """Q16 shape: the distinct supplier count must be two stacked
    aggregates, never a count_distinct Expand."""
    from validate_spark.operators.olap import supplier_part_counts

    part = spark.read.parquet(f"{SF}/part.parquet")
    supplier = spark.read.parquet(f"{SF}/supplier.parquet")
    out = supplier_part_counts(part, supplier)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan


def test_basket_pairs_exhaustive_small(spark):
    """Pair counts, supports and lift selection vs a hand model;
    oversized basket drops with its pair storm; singleton baskets
    count toward N and supports."""
    from validate_spark.operators.olap import basket_pairs

    rows = []
    # b1..b4: {1,2} together; b5: {1,3}; b6: {2}; b7 singleton {3}
    for b, items in [
        (1, [1, 2]),
        (2, [1, 2]),
        (3, [1, 2]),
        (4, [1, 2, 3]),
        (5, [1, 3]),
        (6, [2]),
        (7, [3]),
        # b8 oversized (4 items > max_basket=3): contributes nothing
        (8, [10, 11, 12, 13]),
        # duplicate (basket, item) rows must not double-count
        (1, [1]),
    ]:
        rows += [(b, i) for i in items]
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    out = basket_pairs(df, min_support=2, max_basket=3, top_n=10).collect()
    got = {(r.item_a, r.item_b): r for r in out}
    # N = 7 kept baskets; c(1)=5, c(2)=5, c(3)=3
    # (1,2): c_ab=4, lift = 4*7/(5*5) = 1.12 > 1 -> kept
    # (1,3): c_ab=2, lift = 2*7/(5*3) < 1 -> dropped
    # (2,3): c_ab=1 -> below support
    assert set(got) == {(1, 2)}
    r = got[(1, 2)]
    assert (r.c_ab, r.c_a, r.c_b, r.n_baskets) == (4, 5, 5, 7)
    assert abs(r.lift - round(28 / 25, 6)) < 1e-9


def test_basket_pairs_two_phase_bounded(spark):
    """The member collection must be the two-phase (pid, basket)
    stage: two HashAggregates on the collect path, the first keyed by
    spark_partition_id — never a single groupBy(basket).collect."""
    from validate_spark.operators.olap import basket_pairs

    df = spark.createDataFrame(
        [(i % 5, i) for i in range(50)], "l_orderkey long, l_partkey long"
    )
    plan = (
        basket_pairs(df, min_support=1, max_basket=20, top_n=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SPARK_PARTITION_ID" in plan.upper()
