"""Layout / indexing operators (operators/indexing.py) plus the two
round-5 siblings registered with them: blocked fuzzy ER pairs
(dedup.blocked_fuzzy_pairs) and the CUSUM change-point screen
(drift.cusum_changepoint).

Hand-checked semantics + the plan shapes that make them scale:
global_index never runs a data-row window without a partitionBy;
zorder_key matches a pure-Python Morton interleave bit-for-bit;
blocked_fuzzy_pairs sizes blocks with a hash aggregate (no window)
and drops oversized blocks before the self-join.
"""

from pyspark.sql import functions as F

from validate_spark.operators.dedup import blocked_fuzzy_pairs
from validate_spark.operators.drift import cusum_changepoint
from validate_spark.operators.indexing import (
    global_index,
    zorder_bucket_profile,
    zorder_key,
)


# ---------------------------------------------------------------- global_index

def test_global_index_is_dense_and_ordered(spark):
    # keys arrive shuffled and skewed across partitions; the index must
    # be exactly 1..n in key order regardless of layout
    keys = [37, 1, 99, 12, 5, 62, 41, 88, 73, 2, 56, 17]
    df = spark.createDataFrame(
        [(k, f"v{k}") for k in keys], "k long, v string"
    ).repartition(5)
    out = global_index(df, "k", num_partitions=4)
    got = {r["k"]: r["global_idx"] for r in out.collect()}
    expect = {k: i + 1 for i, k in enumerate(sorted(keys))}
    assert got == expect
    spark.catalog.clearCache()


def test_global_index_no_unpartitioned_data_window(spark):
    # the only empty-partitionBy window runs over the per-partition
    # counts (num_partitions rows); the data-row window partitions by
    # _pid.  Assert the physical plan has no global Sort over the data.
    df = spark.range(0, 1000).withColumnRenamed("id", "k")
    out = global_index(df, "k", num_partitions=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the data path is range-exchanged, not single-partition-sorted
    assert "rangepartitioning" in plan.lower()
    assert out.count() == 1000
    spark.catalog.clearCache()


# ---------------------------------------------------------------- zorder

def _py_morton(x, y, bits=10):
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_python_interleave(spark):
    cases = [(0, 0), (1, 0), (0, 1), (1023, 1023), (513, 257), (77, 900)]
    df = spark.createDataFrame(cases, "x long, y long")
    out = df.select(
        "x", "y", zorder_key(F.col("x"), F.col("y"), bits=10).alias("z")
    ).collect()
    for r in out:
        assert r["z"] == _py_morton(r["x"], r["y"]), (r["x"], r["y"])


def test_zorder_key_masks_out_of_range(spark):
    # 1024 with bits=10 must mask to 0, not leak into bit 20
    df = spark.createDataFrame([(1024, 3)], "x long, y long")
    (r,) = df.select(zorder_key(F.col("x"), F.col("y"), bits=10).alias("z")).collect()
    assert r["z"] == _py_morton(0, 3)


def test_zorder_profile_extents(spark):
    # two well-separated clusters land in different buckets, each with
    # a tight per-dimension extent
    rows = [(x, y) for x in range(0, 8) for y in range(0, 8)] + [
        (x, y) for x in range(900, 908) for y in range(300, 308)
    ]
    df = spark.createDataFrame(rows, "x long, y long")
    prof = zorder_bucket_profile(
        df, F.col("x"), F.col("y"), bits=10, prefix_bits=6
    ).collect()
    by_bucket = {r["z_bucket"]: r for r in prof}
    assert len(by_bucket) == 2
    low = by_bucket[0]  # cluster at origin → all high bits zero
    assert (low["x_min"], low["x_max"], low["y_min"], low["y_max"]) == (0, 7, 0, 7)
    for r in prof:
        assert r["x_span"] <= 7 and r["y_span"] <= 7


def test_zorder_key_is_codegen_native(spark):
    # the whole key must sit inside the projection — no UDF, no
    # higher-order function (BatchEvalPython / transform would appear)
    df = spark.range(0, 10).select(
        zorder_key(F.col("id"), F.col("id"), bits=4).alias("z")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "Python" not in plan


# ---------------------------------------------------------------- fuzzy pairs

def test_blocked_fuzzy_pairs_finds_near_names(spark):
    rows = [
        (1, "smith-aaa", "b1"),
        (2, "smith-aab", "b1"),   # dist 1 from #1
        (3, "smith-zzz", "b1"),   # dist 3 from both
        (4, "jones-aaa", "b2"),   # singleton block → no pairs
        (5, "park-aaa", "b3"),
        (6, "park-aaa", "b3"),    # dist 0 duplicate
    ]
    df = spark.createDataFrame(rows, "k long, nm string, blk string")
    out = blocked_fuzzy_pairs(
        df, "k", "nm", F.col("blk"), max_dist=1, max_block=10
    )
    pairs = {(r["k1"], r["k2"], r["dist"]) for r in out.collect()}
    assert pairs == {(1, 2, 1), (5, 6, 0)}


def test_blocked_fuzzy_pairs_drops_oversized_blocks(spark):
    # a hot block above the cap contributes ZERO pairs (boilerplate
    # blocking keys are non-discriminative, not worth n^2)
    rows = [(i, f"name{i:03d}", "hot") for i in range(10)] + [
        (100, "cool-aa", "cold"),
        (101, "cool-ab", "cold"),
    ]
    df = spark.createDataFrame(rows, "k long, nm string, blk string")
    out = blocked_fuzzy_pairs(
        df, "k", "nm", F.col("blk"), max_dist=2, max_block=5
    )
    pairs = {(r["k1"], r["k2"]) for r in out.collect()}
    assert pairs == {(100, 101)}


def test_blocked_fuzzy_pairs_plan_has_no_window(spark):
    # block sizing must be a hash aggregate, never a per-block window
    # count (a window buffers the whole hot block on one task first)
    df = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "x")], "k long, nm string, blk string"
    )
    out = blocked_fuzzy_pairs(df, "k", "nm", F.col("blk"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


# ---------------------------------------------------------------- CUSUM

def test_cusum_flags_planted_step_change(spark):
    # group "shift": 5/day for 4 days then 50/day for 4 days — the max
    # |S_k| day is the last low day (the canonical change point).
    # group "flat": constant rate, statistic small; still reported.
    rows = []
    for d in range(1, 5):
        rows += [(f"2024-01-0{d} 00:00:00", "shift")] * 5
    for d in range(5, 9):
        rows += [(f"2024-01-0{d} 00:00:00", "shift")] * 50
    for d in range(1, 9):
        rows += [(f"2024-01-0{d} 00:00:00", "flat")] * 7
    df = spark.createDataFrame(rows, "t string, g string").select(
        F.col("t").cast("timestamp").alias("ts"), F.col("g")
    )
    out = {r["g"]: r for r in cusum_changepoint(df, "ts", "g").collect()}
    assert str(out["shift"]["change_day"]) == "2024-01-04"
    # S_4 = n*cum - k*T = 8*20 - 4*220 = -720
    assert out["shift"]["cusum_stat"] == 720
    assert out["flat"]["cusum_stat"] == 0
    assert out["shift"]["n_days"] == 8
    assert out["shift"]["total_events"] == 220


def test_cusum_min_days_gate_and_tie_rule(spark):
    rows = [("2024-02-01 00:00:00", "short")] * 3 + [
        ("2024-02-02 00:00:00", "short")
    ]
    df = spark.createDataFrame(rows, "t string, g string").select(
        F.col("t").cast("timestamp").alias("ts"), F.col("g")
    )
    # 2 days < min_days=4 → filtered out entirely
    assert cusum_changepoint(df, "ts", "g", min_days=4).count() == 0
    # flat two-day series with min_days=2: |S_1| == |S_2| == 0 → tie
    # resolves to the EARLIEST day
    flat = spark.createDataFrame(
        [("2024-02-01 00:00:00", "g")] * 4 + [("2024-02-02 00:00:00", "g")] * 4,
        "t string, g string",
    ).select(F.col("t").cast("timestamp").alias("ts"), F.col("g"))
    (r,) = cusum_changepoint(flat, "ts", "g", min_days=2).collect()
    assert str(r["change_day"]) == "2024-02-01"
