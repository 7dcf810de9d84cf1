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


# ---------------------------------------------------------------- url canon

def test_canonicalize_url_variants_collapse(spark):
    from validate_spark.operators.dedup import canonicalize_url

    variants = [
        "HTTP://WWW.Example.COM:80/a/b/?utm_source=x&b=2&a=1#frag",
        "http://www.example.com/a/b?a=1&b=2",
        "http://www.example.com/a/b/?b=2&a=1&utm_medium=y",
    ]
    df = spark.createDataFrame([(v,) for v in variants], "u string")
    out = df.select(canonicalize_url(F.col("u")).alias("c")).collect()
    assert {r["c"] for r in out} == {"http://www.example.com/a/b?a=1&b=2"}


def test_canonicalize_url_edge_cases(spark):
    from validate_spark.operators.dedup import canonicalize_url

    cases = {
        # https default port stripped, root path normalized
        "HTTPS://Host.io:443": "https://host.io/",
        # non-default port kept
        "http://h.io:8080/x": "http://h.io:8080/x",
        # all params utm -> no query marker
        "http://h.io/x?utm_a=1&utm_b=2": "http://h.io/x",
        # empty-string degrade, no abort (empty path still -> '/')
        "": ":///",
    }
    df = spark.createDataFrame([(k,) for k in cases], "u string")
    got = {
        r["u"]: r["c"]
        for r in df.select("u", canonicalize_url(F.col("u")).alias("c")).collect()
    }
    assert got == cases


def test_url_dedup_groups(spark):
    from validate_spark.operators.dedup import url_dedup

    rows = [
        (1, "http://a.io/x?b=2&a=1"),
        (2, "HTTP://A.IO:80/x/?a=1&b=2&utm_k=9"),
        (3, "https://a.io/x?a=1&b=2"),  # different scheme -> own group
    ]
    df = spark.createDataFrame(rows, "k long, url string")
    out = {r["canon_url"]: (r["n_docs"], r["keeper"]) for r in url_dedup(df, "url", "k").collect()}
    assert out == {
        "http://a.io/x?a=1&b=2": (2, 1),
        "https://a.io/x?a=1&b=2": (1, 3),
    }


# ---------------------------------------------------------------- split

def test_leakage_safe_split_groups_never_straddle(spark):
    from validate_spark.operators.sampling import leakage_safe_split

    # 300 rows in 100 groups of 3 — every group must land whole
    rows = [(i, f"g{i % 100}") for i in range(300)]
    df = spark.createDataFrame(rows, "k long, grp string")
    out = leakage_safe_split(df, "grp", {"train": 0.8, "val": 0.1, "test": 0.1})
    per_group = (
        out.groupBy("grp").agg(F.countDistinct("split").alias("n")).collect()
    )
    assert all(r["n"] == 1 for r in per_group)
    splits = {r["split"] for r in out.collect()}
    assert splits <= {"train", "val", "test"}
    # deterministic across invocations
    again = leakage_safe_split(df, "grp", {"train": 0.8, "val": 0.1, "test": 0.1})
    assert out.collect() == again.collect()


def test_leakage_safe_split_validates_fractions(spark):
    import pytest as _pt
    from validate_spark.operators.sampling import leakage_safe_split

    df = spark.createDataFrame([(1, "a")], "k long, grp string")
    with _pt.raises(ValueError):
        leakage_safe_split(df, "grp", {"train": 0.5, "val": 0.4})
    with _pt.raises(ValueError):
        leakage_safe_split(df, "grp", {"all": 1.0})


# ---------------------------------------------------------------- compaction

def test_compaction_plan_batches(spark):
    from validate_spark.operators.indexing import compaction_plan

    files = [
        ("p1", "a", 600), ("p1", "b", 500), ("p1", "c", 400), ("p1", "d", 100),
        ("p2", "big", 5000),  # oversize -> own batch
        ("p2", "tiny", 10),
    ]
    df = spark.createDataFrame(files, "part string, path string, bytes long")
    out = {
        (r["part"], r["path"]): r["batch"]
        for r in compaction_plan(df, target_bytes=1000).collect()
    }
    # p1 ordered 600,500,400,100 -> cum 600,1100,1500,1600 -> batches 0,1,1,1
    assert out[("p1", "a")] == 0
    assert out[("p1", "b")] == 1
    assert out[("p1", "c")] == 1
    assert out[("p1", "d")] == 1
    # p2: 5000 fills batches 0-4 alone; tiny lands in batch 5
    assert out[("p2", "big")] == 4
    assert out[("p2", "tiny")] == 5


def test_compaction_batch_sizes_reach_target(spark):
    from validate_spark.operators.indexing import compaction_plan

    files = [("p", f"f{i:03d}", 50 + i) for i in range(40)]
    df = spark.createDataFrame(files, "part string, path string, bytes long")
    out = compaction_plan(df, target_bytes=500)
    sizes = (
        out.groupBy("part", "batch").agg(F.sum("bytes").alias("b")).collect()
    )
    last = max(r["batch"] for r in sizes)
    for r in sizes:
        if r["batch"] != last:
            assert r["b"] >= 500 - max(f[2] for f in files)


# ---------------------------------------------------------------- trend

def test_daily_trend_signs(spark):
    from validate_spark.operators.drift import daily_trend

    rows = []
    # "up": counts 1,2,3,4 over 4 days; "down": 4,3,2,1; "flat": 2,2,2,2
    for day, (a, b, c) in enumerate([(1, 4, 2), (2, 3, 2), (3, 2, 2), (4, 1, 2)], 1):
        rows += [(f"2024-03-0{day} 12:00:00", "up")] * a
        rows += [(f"2024-03-0{day} 12:00:00", "down")] * b
        rows += [(f"2024-03-0{day} 12:00:00", "flat")] * c
    df = spark.createDataFrame(rows, "t string, g string").select(
        F.col("t").cast("timestamp").alias("ts"), "g"
    )
    out = {r["g"]: r for r in daily_trend(df, "ts", "g").collect()}
    # num = n*Σkc − Σk*Σc: up -> 4*30-10*10=20, down -> 4*20-10*10=-20
    assert (out["up"]["trend_num"], out["up"]["direction"]) == (20, 1)
    assert (out["down"]["trend_num"], out["down"]["direction"]) == (-20, -1)
    assert (out["flat"]["trend_num"], out["flat"]["direction"]) == (0, 0)
    # den = n*Σk² − (Σk)² = 4*30-100 = 20 for all
    assert {r["trend_den"] for r in out.values()} == {20}
    assert out["up"]["total_events"] == 10 and out["up"]["n_days"] == 4


# ---------------------------------------------------------------- sq8 ANN

def test_sq8_full_rerank_equals_exact(spark):
    # with rerank >= corpus size the candidate cut keeps everything, so
    # sq8_topk must equal brute-force exact top-k row for row
    import random

    from validate_spark.operators.similarity import brute_force_topk, sq8_topk

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = brute_force_topk(emb, q, k=5)
    approx = sq8_topk(emb, q, k=5, rerank=40)
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted(exact.collect(), key=key) == sorted(approx.collect(), key=key)


def test_sq8_recall_with_narrow_rerank(spark):
    # clustered data: 8-bit codes keep enough signal that a 10-candidate
    # cut still recalls the exact top-3 perfectly
    import random

    from validate_spark.operators.similarity import (
        brute_force_topk,
        recall_at_k,
        sq8_topk,
    )

    rng = random.Random(11)
    rows = []
    for i in range(60):
        center = [1.0 if (i % 3) == d % 3 else -1.0 for d in range(8)]
        rows.append((i, [c + rng.uniform(-0.05, 0.05) for c in center]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    # rerank = cluster size: centered codes separate classes by a wide
    # integer margin, so the candidate cut recalls the whole class and
    # the rerank recovers the exact answer. (A cut SMALLER than the
    # cluster can't order near-ties inside a tight cluster — within-
    # cluster cosines differ only in the 4th decimal; that's inherent
    # to any quantized proxy, not a defect.)
    exact = brute_force_topk(emb, q, k=3)
    approx = sq8_topk(emb, q, k=3, rerank=20)
    assert recall_at_k(approx, exact) >= 0.99


def test_sq8_encode_bounds(spark):
    from validate_spark.operators.similarity import _sq8_encode, sq8_bounds

    emb = spark.createDataFrame(
        [(0, [0.0, 5.0]), (1, [10.0, 5.0]), (2, [2.5, 5.0])],
        "vec_id long, embedding array<float>",
    )
    b = sq8_bounds(emb)
    out = (
        emb.crossJoin(F.broadcast(b))
        .select(
            "vec_id",
            _sq8_encode(F.col("embedding"), F.col("lo"), F.col("hi")).alias("c"),
        )
        .collect()
    )
    got = {r["vec_id"]: r["c"] for r in out}
    # dim 0: lo=0, hi=10, mid=5 -> 0.0->-128, 10.0->clamp(128)=127,
    # 2.5 -> floor(-2.5*25.6) = -64; dim 1 degenerate (hi == lo) -> 0
    assert got == {0: [-128, 0], 1: [127, 0], 2: [-64, 0]}


# ---------------------------------------------------------------- RRF

def test_rrf_fusion_hand_check(spark):
    from validate_spark.operators.indexing import RRF_SCALE, rrf_fusion

    rows = [(1, 30, 1.0), (2, 20, 3.0), (3, 10, 2.0)]
    df = spark.createDataFrame(rows, "k long, a long, b double")
    out = {
        r["key"]: (r["rank_a"], r["rank_b"], r["rrf_score"])
        for r in rrf_fusion(df, "k", {"a": "a", "b": "b"}, num_partitions=2).collect()
    }
    spark.catalog.clearCache()
    assert out[1] == (1, 3, RRF_SCALE // 61 + RRF_SCALE // 63)
    assert out[2] == (2, 1, RRF_SCALE // 62 + RRF_SCALE // 61)
    assert out[3] == (3, 2, RRF_SCALE // 63 + RRF_SCALE // 62)


def test_rrf_ties_break_by_key(spark):
    from validate_spark.operators.indexing import rrf_fusion

    rows = [(5, 7), (1, 7), (9, 7)]  # all-tied signal -> ranks by key asc
    df = spark.createDataFrame(rows, "k long, s long")
    out = {
        r["key"]: r["rank_s"]
        for r in rrf_fusion(df, "k", {"s": "s"}, num_partitions=2).collect()
    }
    spark.catalog.clearCache()
    assert out == {1: 1, 5: 2, 9: 3}


# ---------------------------------------------------------------- weekday

def test_weekday_anomaly_flags_seasonal_outlier(spark):
    from validate_spark.operators.drift import weekday_anomaly

    # group "g": Mondays carry 10 events, all other days 2 — then one
    # Monday spikes to 30 and one Wednesday dips to 0 events (absent
    # day -> no row; plant a 20-event Wednesday instead).
    rows = []
    # 4 calendar weeks starting Mon 2024-01-01
    import datetime as dt

    d0 = dt.date(2024, 1, 1)
    for w in range(4):
        for dow in range(7):
            day = d0 + dt.timedelta(days=7 * w + dow)
            n = 10 if dow == 0 else 2
            if w == 3 and dow == 0:
                n = 30  # anomalous Monday
            if w == 3 and dow == 2:
                n = 20  # anomalous Wednesday
            rows += [(f"{day} 09:00:00", "g")] * n
    df = spark.createDataFrame(rows, "t string, g string").select(
        F.col("t").cast("timestamp").alias("ts"), "g"
    )
    out = weekday_anomaly(df, "ts", "g", k=3, min_obs=3)
    flagged = {str(r["day"]) for r in out.filter(F.col("anomaly")).collect()}
    assert flagged == {"2024-01-22", "2024-01-24"}
    # the 10-event Mondays are NOT anomalous against their own weekday
    monday_rows = {str(r["day"]): r for r in out.filter(F.col("dow") == 0).collect()}
    assert monday_rows["2024-01-01"]["anomaly"] is False
    # median of Mondays (10,10,10,30) = 10 -> med2 = 20
    assert monday_rows["2024-01-01"]["med2"] == 20


def test_weekday_anomaly_min_obs_gate(spark):
    from validate_spark.operators.drift import weekday_anomaly

    rows = [("2024-01-01 00:00:00", "g")] * 3 + [("2024-01-08 00:00:00", "g")] * 3
    df = spark.createDataFrame(rows, "t string, g string").select(
        F.col("t").cast("timestamp").alias("ts"), "g"
    )
    # two Monday observations < min_obs=3 -> no rows at all
    assert weekday_anomaly(df, "ts", "g", min_obs=3).count() == 0


# ---------------------------------------------------------------- spans

def _spans_df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, spans array<struct<kind:string,offset:int>>"
    )


def test_span_pattern_audit_adjacency(spark):
    from validate_spark.operators.multimodal import span_pattern_audit

    rows = [
        # captioned image, trailing text -> 0 uncaptioned
        (1, [("image", 0), ("text", 10), ("text", 20)]),
        # image followed by audio (unc) and trailing audio (unc) -> 2
        (2, [("text", 0), ("image", 10), ("audio", 20)]),
        # single media span, no next -> 1
        (3, [("image", 0)]),
        # empty + NULL spans degrade to zeros / monotone
        (4, []),
        (5, None),
    ]
    out = {
        r["doc_id"]: (r["n_spans"], r["n_media"], r["n_uncaptioned"], r["offsets_monotone"])
        for r in span_pattern_audit(_spans_df(spark, rows)).collect()
    }
    assert out[1] == (3, 1, 0, True)
    assert out[2] == (3, 2, 2, True)
    assert out[3] == (1, 1, 1, True)
    assert out[4] == (0, 0, 0, True)
    assert out[5] == (0, 0, 0, True)


def test_span_pattern_audit_offsets(spark):
    from validate_spark.operators.multimodal import span_pattern_audit

    rows = [
        (1, [("text", 0), ("text", 10), ("text", 5)]),   # regression
        (2, [("text", 0), ("text", 0)]),                 # duplicate = not strict
        (3, [("text", 3), ("text", 9), ("text", 27)]),   # ok
    ]
    out = {
        r["doc_id"]: r["offsets_monotone"]
        for r in span_pattern_audit(_spans_df(spark, rows)).collect()
    }
    assert out == {1: False, 2: False, 3: True}


def test_span_pattern_audit_is_native(spark):
    from validate_spark.operators.multimodal import span_pattern_audit

    df = _spans_df(spark, [(1, [("text", 0)])])
    plan = span_pattern_audit(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan   # one map-side projection, no shuffle
    assert "BatchEvalPython" not in plan


# ----------------------------------------------------------------- PQ ANN

def _pq_fixture(spark, n=40, d=16, seed=11):
    import random

    rng = random.Random(seed)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(d)]) for i in range(n)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    return rows, emb, q


def test_pq_matches_python_adc_model(spark):
    """Codes, ADC cells and ranks must equal an independent float64
    model of the same contract (sampled codebooks, argmin with
    (dist, code) ties, floor(d*1e6+0.5) cells, score asc / id asc)."""
    import hashlib
    import math

    from validate_spark.operators.similarity import (
        pq_adc_topk,
        pq_codebooks,
        pq_encode,
    )

    rows, emb, q = _pq_fixture(spark)
    m, n_codes, sub = 4, 8, 4
    cb = pq_codebooks(emb, m=m, n_codes=n_codes)
    assert len(cb) == m and len(cb[0]) == n_codes and len(cb[0][0]) == sub
    # codebook = subvectors of the n_codes smallest-md5(id) vectors
    f32 = {i: [float(__import__("numpy").float32(x)) for x in v]
           for i, v in rows}
    order = sorted(f32, key=lambda i: hashlib.md5(str(i).encode()).hexdigest())
    want_cb = [[f32[i][j * sub:(j + 1) * sub] for i in order[:n_codes]]
               for j in range(m)]
    assert cb == want_cb

    def dist(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s += (x - y) * (x - y)
        return s

    def code_of(v):
        return [min(range(n_codes),
                    key=lambda c: (dist(v[j*sub:(j+1)*sub], cb[j][c]), c))
                for j in range(m)]

    got_codes = {r["neighbor_id"]: list(r["codes"])
                 for r in pq_encode(emb, cb).collect()}
    assert got_codes == {i: code_of(v) for i, v in f32.items()}

    def adc(qv, codes):
        return sum(
            math.floor(dist(qv[j*sub:(j+1)*sub], cb[j][codes[j]]) * 1e6 + 0.5)
            for j in range(m)
        )

    want = {}
    for qid in (0, 1, 2):
        scored = sorted(
            ((adc(f32[qid], code_of(v)), i) for i, v in f32.items() if i != qid)
        )
        want[qid] = [i for _, i in scored[:5]]
    got = {}
    for r in pq_adc_topk(emb, q, cb, k=5).collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))
    got = {k: [i for _, i in sorted(v)] for k, v in got.items()}
    assert got == want


def test_pq_excludes_invalid_vectors(spark):
    from validate_spark.operators.similarity import pq_codebooks, pq_encode

    rows = [(0, [1.0] * 8), (1, [0.5] * 8), (2, None), (3, [1.0] * 5),
            (4, [float("nan")] * 8), (5, [0.25] * 8), (6, [0.75] * 8),
            (7, [0.1] * 8), (8, [0.9] * 8)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cb = pq_codebooks(emb, m=2, n_codes=4)
    assert all(len(c) == 4 and len(c[0]) == 4 for c in cb)
    coded = {r["neighbor_id"] for r in pq_encode(emb, cb).collect()}
    assert coded == {0, 1, 5, 6, 7, 8}  # NULL/ragged/NaN excluded


# ------------------------------------------------------------ layout advisor

def test_layout_advisor_ranks_disjoint_first(spark):
    from validate_spark.operators.indexing import layout_advisor

    # 3 partitions; "good" has disjoint ranges, "bad" identical ones,
    # "half" overlaps between adjacent partitions only
    rows = []
    for p, base in (("a", 0), ("b", 100), ("c", 200)):
        for i in range(5):
            rows.append((p, base + i, i, base + i * 30))  # good, bad, half
    df = spark.createDataFrame(rows, "part string, good long, bad long, half long")
    out = [r.asDict() for r in
           layout_advisor(df, "part", ["good", "bad", "half"]).collect()]
    assert [r["candidate"] for r in out] == ["good", "half", "bad"]
    by = {r["candidate"]: r for r in out}
    assert by["good"]["overlap_pairs"] == 0
    assert by["good"]["disjoint_parts"] == 3
    assert by["bad"]["overlap_pairs"] == 6  # every ordered pair
    assert by["bad"]["disjoint_parts"] == 0
    # half: ranges [0,120], [100,220], [200,320] → a-b and b-c overlap
    assert by["half"]["overlap_pairs"] == 4
    assert all(r["n_parts"] == 3 for r in out)


def test_layout_advisor_null_part_and_null_values(spark):
    from validate_spark.operators.indexing import layout_advisor

    rows = [("a", 1), ("a", 2), (None, 5), ("b", None)]
    df = spark.createDataFrame(rows, "part string, v int")
    out = {r["candidate"]: r for r in
           layout_advisor(df, "part", ["v"]).collect()}
    r = out["v"]
    # NULL part is its own partition; b's all-NULL range never matches
    assert r["n_parts"] == 3
    # ranges: a=[1,2], NULL-part=[5,5], b=NULL → no intersections
    assert r["overlap_pairs"] == 0 and r["disjoint_parts"] == 3


# ------------------------------------------------------- negative sampling

def test_negative_samples_excludes_same_label_and_is_deterministic(spark):
    import hashlib

    from validate_spark.operators.similarity import negative_samples

    rows = [(i, f"lab{i % 3}") for i in range(30)] + [(99, None)]
    emb = spark.createDataFrame(rows, "vec_id long, label string")
    anchors = spark.createDataFrame(
        [(0, "lab0"), (1, "lab1")], "anchor_id long, anchor_label string"
    )
    got = {}
    for r in negative_samples(emb, anchors, n=4).collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["neighbor_id"])
        )
    model = {}
    for aid, alab in ((0, "lab0"), (1, "lab1")):
        cands = [i for i, lab in rows
                 if lab is not None and lab != alab and i != aid]
        ranked = sorted(
            cands,
            key=lambda c: (hashlib.md5(f"{aid}|{c}".encode()).hexdigest()[:15], c),
        )[:4]
        model[aid] = [(k + 1, c) for k, c in enumerate(ranked)]
    assert {k: sorted(v) for k, v in got.items()} == model
    # no same-label negative ever appears
    labs = dict(rows)
    for aid, pairs in got.items():
        alab = "lab0" if aid == 0 else "lab1"
        assert all(labs[c] != alab for _, c in pairs)


def test_ivf_pq_full_probe_equals_plain_pq(spark):
    # nprobe = n_centroids probes every list → must equal pq_adc_topk
    # row for row (the q20 full-probe validation lifted to PQ)
    from validate_spark.operators.similarity import (
        ivf_pq_topk,
        pq_adc_topk,
        pq_codebooks,
        sample_centroids,
    )

    rows, emb, q = _pq_fixture(spark, n=40, d=16)
    cb = pq_codebooks(emb, m=4, n_codes=8)
    cents = sample_centroids(emb, 3)
    key = lambda r: (r["query_id"], r["rank"])
    full = sorted(ivf_pq_topk(emb, q, cents, cb, k=5, nprobe=3).collect(), key=key)
    plain = sorted(pq_adc_topk(emb, q, cb, k=5).collect(), key=key)
    assert full == plain


def test_ivf_pq_probe_restriction_is_subset(spark):
    from validate_spark.operators.similarity import (
        ivf_pq_topk,
        pq_codebooks,
        sample_centroids,
    )

    rows, emb, q = _pq_fixture(spark, n=40, d=16)
    cb = pq_codebooks(emb, m=4, n_codes=8)
    cents = sample_centroids(emb, 3)
    one = {(r["query_id"], r["neighbor_id"])
           for r in ivf_pq_topk(emb, q, cents, cb, k=40, nprobe=1).collect()}
    three = {(r["query_id"], r["neighbor_id"])
             for r in ivf_pq_topk(emb, q, cents, cb, k=40, nprobe=3).collect()}
    assert one < three  # strictly fewer candidates with fewer probes


def test_acf_report_alternating_and_constant(spark):
    from validate_spark.operators.drift import acf_report

    # alternating 10,20,10,20... over 8 days: lag-1 r = -1, lag-2 r = +1
    df = spark.createDataFrame(
        [("a", f"2024-01-{d:02d} 00:00:00") for d in range(1, 9)],
        "g string, ts string",
    ).selectExpr("g", "cast(ts as timestamp) ts")
    # counts: duplicate rows per day to shape the series
    import pyspark.sql.functions as F

    base = df.withColumn(
        "n", F.when(F.dayofmonth("ts") % 2 == 0, 2).otherwise(1)
    )
    events = base.select("g", F.explode(F.expr("sequence(1, n)")), "ts").select(
        "g", "ts"
    )
    out = {
        (r["g"], r["lag"]): r["acf"]
        for r in acf_report(events, "ts", "g", max_lag=3).collect()
    }
    assert out[("a", 1)] == -1.0
    assert out[("a", 2)] == 1.0
    # constant series -> zero variance -> NULL
    const = spark.createDataFrame(
        [("c", f"2024-01-{d:02d} 00:00:00") for d in range(1, 6)],
        "g string, ts string",
    ).selectExpr("g", "cast(ts as timestamp) ts")
    cr = acf_report(const, "ts", "g", max_lag=2).collect()
    assert all(r["acf"] is None for r in cr)
    # calendar gap: day 3 missing from 1..4 -> lag-1 pairs only (1,2),(3,4)
    gap = spark.createDataFrame(
        [("g", "2024-01-01"), ("g", "2024-01-02"), ("g", "2024-01-04"),
         ("g", "2024-01-05")],
        "g string, d string",
    ).selectExpr("g", "cast(d as timestamp) ts")
    gr = {r["lag"]: r["n_pairs"] for r in acf_report(gap, "ts", "g", max_lag=1).collect()}
    assert gr[1] == 2

    import pytest as _pt

    with _pt.raises(ValueError):
        acf_report(const, "ts", "g", max_lag=0)


def test_gini_concentration_hand_values(spark):
    from validate_spark.operators.stats import gini_concentration

    df = spark.createDataFrame(
        [("eq", 5), ("eq", 5), ("eq", 5), ("eq", 5),
         ("sk", 0), ("sk", 0), ("sk", 0), ("sk", 10),
         ("mx", 7), ("mx", -3), ("mx", None)],
        "g string, v long",
    )
    rows = {r["g"]: r for r in gini_concentration(df, "v", group_cols=["g"]).collect()}
    # equal distribution -> G = 0
    assert rows["eq"].gini == 0.0 and rows["eq"].n == 4
    # (0,0,0,10): num = 2*40 - 5*10 = 30, den = 40 -> 0.75
    assert rows["sk"].gini == 0.75 and rows["sk"].total == "10"
    # negative + NULL excluded, counted
    assert rows["mx"].n == 1 and rows["mx"].n_excluded == 2
    # single value -> G = 0 (num = 2*7 - 2*7)
    assert rows["mx"].gini == 0.0
