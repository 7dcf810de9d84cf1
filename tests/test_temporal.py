"""Temporal operators: sessionize / asof_join / range_join_bins.

Boundary semantics are the whole game here — each test pins one edge
the oracle SQL must agree on (exact-gap merge, inclusive as-of tie,
tolerance on floored seconds, inclusive range bounds) plus the plan
shapes that make the operators scale (no BroadcastNestedLoopJoin in
the binned range join; exactly one exchange in the as-of union plan).
"""

import datetime as dt

from pyspark.sql import functions as F

from validate_spark.operators.temporal import (
    asof_join,
    cohort_retention,
    event_stream_quality,
    funnel,
    range_join_bins,
    rolling_window_stats,
    sessionize,
)

T0 = dt.datetime(2024, 1, 1, 10, 0, 0)


def _m(minutes, seconds=0):
    return T0 + dt.timedelta(minutes=minutes, seconds=seconds)


def test_sessionize_exact_gap_merges(spark):
    # pinned by experiment: an event at EXACTLY prev + gap merges;
    # one microsecond past the padded end starts a new session
    df = spark.createDataFrame(
        [
            (1, _m(0)),
            (1, _m(30)),            # exactly gap after -> same session
            (1, _m(60), ),          # exactly gap after 10:30 -> merges again
            (1, _m(90, 1)),         # gap + 1s after 11:00 -> NEW session
            (2, _m(0)),
            (None, _m(0)),          # NULL user dropped
        ],
        "u long, ts timestamp",
    )
    out = sessionize(df, "u", "ts", gap="30 minutes")
    got = {
        (r["user"], r["session_start"], r["session_end"], r["n_events"])
        for r in out.collect()
    }
    assert got == {
        (1, _m(0), _m(60), 3),
        (1, _m(90, 1), _m(90, 1), 1),
        (2, _m(0), _m(0), 1),
    }


def test_sessionize_value_sum(spark):
    df = spark.createDataFrame(
        [(1, _m(0), 1.5), (1, _m(1), 2.5), (1, _m(200), 4.0)],
        "u long, ts timestamp, v double",
    )
    out = sessionize(df, "u", "ts", gap="30 minutes", value_col="v")
    got = sorted((r["n_events"], r["sum_value"]) for r in out.collect())
    assert got == [(1, 4.0), (2, 4.0)]


def test_asof_inclusive_tie_and_unmatched(spark):
    left = spark.createDataFrame(
        [(10, 1, _m(5)), (11, 1, _m(0)), (12, 2, _m(5)), (13, 3, _m(5))],
        "event_id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, _m(5), 100),   # tie with left event 10 -> matches (inclusive)
            (1, _m(1), 101),
            (2, _m(6), 102),   # after left 12 -> no match
        ],
        "k long, ts timestamp, rid long",
    )
    out = asof_join(
        left, right, key="k", left_ts="ts", right_ts="ts", payload=["rid"]
    )
    got = {(r["event_id"], r["r_rid"], r["asof_lag_s"]) for r in out.collect()}
    assert got == {
        (10, 100, 0),      # inclusive tie wins over the older click
        (11, None, None),  # left strictly before any right
        (12, None, None),  # right only exists after
        (13, None, None),  # key never on right
    }


def test_asof_tolerance_floored_seconds(spark):
    left = spark.createDataFrame(
        [(1, 1, _m(10))], "event_id long, k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, _m(0), 7)], "k long, ts timestamp, rid long"
    )
    within = asof_join(
        left, right, key="k", left_ts="ts", right_ts="ts",
        payload=["rid"], tolerance_s=600,
    )
    beyond = asof_join(
        left, right, key="k", left_ts="ts", right_ts="ts",
        payload=["rid"], tolerance_s=599,
    )
    assert [r["r_rid"] for r in within.collect()] == [7]
    assert [r["r_rid"] for r in beyond.collect()] == [None]


def test_asof_single_exchange_no_join(spark):
    left = spark.createDataFrame(
        [(1, 1, _m(0))], "event_id long, k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, _m(0), 1)], "k long, ts timestamp, rid long"
    )
    out = asof_join(
        left, right, key="k", left_ts="ts", right_ts="ts", payload=["rid"]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # re-expressed as union + window, no join op
    assert plan.count("Exchange hashpartitioning") == 1


def test_range_join_inclusive_bounds_and_multibin(spark):
    points = spark.createDataFrame(
        [(1, _m(0)), (2, _m(5)), (3, _m(10)), (4, _m(10, 1))],
        "pid long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        # 10-minute interval straddling a 600 s bin edge (explodes to 2 bins)
        [(100, _m(0), _m(10))],
        "iid long, lo timestamp, hi timestamp",
    )
    out = range_join_bins(
        points, intervals, point_ts="ts", lo="lo", hi="hi",
        bin_width_s=600, point_cols=["pid"], interval_cols=["iid"],
    )
    got = sorted(r["pid"] for r in out.collect())
    assert got == [1, 2, 3]  # both ends inclusive; 10:10:01 out; no dup rows
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan  # the rewrite's whole point


def test_sessionize_streaming_equals_batch(spark, tmp_path):
    """The batch≡streaming claim, proven: the SAME sessionize call on a
    readStream source (3 chunk files deliberately NOT time-ordered,
    one per micro-batch) produces the batch result — session merging
    across micro-batches included. Complete mode + huge watermark for
    chunk-order independence (q89 fixture convention); sums compared
    at round-6 (addition order differs across micro-batches)."""
    import uuid

    from pyspark.sql import functions as F

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    batch = sessionize(ev, "user_id", "ts", gap="6 hours", value_col="value")

    def norm(rows):
        return sorted(
            (r["user"], r["session_start"], r["session_end"], r["n_events"],
             round(r["sum_value"], 6))
            for r in rows
        )

    src = str(tmp_path / "chunks")
    for i in range(3):
        (
            ev.filter(F.pmod(F.coalesce(F.col("event_id"), F.lit(0)), F.lit(3)) == i)
            .coalesce(1).write.mode("append").parquet(src)
        )
    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1)
        .parquet(src).withColumn("ts", F.col("ts").cast("timestamp"))
    )
    out = sessionize(
        stream, "user_id", "ts", gap="6 hours", value_col="value",
        watermark="3650 days",
    )
    name = "sess_eq_" + uuid.uuid4().hex[:6]
    q = (
        out.writeStream.format("memory").queryName(name)
        .outputMode("complete").trigger(availableNow=True).start()
    )
    try:
        q.awaitTermination(300)
        assert norm(spark.table(name).collect()) == norm(batch.collect())
    finally:
        spark.catalog.dropTempView(name)


def test_range_join_microsecond_bounds(spark):
    # regression: an early version compared floored SECONDS, admitting
    # points fractionally past hi; the predicate must be full-precision
    hi = _m(10) + dt.timedelta(microseconds=500_000)
    points = spark.createDataFrame(
        [(1, hi), (2, hi + dt.timedelta(microseconds=1))],
        "pid long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [(100, _m(0), hi)], "iid long, lo timestamp, hi timestamp"
    )
    out = range_join_bins(
        points, intervals, point_ts="ts", lo="lo", hi="hi",
        bin_width_s=600, point_cols=["pid"], interval_cols=["iid"],
    )
    assert sorted(r["pid"] for r in out.collect()) == [1]


def test_event_stream_quality_counters(spark):
    df = spark.createDataFrame(
        [
            (1, 10, _m(0)),
            (1, 11, _m(0)),            # exact-ts duplicate
            (1, 5, _m(1)),             # seq inversion (5 < 11)
            (1, 12, _m(1, 1)),
            (1, 13, _m(2000)),         # gap 1999m59s > 1000s -> big gap
            (2, 20, _m(0)),            # singleton: NULL max_gap
            (None, 1, _m(0)),          # dropped
        ],
        "u long, eid long, ts timestamp",
    )
    out = event_stream_quality(df, "u", "ts", "eid", big_gap_s=1000)
    got = {
        (r["user"], r["n_events"], r["n_big_gaps"], r["max_gap_s"],
         r["n_seq_inversions"], r["n_ts_dups"])
        for r in out.collect()
    }
    assert got == {
        (1, 5, 1, (2000 - 1) * 60 - 1, 1, 1),
        (2, 1, 0, None, 0, 0),
    }


def test_funnel_depths_and_windows(spark):
    rows = [
        # u1: full conversion, click ties signup ts (inclusive, seq after)
        (1, 1, "signup", _m(0)),
        (1, 2, "click", _m(0)),
        (1, 3, "purchase", _m(5)),
        # u2: click BEFORE first signup never counts; later click in
        # window does; purchase outside the 10-min window -> depth 2
        (2, 1, "click", _m(0)),
        (2, 2, "signup", _m(1)),
        (2, 3, "click", _m(5)),
        (2, 4, "purchase", _m(15, 1)),
        # u3: signup only
        (3, 1, "signup", _m(0)),
        # u4: no signup at all -> depth 0
        (4, 1, "click", _m(0)),
    ]
    df = spark.createDataFrame(rows, "u long, eid long, k string, ts timestamp")
    out = funnel(
        df, "u", "ts", "k", "eid",
        steps=("signup", "click", "purchase"), within_s=600,
    )
    got = {(r["user"], r["depth"], r["t2"]) for r in out.collect()}
    assert got == {
        (1, 3, _m(0)),
        (2, 2, _m(5)),
        (3, 1, None),
        (4, 0, None),
    }


def test_funnel_single_exchange(spark):
    df = spark.createDataFrame(
        [(1, 1, "signup", _m(0))], "u long, eid long, k string, ts timestamp"
    )
    out = funnel(
        df, "u", "ts", "k", "eid",
        steps=("signup", "click", "purchase"), within_s=600,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # three window passes + the final groupBy share one hash exchange
    assert plan.count("Exchange hashpartitioning") == 1


def test_cohort_retention_matrix(spark):
    d0 = dt.datetime(2024, 1, 1, 12, 0)

    def day(n, h=0):
        return d0 + dt.timedelta(days=n, hours=h)

    df = spark.createDataFrame(
        [
            # u1: first day 0; active weeks 0 and 2 (day 15)
            (1, day(0)), (1, day(0, 3)), (1, day(15)),
            # u2: first day 3 (same cohort day? no - cohort 2024-01-04);
            # active week 0 only
            (2, day(3)),
            # u3: cohort day 0, active weeks 0,1
            (3, day(0)), (3, day(8)),
            # activity beyond n_weeks is ignored (week 6)
            (1, day(44)),
        ],
        "u long, ts timestamp",
    )
    out = cohort_retention(df, "u", "ts", n_weeks=4)
    got = {
        (str(r["cohort_day"]), r["n_users"], r["w0"], r["w1"], r["w2"], r["w3"])
        for r in out.collect()
    }
    assert got == {
        ("2024-01-01", 2, 2, 1, 1, 0),
        ("2024-01-04", 1, 1, 0, 0, 0),
    }
    # no Expand in the rollup (the multiple-countDistinct trap)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan


def test_rolling_window_range_frame(spark):
    t = dt.datetime(2024, 1, 1, 0, 0, 0)

    def s(n):
        return t + dt.timedelta(seconds=n)

    df = spark.createDataFrame(
        [
            (1, 1, s(0), 1.0),
            (2, 1, s(100), 2.0),       # window 100s: includes s(0) (inclusive)
            (3, 1, s(100), 4.0),       # tie: RANGE frame includes BOTH peers
            (4, 1, s(201), 8.0),       # s(101)..s(201): only itself + ties at 100? no: 100 < 101 -> out
            (5, 2, s(0), 16.0),
        ],
        "event_id long, u long, ts timestamp, v double",
    )
    out = rolling_window_stats(
        df, "u", "ts", window_s=100, value_col="v", out_cols=["event_id"]
    )
    got = {(r["event_id"], r["n_in_window"], r["sum_in_window"]) for r in out.collect()}
    assert got == {
        (1, 1, 1.0),
        (2, 3, 7.0),   # tie peers both in frame regardless of row order
        (3, 3, 7.0),
        (4, 1, 8.0),
        (5, 1, 16.0),
    }


def test_range_join_matches_bruteforce(spark):
    import random

    rng = random.Random(11)
    points = spark.createDataFrame(
        [(i, _m(0, rng.randrange(0, 7200))) for i in range(300)],
        "pid long, ts timestamp",
    )
    ivs = [
        (j, _m(0, s), _m(0, s + rng.randrange(0, 590)))
        for j, s in ((j, rng.randrange(0, 7200)) for j in range(40))
    ]
    intervals = spark.createDataFrame(ivs, "iid long, lo timestamp, hi timestamp")
    out = range_join_bins(
        points, intervals, point_ts="ts", lo="lo", hi="hi",
        bin_width_s=600, point_cols=["pid"], interval_cols=["iid"],
    )
    got = {(r["iid"], r["pid"]) for r in out.collect()}
    raw_points = {r["pid"]: r["ts"] for r in points.collect()}
    want = {
        (j, pid)
        for j, lo, hi in ivs
        for pid, ts in raw_points.items()
        if lo <= ts <= hi
    }
    assert got == want


def test_hopping_window_counts_semantics(spark):
    import pytest

    from validate_spark.operators.temporal import hopping_window_counts

    t = dt.datetime(2024, 1, 1, 0, 0, 0)

    def s(n):
        return t + dt.timedelta(seconds=n)

    # window 20s / slide 10s -> every event in exactly 2 windows;
    # boundaries are half-open [start, end): an event AT a window's
    # end belongs to the next two windows, not the ending one
    df = spark.createDataFrame(
        [(1, s(0), 1.0), (2, s(20), 2.0), (3, s(25), 4.0)],
        "event_id long, ts timestamp, v double",
    )
    out = hopping_window_counts(df, "ts", window_s=20, slide_s=10, value_col="v")
    rows = {
        (r["window_start"].strftime("%H:%M:%S"), r["n_events"], r["sum_value"])
        for r in out.collect()
    }
    assert rows == {
        # event 1 (t=0): windows starting at -10 and 0
        ("23:59:50", 1, 1.0),
        ("00:00:00", 1, 1.0),
        # t=20 is NOT in [00:00:10, 00:00:30)? it IS: 10 <= 20 < 30.
        # windows [10,30): events 2,3; [20,40): events 2,3
        ("00:00:10", 2, 6.0),
        ("00:00:20", 2, 6.0),
    }
    # every event lands in exactly window/slide windows
    assert out.agg(F.sum("n_events")).first()[0] == 3 * 2

    with pytest.raises(ValueError):
        hopping_window_counts(df, "ts", window_s=25, slide_s=10)


def test_interval_join_bounds_and_plan(spark):
    from validate_spark.operators.temporal import interval_join

    left = spark.createDataFrame(
        [(1, _m(60), 10), (2, _m(60), 20), (None, _m(60), 30)],
        "k long, ts timestamp, lid int",
    )
    right = spark.createDataFrame(
        [
            (1, _m(30), 100),   # exactly lower bound (-30 min): IN
            (1, _m(29, 59), 101),  # 1 s before lower bound: OUT
            (1, _m(60), 102),   # exactly upper bound (0): IN
            (1, _m(60, 1), 103),   # 1 s after: OUT
            (2, _m(45), 104),   # other key
            (None, _m(45), 105),   # NULL key: dropped
        ],
        "k long, ts timestamp, rid int",
    )
    out = interval_join(
        left, right, "k", "ts", "ts",
        lower_s=-1800, upper_s=0, left_cols=["lid"], right_cols=["rid"],
    )
    got = {(r["k"], r["lid"], r["rid"]) for r in out.collect()}
    assert got == {(1, 10, 100), (1, 10, 102), (2, 20, 104)}
    # equality key must plan as an equi-join, never a nested loop
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan


def test_interval_join_streaming_equals_batch(spark, tmp_path):
    """Stream-stream inner join across micro-batch boundaries: the
    SAME interval_join expression, chunked sources NOT time-ordered,
    append mode (the only stream-stream mode) + huge watermark —
    emitted pair SET equals the batch join."""
    import uuid

    from validate_spark.operators.temporal import interval_join

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    err = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", F.col("event_id").alias("err_id"))
    clk = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id"))

    kw = dict(lower_s=-6 * 3600, upper_s=0,
              left_cols=["err_id"], right_cols=["click_id"])
    batch = interval_join(err, clk, "user_id", "ts", "ts", **kw)

    def norm(rows):
        return sorted((r["err_id"], r["click_id"]) for r in rows)

    srcs = {}
    for kind, cohort in (("e", err), ("c", clk)):
        src = str(tmp_path / kind)
        for i in range(3):
            key = "err_id" if kind == "e" else "click_id"
            (cohort.filter(F.pmod(F.coalesce(F.col(key), F.lit(0)), F.lit(3)) == i)
             .coalesce(1).write.mode("append").parquet(src))
        srcs[kind] = src
    es = (spark.readStream.schema(err.schema)
          .option("maxFilesPerTrigger", 1).parquet(srcs["e"]))
    cs = (spark.readStream.schema(clk.schema)
          .option("maxFilesPerTrigger", 1).parquet(srcs["c"]))
    out = interval_join(es, cs, "user_id", "ts", "ts",
                        watermark="3650 days", **kw)
    name = "ivj_eq_" + uuid.uuid4().hex[:6]
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    try:
        q.awaitTermination(300)
        assert norm(spark.table(name).collect()) == norm(batch.collect())
        assert len(norm(batch.collect())) > 0
    finally:
        spark.catalog.dropTempView(name)


def test_densify_daily_zero_fills_gaps(spark):
    from validate_spark.operators.temporal import densify_daily

    d0 = dt.datetime(2024, 1, 1, 12, 0)
    df = spark.createDataFrame(
        [
            (1, d0, 2.0), (1, d0 + dt.timedelta(days=2), 3.0),  # gap day 2
            (2, d0 + dt.timedelta(days=9), 5.0),                # own span
            (None, d0, 1.0),                                    # dropped
        ],
        "u long, ts timestamp, v double",
    )
    out = densify_daily(df, "u", "ts", value_col="v")
    got = {(r["key"], str(r["day"]), r["n_events"], r["sum_value"])
           for r in out.collect()}
    assert got == {
        (1, "2024-01-01", 1, 2.0),
        (1, "2024-01-02", 0, 0.0),   # the zero-filled quiet day
        (1, "2024-01-03", 1, 3.0),
        (2, "2024-01-10", 1, 5.0),   # spans are PER KEY, not global
    }


def test_interval_join_left_outer_batch(spark):
    """Batch left-outer: unmatched left rows kept with NULL right
    columns; matched semantics identical to inner."""
    import datetime as dt

    from validate_spark.operators.temporal import interval_join

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame(
        [(1, t0, 100), (1, t0 + dt.timedelta(hours=9), 101),
         (2, t0, 102),
         # NULL event time: dropped in BOTH modes (cannot be
         # watermark-resolved; batch mirrors streaming)
         (2, None, 103)],
        "k long, ts timestamp, lid long",
    )
    right = spark.createDataFrame(
        [(1, t0 - dt.timedelta(hours=1), 200),   # 1h before lid=100: in
         (2, t0 + dt.timedelta(seconds=1), 201)],  # after lid=102: out
        "k long, ts timestamp, rid long",
    )
    out = interval_join(
        left, right, "k", "ts", "ts",
        lower_s=-6 * 3600, upper_s=0,
        left_cols=["lid"], right_cols=["rid"], how="left_outer",
    )
    rows = {r["lid"]: r["rid"] for r in out.collect()}
    assert rows == {100: 200, 101: None, 102: None}


def test_interval_join_streaming_left_outer_equals_batch(spark, tmp_path):
    """Streaming left-outer == batch left-outer once sentinels march
    the watermark past the data (and the sentinel filter stays OUT of
    the streaming query — a pre-sink key filter lands below the
    watermark node and withholds outer rows; q148's bug)."""
    import datetime as dt
    import time

    from pyspark.sql import functions as F

    from validate_spark.operators.temporal import interval_join

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    far1 = dt.datetime(2200, 1, 1)
    far2 = dt.datetime(2210, 1, 1)
    far3 = dt.datetime(2220, 1, 1)
    lrows = [(1, t0, 100), (1, t0 + dt.timedelta(hours=9), 101),
             (2, t0, 102)]
    rrows = [(1, t0 - dt.timedelta(hours=1), 200),
             (2, t0 + dt.timedelta(seconds=1), 201)]
    schema = "k long, ts timestamp, pid long"
    for side, rows in (("l", lrows), ("r", rrows)):
        src = str(tmp_path / side)
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        for i, far in enumerate((far1, far2, far3)):
            time.sleep(0.3)
            spark.createDataFrame(
                [(-999, far, -(i + 1))], schema
            ).coalesce(1).write.mode("append").parquet(src)
    ls = (spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(str(tmp_path / "l"))
          .select("k", "ts", F.col("pid").alias("lid")))
    rs = (spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(str(tmp_path / "r"))
          .select("k", "ts", F.col("pid").alias("rid")))
    j = interval_join(
        ls, rs, "k", "ts", "ts", lower_s=-6 * 3600, upper_s=0,
        left_cols=["lid"], right_cols=["rid"],
        watermark="1 hour", how="left_outer",
    )
    name = "t_ivj_outer"
    q = (j.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    while q.isActive:
        q.awaitTermination(2)
    got = {r["lid"]: r["rid"]
           for r in spark.table(name).filter(F.col("k") != -999).collect()}
    assert got == {100: 200, 101: None, 102: None}


def test_debounce_chains_to_previous_event_not_kept_one(spark):
    """True debounce: event 3 of a long chain is suppressed because it
    is within gap of event 2 (also suppressed), even though it is
    beyond gap of the KEPT event — the naive lag-vs-kept filter gets
    this wrong."""
    import datetime as dt

    from validate_spark.operators.temporal import debounce_first

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    s = lambda x: t0 + dt.timedelta(seconds=x)  # noqa: E731
    ev = spark.createDataFrame(
        [(1, s(0), 10), (1, s(90), 11), (1, s(180), 12),  # one chain
         (1, s(500), 13),                                  # new burst
         (2, s(0), 20)],
        "user_id long, ts timestamp, event_id long",
    )
    rows = {(r["key"], r["kept_id"]): r["n_folded"]
            for r in debounce_first(
                ev, "user_id", "ts", "event_id", gap="2 minutes"
            ).collect()}
    # chain 10->11->12 folds into one burst (12 is 180s from 10 but
    # only 90s from 11); 13 starts fresh; user 2 independent
    assert rows == {(1, 10): 2, (1, 13): 0, (2, 20): 0}


# -------------------------------------------------------------- scd2_build

def test_scd2_change_compression_and_intervals(spark):
    import datetime as dt

    from validate_spark.operators.temporal import scd2_build

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        (1, "A", t(0), 10), (1, "A", t(1), 11),  # repeat → same version
        (1, "B", t(2), 12), (1, "A", t(3), 13),  # A again = NEW version
        (2, "X", t(0), 20),
        (None, "A", t(0), 1), (3, None, t(0), 2), (3, "A", None, 3),
    ]
    df = spark.createDataFrame(
        rows, "user long, state string, ts timestamp, eid long"
    )
    out = sorted(
        ((r["key"], r["version"], r["attr"], r["eff_from"], r["eff_to"])
         for r in scd2_build(df, "user", "state", "ts",
                             tiebreak_col="eid").collect())
    )
    assert out == [
        (1, 1, "A", t(0), t(2)),
        (1, 2, "B", t(2), t(3)),
        (1, 3, "A", t(3), None),
        (2, 1, "X", t(0), None),
    ]


def test_scd2_tiebreak_orders_equal_timestamps(spark):
    import datetime as dt

    from validate_spark.operators.temporal import scd2_build

    ts = dt.datetime(2024, 1, 1)
    # same timestamp: eid decides the run order; NULL eid coalesces
    # to -1 and sorts FIRST in both engines
    rows = [(1, "B", ts, 5), (1, "A", ts, None), (1, "B", ts, 7)]
    df = spark.createDataFrame(
        rows, "user long, state string, ts timestamp, eid long"
    )
    out = {r["version"]: r["attr"]
           for r in scd2_build(df, "user", "state", "ts",
                               tiebreak_col="eid").collect()}
    assert out == {1: "A", 2: "B"}  # A(eid -1), then B,B compressed


# ------------------------------------------- interval_overlap_audit
def test_interval_overlap_audit_umbrella_gap_inverted(spark):
    from validate_spark.operators.temporal import interval_overlap_audit

    rows = [
        # k1: umbrella [1,30) shadows [5,8); [10,12) overlaps umbrella
        # even though its LAG predecessor [5,8) ended — the lag-only
        # audit's classic miss
        ("k1", "2024-01-01", "2024-01-30"),
        ("k1", "2024-01-05", "2024-01-08"),
        ("k1", "2024-01-10", "2024-01-12"),
        # k2: clean chain with a 3-day gap
        ("k2", "2024-01-01", "2024-01-05"),
        ("k2", "2024-01-08", "2024-01-10"),
        # k3: inverted interval acts as a point
        ("k3", "2024-01-10", "2024-01-02"),
        ("k3", "2024-01-11", "2024-01-12"),
    ]
    df = spark.createDataFrame(rows, "k string, s string, e string").selectExpr(
        "k", "cast(s as date) valid_from", "cast(e as date) valid_to"
    )
    out = {
        r["k"]: r
        for r in interval_overlap_audit(df, "k", "valid_from", "valid_to").collect()
    }
    k1 = out["k1"]
    assert k1.n_overlapping == 2  # both inner intervals, not just lag-adjacent
    assert k1.overlap_days == 3 + 2  # [5,8)->3 days, [10,12)->2 days
    assert k1.n_gaps == 0 and k1.span_days == 29
    k2 = out["k2"]
    assert (k2.n_overlapping, k2.n_gaps, k2.gap_days) == (0, 1, 3)
    k3 = out["k3"]
    assert k3.n_inverted == 1
    assert k3.n_gaps == 1 and k3.gap_days == 1  # point at 10 -> gap to 11


# ------------------------------------------------- robotic_cadence
def test_robotic_cadence_metronome_vs_bursty(spark):
    import datetime as dt

    from validate_spark.operators.temporal import robotic_cadence

    base = dt.datetime(2024, 1, 1)
    rows = [("bot", base + dt.timedelta(seconds=60 * i)) for i in range(10)]
    # 10% tolerance boundary: gaps 99,101 around mean 100 -> spread 2,
    # 2*100*n <= 10*sum holds exactly at equality
    rows += [
        ("edge", base),
        ("edge", base + dt.timedelta(seconds=99)),
        ("edge", base + dt.timedelta(seconds=200)),
        ("edge", base + dt.timedelta(seconds=299)),
        ("edge", base + dt.timedelta(seconds=400)),
    ]
    rows += [
        ("human", base + dt.timedelta(seconds=s))
        for s in (0, 5, 300, 310, 2000, 2100)
    ]
    rows += [("few", base), ("few", base + dt.timedelta(seconds=60))]
    df = spark.createDataFrame(rows, "u string, ts timestamp")
    out = {r["u"]: r for r in robotic_cadence(df, "ts", "u").collect()}
    assert "few" not in out  # below min_events
    assert out["bot"].robotic and out["bot"].mean_gap_us == 60_000_000
    assert out["bot"].n_gaps == 9
    assert out["edge"].robotic  # spread exactly at the 10% boundary
    assert (out["edge"].min_gap_us, out["edge"].max_gap_us) == (
        99_000_000,
        101_000_000,
    )
    assert not out["human"].robotic


def test_robotic_cadence_tie_timestamps_deterministic(spark):
    """Duplicate timestamps: the diff multiset is tie-order
    independent — gap 0 appears, min_gap_us = 0, never negative."""
    import datetime as dt

    from validate_spark.operators.temporal import robotic_cadence

    base = dt.datetime(2024, 1, 1)
    rows = [
        ("u", base),
        ("u", base),
        ("u", base + dt.timedelta(seconds=10)),
        ("u", base + dt.timedelta(seconds=10)),
        ("u", base + dt.timedelta(seconds=20)),
    ]
    df = spark.createDataFrame(rows, "u string, ts timestamp")
    r = robotic_cadence(df, "ts", "u").collect()[0]
    assert (r.min_gap_us, r.max_gap_us, r.n_gaps) == (0, 10_000_000, 4)
    assert not r.robotic


def test_robotic_cadence_min_events_guard(spark):
    import pytest

    from validate_spark.operators.temporal import robotic_cadence

    df = spark.createDataFrame([], "u string, ts timestamp")
    with pytest.raises(ValueError):
        robotic_cadence(df, "ts", "u", min_events=1)
