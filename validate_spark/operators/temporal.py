"""Temporal operators: sessionization, as-of join, binned range join.

The reference has no temporal operators at all (per-record validation,
SURVEY.md §2.12) — these are the table-scale lift of its date family
(validators_compare.go:204-281: date parsing + before/after ordering
checks) to the three event-time shapes every large pipeline needs:

- ``sessionize``: gap-based event sessions. Spark-first: the NATIVE
  ``F.session_window`` aggregate (one hash-partitioned shuffle on the
  user key with map-side partial session merging — the same operator
  that runs under Structured Streaming with a watermark, so the batch
  and streaming plans share semantics).
- ``asof_join``: for each left row, the most recent right row
  at-or-before it on the same key. Spark has no ASOF JOIN; the
  scale-correct re-expression is the tagged-union trick — union both
  sides, one window partitioned by key ordered by (ts, side), and a
  running ``last_value(..., ignorenulls)`` carries the latest right
  payload forward into each left row. ONE shuffle, no join at all, no
  per-left-row probe; skew bound = rows per key (same bound any
  keyed shuffle has).
- ``range_join_bins``: point-in-interval join WITHOUT an equality key.
  Naive Spark planning of an inequality-only join is
  BroadcastNestedLoopJoin (O(|L|·|R|) compares — dead at 10^12 rows).
  Binning restores an equi-join: intervals explode into the fixed-width
  bins they cover, points hash to their bin, the join runs on the bin
  key, and the exact predicate filters within the bin. With
  ``bin_width >= max interval length`` each interval covers <= 2 bins,
  so the blow-up factor is bounded by 2 and each (interval, point)
  pair meets at most once per covered bin of the point — exactly once,
  since a point lives in exactly one bin. No distinct needed.

Boundary semantics (pinned by experiment, tests/test_temporal*):
- session_window merges an event at EXACTLY prev + gap (a new session
  starts only when the gap is STRICTLY exceeded) — the DuckDB oracle's
  gaps-and-islands flag must be ``(ts - prev) > gap``, not ``>=``.
- asof_join is INCLUSIVE (right_ts == left_ts matches), matching
  DuckDB's ``ASOF JOIN ... ON l.ts >= r.ts``.
- range_join_bins bounds are inclusive on both ends.

All timestamps are cast to TIMESTAMP (LTZ) on entry: parquet columns
read as TIMESTAMP_NTZ, and the session timezone is UTC so the wall
clock — and therefore DuckDB's naive timestamp arithmetic — is
preserved (CLAUDE.md round-4 gotcha).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def _ts(col: str) -> Column:
    # try_cast, not cast: a malformed/overflow timestamp must fail the
    # row, never the job (ANSI mode).
    return F.col(col).try_cast("timestamp")


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    *,
    gap: str = "30 minutes",
    value_col: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Gap-based sessions per user → one row per session:
    ``(user, session_start, session_end, n_events, n_types?, sum_value?)``.

    session_start/end are min/max EVENT times (not the padded window
    end = last + gap, which bakes the gap into the output and is the
    less portable contract). Rows with a NULL user or NULL/unparseable
    timestamp are dropped (they belong to no session) — stated, not
    silent.

    Scale: one shuffle (hash on user), map-side partial session
    aggregation; state per task is the open sessions of its keys. The
    identical expression runs under readStream + withWatermark.
    """
    ts = _ts(ts_col)
    base = df.filter(F.col(user_col).isNotNull() & ts.isNotNull()).select(
        F.col(user_col).alias("user"), ts.alias("_ts"),
        *( [F.col(value_col).alias("_v")] if value_col else [] ),
    )
    if watermark is not None:
        # streaming path: the watermark must attach to the session
        # window's event-time column (_ts, post-cast — parquet NTZ
        # columns are not watermarkable); the rest of the plan is
        # byte-identical to the batch path, which is the point —
        # batch and streaming sessionization share one expression.
        base = base.withWatermark("_ts", watermark)
    aggs = [
        F.min("_ts").alias("session_start"),
        F.max("_ts").alias("session_end"),
        F.count("*").alias("n_events"),
    ]
    if value_col:
        aggs.append(F.sum("_v").alias("sum_value"))
    return (
        base.groupBy(F.session_window("_ts", gap).alias("_w"), F.col("user"))
        .agg(*aggs)
        .drop("_w")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
    tolerance_s: int | None = None,
    prefix: str = "r_",
) -> DataFrame:
    """For each left row: the most recent right row with
    ``right.key == left.key AND right_ts <= left_ts`` (inclusive),
    optionally within ``tolerance_s`` seconds. Unmatched (or
    out-of-tolerance) left rows keep NULL right columns (LEFT as-of).

    Output = every left column + ``{prefix}{payload...}`` +
    ``{prefix}ts`` + ``asof_lag_s`` (left_ts - matched ts, seconds).

    PRECONDITION: right is unique per (key, right_ts) — pre-aggregate
    otherwise (ties among identical right timestamps have no defined
    winner in any engine's ASOF).

    Plan: tagged union + ONE window (partition key, order ts then
    side so a right row at exactly left_ts sorts first and is visible
    to it) + running last_value(ignorenulls) over ROWS UNBOUNDED
    PRECEDING..CURRENT ROW — running state is ONE payload struct per
    key, no join, no per-row probe. At 10^12 rows this is strictly one
    shuffle of |L|+|R| rows on the key.
    """
    lts, rts = _ts(left_ts), _ts(right_ts)
    pay = F.struct(rts.alias("_pts"), *[F.col(c) for c in payload])
    r = right.select(
        F.col(key).alias("_k"), rts.alias("_t"), F.lit(0).alias("_side"),
        pay.alias("_pay"), *[F.lit(None).cast(left.schema[c].dataType).alias(c)
                             for c in left.columns],
    )
    l = left.select(
        F.col(key).alias("_k"), lts.alias("_t"), F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_pay"].dataType).alias("_pay"), *left.columns,
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = l.unionByName(r).withColumn("_m", F.last("_pay", ignorenulls=True).over(w))
    out = u.filter(F.col("_side") == 1)
    m = F.col("_m")
    lag_s = F.col("_t").cast("long") - m["_pts"].cast("long")
    if tolerance_s is not None:
        m = F.when(lag_s <= int(tolerance_s), F.col("_m"))
        lag_s = F.col("_t").cast("long") - m["_pts"].cast("long")
    return out.select(
        *left.columns,
        m["_pts"].alias(f"{prefix}ts"),
        *[m[c].alias(f"{prefix}{c}") for c in payload],
        lag_s.alias("asof_lag_s"),
    )


def event_stream_quality(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    seq_col: str,
    *,
    big_gap_s: int = 86400,
) -> DataFrame:
    """Per-key event-stream health: the table-scale lift of the
    reference's ordering checks (afterDate/beforeDate,
    validators_compare.go:204-281, are row-local; an event STREAM's
    ordering invariant lives across rows of a key).

    One row per key: ``(user, n_events, n_big_gaps, max_gap_s,
    n_seq_inversions, n_ts_dups)`` where, in (ts, seq) order per key:
    - n_big_gaps / max_gap_s: inter-arrival gaps (microsecond-exact
      diffs, reported floored to seconds) exceeding ``big_gap_s``;
    - n_seq_inversions: rows whose seq id is LOWER than the previous
      row's (ingestion disorder — time moved forward, ids moved back);
    - n_ts_dups: rows sharing an exact timestamp with the previous row.

    One shuffle (window on the key) feeding a same-key groupBy — the
    aggregation is co-partitioned with the window, no second exchange.
    NULL key/ts rows are dropped (no stream to belong to).
    """
    ts, seq = _ts(ts_col), F.col(seq_col)
    base = df.filter(F.col(user_col).isNotNull() & ts.isNotNull()).select(
        F.col(user_col).alias("user"), ts.alias("_ts"), seq.alias("_seq")
    )
    w = Window.partitionBy("user").orderBy("_ts", "_seq")
    us = F.unix_micros(F.col("_ts"))
    gap_us = us - F.unix_micros(F.lag("_ts").over(w))
    ann = base.select(
        "user",
        gap_us.alias("_gap_us"),
        (F.col("_seq") < F.lag("_seq").over(w)).alias("_inv"),
        (F.col("_ts") == F.lag("_ts").over(w)).alias("_dup"),
    )
    big = int(big_gap_s) * 1_000_000
    return ann.groupBy("user").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("_gap_us") > big, 1).otherwise(0)).alias("n_big_gaps"),
        F.floor(F.max("_gap_us") / 1_000_000).alias("max_gap_s"),
        F.sum(F.when(F.col("_inv"), 1).otherwise(0)).alias("n_seq_inversions"),
        F.sum(F.when(F.col("_dup"), 1).otherwise(0)).alias("n_ts_dups"),
    )


def funnel(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    seq_col: str,
    *,
    steps: tuple[str, str, str],
    within_s: int,
) -> DataFrame:
    """3-step conversion funnel per key: first ``steps[0]`` event, then
    the first ``steps[1]`` within ``within_s`` seconds AFTER it
    (inclusive ties), then the first ``steps[2]`` within ``within_s``
    after that → ``(user, t1, t2, t3, depth)``.

    Spark-first trick: each stage's "first qualifying event so far" is
    a running ``min(CASE ...)`` window over the SAME (key, ts, seq)
    sort — for every row past the stage's first qualifier, the running
    min EQUALS that qualifier, so stage n+1's predicate can reference
    it row-locally. Three window passes share ONE exchange + sort
    (same partitioning/ordering), then a co-partitioned groupBy
    finalizes — one shuffle total, no self-joins, no collect_list
    (state stays O(1) per row regardless of per-key cardinality;
    capped-collect designs do not).

    Microsecond-exact arithmetic (unix_micros both engines); window
    frames stated as ROWS explicitly (the RANGE-default tie gotcha).
    """
    s1, s2, s3 = steps
    lim = int(within_s) * 1_000_000
    ts = _ts(ts_col)
    base = df.filter(F.col(user_col).isNotNull() & ts.isNotNull()).select(
        F.col(user_col).alias("user"), ts.alias("_ts"),
        F.col(type_col).alias("_k"), F.col(seq_col).alias("_seq"),
    )
    w = (
        Window.partitionBy("user")
        .orderBy("_ts", "_seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    us = F.unix_micros(F.col("_ts"))
    t1r = F.min(F.when(F.col("_k") == s1, F.col("_ts"))).over(w)
    c2 = (
        (F.col("_k") == s2)
        & t1r.isNotNull()
        & ((us - F.unix_micros(t1r)) <= lim)
    )
    ann1 = base.withColumn("_c2ts", F.when(c2, F.col("_ts")))
    t2r = F.min("_c2ts").over(w)
    c3 = (
        (F.col("_k") == s3)
        & t2r.isNotNull()
        & ((us - F.unix_micros(t2r)) <= lim)
    )
    ann2 = ann1.withColumn("_c3ts", F.when(c3, F.col("_ts")))
    agg = ann2.groupBy("user").agg(
        F.min(F.when(F.col("_k") == s1, F.col("_ts"))).alias("t1"),
        F.min("_c2ts").alias("t2"),
        F.min("_c3ts").alias("t3"),
    )
    depth = (
        F.when(F.col("t3").isNotNull(), 3)
        .when(F.col("t2").isNotNull(), 2)
        .when(F.col("t1").isNotNull(), 1)
        .otherwise(0)
    )
    return agg.select("user", "t1", "t2", "t3", depth.alias("depth"))


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    *,
    n_weeks: int = 4,
) -> DataFrame:
    """Weekly cohort-retention matrix: cohort = the user's FIRST event
    day; ``w{k}`` = distinct users of that cohort active in week k
    (days [7k, 7k+7) after their own first day) →
    ``(cohort_day, n_users, w0..w{n-1})``.

    Plan shape: first-day per user and active (user, day) pairs are
    both user-keyed aggregates — the join between them is
    co-partitioned on the user shuffle. The per-week distinct-user
    counts are NOT n_weeks countDistincts (multiple distinct
    aggregates re-plan the groupBy as an Expand — row blow-up × the
    aggregate count, the q66 gotcha): each (cohort, user) first
    reduces to ONE week-bitmask long (bit_or), then the cohort rollup
    is plain integer sums of mask bits. Cohort cardinality = distinct
    first days — driver-safe output.
    """
    if not 0 < n_weeks <= 62:
        raise ValueError("n_weeks must be in (0, 62]")
    ts = _ts(ts_col)
    base = df.filter(F.col(user_col).isNotNull() & ts.isNotNull()).select(
        F.col(user_col).alias("user"), ts.cast("date").alias("day")
    )
    first = base.groupBy("user").agg(F.min("day").alias("cohort_day"))
    active = base.distinct()
    wk = F.floor(F.datediff(F.col("day"), F.col("cohort_day")) / 7)
    # call_function: the shiftleft WRAPPER only takes a literal shift;
    # the SQL function itself shifts by a column
    contrib = F.when(
        wk < n_weeks,
        F.call_function("shiftleft", F.lit(1).cast("long"), wk.cast("int")),
    ).otherwise(F.lit(0).cast("long"))
    masks = (
        active.join(first, "user")
        .select("user", "cohort_day", contrib.alias("_c"))
        .groupBy("cohort_day", "user")
        .agg(F.bit_or("_c").alias("_mask"))
    )
    return masks.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("n_users"),
        *[
            F.sum(F.shiftright(F.col("_mask"), k).bitwiseAND(1)).alias(f"w{k}")
            for k in range(n_weeks)
        ],
    )


def rolling_window_stats(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    *,
    window_s: int,
    value_col: str | None = None,
    out_cols: list[str] | None = None,
) -> DataFrame:
    """Per-event trailing-window stats: for every event, the count
    (and optional value sum) of the SAME user's events in the last
    ``window_s`` seconds INCLUSIVE of now — the rate-limit / velocity
    feature every abuse pipeline computes.

    RANGE frame (not ROWS) over unix MICROSECONDS so (a) the bound is
    time, not row-count, and (b) equal-timestamp peers are all in
    frame in both engines — the deterministic tie semantics. One
    shuffle on the user key; running frame state is O(window rows per
    key) inside the sort, never materialized per row.
    """
    ts = _ts(ts_col)
    keep = out_cols if out_cols is not None else df.columns
    base = df.filter(F.col(user_col).isNotNull() & ts.isNotNull()).select(
        *keep, F.col(user_col).alias("_u"), F.unix_micros(ts).alias("_us"),
        *( [F.col(value_col).alias("_v")] if value_col else [] ),
    )
    w = (
        Window.partitionBy("_u")
        .orderBy("_us")
        .rangeBetween(-int(window_s) * 1_000_000, 0)
    )
    out = base.withColumn("n_in_window", F.count(F.lit(1)).over(w))
    if value_col:
        out = out.withColumn("sum_in_window", F.sum("_v").over(w))
    return out.drop("_u", "_us", *(["_v"] if value_col else []))


def hopping_window_counts(
    df: DataFrame,
    ts_col: str,
    *,
    window_s: int,
    slide_s: int,
    value_col: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Overlapping (hopping) time-window aggregates via the native
    ``F.window(ts, window, slide)`` — each event lands in exactly
    ``window_s / slide_s`` windows (epoch-aligned starts, [start, end)
    half-open), the same generator Structured Streaming uses, so the
    batch result previews the streaming rollup exactly. Pass
    ``watermark`` on a streaming frame (state per key = open windows;
    append mode finalizes a window when the watermark passes its end).

    One shuffle on the window key; the per-event window expansion is
    the unavoidable ×(w/s) blow-up of hopping semantics — pick the
    ratio, not the operator. ``window_s`` must be a multiple of
    ``slide_s`` (the oracle's k-range replay depends on it)."""
    if window_s % slide_s != 0:
        raise ValueError("window_s must be a multiple of slide_s")
    ts = _ts(ts_col)
    base = df.filter(ts.isNotNull()).select(
        ts.alias("_ts"),
        *( [F.col(value_col).alias("_v")] if value_col else [] ),
    )
    if watermark is not None:
        base = base.withWatermark("_ts", watermark)
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col:
        aggs.append(F.sum("_v").alias("sum_value"))
    out = base.groupBy(
        F.window("_ts", f"{window_s} seconds", f"{slide_s} seconds").alias("_w")
    ).agg(*aggs)
    return out.select(
        F.col("_w.start").alias("window_start"),
        F.col("_w.end").alias("window_end"),
        *[c for c in out.columns if c != "_w"],
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    *,
    lower_s: int,
    upper_s: int,
    left_cols: list[str] | None = None,
    right_cols: list[str] | None = None,
    watermark: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Keyed event-time interval join: every (l, r) pair with
    ``l.key == r.key`` and ``r.ts ∈ [l.ts + lower_s, l.ts + upper_s]``
    (both bounds inclusive; ``lower_s`` is usually negative — "right
    events in the N minutes before each left event").

    The SAME expression serves batch and streaming. Batch: a plain
    equi-join on the key (sort-merge/broadcast per Catalyst) with the
    range as a join filter — never a BroadcastNestedLoopJoin. With
    ``watermark`` set on two streaming frames this is Spark's
    stream-stream inner join: the bounds are timestamp ± INTERVAL
    literals, the exact shape the state manager recognizes to evict
    rows once the other side's watermark passes their reach — state
    is bounded by (watermark + window span) × arrival rate, not by
    stream length. Rows with a NULL event time drop on BOTH sides in
    BOTH modes — an event-time join cannot watermark-resolve a row
    that has no event time (this matches the streaming state
    manager's contract, and the batch path mirrors it so batch ==
    streaming). A NULL-KEY left row with a valid timestamp never
    matches, and under left_outer it IS kept with NULL right columns.

    ``how="left_outer"`` keeps unmatched left rows (right columns
    NULL). Streaming left-outer is watermark-GATED: an unmatched left
    row emits only once BOTH sides' watermarks prove no future right
    row can land in its interval — so under availableNow the fixture
    must push the final watermark past the real data (sentinel rows in
    the last chunks) or trailing outer rows are withheld; that is
    Spark's documented contract, not a quirk of this operator.

    Output: ``key``, ``{left_ts}_l``, ``{right_ts}_r``, then the
    passthrough columns (caller keeps names disjoint)."""
    if how not in ("inner", "left_outer"):
        raise ValueError(f"unsupported join type: {how!r}")
    lsel = [
        F.col(key).alias("_k"),
        _ts(left_ts).alias("_lts"),
        *[F.col(c) for c in (left_cols or [])],
    ]
    rsel = [
        F.col(key).alias("_rk"),
        _ts(right_ts).alias("_rts"),
        *[F.col(c) for c in (right_cols or [])],
    ]
    lf = left.select(*lsel).filter(F.col("_lts").isNotNull())
    rf = right.select(*rsel).filter(F.col("_rts").isNotNull())
    if watermark is not None:
        lf = lf.withWatermark("_lts", watermark)
        rf = rf.withWatermark("_rts", watermark)
    # day-time INTERVAL literals, NOT make_interval: CalendarIntervalType
    # defeats StreamingJoinHelper's bound extraction (state stays
    # unbounded for inner joins and left-outer is REFUSED outright);
    # DayTimeIntervalType is the shape the state manager parses
    lo = F.expr(f"INTERVAL '{int(lower_s)}' SECOND")
    hi = F.expr(f"INTERVAL '{int(upper_s)}' SECOND")
    cond = (
        (F.col("_k") == F.col("_rk"))
        & (F.col("_rts") >= F.col("_lts") + lo)
        & (F.col("_rts") <= F.col("_lts") + hi)
    )
    out = lf.join(rf, cond, how)
    return out.select(
        F.col("_k").alias(key),
        F.col("_lts").alias(f"{left_ts}_l"),
        F.col("_rts").alias(f"{right_ts}_r"),
        *[c for c in out.columns if not c.startswith("_")],
    )


def range_join_bins(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_ts: str,
    lo: str,
    hi: str,
    bin_width_s: int,
    point_cols: list[str],
    interval_cols: list[str],
) -> DataFrame:
    """Inner join of point rows to every interval containing them
    (``lo <= ts <= hi``, both inclusive), with NO equality key —
    re-expressed as an equi-join on fixed-width time bins.

    ``bin_width_s`` should be >= the maximum interval length so each
    interval explodes into <= 2 bins (assert-guarded via sequence
    length: an interval spanning k bins emits k rows — correctness
    never depends on the bound, only the blow-up factor does).

    Scale: shuffle on the bin key only; per-bin density is the knob
    (pick bin_width so a bin holds ~10^3-10^4 points). Skew (a hot
    bin) is AQE-skew-join splittable since the join is a plain
    equi-join after the rewrite.
    """
    # bins are computed on FLOORED epoch seconds (cast ts->long) —
    # flooring is monotone, so lo <= pt <= hi implies the point's bin
    # is inside the interval's covered bin range; the exact predicate
    # below runs on the FULL-precision timestamps (a floored-seconds
    # compare would admit points fractionally past the bound)
    pt, lot, hit = _ts(point_ts), _ts(lo), _ts(hi)
    pts, los, his = pt.cast("long"), lot.cast("long"), hit.cast("long")
    p = points.filter(pt.isNotNull()).select(
        *[F.col(c) for c in point_cols],
        pt.alias("_pt"),
        F.floor(pts / bin_width_s).alias("_bin"),
    )
    i = (
        intervals.filter(lot.isNotNull() & hit.isNotNull() & (lot <= hit))
        .select(
            *[F.col(c) for c in interval_cols],
            lot.alias("_lo"), hit.alias("_hi"),
            F.explode(
                F.sequence(F.floor(los / bin_width_s), F.floor(his / bin_width_s))
            ).alias("_bin"),
        )
    )
    return (
        p.join(i, "_bin")
        .filter((F.col("_pt") >= F.col("_lo")) & (F.col("_pt") <= F.col("_hi")))
        .select(*interval_cols, *point_cols)
    )


def densify_daily(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    *,
    value_col: str | None = None,
) -> DataFrame:
    """Calendar densification (gap fill): one row per (key, day) over
    each key's OWN [first_day, last_day] span, zero-filled where the
    key had no events — downstream window/velocity math needs the
    zero days to exist (a trailing mean over sparse rows silently
    skips quiet days).

    One pass over the input (per-(key, day) aggregate); the span
    frame and the calendar explode are derived from THAT day-bounded
    frame, never from the raw events. Blow-up is span-bounded (days,
    not events); the final left join is keyed (key, day) against the
    same aggregate. NULL keys/timestamps drop."""
    k = F.col(key_col)
    ts = _ts(ts_col)
    aggs = [F.count(F.lit(1)).cast("long").alias("n_events")]
    if value_col:
        aggs.append(F.sum(value_col).alias("_sv"))
    days = (
        df.filter(k.isNotNull() & ts.isNotNull())
        .select(k.alias("key"), ts.cast("date").alias("day"),
                *([F.col(value_col)] if value_col else []))
        .groupBy("key", "day")
        .agg(*aggs)
    )
    span = days.groupBy("key").agg(
        F.min("day").alias("_lo"), F.max("day").alias("_hi")
    )
    cal = span.select(
        "key",
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.expr("INTERVAL 1 DAY"))
        ).alias("day"),
    )
    out = cal.join(days, ["key", "day"], "left").select(
        "key",
        "day",
        F.coalesce(F.col("n_events"), F.lit(0)).cast("long").alias("n_events"),
        *(
            [F.round(F.coalesce(F.col("_sv"), F.lit(0.0)), 6).alias("sum_value")]
            if value_col
            else []
        ),
    )
    return out


def debounce_first(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    *,
    gap: str = "2 minutes",
) -> DataFrame:
    """Burst suppression — keep only the FIRST event of every rapid
    burst per key (double-submits, retry storms, scroll spam). "Burst"
    is true debounce semantics: an event chains into the burst when it
    is within ``gap`` of the PREVIOUS event (kept or not), i.e. the
    same merge rule as sessionize — NOT a naive lag filter, which
    would re-admit the third event of a long chain.

    Output per burst: (key, kept_ts, kept_id, n_folded) where
    kept_id is the id of the burst's earliest event (id as tiebreak on
    equal timestamps — deterministic) and n_folded counts suppressed
    events. One shuffle (hash on key), session-window state; the same
    expression streams under a watermark like sessionize.
    """
    ts = _ts(ts_col)
    base = df.filter(F.col(key_col).isNotNull() & ts.isNotNull()).select(
        F.col(key_col).alias("key"),
        ts.alias("_ts"),
        F.col(id_col).alias("_id"),
    )
    return (
        base.groupBy(F.session_window("_ts", gap).alias("_w"), F.col("key"))
        .agg(
            F.min("_ts").alias("kept_ts"),
            F.min_by("_id", F.struct("_ts", "_id")).alias("kept_id"),
            (F.count(F.lit(1)) - 1).cast("long").alias("n_folded"),
        )
        .drop("_w")
    )


def decayed_frequency(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    *,
    half_life_days: int = 7,
    top: int = 20,
) -> DataFrame:
    """Recency-weighted heavy hitters: per key, the exponentially
    decayed event count — what "trending" means operationally (a key
    with 500 events last quarter should rank below one with 50
    yesterday). Plain `frequent_values` has no clock; this is its
    time-aware sibling.

    Integer-exact decay (no float ever): with reference day R = the
    table's max event day (computed here — deterministic from the
    data, no wall clock) and age a = R − day,

        weight(a) = 1_000_000 div 2^(a div half_life_days)

    i.e. step-halving per half-life window — the honest exact form of
    exponential decay (a smooth per-day factor 2^(1/h) is irrational
    and would put a float in the ranking). Shift capped at 62 so the
    power stays in int64; beyond ~62 half-lives the weight is 0
    anyway. ``decayed_score = Σ_day c_day · weight`` is a pure int64
    sum; ranking (score desc, key asc) never rides a float.

    Scale: raw events collapse to (key, day) with one hash aggregate;
    the decay weighting and per-key sum run on the collapsed frame;
    the 1-row max-day frame is broadcast; the final cut is
    ``orderBy.limit`` = TakeOrderedAndProject (k-heap, no global
    sort). NULL keys/timestamps are excluded.

    Output: (key, total_count, decayed_score) — top-N by score.
    """
    ts = _ts(ts_col)
    daily = (
        df.filter(F.col(key_col).isNotNull() & ts.isNotNull())
        .groupBy(
            F.col(key_col).alias("key"), F.to_date(ts).alias("_day")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
    )
    ref = daily.agg(F.max("_day").alias("_ref"))
    scored = daily.crossJoin(F.broadcast(ref)).withColumn(
        "_w",
        F.expr(
            f"1000000 div shiftleft(CAST(1 AS BIGINT), "
            f"CAST(least(datediff(_ref, _day) div {half_life_days}, 62) AS INT))"
        ),
    )
    out = scored.groupBy("key").agg(
        F.sum("_c").cast("long").alias("total_count"),
        F.sum(F.col("_c") * F.col("_w")).cast("long").alias("decayed_score"),
    )
    return out.orderBy(F.col("decayed_score").desc(), F.col("key")).limit(top)


def transition_matrix(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    state_col: str,
    *,
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """First-order state-transition counts over per-user event
    sequences — the process-mining view of an event log: which state
    follows which, how often, out of how many departures. The
    reference validates RECORDS; this validates the SEQUENCE a key's
    records form (with :func:`illegal_transitions` as the
    conformance screen and q107's funnel as the happy-path special
    case).

    Ordering inside a user is (ts, *tie_cols) — pass a unique
    tie-break column (the event id) whenever timestamps can collide,
    or the successor of tied rows is layout-dependent and no two runs
    (or engines) need agree. NULL user/ts/state rows are excluded.

    Output: (from_state, to_state, n, n_from) — n_from is the
    from-state's total departures, so P(to|from) = n / n_from is a
    client-side exact ratio.

    Scale: one shuffle (hash on user) feeds the lead() window —
    per-task state is one user's events; the (from, to) aggregate
    runs on |transitions| rows with map-side combine, and the margin
    join operates on the |states|²-bounded matrix, never raw events.
    """
    ts = _ts(ts_col)
    ties = [F.col(c) for c in (tie_cols or [])]
    base = df.filter(
        F.col(user_col).isNotNull()
        & ts.isNotNull()
        & F.col(state_col).isNotNull()
    ).select(
        F.col(user_col).alias("_u"),
        ts.alias("_t"),
        F.col(state_col).alias("_s"),
        *[F.col(c).alias(f"_tie{i}") for i, c in enumerate(tie_cols or [])],
    )
    w = Window.partitionBy("_u").orderBy(
        "_t", *[f"_tie{i}" for i in range(len(tie_cols or []))]
    )
    pairs = (
        base.withColumn("_nxt", F.lead("_s").over(w))
        .filter(F.col("_nxt").isNotNull())
        .groupBy(
            F.col("_s").alias("from_state"), F.col("_nxt").alias("to_state")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    margin = pairs.groupBy("from_state").agg(
        F.sum("n").cast("long").alias("n_from")
    )
    return pairs.join(margin, "from_state").select(
        "from_state", "to_state", "n", "n_from"
    )


def illegal_transitions(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    state_col: str,
    allowed: list[tuple[str, str]],
    *,
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """Sequence-conformance screen: per user, how many observed
    transitions fall OUTSIDE the allowed state machine — the lift of
    record-level enum validation to the ORDER of a key's records
    ("a refund before its purchase", "shipped after cancelled").

    ``allowed`` is the explicit edge list; membership compiles to a
    literal IN over the delimiter-joined pair (codegen'd, broadcast-
    free — the machine is part of the PLAN, the right place for a
    spec of tens of edges). Same ordering/NULL contract as
    :func:`transition_matrix`.

    Output: one row per user with ≥1 transition —
    (user, n_transitions, n_illegal); conformant users report 0, so
    `filter(n_illegal > 0)` is the violation worklist.
    """
    ts = _ts(ts_col)
    base = df.filter(
        F.col(user_col).isNotNull()
        & ts.isNotNull()
        & F.col(state_col).isNotNull()
    ).select(
        F.col(user_col).alias("_u"),
        ts.alias("_t"),
        F.col(state_col).alias("_s"),
        *[F.col(c).alias(f"_tie{i}") for i, c in enumerate(tie_cols or [])],
    )
    w = Window.partitionBy("_u").orderBy(
        "_t", *[f"_tie{i}" for i in range(len(tie_cols or []))]
    )
    allowed_keys = [f"{a}\x1f{b}" for a, b in allowed]
    pair_key = F.concat_ws("\x1f", F.col("_s"), F.col("_nxt"))
    return (
        base.withColumn("_nxt", F.lead("_s").over(w))
        .filter(F.col("_nxt").isNotNull())
        .withColumn("_ill", (~pair_key.isin(allowed_keys)).cast("long"))
        .groupBy(F.col("_u").alias("user"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_transitions"),
            F.sum("_ill").cast("long").alias("n_illegal"),
        )
    )


def scd2_build(
    df: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    *,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Build a slowly-changing-dimension (SCD type 2) version table
    from an attribute-change event stream: one validity interval per
    RUN of equal attribute values per key —

        (key, attr, eff_from, eff_to, version)

    with ``eff_to`` NULL on the current (open) version and
    ``version`` 1-based per key. The lake-side dimension history that
    `asof_join`/`interval_join` (q103/q104) probe: this op is the
    missing producer half (CDC latest-wins compaction q129 keeps only
    the newest row; SCD2 keeps the full, interval-indexed history).

    Change compression: consecutive events with the SAME attribute
    collapse into one version (lag() run detection), so a noisy
    at-least-once feed that re-reports unchanged state doesn't mint
    phantom versions. Ordering inside a key is (ts, tiebreak) with
    the tiebreak COALESCED before the window — Spark orders NULLS
    FIRST and DuckDB NULLS LAST, so an un-coalesced nullable
    tiebreaker silently diverges (the q207 lesson). Rows with NULL
    key/ts/attr are excluded (a version needs all three; the
    null-rate report is `column_stats`' job).

    Scale: two windows over the SAME (key → ts, tiebreak) sort — one
    partition-by-key shuffle total, run detection and interval
    closing both ride it; output is |versions| rows (≤ |events|,
    typically far fewer after compression). Key skew = one hot
    entity's history on one task: histories are change-compressed and
    bounded by change count, not event count — stated honestly.
    """
    from pyspark.sql import Window

    tb = (
        F.coalesce(F.col(tiebreak_col).cast("long"), F.lit(-1))
        if tiebreak_col
        else F.lit(0)
    )
    base = df.filter(
        F.col(key_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(attr_col).isNotNull()
    ).select(
        F.col(key_col).alias("key"),
        F.col(attr_col).alias("attr"),
        F.col(ts_col).alias("_ts"),
        tb.alias("_tb"),
    )
    w = Window.partitionBy("key").orderBy("_ts", "_tb")
    runs = base.withColumn(
        "_chg",
        (
            F.lag("attr").over(w).isNull()
            | (F.lag("attr").over(w) != F.col("attr"))
        ).cast("int"),
    ).withColumn(
        "_ver",
        F.sum("_chg").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    # every row in a run carries the same attr by construction, so
    # min(attr) IS the run's attr — no order-dependent first() needed
    vers = runs.groupBy("key", "_ver").agg(
        F.min("attr").alias("attr"),
        F.min("_ts").alias("eff_from"),
    )
    w2 = Window.partitionBy("key").orderBy("eff_from")
    return vers.select(
        "key",
        "attr",
        "eff_from",
        F.lead("eff_from").over(w2).alias("eff_to"),
        F.col("_ver").cast("int").alias("version"),
    )


def interval_overlap_audit(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Validity-interval integrity audit per key — the invariant check
    every temporal table (:func:`scd2_build` output, contract/session
    validity windows) needs before AS-OF joins trust it: per key,
    how many intervals OVERLAP prior coverage (two versions claim the
    same instant — an AS-OF join returns an arbitrary one) and how
    many leave GAPS (instants where no version exists).

    Intervals are half-open [start, end). The chain is one window
    pass ordered by (start, end): each row compares its start to the
    running max of all PREVIOUS ends — max, not lag, because an
    umbrella interval must shadow everything it spans (the classic
    lag-only audit misses an overlap hiding behind a short
    predecessor). Inverted rows (end < start) act as points
    (greatest(start, end)) in the chain and are counted in
    ``n_inverted``. All day arithmetic is exact datediff int64; ties
    on (start, end) are interchangeable, so the per-key aggregate is
    deterministic either engine.

    Scale: one shuffle on the key, state = one running max per
    partition-ordered stream; output |keys| rows. Keys here are
    dimension-sized (entities with versions), never row-sized.
    """
    s, e = F.col(start_col), F.col(end_col)
    base = df.select(
        F.col(key_col).alias("k"),
        s.alias("_s"),
        e.alias("_e"),
        F.greatest(s, e).alias("_e2"),
        (e < s).cast("int").alias("_inv"),
    )
    w = (
        Window.partitionBy("k")
        .orderBy("_s", "_e2")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    staged = base.withColumn("_pmax", F.max("_e2").over(w))
    ov = F.when(
        F.col("_pmax").isNotNull() & (F.col("_s") < F.col("_pmax")),
        F.datediff(F.least(F.col("_e2"), F.col("_pmax")), F.col("_s")),
    )
    gap = F.when(
        F.col("_pmax").isNotNull() & (F.col("_s") > F.col("_pmax")),
        F.datediff(F.col("_s"), F.col("_pmax")),
    )
    return (
        staged.groupBy(F.col("k").alias(key_col))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_intervals"),
            F.sum("_inv").cast("long").alias("n_inverted"),
            F.sum(F.when(ov.isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_overlapping"),
            F.coalesce(F.sum(ov), F.lit(0)).cast("long").alias("overlap_days"),
            F.sum(F.when(gap.isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_gaps"),
            F.coalesce(F.sum(gap), F.lit(0)).cast("long").alias("gap_days"),
            F.datediff(F.max("_e2"), F.min("_s")).cast("long").alias("span_days"),
        )
    )


def robotic_cadence(
    df: DataFrame,
    ts_col: str,
    actor_col: str,
    *,
    min_events: int = 5,
    tolerance_pct: int = 10,
) -> DataFrame:
    """Inter-event cadence audit per actor — the bot screen web-scale
    training data runs before sessionized content is trusted: a
    scraper posting every 60.0 s produces gap spreads no human can
    (humans are bursty; :func:`debounce_first` handles the bursts,
    this catches the metronomes).

    Gaps are exact unix micros between consecutive events (the
    multiset of consecutive differences of a sorted multiset is
    order-independent, so timestamp ties cannot make the output
    nondeterministic). ``robotic`` is a pure integer selection — the
    cross-multiplication (max_gap − min_gap)·100·n_gaps ≤
    tolerance_pct·Σgaps, i.e. the gap spread is within
    ``tolerance_pct`` percent of the MEAN gap — carried in
    decimal(38,0) so century-long micros cannot overflow. mean_gap_us
    is truncating div (identical both engines).

    Scale: one shuffle on the actor key; the window carries O(1)
    state (one lag); the aggregate is map-side-combinable. Output
    |actors with >= min_events| rows.
    """
    if min_events < 2:
        raise ValueError("min_events must be >= 2 (need at least one gap)")
    base = df.select(
        F.col(actor_col).alias("_u"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_us"),
    ).filter(F.col("_u").isNotNull() & F.col("_us").isNotNull())
    w = Window.partitionBy("_u").orderBy("_us")
    g = base.withColumn("_g", F.col("_us") - F.lag("_us").over(w))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = (
        g.groupBy(F.col("_u").alias(actor_col))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.count("_g").cast("long").alias("n_gaps"),
            F.sum("_g").cast("long").alias("_sg"),
            F.min("_g").cast("long").alias("min_gap_us"),
            F.max("_g").cast("long").alias("max_gap_us"),
        )
        .filter(F.col("n_events") >= min_events)
    )
    spread = dec(F.col("max_gap_us") - F.col("min_gap_us"))
    return agg.select(
        actor_col,
        "n_events",
        "n_gaps",
        F.expr("_sg div n_gaps").alias("mean_gap_us"),
        "min_gap_us",
        "max_gap_us",
        (
            spread * F.lit(100).cast("decimal(38,0)") * dec(F.col("n_gaps"))
            <= F.lit(tolerance_pct).cast("decimal(38,0)") * dec(F.col("_sg"))
        ).alias("robotic"),
    )
