"""Single-pass column statistics — the dataset-level lift of the
reference's per-record rule families (SURVEY.md §2.9).

One ``agg()`` computes, for EVERY requested column at once: count,
null count/rate, min, max, average length, distinct count (exact or
HyperLogLog++ ``approx_count_distinct``), and empty-string count. At
10^12 rows this is ONE scan with partial (map-side) aggregation —
Catalyst plans partial+final automatically; there is no per-column
pass and no shuffle of raw data (only of the tiny partial-agg state).

Output is long-form: one row per column, so downstream constraint
checks (`null_rate < x`, `distinct_count == n_rows`) are row filters.

Reference seeds: required/min/max/length families (§2.3-2.4), the
`enum` domain checks → distinct counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T


def column_stats(
    df: DataFrame,
    cols: list[str] | None = None,
    *,
    approx_distinct: bool = True,
    rsd: float = 0.05,
) -> DataFrame:
    """Wide single-pass stats → long-form (column, n, n_null, null_rate,
    n_empty, min_str, max_str, avg_len, n_distinct).

    ``approx_distinct=False`` uses exact count(distinct) — Spark still
    evaluates multiple exact distincts in one logical agg (via expand),
    useful for oracle-exact tests; default HLL++ for scale.
    """
    if cols is None:
        cols = df.columns
    schema = {f.name: f.dataType for f in df.schema.fields}

    aggs: list = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        dt = schema.get(c)
        col = F.col(c)
        s = col.cast("string")
        aggs.append(F.sum(col.isNull().cast("long")).alias(f"{c}__nnull"))
        if isinstance(dt, T.StringType):
            aggs.append(F.sum((col == "").cast("long")).alias(f"{c}__nempty"))
            aggs.append(F.avg(F.length(col)).alias(f"{c}__avglen"))
        elif isinstance(dt, (T.ArrayType, T.MapType)):
            aggs.append(F.lit(0).cast("long").alias(f"{c}__nempty"))
            aggs.append(F.avg(F.size(col).cast("double")).alias(f"{c}__avglen"))
        else:
            aggs.append(F.lit(0).cast("long").alias(f"{c}__nempty"))
            aggs.append(F.avg(F.length(s)).alias(f"{c}__avglen"))
        if isinstance(dt, (T.ArrayType, T.MapType, T.StructType)):
            aggs.append(F.lit(None).cast("string").alias(f"{c}__min"))
            aggs.append(F.lit(None).cast("string").alias(f"{c}__max"))
            aggs.append(F.lit(None).cast("long").alias(f"{c}__ndist"))
        else:
            aggs.append(F.min(col).cast("string").alias(f"{c}__min"))
            aggs.append(F.max(col).cast("string").alias(f"{c}__max"))
            if approx_distinct:
                aggs.append(F.approx_count_distinct(col, rsd).alias(f"{c}__ndist"))
            else:
                aggs.append(F.countDistinct(col).alias(f"{c}__ndist"))

    wide = df.agg(*aggs)

    # unpivot wide → long with one stack expression (still driver-light:
    # the wide frame is ONE row)
    stack_parts = []
    for c in cols:
        stack_parts.append(
            f"'{c}', `{c}__nnull`, `{c}__nempty`, `{c}__avglen`, "
            f"`{c}__min`, `{c}__max`, `{c}__ndist`"
        )
    n_cols = len(cols)
    long = wide.select(
        F.col("_n").alias("n"),
        F.expr(
            f"stack({n_cols}, " + ", ".join(stack_parts) +
            ") as (column, n_null, n_empty, avg_len, min_str, max_str, n_distinct)"
        ),
    )
    return long.select(
        "column",
        "n",
        "n_null",
        (F.col("n_null") / F.col("n")).alias("null_rate"),
        "n_empty",
        "avg_len",
        "min_str",
        "max_str",
        "n_distinct",
    )


def length_histogram(
    df: DataFrame,
    col: str,
    *,
    bucket_width: int = 50,
    max_buckets: int = 64,
) -> DataFrame:
    """Length histogram for a string/array column — `stringLength`
    (validators_compare.go:176-197) lifted to a distribution.
    ``width_bucket``-style fixed buckets → groupBy(bucket).count():
    map-side combine makes this one tiny shuffle of ≤max_buckets rows
    per partition regardless of table size.
    """
    dt = dict((f.name, f.dataType) for f in df.schema.fields).get(col)
    ln = F.size(F.col(col)) if isinstance(dt, (T.ArrayType, T.MapType)) else F.length(F.col(col))
    bucket = F.least(F.floor(ln / bucket_width), F.lit(max_buckets - 1))
    return (
        df.select(bucket.cast("int").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def numeric_histogram(
    df: DataFrame,
    col: str,
    *,
    lo: float,
    hi: float,
    n_buckets: int = 32,
) -> DataFrame:
    """Fixed-range numeric histogram (drift-check input). Values outside
    [lo, hi) clamp to the edge buckets; NULLs are dropped."""
    c = F.col(col).cast("double")
    width = (hi - lo) / n_buckets
    bucket = F.greatest(
        F.lit(0), F.least(F.lit(n_buckets - 1), F.floor((c - lo) / width))
    )
    return (
        df.filter(c.isNotNull())
        .select(bucket.cast("int").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def numeric_correlations(
    df: DataFrame, cols: list[str], *, round_to: int | None = 6
) -> DataFrame:
    """Pearson correlation for every unordered column pair — Deequ-style
    multi-column profiling — computed from ONE wide aggregate of raw
    co-moment sums (n, Σx, Σx², Σxy per pair), never per-pair passes.

    Deliberately NOT ``F.corr``: streaming co-moment updates are
    engine- and order-dependent, but the raw SUMS are exact integers
    whenever the inputs are integral (and map-side-combinable always),
    so the final driver-free formula
    ``(n·Σxy − Σx·Σy) / sqrt(n·Σx²−Σx²̂) / sqrt(n·Σy²−Σy²̂)``
    replays bit-identically in any engine from the same sums. Rows
    with a NULL in EITHER column of a pair are excluded pairwise
    (count tracked per pair). Sums are decimal(38,0) for integral
    inputs at 10^12-row scale (the working-notes overflow rule);
    fractional inputs fall back to double sums (exactness then holds
    to fp-addition order, still one scan).

    Output: (col_x, col_y, n, corr) with col_x < col_y; ``corr`` NULL
    when either side is constant (zero variance).

    Scale: ONE scan, one 1-row aggregate (pairs×4 + cols sums), then a
    metadata-sized explode — no shuffle of raw data.
    """
    from pyspark.sql import types as T

    schema = {f.name: f.dataType for f in df.schema.fields}
    integral = all(
        isinstance(schema[c], (T.ByteType, T.ShortType, T.IntegerType, T.LongType))
        for c in cols
    )
    acc_t = "decimal(38,0)" if integral else "double"
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]
    aggs = []
    for i, (a, b) in enumerate(pairs):
        x = F.col(a).cast(acc_t)
        y = F.col(b).cast(acc_t)
        both = F.col(a).isNotNull() & F.col(b).isNotNull()
        z = F.lit(0).cast(acc_t)
        aggs += [
            F.sum(F.when(both, 1).otherwise(0)).cast("long").alias(f"_n_{i}"),
            F.sum(F.when(both, x).otherwise(z)).alias(f"_sx_{i}"),
            F.sum(F.when(both, y).otherwise(z)).alias(f"_sy_{i}"),
            F.sum(F.when(both, x * x).otherwise(z)).alias(f"_sxx_{i}"),
            F.sum(F.when(both, y * y).otherwise(z)).alias(f"_syy_{i}"),
            F.sum(F.when(both, x * y).otherwise(z)).alias(f"_sxy_{i}"),
        ]
    one = df.agg(*aggs)
    entries = []
    for i, (a, b) in enumerate(pairs):
        n = F.col(f"_n_{i}").cast("double")
        sx = F.col(f"_sx_{i}").cast("double")
        sy = F.col(f"_sy_{i}").cast("double")
        sxx = F.col(f"_sxx_{i}").cast("double")
        syy = F.col(f"_syy_{i}").cast("double")
        sxy = F.col(f"_sxy_{i}").cast("double")
        cov = n * sxy - sx * sy
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        corr = F.when(
            (vx > 0) & (vy > 0), cov / F.sqrt(vx) / F.sqrt(vy)
        ).otherwise(F.lit(None).cast("double"))
        if round_to is not None:
            corr = F.round(corr, round_to)
        entries.append(
            F.struct(
                F.lit(a).alias("col_x"),
                F.lit(b).alias("col_y"),
                F.col(f"_n_{i}").alias("n"),
                corr.alias("corr"),
            )
        )
    return one.select(F.explode(F.array(*entries)).alias("e")).select(
        F.col("e.col_x").alias("col_x"),
        F.col("e.col_y").alias("col_y"),
        F.col("e.n").alias("n"),
        F.col("e.corr").alias("corr"),
    )


def frequent_values(
    df: DataFrame, col: str, *, k: int = 20
) -> DataFrame:
    """Top-``k`` most frequent values of a column (heavy-hitter
    profile): (value, cnt) with the fully deterministic ordering
    ``cnt DESC, value ASC NULLS FIRST`` so any engine's LIMIT picks
    identical rows. NULL is a value here — a top-1 NULL is the single
    most useful profiling fact there is.

    Scale: groupBy(col) with map-side partials, then a distributed
    top-k via ``orderBy().limit(k)`` — Spark plans
    TakeOrderedAndProject (per-task k-heaps + one k-row merge), never
    a global sort (the q84 pattern).
    """
    return (
        df.groupBy(F.col(col).alias("value"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("value").asc_nulls_first())
        .limit(k)
    )


def categorical_agreement(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Cohen's kappa between two label columns (e.g. a declared
    language tag vs the engine's lang_id prediction) — chance-corrected
    agreement, the standard annotator/classifier consistency score.

    Shuffle shape: one groupBy on the (a, b) pair (class²-bounded),
    then marginals and the expected-agreement sum are derived FROM the
    pair frame (class-bounded; never re-touches the input). Every fp
    input is an exact int64 count, so po/pe/kappa are identical
    doubles in Spark and DuckDB (round-6 under the gate regardless).
    NULL labels coalesce to '' — a real class, as the reference's
    IsEmpty treats missing (validators.go required semantics)."""
    a = F.coalesce(F.col(col_a).cast("string"), F.lit("")).alias("a")
    b = F.coalesce(F.col(col_b).cast("string"), F.lit("")).alias("b")
    pairs = (
        df.select(a, b)
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    ra = pairs.groupBy(F.col("a").alias("k")).agg(F.sum("n").alias("rn"))
    cb = pairs.groupBy(F.col("b").alias("k")).agg(F.sum("n").alias("cn"))
    tot = pairs.agg(
        F.sum("n").cast("long").alias("n"),
        F.sum(F.when(F.col("a") == F.col("b"), F.col("n")).otherwise(0))
        .cast("long")
        .alias("n_agree"),
    )
    pe_num = (
        ra.join(cb, "k")
        .agg(F.sum(F.col("rn") * F.col("cn")).cast("long").alias("pe_num"))
    )
    out = tot.crossJoin(pe_num)
    po = F.col("n_agree").cast("double") / F.col("n").cast("double")
    pe = F.col("pe_num").cast("double") / (
        F.col("n").cast("double") * F.col("n").cast("double")
    )
    kappa = F.when(pe == 1.0, F.lit(None).cast("double")).otherwise(
        (po - pe) / (F.lit(1.0) - pe)
    )
    return out.select(
        "n",
        "n_agree",
        F.round(po, 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        F.round(kappa, 6).alias("kappa"),
    )


def cube_profile(
    df: DataFrame,
    dims: list[str],
    *,
    aggs: list | None = None,
) -> DataFrame:
    """Multi-dimensional profile via the native CUBE: ONE pass emits
    every subset of ``dims`` as a grouping set — Catalyst plans a
    single Expand + hash aggregate, i.e. 2^|dims| subtotal layers for
    one shuffle, not 2^|dims| scans (the one place an Expand is the
    RIGHT plan, unlike the accidental distinct-aggregate Expand of the
    q66 gotcha). Each dim gets a ``g_<dim>`` GROUPING() flag (1 =
    subtotal row) so real NULL dimension values never conflate with
    subtotal rows."""
    out_aggs = [
        *[F.grouping(d).cast("int").alias(f"g_{d}") for d in dims],
        F.count(F.lit(1)).cast("long").alias("n"),
        *(aggs or []),
    ]
    return df.cube(*dims).agg(*out_aggs)


def pivot_counts(
    df: DataFrame,
    row_key: str,
    pivot_col: str,
    values: list[str],
) -> DataFrame:
    """Wide per-key counts: groupBy(row_key).pivot(pivot_col, values)
    — passing ``values`` explicitly matters at scale: without it Spark
    runs an EXTRA distinct scan to discover the pivot domain and the
    output width becomes data-dependent (a skewed domain explodes the
    schema). Count of values outside ``values`` lands in none of the
    columns, deliberately. One shuffle on row_key; per-row width is
    |values|-bounded."""
    out = df.groupBy(row_key).pivot(pivot_col, values).count()
    # pivot leaves NULL (not 0) for absent combinations; report counts
    return out.select(
        row_key,
        *[F.coalesce(F.col(v), F.lit(0)).cast("long").alias(v) for v in values],
    )


def unpivot_wide(
    df: DataFrame,
    id_cols: list[str],
    value_cols: list[str],
    *,
    var_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    """Native UNPIVOT (melt): wide metric columns back to long
    (id, variable, value) rows. Spark plans this as ONE Expand pass —
    |value_cols|× the rows, never |value_cols| scans unioned (what a
    hand-rolled per-column UNION ALL would cost at 100 TB). Inverse of
    ``pivot_counts``; value columns must share one type (Spark casts
    to their common type or refuses — keep them homogeneous)."""
    return df.unpivot(
        [F.col(c) for c in id_cols],
        [F.col(c) for c in value_cols],
        var_name,
        value_name,
    )


def group_percentiles(
    df: DataFrame,
    *,
    group_cols: list[str],
    value_col: str,
    percentiles: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
) -> DataFrame:
    """EXACT linear-interpolated percentiles per group (the
    SQL-standard continuous quantile: position (n-1)*p into the
    sorted values, interpolating between neighbors — Spark
    `percentile` and DuckDB `quantile_cont` implement the identical
    formula, so integer inputs round-6 match).

    Scale honesty: exact percentile state is a per-group map of
    value→count, bounded by the group's DISTINCT-value cardinality,
    not its row count — fine for bounded domains (lengths, scores,
    ratings); for unbounded/continuous domains at 10^12 rows use
    drift.py's fixed-size quantile sketches instead (documented
    trade: sketches are mergeable and O(1), exactness is not). One
    map-side-partial aggregate, one shuffle on the group key.
    """
    v = F.col(value_col).try_cast("double")
    aggs = [
        F.round(F.percentile(v, F.lit(float(p))), 6).alias(
            f"p{int(round(p * 100)):02d}"
        )
        for p in percentiles
    ]
    aggs.append(F.count(v).cast("long").alias("n"))
    return df.groupBy(*group_cols).agg(*aggs)


def table_checksum(
    df: DataFrame,
    *,
    cols: list[str] | None = None,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Order-insensitive row-set checksum — the cheap answer to "did
    the copy/migration/rewrite preserve every row?" at 10^12 rows,
    where a sort-and-diff is impossible and a join-based diff
    (snapdiff.py) costs a full shuffle of both tables.

    Each COLUMN value hashes to its own md5 first ('N' for NULL) and
    the row string joins those fixed-alphabet tokens — a raw '|' join
    of values would let a delimiter shift across a column boundary
    forge a collision (('x|y','z') vs ('x','y|z')), and a sentinel
    could collide with real data; md5 tokens make the row encoding
    uniquely decodable, so only an md5 collision forges equality. The
    row md5's first 14 hex chars become an int64 and SUM as
    decimal(38,0) — commutative, so partition order, file order and
    parallelism cannot change the result, and two tables agree iff
    their row MULTISETS agree (56-bit truncation: integrity checking,
    not security).

    One map-side-partial aggregate; with ``group_cols`` the checksum
    is per group (per-partition, per-day, per-source) so a mismatch
    localizes without re-scanning everything.
    """
    use = cols or [c for c in df.columns if not (group_cols or []).count(c)]
    parts = []
    for c in use:
        v = F.col(c).cast("string")
        parts.append(F.when(v.isNull(), F.lit("N")).otherwise(F.md5(v)))
    rowstr = F.concat_ws("|", *parts)
    h64 = F.conv(F.substring(F.md5(rowstr), 1, 14), 16, 10).cast("long")
    aggs = [
        # decimal(38,0) sum is overflow-proof to ~10^21 rows; emitted
        # as a string so both engines' exact integers compare verbatim
        F.sum(h64.cast("decimal(38,0)")).cast("string").alias("checksum"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    ]
    if group_cols:
        return df.groupBy(*group_cols).agg(*aggs)
    return df.agg(*aggs)


def group_mad(
    df: DataFrame,
    *,
    group_cols: list[str],
    value_col: str,
) -> DataFrame:
    """Median absolute deviation per group — the robust dispersion
    measure (outlier-immune, unlike stddev) — via a GROUPED-AGG pandas
    UDF, the UDAF member of the extension surface (scalar UDFs:
    register_validator; table: the UDTF; grouped-map: the drift
    sketches). MAD is a genuinely two-pass statistic
    (median(|x - median(x)|)), inexpressible as a single native
    aggregate — exactly when a pandas UDAF earns its Arrow transfer.

    State honesty (same contract as group_percentiles): the UDAF
    buffers each GROUP's values on one executor — right for
    bounded-size groups (per-language, per-source); at unbounded group
    sizes use the approx sketches. Output round-6 (numpy median ==
    DuckDB mad interpolation on the same values).
    """
    import pandas as pd  # noqa: F401
    from pyspark.sql.functions import pandas_udf

    def _mad_fn(v):
        import numpy as np

        x = v.dropna().to_numpy(dtype=float)
        if len(x) == 0:
            return None
        return float(np.median(np.abs(x - np.median(x))))

    _mad_fn.__annotations__ = {"v": pd.Series, "return": float}
    _mad = pandas_udf(_mad_fn, "double")

    # Spark refuses to mix a grouped-agg pandas UDF with NATIVE
    # aggregates in one agg (INVALID_PANDAS_UDF_PLACEMENT) — the
    # count rides along as a second pandas UDAF instead of a join
    def _n_fn(v):
        return len(v.dropna())

    _n_fn.__annotations__ = {"v": pd.Series, "return": int}
    _n = pandas_udf(_n_fn, "long")
    vc = F.col(value_col).try_cast("double")
    return df.groupBy(*group_cols).agg(
        F.round(_mad(vc), 6).alias("mad"),
        _n(vc).alias("n"),
    )


# ---------------------------------------------------------------------------
# mergeable distinct-count sketch (KMV)
# ---------------------------------------------------------------------------

# 13 hex chars of md5 = 52 uniform bits; (k-1)*2^52 stays inside int64
# for k up to ~2000, so the estimator needs no decimal arithmetic
_KMV_HEX = 13
_KMV_SPACE = 1 << (4 * _KMV_HEX)


def kmv_sketch(
    df: DataFrame,
    value_col: str,
    *,
    k: int = 64,
    group_cols: list[str] | None = None,
    keep_state: bool = False,
) -> DataFrame:
    """Mergeable K-Minimum-Values distinct-count sketch — the
    cross-engine-EXACT alternative to HyperLogLog (`approx_count_
    distinct`'s HLL++ buckets are JVM-private, so its estimates can
    never be value-oracled; KMV's state is just the k smallest md5
    hashes, reproducible bit-for-bit in any engine).

    Estimator (Bar-Yossef et al. 2002; Beyer et al. SIGMOD'07 "KMV
    synopses"): hash values uniformly into [0, 2^52); if the k-th
    smallest DISTINCT hash is h_k, the distinct count ≈ (k-1) *
    2^52 / h_k — all int64 here ((k-1)*2^52 < 2^63 for k ≤ 2000),
    truncating division in BOTH engines, so the estimate is an exact
    integer function of the input multiset.  Relative error ~
    1/sqrt(k-2).  Groups with fewer than k distinct hashes report the
    EXACT distinct count (the sketch holds every hash; kth_hash is
    NULL to mark the exact branch).

    Mergeability IS the plan: stage 1 builds one k-sketch per (task
    partition, group) — `collect_set` there dedups task-locally, its
    buffer bounded by one partition's rows for one group (the
    `_two_phase_topk` accounting: keys are task-local, no worldwide
    hot key funnels into one buffer) — and stage 2 unions sketches by
    taking the k smallest of the concatenation, exactly how per-day /
    per-source sketches roll up in a lake without rescanning history.
    The merge buffer is P·k hashes per group (P = stage-1 partition
    count); at extreme P insert an intermediate merge keyed by
    pmod(pid, 256) — noted, not needed at benchmark scale.

    NULL values are excluded (distinct-of-non-NULL, matching DuckDB
    ``count(DISTINCT x)``).  52-bit hashing makes hash collisions the
    floor of accuracy (~n²/2^53 colliding pairs); that is far below
    the k-driven estimator noise for any n this estimator is sane for.

    Output per group: (group..., n_rows, n_kept, kth_hash,
    distinct_est); with ``keep_state`` also ``kmv_state`` (the sorted
    hash array — persist it and roll it up later with
    :func:`kmv_merge` without rescanning the data).
    """
    if not 2 <= k <= 2000:
        raise ValueError("kmv_sketch: k must be in [2, 2000]")
    groups = list(group_cols or [])
    hv = F.conv(
        F.substring(F.md5(F.col(value_col).cast("string")), 1, _KMV_HEX), 16, 10
    ).cast("long")
    base = df.select(*groups, hv.alias("_hv")).filter(F.col("_hv").isNotNull())
    local = base.groupBy(
        F.spark_partition_id().alias("_p"), *groups
    ).agg(
        F.slice(F.array_sort(F.collect_set("_hv")), 1, k).alias("_loc"),
        F.count(F.lit(1)).cast("long").alias("_n"),
    )
    merged = local.groupBy(*groups).agg(
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("_loc")))), 1, k
        ).alias("_kmin"),
        F.sum("_n").cast("long").alias("n_rows"),
    )
    return _kmv_project(merged, k, groups, keep_state=keep_state)


def _kmv_project(merged: DataFrame, k: int, groups: list[str], *, keep_state: bool) -> DataFrame:
    """Shared estimate projection over a frame with (_kmin, n_rows)."""
    n_kept = F.size("_kmin").cast("int")
    kth = F.when(n_kept >= k, F.get("_kmin", k - 1))
    est = F.when(
        kth.isNull(), n_kept.cast("long")
    ).otherwise(
        # integer `div` — (k-1)*2^52 exceeds 2^53, a double division
        # would round; truncating int64 div matches DuckDB `//` exactly
        F.expr(f"CAST({(k - 1) * _KMV_SPACE} AS BIGINT) div get(_kmin, {k - 1})")
    )
    out = [
        *groups,
        "n_rows",
        n_kept.alias("n_kept"),
        kth.alias("kth_hash"),
        est.alias("distinct_est"),
    ]
    if keep_state:
        out.append(F.col("_kmin").alias("kmv_state"))
    return merged.select(*out)


def kmv_merge(
    sketches: DataFrame,
    *,
    k: int,
    group_cols: list[str] | None = None,
    state_col: str = "kmv_state",
    n_rows_col: str = "n_rows",
    keep_state: bool = False,
) -> DataFrame:
    """Union KMV sketches WITHOUT touching raw data — the lake rollup:
    persist per-partition/per-day sketch rows (``kmv_sketch(...,
    keep_state=True)``), then merge any slice of them (per month, per
    source, grand total) by taking the k smallest of the concatenated
    states. The merged sketch is IDENTICAL to sketching the union of
    the raw inputs directly (k-smallest-of-union is associative and
    commutative), so estimates never drift however the rollup tree is
    shaped — asserted in tests and by the q197 oracle.

    ``k`` must match the k the states were built with (a merge can
    only coarsen, never refine; mixing ks would silently use the
    smallest). Merge buffer per group = (#sketch rows in group)·k —
    sketch rows are pre-aggregated, so this is rollup-sized, not
    data-sized.
    """
    if not 2 <= k <= 2000:
        raise ValueError("kmv_merge: k must be in [2, 2000]")
    groups = list(group_cols or [])
    merged = sketches.groupBy(*groups).agg(
        F.slice(
            F.array_sort(
                F.array_distinct(F.flatten(F.collect_list(state_col)))
            ),
            1,
            k,
        ).alias("_kmin"),
        F.sum(n_rows_col).cast("long").alias("n_rows"),
    )
    return _kmv_project(merged, k, groups, keep_state=keep_state)


def join_skew_audit(
    left: DataFrame,
    right: DataFrame,
    key: str | list[str],
    *,
    top: int = 20,
    rows_per_task_target: int = 10_000_000,
) -> DataFrame:
    """Pre-join skew report: the heavy join keys, the join output each
    one would produce, and the salting factor that would bound it —
    the audit to run BEFORE a 100-TB join, because one hot key turns a
    co-partitioned join into a single straggler task (AQE's skew-join
    splits SORT-MERGE partitions after the fact; this names the keys
    and sizes the fix up front, and works for joins AQE won't split).

    Plan: each side collapses to (key, cnt) with one hash aggregate
    (map-side combine; output is |distinct keys|), the two count
    frames join on key (inner: a key absent from either side produces
    no join output and cannot skew), and the top-N keys by estimated
    output rows come out via ``orderBy.limit`` =
    TakeOrderedAndProject — a per-partition k-heap + k-bounded merge,
    never a global sort.  No raw row ever reshuffles.

    ``est_rows = cnt_l * cnt_r`` is the EXACT inner-join output for
    the key; ``salt_factor = ceil(est_rows / rows_per_task_target)``
    (1 = no salting needed) is the number of salt buckets that bounds
    the key's output per task — replicate the smaller side per salt
    bucket, spread the bigger side across them.

    All-integer output → value-oracled exactly.
    """
    keys = [key] if isinstance(key, str) else list(key)

    def side(df: DataFrame, alias: str) -> DataFrame:
        base = df.select(*keys)
        for c in keys:
            base = base.filter(F.col(c).isNotNull())
        return base.groupBy(*keys).agg(
            F.count(F.lit(1)).cast("long").alias(alias)
        )

    both = side(left, "n_left").join(side(right, "n_right"), keys)
    est = (F.col("n_left") * F.col("n_right")).cast("long")
    out = both.select(
        *keys,
        "n_left",
        "n_right",
        est.alias("est_rows"),
        F.ceil(est / F.lit(rows_per_task_target)).cast("int").alias("salt_factor"),
    )
    return out.orderBy(F.col("est_rows").desc(), *keys).limit(top)


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: list[str],
    *,
    k: int = 5,
    sensitive_col: str | None = None,
    l: int = 2,
) -> DataFrame:
    """Privacy re-identification audit: k-anonymity (every
    quasi-identifier combination must cover ≥ k rows — a group of 1-2
    rows re-identifies its members by join with any public table) and,
    with ``sensitive_col``, l-diversity (a group whose sensitive value
    is constant leaks it even at k rows — Machanavajjhala et al. 2007).

    One hash aggregate over the quasi-identifier columns; the single
    distinct aggregate compiles to Spark's two-level distinct rewrite
    (no Expand — only one distinct column). Output is
    |QI domain|-sized: one row per group with (n, n_sensitive,
    at_risk = n < k, l_violation = n_sensitive < l) — the release
    decision is a filter over this frame, and the "suppress or
    generalize" worklist IS the at_risk rows.

    NULL quasi values form their own group (GROUP BY NULL ≡ NULL in
    both engines — a NULL zip code still narrows a join).
    All-integer output → value-oracled exactly.
    """
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    if sensitive_col is not None:
        aggs.append(
            F.countDistinct(F.col(sensitive_col)).cast("long").alias("n_sensitive")
        )
    out = df.groupBy(*quasi_cols).agg(*aggs)
    out = out.withColumn("at_risk", F.col("n") < k)
    if sensitive_col is not None:
        out = out.withColumn("l_violation", F.col("n_sensitive") < l)
    return out


# sentinel for NULL categories in MI margins (join keys drop NULLs;
# a NULL category is still a category)
_MI_NULL = "\x1f<null>"


def pairwise_mutual_information(
    df: DataFrame,
    pairs: list[tuple[str, str]],
) -> DataFrame:
    """Column-dependency strength: mutual information I(X;Y) and the
    marginal entropies H(X), H(Y) for each requested column pair —
    the statistical generalization of the FD audit
    (`uniq.functional_dependency_violations` finds exact X→Y;
    MI/min(H) ranks SOFT dependencies, redundant columns, and leaky
    quasi-identifiers).

    Integer-frozen (the repo's discipline, stronger than round-6):
    every plogp term is ``n_xy · round(1e6·ln((n_xy·N)/(n_x·n_y)))``
    — the ratio is computed as one double mult/div sequence (identical
    op order both engines → bit-identical), ln frozen to the 1e-6 grid
    BEFORE multiplying by the exact integer count, so the reported
    numerators are EXACT int64 sums with no addition-order noise at
    all. I(X;Y) in nats = mi_num / (1e6 · n_total); overflow bound:
    |ln| ≤ 36 → n_xy per cell must stay under ~2.5e11 (stated).

    Scale: each pair costs one (x, y) hash aggregate; margins and the
    total re-aggregate the COLLAPSED cell frame (|cells| rows, never
    raw data), with the 1-row total broadcast. NULL categories are
    retained via a sentinel (join keys would silently drop them).

    Output: one row per pair — (x_col, y_col, n_total, n_cells,
    mi_num, hx_num, hy_num).
    """
    results = None
    for x, y in pairs:
        xc = F.coalesce(F.col(x).cast("string"), F.lit(_MI_NULL))
        yc = F.coalesce(F.col(y).cast("string"), F.lit(_MI_NULL))
        cells = (
            df.select(xc.alias("_x"), yc.alias("_y"))
            .groupBy("_x", "_y")
            .agg(F.count(F.lit(1)).cast("long").alias("n_xy"))
        )
        nx = cells.groupBy("_x").agg(F.sum("n_xy").alias("n_x"))
        ny = cells.groupBy("_y").agg(F.sum("n_xy").alias("n_y"))
        total = cells.agg(F.sum("n_xy").alias("n_tot"))

        def _lnint(num, den):
            return F.round(F.log(num / den) * F.lit(1_000_000), 0).cast("long")

        joined = (
            cells.join(nx, "_x")
            .join(ny, "_y")
            .crossJoin(F.broadcast(total))
        )
        mi_term = F.col("n_xy") * _lnint(
            F.col("n_xy").cast("double") * F.col("n_tot").cast("double"),
            F.col("n_x").cast("double") * F.col("n_y").cast("double"),
        )
        agg = joined.agg(
            F.max("n_tot").cast("long").alias("n_total"),
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            F.sum(mi_term).cast("long").alias("mi_num"),
        )
        hx = nx.crossJoin(F.broadcast(total)).agg(
            F.sum(
                F.col("n_x")
                * _lnint(F.col("n_tot").cast("double"), F.col("n_x").cast("double"))
            ).cast("long").alias("hx_num")
        )
        hy = ny.crossJoin(F.broadcast(total)).agg(
            F.sum(
                F.col("n_y")
                * _lnint(F.col("n_tot").cast("double"), F.col("n_y").cast("double"))
            ).cast("long").alias("hy_num")
        )
        row = (
            agg.crossJoin(F.broadcast(hx))
            .crossJoin(F.broadcast(hy))
            .select(
                F.lit(x).alias("x_col"),
                F.lit(y).alias("y_col"),
                "n_total",
                "n_cells",
                "mi_num",
                "hx_num",
                "hy_num",
            )
        )
        results = row if results is None else results.unionAll(row)
    return results


# ---------------------------------------------------------------------------
# mergeable frequency sketch (count-min)
# ---------------------------------------------------------------------------

def _cms_pos(value, d: int, width: int):
    """Row d's counter position for a value — md5-derived, portable."""
    key = F.concat_ws("\x1f", F.lit(str(d)), value.cast("string"))
    return F.pmod(
        F.conv(F.substring(F.md5(key), 1, 12), 16, 10).cast("long"),
        F.lit(width),
    ).cast("int")


def cms_counts(
    df: DataFrame,
    value_col: str,
    *,
    width: int = 1024,
    depth: int = 4,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Count-Min sketch state (Cormode & Muthukrishnan 2005) as a
    SPARSE counter frame ``(group..., d, pos, cnt)`` — the mergeable
    frequency sketch beside :func:`kmv_sketch`'s distinct sketch:
    bounded memory (≤ depth·width counters per group) whatever the
    value cardinality, estimates that only ever OVERCOUNT (est ≥
    true; E[overcount] ≤ 2N/width per row, min over depth rows), and
    merge = elementwise counter addition (:func:`cms_merge`), so
    per-day states roll up without rescanning — exactly the kmv lake
    pattern for "how often" instead of "how many distinct".

    Every counter is an exact integer function of the input multiset
    (md5 positions, integer counts) → value-oracled bit-for-bit,
    which JVM-private sketch bytes (Spark's count_min_sketch_agg)
    can never be. One hash aggregate; output ≤ depth·width rows per
    group. NULL values are excluded.
    """
    vals = df.select(
        *(group_cols or []), F.col(value_col).alias("_v")
    ).filter(F.col("_v").isNotNull())
    rows = vals.select(
        *(group_cols or []),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _cms_pos(F.col("_v"), d, width).alias("pos"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("_dp"),
    ).select(
        *(group_cols or []),
        F.col("_dp.d").alias("d"),
        F.col("_dp.pos").alias("pos"),
    )
    return rows.groupBy(*(group_cols or []), "d", "pos").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )


def cms_merge(
    counts: DataFrame, *, group_cols: list[str] | None = None
) -> DataFrame:
    """Union CMS states by elementwise counter addition — sketches
    built per partition/day (same width/depth) merge into any rollup
    without touching raw data."""
    return counts.groupBy(*(group_cols or []), "d", "pos").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )


def cms_point_estimates(
    counts: DataFrame,
    probes: DataFrame,
    value_col: str,
    *,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Frequency estimates for a probe list: est(v) = min over the
    depth rows of the counter at (d, pos_d(v)); a position never
    touched counts as 0 (sparse state). Probes broadcast against the
    |counters|-bounded state — no scan of raw data.

    Width/depth MUST match the state's build parameters (positions
    are a function of both; a mismatch silently probes wrong cells).
    Output: (value, est) with est ≥ true count, = true when no
    collision on some row.
    """
    probe_rows = probes.select(
        F.col(value_col).cast("string").alias("value")
    ).distinct().select(
        "value",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _cms_pos(F.col("value"), d, width).alias("pos"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("_dp"),
    ).select("value", F.col("_dp.d").alias("d"), F.col("_dp.pos").alias("pos"))
    joined = probe_rows.join(counts, ["d", "pos"], "left").select(
        "value", F.coalesce(F.col("cnt"), F.lit(0)).alias("_c")
    )
    return joined.groupBy("value").agg(F.min("_c").cast("long").alias("est"))


def threshold_sweep(
    df: DataFrame,
    score_col: str,
    label_col: str,
    thresholds: list[int],
) -> DataFrame:
    """Operating-point table for a score against a boolean label: for
    every candidate threshold t, the confusion counts of the rule
    ``score ≥ t`` — the table read before freezing a quality-
    classifier cut (`textstats.quality_classifier`, quantile filters):
    precision/recall at every t are ratios of these integers, and
    keeping the INTEGERS (not the ratios) keeps the output exact
    cross-engine and lets the caller re-derive any metric (F1, lift,
    kept-fraction) without a rescan.

    One scan, one 1-row wide aggregate (4 conditional sums per
    threshold — the `column_stats` pattern), then a metadata-sized
    stack to long form. Rows with NULL score or label are excluded
    (counted nowhere; the caller's null-rate is `column_stats`' job).

    Output: (threshold, tp, fp, fn, tn) — tp+fp+fn+tn identical on
    every row = usable row count.
    """
    s = F.col(score_col)
    y = F.col(label_col)
    base = df.filter(s.isNotNull() & y.isNotNull()).select(
        s.alias("_s"), y.cast("boolean").alias("_y")
    )
    aggs = []
    for i, t in enumerate(thresholds):
        kept = F.col("_s") >= t
        pos = F.col("_y")
        aggs += [
            F.sum((kept & pos).cast("long")).alias(f"_tp_{i}"),
            F.sum((kept & ~pos).cast("long")).alias(f"_fp_{i}"),
            F.sum((~kept & pos).cast("long")).alias(f"_fn_{i}"),
            F.sum((~kept & ~pos).cast("long")).alias(f"_tn_{i}"),
        ]
    wide = base.agg(*aggs)
    parts = ", ".join(
        f"{int(t)}, coalesce(_tp_{i}, 0), coalesce(_fp_{i}, 0), "
        f"coalesce(_fn_{i}, 0), coalesce(_tn_{i}, 0)"
        for i, t in enumerate(thresholds)
    )
    return wide.select(
        F.expr(
            f"stack({len(thresholds)}, {parts}) "
            "as (threshold, tp, fp, fn, tn)"
        )
    ).select(
        F.col("threshold").cast("long").alias("threshold"),
        F.col("tp").cast("long").alias("tp"),
        F.col("fp").cast("long").alias("fp"),
        F.col("fn").cast("long").alias("fn"),
        F.col("tn").cast("long").alias("tn"),
    )


def rate_jackknife(
    df: DataFrame,
    flag_col: str,
    key_col: str,
    *,
    buckets: int = 20,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """A rate with an error bar: delete-one-group jackknife over
    ``buckets`` md5-assigned row groups — the cheap, deterministic
    answer to "is 2.31% violations different from yesterday's 2.28%,
    or is that noise?". Resampling needs no distributional
    assumptions and one extra aggregate; the md5 bucket assignment
    makes it reproducible across runs and engines (no RNG).

    Per bucket b: n_b rows, k_b flagged; leave-one-out rate
    r_b = (K−k_b)/(N−n_b); the jackknife standard error is
    sqrt((B−1)/B · Σ(r_b − r̄)²). Counts are exact int64; the B
    leave-one-out ratios and the final se are doubles rounded at 6 —
    safe cross-engine because the fp reduction is over exactly B
    (bounded) terms (the repo's bounded-cardinality round-6 rule).

    Scale: one hash aggregate to B×|groups| rows (map-side combine),
    everything after runs on that collapsed frame. NULL flags are
    excluded; NULL keys hash via the '' coalesce (manifest rule).

    Output per group: (group..., n, k, rate, jk_se).
    """
    groups = list(group_cols or [])
    b = F.pmod(
        F.conv(
            F.substring(
                F.md5(F.coalesce(F.col(key_col).cast("string"), F.lit(""))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long"),
        F.lit(buckets),
    )
    base = df.filter(F.col(flag_col).isNotNull()).select(
        *groups, b.alias("_b"), F.col(flag_col).cast("long").alias("_f")
    )
    per = base.groupBy(*groups, "_b").agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum("_f").cast("long").alias("_k"),
    )
    # names must differ from per's _n/_k under Spark's default
    # case-insensitive resolution (_N ≡ _n there)
    tot = per.groupBy(*groups).agg(
        F.sum("_n").alias("_tn"),
        F.sum("_k").alias("_tk"),
        F.count(F.lit(1)).cast("long").alias("_tb"),
    )
    loo = per.join(tot, groups) if groups else per.crossJoin(F.broadcast(tot))
    loo = loo.withColumn(
        "_r",
        # guard the degenerate single-bucket group: 0/0 would be NaN
        # in Spark but engine-dependent in DuckDB; NULL drops out of
        # the aggregates and greatest(NULL, 0) lands se at 0 both ways
        F.when(
            F.col("_tn") > F.col("_n"),
            (F.col("_tk") - F.col("_k")).cast("double")
            / (F.col("_tn") - F.col("_n")).cast("double"),
        ),
    )
    agg = loo.groupBy(*groups).agg(
        F.max("_tn").alias("n"),
        F.max("_tk").alias("k"),
        F.max("_tb").alias("_nb"),
        F.avg("_r").alias("_rbar"),
        F.sum(F.col("_r") * F.col("_r")).alias("_rsq"),
    )
    # Σ(r−r̄)² = Σr² − B·r̄²  (same two-pass-free identity both sides)
    var = (
        (F.col("_nb") - 1).cast("double")
        / F.col("_nb").cast("double")
        * (F.col("_rsq") - F.col("_nb") * F.col("_rbar") * F.col("_rbar"))
    )
    return agg.select(
        *groups,
        F.col("n").cast("long").alias("n"),
        F.col("k").cast("long").alias("k"),
        F.round(F.col("k").cast("double") / F.col("n"), 6).alias("rate"),
        F.round(F.sqrt(F.greatest(var, F.lit(0.0))), 6).alias("jk_se"),
    )


def kmv_trailing_window(
    states: DataFrame,
    *,
    k: int,
    day_col: str = "day",
    window: int = 7,
) -> DataFrame:
    """Trailing-window distinct counts from per-day KMV states — the
    "7-day active users" query at sketch cost: each day's answer
    merges the ≤ ``window`` daily sketch rows in its range instead of
    rescanning a week of raw events per day (the raw plan reads W×
    the data; this reads the |days|·k state table once).

    A range join pairs every target day with its window of states
    (|days|² worst-case on a days-sized frame — trivially bounded),
    then :func:`kmv_merge` folds each group; merge ≡ direct holds per
    day exactly as in the q197 rollup proof, so the estimates are
    IDENTICAL to sketching each window from raw.

    Output per day: (day, n_rows, n_kept, kth_hash, distinct_est) —
    n_rows is the window's raw row count (summed from the states).
    """
    d = states.select(F.col(day_col).alias("_day")).distinct()
    in_window = (F.col(day_col) <= F.col("_day")) & (
        F.col(day_col) >= F.date_sub(F.col("_day"), window - 1)
    )
    joined = d.join(states, in_window).drop(day_col)
    return kmv_merge(
        joined.withColumnRenamed("_day", day_col),
        k=k,
        group_cols=[day_col],
    )


def roc_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    *,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Exact ROC AUC via the rank-sum (Mann-Whitney U) identity — the
    single scalar a pipeline reads beside `threshold_sweep`'s
    operating-point table before trusting a quality classifier's
    score at ALL cuts at once. Ties get the standard 1/2 credit
    (average-rank convention), kept EXACT by working in doubled
    integer units: per distinct score s with p_s positives and n_s
    negatives,

        u2 += 2*p_s*N_below(s) + p_s*n_s        (int64 throughout)
        AUC  = u2 / (2*P*N)

    so `u2` is the integer invariant both engines must agree on and
    the one division is a correctly-rounded double of identical
    int64s (round-6 per the bounded-cardinality rule).

    Scale: the per-row rank sort that textbook AUC implies is
    replaced by a hash aggregate to (group, DISTINCT score) rows —
    one shuffle of counting state, map-side combined — and the
    running N_below window runs over that collapsed frame (|distinct
    scores| rows per group, never |rows|). The window frame is ROWS
    UNBOUNDED PRECEDING..CURRENT ROW stated explicitly (the r4
    RANGE-default gotcha); scores are distinct within a group by
    construction so the order is total. A group with no positives or
    no negatives has undefined AUC -> NULL (never NaN; NaN sorts
    above numbers and would poison downstream range checks).

    Output per group: (group..., pos_n, neg_n, u2, auc).
    """
    from pyspark.sql import Window

    groups = list(group_cols or [])
    s = F.col(score_col)
    y = F.col(label_col)
    base = df.filter(s.isNotNull() & y.isNotNull()).select(
        *groups,
        s.alias("_s"),
        y.cast("boolean").cast("long").alias("_y"),
    )
    per = base.groupBy(*groups, "_s").agg(
        F.sum("_y").cast("long").alias("_p"),
        F.sum(1 - F.col("_y")).cast("long").alias("_neg"),
    )
    w = (
        Window.partitionBy(*groups).orderBy("_s")
        if groups
        else Window.partitionBy(F.lit(1)).orderBy("_s")
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    per = per.withColumn("_below", F.sum("_neg").over(w) - F.col("_neg"))
    agg = per.groupBy(*groups).agg(
        F.sum("_p").cast("long").alias("pos_n"),
        F.sum("_neg").cast("long").alias("neg_n"),
        F.sum(
            2 * F.col("_p") * F.col("_below") + F.col("_p") * F.col("_neg")
        )
        .cast("long")
        .alias("u2"),
    )
    denom = 2 * F.col("pos_n") * F.col("neg_n")
    return agg.select(
        *groups,
        "pos_n",
        "neg_n",
        "u2",
        F.when(
            denom > 0,
            F.round(F.col("u2").cast("double") / denom.cast("double"), 6),
        ).alias("auc"),
    )


def gains_table(
    df: DataFrame,
    score_col: str,
    label_col: str,
    *,
    buckets: int = 10,
) -> DataFrame:
    """Cumulative gains / lift table: rank rows by score DESCENDING,
    cut into ``buckets`` equal-population tiers, and report how many
    positives each tier captures — the "top 10% of the classifier's
    scores holds 43% of the gold docs" curve a curation pipeline
    reads when it can only afford to keep a fraction of the corpus.

    Everything stays integer: per DISTINCT score (desc) the running
    (cum_n, cum_pos) pair, tier = ceil(cum_n*buckets/total) spelled
    as the truncating-div identity (cum_n*buckets + total - 1) div
    total — exact in both engines for positive operands (Spark `div`
    == DuckDB `//`, r5 gotcha). Ties share one distinct-score row and
    therefore always land in ONE tier together (the deterministic
    tie convention; a tier can swallow its neighbour when a tie run
    exceeds the tier width — the honest behaviour, not a row split
    that would need an arbitrary order). Per tier the bucket row
    reports its own n/n_pos sums and the cumulative pair AT ITS END
    (max of the running values).

    Scale: identical shape to `roc_auc` — hash aggregate to distinct
    scores, one window over the collapsed frame, final tiny groupBy.
    The total-row broadcast is a 1-row cross join, never a shuffle.

    Output: (bucket, n, n_pos, cum_n, cum_pos) — lift(b) =
    (cum_pos/cum_n)/(P/N) is a client-side ratio of these integers.
    """
    from pyspark.sql import Window

    s = F.col(score_col)
    y = F.col(label_col)
    base = df.filter(s.isNotNull() & y.isNotNull()).select(
        s.alias("_s"), y.cast("boolean").cast("long").alias("_y")
    )
    per = base.groupBy("_s").agg(
        F.count(F.lit(1)).cast("long").alias("_cnt"),
        F.sum("_y").cast("long").alias("_pos"),
    )
    w = (
        Window.partitionBy(F.lit(1))
        .orderBy(F.col("_s").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    per = per.withColumn("_cum_n", F.sum("_cnt").over(w)).withColumn(
        "_cum_pos", F.sum("_pos").over(w)
    )
    total = base.agg(F.count(F.lit(1)).cast("long").alias("_tot"))
    per = per.crossJoin(F.broadcast(total)).withColumn(
        "bucket",
        F.expr(f"(_cum_n * {int(buckets)} + _tot - 1) div _tot").cast(
            "long"
        ),
    )
    return (
        per.groupBy("bucket")
        .agg(
            F.sum("_cnt").cast("long").alias("n"),
            F.sum("_pos").cast("long").alias("n_pos"),
            F.max("_cum_n").cast("long").alias("cum_n"),
            F.max("_cum_pos").cast("long").alias("cum_pos"),
        )
        .orderBy("bucket")
    )


def trimmed_mean(
    df: DataFrame,
    value_col: str,
    *,
    group_cols: list[str] | None = None,
    trim_pct: int = 10,
) -> DataFrame:
    """Exact trimmed mean per group: drop the lowest and highest
    ``trim_pct``% of ROWS (k = (n·pct) div 100 from each side, exact
    truncating-div rank arithmetic) and average the rest — the robust
    location estimate between mean (breaks on one outlier) and median
    (throws away magnitude), the standard drift-resistant rollup for
    heavy-tailed length/latency columns.

    Rank semantics without a per-row sort (the roc_auc shape): hash-
    aggregate to (group, DISTINCT value, cnt), one running-sum window
    over the collapsed frame (explicit ROWS frame), then each
    distinct-value row keeps
        overlap([cum−cnt+1, cum], [k+1, n−k])
    rows — pure integer interval arithmetic, so `sum_kept` (Σ kept·v)
    and `n_kept` (= n − 2k) are exact int64 for integer columns and
    the one division rounds at 6 (bounded-cardinality rule). Ties are
    handled EXACTLY: a tie run straddling the cut contributes only
    its in-window portion — the textbook definition, deterministic in
    both engines. NULL values excluded.

    Output: (group..., n, k_each_side, n_kept, sum_kept, tmean).
    """
    from pyspark.sql import Window

    groups = list(group_cols or [])
    pct = int(trim_pct)
    v = F.col(value_col)
    base = df.filter(v.isNotNull()).select(*groups, v.alias("_v"))
    per = base.groupBy(*groups, "_v").agg(
        F.count(F.lit(1)).cast("long").alias("_cnt")
    )
    w = (
        Window.partitionBy(*groups).orderBy("_v")
        if groups
        else Window.partitionBy(F.lit(1)).orderBy("_v")
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wt = (
        Window.partitionBy(*groups)
        if groups
        else Window.partitionBy(F.lit(1))
    )
    per = (
        per.withColumn("_cum", F.sum("_cnt").over(w))
        .withColumn("_n", F.sum("_cnt").over(wt))
        .withColumn("_k", F.expr(f"(_n * {pct}) div 100"))
    )
    kept = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.col("_cum"), F.col("_n") - F.col("_k"))
        - F.greatest(F.col("_cum") - F.col("_cnt") + 1, F.col("_k") + 1)
        + 1,
    )
    agg = per.select(
        *groups, "_n", "_k", kept.alias("_kept"), F.col("_v")
    ).groupBy(*groups).agg(
        F.max("_n").cast("long").alias("n"),
        F.max("_k").cast("long").alias("k_each_side"),
        F.sum("_kept").cast("long").alias("n_kept"),
        F.sum(F.col("_kept") * F.col("_v").cast("long"))
        .cast("long")
        .alias("sum_kept"),
    )
    return agg.select(
        *groups,
        "n",
        "k_each_side",
        "n_kept",
        "sum_kept",
        F.when(
            F.col("n_kept") > 0,
            F.round(
                F.col("sum_kept").cast("double")
                / F.col("n_kept").cast("double"),
                6,
            ),
        ).alias("tmean"),
    )


def quantile_normalize(
    df: DataFrame,
    value_col: str,
    *,
    group_cols: list[str] | None = None,
    out_col: str = "pct",
) -> DataFrame:
    """Per-group quantile (percentile-rank) normalization: every row
    gains its mid-rank percentile within its group —

        pct = (2·|below| + |ties|) / (2·n)        (round-6)

    — the transform that makes scores COMPARABLE ACROSS GROUPS before
    a global cut (a raw quality threshold keeps 80% of English and 9%
    of Thai; cutting on the per-lang percentile keeps the same share
    of each — the mixture-preserving form of q78's quantile filter).
    `mid2 = 2·below + ties` rides along as the exact int64 invariant.

    Scale: NO per-row window (a rank window would sort every row of a
    group on one reducer) — ranks come from the (group, DISTINCT
    value) frame (hash agg + running sum over the collapsed frame,
    the roc_auc shape), then JOIN BACK to rows co-partitioned on
    (group, value). Rows with NULL value pass through with NULL pct.

    Output: the input columns + (mid2, out_col).
    """
    from pyspark.sql import Window

    groups = list(group_cols or [])
    v = F.col(value_col)
    per = (
        df.filter(v.isNotNull())
        .groupBy(*groups, v.alias("_qv"))
        .agg(F.count(F.lit(1)).cast("long").alias("_cnt"))
    )
    w = (
        Window.partitionBy(*groups).orderBy("_qv")
        if groups
        else Window.partitionBy(F.lit(1)).orderBy("_qv")
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wt = (
        Window.partitionBy(*groups)
        if groups
        else Window.partitionBy(F.lit(1))
    )
    # rename the rank frame's key columns: it derives from df, and a
    # join on same-named lineage-shared columns trips Spark's
    # ambiguous-self-join analyzer
    ranks = (
        per.withColumn("_cum", F.sum("_cnt").over(w))
        .withColumn("_n", F.sum("_cnt").over(wt))
        .select(
            *[F.col(g).alias(f"_rg_{i}") for i, g in enumerate(groups)],
            "_qv",
            (2 * (F.col("_cum") - F.col("_cnt")) + F.col("_cnt"))
            .cast("long")
            .alias("mid2"),
            F.col("_n").alias("_n"),
        )
    )
    cond = [
        df[g].eqNullSafe(F.col(f"_rg_{i}")) for i, g in enumerate(groups)
    ] + [v == ranks["_qv"]]
    joined = df.join(ranks, cond, "left")
    return joined.select(
        *[df[c] for c in df.columns],
        ranks["mid2"],
        F.round(
            ranks["mid2"].cast("double") / (2 * ranks["_n"]).cast("double"),
            6,
        ).alias(out_col),
    )


def t_closeness(
    df: DataFrame,
    qi_cols: list[str],
    sensitive_col: str,
) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian, ICDE'07) — the
    step after `k_anonymity_audit`'s k/l checks: a group can be large
    (k ok) and diverse (l ok) yet still leak because its sensitive
    DISTRIBUTION differs from the table's (everyone in the group
    skews high). For an ORDERED sensitive attribute the distance is
    the Earth-Mover's Distance between group and global
    distributions, which over m distinct values with unit spacing is

        EMD = Σ_s |cumQ(s)/n_g − cumP(s)/N| / (m − 1)

    — kept exact by cross-multiplication: ``emd_num`` =
    Σ_s |cumQ(s)·N − cumP(s)·n_g| is an exact integer (decimal(38,0)
    so n_g·N at 10^12 rows cannot overflow), the reported ``t`` its
    one round-6 division by n_g·N·(m−1). Rank groups by the integer,
    cut on the integer — the float is display.

    Plan shape: two hash aggregates (global per-value counts — an
    |s|-row frame that BROADCASTS; per-(group, value) counts), the
    dense (group × s) grid via a broadcast cross join (|groups|·|s|
    audit-sized rows), running sums over the collapsed grid with
    explicit ROWS frames. NULL sensitive values are excluded from
    both distributions (stated); NULL QI is its own group (the q201
    convention).

    Output: (qi..., n, emd_num, t) — t in [0, 1].
    """
    from pyspark.sql import Window

    s = F.col(sensitive_col)
    base = df.filter(s.isNotNull()).select(*qi_cols, s.alias("_s"))
    glob = base.groupBy("_s").agg(
        F.count(F.lit(1)).cast("long").alias("_pc")
    )
    wg = Window.partitionBy(F.lit(1)).orderBy("_s").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    glob = glob.select(
        "_s", F.sum("_pc").over(wg).alias("_cump")
    ).crossJoin(
        F.broadcast(
            base.agg(
                F.count(F.lit(1)).cast("long").alias("_nn"),
                F.countDistinct("_s").cast("long").alias("_m"),
            )
        )
    )
    grp = base.groupBy(*qi_cols, "_s").agg(
        F.count(F.lit(1)).cast("long").alias("_qc")
    )
    groups = base.groupBy(*qi_cols).agg(
        F.count(F.lit(1)).cast("long").alias("_ng")
    )
    grid = groups.crossJoin(F.broadcast(glob))
    cond = [grid[g].eqNullSafe(grp[g]) for g in qi_cols] + [
        grid["_s"] == grp["_s"]
    ]
    grid = grid.join(grp, cond, "left").select(
        *[grid[g] for g in qi_cols],
        grid["_s"],
        "_cump",
        "_nn",
        "_m",
        "_ng",
        F.coalesce(grp["_qc"], F.lit(0)).alias("_qc"),
    )
    wq = Window.partitionBy(*qi_cols).orderBy("_s").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    grid = grid.withColumn("_cumq", F.sum("_qc").over(wq)).withColumn(
        "_term",
        F.abs(dec("_cumq") * dec("_nn") - dec("_cump") * dec("_ng")),
    )
    agg = grid.groupBy(*qi_cols).agg(
        F.max("_ng").cast("long").alias("n"),
        F.sum("_term").cast("decimal(38,0)").alias("_num"),
        F.max("_nn").cast("long").alias("_tn"),
        F.max("_m").cast("long").alias("_tm"),
    )
    den = (
        dec("_tn").cast("double")
        * F.col("n").cast("double")
        * (F.col("_tm") - 1).cast("double")
    )
    return agg.select(
        *qi_cols,
        "n",
        F.col("_num").cast("long").alias("emd_num"),
        F.when(
            F.col("_tm") > 1,
            F.round(F.col("_num").cast("double") / den, 6),
        ).otherwise(F.lit(0.0)).alias("t"),
    )


# ---------------------------------------------------------------------------
# HyperLogLog register sketch (md5-portable, mergeable by max)
# ---------------------------------------------------------------------------

_HLL_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def _hll_alpha(m: int) -> float:
    return _HLL_ALPHA.get(m, 0.7213 / (1 + 1.079 / m))


def hll_registers(
    df: DataFrame,
    key_col: str,
    *,
    p: int = 9,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Per-group HyperLogLog register state: (group..., idx, reg) with
    ``m = 2**p`` registers — the MERGEABLE distinct sketch (beside
    :func:`kmv_sketch`'s order-statistics one): registers merge by
    ``max``, so shards/days/partitions sketch independently and fold
    without rescans — exactly what ``approx_count_distinct`` computes
    JVM-side but with the state EXPOSED as rows, md5-portable so any
    SQL engine replays it bit-for-bit (the cross-engine contract
    approx_count_distinct's opaque binary state can't give).

    Hash: 60 bits from md5 (15 hex chars) — idx = h mod m, w = h div
    m, rho = (60−p) − bitlength(w) + 1 (``bin()``-based, exact
    integers in Spark and DuckDB; never floor(log2(double)) whose
    libm rounding is not cross-engine stable). NULL keys are excluded
    (distinct-count of NULL is meaningless; stated, not silent).

    Scale: one hash exchange on (group, idx) — at most m rows per
    group survive the map-side partial max, so shuffle bytes are
    bounded by |groups|·m regardless of input rows.
    """
    if not 4 <= p <= 14:
        raise ValueError("hll_registers: p must be in [4, 14]")
    groups = list(group_cols or [])
    m = 1 << p
    wbits = 60 - p
    k = F.col(key_col).cast("string")
    h = F.conv(F.substring(F.md5(k), 1, 15), 16, 10).cast("long")
    base = df.filter(k.isNotNull()).select(
        *groups, (h % F.lit(m)).alias("idx"), h.alias("_h")
    )
    w = F.expr(f"_h div {m}")
    rho = F.when(w > 0, F.lit(wbits + 1) - F.length(F.bin(w))).otherwise(
        F.lit(wbits + 1)
    )
    return (
        base.select(*groups, "idx", rho.cast("int").alias("_rho"))
        .groupBy(*groups, "idx")
        .agg(F.max("_rho").alias("reg"))
    )


def hll_merge(*register_frames: DataFrame) -> DataFrame:
    """Fold any number of register states (same group columns and p)
    into one: union + max per (group..., idx). max is associative and
    idempotent, so merge(shards) ≡ the direct sketch of the unioned
    data — re-sketching never needed, at-least-once re-merges are
    harmless (the KMV/CMS streaming lesson applies unchanged)."""
    if not register_frames:
        raise ValueError("hll_merge: need at least one register frame")
    out = register_frames[0]
    for fr in register_frames[1:]:
        out = out.unionByName(fr)
    keys = [c for c in out.columns if c != "reg"]
    return out.groupBy(*keys).agg(F.max("reg").alias("reg"))


def hll_estimate(
    registers: DataFrame,
    *,
    p: int = 9,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Estimate from register state: harmonic-mean raw estimate
    alpha·m²/Z with the standard small-range linear-counting switch
    (E ≤ 2.5m and empty registers exist → m·ln(m/V)).

    Z is accumulated EXACTLY: Σ 2^(61−reg) as decimal(38,0) (integer
    terms, order-independent — a double Σ2^-reg is order-dependent
    and would break the cross-engine hash); the single final division
    and ln round at 6 (bounded-cardinality fp rule). Output:
    (group..., n_hit, n_zero, est_distinct)."""
    if not 4 <= p <= 14:
        raise ValueError("hll_estimate: p must be in [4, 14]")
    groups = list(group_cols or [])
    m = 1 << p
    a_num = _hll_alpha(m) * m * m * (2.0**61)
    z_term = F.expr(
        "CAST(shiftleft(CAST(1 AS BIGINT), CAST(61 - reg AS INT)) AS DECIMAL(38,0))"
    )
    agg = registers.groupBy(*groups).agg(
        F.count(F.lit(1)).cast("long").alias("n_hit"),
        F.sum(z_term).alias("_z_hit"),
    )
    n_zero = (F.lit(m) - F.col("n_hit")).cast("long")
    z = (
        F.col("_z_hit")
        + n_zero.cast("decimal(38,0)") * F.lit(int(2**61)).cast("decimal(38,0)")
    ).cast("double")
    raw = F.lit(a_num) / z
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / n_zero.cast("double"))
    est = F.when((n_zero > 0) & (raw <= F.lit(2.5 * m)), linear).otherwise(raw)
    return agg.select(
        *groups,
        "n_hit",
        n_zero.alias("n_zero"),
        F.round(est, 6).alias("est_distinct"),
    )


def conformal_report(
    calib: DataFrame,
    evalf: DataFrame,
    score_col: str,
    *,
    alpha_ppm: int = 100_000,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Split-conformal calibration + coverage audit — the
    distribution-free guarantee layer for any scoring model in the
    pipeline (quality classifiers, anomaly scores, drift statistics):
    from a CALIBRATION split, the threshold is the exact
    k = ceil((n+1)·(1−α))-th smallest nonconformity score (finite-
    sample-corrected quantile), and marginal coverage of fresh points
    is then ≥ 1−α by exchangeability; the EVAL split measures it.

    Rank semantics without a per-row sort (the roc_auc/trimmed_mean
    shape): hash-aggregate to (group, DISTINCT score, cnt), one
    running-sum window over the collapsed frame (ROWS frame stated),
    threshold = min score whose cumulative count reaches k. k > n
    (tiny calibration sets) yields a NULL threshold = +∞ — every eval
    row covered, reported honestly rather than clamped. ``alpha_ppm``
    is integer ppm so k is exact int64 arithmetic in both engines;
    NULL scores are excluded on both splits (stated). Coverage join
    broadcasts the |groups|-row threshold frame.

    Output: (group..., n_calib, rank_k, threshold, n_eval, n_covered,
    coverage_ppm).
    """
    if not 0 < alpha_ppm < 1_000_000:
        raise ValueError("conformal_report: alpha_ppm must be in (0, 1e6)")
    from pyspark.sql import Window

    groups = list(group_cols or [])
    keep = 1_000_000 - alpha_ppm
    v = F.col(score_col)
    base = calib.filter(v.isNotNull()).select(*groups, v.alias("_v"))
    per = base.groupBy(*groups, "_v").agg(
        F.count(F.lit(1)).cast("long").alias("_cnt")
    )
    wp = Window.partitionBy(*groups) if groups else Window.partitionBy(F.lit(1))
    w = (
        wp.orderBy("_v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    per = (
        per.withColumn("_cum", F.sum("_cnt").over(w))
        .withColumn("_n", F.sum("_cnt").over(wp))
        .withColumn(
            "_k", F.expr(f"((_n + 1) * {keep} + 999999) div 1000000")
        )
    )
    thr = per.groupBy(*groups).agg(
        F.max("_n").alias("n_calib"),
        F.max("_k").alias("rank_k"),
        F.min(F.when(F.col("_cum") >= F.col("_k"), F.col("_v"))).alias(
            "threshold"
        ),
    )
    ev = evalf.filter(v.isNotNull()).select(*groups, v.alias("_s"))
    joined = (
        ev.join(F.broadcast(thr), groups)
        if groups
        else ev.crossJoin(F.broadcast(thr))
    )
    covered = (
        (F.col("_s") <= F.col("threshold")) | F.col("threshold").isNull()
    ).cast("int")
    return joined.groupBy(
        *groups, "n_calib", "rank_k", "threshold"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_eval"),
        F.sum(covered).cast("long").alias("n_covered"),
    ).withColumn(
        "coverage_ppm", F.expr("n_covered * 1000000 div n_eval")
    )


def gini_concentration(
    df: DataFrame,
    value_col: str,
    *,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Gini coefficient of a nonnegative size distribution per group —
    the concentration headline a data card needs next to the mean: a
    corpus whose bytes are Gini 0.9 across documents is a handful of
    megadocs wearing a long tail (dedup/packing behave very
    differently there than at 0.2), and source-level token Gini is
    the one-number inequality check on a training mix.

    Exact rank arithmetic on the DISTINCT-VALUE frame — never a
    per-row global sort: with values ascending at ranks 1..n,
    G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx); a run of c copies of value v
    starting at rank s contributes v·(c·s + c·(c−1) div 2) to the rank
    sum, so the whole statistic reduces to one running-sum window over
    |distinct values| rows per group (the trimmed_mean/roc_auc shape)
    plus one hash aggregate. Sums accumulate as decimal(38,0) (rank ×
    value reaches 10^21 at 10^12 rows) and cross the engine boundary
    as strings; the single division is the only fp op (round-6 over
    identical exact integers both engines). NULL and negative values
    (Gini is undefined there) are excluded and counted in
    ``n_excluded`` rather than silently vanishing.
    """
    from pyspark.sql import Window

    groups = list(group_cols or [])
    v = F.col(value_col).cast("long")
    base = df.select(*groups, v.alias("_v"))
    ok = F.col("_v").isNotNull() & (F.col("_v") >= 0)
    excl = base.groupBy(*groups).agg(
        F.sum(F.when(~ok | F.col("_v").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_excluded")
    )
    dv = (
        base.filter(ok)
        .groupBy(*groups, "_v")
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
    )
    w = (
        Window.partitionBy(*groups)
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    staged = dv.withColumn(
        "_s", F.lit(1).cast("long") + F.coalesce(F.sum("_c").over(w), F.lit(0))
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    contrib = dec(F.col("_v")) * (
        dec(F.col("_c")) * dec(F.col("_s"))
        + dec(F.expr("_c * (_c - 1) div 2"))
    )
    agg = staged.groupBy(*groups).agg(
        F.sum("_c").cast("long").alias("n"),
        F.sum(dec(F.col("_v")) * dec(F.col("_c"))).alias("_sx"),
        F.sum(contrib).alias("_si"),
    )
    n = F.col("n").cast("decimal(38,0)")
    num = F.lit(2).cast("decimal(38,0)") * F.col("_si") - (
        n + F.lit(1).cast("decimal(38,0)")
    ) * F.col("_sx")
    den = n * F.col("_sx")
    # left from excl so an all-excluded group still surfaces (n=0)
    out = excl.join(agg, groups, "left") if groups else excl.crossJoin(agg)
    return out.select(
        *groups,
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
        "n_excluded",
        F.coalesce(F.col("_sx").cast("string"), F.lit("0")).alias("total"),
        F.when(den > 0, F.round(num.cast("double") / den.cast("double"), 6)).alias(
            "gini"
        ),
    )
