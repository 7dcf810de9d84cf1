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
