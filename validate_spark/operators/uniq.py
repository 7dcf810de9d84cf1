"""Skew-safe uniqueness checking (SURVEY.md §2.9, north_rule).

The reference has only slice-level `unique` (a per-record filter,
filtering.go:179-182); table-scale uniqueness of a key column is the
natural lift. A plain ``groupBy(key).count()`` dies on hot keys at
10^12 rows, so the scale path is SALTED TWO-PHASE aggregation:

  phase 1: groupBy(key, salt)  — hot keys split across `salt_buckets`
           reducers; partial counts are tiny (map-side combine)
  phase 2: groupBy(key) sum    — at most `salt_buckets` rows per key

With AQE skew handling on this often optimizes to the same thing, but
the explicit salt guarantees the bound even for a single key owning a
whole partition's worth of rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def duplicate_keys(
    df: DataFrame,
    key: str | list[str],
    *,
    salt_buckets: int | None = None,
) -> DataFrame:
    """Rows of (key..., dup_count) for keys appearing more than once.
    NULL keys are excluded (they are a `required` violation, not a
    uniqueness one — matching the reference's separation of concerns).
    """
    keys = [key] if isinstance(key, str) else list(key)
    base = df.select(*keys)
    for k in keys:
        base = base.filter(F.col(k).isNotNull())

    if salt_buckets and salt_buckets > 1:
        salted = base.withColumn(
            "_salt", F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(salt_buckets))
        )
        partial = salted.groupBy(*keys, "_salt").agg(F.count(F.lit(1)).alias("_c"))
        counts = partial.groupBy(*keys).agg(F.sum("_c").alias("dup_count"))
    else:
        counts = base.groupBy(*keys).agg(F.count(F.lit(1)).alias("dup_count"))

    return counts.filter(F.col("dup_count") > 1)


def uniqueness_report(df: DataFrame, key: str, *, salt_buckets: int | None = None) -> DataFrame:
    """One-row summary: (n_rows, n_keys, n_dup_keys, n_dup_rows)."""
    dups = duplicate_keys(df, key, salt_buckets=salt_buckets)
    dup_agg = dups.agg(
        F.count(F.lit(1)).alias("n_dup_keys"),
        F.coalesce(F.sum("dup_count"), F.lit(0)).alias("n_dup_rows"),
    )
    base_agg = df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct(F.col(key)).alias("n_keys"),
    )
    return base_agg.crossJoin(dup_agg)


def functional_dependency_violations(
    df: DataFrame,
    determinant: str | list[str],
    dependent: str,
) -> DataFrame:
    """Functional-dependency audit ``determinant -> dependent`` (Deequ
    profiling's FD hint, and the practical 'is zip -> city still true
    in today's crawl' check): determinant values whose dependent column
    takes MORE than one distinct non-null value, with row and distinct
    counts. Empty result == the FD holds.

    NULL dependents are skipped (a missing value cannot contradict a
    dependency — it is a `required` finding, not an FD one; same
    separation of concerns as :func:`duplicate_keys`).

    Scale: deliberately distinct-FREE — groupBy(det, dep) counts, then
    groupBy(det) rolls up group counts. A count_distinct beside the
    row count would re-plan the agg as a two-phase Expand (input rows
    x 2 — the working-notes round-4 gotcha); the two-stage spelling is
    one full-width exchange on (det, dep) plus a group-cardinality
    exchange on det, both map-side combined.
    """
    dets = [determinant] if isinstance(determinant, str) else list(determinant)
    base = df.filter(F.col(dependent).isNotNull())
    for d in dets:
        base = base.filter(F.col(d).isNotNull())
    pairs = base.groupBy(*dets, dependent).agg(F.count(F.lit(1)).alias("_c"))
    return (
        pairs.groupBy(*dets)
        .agg(
            F.sum("_c").cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n_distinct_dependent"),
        )
        .filter(F.col("n_distinct_dependent") > 1)
    )
