"""The north-rule validation suite as ONE composable report — the
"full rule-set pass incl. uniqueness + referential + drift histogram"
that BASELINE.json's metric clocks, packaged as a public operator
instead of living only inside bench.py.

``suite_report`` returns a single long-form DataFrame
``(check, metric, value:long)`` unioning four independent aggregate
subtrees:

- ``verdicts``:     n_rows / n_pass / n_fail / n_violations from one
                    validation pass (operators/engine.py);
- ``uniqueness``:   duplicated-key-value count per requested key set
                    (operators/uniq.py — salted two-phase);
- ``referential``:  dangling-reference row count per (column, catalog)
                    pair (operators/refcheck.py — broadcast anti-join);
- ``histogram:<c>``: fixed-range bucket counts (operators/stats.py) —
                    the drift-check input.

Why one frame: a single ``collect()``/sink action submits ALL branches
in one Spark job, so the scheduler interleaves their stages across the
executor pool instead of draining it at per-check action boundaries
(bench.py measured this as the difference between a full and an idle
pool; its ThreadPoolExecutor trick is the multi-action spelling of the
same idea). Every branch ends in a partial-aggregated scalar or a
bucket-cardinality frame — the union moves only those.

Values are all integers → the report replays hash-exactly in any
engine (driver contract q93).

Reference seed: Validate() + Errors + safeData are per-record
(validation.go:525-609); the suite is their dataset-level composition
per SURVEY §2.9.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_SCHEMA = ["check", "metric", "value"]


def _row(check: str, metric, value) -> list:
    return [F.lit(check).alias("check"), metric, value.cast("long").alias("value")]


def suite_report(
    df: DataFrame,
    rules,
    *,
    key_cols: list[str],
    unique_cols: list[list[str]] | None = None,
    ref_checks: list[tuple[str, DataFrame, str]] | None = None,
    hist_specs: list[tuple[str, float, float, int]] | None = None,
) -> DataFrame:
    """One-action validation suite (see module docstring).

    ``unique_cols``: key sets to check for duplicates, e.g.
    ``[["doc_id"], ["source", "doc_id"]]``.
    ``ref_checks``: ``(fact_col, catalog_df, catalog_key)`` triples.
    ``hist_specs``: ``(col, lo, hi, n_buckets)`` fixed-range histograms.
    """
    from validate_spark.operators.engine import validate
    from validate_spark.operators.refcheck import dangling_refs
    from validate_spark.operators.stats import numeric_histogram
    from validate_spark.operators.uniq import duplicate_keys

    res = validate(df, rules, key_cols=key_cols)
    ann = res.annotated
    parts: list[DataFrame] = []

    verdicts = ann.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("_vs_pass").cast("long")).alias("_p"),
        F.sum(F.size("_vs_failed").cast("long")).alias("_v"),
    )
    rows = F.array(
        F.struct(F.lit("n_rows").alias("m"), F.col("_n").alias("v")),
        F.struct(F.lit("n_pass").alias("m"), F.col("_p").alias("v")),
        F.struct(F.lit("n_fail").alias("m"), (F.col("_n") - F.col("_p")).alias("v")),
        F.struct(F.lit("n_violations").alias("m"), F.col("_v").alias("v")),
    )
    parts.append(
        verdicts.select(F.explode(rows).alias("e")).select(
            *_row("verdicts", F.col("e.m").alias("metric"), F.col("e.v"))
        )
    )

    for cols in unique_cols or []:
        parts.append(
            duplicate_keys(df, cols)
            .agg(F.count(F.lit(1)).alias("_d"))
            .select(
                *_row(
                    "uniqueness",
                    F.lit("dup_keys:" + ",".join(cols)).alias("metric"),
                    F.col("_d"),
                )
            )
        )

    for fact_col, catalog, catalog_key in ref_checks or []:
        parts.append(
            dangling_refs(df, fact_col, catalog, catalog_key)
            .agg(F.count(F.lit(1)).alias("_d"))
            .select(
                *_row(
                    "referential",
                    F.lit(f"dangling:{fact_col}").alias("metric"),
                    F.col("_d"),
                )
            )
        )

    for col, lo, hi, nb in hist_specs or []:
        parts.append(
            numeric_histogram(df, col, lo=lo, hi=hi, n_buckets=nb).select(
                *_row(
                    f"histogram:{col}",
                    F.col("bucket").cast("string").alias("metric"),
                    F.col("cnt"),
                )
            )
        )

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
