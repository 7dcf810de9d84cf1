"""CSV ingestion with malformed-row quarantine — the file-format
tolerance layer in front of validation.

Reference seed: gookit/validate consumes pre-parsed maps / structs /
forms (validate.go FromMap/FromStruct, FromURLValues); byte-level
format tolerance is outside its scope. At table scale the analogue is
Spark's PERMISSIVE CSV reader with a corrupt-record column: one bad
line in 10^12 must become a quarantined ROW, never a job abort (the
repo's ANSI rule applied to ingestion).

Pinned PERMISSIVE semantics (observed on Spark 4, asserted in
tests/test_sources.py):

* a type-mismatched field → that field NULL, the OTHER fields still
  parsed, raw line captured in the corrupt column;
* extra tokens → all schema fields parsed, line captured;
* missing tokens → missing fields NULL, line captured.

Scale: one map-only scan — the reader parses, flags, and routes in
the same projection; corrupt rows carry their raw line so a replay /
repair job needs no second read of the source. Splitting good from
quarantined is two filters over one cached scan, not two reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

CORRUPT_COL = "_corrupt_record"


def read_csv_validated(
    spark: SparkSession,
    path: str,
    schema_ddl: str,
    *,
    sep: str = ",",
    header: bool = False,
    corrupt_col: str = CORRUPT_COL,
) -> DataFrame:
    """Read CSV under PERMISSIVE mode with the raw line of every
    malformed row preserved in ``corrupt_col`` and a boolean
    ``is_corrupt`` verdict column appended. ``schema_ddl`` is the DDL
    of the DATA columns only (the corrupt column is added here — it
    must be part of the read schema for Spark to populate it)."""
    full = f"{schema_ddl}, {corrupt_col} string"
    df = (
        spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .option("sep", sep)
        .option("header", str(bool(header)).lower())
        .schema(full)
        .csv(path)
    )
    return df.withColumn("is_corrupt", F.col(corrupt_col).isNotNull())


def quarantine_split(
    df: DataFrame, *, corrupt_col: str = CORRUPT_COL
) -> tuple[DataFrame, DataFrame]:
    """(clean_rows, quarantined_rows): clean rows drop the plumbing
    columns and flow straight into ``validate()``; quarantined rows
    keep the raw line for repair/replay. Two filters over ONE scan —
    persist the input if both sides are consumed eagerly.

    Spark restriction (SPARK-21610), stated: an action over the RAW
    scan whose pruned schema is ONLY the corrupt column is disallowed
    — ``quarantined.count()`` trips it (count prunes every data
    column away). Either persist the parsed frame first (the right
    call when both splits are consumed anyway) or aggregate something
    that references a data column."""
    good = df.filter(~F.col("is_corrupt")).drop(corrupt_col, "is_corrupt")
    bad = df.filter(F.col("is_corrupt"))
    return good, bad


def read_evolved_parquet(spark, paths: list[str]):
    """Schema-evolution ingestion: union N parquet snapshot
    directories whose schemas DRIFTED (columns added/dropped between
    snapshots) into one frame via ``mergeSchema`` — absent columns
    surface as NULL, never as a read error. This is the ingestion-side
    sibling of drift.schema_profile_drift (which DETECTS the drift;
    this op survives it).

    Scale: mergeSchema's cost is footer-only (one schema per file
    merged on the driver) — row data is never rewritten; each file's
    scan projects its own physical columns and fills the rest with
    NULL, so column pruning still reaches every individual file."""
    return (
        spark.read.option("mergeSchema", "true").parquet(*paths)
    )


def evolution_profile(df):
    """Per-column presence profile of an evolved read, LONG format
    (column, n_rows, n_nonnull, n_null) — the first question after a
    schema merge ('how much of the corpus actually HAS the new
    column?'). ONE map-side-partial aggregate over the whole frame
    (never a per-column scan), melted from the 1-row wide result by a
    literal struct explode — zero extra shuffle."""
    from pyspark.sql import functions as F

    # POSITIONAL aliases: naming them nn_<column> would collide with
    # an input column literally called n_rows (or an nn_* pair) —
    # evolved schemas are exactly where weird names show up
    aggs = [F.count(F.lit(1)).cast("long").alias("_ep_rows")] + [
        F.count(F.col(c)).cast("long").alias(f"_ep_{i}")
        for i, c in enumerate(df.columns)
    ]
    wide = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"_ep_{i}").alias("n_nonnull"),
            )
            for i, c in enumerate(df.columns)
        ]
    )
    return wide.select(
        F.explode(entries).alias("e"), F.col("_ep_rows")
    ).select(
        F.col("e.column").alias("column"),
        F.col("_ep_rows").alias("n_rows"),
        F.col("e.n_nonnull").alias("n_nonnull"),
        (F.col("_ep_rows") - F.col("e.n_nonnull")).alias("n_null"),
    )
