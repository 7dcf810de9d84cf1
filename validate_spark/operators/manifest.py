"""Resumable per-partition lineage manifest (north_rule requirement).

The reference's ``ValidResult`` (result.go:21-32) decouples outcome
from execution; at table scale the outcome unit is a PARTITION. Each
run appends one manifest row per completed partition:

    (part_id, ruleset_hash, n_rows, n_pass, n_fail, n_violations,
     verdict, run_id)

Resume = anti-join: a restarted job loads the manifest, drops
partitions already recorded under the SAME ruleset hash, and processes
only the remainder — a killed 10^12-row job restarts where it stopped
instead of rescanning everything. A changed rule set changes the hash,
which invalidates the whole manifest automatically.

Partition identity is CONTENT-defined, not ``spark_partition_id()`` —
executor scheduling must not change what "partition 17" means between
runs. The hash is md5 (first 8 hex chars → int), NOT xxhash64: part_id
crosses the engine boundary (external audits / the DuckDB oracle must
recompute it from the key), and the repo rule is that boundary-crossing
hashes are md5; xxhash64 stays engine-internal.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from validate_spark.operators.engine import validate, ValidationResult
from validate_spark.plans.plan import RuleSet

PART_COL = "_vs_part"

MANIFEST_SCHEMA = (
    "part_id int, ruleset_hash string, n_rows long, n_pass long, "
    "n_fail long, n_violations long, verdict boolean, run_id string"
)


def with_partition_id(df: DataFrame, key_col: str, n_partitions: int) -> DataFrame:
    """Content-defined partition id, portable across engines:
    ``conv(substr(md5(key), 1, 8), 16, 10) % n`` ≡ DuckDB
    ``CAST('0x' || substr(md5(key), 1, 8) AS BIGINT) % n``.
    NULL keys hash as '' — md5(NULL) is NULL (unlike xxhash64, which
    never is), and a NULL part_id would make null-keyed rows
    unresumable."""
    k = F.coalesce(F.col(key_col).cast("string"), F.lit(""))
    h = F.conv(F.substring(F.md5(k), 1, 8), 16, 10)
    return df.withColumn(
        PART_COL, F.pmod(h.cast("long"), F.lit(n_partitions)).cast("int")
    )


def read_manifest(spark: SparkSession, path: str) -> DataFrame:
    try:
        return spark.read.parquet(path)
    except Exception:
        return spark.createDataFrame([], MANIFEST_SCHEMA)


def finished_partitions(spark: SparkSession, path: str, ruleset_hash: str) -> DataFrame:
    m = read_manifest(spark, path)
    return (
        m.filter(F.col("ruleset_hash") == ruleset_hash)
        .select(F.col("part_id").alias(PART_COL))
        .distinct()
    )


def partition_manifest(result: ValidationResult, run_id: str) -> DataFrame:
    """Aggregate an annotated validation result into manifest rows —
    one small groupBy over the already-computed verdict columns."""
    ann = result.annotated
    return ann.groupBy(F.col(PART_COL).alias("part_id")).agg(
        F.lit(result.plan.plan_hash).alias("ruleset_hash"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("_vs_pass").cast("long")).alias("n_pass"),
        F.sum((~F.col("_vs_pass")).cast("long")).alias("n_fail"),
        F.sum(F.size("_vs_failed").cast("long")).alias("n_violations"),
        (F.sum((~F.col("_vs_pass")).cast("long")) == 0).alias("verdict"),
        F.lit(run_id).alias("run_id"),
    )


def run_resumable(
    spark: SparkSession,
    df: DataFrame,
    ruleset: RuleSet,
    manifest_path: str,
    *,
    key_col: str = "doc_id",
    n_partitions: int = 64,
    violations_path: str | None = None,
    run_id: str | None = None,
) -> dict:
    """Validate only partitions not yet recorded in the manifest.

    Returns {"run_id", "n_partitions_done_before", "n_partitions_run",
    "manifest": DataFrame}. Violations (if a sink path is given) are
    appended partitioned by part_id so re-runs never duplicate them.
    """
    run_id = run_id or uuid.uuid4().hex[:12]
    parted = with_partition_id(df, key_col, n_partitions)

    done = finished_partitions(spark, manifest_path, ruleset.hash())
    n_done_before = done.count()
    # broadcast anti-join: the manifest is tiny (≤ n_partitions rows)
    todo = parted.join(F.broadcast(done), PART_COL, "left_anti")

    result = validate(todo, ruleset, key_cols=[key_col])
    manifest_rows = partition_manifest(result, run_id)

    if violations_path is not None:
        (
            result.violations()
            .write.mode("append")
            .parquet(violations_path)
        )
    manifest_rows.write.mode("append").parquet(manifest_path)

    written = spark.read.parquet(manifest_path)
    n_run = (
        written.filter(F.col("run_id") == run_id).select("part_id").distinct().count()
    )
    return {
        "run_id": run_id,
        "n_partitions_done_before": n_done_before,
        "n_partitions_run": n_run,
        "manifest": written,
    }
