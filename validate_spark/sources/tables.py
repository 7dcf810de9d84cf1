"""Table IO — Iceberg-first with parquet fallback.

The north rule targets Iceberg tables of interleaved documents. Iceberg
is a catalog + jar configuration, not an API change: every operator in
this engine consumes a plain ``DataFrame``, so the ONLY Iceberg-aware
code is here. On a real cluster, submit with::

    spark-submit --py-files validate_spark.zip \\
      --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \\
      --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog \\
      --conf spark.sql.catalog.lake.type=rest ... job.py

and pass ``lake.db.documents`` to :func:`read_table`. This sandbox has
no Iceberg runtime jar, so tests exercise the parquet path; the
dispatch below is what changes in production — nothing else does.

Iceberg specifics the engine already exploits when present:
- **partition pruning / hidden partitioning** — our plans filter on
  plain columns, which Iceberg maps to partition transforms itself;
- **snapshot reads** — pass ``snapshot_id`` for reproducible validation
  runs (the manifest records it as part of run lineage);
- **MERGE/append sinks** — verdict/violation writers use
  ``writeTo(...).append()`` on v2 tables, parquet ``save`` otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg SparkCatalog is on the classpath."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def read_table(
    spark: SparkSession,
    source: str,
    *,
    fmt: str = "auto",
    snapshot_id: int | None = None,
) -> DataFrame:
    """Read a table by Iceberg name (``catalog.db.table``) or file path.

    fmt="auto": paths (contains ``/`` or ends in .parquet) read as
    parquet; dotted names resolve through the session catalog (Iceberg
    when configured). ``snapshot_id`` pins an Iceberg snapshot for
    reproducible validation runs; it is an error on the parquet path.
    """
    is_path = "/" in source or source.endswith(".parquet")
    if fmt == "parquet" or (fmt == "auto" and is_path):
        if snapshot_id is not None:
            raise ValueError("snapshot_id requires an Iceberg table, got a path")
        return spark.read.parquet(source)
    reader = spark.read
    if snapshot_id is not None:
        reader = reader.option("snapshot-id", str(snapshot_id))
    return reader.table(source)


def write_table(
    df: DataFrame,
    target: str,
    *,
    mode: str = "append",
) -> None:
    """Append/overwrite to an Iceberg table name or a parquet path —
    the sink for verdicts, violations, and manifests."""
    if "/" in target or target.endswith(".parquet"):
        df.write.mode(mode).parquet(target)
    elif mode == "append":
        df.writeTo(target).append()
    else:
        df.writeTo(target).replace()
