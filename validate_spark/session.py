"""SparkSession factory tuned for this engine.

local[N] here stands in for an N-executor cluster; all configs below are
the ones that matter at 100 TB too: AQE for runtime re-planning (skew
joins, partition coalescing), Arrow for any pandas-UDF path, shuffle
partitions sized to the parallelism.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def fan_out(df):
    """Ensure an expensive per-row stage (Arrow pandas UDF, regex-heavy
    projection) runs at cluster parallelism, not input-file parallelism:
    a small or badly-packed parquet source can scan as 1-2 partitions,
    starving every core downstream (measured: minhash signatures at
    2/32 cores). Conditional — when the input already has >=
    defaultParallelism partitions (any real table at scale) this is a
    no-op, so the shuffle is only ever paid on under-partitioned inputs
    where it is trivially cheap."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def get_spark(
    app: str = "validate_spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = f"local[{cores}]"
    n = os.cpu_count() if cores == "*" else int(cores)
    if shuffle_partitions is None:
        shuffle_partitions = max(8, n)
    b = (
        SparkSession.builder.master(master)
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
