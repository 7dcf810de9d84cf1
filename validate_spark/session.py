"""SparkSession factory tuned for this engine.

local[N] here stands in for an N-executor cluster; all configs below are
the ones that matter at 100 TB too: AQE for runtime re-planning (skew
joins, partition coalescing), Arrow for any pandas-UDF path, shuffle
partitions sized to the parallelism.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

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


@contextmanager
def low_shuffle(spark: SparkSession, n: int = 4):
    """Temporarily pin ``spark.sql.shuffle.partitions`` low for a
    SMALL-FIXTURE Structured Streaming query started inside the block.

    Stateful streaming cost is dominated by state-store instances:
    every stateful operator materializes one store PER shuffle
    partition PER micro-batch (×2 sides for a stream-stream join), so
    a kilobyte-scale test fixture at 32 partitions pays ~95% of its
    wall time in empty-store setup/commit (measured: q148's outer
    interval join, 63.9 s → a few seconds at 4). The streaming query
    pins its shuffle-partition count at FIRST start (persisted in the
    checkpoint offset log), so setting the conf around .start() is
    sufficient and the restore cannot re-plan a running query.

    Production note: this is a FIXTURE setting. At real scale the
    shuffle-partition count should match cluster parallelism — keyed
    state then shards across executors; see BENCH.md §4.
    """
    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key)
    spark.conf.set(key, str(n))
    try:
        yield
    finally:
        spark.conf.set(key, old)


def get_spark(
    app: str = "validate_spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build the tuned session. ``extra_conf`` lets a deployment add
    cluster-specific settings; the one that matters for PRODUCTION
    Structured Streaming with large keyed state (sessionization,
    stream-stream joins) is the RocksDB state store::

        get_spark(extra_conf={
            "spark.sql.streaming.stateStore.providerClass":
                "org.apache.spark.sql.execution.streaming.state."
                "RocksDBStateStoreProvider",
        })

    The default HDFS-backed provider keeps every store version on the
    executor HEAP — fine for fixtures, an OOM at 10^9 live sessions.
    RocksDB spills state to local disk with incremental checkpointing.
    Output semantics are identical (asserted by
    tests/test_streaming.py::test_stateful_sessionize_rocksdb_provider);
    it is also a per-query conf, settable before ``.start()``."""
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
