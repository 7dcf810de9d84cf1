"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API) —
the extension point for ingesting from systems Spark has no built-in
connector for (internal document stores, proprietary APIs, seeded
synthetic corpora). This engine ships one production-shaped example:
a DETERMINISTIC synthetic document source whose rows are pure md5
functions of (seed, row id), so any row is reproducible anywhere —
including inside a DuckDB oracle.

Why this matters at scale: the reader plans ``n_partitions``
InputPartitions up front (each an [lo, hi) id range), so Spark
schedules one task per partition and the source scales out exactly
like a parquet scan — generation happens ON THE EXECUTORS, nothing
flows through the driver. This is the pattern for wrapping any
range-addressable external system (keyset-paginated APIs, id-sharded
tables): partition by key range, read each range inside its task.

Registration: ``spark.dataSource.register(SyntheticDocsSource)`` then
``spark.read.format("vs_synth_docs").option(...).load()``.

COST BOUNDARY (read this before reaching for the API): a Python
DataSource is per-row Python — every row crosses the JVM↔Python
boundary through a worker process, ~100× the throughput cost of a
columnar scan, and that is inherent to the API, not to this example
(q160/q162 cells in BENCH.md state the measured cost). It is the
right tool ONLY when the upstream system is reachable exclusively
from Python. For bulk synthetic data use the native column-expression
generator beside it (``sources/synth.synth_documents`` — whole-stage
codegen, zero Python) and for anything already on disk use the real
parquet/CSV/JSON readers. Never make this the bulk-generation path.

Reference seed: gookit/validate's FromMap/FromStruct creation surface
(SURVEY §2.1) — lifted to a planned, partitioned Spark source.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def synth_row(seed: int, i: int):
    """One deterministic row — EXACTLY reproducible in SQL as
    md5(seed || ':' || i) arithmetic (the oracle replays this):
      cat      first hex char of the row md5
      value    first 6 hex chars as int
      text     'w<h0> w<h1> w<h2>' — three 2-hex-char words
    """
    h = _md5(f"{seed}:{i}")
    return (
        i,
        h[0],
        int(h[:6], 16),
        f"w{h[0:2]} w{h[2:4]} w{h[4:6]}",
    )


class _RangePartition(InputPartition):
    def __init__(self, lo: int, hi: int):
        self.lo = lo
        self.hi = hi


class _SynthReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", "1000"))
        self.seed = int(options.get("seed", "7"))
        self.n_partitions = int(options.get("n_partitions", "8"))

    def partitions(self):
        step = max(1, -(-self.n // self.n_partitions))
        return [
            _RangePartition(lo, min(lo + step, self.n))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition: _RangePartition):
        # runs on an executor; generates ONLY this partition's range.
        # Rows are yielded as ONE Arrow RecordBatch per partition (the
        # documented Spark 4 fast path) instead of per-row tuples:
        # row-at-a-time yields cross the worker boundary through
        # pickled rows, ~0.5 s per 5k-row read measured r6; the batch
        # form is a single columnar hand-off with identical values.
        import pyarrow as pa

        rows = [
            synth_row(self.seed, i) for i in range(partition.lo, partition.hi)
        ]
        if not rows:
            return
        ids, cats, values, texts = zip(*rows)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(ids, type=pa.int64()),
                pa.array(cats, type=pa.string()),
                pa.array(values, type=pa.int64()),
                pa.array(texts, type=pa.string()),
            ],
            names=["id", "cat", "value", "text"],
        )


class SyntheticDocsSource(DataSource):
    """``spark.read.format("vs_synth_docs")`` — options: n, seed,
    n_partitions."""

    @classmethod
    def name(cls):
        return "vs_synth_docs"

    def schema(self):
        return "id bigint, cat string, value bigint, text string"

    def reader(self, schema):
        return _SynthReader(self.options)

    def simpleStreamReader(self, schema):
        return _SynthStreamReader(self.options)


class _SynthStreamReader(SimpleDataSourceStreamReader):
    """SimpleDataSourceStreamReader: offsets are row ids; each
    micro-batch advances by ``chunk`` rows until ``n`` — then empty
    batches forever (a bounded replayable stream). ``read(start)``
    must be SIDE-EFFECT-FREE relative to offsets: Spark checkpoints
    the (start, end) pair and may replay via readBetweenOffsets after
    a failure, which regenerates the identical rows because every row
    is a pure function of (seed, i) — the same idempotence contract
    as the foreachBatch sinks."""

    def __init__(self, options):
        self.n = int(options.get("n", "1000"))
        self.seed = int(options.get("seed", "7"))
        self.chunk = int(options.get("chunk", str(self.n)))

    def initialOffset(self):
        return {"i": 0}

    def read(self, start):
        lo = int(start["i"])
        hi = min(lo + self.chunk, self.n)
        return (
            iter([synth_row(self.seed, i) for i in range(lo, hi)]),
            {"i": hi},
        )

    def readBetweenOffsets(self, start, end):
        return iter(
            [synth_row(self.seed, i)
             for i in range(int(start["i"]), int(end["i"]))]
        )

    def commit(self, end):
        pass
