"""Stream-static enrichment — the stateless streaming join.

Completes the engine's streaming-join matrix (stream-stream interval
join lives in operators/temporal.py:interval_join): a micro-batch
stream joined against a STATIC dimension is re-planned per batch with
the dimension broadcast — no join state at all, so it composes freely
with downstream stateful operators (windowed aggregation here).

Reference seed: the reference validates one record against in-memory
context (gookit/validate Validation data sources); enrichment against
a dimension is that context lookup lifted to a table, the same way
refcheck lifts its exists-checks.

At 10^12 events: the dimension must stay broadcast-sized (dims that
aren't belong in a pre-joined/bucketed BATCH enrichment, not inside a
latency-sensitive stream); the windowed rollup's state is bounded by
windows × segments, not event count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def stream_static_enrich(
    stream_df: DataFrame,
    dim: DataFrame,
    *,
    key: str,
    dim_key: str,
    dim_cols: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join a (streaming or batch) frame to a broadcast static
    dimension; projects the dimension to (key + dim_cols) BEFORE the
    broadcast so only needed bytes ship."""
    d = F.broadcast(
        dim.select(F.col(dim_key).alias("__dk"), *[F.col(c) for c in dim_cols])
    )
    out = stream_df.join(d, F.col(key) == F.col("__dk"), how)
    return out.drop("__dk")


def windowed_segment_rollup(
    enriched: DataFrame,
    *,
    ts_col: str,
    segment_col: str,
    window: str = "1 day",
    value_col: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling-window counts (+ value sum) per enriched segment.
    State per key = open windows × segments. No count(DISTINCT):
    streaming aggregation forbids exact distincts — a distinct-ish
    signal belongs in approx_count_distinct or a batch pass."""
    ts = F.col(ts_col).try_cast("timestamp")
    base = enriched.filter(ts.isNotNull()).select(
        ts.alias("_ts"),
        F.col(segment_col).alias("segment"),
        *([F.col(value_col).alias("_v")] if value_col else []),
    )
    if watermark is not None:
        base = base.withWatermark("_ts", watermark)
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col:
        aggs.append(F.sum("_v").alias("sum_value"))
    out = base.groupBy(F.window("_ts", window).alias("_w"), "segment").agg(*aggs)
    return out.select(
        F.col("_w.start").alias("window_start"),
        "segment",
        *[c for c in out.columns if c not in ("_w", "segment")],
    )
