"""Cross-batch streaming deduplication — the custom stateful operator
(``applyInPandasWithState``) of this engine.

Spark's built-in ``dropDuplicates`` on a stream keys state by the dedup
column VALUE; here we key by the content FINGERPRINT (normalized-text
md5, operators/textstats.py), so near-identical formatting variants
collapse, and we keep an occurrence count per fingerprint in state —
the dedup analogue of the reference's slice-`unique` filter lifted to
an unbounded stream.

State per group: (n_seen long) — a few bytes per distinct fingerprint,
persisted in the streaming checkpoint. Determinism: within one batch a
group emits its min-key row; across batches the FIRST batch that saw
the fingerprint wins (state says so).

At 10^12-doc scale the state store shards by fingerprint hash across
executors; fingerprints are md5-uniform so the state shuffle never
skews.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from validate_spark.operators.textstats import fingerprint

OUTPUT_DDL = "key string, text string, fp string, n_seen_before long"
STATE_DDL = "n long"


def stateful_drop_duplicates(
    stream_df: DataFrame,
    *,
    text_col: str = "text",
    key_col: str = "doc_id",
) -> DataFrame:
    """First-seen rows only, keyed by content fingerprint, across the
    whole lifetime of the stream (state in the checkpoint). Emits
    (key, text, fp, n_seen_before) where n_seen_before is the state
    count at emission time (always 0 for emitted rows)."""
    with_fp = stream_df.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(text_col).alias("text"),
        fingerprint(F.col(text_col)).alias("fp"),
    )

    def dedup_fn(key, pdf_iter, state: GroupState):
        # Fold the Arrow-chunk iterator to (count, min-key row) — O(1)
        # memory per group. A pd.concat of the whole group here would
        # materialize EVERY copy of a mega-duplicate fingerprint (one
        # boilerplate page repeated 10^7x inside a micro-batch) in a
        # single pandas frame; the fold keeps one candidate row per
        # chunk regardless of group size.
        seen_before = state.exists
        n_batch = 0
        first = None
        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            n_batch += len(pdf)
            if not seen_before:
                cand = pdf[pdf["key"] == pdf["key"].min()].iloc[[0]]
                if first is None or cand["key"].iloc[0] < first["key"].iloc[0]:
                    first = cand.copy()
        if seen_before:
            (n,) = state.get
            state.update((n + n_batch,))
            return iter(())  # fingerprint already emitted in an earlier batch
        state.update((n_batch,))
        if first is None:
            return iter(())
        first["n_seen_before"] = 0
        return iter([first[["key", "text", "fp", "n_seen_before"]]])

    return with_fp.groupBy("fp").applyInPandasWithState(
        dedup_fn,
        outputStructType=OUTPUT_DDL,
        stateStructType=STATE_DDL,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def native_drop_duplicates_within_watermark(
    stream_df: DataFrame,
    *,
    text_col: str = "text",
    key_col: str = "doc_id",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Spark-NATIVE cross-batch dedup: ``dropDuplicatesWithinWatermark``
    keyed on the content fingerprint. State lives in the JVM state
    store (RocksDB-backed on a real cluster), zero Python in the loop —
    prefer this over ``stateful_drop_duplicates`` when you don't need
    the per-fingerprint occurrence counter.

    Contract difference, on purpose: a duplicate arriving more than
    ``watermark`` of EVENT TIME after the retained row's may re-emit
    (its state was evicted) — the right trade at 10^12 rows, where
    duplicates cluster in time and exact forever-state would grow
    without bound. WHICH representative row survives is arrival-order
    dependent (first arrival wins); project ``fp`` alone for an
    order-independent result set."""
    with_fp = stream_df.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(text_col).alias("text"),
        fingerprint(F.col(text_col)).alias("fp"),
        F.col(ts_col).try_cast("timestamp").alias("event_ts"),
    ).withWatermark("event_ts", watermark)
    return with_fp.dropDuplicatesWithinWatermark(["fp"])
