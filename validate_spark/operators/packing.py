"""Sequence packing for LLM pretraining — concat-then-chunk documents
into ~token-budget groups, cut at document boundaries.

Every pretraining pipeline packs variable-length documents into
fixed-size context windows. The distributed lift: a GLOBAL greedy pack
is a single sorted stream (one reducer — the exact anti-pattern the ANN
top-k plan avoids), so packing runs over N independent *streams*:
stream = md5-hash(key) % n_streams, order within a stream = md5 draw.
Each stream is one window partition — parallelism == n_streams, state
per task == one running sum. At 10^12 docs raise ``n_streams`` so each
stream holds ~10^6 docs; chunk quality is unaffected (packing is local
to a stream by design, and streams are content-hash-uniform).

Chunk semantics (stated exactly): a document belongs to chunk
``floor(start_offset / budget)`` of its stream, where start_offset is
the running token count before it. Chunks therefore target ``budget``
tokens and may overflow by at most one document's tokens (the doc that
crosses the boundary stays in the chunk where it starts) — the
standard "greedy fill, cut at doc boundaries" contract.

Hash portability: ordering and stream assignment use md5 (not
xxhash64) so an external engine — and the DuckDB oracle — reproduces
the exact same packing (repo hash rule: anything that crosses the
engine boundary is md5).

Reference seed: the closest single-record ancestor is the length
family (SURVEY.md §2.4); packing is its corpus-level lift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def pack_sequences(
    df: DataFrame,
    token_col: str,
    key_col: str,
    *,
    budget: int,
    n_streams: int = 1024,
    seed: int = 0,
) -> DataFrame:
    """Assign each document a deterministic ``(stream, chunk_id)`` →
    ``(key, n_tokens, stream, chunk_id)``.

    One shuffle (the window's hashpartitioning on stream); running-sum
    state only. NULL token counts pack as 0 (they consume no budget).
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    h = F.md5(
        F.concat_ws(
            "\x1f",
            F.coalesce(F.col(key_col).cast("string"), F.lit("")),
            F.lit(str(seed)),
        )
    )
    stream = F.pmod(F.conv(F.substring(h, 1, 8), 16, 10).cast("long"), F.lit(n_streams))
    toks = F.coalesce(F.col(token_col).cast("long"), F.lit(0))
    tagged = df.select(
        F.col(key_col).alias("key"),
        toks.alias("n_tokens"),
        stream.alias("stream"),
        h.alias("_ord"),
    )
    # ROWS frame explicitly: the default RANGE frame would sum ties
    # together (none exist — _ord+key is a total order — but the frame
    # must not depend on that)
    w = (
        Window.partitionBy("stream")
        .orderBy("_ord", "key")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return tagged.select(
        "key",
        "n_tokens",
        "stream",
        F.floor(start / F.lit(budget)).cast("long").alias("chunk_id"),
    )


def packing_report(packed: DataFrame, *, budget: int) -> DataFrame:
    """Per-chunk fill report → (stream, chunk_id, n_docs, n_tokens,
    fill): utilization evidence for a packing run. Aggregate-sized
    output (streams × chunks)."""
    return packed.groupBy("stream", "chunk_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.round(F.sum("n_tokens") / F.lit(float(budget)), 6).alias("fill"),
    )
