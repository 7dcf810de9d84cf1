"""Timeout-driven stateful sessionization — the EVENT-TIME-TIMEOUT
corner of ``applyInPandasWithState`` (q56's stateful dedup uses
NoTimeout; the native ``session_window`` path is q105). Kept beside
them deliberately: together the three cover the whole custom-state
surface — keyed state, watermark interplay, and timer-driven emission.

Semantics == batch ``temporal.sessionize`` (gap-merge, min/max event
times, counts): per key the state holds the OPEN sessions (plural — a
batch can deposit several islands whose closure must wait for the
watermark); every invocation merges new events into them with the
classic sorted interval-merge, EMITS the sessions the current
watermark has sealed (end + gap <= watermark), and arms an event-time
timer at the earliest still-open seal point so an idle key still
flushes (that timer firing — ``state.hasTimedOut`` with an empty
batch iterator — is the path nothing else in this engine exercises).

State per key: three parallel arrays (starts, ends, counts) in
MICROSECONDS — a few dozen bytes per key, bounded by the number of
open islands inside one watermark horizon, NOT by stream length.

Determinism contract (mirrors q89/q105 fixtures): run with a
watermark delay large enough that no fixture chunk is late, and march
the watermark with far-future sentinel keys so availableNow seals
every real session before termination — at production scale the
watermark does this continuously.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_DDL = (
    "key long, session_start timestamp, session_end timestamp, n_events long"
)
STATE_DDL = "starts array<long>, ends array<long>, ns array<long>"


def stateful_sessionize(
    stream_df: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_s: int = 6 * 3600,
    watermark: str = "3650 days",
) -> DataFrame:
    """Gap-based sessions per key over a stream, closed by event-time
    TIMERS. Returns (key, session_start, session_end, n_events) — one
    row per sealed session, emitted exactly once."""
    gap_us = int(gap_s) * 1_000_000
    base = (
        stream_df.select(
            F.col(key_col).cast("long").alias("key"),
            F.col(ts_col).try_cast("timestamp").alias("_ts"),
        )
        .filter(F.col("key").isNotNull() & F.col("_ts").isNotNull())
        .withWatermark("_ts", watermark)
        # keep the watermarked column itself in the stateful input —
        # event-time timeout REQUIRES the watermark column to survive
        # into applyInPandasWithState's child plan
        .select("key", "_ts", F.unix_micros(F.col("_ts")).alias("us"))
    )

    def fn(key, pdf_iter, state: GroupState):
        sessions = []  # (start_us, end_us, n)
        if state.exists:
            starts, ends, ns = state.get
            sessions = list(zip(starts, ends, ns))
        new_us = []
        for pdf in pdf_iter:
            if len(pdf):
                new_us.extend(int(v) for v in pdf["us"].tolist())
        if new_us:
            sessions.extend((u, u, 1) for u in sorted(new_us))
            sessions.sort()
            merged = [sessions[0]]
            for s0, e0, n0 in sessions[1:]:
                ps, pe, pn = merged[-1]
                if s0 - pe <= gap_us:
                    merged[-1] = (ps, max(pe, e0), pn + n0)
                else:
                    merged.append((s0, e0, n0))
            sessions = merged
        wm_us = state.getCurrentWatermarkMs() * 1000
        sealed = [s for s in sessions if s[1] + gap_us <= wm_us]
        open_ = [s for s in sessions if s[1] + gap_us > wm_us]
        if open_:
            state.update((
                [s[0] for s in open_],
                [s[1] for s in open_],
                [s[2] for s in open_],
            ))
            # arm the timer at the earliest seal point: guaranteed
            # > current watermark because open_ sessions are exactly
            # those with end + gap > wm
            state.setTimeoutTimestamp(min(s[1] for s in open_) // 1000
                                      + gap_s * 1000)
        else:
            state.remove()
        if not sealed:
            return iter(())
        out = pd.DataFrame(
            {
                "key": [key[0]] * len(sealed),
                "session_start": [pd.Timestamp(s[0], unit="us") for s in sealed],
                "session_end": [pd.Timestamp(s[1], unit="us") for s in sealed],
                "n_events": [s[2] for s in sealed],
            }
        )
        return iter([out])

    return base.groupBy("key").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_DDL,
        stateStructType=STATE_DDL,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
