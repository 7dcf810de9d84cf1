"""Streaming distribution drift: per-window chi-square against a
reference snapshot (the streaming lift of operators/drift.py, SURVEY.md
§2.9 — the reference validates single records and has no drift notion;
drift is one of the dataset-level extensions the north rule names).

Design constraints honored:

* Structured Streaming allows ONE stateful operator on this path, so
  the whole computation is a single watermarked window aggregation:
  bucket counts pivot into ``n_buckets`` fixed sum-columns (state per
  window = n_buckets longs — independent of row rate).
* The reference snapshot is a tiny batch histogram; its counts embed as
  LITERALS in the chi-square expression (no stream-side join at all).
* Everything is Column expressions — zero Python in the stream.

Emits one row per window: (window, n_obs, chi2, dof). Buckets where
both sides are empty contribute nothing and reduce dof accordingly,
matching drift.chi_square_from_histograms.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def snapshot_histogram(
    df: DataFrame, col: str, *, lo: float, hi: float, n_buckets: int = 32
) -> DataFrame:
    """Reference histogram (batch) — feed the SAME (lo, hi, n_buckets)
    to ``windowed_drift`` so bins align."""
    from validate_spark.operators.stats import numeric_histogram

    h = numeric_histogram(df, col, lo=lo, hi=hi, n_buckets=n_buckets)
    return h.select(F.col("bucket"), F.col("cnt").alias("ref_cnt"))


def _bucket_expr(c: Column, lo: float, hi: float, n_buckets: int) -> Column:
    width = (hi - lo) / n_buckets
    return (
        F.greatest(
            F.lit(0),
            F.least(F.lit(n_buckets - 1), F.floor((c.cast("double") - lo) / width)),
        )
        .cast("int")
    )


def windowed_drift(
    stream_df: DataFrame,
    value_col: str,
    snapshot: DataFrame,
    *,
    ts_col: str = "ts",
    window: str = "1 minute",
    watermark: str = "2 minutes",
    lo: float,
    hi: float,
    n_buckets: int = 32,
) -> DataFrame:
    """Per-window chi-square homogeneity statistic of ``value_col``
    against the snapshot histogram (same arithmetic as
    drift.chi_square_from_histograms, per window, on the stream)."""
    ref_rows = {r["bucket"]: float(r["ref_cnt"]) for r in snapshot.collect()}
    refs = [ref_rows.get(i, 0.0) for i in range(n_buckets)]
    t_ref = sum(refs)
    if t_ref <= 0:
        raise ValueError("snapshot histogram is empty — nothing to drift against")

    c = F.col(value_col)
    b = _bucket_expr(c, lo, hi, n_buckets)
    counts = (
        stream_df.filter(c.isNotNull())
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("window"))
        .agg(
            *[
                F.sum(F.when(b == i, 1).otherwise(0)).alias(f"_b{i}")
                for i in range(n_buckets)
            ]
        )
    )

    t_cur = None
    for i in range(n_buckets):
        cur = F.col(f"_b{i}").cast("double")
        t_cur = cur if t_cur is None else t_cur + cur

    tot = t_cur + F.lit(t_ref)
    chi2 = F.lit(0.0)
    dof = F.lit(-1)
    for i in range(n_buckets):
        cur = F.col(f"_b{i}").cast("double")
        row = cur + F.lit(refs[i])
        e_cur = row * t_cur / tot
        e_ref = row * F.lit(t_ref) / tot
        cell = F.when(
            row > 0,
            (cur - e_cur) ** 2 / e_cur + (F.lit(refs[i]) - e_ref) ** 2 / e_ref,
        ).otherwise(F.lit(0.0))
        chi2 = chi2 + cell
        dof = dof + F.when(row > 0, F.lit(1)).otherwise(F.lit(0))

    return counts.select(
        "window",
        t_cur.cast("bigint").alias("n_obs"),
        F.round(chi2, 6).alias("chi2"),
        dof.alias("dof"),
    )
