"""Hot-bucket probe for the two-phase LSH bucket aggregation
(dedup._two_phase_buckets, round-5 fix for the r4 verdict's one
scale-grade defect).

Corpus: 2M docs — 1M byte-identical copies of ONE template (every band
produces a single 1M-member bucket: the adversarial boilerplate case
that a single-stage groupBy(bucket).collect_set would buffer IN FULL on
one task before the max_bucket filter ran) + 1M unique docs with ~1%
planted near-dup neighbors (so the pipeline still has real work and
real output).

What bounded means here: stage 1 groups by (spark_partition_id,
band, bsig) and slices each local buffer to max_bucket+1, so the hot
bucket's per-task aggregation state is ≤ 201 structs regardless of its
1M global membership; stage 2 merges ≤ n_tasks × 201 capped arrays and
drops the bucket by its exact summed count. The probe's observables:
the run COMPLETES with flat memory, wall time stays in the §6b band,
and the pair count excludes the capped template cluster (its members
are exact duplicates — exact dedup's job, documented recall contract).

Run: python tools/probe_hot_bucket.py [n_total] [max_bucket]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from validate_spark.operators.dedup import minhash_dedup_pairs
from validate_spark.session import get_spark


def main() -> None:
    n_total = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    max_bucket = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    n_hot = n_total // 2
    spark = get_spark(app="probe_hot_bucket", cores=32, shuffle_partitions=64)

    template = (
        "the quick brown fox jumps over the lazy dog while the "
        "boilerplate footer repeats verbatim across the entire crawl "
        "segment contact us terms of service privacy policy sitemap"
    )
    # 1M hot copies + 1M unique docs; every 100th unique doc past the
    # first 100k is a TRUE near-dup of the doc 100k ids earlier (same
    # body + a 3-word revision suffix: ~14 shared 3-shingles of ~17 →
    # J ≈ 0.82 > 0.7), so the probe also proves recall survives the
    # hot-bucket cap: the planted pairs MUST come out while the
    # template cluster is dropped.
    planted = (
        (F.col("id") % 100 == 0) & (F.col("id") >= n_hot + 100_000)
    )
    base = F.when(planted, F.col("id") - 100_000).otherwise(F.col("id"))
    docs = spark.range(n_total).select(
        F.col("id").cast("string").alias("doc_id"),
        F.when(F.col("id") < n_hot, F.lit(template))
        .otherwise(
            F.concat(
                F.lit("unique document body number "),
                base,
                F.lit(" with distinct content padding "),
                F.md5(base.cast("string")),
                F.lit(" "),
                F.md5((base * 7).cast("string")),
                F.lit(" "),
                F.md5((base * 13).cast("string")),
                F.when(
                    planted, F.lit(" trailing revision marker appended")
                ).otherwise(F.lit("")),
            )
        )
        .alias("text"),
    ).repartition(64)

    t0 = time.time()
    pairs = minhash_dedup_pairs(
        docs, threshold=0.7, max_bucket=max_bucket
    )
    n_pairs = pairs.count()
    wall = time.time() - t0
    print(
        f'{{"probe": "hot_bucket", "n_docs": {n_total}, '
        f'"n_hot": {n_hot}, "max_bucket": {max_bucket}, '
        f'"pairs": {n_pairs}, "wall_sec": {wall:.1f}, '
        f'"docs_per_sec": {n_total / wall:.0f}}}'
    )
    spark.stop()


if __name__ == "__main__":
    main()
