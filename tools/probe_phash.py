"""Scale probe for the perceptual-hash image near-dup tier
(multimodal.phash_candidates).

Corpus: N fake-media rows (md5-derived bytes, the deterministic decode
stub) with every 10th row reusing its predecessor's bytes — planted
Hamming-0 pairs whose recall is the observable. What scale-correct
means here: the pixel build runs ONCE per row (the staged-px plan —
a prior version inlined it 48×), buckets are two-phase bounded, and
the planted pairs all come out.

Run: python tools/probe_phash.py [n_rows]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from validate_spark.operators.multimodal import attach_fake_media, phash_candidates
from validate_spark.session import get_spark


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    spark = get_spark(app="probe_phash", cores=32, shuffle_partitions=64)

    base = spark.range(0, n, 1, 64).select(
        F.col("id").alias("doc_id"),
        F.when(
            (F.col("id") % 10 == 1), F.col("id") - 1
        ).otherwise(F.col("id")).alias("src"),
    )
    media = attach_fake_media(base, key_col="src").select(
        "doc_id", "media_data"
    )
    t0 = time.time()
    pairs = phash_candidates(
        media, "doc_id", "media_data", max_hamming=3, max_bucket=2000
    )
    n_pairs = pairs.count()
    wall = time.time() - t0
    planted = n // 10
    # planted pairs are (10k, 10k+1): hamming 0, must all be present
    found_planted = pairs.filter(
        (F.col("hamming") == 0)
    ).count()
    print(
        f"phash: n={n:,} wall={wall:.1f}s pairs={n_pairs:,} "
        f"planted={planted:,} hamming0_found={found_planted:,} "
        f"rate={n / wall:,.0f} rows/s"
    )
    spark.stop()


if __name__ == "__main__":
    main()
