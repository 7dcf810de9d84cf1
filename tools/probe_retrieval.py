"""Scale probe for the round-5 retrieval/sketch additions.

Two observables on a synthetic corpus far past bench scale:

1. **BM25 postings prune** (retrieval.bm25_topk): the corpus-wide
   postings frame must collapse to query-matched rows BEFORE the df /
   scoring / ranking shuffles — the probe reports postings rows vs
   matched rows (the ratio IS the prune) and end-to-end wall time for
   a 3-query batch over N docs. At 100 TB the same plan ships only
   matched (doc, term) triples after the broadcast term join, so the
   query-time cost scales with hit volume, not corpus volume.

2. **KMV sketch accuracy/cost** (stats.kmv_sketch): distinct estimate
   vs exact count at N distinct keys, plus wall time — the sketch
   pass is one scan + a k-bounded merge, so this is effectively scan
   throughput.

Corpus: N docs of 40 words over a 1,000-word vocabulary, all
md5/xxhash-derived (no RNG, reproducible). Run:
    python tools/probe_retrieval.py [n_docs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from validate_spark.session import get_spark


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    spark = get_spark(app="probe_retrieval", cores=32, shuffle_partitions=64)

    vocab = F.array(*[F.lit(f"w{i:03d}") for i in range(1000)])
    words = F.transform(
        F.sequence(F.lit(1), F.lit(40)),
        lambda j: F.get(
            vocab,
            F.pmod(F.xxhash64(F.col("id"), j), F.lit(1000)).cast("int"),
        ),
    )
    docs = spark.range(0, n_docs, 1, 64).select(
        F.col("id").alias("doc_id"), F.array_join(words, " ").alias("text")
    )

    from validate_spark.operators.retrieval import bm25_topk, corpus_token_stats

    q = spark.createDataFrame(
        [
            ("q1", "w007"), ("q1", "w042"),
            ("q2", "w100"), ("q2", "w500"), ("q2", "w999"),
            ("q3", "w314"),
        ],
        ["query_id", "term"],
    )

    t0 = time.time()
    out = bm25_topk(docs, q, k=10)
    rows = out.collect()
    t_bm25 = time.time() - t0
    print(f"bm25: n_docs={n_docs:,} wall={t_bm25:.1f}s top-k rows={len(rows)}")

    tf_frame, _ = corpus_token_stats(docs)
    terms = q.select(F.col("term")).distinct()
    n_postings = tf_frame.count()
    n_matched = tf_frame.join(F.broadcast(terms), "term").count()
    print(
        f"postings={n_postings:,} matched={n_matched:,} "
        f"prune={n_postings / max(n_matched, 1):.0f}x"
    )

    from validate_spark.operators.stats import kmv_sketch

    t0 = time.time()
    sk = kmv_sketch(docs, "doc_id", k=256).collect()[0]
    t_kmv = time.time() - t0
    err = abs(sk["distinct_est"] - n_docs) / n_docs
    print(
        f"kmv: est={sk['distinct_est']:,} exact={n_docs:,} "
        f"rel_err={err:.3%} wall={t_kmv:.1f}s"
    )
    spark.stop()


if __name__ == "__main__":
    main()
