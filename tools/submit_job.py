"""Cluster entry point — the spark-submit shape of the full validation
suite (north rule: deployed via ``spark-submit --py-files`` at two
cluster sizes):

    spark-submit --master local[8]  --py-files dist/validate_spark.zip \
        tools/submit_job.py /root/testdata/sf0.01
    spark-submit --master local[32] --py-files dist/validate_spark.zip \
        tools/submit_job.py /root/testdata/sf0.01

The script imports validate_spark ONLY from the shipped zip (it does
not add the repo to sys.path), proving the artifact is self-contained.
Prints one JSON line with suite counters + elapsed seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import SparkSession, functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = SparkSession.builder.appName("validate_spark_submit").getOrCreate()

    from validate_spark import RuleSet, validate
    from validate_spark.operators.uniq import duplicate_keys
    from validate_spark.operators.refcheck import dangling_ref_counts

    t0 = time.time()
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    rs = RuleSet(
        rules={
            "doc_id": "required",
            "text": "required|minLength:100",
            "lang": "required|enum:en,de,fr,es",
            "source": "required|regexp:^src[0-9]+$",
            "n_chars": "required|min:50|max:600",
        }
    )
    res = validate(docs, rs, key_cols=["doc_id"])
    verdict_counts = {
        str(r["pass"]): r["n"]
        for r in res.verdicts().groupBy("pass").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_dup = duplicate_keys(docs, "doc_id").count()
    cat = docs.select(F.col("source").alias("ref")).distinct().limit(3)
    n_dangling = dangling_ref_counts(docs, "source", cat).count()
    out = {
        "sf_dir": sf_dir,
        "verdicts": verdict_counts,
        "n_dup_keys": n_dup,
        "n_dangling_sources": n_dangling,
        "elapsed_s": round(time.time() - t0, 2),
        "validate_spark_from": __import__("validate_spark").__file__,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
