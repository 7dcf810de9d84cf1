"""Per-rule cost breakdown for the flagship spans rule set.

Methodology (VM-noise aware, CLAUDE.md): each variant is timed
back-to-back with the baseline in alternating order, 3 rounds, medians
reported — a conclusion is only drawn from a ratio that survives the
alternation. Validation is forced through the same rollup aggregate
bench.py uses (count + sum(pass) + sum(size(failed))), after one warm-up
run per variant to amortize codegen.

Usage: python tools/profile_rules.py [n_docs] [cores]
"""

from __future__ import annotations

import statistics
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from validate_spark import RuleSet, validate  # noqa: E402
from validate_spark.operators.engine import clear_plan_cache  # noqa: E402
from validate_spark.session import get_spark  # noqa: E402
from validate_spark.sources.synth import synth_documents  # noqa: E402

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
CORES = int(sys.argv[2]) if len(sys.argv) > 2 else 8

FULL = {
    "doc_id": "required|minLength:5",
    "spans": "required|minLength:1",
    "spans.*.kind": "required|enum:text,image,audio,video",
    "spans.*.offset": "min:0",
    "spans.*.media_ref": "regexp:^m-[0-9]{8}$",
}

VARIANTS = {
    "gen_only": None,  # generation + count, no rules
    "full": FULL,
    "no_regexp": {k: v for k, v in FULL.items() if k != "spans.*.media_ref"},
    "no_kind": {k: v for k, v in FULL.items() if k != "spans.*.kind"},
    "no_offset": {k: v for k, v in FULL.items() if k != "spans.*.offset"},
    "no_scalars": {k: v for k, v in FULL.items() if "." in k},
    "regexp_only": {"spans.*.media_ref": FULL["spans.*.media_ref"]},
    "kind_required_only": {"spans.*.kind": "required"},
    "kind_enum_only": {"spans.*.kind": "enum:text,image,audio,video"},
}


def run_once(spark, rules):
    docs = synth_documents(spark, N_DOCS)
    t0 = time.monotonic()
    if rules is None:
        docs.agg(F.count(F.lit(1))).collect()
    else:
        res = validate(docs, RuleSet(rules=rules), key_cols=["doc_id"])
        res.annotated.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("_vs_pass").cast("long")).alias("np"),
            F.sum(F.size("_vs_failed").cast("long")).alias("nv"),
        ).collect()
    return time.monotonic() - t0


def main():
    spark = get_spark(cores=CORES)
    clear_plan_cache()
    # warm-up each variant once (codegen)
    for name, rules in VARIANTS.items():
        run_once(spark, rules)
    times = {k: [] for k in VARIANTS}
    for _ in range(3):
        for name, rules in VARIANTS.items():  # alternating order each round
            times[name].append(run_once(spark, rules))
    med = {k: statistics.median(v) for k, v in times.items()}
    base = med["gen_only"]
    print(f"\nn_docs={N_DOCS} cores={CORES}  (median of 3, warmed)")
    for k, v in med.items():
        extra = v - base
        per_doc_core = extra / N_DOCS * CORES * 1e6
        print(
            f"{k:20s} {v:7.2f}s  net {extra:6.2f}s  "
            f"{per_doc_core:6.2f} us/doc/core  runs={['%.2f' % t for t in times[k]]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
