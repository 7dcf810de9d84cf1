"""Benchmark harness — headline metric: validated docs/sec on the
interleaved documents table (full rule set + uniqueness + referential +
drift histogram in one suite), plus per-query timings for the
representative operators from __spark_entry__.

Prints ONE JSON line:
  {"metric": "validated_docs_per_sec", "value": N, "unit": "docs/sec",
   "queries": {...per-query seconds...}, "sf": 0.1, ...}

Env:
  SPARK_GRAFT_SF_DIR  parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[N] parallelism (default 32)
  BENCH_DOCS          override interleaved-table row count
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

import __spark_entry__ as em
from validate_spark import RuleSet, validate
from validate_spark.operators import drift as dr
from validate_spark.operators import refcheck as rc
from validate_spark.operators import stats as st
from validate_spark.operators import uniq as uq
from validate_spark.session import get_spark
from validate_spark.sources.synth import synth_documents, synth_media_catalog

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# per-query timings: the operator families a user actually runs
BENCH_QUERIES = [
    "q01_verdicts_documents",
    "q02_violations_by_rule",
    "q03_first_errors",
    "q06_column_stats",
    "q07_duplicate_keys",
    "q09_ref_integrity",
    "q10_length_histogram",
    "q12_text_annotate",
    "q13_lang_distribution",
    "q15_exact_dedup",
    "q16_minhash_lsh_dedup",
    "q19_ann_brute_force",
    "q21_media_metadata",
    "q24_events_kitchen_sink",
    "q26_dedup_clusters",
    "q29_required_family",
    "q30_json_validation",
    "q31_format_gauntlet",
    "q32_date_gauntlet",
    "q33_form_staging",
    "q36_drift_chi2",
    # round-3 surfaces
    "q44_ngram_jaccard",
    "q49_decontamination",
    "q51_stratified_sample",
    "q52_embedding_quality",
    "q53_repetition_signals",
    "q55_drift_psi",
    # round-4 surfaces
    "q59_format_gauntlet2",
    "q60_crossfield_equality",
    "q62_langid_cjk",
    "q63_global_custom_validator",
    "q64_custom_type_extractor",
    "q65_weighted_mix",
    "q66_url_blocklist",
    "q67_sequence_packing",
    "q68_unigram_quality",
    "q69_line_dedup",
    "q70_type_gauntlet",
    "q71_filter_gauntlet",
    "q72_semantic_decontam",
    "q73_incremental_dedup",
    "q74_deterministic_shuffle",
    "q75_duplicated_spans",
    "q76_token_share_report",
    "q77_incremental_minhash",
    "q78_quality_quantile",
    "q79_stratum_quota",
    "q80_centroid_outliers",
    "q81_source_overlap",
    "q82_soft_dedup_weights",
    "q83_cluster_split",
    "q84_top_spans",
    "q85_rule_drift",
    "q86_violation_control",
    "q87_schema_profile_drift",
    "q88_pattern_profile",
    "q89_streaming_windowed_drift",
    "q90_encoding_signals",
    "q91_snapshot_diff",
    "q92_attribute_consistency",
    "q93_suite_report",
    "q94_retain_best",
    "q95_functional_dependency",
    "q96_categorical_drift",
    "q97_numeric_correlations",
    "q98_frequent_values",
    "q99_c4_signals",
    "q100_gopher_rules",
    "q101_incremental_validate",
    "q102_sessionize",
    "q103_asof_join",
    "q104_range_join",
    "q105_streaming_sessionize",
    "q106_event_stream_quality",
    "q107_funnel",
    "q108_cohort_retention",
    "q109_rolling_window",
    "q110_distinctive_terms",
    "q111_hopping_windows",
    "q112_stream_interval_join",
    "q113_streaming_hopping",
    "q114_native_streaming_dedup",
    "q115_span_ref_integrity",
    "q116_stream_static_enrich",
    "q117_benford_audit",
    "q118_label_agreement",
    "q119_cube_profile",
    "q120_event_pivot",
    "q121_event_melt",
    "q122_daily_densify",
    "q123_pricing_summary",
    "q124_top_revenue",
    "q125_local_supplier_volume",
    "q126_order_priority",
    "q127_customer_orders_dist",
    "q128_idle_rich_customers",
    "q129_latest_wins",
    "q130_quality_classifier",
    "q131_doc_chunks",
    "q132_doc_keywords",
    "q133_csv_ingest",
    "q134_nation_volume",
    "q135_returned_customers",
    "q136_promo_share",
    "q137_top_suppliers",
    "q138_small_qty_revenue",
    "q139_large_volume_customers",
    "q140_disjunctive_revenue",
    "q141_waiting_suppliers",
    "q142_pagerank",
    "q143_bpe_merges",
    "q144_token_entropy",
    "q145_random_projection",
    "q146_phrase_contamination",
    "q147_group_percentiles",
    "q148_stream_outer_interval_join",
    "q149_bucketed_join",
    "q150_schema_evolution",
    "q151_partition_pruning",
    "q152_nfc_normalization",
    "q153_table_checksum",
    "q154_mix_temperature",
    "q155_duplication_profile",
    "q156_debounce",
    "q157_forecast_revenue",
    "q158_span_annotate",
    "q159_stateful_sessionize",
    "q160_python_datasource",
    "q161_ngram_udtf",
    "q162_python_stream_source",
    "q163_variant_extraction",
    "q164_group_mad",
    "q165_pii_spans",
    "q166_top_sources_with_ties",
    # round-5 surfaces
    "q167_optional_parent_gate",
    "q168_typed_validator_discovery",
    # round-5: the seven remaining TPC-H shapes (full 22-query suite)
    "q169_min_cost_supplier",
    "q170_market_share",
    "q171_product_profit",
    "q172_important_stock",
    "q173_late_priority",
    "q174_supplier_part_counts",
    "q175_excess_stock_suppliers",
    "q176_dsir_selection",
    "q177_bloom_decontamination",
    "q178_global_row_index",
    "q179_zorder_layout",
    "q180_blocked_fuzzy_pairs",
    "q181_cusum_changepoint",
    "q182_triangle_count",
    "q183_url_dedup",
    "q184_leakage_safe_split",
    "q185_compaction_plan",
    "q186_daily_trend",
    "q187_sq8_ann",
    "q188_rrf_fusion",
    "q189_weekday_anomaly",
    "q190_span_pattern_audit",
    "q191_kmv_distinct_sketch",
    "q192_bm25_topk",
    "q193_theil_sen_trend",
    "q194_join_skew_audit",
    "q195_phash_image_neardup",
    "q196_fs_record_linkage",
    "q197_kmv_rollup_merge",
    "q198_kwic_snippets",
    "q199_weighted_reservoir",
    "q200_linkage_entities",
    "q201_k_anonymity",
    "q202_mutual_information",
    "q203_partition_skipping_audit",
    "q204_cms_frequency_sketch",
    "q205_decayed_trending",
    "q206_threshold_sweep",
    "q207_transition_matrix",
    "q208_sequence_conformance",
    "q209_dedup_recall_report",
    "q210_langid_confusion",
    "q211_rate_jackknife",
    "q212_kmv_trailing_window",
    "q213_streaming_kmv",
    "q214_roc_auc",
    "q215_gains_table",
    "q216_collocations",
    "q217_containment_quotes",
    "q218_k_core",
    "q219_pq_ann",
    "q220_pq_recall",
    "q221_streaming_cms",
    "q222_layout_advisor",
    "q223_oov_report",
    "q224_scd2_build",
    "q225_contrastive_negatives",
    "q226_trimmed_mean",
    "q227_source_scorecard",
    "q228_quantile_normalize",
    "q229_t_closeness",
    "q230_rule_coviolation",
    "q231_audio_fingerprint",
    "q232_span_dup_topline",
    "q233_embedding_lsh_recall",
    "q234_ivf_pq",
    "q235_spatial_grid_join",
    "q236_merge_upsert",
    "q237_token_budget_mix",
    "q238_embedding_lsh_multitable",
    "q239_hll_distinct_sketch",
    "q240_conformal_calibration",
    "q241_ess_report",
    "q242_acf_report",
    "q243_gini_concentration",
    "q244_interval_overlap_audit",
    "q245_typo_pairs",
    "q246_cross_source_dups",
    "q247_basket_pairs",
    "q248_robotic_cadence",
    "q249_hybrid_rrf",
    "q250_rule_impact",
]


def sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def run_suite(spark, n_docs: int) -> dict:
    """The headline job: ONE pass over the interleaved table running the
    full rule set, then uniqueness + referential + drift histogram +
    per-rule rollup — the complete north-rule validation suite."""
    docs = synth_documents(spark, n_docs)
    catalog = synth_media_catalog(spark, 100_000)

    res = validate(docs, em.SPANS_RULES, key_cols=["doc_id"])
    ann = res.annotated

    # the four checks are independent DAGs — submit them concurrently
    # (one session, four scheduler jobs) so the executor pool never
    # drains at action boundaries; identical results, same total work
    from concurrent.futures import ThreadPoolExecutor

    def a_rollup():
        # verdict + violations rollup (single aggregation over the scan)
        return ann.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("_vs_pass").cast("long")).alias("n_pass"),
            F.sum(F.size("_vs_failed").cast("long")).alias("n_violations"),
        ).collect()[0]

    def a_drift():
        # drift: span-count histogram of first half vs second half
        spans_n = docs.select(
            (F.xxhash64("doc_id") % 2 == 0).alias("h"),
            F.size("spans").alias("ns"),
        )
        h1 = spans_n.filter("h").groupBy("ns").count().collect()
        h2 = spans_n.filter("NOT h").groupBy("ns").count().collect()
        return len(h1) + len(h2)

    with ThreadPoolExecutor(4) as ex:
        f_roll = ex.submit(a_rollup)
        # uniqueness on doc_id (skew-safe two-phase not needed: md5-uniform)
        f_dup = ex.submit(lambda: uq.duplicate_keys(docs, "doc_id").count())
        # referential anti-join vs broadcast media catalog
        f_dang = ex.submit(lambda: rc.dangling_span_refs(docs, catalog).count())
        f_drift = ex.submit(a_drift)
        rollup, n_dup, n_dangling, n_buckets = (
            f_roll.result(), f_dup.result(), f_dang.result(), f_drift.result()
        )

    return {
        "n_rows": rollup["n_rows"],
        "n_pass": rollup["n_pass"],
        "n_violations": rollup["n_violations"],
        "n_dup_keys": n_dup,
        "n_dangling": n_dangling,
        "drift_buckets": n_buckets,
    }


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app="validate_spark_bench", cores=cpus)
    sf = sf_from_dir(SF_DIR)

    # headline throughput needs enough rows to amortize fixed costs
    # (job scheduling + codegen ≈ 2-3 s; at sf0.1's 60k docs that fixed
    # cost IS the measurement) — time at least 2M interleaved docs
    try:
        base_n = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).count()
    except Exception:
        base_n = 5000
    n_docs = int(os.environ.get("BENCH_DOCS", max(base_n * 12, 8_000_000)))

    # warm the JVM/codegen once on a small slice
    run_suite(spark, 10_000)

    # best of two timed runs: this box's co-tenant noise swings single
    # runs ±2-4x between windows (BENCH.md §5); min-of-N is the
    # standard noisy-host protocol, and the identical-counter assert
    # proves both runs computed the same answers
    suite_sec = float("inf")
    suite_out = None
    for _ in range(2):
        t0 = time.perf_counter()
        out = run_suite(spark, n_docs)
        elapsed = time.perf_counter() - t0
        if suite_out is not None:
            assert out == suite_out, "bench runs disagree on outputs"
        suite_out = out
        suite_sec = min(suite_sec, elapsed)
    docs_per_sec = n_docs / suite_sec

    qtimes: dict[str, float] = {}
    qs = em.queries()
    for name in BENCH_QUERIES:
        t0 = time.perf_counter()
        # noop sink forces FULL evaluation of every output column —
        # .count() would let Catalyst prune the projections of
        # row-returning queries and under-measure them
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        qtimes[name] = round(time.perf_counter() - t0, 3)
        # drop frames the cell persisted so the NEXT cell measures its
        # own operator, not 100 queries' accumulated block-manager /
        # GC pressure (measured: q16 38 s in-suite vs 5.8 s isolated
        # warm before this; cleanup time is excluded from the cells)
        spark.catalog.clearCache()

    result = {
        "metric": "validated_docs_per_sec",
        "value": round(docs_per_sec, 1),
        "unit": "docs/sec",
        "queries": qtimes,
        "sf": sf,
        "suite_sec": round(suite_sec, 3),
        "suite_docs": n_docs,
        "suite_out": {k: int(v) for k, v in suite_out.items()},
        "cpus": cpus,
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
