"""Differential test: every registered query vs its DuckDB oracle at
sf0.01 — the local mirror of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from export_oltp_to_olap_spark import registry
from tests.oracle_harness import compare_query_to_oracle

registry._ensure_loaded()
_CASES = [
    (name, reg) for name, reg in sorted(registry.REGISTRY.items()) if reg.sql is not None
]


@pytest.mark.parametrize("name,reg", _CASES, ids=[n for n, _ in _CASES])
def test_query_matches_oracle(spark, sf001, name, reg):
    compare_query_to_oracle(spark, sf001, reg.fn, reg.sql)


def test_every_query_runs_and_every_oracle_key_exists(spark, sf001):
    qs = registry.queries()
    oracles = registry.oracle_sql()
    assert qs, "no queries registered"
    for k in oracles:
        assert k in qs, f"oracle {k} has no query"


def test_no_oracle_queries_run_and_are_driver_serializable(spark, sf001):
    """Every registered query WITHOUT an oracle must still execute and
    produce values the driver's rows-only check can record.  Round 1:
    ``media_frame_sample`` was registered but returned raw binary and
    silently produced no CORRECTNESS row — this guard makes that class of
    drop a pytest failure instead."""
    qs = registry.queries()
    oracles = registry.oracle_sql()
    for name in sorted(set(qs) - set(oracles)):
        df = qs[name](spark, sf001)
        rows = df.collect()
        assert rows, f"{name} returned no rows at sf0.001"
        for r in rows[:10]:
            for col, v in zip(df.columns, r):
                assert not isinstance(v, (bytes, bytearray)), (
                    f"{name}.{col} returns raw binary — the driver check "
                    f"cannot hash it; digest it instead"
                )


# Queries the latest recorded driver report may legitimately lack.
# The driver records only the FIRST 50 registrations, and the catalog
# ROTATES registration order each round so every query accumulates at
# least one green driver row (queries_catalog.py module docstring).
# Exempt = the union of past-window tails across rotations: the r1-r3
# tail (windowed in round 4, so r04+ reports will contain them) and the
# round-4 tail (3-round-green basics rotated out, present in r01-r03).
_REPORT_EXEMPT = {
    # ROUND-5 NOTE: WINDOW_FIRST rotated the 17 never-reported round-4
    # tail queries IN and 17 r04-reported queries OUT (7 no-oracle + 10
    # hash-green).  Every rotated-out name was already in this union, so
    # no additions were needed; the set remains the grows-only union of
    # past-window tails across all rotations.
    # Registered new in round 5, past the window (rotated INTO the
    # round-6 window for their first driver rows):
    "leakage_fix_report",
    "neardup_threshold_curve",
    # Registered new in round 6 (rotated into the round-6 window; no
    # driver row exists until CORRECTNESS_r06 lands):
    "quality_scores_saved",
    "curated_corpus_decontaminated",
    "quality_calibration_bins",  # registered after the r6 window pin
    "lm_guided_mixture",  # registered after the r6 window pin
    # Registered new in round 7, past the window (rotate into the
    # round-8 window for their first driver rows):
    "tpch_q4_order_priority",
    "tpch_q7_volume_shipping",
    "tpch_q12_shipping_delay",
    "tpch_q14_promo_revenue",
    "tpch_q19_discounted_revenue",
    "tpch_q22_sales_opportunity",
    "tpch_q8_market_share",
    "tpch_q13_custdist",
    "tpch_q15_top_supplier",
    "tpch_q17_small_qty",
    "tpch_q2_min_cost_supplier",
    "tpch_q9_product_profit",
    "tpch_q11_important_flow",
    "tpch_q16_supplier_count",
    "tpch_q20_dominant_share",
    "tpch_q21_sole_blame",
    "decontaminate_bloom",
    "winnowing_fingerprints",
    "semdedup_threshold_curve",
    "fingerprint_delta",
    "tpch_q9_profit_trend",
    # Registered new in round 8, windowed same-commit (first driver
    # rows land in CORRECTNESS_r08):
    "span_strip_rewrite",
    "epoch_allocation",
    "cluster_balanced_sample",
    "decontam_strip_rewrite",
    "media_exact_dedup",
    "media_neardup",
    "curated_corpus_rewritten",
    # Registered new in round 9, windowed same-commit (first driver
    # rows land in CORRECTNESS_r09):
    "media_neardup_capped",
    "bpe_tokens_saved",
    "gopher_quality_flags",
    "eval_contamination_report",
    "neardup_quality_keepers",
    "corpus_digest",
    "media_neardup_delta",
    # Rotated OUT of the round-6 window (r05-hash-green; families stay
    # probed — see the WINDOW_FIRST rotation note):
    "events_gapfill_locf",
    "pack_bins_summary",
    # Rotated OUT of the round-7 window (multi-round-green probes
    # displaced by the round-7 TPC-H additions; families stay probed):
    "normalized_dedup_documents",
    "stratified_sample_summary",
    "events_anomaly_zscore",
    "chunk_documents",
    "adaptive_quality_gate",
    # Registered new in round 11, windowed same-commit (first driver
    # rows land in CORRECTNESS_r11):
    "schema_drift_audit",
    "token_zipf_spectrum",
    "source_vocab_overlap",
    "hybrid_neardup_confirm",
    "doc_length_spectrum",
    "doc_length_spectrum_delta",
    "capped_epoch_allocation",
    "hard_negative_mining",
    "hard_negative_ivf",
    "label_knn_ivf",
    "lsh_recall_audit",
    "simhash_recall_audit",
    "decontam_threshold_curve",
    "pack_bins_delta",
    "vocab_prune_rewrite",
    "vocab_df_delta",
    "length_outlier_report",
    # Registered new in round 12, windowed same-commit (first driver
    # rows land in CORRECTNESS_r12):
    "winnow_recall_audit",
    "fuzzy_decontam_pairs",
    "source_novelty_profile",
    "source_novelty_delta",
    "cosine_lsh_recall_audit",
    "neardup_clusters_delta",
    # Registered new in round 13, windowed same-commit (first driver
    # rows land in CORRECTNESS_r13):
    "cosine_lsh_multiprobe_recall_audit",
    "neardup_clusters_retract",
    "simhash_radius_sweep",
    "vocab_df_retract",
    "source_novelty_retract",
    "lsh_multiprobe_cosine_neardup",
    "neardup_clusters_upsert",
    "neardup_pairs_retract",
    "semdedup_retract",
    "semantic_decontam_pairs",
    # Registered new in round 14, windowed same-commit (first driver
    # rows land in CORRECTNESS_r14):
    "curated_retract",
    "curated_upsert",
    "leakage_split_retract",
    "doc_length_spectrum_retract",
    "boilerplate_ngrams_retract",
    "pack_source_totals_retract",
    "winnow_fingerprints_retract",
    # Registered new in round 10, windowed same-commit (first driver
    # rows land in CORRECTNESS_r10):
    "c4_quality_flags",
    "boilerplate_ngrams",
    "lang_mismatch_report",
    "curriculum_manifest",
    "label_knn_noise",
    "boilerplate_ngrams_delta",
    # Rotated OUT of the round-10 window (multi-round-green probes —
    # first windowed pre-r05, re-greened in CORRECTNESS_r09):
    "ann_cosine_topk",
    "media_feature_extract",
    "minhash_near_dup",
    # Tail in rounds 1-3, rotated INTO the round-4 window:
    "approx_distinct_parts",
    "neardup_clusters",
    "events_funnel",
    "events_cohort_retention",
    "tfidf_top_terms",
    "text_repetition",
    "pq_cosine_topk",
    "orders_rolling_7d_revenue",
    "orders_rank_suite",
    "dq_oltp_checks",
    "semantic_dedup",
    "approx_percentiles_orders",
    "corpus_curation_summary",
    "stratified_sample_summary",
    "ivfpq_cosine_topk",
    # Registered new in round 4, past the window:
    "frequent_terms_sketch",
    "profile_orders",
    "setops_all_orders",
    "reconcile_customers_full_outer",
    "duplicated_spans",
    "span_dedup_report",
    "ngram_diversity_by_source",
    "rp_cosine_topk",
    "lm_fluency_scores",
    "quality_classifier_scores",
    "mixture_weights",
    "scd2_incremental_merge",
    "adaptive_quality_gate",
    "bpe_token_stats",
    "snapshot_diff_customers",
    "skew_safe_join_revenue",
    "training_shard_manifest",
    "events_hopping_halfhour",
    "stats_moments_lineitem",
    "tpch_q3_shipping_priority",
    "dsir_importance",
    "tpch_q5_local_supplier",
    "tpch_q6_forecast_revenue",
    "tpch_q10_returned_items",
    "tpch_q18_large_volume",
    "curation_audit",
    "source_overlap_matrix",
    "incremental_corpus_delta",
    "split_leakage_report",
    "leakage_safe_splits",
    # Registered new in round 4, inside the window (first report = r04):
    "normalized_dedup_documents",
    "decontaminate_documents",
    "embedding_norm_stats",
    "pii_scan",
    "chunk_documents",
    "pack_bins_summary",
    "subquery_suite",
    "events_gapfill_locf",
    "weighted_sample_summary",
    "capped_corpus",
    "events_anomaly_zscore",
    "dim_cliente_scd2",
    "minhash_delta_neardup",
    "split_drift_report",
    # Rotated OUT mid-round-4 to make window room for the 14 new
    # round-4 queries (each hash-match green in r01 AND r02 AND r03;
    # present in r03's report, absent from r04's):
    "events_json_stats",
    "cdc_decode",
    "events_tumbling_hourly",
    "events_user_moving_value",
    "events_sessionize",
    "corpus_split_summary",
    "purchases_asof_clicks",
    "clicks_before_purchase",
    "exact_dedup_documents",
    "text_fingerprints",
    "text_lang_id",
    "token_count_bpe",
    "media_metadata_stats",
    "simhash_fingerprints",
    # Rotated OUT late-round-4 by WINDOW_FIRST to give the mid-round-4
    # additions driver rows (each hash-match green in r03; present in
    # r01-r03 reports, absent from r04's):
    "rollup_revenue",
    "cube_order_stats",
    "grouping_sets_orders",
    "distinct_agg_orders",
    "orders_price_percentiles",
    "ngram_jaccard_neardup",
    "simhash_near_dup",
    "embedding_cosine_neardup",
    "lsh_cosine_neardup",
    "ivf_cosine_topk",
    "text_quality",
    "token_stats_by_source",
    "media_frame_sample",
    # Rotated OUT in round 4 (hash-match green in r01 AND r02 AND r03):
    "star_dim_cliente",
    "star_dim_categoria",
    "star_dim_producto",
    "star_dim_tiempo",
    "star_dim_metodo_pago",
    "star_dim_envio",
    "star_fact_source",
    "setops_customers",
    "semi_anti_customers",
    "pivot_priority_status",
    "point_filter_customer",
    "date_range_orders",
    "correlated_lookup",
    "topk_orders",
    "scalar_function_suite",
}


def test_window_first_is_exactly_the_driver_window():
    """WINDOW_FIRST pins the 50 names the driver records.  The registry
    filters it with ``if n in REGISTRY`` — a typo or a stale name after
    a rename would SILENTLY shrink the window and hand a tail query an
    unplanned driver row, so the pin must be exactly 50 valid, unique
    names."""
    from export_oltp_to_olap_spark.queries_catalog import WINDOW_FIRST

    unknown = [n for n in WINDOW_FIRST if n not in registry.REGISTRY]
    assert not unknown, f"WINDOW_FIRST names not in the registry: {unknown}"
    assert len(set(WINDOW_FIRST)) == len(WINDOW_FIRST), "duplicate window names"
    assert len(WINDOW_FIRST) == 50, len(WINDOW_FIRST)


def test_driver_report_completeness():
    """Every registered query must appear in the latest driver-emitted
    CORRECTNESS_r{N}.json — a silently dropped row could mask a real
    failure (VERDICT r2 item 8).  Keys in _REPORT_EXEMPT (new this round
    or judge-verified driver drops) are excluded."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    reports = glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))
    if not reports:
        pytest.skip("no driver correctness report recorded yet")
    latest = max(reports, key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)))
    with open(latest, encoding="utf-8") as fh:
        reported = set(json.load(fh))
    missing = set(registry.queries()) - reported - _REPORT_EXEMPT
    assert not missing, (
        f"registered queries absent from {os.path.basename(latest)}: "
        f"{sorted(missing)} — driver dropped them silently, or add them to "
        f"_REPORT_EXEMPT if registered after that report"
    )


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["region", "nation", "anio", "mes", "revenue", "n_lines", "n_orders"]


def test_bench_headline_names_all_resolve():
    """bench.py filters DEFAULT_HEADLINE with "if n in qs" — the same
    silent-shrink trap as WINDOW_FIRST: a typo or stale name after a
    rename would drop the query from every future BENCH_r{N} without a
    trace.  Bracketed names are bench-only variants resolved against
    _variant_queries() at run time."""
    import importlib.util
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "bench_module", os.path.join(root, "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    unknown = [
        n
        for n in bench.DEFAULT_HEADLINE
        if "[" not in n and n not in registry.REGISTRY
    ]
    assert not unknown, f"bench headline names not in the registry: {unknown}"
    assert len(set(bench.DEFAULT_HEADLINE)) == len(bench.DEFAULT_HEADLINE)
