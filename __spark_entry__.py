"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` maps every
implemented operator from SURVEY.md §2 to a (spark, sf_dir) -> DataFrame
callable; ``oracle_sql()`` holds the DuckDB-equivalent SQL for each
SQL-expressible key (rows-only keys are intentionally absent there).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary) on sf0.001."""
    from abr_etl_spark.plans.analytics import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


# Round-8 priority head, ordered by how badly each key needs a fresh
# CORRECTNESS row under the driver's ~50-row budget (r7 verdict item 1):
# 1. the 23 keys whose latest driver row still dates to round 4 (they
#    did not fit r7's budget) -- after r8 no key's newest row is older
#    than r5;
# 2. keys that are brand new or whose plan changed this round;
# 3. the 47 keys whose latest driver row dates to round 5 (the budget
#    remainder starts rotating them; the rest lead r9).
# Everything after the budget line keeps module order; all keys pass the
# local full-registry gate regardless.
_R8_PRIORITY: list[str] = [
    # --- 1. r4-stale driver rows (rotate first, r7 verdict item 1) ---
    "ann_ivf_kmeans",
    "array_funcs",
    "bigram_lm",
    "containment_pairs",
    "correlated_subqueries",
    "decontaminate_ngram",
    "dedup_canonical_star",
    "gap_fill_ffill",
    "grouping_sets_agg",
    "histogram_equi_depth",
    "histogram_equi_width",
    "json_nested_extract",
    "late_shipment_suppliers",
    "markov_transitions",
    "mode_per_group",
    "q15_top_supplier",
    "q17_small_qty_revenue",
    "reachability_bfs",
    "salted_join_revenue",
    "skyline_pareto",
    "train_test_split",
    "triangle_count",
    "unpivot_melt",
    # --- 2. BRAND-NEW or changed-plan keys this round ---
    "embedding_pca_topk",
    "delta_changed_columns",
    "simpson_diversity",
    "source_divergence_tv",
    "recall_at_k_eval",
    "embedding_outlier_report",
    "kmv_set_ops",
    "stream_hll_distinct",
    "hll_sliding_distinct",
    "term_lift_topk",
    "funnel_time_bounded",
    "bpe_apply_merge",
    "multimodal_content_address",
    "bpe_learn_merges",
    "lang_id_confusion",
    "dedup_threshold_sweep",
    "window_funcs2",
    "string_funcs2",
    "datetime_funcs2",
    "hll_distinct",
    "bloom_membership",
    "gini_nation_revenue",
    "chi2_event_dow",
    "ab_test_conversion",
    "winsorized_mean",
    "session_paths_topk",
    "zorder_layout",
    "bm25_topk",
    "inverted_postings",
    "time_weighted_avg",
    "quantile_sketch_hash",
    # --- 3. r5-stale driver rows (budget remainder; rest lead r9) ---
    "delta_updated",
    "delta_added",
    "delta_removed",
    "delta_unchanged_count",
    "delta_classify_lake",
    "snapshot_latest",
    "scd2",
    "incremental_agg",
    "dq_referential",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q12_shipping_buckets",
    "q14_promo_revenue",
    "q16_supplier_diversity",
    "q18_large_orders",
    "q19_disjunctive",
    "q22_idle_customers",
    "profit_by_nation_year",
    "min_price_supplier_per_part",
    "top_n_per_group",
    "window_running",
    "rollup_agg",
    "pivot_table",
    "percentiles",
    "sessionize",
    "spark_sql_interface",
    "cohort_retention",
    "cube_agg",
    "decay_weighted_sum",
    "distinct_users_daily",
    "funnel_counts",
    "fuzzy_match_blocked",
    "interval_coverage",
    "kmv_distinct",
    "ohlc_bars",
    "outlier_filter",
    "range_join_buckets",
    "regr_slope_per_user",
    "trailing_range_window",
    "asof_purchase_view",
    "stream_attribution_join",
    "stream_attribution_outer",
    "sequence_pack",
]


def _registry() -> tuple[dict, dict]:
    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracles: dict[str, str] = {}
    import abr_etl_spark.plans.analytics as analytics
    import abr_etl_spark.plans.analytics2 as analytics2
    import abr_etl_spark.plans.analytics3 as analytics3
    import abr_etl_spark.plans.semistructured as semistructured

    import abr_etl_spark.plans.analytics4 as analytics4
    import abr_etl_spark.plans.analytics5 as analytics5
    import abr_etl_spark.plans.analytics6 as analytics6
    import abr_etl_spark.plans.analytics7 as analytics7
    import abr_etl_spark.plans.analytics8 as analytics8

    modules = [
        analytics,
        analytics2,
        analytics3,
        analytics4,
        analytics5,
        analytics6,
        analytics7,
        analytics8,
        semistructured,
    ]
    try:
        import abr_etl_spark.plans.etl_parity as etl_parity

        modules.append(etl_parity)
    except ImportError:
        pass
    try:
        import abr_etl_spark.plans.llm_pipeline as llm_pipeline

        modules.append(llm_pipeline)
    except ImportError:
        pass
    try:
        import abr_etl_spark.plans.streaming_queries as streaming_queries

        modules.append(streaming_queries)
    except ImportError:
        pass
    try:
        import abr_etl_spark.plans.llm_pipeline2 as llm_pipeline2

        modules.append(llm_pipeline2)
    except ImportError:
        pass
    try:
        import abr_etl_spark.plans.llm_pipeline3 as llm_pipeline3

        modules.append(llm_pipeline3)
    except ImportError:
        pass
    try:
        import abr_etl_spark.plans.llm_pipeline4 as llm_pipeline4

        modules.append(llm_pipeline4)
    except ImportError:
        pass
    try:
        import abr_etl_spark.plans.llm_pipeline5 as llm_pipeline5

        modules.append(llm_pipeline5)
    except ImportError:
        pass
    try:
        import abr_etl_spark.plans.llm_pipeline6 as llm_pipeline6

        modules.append(llm_pipeline6)
    except ImportError:
        pass
    for m in modules:
        queries.update(m.QUERIES)
        oracles.update(m.ORACLES)

    # Priority ordering: the driver checks queries in registry order under a
    # ~50-row budget, so put the keys that most need a fresh CORRECTNESS row
    # first (see _R8_PRIORITY), then everything else in module order.
    ordered = {k: queries[k] for k in _R8_PRIORITY if k in queries}
    ordered.update({k: v for k, v in queries.items() if k not in ordered})
    return ordered, oracles


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry()[0]


def oracle_sql() -> dict[str, str]:
    return _registry()[1]
