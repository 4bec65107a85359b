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


# Round-14 priority head (r13 verdict item 2), ordered by how badly
# each key needs a fresh CORRECTNESS row under the driver's ~50-row
# budget:
# 1. the 8 r13-born keys the r13 driver budget missed (the only keys
#    in the registry with NO driver row, ever);
# 2. plan-changed this round (r14): the r13-ADVICE exactness fixes
#    (funnel_dropoff's coalesced predicates, incremental_agg's integer
#    coalesce, holt_winters_seasonal's DECIMAL(38,0) smoothing fold);
# 3. r14-born keys (appended as they land);
# 4. stalest rotation -- keys whose newest driver row is r8, oldest
#    first by name (the ~6-round rotation discipline from the r13
#    verdict).
# Everything after the budget line keeps module order; all keys pass
# the local full-registry gate regardless.
_R14_PRIORITY: list[str] = [
    # --- 1. r13-born, never driver-checked (8) ---
    "vocab_df_zipf",
    "doc_idf_profile",
    "doc_boilerplate_simpson",
    "funnel_time_to_convert",
    "page_hinkley_drift",
    "source_df_zipf",
    "q2_min_cost_supplier",
    "association_rules",
    # --- 2. plan-changed in r14 (r13 ADVICE fixes) ---
    "funnel_dropoff",
    "incremental_agg",
    "holt_winters_seasonal",
    "q6_forecast_revenue",
    "fuzzy_match_blocked",
    "reciprocal_best_match",
    "record_linkage_fs",
    "simhash_band_sweep",
    # --- 3. r14-born keys (appended as they land) ---
    "markov_attribution",
    "sprt_conversion_monitor",
    "holt_winters_additive",
    "rule_conviction",
    "rule_ancestor_prune",
    "stratified_reservoir_alloc",
    "dedup_simhash_clusters",
    "survival_km",
    # --- 4. stalest rotation (driver row from r8) ---
    "ab_test_conversion",
    "array_funcs",
    "bigram_lm",
    "bloom_membership",
    "bpe_apply_merge",
    "bpe_learn_merges",
    "chi2_event_dow",
    "containment_pairs",
    "correlated_subqueries",
    "datetime_funcs2",
    "decontaminate_ngram",
    "dedup_canonical_star",
    "dedup_threshold_sweep",
    "delta_changed_columns",
    "embedding_outlier_report",
    "embedding_pca_topk",
    "funnel_time_bounded",
    "gap_fill_ffill",
    "gini_nation_revenue",
    "grouping_sets_agg",
    "histogram_equi_depth",
    "histogram_equi_width",
    "hll_distinct",
    "hll_sliding_distinct",
    "json_nested_extract",
    "kmv_set_ops",
    "lang_id_confusion",
    "late_shipment_suppliers",
    "markov_transitions",
    "mode_per_group",
    "multimodal_content_address",
    "q15_top_supplier",
    "q17_small_qty_revenue",
    "reachability_bfs",
    "recall_at_k_eval",
    "salted_join_revenue",
    "session_paths_topk",
    "simpson_diversity",
    "skyline_pareto",
    "source_divergence_tv",
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
    import abr_etl_spark.plans.analytics9 as analytics9
    import abr_etl_spark.plans.analytics10 as analytics10
    import abr_etl_spark.plans.analytics11 as analytics11
    import abr_etl_spark.plans.analytics12 as analytics12
    import abr_etl_spark.plans.analytics13 as analytics13
    import abr_etl_spark.plans.analytics14 as analytics14
    import abr_etl_spark.plans.analytics15 as analytics15

    modules = [
        analytics,
        analytics2,
        analytics3,
        analytics4,
        analytics5,
        analytics6,
        analytics7,
        analytics8,
        analytics9,
        analytics10,
        analytics11,
        analytics12,
        analytics13,
        analytics14,
        analytics15,
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
    try:
        import abr_etl_spark.plans.llm_pipeline7 as llm_pipeline7

        modules.append(llm_pipeline7)
    except ImportError:
        pass
    try:
        import abr_etl_spark.plans.llm_pipeline8 as llm_pipeline8

        modules.append(llm_pipeline8)
    except ImportError:
        pass
    try:
        import abr_etl_spark.plans.llm_pipeline9 as llm_pipeline9

        modules.append(llm_pipeline9)
    except ImportError:
        pass
    try:
        import abr_etl_spark.plans.llm_pipeline11 as llm_pipeline11

        modules.append(llm_pipeline11)
    except ImportError:
        pass
    try:
        import abr_etl_spark.plans.llm_pipeline10 as llm_pipeline10

        modules.append(llm_pipeline10)
    except ImportError:
        pass
    try:
        import abr_etl_spark.plans.llm_pipeline12 as llm_pipeline12

        modules.append(llm_pipeline12)
    except ImportError:
        pass
    try:
        import abr_etl_spark.plans.llm_pipeline13 as llm_pipeline13

        modules.append(llm_pipeline13)
    except ImportError:
        pass
    try:
        import abr_etl_spark.plans.llm_pipeline14 as llm_pipeline14

        modules.append(llm_pipeline14)
    except ImportError:
        pass
    for m in modules:
        queries.update(m.QUERIES)
        oracles.update(m.ORACLES)

    # Priority ordering: the driver checks queries in registry order under a
    # ~50-row budget, so put the keys that most need a fresh CORRECTNESS row
    # first (see _R14_PRIORITY), then everything else in module order.
    ordered = {k: queries[k] for k in _R14_PRIORITY if k in queries}
    ordered.update({k: v for k, v in queries.items() if k not in ordered})
    return ordered, oracles


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry()[0]


def oracle_sql() -> dict[str, str]:
    return _registry()[1]
