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


# Round-15 priority head (r14 verdict item 7), ordered by how badly
# each key needs a fresh CORRECTNESS row under the driver's ~50-row
# budget:
# 1. r15-born keys (no driver row exists);
# 2. plan/oracle changed this round (r15): markov_attribution's
#    generator-derived text, simhash_band_sweep's DECIMAL-sum census,
#    dedup_simhash_clusters' pointer-jumping CC oracle;
# 3. stalest rotation -- the keys whose newest driver row is STILL r8
#    (the r14 budget line fell inside that tail), then
# 4. the oldest r9-row keys, alphabetical.
# Everything after the budget line keeps module order; all keys pass
# the local full-registry gate regardless.
_R15_PRIORITY: list[str] = [
    # --- 1. r15-born keys (never driver-checked) ---
    "abn_current",
    "abn_chain_census",
    "markov_attribution_k",
    "quantile_merge_by_source",
    "quantile_grid_sweep",
    "stream_quantile_windowed",
    # --- 2. plan/oracle changed in r15 (generator-derived markov
    #     text, DECIMAL-sum candidate census, scalable CC oracle) ---
    "markov_attribution",
    "simhash_band_sweep",
    "dedup_simhash_clusters",
    "q1_pricing_summary",
    "rollup_agg",
    "gini_concentration",
    "burstiness_fano",
    "anova_f_event_value",
    "doc_boilerplate_simpson",
    # --- 3. stalest rotation: the r8-row tail the r14 budget
    #     did not reach (~6-round rotation discipline) ---
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
    "stream_hll_distinct",
    "string_funcs2",
    "term_lift_topk",
    "train_test_split",
    "triangle_count",
    "unpivot_melt",
    "window_funcs2",
    "winsorized_mean",
    "zorder_layout",
    # --- 4. next-stalest (r9 rows), alphabetical head ---
    "asof_purchase_view",
    "cohort_retention",
    "cube_agg",
    "decay_weighted_sum",
    "delta_added",
    "delta_classify_lake",
    "delta_removed",
    "delta_unchanged_count",
    "delta_updated",
    "distinct_users_daily",
    "dq_referential",
    "funnel_counts",
    "interval_coverage",
    "kmv_distinct",
    "min_price_supplier_per_part",
    "ohlc_bars",
    "outlier_filter",
    "percentiles",
    "pivot_table",
    "profit_by_nation_year",
    "q10_returned_items",
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
    # first (see _R15_PRIORITY), then everything else in module order.
    ordered = {k: queries[k] for k in _R15_PRIORITY if k in queries}
    ordered.update({k: v for k, v in queries.items() if k not in ordered})
    return ordered, oracles


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry()[0]


def oracle_sql() -> dict[str, str]:
    return _registry()[1]
