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


# Round-13 priority head (r12 verdict item 1), ordered by how badly
# each key needs a fresh CORRECTNESS row under the driver's ~50-row
# budget:
# 1. the 31 r12-born keys that have never had a driver row (they sat
#    past the ~50-row budget line behind the r12 stale-rotation
#    section);
# 2. plan-changed this round (r13): abc_classification (two-level
#    prefix sum replaced the global window), dedup_weighted_jaccard
#    (survivor-bound rescore from the cached pair arrays),
#    benford_first_digit (digit-1..9 census marginal), plus the five
#    IVF keys whose r12 seed-cap change never got a driver row;
# 3. r13-born keys (appended as they land).
# Everything after the budget line keeps module order; all keys pass
# the local full-registry gate regardless.
_R13_PRIORITY: list[str] = [
    # --- 1. r12-born, never driver-checked (31) ---
    "minhash_perm_sweep",
    "tfidf_cosine_pairs",
    "ks_drift_by_source",
    "bootstrap_ci_poisson",
    "psi_drift_by_source",
    "cusum_changepoint_daily",
    "anova_f_event_value",
    "mannwhitney_u_value",
    "seasonal_index_dow",
    "mutual_information_type_dow",
    "acf_daily_lag",
    "theilsen_slope_daily",
    "profile_columns",
    "collocations_pmi",
    "link_prediction_aa",
    "k_anon_generalization_sweep",
    "join_cardinality_estimate",
    "decompose_trend_dow",
    "stratified_kfold_assign",
    "keyness_g2_by_source",
    "burstiness_fano",
    "attribution_position",
    "reciprocal_best_match",
    "record_linkage_fs",
    "t_closeness_report",
    "doc_entropy_quality",
    "zipf_tail_by_source",
    "dup_span_coverage",
    "lang_entropy_by_source",
    # --- 2. plan-changed in r13 (these two are also r12-born) ---
    "abc_classification",
    "benford_first_digit",
    "dedup_weighted_jaccard",
    "ann_ivf",
    "ann_ivf_pq",
    "ann_ivf_pq_kmeans",
    "ivfadc_nprobe_sweep",
    "ivfadc_trained_nprobe",
    # --- 3. r13-born keys ---
    "holt_winters_forecast",
    "ann_pareto_frontier",
    "boilerplate_line_census",
    "gini_concentration",
    "kendall_tau_daily",
    "runs_test_daily",
    "winsorized_mean_by_type",
    "dedup_cross_source_matrix",
    "embedding_norm_outliers",
    "holt_winters_seasonal",
    "spearman_rho_daily",
    "funnel_dropoff",
    "weighted_reservoir_sample",
    "vocab_df_zipf",
    "doc_idf_profile",
    "doc_boilerplate_simpson",
    "funnel_time_to_convert",
    "page_hinkley_drift",
    "source_df_zipf",
    "q2_min_cost_supplier",
    "association_rules",
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
    for m in modules:
        queries.update(m.QUERIES)
        oracles.update(m.ORACLES)

    # Priority ordering: the driver checks queries in registry order under a
    # ~50-row budget, so put the keys that most need a fresh CORRECTNESS row
    # first (see _R12_PRIORITY), then everything else in module order.
    ordered = {k: queries[k] for k in _R13_PRIORITY if k in queries}
    ordered.update({k: v for k, v in queries.items() if k not in ordered})
    return ordered, oracles


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry()[0]


def oracle_sql() -> dict[str, str]:
    return _registry()[1]
