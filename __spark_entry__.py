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


# Round-12 priority head (r11 verdict item 1), ordered by how badly
# each key needs a fresh CORRECTNESS row under the driver's ~50-row
# budget:
# 1. the 48 keys whose newest driver row dates to round 7 (the
#    `_R11_PRIORITY` section-4 tail minus anomaly_mad /
#    asof_interpolate, which r11's budget covered) -- retiring this
#    tail lifts the catalog's freshness floor from r7 to r8;
# 2. born or plan-changed this round (r12 new keys; the
#    dedup_weighted_jaccard broadcast-guard and shingle_size_sweep
#    short-doc keys whose plans were touched).
# Everything after the budget line keeps module order; all keys pass
# the local full-registry gate regardless.
_R12_PRIORITY: list[str] = [
    # --- 1. r7-stale driver rows (48; oldest catalog rows) ---
    "attribution_linear",
    "basket_pairs",
    "bm25_topk",
    "bpe_pair_counts",
    "bucketed_join_revenue",
    "cohort_ltv",
    "conversion_lag_stats",
    "corpus_pipeline",
    "cross_split_leakage",
    "daily_value_bands",
    "dedup_cluster_sizes",
    "dedup_embedding",
    "dedup_family_agreement",
    "degree_distribution",
    "delta_apply_roundtrip",
    "embedding_quantize",
    "embedding_top_eigvec",
    "heavy_hitters_cms",
    "hot_keys_report",
    "inverted_postings",
    "jaccard_topk_similar",
    "knn_classify",
    "lake_partitions",
    "linreg_normal_eq",
    "lm_score_bigram",
    "map_funcs",
    "mom_growth",
    "multimodal_features",
    "new_vs_returning",
    "pagerank_suppliers",
    "percentile_normalize",
    "q11_important_stock",
    "q13_order_distribution",
    "q20_dominant_suppliers",
    "q7_volume_shipping",
    "q8_market_share",
    "quality_filter_pipeline",
    "quantile_sketch_hash",
    "repetition_score",
    "rfm_segments",
    "scd2_point_in_time",
    "stream_dedup_exact",
    "stream_first_seen",
    "stream_session_windows",
    "stream_window_counts",
    "time_weighted_avg",
    "weighted_sample_systematic",
    "window_funcs",
    # --- 2. r12 new / plan-changed ---
    "dedup_weighted_jaccard",
    "shingle_size_sweep",
    "minhash_perm_sweep",
    "tfidf_cosine_pairs",
    "ks_drift_by_source",
    "t_closeness_report",
    "doc_entropy_quality",
    "zipf_tail_by_source",
    "dup_span_coverage",
    "lang_entropy_by_source",
    "bootstrap_ci_poisson",
    "psi_drift_by_source",
    "cusum_changepoint_daily",
    "anova_f_event_value",
    "mannwhitney_u_value",
    "mmr_diversify_topk",
    "mmr_lambda_sweep",
    "benford_first_digit",
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
    "abc_classification",
    "burstiness_fano",
    "attribution_position",
    "reciprocal_best_match",
    "record_linkage_fs",
    # plan-changed late in r12 (IVF seed-cell cap; results at gate SFs
    # unchanged but the driver should re-row them)
    "ann_ivf",
    "ann_ivf_pq",
    "ann_ivf_pq_kmeans",
    "ivfadc_nprobe_sweep",
    "ivfadc_trained_nprobe",
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
    for m in modules:
        queries.update(m.QUERIES)
        oracles.update(m.ORACLES)

    # Priority ordering: the driver checks queries in registry order under a
    # ~50-row budget, so put the keys that most need a fresh CORRECTNESS row
    # first (see _R12_PRIORITY), then everything else in module order.
    ordered = {k: queries[k] for k in _R12_PRIORITY if k in queries}
    ordered.update({k: v for k, v in queries.items() if k not in ordered})
    return ordered, oracles


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry()[0]


def oracle_sql() -> dict[str, str]:
    return _registry()[1]
