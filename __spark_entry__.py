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


# Round-7 priority head, ordered by how badly each key needs a fresh
# CORRECTNESS row under the driver's ~50-row budget (r6 verdict item 3):
# 1. the 13 keys whose latest driver row still dates to round 2 (they did
#    not fit r6's budget);
# 2. keys that are brand new or whose plan changed this round;
# 3. the 25 keys whose latest driver row dates to round 4.
# Everything after the budget line keeps module order; all keys pass the
# local 136-query gate regardless.
_R7_PRIORITY: list[str] = [
    # --- 1. r2-stale driver rows (rotate first, r6 verdict item 3) ---
    "stream_session_windows",
    "multimodal_features",
    "repetition_score",
    "embedding_quantize",
    "quality_filter_pipeline",
    "pagerank_suppliers",
    "knn_classify",
    "corpus_pipeline",
    "q7_volume_shipping",
    "q8_market_share",
    "q11_important_stock",
    "q20_dominant_suppliers",
    "q13_order_distribution",
    # --- 2. BRAND-NEW keys this round (no driver row exists yet) ---
    "bm25_topk",
    "lm_score_bigram",
    "dedup_cluster_sizes",
    "cross_split_leakage",
    "asof_interpolate",
    "time_weighted_avg",
    "bpe_pair_counts",
    "jaccard_topk_similar",
    "percentile_normalize",
    "inverted_postings",
    "anomaly_mad",
    "mom_growth",
    "new_vs_returning",
    "delta_apply_roundtrip",
    "stream_first_seen",
    "attribution_linear",
    "conversion_lag_stats",
    "quantile_sketch_hash",
    "hot_keys_report",
    "degree_distribution",
    "linreg_normal_eq",
    "basket_pairs",
    "weighted_sample_systematic",
    "scd2_point_in_time",
    "daily_value_bands",
    "cohort_ltv",
    "embedding_top_eigvec",
    "dedup_family_agreement",
    # --- 3. changed-plan keys this round (older green rows exist) ---
    "rfm_segments",
    "heavy_hitters_cms",
    "dedup_embedding",
    "lake_partitions",
    "bucketed_join_revenue",
    "stream_window_counts",
    "stream_dedup_exact",
    # --- 4. r4-stale driver rows ---
    "window_funcs",
    "map_funcs",
    "json_nested_extract",
    "array_funcs",
    "dedup_canonical_star",
    "q15_top_supplier",
    "q17_small_qty_revenue",
    "late_shipment_suppliers",
    "train_test_split",
    "histogram_equi_width",
    "histogram_equi_depth",
    "gap_fill_ffill",
    "correlated_subqueries",
    "salted_join_revenue",
    "grouping_sets_agg",
    "unpivot_melt",
    "triangle_count",
    "reachability_bfs",
    "markov_transitions",
    "skyline_pareto",
    "mode_per_group",
    "ann_ivf_kmeans",
    "decontaminate_ngram",
    "bigram_lm",
    "containment_pairs",
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

    modules = [
        analytics,
        analytics2,
        analytics3,
        analytics4,
        analytics5,
        analytics6,
        analytics7,
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
    for m in modules:
        queries.update(m.QUERIES)
        oracles.update(m.ORACLES)

    # Priority ordering: the driver checks queries in registry order under a
    # ~50-row budget, so put the keys that most need a fresh CORRECTNESS row
    # first (see _R7_PRIORITY), then everything else in module order.
    ordered = {k: queries[k] for k in _R7_PRIORITY if k in queries}
    ordered.update({k: v for k, v in queries.items() if k not in ordered})
    return ordered, oracles


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry()[0]


def oracle_sql() -> dict[str, str]:
    return _registry()[1]
