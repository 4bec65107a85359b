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


# Round-9 priority head, ordered by how badly each key needs a fresh
# CORRECTNESS row under the driver's ~50-row budget (r8 verdict item 1):
# 1. the 47 keys whose latest driver row still dates to round 5 (the
#    tail of _R8_PRIORITY's section 3 that did not fit r8's budget) --
#    after r9 no key's newest driver row is older than r6;
# 2. the brand-new key and the keys whose OUTPUT changed this round
#    (EIG_K=3 PCA, the HLL linear-counting family);
# 3. keys whose plan or oracle text changed this round with values
#    unchanged at test sf, plus the four keys the r8 budget line cut
#    (all hold green r7/r8 rows, so they can safely spill again).
# Everything after the budget line keeps module order; all keys pass the
# local full-registry gate regardless.
_R9_PRIORITY: list[str] = [
    # --- 1. r5-stale driver rows (rotate first, r8 verdict item 1) ---
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
    # --- 2. brand-new / output-changed this round ---
    "embedding_whiten_topk",
    "ann_nprobe_sweep",
    "simhash_recall_by_tau",
    "bpe_encode_corpus",
    "embedding_pca_topk",
    "hll_distinct",
    "hll_sliding_distinct",
    "stream_hll_distinct",
    # --- 3. plan/oracle text changed (values unchanged at test sf) +
    #        the r8 budget-line spill (green r7/r8 rows held) ---
    "simpson_diversity",
    "source_divergence_tv",
    "term_lift_topk",
    "time_weighted_avg",
    "winsorized_mean",
    "bm25_topk",
    "inverted_postings",
    "quantile_sketch_hash",
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
    try:
        import abr_etl_spark.plans.llm_pipeline7 as llm_pipeline7

        modules.append(llm_pipeline7)
    except ImportError:
        pass
    for m in modules:
        queries.update(m.QUERIES)
        oracles.update(m.ORACLES)

    # Priority ordering: the driver checks queries in registry order under a
    # ~50-row budget, so put the keys that most need a fresh CORRECTNESS row
    # first (see _R9_PRIORITY), then everything else in module order.
    ordered = {k: queries[k] for k in _R9_PRIORITY if k in queries}
    ordered.update({k: v for k, v in queries.items() if k not in ordered})
    return ordered, oracles


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry()[0]


def oracle_sql() -> dict[str, str]:
    return _registry()[1]
