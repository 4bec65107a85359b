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


# Round-16 priority head (r15 verdict item 6), ordered by how badly
# each key needs a fresh CORRECTNESS row under the driver's ~50-row
# budget:
# 1. r16-born keys (no driver row exists): the trading-name consumers;
# 2. plan changed this round (r16): the narrow-before-shuffle Q9/Q5
#    rewrites (r15 verdict item 1) and the resolve_chains
#    functional-guard + cache-lifetime fix behind abn_current;
# 3. stalest rotation -- every key whose newest driver row is STILL r9
#    (the r15 budget line fell before them), alphabetical;
# 4. the r10-row keys, alphabetical.
# Everything after the budget line keeps module order; all keys pass
# the local full-registry gate regardless.
_R16_PRIORITY: list[str] = [
    # --- 1. r16-born keys (never driver-checked) ---
    "trading_names_current",
    "fuzzy_match_trading_names",
    # --- 2. plan changed in r16 ---
    "profit_by_nation_year",
    "q5_local_supplier",
    "abn_current",
    "abn_chain_census",
    # --- 3. stalest rotation: r9-row keys ---
    "interval_coverage",
    "kmv_distinct",
    "min_price_supplier_per_part",
    "ohlc_bars",
    "outlier_filter",
    "percentiles",
    "pivot_table",
    "q10_returned_items",
    "q12_shipping_buckets",
    "q14_promo_revenue",
    "q16_supplier_diversity",
    "q18_large_orders",
    "q19_disjunctive",
    "q22_idle_customers",
    "q3_shipping_priority",
    "q4_order_priority",
    "range_join_buckets",
    "regr_slope_per_user",
    "scd2",
    "sequence_pack",
    "sessionize",
    "snapshot_latest",
    "spark_sql_interface",
    "stream_attribution_join",
    "stream_attribution_outer",
    "top_n_per_group",
    "trailing_range_window",
    "window_running",
    # --- 4. next-stalest (r10 rows), alphabetical ---
    "ann_bruteforce",
    "ann_lsh",
    "ann_lsh_multiprobe",
    "array_agg_per_group",
    "asof_next_view",
    "chunk_documents",
    "corpus_mix",
    "cumulative_distinct_users",
    "datetime_funcs",
    "dedup_canonical",
    "dedup_exact",
    "dedup_incremental_probe",
    "dedup_lines",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dq_completeness",
    "dq_uniqueness",
    "dup_spans",
    "fingerprint",
    "ingest_routed",
    "json_props_agg",
    "lang_id",
    "multimodal_frame_sample",
    "multimodal_meta",
    "null_semantics",
    "q21_waiting_suppliers",
    "quality_score",
    "redact_pii",
    "sample_deterministic",
    "sample_stratified",
    "sequence_pack_chunks",
    "set_ops",
    "string_funcs",
    "text_stats",
    "tfidf_top_terms",
    "zscore_window",
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
    # first (see _R16_PRIORITY), then everything else in module order.
    ordered = {k: queries[k] for k in _R16_PRIORITY if k in queries}
    ordered.update({k: v for k, v in queries.items() if k not in ordered})
    return ordered, oracles


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry()[0]


def oracle_sql() -> dict[str, str]:
    return _registry()[1]
