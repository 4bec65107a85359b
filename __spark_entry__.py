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


# Round-6 priority head, ordered by how badly each key needs a fresh
# CORRECTNESS row under the driver's ~50-row budget (r5 verdict item 1:
# rotate oldest-driver-row keys to the head so no green row is older than
# r4 after this round):
# 1. keys that are brand new or whose plan changed this round;
# 2. the 7 keys whose latest driver row dates to round 1;
# 3. the 40 keys whose latest driver row dates to round 2.
_R6_PRIORITY: list[str] = [
    # --- 1. new / changed this round ---
    "stream_running_counts",
    "stream_dedup_exact",
    "sequence_pack_chunks",
    "dedup_lines",
    "dsir_importance",
    "q21_waiting_suppliers",
    "dedup_semantic",
    "asof_next_view",
    "multimodal_frame_sample",
    "doc_ngram_novelty",
    "cumulative_distinct_users",
    "pii_report",
    "rfm_segments",
    "dedup_embedding",
    "corpus_mix",
    "bucketed_join_revenue",
    "dedup_incremental_probe",
    # --- 2. r1-stale driver rows ---
    "datetime_funcs",
    "null_semantics",
    "zscore_window",
    "array_agg_per_group",
    "string_funcs",
    "ingest_routed",
    "lake_partitions",
    # --- 3. r2-stale driver rows ---
    "set_ops",
    "json_props_agg",
    "dq_completeness",
    "dq_uniqueness",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_canonical",
    "ann_bruteforce",
    "ann_lsh",
    "ann_lsh_multiprobe",
    "ann_ivf",
    "text_stats",
    "lang_id",
    "quality_score",
    "fingerprint",
    "multimodal_meta",
    "chunk_documents",
    "redact_pii",
    "sample_deterministic",
    "dup_spans",
    "tfidf_top_terms",
    "sample_stratified",
    "stream_window_counts",
    "stream_sliding_avg",
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

    modules = [
        analytics,
        analytics2,
        analytics3,
        analytics4,
        analytics5,
        analytics6,
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
    for m in modules:
        queries.update(m.QUERIES)
        oracles.update(m.ORACLES)

    # Priority ordering: the driver checks queries in registry order under a
    # ~50-row budget, so put the keys that most need a fresh CORRECTNESS row
    # first (see _R6_PRIORITY), then everything else in module order.
    ordered = {k: queries[k] for k in _R6_PRIORITY if k in queries}
    ordered.update({k: v for k, v in queries.items() if k not in ordered})
    return ordered, oracles


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry()[0]


def oracle_sql() -> dict[str, str]:
    return _registry()[1]
