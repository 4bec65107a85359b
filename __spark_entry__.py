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


# Round-17 priority head (r16 verdict items 2 and 4), ordered by how
# badly each key needs a fresh CORRECTNESS row under the driver's
# ~50-row budget:
# 1. keys whose plans were RESTRUCTURED in r16 (MMR fold, shared doc-df
#    frame, link-prediction edge cache, ann one-stream sweep, rule
#    census) -- none of them landed in the r16 driver sample because
#    the old priority head predated the rewrites;
# 2. keys whose cache LIFECYCLE changed in r17 (family-scoped release,
#    newly-registered persists) or whose internals r17 touches
#    (minhash/lsh cold build, stratified one-pass, rule prefix filter);
# 3. stalest rotation: keys with a row in NEITHER the r15 nor the r16
#    driver sample, alphabetical.
# Everything after the budget line keeps module order; all keys pass
# the local full-registry gate regardless.
_R17_PRIORITY: list[str] = [
    # --- 1. restructured in r16, no post-restructure driver row ---
    "mmr_diversify_topk",
    "mmr_lambda_sweep",
    "link_prediction_aa",
    "doc_idf_profile",
    "doc_boilerplate_simpson",
    "ann_nprobe_sweep",
    "ann_pareto_frontier",
    "association_rules",
    "rule_conviction",
    "rule_ancestor_prune",
    "delta_updated",
    "delta_added",
    "delta_removed",
    "delta_unchanged_count",
    "delta_classify_lake",
    # --- 2. r17 cache-lifecycle / internals changes ---
    "minhash_perm_sweep",
    "lsh_band_sweep",
    "stratified_reservoir_alloc",
    "dedup_simhash_clusters",
    "incremental_agg",
    "quantile_merge_by_source",
    "quantile_grid_sweep",
    "vocab_df_zipf",
    "source_df_zipf",
    "dedup_cross_source_matrix",
    "simhash_recall_by_tau",
    "dup_inflation_report",
    "ivfadc_nprobe_sweep",
    "ivfadc_trained_nprobe",
    "hll_merge_by_type",
    "kmv_merge_by_source",
    "cms_merge_by_source",
    "embedding_whiten_topk",
    "containment_pairs",
    "dedup_embedding",
    "dedup_incremental_probe",
    # --- 3. stalest rotation (no r15/r16 driver row), alphabetical ---
    "ab_test_conversion",
    "abc_classification",
    "acf_daily_lag",
    "ann_ivf",
    "ann_ivf_kmeans",
    "ann_ivf_pq",
    "ann_ivf_pq_kmeans",
    "ann_pq_adc",
    "ann_pq_kmeans",
    "anomaly_mad",
    "array_funcs",
    "asof_interpolate",
    "attribution_linear",
    "attribution_position",
    "basket_pairs",
    "benford_first_digit",
    "bigram_lm",
    "bloom_fpr_sweep",
    "bloom_membership",
    "bm25_topk",
    "boilerplate_line_census",
    "bootstrap_ci_poisson",
    "bpe_apply_merge",
    "bpe_encode_corpus",
    "bpe_learn_merges",
    "bpe_pair_counts",
    "bucketed_join_revenue",
    "chi2_event_dow",
    "cohort_ltv",
    "collocations_pmi",
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
    # first (see _R17_PRIORITY), then everything else in module order.
    ordered = {k: queries[k] for k in _R17_PRIORITY if k in queries}
    ordered.update({k: v for k, v in queries.items() if k not in ordered})
    return ordered, oracles


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry()[0]


def oracle_sql() -> dict[str, str]:
    return _registry()[1]
