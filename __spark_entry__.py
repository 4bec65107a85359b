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


# Keys added in round 3, kept near the front of the driver's budget so each
# gets a CORRECTNESS row in its first round. Extended as queries land.
_R3_NEW_KEYS: list[str] = [
    "triangle_count",
    "reachability_bfs",
    "markov_transitions",
    "decay_weighted_sum",
    "skyline_pareto",
    "mode_per_group",
    "interval_coverage",
    "bucketed_join_revenue",
    "kmv_distinct",
    "bigram_lm",
    "containment_pairs",
    "stream_attribution_outer",
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
    for m in modules:
        queries.update(m.QUERIES)
        oracles.update(m.ORACLES)

    # Priority ordering: the driver checks queries in registry order under a
    # ~50-row budget, so put the keys that most need a fresh CORRECTNESS row
    # first. r3: the 16 keys with no driver row yet (judge-verified green but
    # never reached under the r1/r2 budgets) lead, followed by queries whose
    # plans changed this round, then round-3 additions, then everything else
    # in module order (all of which already has a green r1 or r2 row).
    priority = [
        # --- 16 driver-unchecked keys (VERDICT r2 item 1) ---
        "array_funcs",
        "correlated_subqueries",
        "gap_fill_ffill",
        "grouping_sets_agg",
        "histogram_equi_depth",
        "histogram_equi_width",
        "json_nested_extract",
        "late_shipment_suppliers",
        "map_funcs",
        "q17_small_qty_revenue",
        "regr_slope_per_user",
        "salted_join_revenue",
        "trailing_range_window",
        "train_test_split",
        "unpivot_melt",
        "window_funcs",
        # --- plans changed in r3 (need re-verification) ---
        "ann_ivf_kmeans",  # distributed init + integer-unit centroid means
        "q15_top_supplier",  # broadcast-scalar max instead of global window
        "decontaminate_ngram",  # broadcast gate on the benchmark side
        "dedup_canonical_star",  # convergence contract
        # --- round-3 additions (no prior CORRECTNESS row) ---
        *_R3_NEW_KEYS,
    ]
    ordered = {k: queries[k] for k in priority if k in queries}
    ordered.update({k: v for k, v in queries.items() if k not in ordered})
    return ordered, oracles


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry()[0]


def oracle_sql() -> dict[str, str]:
    return _registry()[1]
