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


def _registry() -> tuple[dict, dict]:
    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracles: dict[str, str] = {}
    import abr_etl_spark.plans.analytics as analytics
    import abr_etl_spark.plans.analytics2 as analytics2
    import abr_etl_spark.plans.analytics3 as analytics3
    import abr_etl_spark.plans.semistructured as semistructured

    import abr_etl_spark.plans.analytics4 as analytics4
    import abr_etl_spark.plans.analytics5 as analytics5

    modules = [analytics, analytics2, analytics3, analytics4, analytics5, semistructured]
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
    for m in modules:
        queries.update(m.QUERIES)
        oracles.update(m.ORACLES)

    # Priority ordering: the driver checks queries in registry order under a
    # budget, so put the keys that most need a fresh CORRECTNESS row first --
    # round-1-unchecked (LLM pipeline + streaming) and previously
    # hash-mismatched oracles -- then everything else in module order.
    llm_keys: set = set()
    llm2_keys: list = []
    for m in modules:
        if m.__name__.endswith("llm_pipeline"):
            llm_keys = set(m.QUERIES)
        if m.__name__.endswith("llm_pipeline2"):
            llm2_keys = list(m.QUERIES)
    priority = [
        # r1 hash-fails (oracle dtype casts fixed in r2) -- these MUST
        # flip to green rows, so they go first under any driver budget
        "sessionize",
        "q12_shipping_buckets",
        "set_ops",
        "funnel_counts",
        "outlier_filter",
        "json_props_agg",
        "dq_completeness",
        "dq_uniqueness",
        "range_join_buckets",  # r1-vacuous (0 rows), now exercised
        # r1-unchecked block (LLM pipeline + streaming)
        *(k for k in queries if k in llm_keys),
        "stream_window_counts",
        # round-2 additions (no prior CORRECTNESS row)
        "stream_sliding_avg",
        "stream_session_windows",
        "stream_attribution_join",
        *llm2_keys,
        *analytics4.QUERIES,
        *analytics5.QUERIES,
        "window_funcs",
        "map_funcs",
        "json_nested_extract",
        "array_funcs",
    ]
    ordered = {k: queries[k] for k in priority if k in queries}
    ordered.update({k: v for k, v in queries.items() if k not in ordered})
    return ordered, oracles


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry()[0]


def oracle_sql() -> dict[str, str]:
    return _registry()[1]
