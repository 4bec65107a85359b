"""Streaming-equivalent queries (SURVEY.md §2 D-block).

The driver contract runs batch DataFrames; ``stream_window_counts`` runs
the SAME ``windowed_counts`` transformation the streaming path uses
(tests/test_streaming.py proves stream == batch on a file-source replay),
so the oracle checks the shared semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from abr_etl_spark.sources.lake import load_table
from abr_etl_spark.streaming.stream_ops import windowed_counts


def q_stream_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window counts (same code as the stream path)."""
    return windowed_counts(load_table(spark, sf_dir, "events"))


QUERIES = {"stream_window_counts": q_stream_window_counts}

ORACLES = {
    "stream_window_counts": """
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
               event_type,
               count(*) AS n_events,
               round(sum(value), 4) AS sum_value
        FROM events
        GROUP BY 1, 2
    """,
}
