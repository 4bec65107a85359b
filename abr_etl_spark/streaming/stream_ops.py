"""Structured Streaming operators over the events stream.

Design: every transformation here is written against a plain DataFrame so
the SAME function serves batch (parquet scan) and streaming (readStream)
inputs -- the Spark-idiomatic way to keep one code path for replay and
live data. Watermarks bound state for late data; windowed aggregations
shuffle on (window, key) which AQE cannot touch in streaming, so the
shuffle partition count matters (set in session.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_counts(
    events: DataFrame,
    *,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling event-time window counts + value sum per event_type.

    On a streaming input the watermark bounds state (late rows beyond it
    are dropped); on a batch input the watermark is a no-op, so batch
    replay produces the streaming steady-state result -- which is exactly
    what the DuckDB oracle checks.
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def read_event_stream(
    spark: SparkSession,
    dir_path: str,
    *,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-source stream over a directory of event parquet drops --
    the replayable local stand-in for Kafka/Kinesis ingestion. The nanos
    TIMESTAMP is normalized exactly like the batch reader."""
    schema = spark.read.parquet(dir_path).schema
    df = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(dir_path)
    )
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def run_stream_to_memory(
    result: DataFrame, table_name: str, *, output_mode: str = "complete"
):
    """Drive a streaming DF into an in-memory sink until the source is
    drained (test/replay harness)."""
    q = (
        result.writeStream.format("memory")
        .queryName(table_name)
        .outputMode(output_mode)
        .start()
    )
    q.processAllAvailable()
    return q
