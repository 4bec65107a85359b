"""Data-quality checks -- the validation layer an ETL engine needs
between ingest and publish.

A check suite compiles to ONE aggregate job (conditional aggregation in
a single scan per table, plus one anti-join per referential check); the
report is a small DataFrame of (check, table, metric, passed) rows
suitable for gating a pipeline run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def completeness_report(
    df: DataFrame, table: str, columns: list[str]
) -> DataFrame:
    """Null-rate per column, one scan (conditional agg, no per-column jobs)."""
    n = F.count("*")
    aggs = [n.alias("__total")] + [
        F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{c}") for c in columns
    ]
    row = df.agg(*aggs)
    stacked = "stack({n}, {args}) as (col_name, n_nulls)".format(
        n=len(columns),
        args=", ".join(f"'{c}', __nulls_{c}" for c in columns),
    )
    return row.select(F.col("__total"), F.expr(stacked)).select(
        F.lit(table).alias("table_name"),
        "col_name",
        "n_nulls",
        F.col("__total").alias("n_rows"),
        (F.col("n_nulls") == 0).cast("int").alias("complete"),
    )


def uniqueness_report(df: DataFrame, table: str, key: str) -> DataFrame:
    """Key uniqueness: duplicate key count via one groupBy."""
    dupes = (
        df.groupBy(key)
        .agg(F.count("*").alias("n"))
        .where(F.col("n") > 1)
        .agg(
            F.coalesce(F.count("*"), F.lit(0)).alias("dup_keys"),
            F.coalesce(F.sum("n"), F.lit(0)).alias("dup_rows"),
        )
    )
    return dupes.select(
        F.lit(table).alias("table_name"),
        F.lit(key).alias("key_col"),
        F.col("dup_keys").cast("long").alias("dup_keys"),
        F.col("dup_rows").cast("long").alias("dup_rows"),
        (F.col("dup_keys") == 0).cast("int").alias("is_unique"),
    )


def referential_report(
    child: DataFrame,
    parent: DataFrame,
    *,
    child_key: str,
    parent_key: str,
    name: str,
) -> DataFrame:
    """Orphan count: child keys with no parent (anti-join; AQE broadcasts
    the parent key set when it fits)."""
    orphans = child.select(F.col(child_key).alias("k")).join(
        parent.select(F.col(parent_key).alias("k")), "k", "left_anti"
    )
    return orphans.agg(F.count("*").alias("n_orphans")).select(
        F.lit(name).alias("relation"),
        "n_orphans",
        (F.col("n_orphans") == 0).cast("int").alias("intact"),
    )
