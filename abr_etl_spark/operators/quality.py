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


def accepted_values_report(
    df: DataFrame, table: str, checks: list[tuple[str, str, list[str]]]
) -> DataFrame:
    """Enumeration-contract check (the dbt accepted_values test, run at
    engine scale): for each (check_name, column, accepted) contract,
    count rows whose value falls outside the accepted set (NULL counts
    as a violation -- a contract column must be present AND legal) and
    the distinct illegal values seen (NULL excluded there). ONE
    conditional-aggregation scan per table however many contracts it
    carries; rows (check_name, table_name, col_name, n_rows,
    n_violations, n_distinct_bad)."""
    aggs = [F.count("*").alias("__total")]
    for name, c, accepted in checks:
        bad = F.when(F.col(c).isin(accepted), 0).otherwise(1)
        aggs.append(F.sum(bad.cast("long")).alias(f"__v_{name}"))
        aggs.append(
            F.countDistinct(
                F.when(F.col(c).isin(accepted), F.lit(None)).otherwise(
                    F.col(c)
                )
            ).alias(f"__d_{name}")
        )
    row = df.agg(*aggs)
    stacked = "stack({n}, {args}) as (check_name, col_name, n_violations, n_distinct_bad)".format(
        n=len(checks),
        args=", ".join(
            f"'{name}', '{c}', __v_{name}, __d_{name}"
            for name, c, _ in checks
        ),
    )
    return row.select(F.col("__total"), F.expr(stacked)).select(
        "check_name",
        F.lit(table).alias("table_name"),
        "col_name",
        F.col("__total").cast("long").alias("n_rows"),
        F.col("n_violations").cast("long").alias("n_violations"),
        F.col("n_distinct_bad").cast("long").alias("n_distinct_bad"),
    )
