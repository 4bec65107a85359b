"""Join strategy utilities for skew and co-location at scale.

AQE handles moderate skew (session.py enables skewJoin); these utilities
cover the cases AQE can't: pathological hot keys in aggregations
(two-phase salted agg) and repeated fact-fact joins (bucketed tables that
eliminate the shuffle entirely).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    *,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: salt the large side's key, replicate the
    small side across all salt values.

    Turns one hot key's single reducer into ``salt`` reducers. Replication
    multiplies the small side by ``salt`` -- use only when the small side
    is broadcast-sized but the join must shuffle anyway (e.g. the large
    side's partitioning must be preserved), or when AQE's skew split
    can't help (aggregate-after-join pipelines).
    """
    salted_l = large.withColumn(
        "__salt", (F.rand(seed=42) * salt).cast("int")
    )
    salted_s = small.withColumn(
        "__salt", F.explode(F.array([F.lit(i) for i in range(salt)]))
    )
    return (
        salted_l.join(salted_s, on=[key, "__salt"], how=how).drop("__salt")
    )


def two_phase_agg(
    df: DataFrame,
    key: str,
    agg_col: str,
    *,
    salt: int = 16,
) -> DataFrame:
    """Hot-key-safe sum: partial agg on (key, salt), then final on key.

    Spark's hash aggregate already does map-side partials; the explicit
    salted phase additionally splits a hot key ACROSS reducers in the
    first shuffle, bounding any single task. Output: (key, sum_<agg_col>).
    """
    partial = (
        df.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
        .groupBy(key, "__salt")
        .agg(F.sum(agg_col).alias("__part"))
    )
    return partial.groupBy(key).agg(F.sum("__part").alias(f"sum_{agg_col}"))


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    *,
    buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist as a bucketed (+sorted) table: joins/aggs on ``key``
    between same-bucketed tables need NO exchange -- the 100 TB answer to
    repeated fact-fact joins (bucket once, join shuffle-free forever)."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    return spark.table(left_table).join(spark.table(right_table), on=key, how=how)
