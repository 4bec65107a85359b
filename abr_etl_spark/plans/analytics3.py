"""Coverage part 3: set operations, datetime functions, NULL-handling
semantics, bucketed range joins, and window-based normalization.

The range join shows the scale technique for inequality joins: bucket
both sides by coarse time, equi-join on the bucket (+neighbor), then
apply the exact range predicate -- Catalyst gets a hash join instead of
a broadcast-nested-loop over the full cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from abr_etl_spark.sources.lake import load_table


def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT over customer key slices."""
    c = load_table(spark, sf_dir, "customer")
    a = c.where(F.col("c_custkey") % 3 == 0).select("c_custkey")
    b = c.where(F.col("c_custkey") % 5 == 0).select("c_custkey")
    u = a.union(b).distinct().withColumn("op", F.lit("union"))
    i = a.intersect(b).withColumn("op", F.lit("intersect"))
    e = a.exceptAll(b).withColumn("op", F.lit("except"))
    return (
        u.unionByName(i)
        .unionByName(e)
        .groupBy("op")
        .agg(F.count("*").alias("n"), F.sum("c_custkey").alias("key_sum"))
        .orderBy("op")
    )


def datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime battery on order dates (trunc, extract, diff, add)."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 500)
    return o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("d"),
        F.year("o_orderdate").alias("y"),
        F.quarter("o_orderdate").alias("q"),
        F.month("o_orderdate").alias("m"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.dayofyear("o_orderdate").alias("doy"),
        F.date_format(F.date_add(F.col("o_orderdate").cast("date"), 30), "yyyy-MM-dd").alias(
            "plus30"
        ),
        F.date_format(F.trunc(F.col("o_orderdate").cast("date"), "month"), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.datediff(
            F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date")
        ).alias("days_to_2002"),
    )


def null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(col) vs COUNT(*), coalesce/nullif, null-safe grouping --
    the semantics ports silently get wrong."""
    c = load_table(spark, sf_dir, "customer")
    # synthesize NULLs deterministically: every 7th acctbal
    withnulls = c.select(
        "c_mktsegment",
        F.when(F.col("c_custkey") % 7 == 0, None)
        .otherwise(F.col("c_acctbal"))
        .alias("bal"),
    )
    return (
        withnulls.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_rows"),
            F.count("bal").alias("n_nonnull"),
            F.round(F.sum(F.coalesce(F.col("bal"), F.lit(0.0))), 2).alias(
                "sum_coalesced"
            ),
            F.round(F.avg("bal"), 4).alias("avg_ignoring_nulls"),
            F.count(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))).alias(
                "n_not_building"
            ),
        )
        .orderBy("c_mktsegment")
    )


def range_join_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events-near-events range join (same user, |Δt| <= 60s, different
    event): bucket by minute, equi-join on (user, bucket±1), exact filter.
    The candidate space is CO-BUCKETED pairs, not the n^2 cross product.
    """
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.col("ts").cast("long").alias("ts_s")
    )
    a = (
        e.where(F.col("event_type") == "error")
        .withColumnRenamed("event_id", "error_id")
        .withColumn("bucket", F.explode(F.expr("sequence(ts_s DIV 60 - 1, ts_s DIV 60 + 1)")))
        .select("user_id", "error_id", F.col("ts_s").alias("err_ts"), "bucket")
    )
    b = e.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts_s").alias("pur_ts"),
        F.expr("ts_s DIV 60").alias("bucket"),
    )
    return (
        a.join(b, ["user_id", "bucket"])
        .where(F.abs(F.col("err_ts") - F.col("pur_ts")) <= 60)
        .select("user_id", "error_id", "purchase_id", (F.col("pur_ts") - F.col("err_ts")).alias("dt_s"))
        .distinct()
    )


def zscore_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-score of event values -- window mean/stddev, one
    shuffle. (tests/test_pandas_udf.py proves the applyInPandas grouped-map
    formulation returns the identical result.)"""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    mu = F.avg("value").over(w)
    sd = F.stddev_samp("value").over(w)
    return e.select(
        "user_id",
        "event_id",
        F.round((F.col("value") - mu) / F.nullif(sd, F.lit(0.0)), 4).alias(
            "zscore"
        ),
    )


QUERIES = {
    "set_ops": set_ops,
    "datetime_funcs": datetime_funcs,
    "null_semantics": null_semantics,
    "range_join_buckets": range_join_buckets,
    "zscore_window": zscore_window,
}

ORACLES = {
    "set_ops": """
        WITH a AS (SELECT c_custkey FROM customer WHERE c_custkey % 3 = 0),
             b AS (SELECT c_custkey FROM customer WHERE c_custkey % 5 = 0),
             tagged AS (
                 SELECT c_custkey, 'union' AS op FROM (
                     SELECT c_custkey FROM a UNION SELECT c_custkey FROM b)
                 UNION ALL
                 SELECT c_custkey, 'intersect' FROM (
                     SELECT c_custkey FROM a INTERSECT SELECT c_custkey FROM b)
                 UNION ALL
                 SELECT c_custkey, 'except' FROM (
                     SELECT c_custkey FROM a EXCEPT ALL SELECT c_custkey FROM b)
             )
        SELECT op, count(*) AS n, sum(c_custkey) AS key_sum
        FROM tagged GROUP BY op ORDER BY op
    """,
    "datetime_funcs": """
        SELECT o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS d,
               year(o_orderdate) AS y,
               quarter(o_orderdate) AS q,
               month(o_orderdate) AS m,
               dayofweek(o_orderdate) + 1 AS dow,
               dayofyear(o_orderdate) AS doy,
               strftime(o_orderdate::DATE + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
               strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
               datediff('day', o_orderdate::DATE, DATE '2002-01-01') AS days_to_2002
        FROM orders WHERE o_orderkey < 500
    """,
    "null_semantics": """
        WITH withnulls AS (
            SELECT c_mktsegment,
                   CASE WHEN c_custkey % 7 = 0 THEN NULL
                        ELSE c_acctbal END AS bal
            FROM customer
        )
        SELECT c_mktsegment,
               count(*) AS n_rows,
               count(bal) AS n_nonnull,
               round(sum(coalesce(bal, 0.0)), 2) AS sum_coalesced,
               round(avg(bal), 4) AS avg_ignoring_nulls,
               count(nullif(c_mktsegment, 'BUILDING')) AS n_not_building
        FROM withnulls GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    "range_join_buckets": """
        WITH e AS (SELECT user_id, event_id, event_type,
                          CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
                   FROM events)
        SELECT DISTINCT a.user_id,
               a.event_id AS error_id,
               b.event_id AS purchase_id,
               b.ts_s - a.ts_s AS dt_s
        FROM e a JOIN e b
          ON a.user_id = b.user_id
         AND a.event_type = 'error' AND b.event_type = 'purchase'
         AND abs(a.ts_s - b.ts_s) <= 60
    """,
    "zscore_window": """
        SELECT user_id, event_id,
               round((value - avg(value) OVER w)
                     / nullif(stddev_samp(value) OVER w, 0.0), 4) AS zscore
        FROM events
        WINDOW w AS (PARTITION BY user_id)
    """,
}
