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
from pyspark.sql.functions import broadcast

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
    """Events-near-events range join (purchases within 30 min of a view by
    the same user): bucket by 30-minute slot, equi-join on (user,
    bucket±1), exact |Δt| filter after. The candidate space is
    CO-BUCKETED pairs, not the n^2 cross product.
    """
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.col("ts").cast("long").alias("ts_s")
    )
    a = (
        e.where(F.col("event_type") == "view")
        .withColumnRenamed("event_id", "view_id")
        .withColumn(
            "bucket",
            F.explode(F.expr("sequence(ts_s DIV 1800 - 1, ts_s DIV 1800 + 1)")),
        )
        .select("user_id", "view_id", F.col("ts_s").alias("view_ts"), "bucket")
    )
    b = e.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts_s").alias("pur_ts"),
        F.expr("ts_s DIV 1800").alias("bucket"),
    )
    return (
        a.join(b, ["user_id", "bucket"])
        .where(F.abs(F.col("view_ts") - F.col("pur_ts")) <= 1800)
        .select(
            "user_id",
            "view_id",
            "purchase_id",
            (F.col("pur_ts") - F.col("view_ts")).alias("dt_s"),
        )
        .distinct()
    )


def zscore_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-score of event values. (tests/test_pandas_udf.py
    proves the applyInPandas grouped-map formulation returns the
    identical result.)

    Mean and sample stddev come from PINNED sorted folds (sum the
    value-sorted list sequentially; then fold (x - mu)^2 over the same
    order), not engine-native avg/stddev_samp: the native window aggs
    diverged from DuckDB in the last ulp at sf0.1 partition sizes
    (~670 events/user) and one row crossed the round-4 boundary --
    the r11 full-sf0.1 certification caught it. sqrt is IEEE-correct,
    so sd = sqrt(ssd / (n-1)) replays exactly. The per-user stats
    frame (|users| rows) broadcast-joins back to the events scan --
    one hash agg + one broadcast join, no window sort. Bounded-list
    note: the fold materializes one user's values (fine for any
    plausible per-user cardinality; a user with billions of rows
    would need the engine-native aggregate and a documented parity
    waiver)."""
    e = load_table(spark, sf_dir, "events")
    stats = (
        e.groupBy("user_id")
        .agg(
            F.expr(
                "array_sort(collect_list(cast(value as double)))"
            ).alias("sv")
        )
        .select(
            "user_id",
            F.size("sv").alias("__n"),
            # nullif guards the all-NULL-payload lake: collect_list
            # drops NULLs, so a user with only NULL values folds an
            # EMPTY list and the plain division raises under ANSI
            # (caught by tests/test_degenerate_lakes.py); NULL mu
            # propagates to a NULL zscore instead.
            (
                F.expr("aggregate(sv, 0.0D, (s, v) -> s + v)")
                / F.nullif(F.size("sv"), F.lit(0))
            ).alias("mu"),
            "sv",
        )
        .select(
            "user_id",
            "__n",
            "mu",
            F.expr(
                "aggregate(transform(sv, x -> (x - mu) * (x - mu)), "
                "0.0D, (s, v) -> s + v)"
            ).alias("__ssd"),
        )
        .select(
            "user_id",
            "mu",
            F.when(
                F.col("__n") > 1,
                F.sqrt(F.col("__ssd") / (F.col("__n") - 1)),
            ).alias("sd"),
        )
    )
    return e.join(F.broadcast(stats), "user_id").select(
        "user_id",
        "event_id",
        F.round(
            (F.col("value") - F.col("mu"))
            / F.nullif(F.col("sd"), F.lit(0.0)),
            4,
        ).alias("zscore"),
    )


def fuzzy_match_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution with blocking -- the ABR use case (matching noisy
    business names against the register). Probes are customer names with
    one character deleted; candidates share a SUFFIX block (the last 6
    characters -- the discriminative end of a register key), the exact
    levenshtein predicate runs only within blocks, and each probe keeps
    its best match (min distance, min key).

    Blocking key choice IS the scale contract: the original 8-char
    PREFIX block degenerated on this registry because every name opens
    with the same constant token ('Customer#...'), collapsing the
    blocked join into ONE names-x-names block -- ~1e11 levenshtein
    pairs in a single task at sf1, caught by the r14 sf1 cert. The
    suffix block distributes over the key's numeric tail (cardinality
    ~|names|), keeps the candidate space near-linear, and still
    contains every true match: the probe's deletion happens before the
    tail, so probe and original share their last 6 characters."""
    c = load_table(spark, sf_dir, "customer")
    probes = c.where(F.col("c_custkey") % 20 == 0).select(
        F.col("c_custkey").alias("probe_key"),
        F.concat(
            F.substring("c_name", 1, 9), F.substring("c_name", 11, 100)
        ).alias("probe_name"),
    ).withColumn("block", F.expr("right(probe_name, 6)"))
    cands = c.select(
        F.col("c_custkey").alias("cand_key"),
        F.col("c_name").alias("cand_name"),
        F.expr("right(c_name, 6)").alias("block"),
    )
    scored = (
        probes.join(cands, "block")
        .withColumn("dist", F.levenshtein("probe_name", "cand_name"))
        .where(F.col("dist") <= 2)
    )
    w = Window.partitionBy("probe_key").orderBy(
        F.col("dist").asc(), F.col("cand_key").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("probe_key", "cand_key", "dist")
    )


def outlier_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IQR-rule outlier flagging per segment (the standard curation step
    before training-data aggregation): bounds from exact quantiles, one
    extra broadcast join, outlier counts out."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = o.join(broadcast(c), o.o_custkey == c.c_custkey)
    bounds = j.groupBy("c_mktsegment").agg(
        F.percentile("o_totalprice", 0.25).alias("q1"),
        F.percentile("o_totalprice", 0.75).alias("q3"),
    )
    flagged = j.join(broadcast(bounds), "c_mktsegment").withColumn(
        "is_outlier",
        (
            (F.col("o_totalprice") < F.col("q1") - 1.5 * (F.col("q3") - F.col("q1")))
            | (F.col("o_totalprice") > F.col("q3") + 1.5 * (F.col("q3") - F.col("q1")))
        ).cast("int"),
    )
    return (
        flagged.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            F.sum("is_outlier").alias("n_outliers"),
            F.round(F.max("q3"), 4).alias("q3"),
        )
        .orderBy("c_mktsegment")
    )


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity day,
    counted per subsequent activity day -- two aggregations sharing the
    user_id shuffle, the canonical product-analytics query."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.date_format("ts", "yyyy-MM-dd").alias("day")
    )
    first = e.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        e.join(first, "user_id")
        .groupBy("cohort_day", "day")
        .agg(F.countDistinct("user_id").alias("active_users"))
        .where(F.col("day") >= F.col("cohort_day"))
    )


def ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC (open/high/low/close) hourly bars over event values -- the
    time-series compaction operator. open/close via min_by/max_by on the
    (ts, event_id) tuple (deterministic under ties), high/low plain
    min/max; single groupBy."""
    e = load_table(spark, sf_dir, "events")
    hour = F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss")
    # packed BIGINT ordering key (micros * 1024 + id mod 1024): DuckDB's
    # arg_min can't order by struct; micro-ts collisions with equal id
    # residues don't occur in event streams at this precision
    ordkey = F.unix_micros("ts") * 1024 + F.col("event_id") % 1024
    return (
        e.select(
            hour.alias("bar"), "event_id", "value", ordkey.alias("ord")
        )
        .groupBy("bar")
        .agg(
            F.round(F.min_by("value", F.col("ord")), 4).alias("open"),
            F.round(F.max("value"), 4).alias("high"),
            F.round(F.min("value"), 4).alias("low"),
            F.round(F.max_by("value", F.col("ord")), 4).alias("close"),
            F.count("*").alias("n_ticks"),
        )
    )


def funnel_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users whose first view precedes their first click
    precedes their first purchase. One conditional aggregation per user,
    then a global rollup -- no self-joins."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    return firsts.agg(
        F.count("*").alias("n_users"),
        F.sum(F.col("t_view").isNotNull().cast("long")).alias("step_view"),
        F.sum(
            (F.col("t_view") < F.col("t_click")).cast("long")
        ).alias("step_click_after_view"),
        F.sum(
            (
                (F.col("t_view") < F.col("t_click"))
                & (F.col("t_click") < F.col("t_purchase"))
            ).cast("long")
        ).alias("step_full_funnel"),
    )


QUERIES = {
    "ohlc_bars": ohlc_bars,
    "funnel_counts": funnel_counts,
    "cohort_retention": cohort_retention,
    "fuzzy_match_blocked": fuzzy_match_blocked,
    "outlier_filter": outlier_filter,
    "set_ops": set_ops,
    "datetime_funcs": datetime_funcs,
    "null_semantics": null_semantics,
    "range_join_buckets": range_join_buckets,
    "zscore_window": zscore_window,
}

ORACLES = {
    "ohlc_bars": """
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bar,
               round(arg_min(value, epoch_us(ts) * 1024 + event_id % 1024), 4) AS open,
               round(max(value), 4) AS high,
               round(min(value), 4) AS low,
               round(arg_max(value, epoch_us(ts) * 1024 + event_id % 1024), 4) AS close,
               count(*) AS n_ticks
        FROM events
        GROUP BY 1
    """,
    "funnel_counts": """
        WITH firsts AS (
            SELECT user_id,
                   min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
                   min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
                   min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
            FROM events GROUP BY user_id
        )
        SELECT count(*) AS n_users,
               CAST(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS step_view,
               CAST(sum(CASE WHEN t_view < t_click THEN 1 ELSE 0 END)
                    AS BIGINT) AS step_click_after_view,
               CAST(sum(CASE WHEN t_view < t_click AND t_click < t_purchase
                        THEN 1 ELSE 0 END) AS BIGINT) AS step_full_funnel
        FROM firsts
    """,
    "cohort_retention": """
        WITH e AS (
            SELECT user_id, strftime(ts, '%Y-%m-%d') AS day FROM events
        ), first AS (
            SELECT user_id, min(day) AS cohort_day FROM e GROUP BY user_id
        )
        SELECT cohort_day, day, count(DISTINCT user_id) AS active_users
        FROM e JOIN first USING (user_id)
        WHERE day >= cohort_day
        GROUP BY cohort_day, day
    """,
    "fuzzy_match_blocked": """
        WITH probes AS (
            SELECT c_custkey AS probe_key,
                   substr(c_name, 1, 9) || substr(c_name, 11) AS probe_name,
                   right(substr(c_name, 1, 9) || substr(c_name, 11), 6)
                       AS block
            FROM customer WHERE c_custkey % 20 = 0
        ), cands AS (
            SELECT c_custkey AS cand_key, c_name AS cand_name,
                   right(c_name, 6) AS block
            FROM customer
        ), scored AS (
            SELECT probe_key, cand_key,
                   CAST(levenshtein(probe_name, cand_name) AS INTEGER) AS dist
            FROM probes JOIN cands USING (block)
            WHERE levenshtein(probe_name, cand_name) <= 2
        )
        SELECT probe_key, cand_key, dist FROM (
            SELECT *, row_number() OVER (
                PARTITION BY probe_key ORDER BY dist ASC, cand_key ASC) AS rn
            FROM scored
        ) WHERE rn = 1
    """,
    "outlier_filter": """
        WITH j AS (
            SELECT o_totalprice, c_mktsegment
            FROM orders JOIN customer ON o_custkey = c_custkey
        ), bounds AS (
            SELECT c_mktsegment,
                   quantile_cont(o_totalprice, 0.25) AS q1,
                   quantile_cont(o_totalprice, 0.75) AS q3
            FROM j GROUP BY c_mktsegment
        )
        SELECT c_mktsegment,
               count(*) AS n,
               CAST(sum(CASE WHEN o_totalprice < q1 - 1.5 * (q3 - q1)
                          OR o_totalprice > q3 + 1.5 * (q3 - q1)
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
               round(max(q3), 4) AS q3
        FROM j JOIN bounds USING (c_mktsegment)
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
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
        SELECT op, count(*) AS n, CAST(sum(c_custkey) AS BIGINT) AS key_sum
        FROM tagged GROUP BY op ORDER BY op
    """,
    "datetime_funcs": """
        SELECT o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS d,
               CAST(year(o_orderdate) AS INTEGER) AS y,
               CAST(quarter(o_orderdate) AS INTEGER) AS q,
               CAST(month(o_orderdate) AS INTEGER) AS m,
               CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
               CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
               strftime(o_orderdate::DATE + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
               strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
               CAST(datediff('day', o_orderdate::DATE, DATE '2002-01-01') AS INTEGER) AS days_to_2002
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
               a.event_id AS view_id,
               b.event_id AS purchase_id,
               b.ts_s - a.ts_s AS dt_s
        FROM e a JOIN e b
          ON a.user_id = b.user_id
         AND a.event_type = 'view' AND b.event_type = 'purchase'
         AND abs(a.ts_s - b.ts_s) <= 1800
    """,
    # Pinned sorted-fold mean/stddev (see zscore_window docstring):
    # identical fold order to the Spark side, so sf0.1 partition sizes
    # cannot diverge in the last ulp.
    "zscore_window": """
        WITH sv AS (
            SELECT user_id, list_sort(list(value::DOUBLE)) AS sv
            FROM events GROUP BY user_id
        ), st AS (
            SELECT user_id, sv, len(sv) AS n,
                   list_reduce(list_prepend(0.0::DOUBLE, sv),
                               (s, v) -> s + v) / len(sv) AS mu
            FROM sv
        ), st2 AS (
            SELECT user_id, mu,
                   CASE WHEN n > 1 THEN sqrt(
                       list_reduce(list_prepend(0.0::DOUBLE,
                           list_transform(sv, x -> (x - mu) * (x - mu))),
                           (s, v) -> s + v) / (n - 1))
                   END AS sd
            FROM st
        )
        SELECT e.user_id, e.event_id,
               round((e.value - st2.mu) / nullif(st2.sd, 0.0), 4) + 0.0
                   AS zscore
        FROM events e JOIN st2 USING (user_id)
    """,
    # ^ the trailing + 0.0 normalizes IEEE negative zero: DuckDB's
    # round() keeps -0.0 where Spark's returns +0.0 (3 rows at sf0.1);
    # x + 0.0 is the identity for every other double.
}


def datetime_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second datetime battery -- the calendar surface part 1 skips:
    last_day, add_months (end-of-month clamping semantics, identical in
    both engines), make_date round-trip from extracted parts, ISO week
    number, and an integer month-distance (year*12+month arithmetic --
    months_between is FRACTIONAL and float-hazardous, so the exact
    integer form is the cross-engine one). Map-only, full pushdown."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 500)
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.add_months(d, 2), "yyyy-MM-dd").alias("plus2m"),
        F.date_format(
            F.make_date(F.year(d), F.month(d), F.lit(1)), "yyyy-MM-dd"
        ).alias("rebuilt_month_start"),
        F.weekofyear(d).alias("iso_week"),
        (
            (F.year(d) * 12 + F.month(d)) - (2000 * 12 + 1)
        ).alias("months_since_2000"),
    )


QUERIES["datetime_funcs2"] = datetime_funcs2
ORACLES["datetime_funcs2"] = """
    SELECT o_orderkey,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d')
               AS month_end,
           strftime(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH,
                    '%Y-%m-%d') AS plus2m,
           strftime(make_date(CAST(year(o_orderdate) AS INTEGER),
                              CAST(month(o_orderdate) AS INTEGER), 1),
                    '%Y-%m-%d') AS rebuilt_month_start,
           CAST(week(CAST(o_orderdate AS DATE)) AS INTEGER) AS iso_week,
           CAST((year(o_orderdate) * 12 + month(o_orderdate))
                - (2000 * 12 + 1) AS INTEGER) AS months_since_2000
    FROM orders WHERE o_orderkey < 500
"""
