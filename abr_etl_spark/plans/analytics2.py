"""Extended analytics coverage (SURVEY.md §2 B-block, part 2).

TPC-H-shaped patterns the first block doesn't cover: semi/anti joins and
EXISTS rewrites, scalar subqueries, disjunctive pushdown, distinct
aggregates, CUBE, group-by-HAVING, conditional aggregation, and
min-per-group via window -- each oracle-checked. Same conventions as
plans/analytics.py (aliased columns, rounded floats, deterministic
ordering on every LIMIT).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from abr_etl_spark.sources.lake import load_table


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: EXISTS semi-join -- orders with any lineitem shipped
    after the order date, counted by priority."""
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-07-01"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    late = l.join(o, l.l_orderkey == o.o_orderkey).where(
        F.col("l_shipdate") > F.col("o_orderdate")
    ).select("l_orderkey").distinct()
    return (
        o.join(late, o.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 shape: pure scan-filter-agg; everything pushes to the scan.

    The per-item revenue quantizes to exact 1e-4 units before the sum
    (profit_by_nation_year's device): round(sum(double), 2) diverged
    between the engines' float addition orders at sf1's ~9.5e8 revenue
    mass (r14 sf1 cert catch) -- integer e4 sums cannot."""
    l = load_table(spark, sf_dir, "lineitem")
    rev_e4 = F.floor(
        F.col("l_extendedprice") * F.col("l_discount") * 10000 + 0.5
    ).cast("long")
    return l.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
        & (F.col("l_discount") >= 0.02)
        & (F.col("l_discount") <= 0.09)
        & (F.col("l_quantity") < 24)
    ).agg(
        (F.sum(rev_e4) / 10000.0).alias("revenue"),
        F.count("*").alias("n_items"),
    )


def profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: multi-join profit rollup by supplier nation x order year.

    Narrow-before-shuffle (r15 verdict item 1): the broadcast dims and
    the per-item profit expression apply MAP-SIDE, so the one fact-fact
    shuffle (the plan's only exchange pair) carries just
    (l_orderkey, s_nationkey, profit_e4) ~20 B/row on the lineitem side
    and (o_orderkey, o_year) on the orders side -- the r15 plan shuffled
    FULL-width lineitem first and only then joined the dims, ~3x the
    shuffle bytes, which is exactly the spill constant the sf100 bench
    caught (87 s / 16.9x sf10->sf100). The 25-row nation dim joins
    AFTER the aggregate on ~|nations x years| rows.

    Quantize per ITEM to exact 1e-4 units (identical IEEE math in both
    engines, half-up handles negative item profit consistently) and sum
    integers: round(sum(double), 2) hash-failed at sf0.001 on a
    shortest-repr rounding tie -- integer sums cannot, and they make
    this reorder safe (integer addition is order-free; a double sum
    would re-round differently under the new partitioning)."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part")
    n = load_table(spark, sf_dir, "nation")
    profit_e4 = F.floor(
        (
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
            - F.col("l_quantity") * F.col("p_retailprice") * 0.1
        )
        * 10000
        + 0.5
    ).cast("long")
    fact = (
        l.join(
            broadcast(s.select("s_suppkey", "s_nationkey")),
            l.l_suppkey == F.col("s_suppkey"),
        )
        .join(
            broadcast(p.select("p_partkey", "p_retailprice")),
            l.l_partkey == F.col("p_partkey"),
        )
        .select(
            "l_orderkey", "s_nationkey", profit_e4.alias("profit_e4")
        )
    )
    # SHUFFLE_HASH on the narrow orders side: hashing the bounded
    # (o_orderkey, o_year) projection skips the O(n log n) sort of the
    # 4x-larger lineitem side that SMJ would pay; per-task build size
    # is |orders| * 12 B / shuffle_partitions -- sized by the standard
    # cluster knob. Measured at sf100: 42 s vs 55 s SMJ (BENCH_sf100).
    o_narrow = o.select(
        "o_orderkey", F.year("o_orderdate").alias("o_year")
    ).hint("shuffle_hash")
    return (
        fact.join(o_narrow, fact.l_orderkey == o_narrow.o_orderkey)
        .groupBy("s_nationkey", "o_year")
        .agg(F.sum("profit_e4").alias("__pe4"))
        .join(broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            "o_year",
            (F.col("__pe4") / 10000.0).alias("profit"),
        )
        .orderBy("nation", F.col("o_year").desc())
    )


def q12_shipping_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: conditional aggregation (CASE inside SUM)."""
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    o = load_table(spark, sf_dir, "orders")
    urgent = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
    ).otherwise(0)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(urgent).alias("high_line_count"),
            F.sum(1 - urgent).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: ratio of conditional to total aggregate."""
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-03-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        l.join(broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.round(100 * F.sum(promo) / F.sum(rev), 4).alias("promo_pct"),
            F.round(F.sum(rev), 2).alias("total_revenue"),
        )
    )


def q16_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: COUNT(DISTINCT) per group with an anti-ish filter."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_brand") != "Brand#1")
    return (
        l.join(broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type")
    )


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: group-by-HAVING on a join, deterministic top-N."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .where(F.col("sum_qty") > 150)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            F.round("sum_qty", 2).alias("sum_qty"),
        )
        .orderBy(F.col("totalprice").desc(), F.col("o_orderkey").asc())
        .limit(20)
    )


def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: OR-of-ANDs predicate across a join (tests disjunctive
    pushdown / CNF conversion)."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 10) & (F.col("l_quantity") < 20))
        | ((F.col("p_brand") == "Brand#9") & (F.col("p_size") <= 25) & (F.col("l_quantity") < 30))
        | ((F.col("p_type") == "PROMO") & (F.col("l_quantity") >= 40))
    )
    return (
        l.join(broadcast(p), l.l_partkey == p.p_partkey)
        .where(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: scalar subquery (global avg) + anti-join."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1999-01-01")
    )
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("ab")
    )
    rich = c.crossJoin(broadcast(avg_bal)).where(F.col("c_acctbal") > F.col("ab"))
    idle = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return (
        idle.groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


def min_price_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: min-per-group via window (no partsupp table -- use the
    observed min avg sell price per (part, supplier) from lineitem)."""
    l = load_table(spark, sf_dir, "lineitem")
    per_ps = (
        l.groupBy("l_partkey", "l_suppkey")
        .agg(F.round(F.avg("l_extendedprice"), 4).alias("avg_price"))
    )
    w = Window.partitionBy("l_partkey").orderBy(
        F.col("avg_price").asc(), F.col("l_suppkey").asc()
    )
    return (
        per_ps.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("l_partkey", "l_suppkey", "avg_price")
        .where(F.col("l_partkey") < 200)
    )


def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dims (grouping-sets machinery)."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
    )


def distinct_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-count per day (shuffle-heavy pattern; the approx
    variant is operators-only since HLL sketches differ across engines)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
        .groupBy("day")
        .agg(
            F.countDistinct("user_id").alias("distinct_users"),
            F.count("*").alias("n_events"),
        )
        .orderBy("day")
    )


def asof_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase event annotated with the user's most
    recent prior (or simultaneous) view event. Oracle = DuckDB's native
    ASOF JOIN -- a genuinely independent implementation of the semantics.
    """
    from abr_etl_spark.operators.asof import asof_join

    e = load_table(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = e.where(F.col("event_type") == "view").select(
        "user_id", "ts", "value", F.col("ts").alias("v_ts")
    )
    joined = asof_join(
        purchases, views, on="ts", by="user_id", value_cols=["value", "v_ts"]
    )
    return joined.select(
        "event_id",
        "user_id",
        F.round("value_asof", 4).alias("v_value"),
        (
            F.col("ts").cast("long") - F.col("v_ts_asof").cast("long")
        ).alias("gap_s"),
    )


def cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per day -- the classic OLAP trap where a
    naive COUNT(DISTINCT) OVER (ORDER BY day) either isn't supported or
    rescans history per day. The scalable identity: a user contributes
    exactly once, on their FIRST day -- so aggregate first-seen days
    (one shuffle on user_id), count per day, and prefix-sum the counts
    over the tiny per-day frame. State is O(days), never O(users x days).
    """
    e = load_table(spark, sf_dir, "events")
    first_seen = (
        e.withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
        .groupBy("user_id")
        .agg(F.min("day").alias("first_day"))
    )
    per_day = first_seen.groupBy(F.col("first_day").alias("day")).agg(
        F.count("*").alias("new_users")
    )
    # report every active day (0-filled), not just days with new users --
    # the day list is tiny, so the outer join is a broadcast.
    days = (
        e.select(F.date_format("ts", "yyyy-MM-dd").alias("day")).distinct()
    )
    # single-partition window is BOUNDED: input is one row per active
    # day (calendar-scale), never event-scale
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        days.join(per_day, "day", "left")
        .select(
            "day", F.coalesce("new_users", F.lit(0)).alias("new_users")
        )
        .select(
            "day",
            "new_users",
            F.sum("new_users").over(w).alias("cum_users"),
        )
        .orderBy("day")
    )


def asof_next_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: each purchase annotated with the user's next
    view event at-or-after it (the "what did they look at right after
    buying" lookup). Same union+window plan as the backward key with the
    time order reversed; oracle = DuckDB's native ASOF JOIN with the
    inequality flipped -- an independent implementation of the forward
    semantics."""
    from abr_etl_spark.operators.asof import asof_join

    e = load_table(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = e.where(F.col("event_type") == "view").select(
        "user_id", "ts", "value", F.col("ts").alias("v_ts")
    )
    joined = asof_join(
        purchases,
        views,
        on="ts",
        by="user_id",
        value_cols=["value", "v_ts"],
        direction="forward",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.round("value_asof", 4).alias("v_value"),
        (
            F.col("v_ts_asof").cast("long") - F.col("ts").cast("long")
        ).alias("gap_s"),
    )


def spark_sql_interface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's raw SQL surface: register the lake as views and run
    ANSI SQL through spark.sql (same text a Trino/Athena user would port)."""
    from abr_etl_spark.sources.lake import register_views

    register_views(spark, sf_dir)
    # Exact integer cents / 1e-4 units (no float rounding step): same
    # ANSI text shape a warehouse user would write, Spark `DIV` spelling.
    return spark.sql(
        """
        SELECT c_mktsegment,
               count(*) AS n_orders,
               sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) / 100.0D
                   AS revenue,
               ((2 * sum(CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT))
                 + count(*)) DIV (2 * count(*))) / 10000.0D AS avg_order
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY c_mktsegment
        ORDER BY revenue DESC, c_mktsegment
        """
    )


QUERIES = {
    "asof_purchase_view": asof_purchase_view,
    "asof_next_view": asof_next_view,
    "spark_sql_interface": spark_sql_interface,
    "q4_order_priority": q4_order_priority,
    "q6_forecast_revenue": q6_forecast_revenue,
    "profit_by_nation_year": profit_by_nation_year,
    "q12_shipping_buckets": q12_shipping_buckets,
    "q14_promo_revenue": q14_promo_revenue,
    "q16_supplier_diversity": q16_supplier_diversity,
    "q18_large_orders": q18_large_orders,
    "q19_disjunctive": q19_disjunctive,
    "q22_idle_customers": q22_idle_customers,
    "min_price_supplier_per_part": min_price_supplier_per_part,
    "cube_agg": cube_agg,
    "distinct_users_daily": distinct_users_daily,
    "cumulative_distinct_users": cumulative_distinct_users,
}

ORACLES = {
    "asof_purchase_view": """
        WITH p AS (SELECT event_id, user_id, ts FROM events
                   WHERE event_type = 'purchase'),
             v AS (SELECT user_id, ts, value FROM events
                   WHERE event_type = 'view')
        SELECT p.event_id, p.user_id,
               round(v.value, 4) AS v_value,
               CAST(floor(epoch(p.ts)) AS BIGINT)
                   - CAST(floor(epoch(v.ts)) AS BIGINT) AS gap_s
        FROM p ASOF LEFT JOIN v
          ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
    # Same first-seen identity, declaratively.
    "cumulative_distinct_users": """
        WITH fs AS (
            SELECT user_id, min(strftime(ts, '%Y-%m-%d')) AS day
            FROM events GROUP BY user_id
        ), pd AS (
            SELECT day, CAST(count(*) AS BIGINT) AS new_users
            FROM fs GROUP BY day
        ), days AS (
            SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS day FROM events
        ), filled AS (
            SELECT days.day,
                   CAST(coalesce(pd.new_users, 0) AS BIGINT) AS new_users
            FROM days LEFT JOIN pd ON days.day = pd.day
        )
        SELECT day, new_users,
               CAST(sum(new_users) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum_users
        FROM filled
    """,
    "asof_next_view": """
        WITH p AS (SELECT event_id, user_id, ts FROM events
                   WHERE event_type = 'purchase'),
             v AS (SELECT user_id, ts, value FROM events
                   WHERE event_type = 'view')
        SELECT p.event_id, p.user_id,
               round(v.value, 4) AS v_value,
               CAST(floor(epoch(v.ts)) AS BIGINT)
                   - CAST(floor(epoch(p.ts)) AS BIGINT) AS gap_s
        FROM p ASOF LEFT JOIN v
          ON p.user_id = v.user_id AND p.ts <= v.ts
    """,
    "spark_sql_interface": """
        SELECT c_mktsegment,
               count(*) AS n_orders,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) / 100.0 AS revenue,
               ((2 * CAST(sum(CAST(floor(o_totalprice * 10000 + 0.5)
                                   AS BIGINT)) AS BIGINT)
                 + count(*)) // (2 * count(*))) / 10000.0 AS avg_order
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY c_mktsegment
        ORDER BY revenue DESC, c_mktsegment
    """,
    "q4_order_priority": """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "q6_forecast_revenue": """
        SELECT CAST(sum(CAST(floor(l_extendedprice * l_discount
                                   * 10000 + 0.5) AS BIGINT))
                    AS BIGINT) / 10000.0 AS revenue,
               count(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.02 AND 0.09
          AND l_quantity < 24
    """,
    "profit_by_nation_year": """
        SELECT n_name AS nation,
               CAST(year(o_orderdate) AS INTEGER) AS o_year,
               CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount)
                              - l_quantity * p_retailprice * 0.1)
                             * 10000 + 0.5) AS BIGINT)) AS BIGINT)
                   / 10000.0 AS profit
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN part ON l_partkey = p_partkey
        JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name, year(o_orderdate)
        ORDER BY nation, o_year DESC
    """,
    "q12_shipping_buckets": """
        SELECT l_returnflag,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    "q14_promo_revenue": """
        SELECT round(100 * sum(CASE WHEN p_type = 'PROMO'
                                    THEN l_extendedprice * (1 - l_discount)
                                    ELSE 0.0 END)
                     / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
    """,
    "q16_supplier_diversity": """
        SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1'
        GROUP BY p_brand, p_type
        ORDER BY supplier_cnt DESC, p_brand, p_type
    """,
    "q18_large_orders": """
        SELECT c_custkey, c_name, o_orderkey,
               round(o_totalprice, 2) AS totalprice,
               round(sum_qty, 2) AS sum_qty
        FROM (SELECT l_orderkey, sum(l_quantity) AS sum_qty
              FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150) big
        JOIN orders ON big.l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY totalprice DESC, o_orderkey ASC
        LIMIT 20
    """,
    "q19_disjunctive": """
        SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               count(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size <= 10 AND l_quantity < 20)
           OR (p_brand = 'Brand#9' AND p_size <= 25 AND l_quantity < 30)
           OR (p_type = 'PROMO' AND l_quantity >= 40)
    """,
    "q22_idle_customers": """
        SELECT c_nationkey, count(*) AS numcust,
               round(sum(c_acctbal), 2) AS totacctbal
        FROM customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                           WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
        GROUP BY c_nationkey
        ORDER BY c_nationkey
    """,
    "min_price_supplier_per_part": """
        SELECT l_partkey, l_suppkey, avg_price FROM (
            SELECT l_partkey, l_suppkey,
                   round(avg(l_extendedprice), 4) AS avg_price,
                   row_number() OVER (
                       PARTITION BY l_partkey
                       ORDER BY round(avg(l_extendedprice), 4) ASC,
                                l_suppkey ASC) AS rn
            FROM lineitem
            GROUP BY l_partkey, l_suppkey
        ) WHERE rn = 1 AND l_partkey < 200
    """,
    "cube_agg": """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders,
               round(avg(o_totalprice), 4) AS avg_price
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    "distinct_users_daily": """
        SELECT strftime(ts, '%Y-%m-%d') AS day,
               count(DISTINCT user_id) AS distinct_users,
               count(*) AS n_events
        FROM events
        GROUP BY 1
        ORDER BY 1
    """,
}
