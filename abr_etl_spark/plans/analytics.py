"""Analytics query plans (SURVEY.md §2 B-block).

Each query is a function ``(spark, sf_dir) -> DataFrame`` built on the
DataFrame API (declarative: Catalyst handles pushdown/pruning/join
reordering), with its DuckDB oracle SQL in ``ORACLES`` under the same key.

Conventions shared with the oracles (driver hash-compares values):
- every aggregate/computed column is aliased identically on both sides;
- float aggregates are rounded (2dp money, 4-6dp ratios) so the
  cross-engine hash is stable under summation-order differences;
- every top-N has a fully deterministic ORDER BY (rounded measure + key);
- date/timestamp outputs are formatted to strings.

Scale notes are per-query docstrings; plan-shape assertions live in
tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from abr_etl_spark.sources.lake import load_table


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped scan+aggregate (flagship).

    Single scan of lineitem, filter pushed to parquet, one shuffle for the
    final agg after map-side partial aggregation; the whole expression tree
    stays in whole-stage codegen. At 100 TB this is scan-bound -- exactly
    what you want.

    Every measure quantizes per item to exact 1e-4 units BEFORE the sum
    (q6_forecast_revenue's r14 device, extended to q1 by the r15 sf100
    cert catch: round(sum(double), 2) diverged between the engines'
    float addition orders at the fifth decade's ~1e8-rows-per-group
    mass). The per-item product expression order is pinned and shared
    with the oracle, so both engines quantize the SAME double; sums are
    then exact BIGINTs, and the averages are integer half-up rationals
    ((2*sum + n) DIV (2n)) presented by one final division. Overflow
    headroom (ANSI raises loudly, never wraps): the e4 sums hold to
    ~sf10000, but the half-up numerator DOUBLES the sum, so the
    binding bound is ~sf5000 -- past that, move the averages to
    DECIMAL(38,0) arithmetic (r15 ADVICE)."""
    l = load_table(spark, sf_dir, "lineitem")

    def e4(col: F.Column) -> F.Column:
        return F.floor(col * 10000 + 0.5).cast("long")

    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    raw = (
        l.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(e4(F.col("l_quantity"))).alias("__q"),
            F.sum(e4(F.col("l_extendedprice"))).alias("__p"),
            F.sum(e4(disc_price)).alias("__dp"),
            F.sum(e4(charge)).alias("__ch"),
            F.sum(e4(F.col("l_discount"))).alias("__d"),
            F.count("*").alias("count_order"),
        )
    )
    half_up = "((2 * {num} + count_order) DIV (2 * count_order))"
    return (
        raw.select(
            "l_returnflag",
            "l_linestatus",
            (F.col("__q") / 10000.0).alias("sum_qty"),
            (F.col("__p") / 10000.0).alias("sum_base_price"),
            (F.col("__dp") / 10000.0).alias("sum_disc_price"),
            (F.col("__ch") / 10000.0).alias("sum_charge"),
            (
                F.expr(half_up.format(num="__q")) / 10000.0
            ).alias("avg_qty"),
            (
                F.expr(half_up.format(num="__p")) / 10000.0
            ).alias("avg_price"),
            (
                F.expr(half_up.format(num="__d")) / 10000.0
            ).alias("avg_disc"),
            "count_order",
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3-shaped: filtered 3-way join, grouped revenue, deterministic top-10.

    customer is small relative to the facts -> broadcast; orders⋈lineitem
    shuffles on orderkey (AQE-coalesced)."""
    c = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15")
    )
    l = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5-shaped 6-way join; all dims broadcast, facts shuffle once.

    Narrow-before-shuffle (r15 verdict item 1, with
    profit_by_nation_year): the ASIA region filter reaches lineitem
    MAP-SIDE through the broadcast of the region-filtered supplier dim
    -- only ~1/|regions| of lineitem rows enter the fact-fact shuffle,
    and they enter as (l_orderkey, s_nationkey, rev) instead of full
    width; the orders side ships (o_orderkey, c_nationkey) with the
    date filter pushed to its scan. The r15 plan shuffled ALL of
    lineitem full-width first and only then applied the dims -- ~5x
    the shuffle rows, the 11.7x sf10->sf100 spill driver."""
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    n_asia = n.join(broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name"
    )
    s_asia = s.join(
        broadcast(n_asia), s.s_nationkey == F.col("n_nationkey")
    ).select("s_suppkey", "s_nationkey")
    # e4-quantized per-item revenue (q6/profit's device, CATALOG.md
    # "Numeric semantics"): integer sums are addition-order-free, so
    # the narrowed plan's different partitioning cannot re-round
    # differently from the oracle -- round(sum(double), 2) DID diverge
    # at sf1 under this reorder.
    rev_e4 = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000 + 0.5
    ).cast("long")
    fact = l.join(
        broadcast(s_asia), l.l_suppkey == F.col("s_suppkey")
    ).select("l_orderkey", "s_nationkey", rev_e4.alias("rev_e4"))
    # SHUFFLE_HASH on the narrow (date-filtered) orders side -- the
    # same device as profit_by_nation_year: hash the small projection,
    # skip sorting the larger fact side.
    o_narrow = o.join(
        broadcast(c.select("c_custkey", "c_nationkey")),
        o.o_custkey == F.col("c_custkey"),
    ).select("o_orderkey", "c_nationkey").hint("shuffle_hash")
    return (
        fact.join(o_narrow, fact.l_orderkey == o_narrow.o_orderkey)
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .groupBy("s_nationkey")
        .agg((F.sum("rev_e4") / 10000.0).alias("revenue"))
        .join(broadcast(n_asia), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("n_name", "revenue")
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10-shaped: returned-item revenue per customer, deterministic top-20."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-10-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.round(F.max("c_acctbal"), 2).alias("acctbal"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


def top_n_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by price per customer: single shuffle on the window key."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            "rank",
        )
    )


def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running sum + 5-row moving average over event time."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    return e.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w), 4).alias("running_sum"),
        F.round(F.avg("value").over(w.rowsBetween(-4, 0)), 4).alias("moving_avg5"),
    )


def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-level ROLLUP aggregate on orders (status, priority).

    The price sums quantize per order to exact 1e-4 units first (the
    q1/q6 device): the rollup's GRAND-TOTAL row accumulates the whole
    corpus into ONE float sum, which diverged between the engines'
    addition orders at sf100's 1.5e8 orders (r15 fifth-decade cert
    catch); e4 BIGINT sums cannot (ANSI raises on int64 overflow,
    headroom ~sf10000)."""
    o = load_table(spark, sf_dir, "orders")
    price_e4 = F.floor(
        F.col("o_totalprice") * 10000 + 0.5
    ).cast("long")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            (F.sum(price_e4) / 10000.0).alias("sum_price"),
        )
    )


def pivot_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """event_type × day-of-month counts; explicit pivot values keep the
    plan single-pass (no extra distinct job to discover columns)."""
    e = load_table(spark, sf_dir, "events")
    types = ["click", "view", "purchase", "signup", "error"]
    return (
        e.withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
        .groupBy("day")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
    )


def percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles of account balance per segment."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.round(F.percentile("c_acctbal", 0.25), 4).alias("p25"),
            F.round(F.percentile("c_acctbal", 0.5), 4).alias("p50"),
            F.round(F.percentile("c_acctbal", 0.75), 4).alias("p75"),
            F.count("*").alias("n"),
        )
    )


def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) of the events stream.

    lag -> gap flag -> cumulative sum = session id; both windows share the
    same (user_id, ts) partitioning so Catalyst plans ONE Exchange+Sort.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    gap = (
        F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    )
    with_session = e.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1800), F.lit(1)).otherwise(F.lit(0)),
    ).withColumn("session_id", F.sum("new_session").over(w))
    return (
        with_session.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            (F.max(F.col("ts").cast("long")) - F.min(F.col("ts").cast("long"))).alias(
                "duration_s"
            ),
            F.round(F.sum("value"), 4).alias("session_value"),
        )
    )


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier": q5_local_supplier,
    "q10_returned_items": q10_returned_items,
    "top_n_per_group": top_n_per_group,
    "window_running": window_running,
    "rollup_agg": rollup_agg,
    "pivot_table": pivot_table,
    "percentiles": percentiles,
    "sessionize": sessionize,
}

ORACLES = {
    # per-item e4 quantization before every sum (pinned product order
    # shared with the Spark plan); averages are integer half-up
    # rationals -- the float-addition-order divergence the r15 sf100
    # cert caught cannot reappear at any scale.
    "q1_pricing_summary": """
        WITH raw AS (
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(floor(l_quantity * 10000 + 0.5)
                                 AS BIGINT)) AS BIGINT) AS __q,
                   CAST(sum(CAST(floor(l_extendedprice * 10000 + 0.5)
                                 AS BIGINT)) AS BIGINT) AS __p,
                   CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                                       * 10000 + 0.5)
                                 AS BIGINT)) AS BIGINT) AS __dp,
                   CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                                       * (1 + l_tax) * 10000 + 0.5)
                                 AS BIGINT)) AS BIGINT) AS __ch,
                   CAST(sum(CAST(floor(l_discount * 10000 + 0.5)
                                 AS BIGINT)) AS BIGINT) AS __d,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        )
        SELECT l_returnflag, l_linestatus,
               __q / 10000.0 AS sum_qty,
               __p / 10000.0 AS sum_base_price,
               __dp / 10000.0 AS sum_disc_price,
               __ch / 10000.0 AS sum_charge,
               ((2 * __q + count_order) // (2 * count_order))
                   / 10000.0 AS avg_qty,
               ((2 * __p + count_order) // (2 * count_order))
                   / 10000.0 AS avg_price,
               ((2 * __d + count_order) // (2 * count_order))
                   / 10000.0 AS avg_disc,
               count_order
        FROM raw
        ORDER BY l_returnflag, l_linestatus
    """,
    "q3_shipping_priority": """
        SELECT l_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
               o_orderpriority,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey ASC
        LIMIT 10
    """,
    "q5_local_supplier": """
        SELECT n_name,
               sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000
                              + 0.5) AS BIGINT)) / 10000.0 AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND c_nationkey = s_nationkey
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name ASC
    """,
    "q10_returned_items": """
        SELECT c_custkey, c_name, n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               round(max(c_acctbal), 2) AS acctbal
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 20
    """,
    "top_n_per_group": """
        SELECT o_custkey, o_orderkey,
               round(o_totalprice, 2) AS totalprice,
               CAST(rank AS INTEGER) AS rank
        FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey ASC
                   ) AS rank
            FROM orders
        )
        WHERE rank <= 3
    """,
    "window_running": """
        SELECT user_id, event_id,
               round(sum(value) OVER w, 4) AS running_sum,
               round(avg(value) OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4) AS moving_avg5
        FROM events
        WINDOW w AS (
            PARTITION BY user_id ORDER BY ts ASC, event_id ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    "rollup_agg": """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders,
               CAST(sum(CAST(floor(o_totalprice * 10000 + 0.5)
                             AS BIGINT)) AS BIGINT)
                   / 10000.0 AS sum_price
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    "pivot_table": """
        SELECT strftime(ts, '%Y-%m-%d') AS day,
               count(*) FILTER (WHERE event_type = 'click') AS click,
               count(*) FILTER (WHERE event_type = 'view') AS view,
               count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
               count(*) FILTER (WHERE event_type = 'signup') AS signup,
               count(*) FILTER (WHERE event_type = 'error') AS error
        FROM events
        GROUP BY 1
    """,
    "percentiles": """
        SELECT c_mktsegment,
               round(quantile_cont(c_acctbal, 0.25), 4) AS p25,
               round(quantile_cont(c_acctbal, 0.5), 4) AS p50,
               round(quantile_cont(c_acctbal, 0.75), 4) AS p75,
               count(*) AS n
        FROM customer
        GROUP BY c_mktsegment
    """,
    "sessionize": """
        WITH base AS (
            SELECT user_id, ts, event_id, value,
                   CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
            FROM events
        ), flagged AS (
            SELECT user_id, ts, event_id, value, ts_s,
                   CASE WHEN lag(ts_s) OVER w IS NULL
                             OR ts_s - lag(ts_s) OVER w > 1800
                        THEN 1 ELSE 0 END AS new_session
            FROM base
            WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        ), sessions AS (
            SELECT user_id, ts, event_id, value, ts_s,
                   CAST(sum(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS session_id
            FROM flagged
        )
        SELECT user_id, session_id,
               count(*) AS n_events,
               max(ts_s) - min(ts_s) AS duration_s,
               round(sum(value), 4) AS session_value
        FROM sessions
        GROUP BY user_id, session_id
    """,
}
