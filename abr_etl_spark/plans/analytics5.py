"""Coverage part 5 (round 2): time-series gap fill, correlated
subqueries, and a driver-checked skew-salted join.

- ``gap_fill_ffill``: the hypertable staple -- dense per-user daily
  spine (date sequence x users), zero-filled counts, forward-filled
  last observed daily average. Averages ride exact 1e-4 integer units
  so both engines agree bit-for-bit.
- ``correlated_subqueries``: scalar-correlated + EXISTS + NOT EXISTS in
  one query through spark.sql -- Catalyst decorrelates these into
  aggregate-join / semi-join / anti-join (no per-row subquery
  execution, which is what makes the shape survive 100 TB).
- ``salted_join_revenue``: the skew-proof salted equi-join
  (operators/joins.salted_join) feeding an aggregate; the oracle is the
  PLAIN join, proving salting never changes results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from abr_etl_spark.operators.joins import salted_join
from abr_etl_spark.sources.lake import load_table

GAP_FILL_USERS = 15  # spine user cap keeps driver output ~users x days


def gap_fill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense daily spine per user: zero-fill missing days' counts,
    forward-fill the last observed daily average value.

    The spine is (distinct users) x (global date sequence) -- at scale
    both sides of that cross join are tiny relative to the fact table
    (users x days rows), and the single shuffle is the left join back
    onto the daily aggregate. Leading days before a user's first event
    keep a NULL average (nothing to fill from).
    """
    ev = load_table(spark, sf_dir, "events").where(
        F.col("user_id") < GAP_FILL_USERS
    )
    daily = (
        ev.groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.floor(F.col("value") * 10000 + 0.5).cast("long")).alias(
                "__s"
            ),
        )
        .withColumn("day_avg_e4", F.expr("(2 * __s + n) DIV (2 * n)"))
    )
    bounds = ev.agg(
        F.min(F.to_date("ts")).alias("lo"), F.max(F.to_date("ts")).alias("hi")
    )
    spine = (
        ev.select("user_id")
        .distinct()
        .crossJoin(broadcast(bounds))
        .select(
            "user_id",
            F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("day"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        spine.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("n", F.lit(0)).cast("long").alias("n_events"),
            (F.last("day_avg_e4", ignorenulls=True).over(w) / 10000.0).alias(
                "ffill_avg"
            ),
        )
    )


def correlated_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers above their nation's average balance, with at least one
    finished order and no urgent ones -- scalar-correlated subquery +
    EXISTS + NOT EXISTS, decorrelated by Catalyst into joins."""
    from abr_etl_spark.sources.lake import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name,
               CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT) AS acctbal_cents
        FROM customer c
        WHERE c.c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                             WHERE c2.c_nationkey = c.c_nationkey)
          AND EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderstatus = 'F')
          AND NOT EXISTS (SELECT 1 FROM orders o2
                          WHERE o2.o_custkey = c.c_custkey
                            AND o2.o_orderpriority = '1-URGENT')
        """
    )


def salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per market segment through the skew-salted join: the salt
    fans each (possibly hot) customer key across 16 reducers, and the
    aggregate collapses it -- results provably identical to the plain
    join (that IS the oracle)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    joined = salted_join(o, c, "o_custkey", salt=16)
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
            ).alias("revenue_cents"),
        )
    )


def grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (finer than rollup/cube: an arbitrary set
    list) with grouping() flags to disambiguate the NULL dimension."""
    from abr_etl_spark.sources.lake import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus,
               CAST(grouping(o_orderpriority) AS INT) AS g_prio,
               CAST(grouping(o_orderstatus) AS INT) AS g_status,
               count(*) AS n,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS revenue_cents
        FROM orders
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        """
    )


def unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long melt via stack() -- the declarative unpivot (one
    map-side projection, no shuffle); oracle is the UNION ALL spelling."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") <= 100)
    return c.select(
        "c_custkey",
        F.expr(
            "stack(2, 'acctbal', c_acctbal, "
            "'nationkey', CAST(c_nationkey AS DOUBLE)) AS (metric, value)"
        ),
    )


def trailing_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour RANGE-frame sum per user (value frame bounded by
    event-TIME distance, not row count -- ties are peers in both
    engines, so the result is deterministic)."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 10)
    epoch_s = F.col("ts").cast("long")
    v_e4 = F.floor(F.col("value") * 10000 + 0.5).cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy(epoch_s)
        .rangeBetween(-3600, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(v_e4).over(w).alias("trailing_1h_e4"),
    )


def regr_slope_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user OLS trend of event value over time, from EXACT integer
    moment sums: slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2).

    x = hours since epoch (integer), y = value in 1e-4 units (integer):
    all four moments are order-independent integer sums, so both engines
    compute the identical rational and one final double division -- no
    regr_slope() float-accumulation divergence. One shuffle (the groupBy);
    map-side partial aggregation does the moment math at scan speed.
    """
    ev = load_table(spark, sf_dir, "events")
    x = F.expr("CAST(ts AS LONG) DIV 3600")
    y = F.floor(F.col("value") * 10000 + 0.5).cast("long")
    agg = ev.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
    )
    denom = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = F.when(
        denom != 0,
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / denom / 10000.0,
            8,
        ),
    )
    return agg.select("user_id", "n", slope.alias("slope_per_hour"))


HIST_DEPTH_BUCKETS = 10
# Deterministic ~1/7 key-mod sample for cut-point estimation: at 100 TB you
# raise the modulus so the sample stays bounded; the plan shape is identical.
HIST_DEPTH_SAMPLE_MOD = 7


def histogram_equi_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram (10 near-equal-count buckets) of order totals
    via SAMPLED CUT POINTS -- the 100 TB plan, not the global-sort one:

    1. deterministic key-mod sample (o_orderkey % 7 == 0 -- reproducible,
       no RNG; the modulus bounds the sample at any scale),
    2. exact sample quantile boundaries from ONE 1-row aggregate
       (sort_array(collect_list(cents)) then element_at at ceil(b*m/10)
       -- partial collect per partition, merge of a bounded array; no
       window, no global sort anywhere in the plan),
    3. broadcast the 9 cut points and bucket the FULL table with a
       map-only comparison chain; per-bucket count + exact min/max.

    Bucket rule: bucket(v) = 1 + #cuts below v (ties stay together, so
    depths are near-equal rather than exactly N/10 -- the standard
    equi-depth contract at scale). Boundaries are exact integer cents,
    so the rule is engine-independent; the oracle replays the identical
    sample + cut-point + CASE math in SQL. A pytest asserts the depths
    stay within a few percent of N/10 of the exact-ntile answer.
    histogram_equi_width is the one-scan-plus-broadcast sibling.
    """
    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    sample = o.where(
        F.col("o_orderkey") % HIST_DEPTH_SAMPLE_MOD == 0
    ).select(cents.alias("__c"))
    cuts = sample.agg(F.sort_array(F.collect_list("__c")).alias("__cs")).select(
        *[
            # try_element_at + greatest(1, ...): an EMPTY SAMPLE (tiny
            # partition where no key hits the modulus, or an empty
            # table) yields index 0, which even try_element_at rejects
            # as invalid (it only tolerates out-of-bounds) -- clamping
            # to 1 makes it an out-of-bounds NULL; NULL cuts put every
            # row in bucket 1 (degraded but sane), matching DuckDB
            # list_extract's NULL semantics. Real samples have
            # ceil(b*m/10) >= 1, so the clamp never changes them
            F.expr(
                f"try_element_at(__cs, "
                f"greatest(1, cast(ceil({b} * size(__cs)"
                f" / {HIST_DEPTH_BUCKETS}) as int)))"
            ).alias(f"__cut{b}")
            for b in range(1, HIST_DEPTH_BUCKETS)
        ]
    )
    bucket = F.lit(1)
    for b in range(1, HIST_DEPTH_BUCKETS):
        bucket = bucket + F.when(cents > F.col(f"__cut{b}"), 1).otherwise(0)
    return (
        o.crossJoin(F.broadcast(cuts))
        .select(bucket.cast("int").alias("bucket"), "o_totalprice")
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
        .orderBy("bucket")
    )



RFM_NTILE_BUCKETS = 512  # order-aligned equi-width buckets per metric


def _ntile_distributed(
    df: DataFrame,
    metric: str,
    *,
    ascending: bool,
    n_tiles: int = 4,
    n_buckets: int = RFM_NTILE_BUCKETS,
    keep_metric: bool = False,
) -> DataFrame:
    """Exact ``ntile(n)`` over the total order ``(metric, o_custkey)``
    WITHOUT a global single-partition sort.

    Plan (the sequence_pack two-level prefix-sum pattern):

    1. 1-row min/max/count aggregate, broadcast.
    2. Deterministic order-aligned equi-width bucket (integer
       arithmetic, no sampled range boundaries -- replayable and
       partitioning-independent, unlike repartitionByRange).
    3. row_number over a window partitioned BY BUCKET (parallel).
    4. Per-bucket counts -> exclusive prefix sum over the <=n_buckets
       tiny rows -> broadcast back; global rank = prefix + local rank.
    5. ntile's exact tile arithmetic from (rank, total): the first
       n % t tiles carry ceil(n/t) rows, the rest floor(n/t).

    Returns (o_custkey, __tile). Worst case one bucket holds a skewed
    value run; the window stays partition-parallel across buckets and
    never sorts more than one bucket per task.
    """
    stats = df.agg(
        F.min(metric).alias("__mn"),
        F.max(metric).alias("__mx"),
        F.count("*").alias("__n"),
    )
    val = F.col(metric)
    lo, hi = F.col("__mn"), F.col("__mx")
    span = hi - lo + F.lit(1)
    raw = (val - lo) if ascending else (hi - val)
    annotated = df.crossJoin(F.broadcast(stats)).select(
        "o_custkey",
        val.alias("__v"),
        F.col("__n"),
        F.floor(raw * F.lit(n_buckets) / span).cast("long").alias("__b"),
    )
    order = [
        F.col("__v").asc() if ascending else F.col("__v").desc(),
        F.col("o_custkey").asc(),
    ]
    w_in = Window.partitionBy("__b").orderBy(*order)
    within = annotated.select(
        "o_custkey",
        "__b",
        "__n",
        "__v",
        F.row_number().over(w_in).alias("__rn"),
    )
    counts = annotated.groupBy("__b").agg(F.count("*").alias("__c"))
    # single-partition window is BOUNDED: input is the per-bucket count
    # table, cardinality = n_tiles-ish bucket count, never row-scale
    w_b = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    prefix = counts.select(
        "__b", F.coalesce(F.sum("__c").over(w_b), F.lit(0)).alias("__pre")
    )
    p = F.col("__pre") + F.col("__rn")
    n = F.col("__n")
    t = F.lit(n_tiles)
    q = F.floor(n / t).cast("long")
    r = n % t
    big = r * (q + 1)  # rows covered by the (q+1)-sized leading tiles
    tile = F.when(p <= big, F.floor((p - 1) / (q + 1)) + 1).otherwise(
        r + F.floor((p - big - 1) / F.greatest(q, F.lit(1))) + 1
    )
    out_cols = ["o_custkey", tile.cast("int").alias("__tile")]
    if keep_metric:
        out_cols.append(F.col("__v").alias(metric))
    return within.join(F.broadcast(prefix), "__b").select(*out_cols)


def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: per customer, recency (days since last
    order, anchored to the corpus's max order date so the metric is
    data-deterministic), frequency (order count), monetary (total spend
    in exact cents), each quartiled with exact ntile(4) semantics under
    a fully deterministic (metric, custkey) order; output is the 64-cell
    segment census (r_score, f_score, m_score, n_customers, total_cents).

    Scale shape (r7): one groupBy(custkey) scan, then each metric is
    quartiled by ``_ntile_distributed`` -- bucket-partitioned windows +
    a tiny broadcast prefix, NEVER an unpartitioned global sort (the r6
    version's three ``Window.orderBy`` ntiles were single-task global
    sorts over the customer dimension; at 1e9 customers that is one
    executor sorting the world three times). Scores recombine via three
    narrow (custkey, int) shuffle joins, then one tiny census aggregate.
    """
    o = load_table(spark, sf_dir, "orders")
    anchor = o.agg(F.max("o_orderdate").alias("__max_d"))
    per_cust = (
        o.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_d"),
            F.count("*").alias("freq"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
            ).alias("cents"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "o_custkey",
            F.datediff(F.col("__max_d").cast("date"), F.col("last_d").cast("date")).alias("rec_days"),
            "freq",
            "cents",
        )
    ).localCheckpoint(eager=False)  # barrier: 6 downstream lineage refs
    # LOW recency days = GOOD, so recency orders ascending; freq/monetary
    # order descending so tile 1 is always the best quartile.
    r_sc = _ntile_distributed(per_cust, "rec_days", ascending=True)
    f_sc = _ntile_distributed(per_cust, "freq", ascending=False)
    m_sc = _ntile_distributed(per_cust, "cents", ascending=False, keep_metric=True)
    scored = (
        m_sc.withColumnRenamed("__tile", "m_score")
        .join(r_sc.withColumnRenamed("__tile", "r_score"), "o_custkey")
        .join(f_sc.withColumnRenamed("__tile", "f_score"), "o_custkey")
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("cents").alias("total_cents"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


QUERIES = {
    "rfm_segments": rfm_segments,
    "gap_fill_ffill": gap_fill_ffill,
    "correlated_subqueries": correlated_subqueries,
    "salted_join_revenue": salted_join_revenue,
    "grouping_sets_agg": grouping_sets_agg,
    "unpivot_melt": unpivot_melt,
    "trailing_range_window": trailing_range_window,
    "regr_slope_per_user": regr_slope_per_user,
    "histogram_equi_depth": histogram_equi_depth,
}

ORACLES = {
    "rfm_segments": """
        WITH a AS (SELECT max(o_orderdate) AS max_d FROM orders),
        pc AS (
            SELECT o_custkey,
                   date_diff('day', max(o_orderdate)::DATE,
                             (SELECT max_d FROM a)::DATE) AS rec_days,
                   CAST(count(*) AS BIGINT) AS freq,
                   CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS cents
            FROM orders GROUP BY o_custkey
        ), sc AS (
            SELECT o_custkey, cents,
                   ntile(4) OVER (ORDER BY rec_days ASC, o_custkey ASC)
                       AS r_score,
                   ntile(4) OVER (ORDER BY freq DESC, o_custkey ASC)
                       AS f_score,
                   ntile(4) OVER (ORDER BY cents DESC, o_custkey ASC)
                       AS m_score
            FROM pc
        )
        SELECT CAST(r_score AS INTEGER) AS r_score,
               CAST(f_score AS INTEGER) AS f_score,
               CAST(m_score AS INTEGER) AS m_score,
               CAST(count(*) AS BIGINT) AS n_customers,
               CAST(sum(cents) AS BIGINT) AS total_cents
        FROM sc GROUP BY 1, 2, 3
    """,
    "gap_fill_ffill": f"""
        WITH ev AS (
            SELECT * FROM events WHERE user_id < {GAP_FILL_USERS}
        ), daily AS (
            SELECT user_id, ts::DATE AS day, count(*) AS n,
                   (2 * sum(CAST(floor(value * 10000 + 0.5) AS BIGINT))
                    + count(*)) // (2 * count(*)) AS day_avg_e4
            FROM ev GROUP BY user_id, ts::DATE
        ), bounds AS (
            SELECT min(ts::DATE) AS lo, max(ts::DATE) AS hi FROM ev
        ), spine AS (
            SELECT u.user_id, unnest(generate_series(lo, hi,
                       INTERVAL 1 DAY))::DATE AS day
            FROM (SELECT DISTINCT user_id FROM ev) u, bounds
        )
        SELECT s.user_id,
               strftime(s.day, '%Y-%m-%d') AS day,
               CAST(coalesce(d.n, 0) AS BIGINT) AS n_events,
               last_value(d.day_avg_e4 IGNORE NULLS) OVER (
                   PARTITION BY s.user_id ORDER BY s.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) / 10000.0 AS ffill_avg
        FROM spine s LEFT JOIN daily d
          ON s.user_id = d.user_id AND s.day = d.day
    """,
    "correlated_subqueries": """
        SELECT c.c_custkey, c.c_name,
               CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT) AS acctbal_cents
        FROM customer c
        WHERE c.c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                             WHERE c2.c_nationkey = c.c_nationkey)
          AND EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderstatus = 'F')
          AND NOT EXISTS (SELECT 1 FROM orders o2
                          WHERE o2.o_custkey = c.c_custkey
                            AND o2.o_orderpriority = '1-URGENT')
    """,
    "salted_join_revenue": """
        SELECT c_mktsegment,
               count(*) AS n_orders,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS revenue_cents
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
    "grouping_sets_agg": """
        SELECT o_orderpriority, o_orderstatus,
               CAST(grouping(o_orderpriority) AS INTEGER) AS g_prio,
               CAST(grouping(o_orderstatus) AS INTEGER) AS g_status,
               count(*) AS n,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS revenue_cents
        FROM orders
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
    """,
    "unpivot_melt": """
        SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS value
        FROM customer WHERE c_custkey <= 100
        UNION ALL
        SELECT c_custkey, 'nationkey', CAST(c_nationkey AS DOUBLE)
        FROM customer WHERE c_custkey <= 100
    """,
    # Replays the Spark plan's sampled-cut-point math exactly: same
    # key-mod sample, same ceil(b*m/10) boundary indices over the sorted
    # sample cents, same ">" bucket rule.
    "histogram_equi_depth": f"""
        WITH samp AS (
            SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
            FROM orders WHERE o_orderkey % {HIST_DEPTH_SAMPLE_MOD} = 0
        ), cs AS (
            SELECT list_sort(list(c)) AS cs FROM samp
        ), cuts AS (
            SELECT {", ".join(
                f"cs[CAST(ceil({b} * len(cs) / {HIST_DEPTH_BUCKETS})"
                f" AS INTEGER)] AS cut{b}"
                for b in range(1, HIST_DEPTH_BUCKETS)
            )}
            FROM cs
        )
        SELECT bucket, count(*) AS n,
               min(o_totalprice) AS lo, max(o_totalprice) AS hi
        FROM (
            SELECT CAST(1 + {" + ".join(
                "(CASE WHEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"
                f" > cut{b} THEN 1 ELSE 0 END)"
                for b in range(1, HIST_DEPTH_BUCKETS)
            )} AS INTEGER) AS bucket,
                   o_totalprice
            FROM orders, cuts
        )
        GROUP BY bucket ORDER BY bucket
    """,
    "regr_slope_per_user": """
        WITH m AS (
            SELECT user_id,
                   count(*) AS n,
                   CAST(sum(x) AS BIGINT) AS sx,
                   CAST(sum(y) AS BIGINT) AS sy,
                   CAST(sum(x * x) AS BIGINT) AS sxx,
                   CAST(sum(x * y) AS BIGINT) AS sxy
            FROM (
                SELECT user_id,
                       CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS x,
                       CAST(floor(value * 10000 + 0.5) AS BIGINT) AS y
                FROM events
            )
            GROUP BY user_id
        )
        SELECT user_id, n,
               CASE WHEN n * sxx - sx * sx <> 0 THEN
                   round(((n * sxy - sx * sy)
                          / (n * sxx - sx * sx)) / 10000.0, 8)
               END AS slope_per_hour
        FROM m
    """,
    "trailing_range_window": """
        SELECT event_id, user_id,
               CAST(sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) OVER (
                   PARTITION BY user_id
                   ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                   RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS trailing_1h_e4
        FROM events WHERE user_id < 10
    """,
}
