"""Coverage part 4 (round 2): the remaining TPC-H join/agg shapes the
earlier blocks don't exercise, plus two training-pipeline staples.

- q7/q8: two-sided nation joins with year rollups (multi-broadcast,
  single fact shuffle).
- q13: LEFT OUTER + two-level aggregation incl. zero-order customers.
- q15: window max over an aggregated subquery (top-1 with ties).
- q17: correlated avg-per-group rewritten as groupBy + broadcast join.
- late_shipment_suppliers: q21 flavor adapted to this schema's columns.
- train_test_split: deterministic key-mod 80/10/10 split with per-split
  stats -- the reproducible split every training pipeline needs.
- histogram_equi_width: 20-bucket equi-width histogram from global
  min/max (two-pass: tiny agg broadcast back onto the scan).

All oracles alias columns identically and cast integer aggregates
(BIGINT) / bucket ids (INTEGER) to keep the driver's dtype-sensitive
hash green.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from abr_etl_spark.sources.lake import load_table

N_HIST_BUCKETS = 20


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: shipping volume between two nation pairs by year."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    # 4188 fine-grained groups make float summation-order divergence vs
    # the oracle statistically certain at cent precision (14 groups
    # differed by 0.01 at sf0.01). Sum exact integer TENTH-CENTS per item
    # instead -- floor(x*1e4 + 0.5) is identical IEEE math in both
    # engines and integer sums are order-independent.
    vol_e4 = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000 + 0.5
    ).cast("long")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .join(broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(broadcast(n1), s.s_nationkey == F.col("s_nkey"))
        .join(broadcast(n2), c.c_nationkey == F.col("c_nkey"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(vol_e4).alias("__s"))
        # half-up to cents in INTEGER space ((s+50) DIV 100): Spark's
        # round() rounds the shortest decimal repr of a double while
        # DuckDB rounds its true binary value, so x.485 diverges -- keep
        # every step exact until one final division.
        .select(
            "supp_nation",
            "cust_nation",
            "l_year",
            (F.expr("(__s + 50) DIV 100") / 100.0).alias("revenue"),
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: one nation's share of total volume per order year."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    # Exact integer tenth-cents per item (same rationale as q7): both
    # the share ratio and the volume sum come from order-independent
    # integer sums -- share is integer-rounded to ppm BEFORE the final
    # exact division, so no engine ever rounds a float. The ppm step
    # multiplies by 1e6, so BIGINT holds up to ~9e12 e4-units per
    # (year) group; past that, sum into DECIMAL(38,0) instead.
    vol_e4 = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000 + 0.5
    ).cast("long")
    nat = n.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    joined = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(broadcast(nat), s.s_nationkey == F.col("s_nkey"))
    )
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == "ETHIOPIA", vol_e4).otherwise(
                    F.lit(0).cast("long")
                )
            ).alias("__num"),
            F.sum(vol_e4).alias("__den"),
        )
        .select(
            "o_year",
            (
                F.expr("(1000000 * __num + __den DIV 2) DIV __den") / 1000000.0
            ).alias("mkt_share"),
            (F.expr("(__den + 50) DIV 100") / 100.0).alias("total_volume"),
        )
        .orderBy("o_year")
    )


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape on this schema (no partsupp table): (supplier, part)
    pairs whose shipped value exceeds 1/20000 of the GLOBAL total -- the
    HAVING-against-a-scalar-subquery shape, expressed as a tiny global
    aggregate broadcast back into the filter. Exact integer tenth-cents
    everywhere, so the threshold comparison is integer-exact.
    """
    l = load_table(spark, sf_dir, "lineitem")
    val_e4 = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000 + 0.5
    ).cast("long")
    per_pair = l.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(val_e4).alias("__v")
    )
    total = per_pair.agg(F.sum("__v").alias("__t"))
    return (
        per_pair.crossJoin(broadcast(total))
        .where(F.col("__v") * 20000 > F.col("__t"))
        .select(
            "l_suppkey",
            "l_partkey",
            (F.expr("(__v + 50) DIV 100") / 100.0).alias("value"),
        )
    )


def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 flavor on this schema: suppliers shipping more than a FIFTH of
    some part's total shipped quantity (parts are multi-sourced enough
    that a 50% bar is vacuous at oracle scale) -- the per-group-threshold
    semi-join (one shuffle computes both the pair and the part totals
    via a window; quantities are integer-exact, so the threshold
    comparison is engine-independent). Compare q11, which thresholds
    against the single GLOBAL total instead.
    """
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    qty = F.col("l_quantity").cast("long")
    per_pair = l.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(qty).alias("supp_qty")
    )
    w = Window.partitionBy("l_partkey")
    dominant = (
        per_pair.withColumn("part_qty", F.sum("supp_qty").over(w))
        .where(5 * F.col("supp_qty") > F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        dominant.join(broadcast(s), dominant.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: distribution of per-customer order counts, including
    customers with zero orders (LEFT OUTER preserved through both aggs)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "5-LOW"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: supplier(s) with max revenue in a quarter -- the
    aggregate subquery's max computed as a 1-row scalar aggregate and
    broadcast back (crossJoin of one row), NOT a global window: the
    per-supplier aggregate is millions of rows at 100x and an
    unpartitioned ``max().over()`` would force them all into a single
    partition. Ties kept, deterministic order (same broadcast-scalar
    pattern as q11_important_stock)."""
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    s = load_table(spark, sf_dir, "supplier")
    # Integer tenth-cents sum, half-up to cents in integer space: the
    # max-revenue comparison below then ranks EXACT integers, immune to
    # float summation order (same pattern as q7).
    rev_e4 = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000 + 0.5
    ).cast("long")
    rev = (
        l.groupBy("l_suppkey")
        .agg(F.sum(rev_e4).alias("__s"))
        .select(
            "l_suppkey",
            (F.expr("(__s + 50) DIV 100") / 100.0).alias("total_revenue"),
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("__max"))
    top = rev.crossJoin(broadcast(mx)).where(
        F.col("total_revenue") == F.col("__max")
    )
    return (
        top.join(broadcast(s), top.l_suppkey == s.s_suppkey)
        .select(
            F.col("s_suppkey"),
            F.col("s_name"),
            F.col("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: revenue from lineitems with quantity below half their
    part's average -- the correlated scalar subquery expressed as a
    groupBy + broadcast join back onto the fact."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#3")
    avg_qty = l.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        l.join(broadcast(p), l.l_partkey == p.p_partkey)
        .join(avg_qty, l.l_partkey == F.col("ap_key"))
        .where(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        # Exact integer cents; /700.0 at the end is one division of an
        # exact integer -- identical double in both engines, no rounding
        # step to diverge. (avg_qty is safe as a float: quantities are
        # integer-valued doubles, whose sums are exact in any order.)
        .agg(
            (
                F.sum(
                    F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
                )
                / 700.0
            ).alias("avg_yearly"),
            F.count("*").alias("n_items"),
        )
    )


def late_shipment_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 flavor on this schema: suppliers ranked by shipments leaving
    more than 60 days after the order date (no commit/receipt dates in
    the dataset, so lateness is ship-vs-order)."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    late = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .where(
            F.col("l_shipdate").cast("date")
            > F.date_add(F.col("o_orderdate").cast("date"), 60)
        )
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("numwait"))
    )
    return (
        late.join(broadcast(s), late.l_suppkey == s.s_suppkey)
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(20)
    )


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Faithful Q21 structure: suppliers who were the SOLE late shipper
    on a multi-supplier order (lateness = ship > order date + 60 days;
    the schema has no commit/receipt dates). The classic EXISTS /
    NOT-EXISTS correlated pair is rewritten as one aggregation pyramid
    -- per-(order, supplier) late flags, then per-order supplier/late
    counts -- so at scale it is two hash aggregates and a broadcast
    instead of two correlated semi-joins re-scanning lineitem.

    Completes the TPC-H shape coverage: with min_price_supplier_per_part
    (Q2's correlated-min) and profit_by_nation_year (Q9) this repo now
    has an analog for all 22 queries (late_shipment_suppliers remains
    the simpler ranked-late-count flavor).
    """
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    per_os = (
        l.join(
            o.select("o_orderkey", "o_orderdate"),
            l.l_orderkey == o.o_orderkey,
        )
        .select(
            "o_orderkey",
            "l_suppkey",
            F.when(
                F.col("l_shipdate").cast("date")
                > F.date_add(F.col("o_orderdate").cast("date"), 60),
                1,
            )
            .otherwise(0)
            .alias("late"),
        )
        .groupBy("o_orderkey", "l_suppkey")
        .agg(F.max("late").alias("any_late"))
    )
    w = Window.partitionBy("o_orderkey")
    flagged = per_os.select(
        "o_orderkey",
        "l_suppkey",
        "any_late",
        F.count("*").over(w).alias("n_supp"),
        F.sum("any_late").over(w).alias("n_late"),
    )
    waiting = (
        flagged.where(
            (F.col("any_late") == 1)
            & (F.col("n_supp") > 1)
            & (F.col("n_late") == 1)
        )
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("numwait"))
    )
    return (
        waiting.join(broadcast(s), waiting.l_suppkey == s.s_suppkey)
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(100)
    )


def train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split by key-mod (hash-mod
    in production; mod here so the oracle derives the identical split),
    with per-split row counts and char totals."""
    d = load_table(spark, sf_dir, "documents")
    bucket = F.col("doc_id") % 100
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        d.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .orderBy("split")
    )


def histogram_equi_width(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order totals: global (min, max) from one
    tiny aggregate broadcast back onto the scan; max value clamped into
    the last bucket."""
    o = load_table(spark, sf_dir, "orders")
    bounds = o.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    b = F.least(
        F.floor(
            (F.col("o_totalprice") - F.col("lo"))
            / ((F.col("hi") - F.col("lo")) / N_HIST_BUCKETS)
        ).cast("int"),
        F.lit(N_HIST_BUCKETS - 1),
    )
    return (
        o.crossJoin(broadcast(bounds))
        .select(b.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .orderBy("bucket")
    )


QUERIES = {
    "q7_volume_shipping": q7_volume_shipping,
    "q8_market_share": q8_market_share,
    "q11_important_stock": q11_important_stock,
    "q20_dominant_suppliers": q20_dominant_suppliers,
    "q13_order_distribution": q13_order_distribution,
    "q15_top_supplier": q15_top_supplier,
    "q17_small_qty_revenue": q17_small_qty_revenue,
    "late_shipment_suppliers": late_shipment_suppliers,
    "q21_waiting_suppliers": q21_waiting_suppliers,
    "train_test_split": train_test_split,
    "histogram_equi_width": histogram_equi_width,
}

ORACLES = {
    "q7_volume_shipping": """
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INTEGER) AS l_year,
               ((CAST(sum(CAST(floor(
                     l_extendedprice * (1 - l_discount) * 10000 + 0.5)
                 AS BIGINT)) AS BIGINT) + 50) // 100) / 100.0 AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE n1.n_name <> n2.n_name
        GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
    "q8_market_share": """
        WITH g AS (
            SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
                   CAST(sum(CASE WHEN n_name = 'ETHIOPIA'
                            THEN CAST(floor(l_extendedprice * (1 - l_discount)
                                            * 10000 + 0.5) AS BIGINT)
                            ELSE 0 END) AS BIGINT) AS num,
                   CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                                       * 10000 + 0.5) AS BIGINT))
                        AS BIGINT) AS den
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            GROUP BY 1
        )
        SELECT o_year,
               ((1000000 * num + den // 2) // den) / 1000000.0 AS mkt_share,
               ((den + 50) // 100) / 100.0 AS total_volume
        FROM g ORDER BY o_year
    """,
    "q11_important_stock": """
        WITH per_pair AS (
            SELECT l_suppkey, l_partkey,
                   CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                                       * 10000 + 0.5) AS BIGINT))
                        AS BIGINT) AS v
            FROM lineitem GROUP BY l_suppkey, l_partkey
        ), total AS (
            SELECT CAST(sum(v) AS BIGINT) AS t FROM per_pair
        )
        SELECT l_suppkey, l_partkey,
               ((v + 50) // 100) / 100.0 AS value
        FROM per_pair, total
        WHERE v * 20000 > t
    """,
    "q20_dominant_suppliers": """
        WITH per_pair AS (
            SELECT l_partkey, l_suppkey,
                   CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS supp_qty
            FROM lineitem GROUP BY l_partkey, l_suppkey
        ), shares AS (
            SELECT l_suppkey, supp_qty,
                   sum(supp_qty) OVER (PARTITION BY l_partkey) AS part_qty
            FROM per_pair
        )
        SELECT DISTINCT s_suppkey, s_name
        FROM shares JOIN supplier ON l_suppkey = s_suppkey
        WHERE 5 * supp_qty > part_qty
        ORDER BY s_suppkey
    """,
    "q13_order_distribution": """
        SELECT c_count, count(*) AS custdist FROM (
            SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer LEFT JOIN orders
              ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
            GROUP BY c_custkey
        )
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    "q15_top_supplier": """
        WITH rev AS (
            SELECT l_suppkey,
                   ((CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                                         * 10000 + 0.5) AS BIGINT))
                      AS BIGINT) + 50) // 100) / 100.0 AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM rev JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
        ORDER BY s_suppkey
    """,
    "q17_small_qty_revenue": """
        WITH avg_qty AS (
            SELECT l_partkey AS ap_key, avg(l_quantity) AS aq
            FROM lineitem GROUP BY l_partkey
        )
        SELECT CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) / 700.0 AS avg_yearly,
               count(*) AS n_items
        FROM lineitem
        JOIN part ON l_partkey = p_partkey AND p_brand = 'Brand#3'
        JOIN avg_qty ON l_partkey = ap_key
        WHERE l_quantity < 0.5 * aq
    """,
    # Declarative EXISTS/NOT-EXISTS form -- agreement proves the
    # aggregation-pyramid rewrite above implements the correlated pair.
    "q21_waiting_suppliers": """
        WITH per_os AS (
            SELECT o_orderkey, l_suppkey,
                   max(CASE WHEN l_shipdate::DATE
                                 > o_orderdate::DATE + INTERVAL 60 DAY
                            THEN 1 ELSE 0 END) AS any_late
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderkey, l_suppkey
        ), waiting AS (
            SELECT x.l_suppkey, count(*) AS numwait
            FROM per_os x
            WHERE x.any_late = 1
              AND EXISTS (SELECT 1 FROM per_os y
                          WHERE y.o_orderkey = x.o_orderkey
                            AND y.l_suppkey <> x.l_suppkey)
              AND NOT EXISTS (SELECT 1 FROM per_os z
                              WHERE z.o_orderkey = x.o_orderkey
                                AND z.l_suppkey <> x.l_suppkey
                                AND z.any_late = 1)
            GROUP BY x.l_suppkey
        )
        SELECT s_name, CAST(numwait AS BIGINT) AS numwait
        FROM waiting JOIN supplier ON l_suppkey = s_suppkey
        ORDER BY numwait DESC, s_name ASC
        LIMIT 100
    """,
    "late_shipment_suppliers": """
        SELECT s_name, numwait FROM (
            SELECT l_suppkey, count(*) AS numwait
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_shipdate::DATE > o_orderdate::DATE + INTERVAL 60 DAY
            GROUP BY l_suppkey
        ) late JOIN supplier ON l_suppkey = s_suppkey
        ORDER BY numwait DESC, s_name ASC
        LIMIT 20
    """,
    "train_test_split": """
        SELECT CASE WHEN doc_id % 100 < 80 THEN 'train'
                    WHEN doc_id % 100 < 90 THEN 'val'
                    ELSE 'test' END AS split,
               count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM documents
        GROUP BY 1 ORDER BY 1
    """,
    "histogram_equi_width": f"""
        WITH bounds AS (
            SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi
            FROM orders
        )
        SELECT CAST(least(floor((o_totalprice - lo)
                                / ((hi - lo) / {N_HIST_BUCKETS})),
                          {N_HIST_BUCKETS - 1}) AS INTEGER) AS bucket,
               count(*) AS n
        FROM orders, bounds
        GROUP BY 1 ORDER BY 1
    """,
}
