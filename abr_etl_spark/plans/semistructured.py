"""Semi-structured & string processing (SURVEY.md §2 B-block, part 3).

Real event pipelines carry JSON props, array aggregates, and fuzzy
string matching; all three are first-class Spark SQL territory and all
three have DuckDB equivalents for the oracle. Array outputs are
serialized to strings (array_join / array_to_string) so value hashing is
representation-independent across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from abr_etl_spark.sources.lake import load_table


def json_props_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse the events JSON props column (schema-on-read) and aggregate
    the extracted field -- get_json_object stays JVM-side, no UDF."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


def array_agg_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-distinct array aggregate, serialized for stable hashing."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.array_join(
                F.sort_array(F.collect_set("o_orderstatus")), ","
            ).alias("statuses"),
            F.count("*").alias("n"),
        )
        .orderBy("o_orderpriority")
    )


def window_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function battery per customer order stream: lag/lead,
    rank vs dense_rank vs ntile, first/last over a running frame --
    single shuffle, one window partitioning reused by every function."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") < 50)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.lag("o_orderkey", 1).over(w).alias("prev_key"),
        F.lead("o_orderkey", 1).over(w).alias("next_key"),
        F.first("o_orderkey").over(wf).alias("first_key"),
        F.round(F.max("o_totalprice").over(wf), 2).alias("running_max"),
    )


def window_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second window battery -- the ANSI surface the first one skips:
    percent_rank / cume_dist (exact rationals in double, identical
    IEEE), nth_value over an explicit full frame, and
    first_value ... IGNORE NULLS over a synthesized nullable column
    (cents NULL where o_orderkey % 7 == 0 -- deterministic both
    engines). Runs as one spark.sql text so the IGNORE NULLS syntax is
    exercised through the SQL parser; one window partitioning reused
    by every function (single Exchange+Sort).
    """
    load_table(spark, sf_dir, "orders").where(
        F.col("o_custkey") < 50
    ).createOrReplaceTempView("__wf2_orders")
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey,
               round(percent_rank() OVER w, 6) AS pct_rank,
               round(cume_dist() OVER w, 6) AS cdist,
               nth_value(o_orderkey, 2) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate ASC, o_orderkey ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING
                         AND UNBOUNDED FOLLOWING) AS second_key,
               first_value(nullable_cents) IGNORE NULLS OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate ASC, o_orderkey ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING
                         AND UNBOUNDED FOLLOWING)
                   AS first_nonnull_cents,
               lag(o_orderkey, 2, -1) OVER w AS lag2_defaulted
        FROM (
            SELECT o_custkey, o_orderkey, o_orderdate,
                   CASE WHEN o_orderkey % 7 = 0 THEN NULL
                        ELSE CAST(floor(o_totalprice * 100 + 0.5)
                                  AS BIGINT) END AS nullable_cents
            FROM __wf2_orders
        )
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate ASC, o_orderkey ASC)
        """
    )


def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column battery: build a map per row, explode it back to
    rows (map_from_arrays -> explode covers the map surface; output is
    rows so the oracle needs no map type at all)."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") < 30)
    m = F.map_from_arrays(
        F.array(F.lit("segment"), F.lit("name")),
        F.array(F.col("c_mktsegment"), F.col("c_name")),
    )
    return (
        c.select("c_custkey", F.explode(m).alias("key", "value"))
        .orderBy("c_custkey", "key")
    )


def json_nested_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json with an explicit struct schema (vs json_props_agg's
    schema-on-read path): typed extraction, null-safe on missing keys."""
    e = load_table(spark, sf_dir, "events").where(F.col("event_id") < 500)
    parsed = F.from_json("props", "k INT, source STRING")
    return e.select(
        "event_id",
        parsed.getField("k").alias("k"),
        F.coalesce(parsed.getField("source"), F.lit("none")).alias("source"),
    )


def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function battery built from each customer's order-priority
    history: set algebra (union/intersect/except vs a fixed probe),
    sort, dedup, and a zip_with index-weighted sum -- all JVM
    higher-order functions, serialized to strings/ints so the oracle is
    representation-independent."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") < 40)
    per_cust = o.groupBy("o_custkey").agg(
        F.array_sort(F.array_agg(F.col("o_orderpriority"))).alias("prios"),
        F.array_sort(
            F.collect_set(F.col("o_orderkey") % 10)
        ).alias("key_mods"),
    )
    probe = F.array(F.lit("1-URGENT"), F.lit("5-LOW"))
    return per_cust.select(
        "o_custkey",
        F.array_join(F.array_distinct("prios"), ",").alias("distinct_prios"),
        F.array_join(F.array_intersect(F.array_distinct("prios"), probe), ",").alias(
            "inter_probe"
        ),
        F.array_join(F.array_except(F.array_distinct("prios"), probe), ",").alias(
            "minus_probe"
        ),
        F.size("prios").alias("n_orders"),
        F.expr(
            "aggregate(zip_with(key_mods, sequence(1, size(key_mods)), "
            "(m, i) -> m * i), 0L, (s, x) -> s + x)"
        ).alias("weighted_mod_sum"),
    )


def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function battery over customer names: slicing, padding,
    case, edit distance to a fixed probe."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") < 100)
    return c.select(
        "c_custkey",
        F.upper(F.substring("c_name", 1, 8)).alias("prefix"),
        F.length("c_name").alias("name_len"),
        F.lpad(F.col("c_custkey").cast("string"), 6, "0").alias("padded"),
        F.levenshtein(F.col("c_name"), F.lit("Customer#000000001")).alias(
            "edit_dist"
        ),
        F.translate(F.col("c_name"), "#0", "_ ").alias("translated"),
    )


def string_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string battery -- the regex/splitting surface part 1
    skips: regexp_extract (+_all, comma-serialized), split_part,
    position (instr/strpos), repeat, reverse, concat_ws, and a LIKE
    prefix flag. All JVM-side expressions with DuckDB twins."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") < 100)
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", r"(\d+)$", 1).alias("trailing_digits"),
        F.array_join(
            F.expr(r"regexp_extract_all(c_name, '([0-9]{2})', 1)"), ","
        ).alias("digit_pairs"),
        F.expr("split_part(c_name, '#', 2)").alias("after_hash"),
        F.instr("c_name", "9").alias("pos_of_9"),
        F.repeat(F.substring("c_mktsegment", 1, 2), 2).alias("seg2x"),
        F.reverse(F.substring("c_name", 1, 10)).alias("rev_prefix"),
        F.concat_ws("-", "c_mktsegment", "c_name").alias("seg_name"),
        F.col("c_name").like("Customer%").cast("int").alias("is_customer"),
    )


QUERIES = {
    "json_props_agg": json_props_agg,
    "array_agg_per_group": array_agg_per_group,
    "string_funcs": string_funcs,
    "string_funcs2": string_funcs2,
    "window_funcs": window_funcs,
    "window_funcs2": window_funcs2,
    "map_funcs": map_funcs,
    "json_nested_extract": json_nested_extract,
    "array_funcs": array_funcs,
}

ORACLES = {
    # Spark's array_intersect/array_except preserve first-arg (sorted)
    # order; DuckDB's list_intersect does not guarantee order, so the
    # oracle re-sorts -- same sets, same serialization.
    "array_funcs": """
        WITH per_cust AS (
            SELECT o_custkey,
                   list_sort(list(o_orderpriority)) AS prios,
                   list_sort(list_distinct(list(o_orderkey % 10)))
                       AS key_mods
            FROM orders WHERE o_custkey < 40
            GROUP BY o_custkey
        )
        SELECT o_custkey,
               array_to_string(list_sort(list_distinct(prios)), ',')
                   AS distinct_prios,
               coalesce(array_to_string(list_sort(list_intersect(
                   list_distinct(prios), ['1-URGENT', '5-LOW'])), ','), '')
                   AS inter_probe,
               coalesce(array_to_string(list_sort(list_filter(
                   list_distinct(prios),
                   p -> p NOT IN ('1-URGENT', '5-LOW'))), ','), '')
                   AS minus_probe,
               CAST(len(prios) AS INTEGER) AS n_orders,
               CAST(list_reduce(list_prepend(0::BIGINT,
                        list_transform(range(1, len(key_mods) + 1),
                            i -> key_mods[i] * i)),
                    (s, x) -> s + x) AS BIGINT) AS weighted_mod_sum
        FROM per_cust
    """,
    "window_funcs": """
        SELECT o_custkey, o_orderkey,
               CAST(row_number() OVER w AS INTEGER) AS rn,
               CAST(rank() OVER w AS INTEGER) AS rnk,
               CAST(dense_rank() OVER w AS INTEGER) AS drnk,
               CAST(ntile(4) OVER w AS INTEGER) AS quartile,
               lag(o_orderkey, 1) OVER w AS prev_key,
               lead(o_orderkey, 1) OVER w AS next_key,
               first(o_orderkey) OVER wf AS first_key,
               round(max(o_totalprice) OVER wf, 2) AS running_max
        FROM orders WHERE o_custkey < 50
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate ASC, o_orderkey ASC),
               wf AS (PARTITION BY o_custkey
                      ORDER BY o_orderdate ASC, o_orderkey ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    "map_funcs": """
        SELECT c_custkey, u.key, u.value FROM (
            SELECT c_custkey,
                   unnest([struct_pack(key := 'segment', value := c_mktsegment),
                           struct_pack(key := 'name', value := c_name)]) AS u
            FROM customer WHERE c_custkey < 30
        ) ORDER BY c_custkey, u.key
    """,
    "json_nested_extract": """
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
               coalesce(json_extract_string(props, '$.source'), 'none')
                   AS source
        FROM events WHERE event_id < 500
    """,
    "json_props_agg": """
        SELECT event_type,
               count(*) AS n,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER))
                    AS BIGINT) AS sum_k,
               min(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
               max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    "array_agg_per_group": """
        SELECT o_orderpriority,
               array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses,
               count(*) AS n
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "string_funcs": """
        SELECT c_custkey,
               upper(substr(c_name, 1, 8)) AS prefix,
               CAST(length(c_name) AS INTEGER) AS name_len,
               lpad(CAST(c_custkey AS VARCHAR), 6, '0') AS padded,
               CAST(levenshtein(c_name, 'Customer#000000001') AS INTEGER) AS edit_dist,
               replace(replace(c_name, '#', '_'), '0', ' ') AS translated
        FROM customer
        WHERE c_custkey < 100
    """,
}

ORACLES["window_funcs2"] = """
    WITH base AS (
        SELECT o_custkey, o_orderkey, o_orderdate,
               CASE WHEN o_orderkey % 7 = 0 THEN NULL
                    ELSE CAST(floor(o_totalprice * 100 + 0.5)
                              AS BIGINT) END AS nullable_cents
        FROM orders WHERE o_custkey < 50
    )
    SELECT o_custkey, o_orderkey,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cdist,
           nth_value(o_orderkey, 2) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate ASC, o_orderkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING
                     AND UNBOUNDED FOLLOWING) AS second_key,
           first_value(nullable_cents IGNORE NULLS) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate ASC, o_orderkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING
                     AND UNBOUNDED FOLLOWING) AS first_nonnull_cents,
           lag(o_orderkey, 2, -1) OVER w AS lag2_defaulted
    FROM base
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_orderdate ASC, o_orderkey ASC)
"""

ORACLES["string_funcs2"] = r"""
    SELECT c_custkey,
           coalesce(regexp_extract(c_name, '(\d+)$', 1), '')
               AS trailing_digits,
           array_to_string(regexp_extract_all(c_name, '([0-9]{2})', 1),
                           ',') AS digit_pairs,
           split_part(c_name, '#', 2) AS after_hash,
           CAST(strpos(c_name, '9') AS INTEGER) AS pos_of_9,
           repeat(substring(c_mktsegment, 1, 2), 2) AS seg2x,
           reverse(substring(c_name, 1, 10)) AS rev_prefix,
           concat_ws('-', c_mktsegment, c_name) AS seg_name,
           CAST(CASE WHEN c_name LIKE 'Customer%' THEN 1 ELSE 0 END
                AS INTEGER) AS is_customer
    FROM customer WHERE c_custkey < 100
"""
