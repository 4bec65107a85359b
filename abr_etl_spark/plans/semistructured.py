"""Semi-structured & string processing (SURVEY.md §2 B-block, part 3).

Real event pipelines carry JSON props, array aggregates, and fuzzy
string matching; all three are first-class Spark SQL territory and all
three have DuckDB equivalents for the oracle. Array outputs are
serialized to strings (array_join / array_to_string) so value hashing is
representation-independent across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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


QUERIES = {
    "json_props_agg": json_props_agg,
    "array_agg_per_group": array_agg_per_group,
    "string_funcs": string_funcs,
}

ORACLES = {
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
