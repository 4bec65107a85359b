"""Skew/bucketing utilities: correctness vs plain operators and the
no-exchange guarantee for bucketed joins."""

from pyspark.sql import functions as F

from abr_etl_spark.operators import joins
from abr_etl_spark.sources.lake import load_table
from tests.conftest import SF_ORACLE


def test_salted_join_matches_plain(spark):
    o = load_table(spark, SF_ORACLE, "orders")
    n = load_table(spark, SF_ORACLE, "customer").select("c_custkey", "c_mktsegment")
    plain = (
        o.join(n, o.o_custkey == n.c_custkey)
        .groupBy("c_mktsegment")
        .count()
    )
    salted = (
        joins.salted_join(
            o.withColumnRenamed("o_custkey", "c_custkey"), n, "c_custkey"
        )
        .groupBy("c_mktsegment")
        .count()
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_two_phase_agg_matches_plain(spark):
    l = load_table(spark, SF_ORACLE, "lineitem")
    plain = {
        r["l_orderkey"]: round(r["s"], 2)
        for r in l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("s"))
        .collect()
    }
    salted = {
        r["l_orderkey"]: round(r["sum_l_quantity"], 2)
        for r in joins.two_phase_agg(l, "l_orderkey", "l_quantity").collect()
    }
    assert plain == salted


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    spark.sql("CREATE DATABASE IF NOT EXISTS bktest")
    spark.catalog.setCurrentDatabase("bktest")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    import shutil

    shutil.rmtree("spark-warehouse/bktest.db", ignore_errors=True)
    o = load_table(spark, SF_ORACLE, "orders").limit(2000)
    l = load_table(spark, SF_ORACLE, "lineitem").limit(5000).withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    joins.write_bucketed(o, "orders_b", "o_orderkey", buckets=4)
    joins.write_bucketed(l, "lineitem_b", "o_orderkey", buckets=4)
    # disable broadcast so the planner exercises the bucketed path (at
    # real scale both sides exceed the broadcast threshold anyway)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = joins.bucketed_join(
            spark, "orders_b", "lineitem_b", "o_orderkey"
        )
        joined.count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange hashpartitioning" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.catalog.setCurrentDatabase("default")
