"""Sketch operators: error bounds vs exact aggregates."""

from pyspark.sql import functions as F

from abr_etl_spark.operators import sketches
from abr_etl_spark.sources.lake import load_table
from tests.conftest import SF_ORACLE


def test_approx_distinct_within_rsd(spark):
    e = load_table(spark, SF_ORACLE, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    approx = {
        r["event_type"]: r["approx_distinct"]
        for r in sketches.approx_distinct_by(e, "event_type", "user_id").collect()
    }
    for k, n in exact.items():
        assert abs(approx[k] - n) / n < 0.1, (k, n, approx[k])


def test_approx_quantiles_close_to_exact(spark):
    c = load_table(spark, SF_ORACLE, "customer")
    exact = {
        r["c_mktsegment"]: r["m"]
        for r in c.groupBy("c_mktsegment")
        .agg(F.percentile("c_acctbal", 0.5).alias("m"))
        .collect()
    }
    approx = {
        r["c_mktsegment"]: r["q_50"]
        for r in sketches.approx_quantiles_by(c, "c_mktsegment", "c_acctbal", [0.5]).collect()
    }
    for k, m in exact.items():
        assert abs(approx[k] - m) <= 200, (k, m, approx[k])  # ~2% of range


def test_histogram_covers_all_rows(spark):
    o = load_table(spark, SF_ORACLE, "orders")
    h = sketches.histogram(o, "o_totalprice", bins=10)
    rows = h.collect()
    assert sum(r["n"] for r in rows) == o.count()
    assert len(rows) <= 10
