"""Part-7 queries vs the DuckDB oracle, plus robustness properties."""

import pytest
from pyspark.sql import functions as F

from abr_etl_spark.plans import analytics7 as a7
from tests.conftest import SF_ORACLE, assert_matches_oracle


@pytest.mark.parametrize("key", sorted(a7.QUERIES))
def test_analytics7_vs_oracle(spark, ddb, key):
    df = a7.QUERIES[key](spark, SF_ORACLE)
    assert_matches_oracle(df, ddb, a7.ORACLES[key], key)


def test_new_vs_returning_conserves_users(spark):
    """Sum of n_new over all days == total distinct users (each user is
    new exactly once), and daily new+returning == daily actives."""
    from abr_etl_spark.sources.lake import load_table

    rows = a7.new_vs_returning(spark, SF_ORACLE).collect()
    e = load_table(spark, SF_ORACLE, "events")
    assert sum(r["n_new"] for r in rows) == (
        e.select("user_id").distinct().count()
    )
    daily = {
        r["day"]: r["distinct_users"]
        for r in e.withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("distinct_users"))
        .collect()
    }
    for r in rows:
        assert r["n_new"] + r["n_returning"] == daily[r["day"]]


def test_anomaly_mad_robust_to_planted_outlier(spark):
    """Planting one extreme balance must flag at least one more outlier
    while leaving the median/MAD (robustness!) nearly unchanged."""
    from abr_etl_spark.sources.lake import load_table

    base = {r["c_mktsegment"]: r for r in a7.anomaly_mad(spark, SF_ORACLE).collect()}
    c = load_table(spark, SF_ORACLE, "customer")
    seg = c.select("c_mktsegment").first()["c_mktsegment"]
    planted = c.select("c_mktsegment", "c_acctbal").unionByName(
        spark.createDataFrame(
            [(seg, 10_000_000.0)], "c_mktsegment string, c_acctbal double"
        )
    )
    med = planted.groupBy("c_mktsegment").agg(
        F.expr("percentile(c_acctbal, 0.5)").alias("med")
    )
    row = [r for r in med.collect() if r["c_mktsegment"] == seg][0]
    assert abs(row["med"] - base[seg]["med"]) < abs(10_000_000.0) * 0.001


def test_attribution_credit_conserved_per_purchase(spark):
    """Each purchase's credit must sum to ~1e4 (within n/2 rounding) and
    the global credit total must equal ~1e4 * n_attributed_purchases."""
    from abr_etl_spark.plans.analytics7 import _touches

    t = _touches(spark, SF_ORACLE)
    per_purchase = (
        t.groupBy("purchase_id").count().withColumnRenamed("count", "n")
    )
    rows = a7.attribution_linear(spark, SF_ORACLE).collect()
    n_purchases = per_purchase.count()
    total = sum(r["total_credit_e4"] for r in rows)
    # each purchase contributes n * round(1e4/n) in [1e4 - n/2, 1e4 + n/2]
    max_n = per_purchase.agg(F.max("n")).collect()[0][0]
    assert abs(total - 10000 * n_purchases) <= n_purchases * max_n
    assert sum(r["n_touches"] for r in rows) == t.count()


def test_linreg_matches_numpy_lstsq(spark):
    """The Cramer's-rule coefficients must match numpy's least-squares
    solution of the same design matrix to ~1e-6 (validates the algebra
    independently of the oracle, which shares the formula text)."""
    import numpy as np

    from abr_etl_spark.sources.lake import load_table

    row = a7.linreg_normal_eq(spark, SF_ORACLE).collect()[0]
    l = load_table(spark, SF_ORACLE, "lineitem").select(
        F.col("l_quantity").cast("long").alias("x1"),
        F.floor(F.col("l_discount") * 100 + 0.5).cast("long").alias("x2"),
        F.floor(F.col("l_extendedprice") * 100 + 0.5)
        .cast("long")
        .alias("y"),
    )
    pdf = l.toPandas()
    X = np.column_stack(
        [np.ones(len(pdf)), pdf["x1"].to_numpy(), pdf["x2"].to_numpy()]
    ).astype(float)
    beta, *_ = np.linalg.lstsq(X, pdf["y"].to_numpy().astype(float), rcond=None)
    assert row["n"] == len(pdf)
    for got, want in zip((row["b0"], row["b1"], row["b2"]), beta):
        assert abs(got - want) <= max(1e-4, abs(want) * 1e-6), (got, want)


def test_weighted_sample_exactly_k_and_weight_biased(spark):
    """Systematic sampling must pick exactly WS_K units in total, and
    the sampled mean weight must exceed the population mean (heavier
    items are more likely in a weight-proportional sample)."""
    from abr_etl_spark.plans.analytics7 import WS_K, weighted_sample_systematic
    from abr_etl_spark.sources.lake import load_table

    rows = weighted_sample_systematic(spark, SF_ORACLE).collect()
    assert sum(r["n_picks"] for r in rows) == WS_K
    pop_mean = (
        load_table(spark, SF_ORACLE, "orders")
        .agg(F.avg(F.floor(F.col("o_totalprice") * 100 + 0.5)))
        .collect()[0][0]
    )
    sample_mean = sum(r["cents"] * r["n_picks"] for r in rows) / WS_K
    assert sample_mean > pop_mean


def test_basket_pairs_counts_symmetric_and_bounded(spark):
    """Every reported pair count is bounded by each part's own order
    count (a pair can't co-occur more often than either member
    appears)."""
    from abr_etl_spark.plans.analytics7 import basket_pairs
    from abr_etl_spark.sources.lake import load_table

    rows = basket_pairs(spark, SF_ORACLE).collect()
    assert rows and all(r["part_a"] < r["part_b"] for r in rows)
    per_part = {
        r["l_partkey"]: r["n"]
        for r in load_table(spark, SF_ORACLE, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .groupBy("l_partkey")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for r in rows:
        assert r["n_orders"] <= min(per_part[r["part_a"]], per_part[r["part_b"]])
