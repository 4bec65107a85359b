"""Part-5 queries vs the DuckDB oracle, plus plan-shape checks for the
properties the oracle can't see (spine density, salting plan)."""

import pytest
from pyspark.sql import functions as F

from abr_etl_spark.plans import analytics5 as a5
from tests.conftest import SF_ORACLE, assert_matches_oracle


@pytest.mark.parametrize("key", sorted(a5.QUERIES))
def test_analytics5_vs_oracle(spark, ddb, key):
    df = a5.QUERIES[key](spark, SF_ORACLE)
    assert_matches_oracle(df, ddb, a5.ORACLES[key], key)


def test_gap_fill_is_dense(spark):
    """Every user carries the identical, gap-free day count."""
    out = a5.gap_fill_ffill(spark, SF_ORACLE)
    per_user = out.groupBy("user_id").agg(F.count("*").alias("n_days"))
    assert per_user.select("n_days").distinct().count() == 1


def test_salted_join_plan_has_salt_key(spark):
    plan = (
        a5.salted_join_revenue(spark, SF_ORACLE)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "__salt" in plan
    assert "CartesianProduct" not in plan


def test_rfm_segments_quartiles_balanced_and_conserve(spark):
    """Each RFM dimension must partition customers into 4 near-equal
    quartiles (ntile guarantee: sizes differ by at most 1), and the
    census must conserve customers and cents exactly."""
    from abr_etl_spark.plans.analytics5 import rfm_segments
    from abr_etl_spark.sources.lake import load_table
    from tests.conftest import SF_ORACLE
    from pyspark.sql import functions as F

    rows = rfm_segments(spark, SF_ORACLE).collect()
    assert rows
    o = load_table(spark, SF_ORACLE, "orders")
    n_cust = o.select("o_custkey").distinct().count()
    total_cents = o.select(
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long"))
    ).collect()[0][0]
    assert sum(r["n_customers"] for r in rows) == n_cust
    assert sum(r["total_cents"] for r in rows) == total_cents
    for dim in ("r_score", "f_score", "m_score"):
        sizes: dict = {}
        for r in rows:
            sizes[r[dim]] = sizes.get(r[dim], 0) + r["n_customers"]
        assert sorted(sizes) == [1, 2, 3, 4]
        assert max(sizes.values()) - min(sizes.values()) <= 1


@pytest.mark.parametrize(
    "n,dup_every,ascending",
    [(10, 1, True), (17, 3, False), (101, 5, True), (101, 1, False), (3, 1, True)],
)
def test_ntile_distributed_matches_global_ntile(spark, n, dup_every, ascending):
    """_ntile_distributed must reproduce ntile(4) over the global
    (metric, custkey) order bit-for-bit -- including ties straddling
    quartile boundaries (dup_every>1 plants runs of equal metric
    values) and n % 4 != 0 tile-size asymmetry."""
    from pyspark.sql import Window

    rows = [(i, (i * 7919) % (max(n // dup_every, 1))) for i in range(n)]
    df = spark.createDataFrame(rows, "o_custkey long, m long")
    order = [
        F.col("m").asc() if ascending else F.col("m").desc(),
        F.col("o_custkey").asc(),
    ]
    expected = {
        r["o_custkey"]: r["t"]
        for r in df.select(
            "o_custkey", F.ntile(4).over(Window.orderBy(*order)).alias("t")
        ).collect()
    }
    got = {
        r["o_custkey"]: r["__tile"]
        for r in a5._ntile_distributed(
            df, "m", ascending=ascending, n_buckets=8
        ).collect()
    }
    assert got == expected
