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
