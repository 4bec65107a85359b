"""Part-4 queries (TPC-H join/agg shapes + training staples) vs the
DuckDB oracle."""

import pytest

from abr_etl_spark.plans import analytics4 as a4
from tests.conftest import SF_ORACLE, assert_matches_oracle


@pytest.mark.parametrize("key", sorted(a4.QUERIES))
def test_analytics4_vs_oracle(spark, ddb, key):
    df = a4.QUERIES[key](spark, SF_ORACLE)
    assert_matches_oracle(df, ddb, a4.ORACLES[key], key)
