"""B-block analytics queries vs the DuckDB oracle at sf0.01 (the same
gate the driver applies)."""

import pytest

from abr_etl_spark.plans import analytics
from tests.conftest import SF_ORACLE, assert_matches_oracle


@pytest.mark.parametrize("key", sorted(analytics.QUERIES))
def test_analytics_vs_oracle(spark, ddb, key):
    df = analytics.QUERIES[key](spark, SF_ORACLE)
    assert_matches_oracle(df, ddb, analytics.ORACLES[key], key)
