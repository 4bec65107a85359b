"""Extended B-block queries vs the DuckDB oracle at sf0.01."""

import pytest

from abr_etl_spark.plans import analytics2
from tests.conftest import SF_ORACLE, assert_matches_oracle


@pytest.mark.parametrize("key", sorted(analytics2.QUERIES))
def test_analytics2_vs_oracle(spark, ddb, key):
    df = analytics2.QUERIES[key](spark, SF_ORACLE)
    assert_matches_oracle(df, ddb, analytics2.ORACLES[key], key)
