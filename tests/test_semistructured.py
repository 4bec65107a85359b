"""Semi-structured/string queries vs the DuckDB oracle."""

import pytest

from abr_etl_spark.plans import semistructured
from tests.conftest import SF_ORACLE, assert_matches_oracle


@pytest.mark.parametrize("key", sorted(semistructured.QUERIES))
def test_semistructured_vs_oracle(spark, ddb, key):
    df = semistructured.QUERIES[key](spark, SF_ORACLE)
    assert_matches_oracle(df, ddb, semistructured.ORACLES[key], key)
