"""Semi-structured/string queries vs the DuckDB oracle."""

import pytest

from abr_etl_spark.plans import semistructured
from tests.conftest import SF_ORACLE, assert_matches_oracle


@pytest.mark.parametrize("key", sorted(semistructured.QUERIES))
def test_semistructured_vs_oracle(spark, ddb, key):
    df = semistructured.QUERIES[key](spark, SF_ORACLE)
    assert_matches_oracle(df, ddb, semistructured.ORACLES[key], key)


def test_window_funcs2_ignore_nulls_and_rationals(spark):
    """IGNORE NULLS must skip the synthesized NULL cents; percent_rank
    and cume_dist recompute from rank arithmetic."""
    from abr_etl_spark.plans.semistructured import window_funcs2
    from tests.conftest import SF_SMOKE

    rows = window_funcs2(spark, SF_SMOKE).collect()
    assert rows
    by_cust: dict[int, list] = {}
    for r in rows:
        by_cust.setdefault(r.o_custkey, []).append(r)
    for cust, rs in by_cust.items():
        n = len(rs)
        assert all(r.first_nonnull_cents is None or r.first_nonnull_cents > 0
                   for r in rs)
        firsts = {r.first_nonnull_cents for r in rs}
        assert len(firsts) == 1  # constant across the partition
        prs = sorted(r.pct_rank for r in rs)
        assert prs[0] == 0.0
        if n > 1:
            assert abs(prs[-1] - 1.0) < 1e-9
        cds = [r.cdist for r in rs]
        assert all(0 < c <= 1.0 for c in cds)
