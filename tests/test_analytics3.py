"""Part-3 coverage queries vs the DuckDB oracle, plus the applyInPandas
grouped-map equivalence for zscore."""

import pytest

from abr_etl_spark.plans import analytics3
from tests.conftest import SF_ORACLE, assert_matches_oracle


@pytest.mark.parametrize("key", sorted(analytics3.QUERIES))
def test_analytics3_vs_oracle(spark, ddb, key):
    df = analytics3.QUERIES[key](spark, SF_ORACLE)
    assert_matches_oracle(df, ddb, analytics3.ORACLES[key], key)


def test_zscore_applyinpandas_matches_window(spark):
    """The grouped-map (applyInPandas) formulation of per-user z-score
    returns exactly the window-function result -- demonstrating the
    pandas surface without putting it in the hot path."""
    import pandas as pd

    from abr_etl_spark.sources.lake import load_table

    e = load_table(spark, SF_ORACLE, "events").select(
        "user_id", "event_id", "value"
    )

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        sd = pdf["value"].std(ddof=1)
        z = (pdf["value"] - pdf["value"].mean()) / sd if sd else None
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"],
                "event_id": pdf["event_id"],
                "zscore": (z).round(4),
            }
        )

    via_pandas = {
        (r["user_id"], r["event_id"]): r["zscore"]
        for r in e.groupBy("user_id")
        .applyInPandas(zscore, "user_id long, event_id long, zscore double")
        .collect()
    }
    via_window = {
        (r["user_id"], r["event_id"]): r["zscore"]
        for r in analytics3.zscore_window(spark, SF_ORACLE).collect()
    }
    assert via_pandas.keys() == via_window.keys()
    for k, v in via_window.items():
        pv = via_pandas[k]
        assert (v is None and pv is None) or abs(pv - v) < 1e-9, (k, pv, v)
