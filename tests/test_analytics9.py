"""Round-12 analytics: Poisson-bootstrap confidence intervals."""

from __future__ import annotations

import duckdb

from abr_etl_spark.plans import analytics9 as a9
from tests.conftest import SF_ORACLE, assert_matches_oracle


def test_bootstrap_ci_brackets_mean_and_is_deterministic(spark, ddb):
    """Every type's CI must bracket its point mean (the bootstrap
    distribution is centred there), the interval must be non-trivial
    on real spread, and a second run reproduces the rows exactly (the
    weights are hash-derived, not RNG)."""
    rows = a9.bootstrap_ci_poisson(spark, SF_ORACLE).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["lo_e2"] <= r["mean_e2"] <= r["hi_e2"], r
        assert r["lo_e2"] < r["hi_e2"], r
    again = a9.bootstrap_ci_poisson(spark, SF_ORACLE).collect()
    assert rows == again
    assert_matches_oracle(
        a9.bootstrap_ci_poisson(spark, SF_ORACLE),
        ddb,
        a9.ORACLES["bootstrap_ci_poisson"],
        "bootstrap_ci_poisson",
    )


def test_bootstrap_ci_collapses_on_constant_values(spark, tmp_path):
    """Constant values -> every replicate mean equals the value -> a
    zero-width CI pinned at the mean; CI width on a dispersed type is
    strictly positive (the interval responds to variance, not n)."""
    rows = [
        (i, "2024-01-01 00:00:00", i % 7, "const", 5.0, "{}")
        for i in range(200)
    ] + [
        (1000 + i, "2024-01-01 00:00:00", i % 7, "spread", float(i % 100), "{}")
        for i in range(200)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).selectExpr(
        "event_id",
        "CAST(ts AS TIMESTAMP) AS ts",
        "user_id",
        "event_type",
        "value",
        "props",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet/*.parquet')"
    )
    try:
        got = {
            r["event_type"]: r
            for r in a9.bootstrap_ci_poisson(spark, str(tmp_path)).collect()
        }
        assert got["const"]["lo_e2"] == got["const"]["hi_e2"] == 500
        assert got["const"]["mean_e2"] == 500
        assert got["spread"]["lo_e2"] < got["spread"]["hi_e2"]
        assert_matches_oracle(
            a9.bootstrap_ci_poisson(spark, str(tmp_path)),
            con,
            a9.ORACLES["bootstrap_ci_poisson"],
            "bootstrap_ci_poisson",
        )
    finally:
        con.close()
