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


def _events_lake(spark, tmp_path, rows):
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
    return con


def _docs_lake(spark, tmp_path, docs):
    spark.createDataFrame(
        docs,
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    return con


def test_psi_stable_vs_shifted(spark, tmp_path):
    """A source sharing the corpus length distribution sits under the
    conventional 0.1 'stable' line; a fully shifted source blows past
    the 0.25 'significant drift' line."""
    docs = (
        [(i, "x", "en", "stable", 100 + (i % 10)) for i in range(200)]
        + [(500 + i, "x", "en", "mirror", 100 + (i % 10)) for i in range(200)]
        + [(900 + i, "x", "en", "shifted", 900 + (i % 10)) for i in range(100)]
    )
    con = _docs_lake(spark, tmp_path, docs)
    try:
        from abr_etl_spark.plans import analytics9 as a9

        rows = {
            r["source"]: r["psi"]
            for r in a9.psi_drift_by_source(spark, str(tmp_path)).collect()
        }
        assert rows["shifted"] > 0.25
        assert rows["stable"] < rows["shifted"]
        assert_matches_oracle(
            a9.psi_drift_by_source(spark, str(tmp_path)),
            con,
            a9.ORACLES["psi_drift_by_source"],
            "psi_drift_by_source",
        )
    finally:
        con.close()


def test_psi_matches_oracle_smoke(spark, ddb):
    assert_matches_oracle(
        a9.psi_drift_by_source(spark, SF_ORACLE),
        ddb,
        a9.ORACLES["psi_drift_by_source"],
        "psi_drift_by_source",
    )


def test_cusum_finds_level_shift_day(spark, tmp_path):
    """A series doubling its daily value on day 6 of 10 peaks its
    cumulative deviation exactly at the last pre-shift day (day 5); a
    perfectly uniform series has deviation exactly 0 (integer algebra,
    no epsilon)."""
    rows = []
    eid = 0
    for day in range(1, 11):
        v = 10.0 if day <= 5 else 20.0
        rows.append((eid, f"2024-01-{day:02d} 12:00:00", 1, "shift", v, "{}"))
        eid += 1
        rows.append((eid, f"2024-01-{day:02d} 12:00:00", 1, "flat", 7.0, "{}"))
        eid += 1
    con = _events_lake(spark, tmp_path, rows)
    try:
        from abr_etl_spark.plans import analytics9 as a9

        got = {
            r["event_type"]: r
            for r in a9.cusum_changepoint_daily(spark, str(tmp_path)).collect()
        }
        assert got["shift"]["cp_date"] == "2024-01-05"
        assert got["flat"]["max_abs_dev"] == 0
        assert got["flat"]["cp_date"] == "2024-01-01"  # tie -> earliest
        assert_matches_oracle(
            a9.cusum_changepoint_daily(spark, str(tmp_path)),
            con,
            a9.ORACLES["cusum_changepoint_daily"],
            "cusum_changepoint_daily",
        )
    finally:
        con.close()


def test_cusum_matches_oracle_smoke(spark, ddb):
    assert_matches_oracle(
        a9.cusum_changepoint_daily(spark, SF_ORACLE),
        ddb,
        a9.ORACLES["cusum_changepoint_daily"],
        "cusum_changepoint_daily",
    )


def test_anova_zero_when_group_means_equal(spark, tmp_path):
    """Identical per-group value multisets -> SSB exactly 0 -> F = 0
    (integer sums make it exact, not epsilon-close); separated means ->
    F far above any significance line."""
    rows = []
    eid = 0
    for grp_vals in (("a", [1.0, 2.0]), ("b", [1.0, 2.0])):
        for v in grp_vals[1]:
            rows.append((eid, "2024-01-01 00:00:00", 1, grp_vals[0], v, "{}"))
            eid += 1
    con = _events_lake(spark, tmp_path, rows)
    try:
        from abr_etl_spark.plans import analytics9 as a9

        r = a9.anova_f_event_value(spark, str(tmp_path)).collect()[0]
        assert (r["n"], r["k"], r["f"]) == (4, 2, 0.0)
        assert_matches_oracle(
            a9.anova_f_event_value(spark, str(tmp_path)),
            con,
            a9.ORACLES["anova_f_event_value"],
            "anova_f_event_value",
        )
    finally:
        con.close()
    rows2 = []
    for i in range(20):
        rows2.append((i, "2024-01-01 00:00:00", 1, "lo", 1.0 + (i % 2), "{}"))
        rows2.append(
            (100 + i, "2024-01-01 00:00:00", 1, "hi", 100.0 + (i % 2), "{}")
        )
    con2 = _events_lake(spark, tmp_path, rows2)
    try:
        from abr_etl_spark.plans import analytics9 as a9

        r2 = a9.anova_f_event_value(spark, str(tmp_path)).collect()[0]
        assert r2["f"] > 1000
    finally:
        con2.close()


def test_anova_matches_oracle_smoke(spark, ddb):
    assert_matches_oracle(
        a9.anova_f_event_value(spark, SF_ORACLE),
        ddb,
        a9.ORACLES["anova_f_event_value"],
        "anova_f_event_value",
    )


def test_mannwhitney_complete_separation(spark, tmp_path):
    """Group a (even user_id) entirely below group b: U1 = 0 exactly
    (u2_a = 0) and z strongly negative; the hand ranks are tiny enough
    to verify by eye (a = {1, 2}, b = {3, 4} -> R1 = 3, U1 = 0)."""
    rows = [
        (0, "2024-01-01 00:00:00", 0, "t", 1.0, "{}"),
        (1, "2024-01-01 00:00:00", 2, "t", 2.0, "{}"),
        (2, "2024-01-01 00:00:00", 1, "t", 3.0, "{}"),
        (3, "2024-01-01 00:00:00", 3, "t", 4.0, "{}"),
    ]
    con = _events_lake(spark, tmp_path, rows)
    try:
        from abr_etl_spark.plans import analytics9 as a9

        r = a9.mannwhitney_u_value(spark, str(tmp_path)).collect()[0]
        assert (r["n_a"], r["n_b"], r["u2_a"]) == (2, 2, 0)
        assert r["z"] < 0
        assert_matches_oracle(
            a9.mannwhitney_u_value(spark, str(tmp_path)),
            con,
            a9.ORACLES["mannwhitney_u_value"],
            "mannwhitney_u_value",
        )
    finally:
        con.close()


def test_mannwhitney_matches_oracle_smoke(spark, ddb):
    assert_matches_oracle(
        a9.mannwhitney_u_value(spark, SF_ORACLE),
        ddb,
        a9.ORACLES["mannwhitney_u_value"],
        "mannwhitney_u_value",
    )


def test_mannwhitney_degenerate_all_tied_yields_null_z(spark, tmp_path):
    """Every value identical (the all-NULL payload lake collapses to
    this): the tie correction removes ALL variance, so z must be NULL
    -- not a divide-by-zero (degenerate-lake net, r12)."""
    import duckdb as _duckdb

    rows = [(i, "2024-01-01 00:00:00", i, "t", None, "{}")
            for i in range(40)]
    spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id",
        "event_type", "value", "props",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    got = a9.mannwhitney_u_value(spark, str(tmp_path)).collect()[0]
    assert got["z"] is None
    assert got["n_a"] + got["n_b"] == 40
    con = _duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet/*.parquet')"
    )
    assert_matches_oracle(
        a9.mannwhitney_u_value(spark, str(tmp_path)),
        con,
        a9.ORACLES["mannwhitney_u_value"],
        "mannwhitney_u_value",
    )
