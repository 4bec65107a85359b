"""Round-13 analytics batch: Holt-Winters (Brown) double smoothing."""

from __future__ import annotations

from datetime import datetime, timedelta

from abr_etl_spark.plans import analytics12 as a12
from tests.conftest import SF_ORACLE, assert_matches_oracle

_E_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

_T0 = datetime(2024, 1, 1)


def _daily_events(spark, values, event_type="purchase"):
    rows = [
        (i, _T0 + timedelta(days=i), 1, event_type, float(v), None)
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(rows, _E_SCHEMA)


def _lake(spark, tmp_path, values):
    d = tmp_path / "lake"
    d.mkdir(parents=True)
    _daily_events(spark, values).coalesce(1).write.parquet(
        str(d / "events.parquet")
    )
    return str(d)


def test_hw_constant_series_is_flat(spark, tmp_path):
    """Past warm-up (W observations), a constant series smooths to
    itself: level == v, trend == 0, forecast == v -- the closed-form
    weights sum to their own denominators by construction."""
    v = 7.5
    out = a12.holt_winters_forecast(
        spark, _lake(spark, tmp_path, [v] * (a12.HW_W + 4))
    ).collect()
    assert len(out) == a12.HW_W + 4
    v_e4 = round(v * 10000)
    for r in out[a12.HW_W - 1 :]:
        assert r["level_e4"] == v_e4
        assert r["trend_e4"] == 0
        assert r["forecast_e4"] == v_e4


def test_hw_trend_sign_tracks_the_series(spark, tmp_path):
    """A strictly rising series shows positive trend and forecast >
    level; a strictly falling one shows negative trend (the sign-safe
    floor division must not bias negatives toward zero)."""
    rising = a12.holt_winters_forecast(
        spark, _lake(spark, tmp_path, [float(10 * (i + 1)) for i in range(12)])
    ).collect()
    for r in rising[a12.HW_W - 1 :]:
        assert r["trend_e4"] > 0
        assert r["forecast_e4"] > r["level_e4"]
    falling = a12.holt_winters_forecast(
        spark,
        _lake(spark, tmp_path.joinpath("f"), [float(10 * (12 - i)) for i in range(12)]),
    ).collect()
    for r in falling[a12.HW_W - 1 :]:
        assert r["trend_e4"] < 0


def test_hw_matches_oracle_smoke(spark, ddb):
    assert_matches_oracle(
        a12.holt_winters_forecast(spark, SF_ORACLE),
        ddb,
        a12.ORACLES["holt_winters_forecast"],
        key="holt_winters_forecast",
    )


def test_gini_known_values(spark, tmp_path):
    """Hand-checkable Gini: equal spends => 0; one whale holding all
    the mass among n customers => (n-1)/n."""
    import pathlib

    def lake(sub, rows):
        d = tmp_path / sub
        d.mkdir(parents=True)
        spark.createDataFrame(
            rows,
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp, "
            "o_orderpriority string",
        ).coalesce(1).write.parquet(str(d / "orders.parquet"))
        return str(d)

    equal = lake(
        "eq", [(i, i, "O", 100.0, _T0, "1-URGENT") for i in range(10)]
    )
    out = a12.gini_concentration(spark, equal).collect()
    assert len(out) == 1 and out[0]["gini_e6"] == 0

    whale = lake(
        "wh",
        [(0, 0, "O", 1000.0, _T0, "1-URGENT")]
        + [(i, i, "O", 0.01, _T0, "1-URGENT") for i in range(1, 5)],
    )
    row = a12.gini_concentration(spark, whale).collect()[0]
    # n=5, near-total concentration: G just under (n-1)/n = 0.8
    assert 760_000 < row["gini_e6"] <= 800_000


def test_gini_matches_oracle_smoke(spark, ddb):
    assert_matches_oracle(
        a12.gini_concentration(spark, SF_ORACLE),
        ddb,
        a12.ORACLES["gini_concentration"],
        key="gini_concentration",
    )


def test_kendall_perfect_orderings(spark, tmp_path):
    """A series where daily count and value rise together has tau = 1;
    value falling while count rises gives tau = -1 (sign-safe floor)."""
    rows = []
    # type 'up': both series strictly rise day over day (i events of
    # value 100 on day i); type 'down': count rises, value total falls
    eid = 0
    for i in range(1, 5):
        for _ in range(i):
            rows.append((eid, _T0 + timedelta(days=i), 1, "up", 100.0, None))
            eid += 1
        for _ in range(i):
            # per-event value 100/i^2 makes the DAILY TOTAL ~100/i --
            # strictly falling while the count strictly rises
            rows.append(
                (eid, _T0 + timedelta(days=i), 1, "down", 100.0 / (i * i), None)
            )
            eid += 1
    d = tmp_path / "lake"
    d.mkdir()
    spark.createDataFrame(rows, _E_SCHEMA).coalesce(1).write.parquet(
        str(d / "events.parquet")
    )
    out = {r["event_type"]: r for r in a12.kendall_tau_daily(spark, str(d)).collect()}
    assert out["up"]["tau_e6"] == 1_000_000
    assert out["up"]["concordant"] == 6 and out["up"]["discordant"] == 0
    assert out["down"]["tau_e6"] == -1_000_000


def test_kendall_matches_oracle_smoke(spark, ddb):
    assert_matches_oracle(
        a12.kendall_tau_daily(spark, SF_ORACLE),
        ddb,
        a12.ORACLES["kendall_tau_daily"],
        key="kendall_tau_daily",
    )


def test_runs_test_counts_runs(spark, tmp_path):
    """A strictly alternating series maximizes runs (R = n_moves); a
    monotone series collapses to one run; an all-up series NULLs z
    (m = 0 -- the degenerate guard)."""
    alt = [100.0, 200.0, 100.0, 200.0, 100.0, 200.0, 100.0]
    mono = [float(10 * (i + 1)) for i in range(7)]
    rows = []
    for i, (a, m) in enumerate(zip(alt, mono)):
        rows.append((2 * i, _T0 + timedelta(days=i), 1, "alt", a, None))
        rows.append((2 * i + 1, _T0 + timedelta(days=i), 1, "mono", m, None))
    d = tmp_path / "lake"
    d.mkdir()
    spark.createDataFrame(rows, _E_SCHEMA).coalesce(1).write.parquet(
        str(d / "events.parquet")
    )
    out = {r["event_type"]: r for r in a12.runs_test_daily(spark, str(d)).collect()}
    assert out["alt"]["n_runs"] == 6  # every move flips
    assert out["alt"]["z_e6"] is not None and out["alt"]["z_e6"] > 0
    assert out["mono"]["n_runs"] == 1 and out["mono"]["n_down"] == 0
    assert out["mono"]["z_e6"] is None  # m = 0: variance undefined


def test_runs_test_matches_oracle_smoke(spark, ddb):
    assert_matches_oracle(
        a12.runs_test_daily(spark, SF_ORACLE),
        ddb,
        a12.ORACLES["runs_test_daily"],
        key="runs_test_daily",
    )


def test_winsorized_mean_clamps_the_whale(spark, tmp_path):
    """A single extreme value moves the raw mean but barely the
    winsorized one; the bounds bracket the mass."""
    vals = [10.0] * 19 + [10000.0]
    rows = [
        (i, _T0 + timedelta(minutes=i), 1, "purchase", v, None)
        for i, v in enumerate(vals)
    ]
    d = tmp_path / "lake"
    d.mkdir()
    spark.createDataFrame(rows, _E_SCHEMA).coalesce(1).write.parquet(
        str(d / "events.parquet")
    )
    row = a12.winsorized_mean_by_type(spark, str(d)).collect()[0]
    raw_mean_e4 = round(sum(vals) / len(vals) * 10000)
    assert row["winsorized_mean_e4"] < raw_mean_e4 / 5
    assert row["lo_cents"] <= 1000 <= row["hi_cents"]


def test_winsorized_matches_oracle_smoke(spark, ddb):
    assert_matches_oracle(
        a12.winsorized_mean_by_type(spark, SF_ORACLE),
        ddb,
        a12.ORACLES["winsorized_mean_by_type"],
        key="winsorized_mean_by_type",
    )
