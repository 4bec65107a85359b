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
