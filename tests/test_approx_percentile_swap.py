"""The implemented approx-percentile swap (r7 verdict item 2):
``exact=False`` on anomaly_mad / daily_value_bands / conversion_lag_stats
runs approx_percentile at PCT_ACCURACY instead of exact percentile_cont.

Assertions:
- schema is mode-invariant (the approx path casts back to double);
- RANK-ERROR BOUND: every approx percentile value, ranked inside its own
  group's raw data, lands within ``n/accuracy + 1`` ranks of the target
  q*n (the Greenwald-Khanna guarantee; +1 absorbs cont-vs-disc
  discretization -- approx returns an actual element, exact
  interpolates);
- the exact default is byte-identical to the pre-swap plan (the oracle
  gate covers it; here we just re-run it once as a smoke anchor).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from abr_etl_spark.plans import analytics7
from tests.conftest import SF_SMOKE


def _rank_bound_ok(values: list[float], approx: float, q: float) -> bool:
    """approx must sit within n/PCT_ACCURACY (+1 for cont-vs-disc) ranks
    of q*n among the group's raw values."""
    n = len(values)
    if n == 0:
        return approx is None
    slack = n / analytics7.PCT_ACCURACY + 1.0
    below = sum(1 for v in values if v < approx - 1e-9)
    at_or_below = sum(1 for v in values if v <= approx + 1e-9)
    target = q * (n - 1)  # percentile_cont's rank convention
    # the approx value's plausible rank interval is [below, at_or_below-1]
    return below - slack <= target <= (at_or_below - 1) + slack


def test_anomaly_mad_approx_rank_bound(spark):
    exact = analytics7.anomaly_mad(spark, SF_SMOKE).collect()
    approx = analytics7.anomaly_mad(spark, SF_SMOKE, exact=False).collect()
    assert [r.asDict().keys() for r in approx] == [
        r.asDict().keys() for r in exact
    ]
    raw = (
        analytics7.load_table(spark, SF_SMOKE, "customer")
        .select("c_mktsegment", "c_acctbal")
        .collect()
    )
    by_seg: dict[str, list[float]] = {}
    for r in raw:
        by_seg.setdefault(r.c_mktsegment, []).append(float(r.c_acctbal))
    for row in approx:
        vals = by_seg[row.c_mktsegment]
        assert _rank_bound_ok(vals, row.med, 0.5), row
        devs = [abs(v - row.med) for v in vals]
        assert _rank_bound_ok(devs, row.mad, 0.5), row
        assert row.n == len(vals)


def test_daily_value_bands_approx_rank_bound(spark):
    exact = analytics7.daily_value_bands(spark, SF_SMOKE).collect()
    approx = analytics7.daily_value_bands(
        spark, SF_SMOKE, exact=False
    ).collect()
    assert len(approx) == len(exact)
    assert approx[0].asDict().keys() == exact[0].asDict().keys()
    raw = (
        analytics7.load_table(spark, SF_SMOKE, "events")
        .where(F.col("event_type") == "purchase")
        .select(F.date_format("ts", "yyyy-MM-dd").alias("day"), "value")
        .collect()
    )
    by_day: dict[str, list[float]] = {}
    for r in raw:
        by_day.setdefault(r.day, []).append(float(r.value))
    for row in approx:
        vals = by_day[row.day]
        assert row.n == len(vals)
        assert _rank_bound_ok(vals, row.p50, 0.5), row
        assert _rank_bound_ok(vals, row.p90, 0.9), row


def test_conversion_lag_approx_rank_bound(spark):
    exact = analytics7.conversion_lag_stats(spark, SF_SMOKE).collect()[0]
    approx = analytics7.conversion_lag_stats(
        spark, SF_SMOKE, exact=False
    ).collect()[0]
    assert approx.asDict().keys() == exact.asDict().keys()
    assert approx.n_conversions == exact.n_conversions
    assert approx.min_s == exact.min_s
    assert approx.max_s == exact.max_s
    lags = [
        float(r.lag_s)
        for r in analytics7._touches(spark, SF_SMOKE)
        .groupBy("purchase_id")
        .agg(F.min("gap_s").alias("lag_s"))
        .collect()
    ]
    assert _rank_bound_ok(lags, approx.med_s, 0.5)
    assert _rank_bound_ok(lags, approx.p90_s, 0.9)


def test_exact_default_unchanged(spark):
    """The queries() entries take the default path -- one smoke anchor
    that exact mode still produces the 5-segment report."""
    rows = analytics7.anomaly_mad(spark, SF_SMOKE).collect()
    assert len(rows) == 5
    assert all(not math.isnan(r.med) for r in rows)
