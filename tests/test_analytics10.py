"""Round-12 analytics batch 2: DQ forensics + time-series diagnostics.

Each key gets (a) a property test on a constructed lake where the right
answer is known in closed form, and (b) the driver-equivalent oracle
compare at SF_ORACLE.
"""

from __future__ import annotations

import duckdb
import pytest

from abr_etl_spark.plans import analytics10 as a10
from tests.conftest import SF_ORACLE, assert_matches_oracle

_ORDERS_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)

_EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _orders_lake(spark, tmp_path, rows):
    spark.createDataFrame(rows, _ORDERS_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "orders.parquet"))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{tmp_path}/orders.parquet/*.parquet')"
    )
    return con


def _events_lake(spark, tmp_path, rows):
    spark.createDataFrame(rows, _EVENTS_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "events.parquet"))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet/*.parquet')"
    )
    return con


from datetime import datetime, timedelta  # noqa: E402

_T0 = datetime(2024, 1, 1)


# ------------------------------------------------------ benford_first_digit


def test_benford_flags_fabricated_digits(spark, tmp_path):
    """A Benford-distributed priority must score far below a priority
    whose amounts were 'fabricated' with a constant first digit."""
    import math

    rows = []
    # natural: price = 10^(u) for u uniform in [0, 3) -> first digit
    # follows Benford exactly in the continuous limit.
    for i in range(2000):
        u = (i + 0.5) / 2000 * 3
        rows.append(
            (i, 1, "O", round(math.pow(10.0, u), 2), _T0, "natural")
        )
    # fabricated: every amount starts with digit 5.
    for i in range(2000):
        rows.append((10_000 + i, 1, "O", 500.0 + (i % 90), _T0, "fake"))
    con = _orders_lake(spark, tmp_path, rows)
    got = {
        r["o_orderpriority"]: r["chi2_benford"]
        for r in a10.benford_first_digit(spark, str(tmp_path)).collect()
    }
    assert got["natural"] < 30 < got["fake"]
    assert_matches_oracle(
        a10.benford_first_digit(spark, str(tmp_path)),
        con,
        a10.ORACLES["benford_first_digit"],
        "benford_first_digit",
    )


def test_benford_matches_oracle_smoke(spark, ddb):
    assert_matches_oracle(
        a10.benford_first_digit(spark, SF_ORACLE),
        ddb,
        a10.ORACLES["benford_first_digit"],
        "benford_first_digit",
    )


# ------------------------------------------------------ seasonal_index_dow


def test_seasonal_index_flat_series_is_exactly_one(spark, tmp_path):
    """Identical value every day -> every DOW index is exactly 1e6
    (the cross-multiplied integer can not wobble); doubling weekend
    values lifts exactly those two DOW cells."""
    rows = [
        (i, _T0 + timedelta(days=i % 28), i, "t", 10.0, "{}")
        for i in range(280)
    ]
    _events_lake(spark, tmp_path, rows)
    got = a10.seasonal_index_dow(spark, str(tmp_path)).collect()
    assert [r["idx_e6"] for r in got] == [1_000_000] * 7
    # weekend boost: anchor 1992-01-06 is a Monday -> dow 5/6 are Sat/Sun
    rows2 = [
        (
            i,
            _T0 + timedelta(days=i % 28),
            i,
            "t",
            20.0 if ((_T0 + timedelta(days=i % 28)).weekday() >= 5) else 10.0,
            "{}",
        )
        for i in range(280)
    ]
    con = _events_lake(spark, tmp_path, rows2)
    got2 = {r["dow"]: r["idx_e6"] for r in
            a10.seasonal_index_dow(spark, str(tmp_path)).collect()}
    assert got2[5] > 1_000_000 and got2[6] > 1_000_000
    assert all(got2[d] < 1_000_000 for d in range(5))
    assert_matches_oracle(
        a10.seasonal_index_dow(spark, str(tmp_path)),
        con,
        a10.ORACLES["seasonal_index_dow"],
        "seasonal_index_dow",
    )


def test_seasonal_index_matches_oracle_smoke(spark, ddb):
    assert_matches_oracle(
        a10.seasonal_index_dow(spark, SF_ORACLE),
        ddb,
        a10.ORACLES["seasonal_index_dow"],
        "seasonal_index_dow",
    )


# ------------------------------------------- mutual_information_type_dow


def test_mi_zero_under_exact_independence(spark, tmp_path):
    """A perfectly crossed type x dow design has o = r*c/T in every
    cell, so every ln term is ln(1) = 0 and MI is EXACTLY 0.0; pinning
    one type to one DOW makes its contribution strictly positive."""
    rows = []
    eid = 0
    for t in ("a", "b"):
        for d in range(7):
            for _ in range(10):
                rows.append(
                    (eid, _T0 + timedelta(days=d), eid, t, 1.0, "{}")
                )
                eid += 1
    _events_lake(spark, tmp_path, rows)
    got = a10.mutual_information_type_dow(spark, str(tmp_path)).collect()
    assert all(r["mi_part"] == 0.0 for r in got)
    # dependent: type 'c' fires only on one day
    rows += [
        (eid + i, _T0 + timedelta(days=2), i, "c", 1.0, "{}")
        for i in range(70)
    ]
    con = _events_lake(spark, tmp_path, rows)
    got2 = {r["event_type"]: r["mi_part"] for r in
            a10.mutual_information_type_dow(spark, str(tmp_path)).collect()}
    assert got2["c"] > 0.0
    assert_matches_oracle(
        a10.mutual_information_type_dow(spark, str(tmp_path)),
        con,
        a10.ORACLES["mutual_information_type_dow"],
        "mutual_information_type_dow",
    )


def test_mi_matches_oracle_smoke(spark, ddb):
    assert_matches_oracle(
        a10.mutual_information_type_dow(spark, SF_ORACLE),
        ddb,
        a10.ORACLES["mutual_information_type_dow"],
        "mutual_information_type_dow",
    )


# ----------------------------------------------------------- acf_daily_lag


def test_acf_alternating_series_signs(spark, tmp_path):
    """A strict 2-day alternation is anti-correlated at lag 1 and
    positively correlated at lag 2 (signs flip per parity)."""
    rows = []
    for d in range(60):
        v = 100.0 if d % 2 == 0 else 10.0
        rows.append((d, _T0 + timedelta(days=d), d, "alt", v, "{}"))
    con = _events_lake(spark, tmp_path, rows)
    got = {
        r["lag"]: r["acf"]
        for r in a10.acf_daily_lag(spark, str(tmp_path)).collect()
    }
    assert got[1] < -0.9 and got[2] > 0.9
    assert got[3] < -0.9 and got[4] > 0.9
    assert_matches_oracle(
        a10.acf_daily_lag(spark, str(tmp_path)),
        con,
        a10.ORACLES["acf_daily_lag"],
        "acf_daily_lag",
    )


def test_acf_matches_oracle_smoke(spark, ddb):
    assert_matches_oracle(
        a10.acf_daily_lag(spark, SF_ORACLE),
        ddb,
        a10.ORACLES["acf_daily_lag"],
        "acf_daily_lag",
    )


# ---------------------------------------------------- theilsen_slope_daily


def test_theilsen_exact_on_linear_and_robust_to_outlier(spark, tmp_path):
    """On an exactly linear daily series every pairwise slope equals
    the true slope, so the median IS the slope; corrupting ONE day by
    1000x moves fewer than half the pairs, so Theil-Sen is unchanged
    while the mean-based fit would not be."""
    rows = [
        (d, _T0 + timedelta(days=d), d, "lin", 10.0 + 3.0 * d, "{}")
        for d in range(60)
    ]
    _events_lake(spark, tmp_path, rows)
    got = a10.theilsen_slope_daily(spark, str(tmp_path)).collect()
    assert got[0]["slope_e2"] == pytest.approx(300.0)  # 3 dollars = 300 cents
    rows[30] = (30, _T0 + timedelta(days=30), 30, "lin", 99_999.0, "{}")
    con = _events_lake(spark, tmp_path, rows)
    got2 = a10.theilsen_slope_daily(spark, str(tmp_path)).collect()
    assert got2[0]["slope_e2"] == pytest.approx(300.0)
    assert_matches_oracle(
        a10.theilsen_slope_daily(spark, str(tmp_path)),
        con,
        a10.ORACLES["theilsen_slope_daily"],
        "theilsen_slope_daily",
    )


def test_theilsen_window_bounds_pairs(spark, tmp_path):
    """Days outside the trailing TS_WINDOW_DAYS window must not enter
    the pair frame: n_days caps at the window length."""
    rows = [
        (d, _T0 + timedelta(days=d), d, "t", float(d), "{}")
        for d in range(a10.TS_WINDOW_DAYS + 50)
    ]
    _events_lake(spark, tmp_path, rows)
    got = a10.theilsen_slope_daily(spark, str(tmp_path)).collect()
    n = got[0]["n_days"]
    assert n == a10.TS_WINDOW_DAYS
    assert got[0]["n_pairs"] == n * (n - 1) // 2


def test_theilsen_matches_oracle_smoke(spark, ddb):
    assert_matches_oracle(
        a10.theilsen_slope_daily(spark, SF_ORACLE),
        ddb,
        a10.ORACLES["theilsen_slope_daily"],
        "theilsen_slope_daily",
    )


# -------------------------------------------------------- profile_columns


def test_profile_columns_closed_form(spark, tmp_path):
    """Known nulls / distincts / extrema / mode, including the
    numeric-vs-lexicographic trap (keys 9 and 10) and the smallest-
    value tie-break on the mode."""
    rows = [
        (9, 1, "O", 1.0, _T0, "1-URGENT"),
        (10, 1, "P", 2.0, _T0, "1-URGENT"),
        (11, 2, None, 3.0, _T0, "2-HIGH"),
        (12, 2, "F", None, _T0, "2-HIGH"),
    ]
    con = _orders_lake(spark, tmp_path, rows)
    got = {r["col"]: r for r in
           a10.profile_columns(spark, str(tmp_path)).collect()}
    k = got["o_orderkey"]
    assert (k["min_s"], k["max_s"]) == ("9", "12")  # not '10'..'9'
    assert k["n_null"] == 0 and k["n_distinct"] == 4
    s = got["o_orderstatus"]
    assert s["n_null"] == 1 and s["n_distinct"] == 3
    assert s["top_value"] == "F" and s["top_freq"] == 1  # tie -> smallest
    p = got["o_totalprice_e2"]
    assert p["n_null"] == 1 and p["min_s"] == "100" and p["max_s"] == "300"
    assert_matches_oracle(
        a10.profile_columns(spark, str(tmp_path)),
        con,
        a10.ORACLES["profile_columns"],
        "profile_columns",
    )


def test_profile_columns_matches_oracle_smoke(spark, ddb):
    assert_matches_oracle(
        a10.profile_columns(spark, SF_ORACLE),
        ddb,
        a10.ORACLES["profile_columns"],
        "profile_columns",
    )


# ---------------------------------------------------- decompose_trend_dow


def test_decompose_pure_weekly_pattern_remainder_is_one(spark, tmp_path):
    """A pure multiplicative weekly pattern with no trend: every
    contiguous 7-day window sums to the same total, the seasonal
    factors recover the pattern, and the remainder is exactly 1."""
    pat = [700.0, 800.0, 900.0, 1000.0, 1100.0, 1200.0, 1300.0]
    rows = []
    for d in range(28):
        day = _T0 + timedelta(days=d)
        dow = ((day.date() - datetime(1992, 1, 6).date()).days) % 7
        rows.append((d, day, d, "t", pat[dow], "{}"))
    con = _events_lake(spark, tmp_path, rows)
    got = a10.decompose_trend_dow(spark, str(tmp_path)).collect()
    assert len(got) == 22  # 28 days, 3 trimmed each edge
    assert all(r["trend_sum_e2"] == 700000 for r in got)
    assert all(r["remainder"] == pytest.approx(1.0) for r in got)
    assert_matches_oracle(
        a10.decompose_trend_dow(spark, str(tmp_path)),
        con,
        a10.ORACLES["decompose_trend_dow"],
        "decompose_trend_dow",
    )


def test_decompose_gap_excludes_straddling_windows(spark, tmp_path):
    """A missing calendar day must EXCLUDE every 7-row window that
    straddles it (span check) instead of emitting a biased partial
    trend -- pinned against a brute-force recount."""
    days = [d for d in range(28) if d != 14]
    rows = [
        (d, _T0 + timedelta(days=d), d, "t", 100.0, "{}") for d in days
    ]
    _events_lake(spark, tmp_path, rows)
    got = a10.decompose_trend_dow(spark, str(tmp_path)).collect()
    expected = 0
    for i in range(3, len(days) - 3):
        win = days[i - 3 : i + 4]
        if win[-1] - win[0] == 6:
            expected += 1
    assert len(got) == expected


def test_decompose_matches_oracle_smoke(spark, ddb):
    assert_matches_oracle(
        a10.decompose_trend_dow(spark, SF_ORACLE),
        ddb,
        a10.ORACLES["decompose_trend_dow"],
        "decompose_trend_dow",
    )


# ------------------------------------------------- stratified_kfold_assign


def test_kfold_balanced_and_deterministic(spark, tmp_path):
    """Every stratum splits into KFOLD_K folds whose shares sum to ~1
    (floor rounding) and stay within a generous balance band; re-runs
    reproduce the assignment bit-for-bit."""
    rows = [
        (i, _T0 + timedelta(days=i % 7), i, f"t{i % 2}", 1.0, "{}")
        for i in range(2000)
    ]
    con = _events_lake(spark, tmp_path, rows)
    got = a10.stratified_kfold_assign(spark, str(tmp_path)).collect()
    by_type: dict = {}
    for r in got:
        by_type.setdefault(r["event_type"], []).append(r)
    for t, cells in by_type.items():
        assert len(cells) == a10.KFOLD_K
        share_sum = sum(c["share_e6"] for c in cells)
        assert 1_000_000 - a10.KFOLD_K <= share_sum <= 1_000_000
        for c in cells:
            assert 120_000 <= c["share_e6"] <= 280_000, (t, c)
    again = a10.stratified_kfold_assign(spark, str(tmp_path)).collect()
    assert got == again
    assert_matches_oracle(
        a10.stratified_kfold_assign(spark, str(tmp_path)),
        con,
        a10.ORACLES["stratified_kfold_assign"],
        "stratified_kfold_assign",
    )


def test_kfold_matches_oracle_smoke(spark, ddb):
    assert_matches_oracle(
        a10.stratified_kfold_assign(spark, SF_ORACLE),
        ddb,
        a10.ORACLES["stratified_kfold_assign"],
        "stratified_kfold_assign",
    )
