"""Part-8 queries vs the DuckDB oracle, plus the properties the oracle
can't see (Bloom no-false-negatives, z-order locality, HLL accuracy,
Gini bounds, winsorization direction)."""

import pytest
from pyspark.sql import functions as F

from abr_etl_spark.plans import analytics8 as a8
from tests.conftest import SF_ORACLE, SF_SMOKE, assert_matches_oracle


@pytest.mark.parametrize("key", sorted(a8.QUERIES))
def test_analytics8_vs_oracle(spark, ddb, key):
    df = a8.QUERIES[key](spark, SF_ORACLE)
    assert_matches_oracle(df, ddb, a8.ORACLES[key], key)


def test_hll_estimate_in_regime(spark):
    """At sf0.01 (1000 distinct ordering customers >> 2.5m) the raw HLL
    estimate must land within the 3-sigma band of the m=16 standard
    error (1.04/sqrt(16) ~ 26%)."""
    from abr_etl_spark.sources.lake import load_table

    est = a8.hll_distinct(spark, SF_ORACLE).collect()[0].est
    true = (
        load_table(spark, SF_ORACLE, "orders")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert abs(est - true) / true < 3 * 1.04 / (a8.HLL_M**0.5)


def test_bloom_no_false_negatives_and_fp_rate(spark):
    """Every present key flags (the Bloom guarantee); the absent
    false-positive rate stays within ~4x of the theoretical
    (1 - e^-kn/m)^k for this geometry."""
    rows = {
        r.probe_kind: r for r in a8.bloom_membership(spark, SF_ORACLE).collect()
    }
    present = rows["present"]
    assert present.n_flagged == present.n_probes
    absent = rows["absent"]
    n_keys = present.n_probes
    import math

    fp_theory = (1 - math.exp(-a8.BLOOM_K * n_keys / a8.BLOOM_M)) ** a8.BLOOM_K
    assert absent.n_flagged / absent.n_probes <= max(4 * fp_theory, 0.02)


def test_zorder_buckets_are_local_in_both_dims(spark):
    """Each z-bucket's (x, y) extent is bounded by the bucket's
    rectangle side -- the property that makes min/max stats prune on
    EITHER dimension."""
    side = 1 << (a8.ZBUCKET_SHIFT // 2)  # 4096 for shift 24
    for r in a8.zorder_layout(spark, SF_ORACLE).collect():
        assert r.max_x - r.min_x < side
        assert r.max_y - r.min_y < side


def test_gini_bounds_and_known_values(spark):
    """0 <= gini < 1 for positive revenues, and the formula reproduces
    hand-computed values on a tiny frame."""
    for r in a8.gini_nation_revenue(spark, SF_SMOKE).collect():
        assert 0.0 <= r.gini < 1.0
    # equal revenues -> gini 0 (formula check via local arithmetic)
    n, revs = 4, [100, 100, 100, 100]
    sr = sum(revs)
    swr = sum((i + 1) * v for i, v in enumerate(sorted(revs)))
    assert abs((2.0 * swr - (n + 1.0) * sr) / (n * sr)) < 1e-12


def test_winsorized_mean_between_cuts_and_toward_center(spark):
    """The winsorized mean sits within the clip interval."""
    for r in a8.winsorized_mean(spark, SF_ORACLE).collect():
        assert r.cut_lo_c * 100 <= r.wmean_e4 <= r.cut_hi_c * 100


def test_session_paths_cover_all_sessions(spark):
    """Path census at an uncapped top-k conserves the session count."""
    from abr_etl_spark.sources.lake import load_table

    rows = a8.session_paths_topk(spark, SF_SMOKE).collect()
    assert rows and all(r.n_sessions >= 1 for r in rows)
    assert rows == sorted(
        rows, key=lambda r: (-r.n_sessions, r.path)
    )


def test_ab_test_counts_partition_events(spark):
    from abr_etl_spark.sources.lake import load_table

    r = a8.ab_test_conversion(spark, SF_ORACLE).collect()[0]
    total = load_table(spark, SF_ORACLE, "events").count()
    assert r.n_a + r.n_b == total
    assert 0 <= r.conv_a <= r.n_a and 0 <= r.conv_b <= r.n_b


def test_chi2_nonnegative_dof(spark):
    r = a8.chi2_event_dow(spark, SF_ORACLE).collect()[0]
    assert r.chi2 >= 0.0
    assert r.dof == (r.n_rows - 1) * (r.n_cols - 1) > 0


def test_kmv_set_ops_estimates_near_truth(spark):
    """At sf0.01 both user sets exceed k, so every estimate is a real
    sketch estimate; KMV with k=64 has ~12.6% sigma -- assert 4-sigma
    bands against exact set algebra."""
    from abr_etl_spark.sources.lake import load_table

    r = a8.kmv_set_ops(spark, SF_ORACLE).collect()[0]
    e = load_table(spark, SF_ORACLE, "events")
    clicks = {
        x.user_id
        for x in e.where(F.col("event_type") == "click")
        .select("user_id").distinct().collect()
    }
    buys = {
        x.user_id
        for x in e.where(F.col("event_type") == "purchase")
        .select("user_id").distinct().collect()
    }
    sigma = 4 * 1.0 / (a8.KMV_SET_K**0.5)
    for est, true in [
        (r.est_a, len(clicks)),
        (r.est_b, len(buys)),
        (r.est_union, len(clicks | buys)),
        (r.est_intersection, len(clicks & buys)),
    ]:
        assert abs(est - true) / max(true, 1) < max(sigma, 0.5), (est, true)


def test_kmv_set_ops_exact_below_k(spark):
    """At sf0.001 the sets are tiny (15 users) -- the degenerate guard
    must return EXACT counts."""
    from abr_etl_spark.sources.lake import load_table

    r = a8.kmv_set_ops(spark, SF_SMOKE).collect()[0]
    e = load_table(spark, SF_SMOKE, "events")
    clicks = {
        x.user_id
        for x in e.where(F.col("event_type") == "click")
        .select("user_id").distinct().collect()
    }
    buys = {
        x.user_id
        for x in e.where(F.col("event_type") == "purchase")
        .select("user_id").distinct().collect()
    }
    assert r.est_a == float(len(clicks))
    assert r.est_b == float(len(buys))
    assert r.est_union == float(len(clicks | buys))
    assert abs(r.est_intersection - len(clicks & buys)) < 1e-6


def test_hll_sliding_first_day_equals_single_day_sketch(spark):
    """Day 1's trailing window contains only day 1, so est_7d must
    equal the single-day register estimate; n_days ramps 1..7 then
    holds (consecutive-day data)."""
    rows = a8.hll_sliding_distinct(spark, SF_ORACLE).collect()
    assert rows[0].n_days == 1
    ramp = [r.n_days for r in rows[:7]]
    assert ramp == sorted(ramp)
    assert all(r.n_days <= a8.HLL_WINDOW_DAYS for r in rows)
    # single-day recompute for day 1 via the same shared hash
    from abr_etl_spark.sources.lake import load_table

    e = load_table(spark, SF_ORACLE, "events")
    day1 = rows[0].day
    h = f"({a8._hll_hash_sql('user_id')})"
    regs = (
        e.where(F.date_format("ts", "yyyy-MM-dd") == day1)
        .selectExpr(
            f"{h} % {a8.HLL_M} AS bucket",
            f"{a8._hll_rank_sql(f'{h} DIV {a8.HLL_M}')} AS rank",
        )
        .groupBy("bucket")
        .agg(F.max("rank").alias("mr"))
        .collect()
    )
    S = (a8.HLL_M - len(regs)) + sum(2.0 ** -r.mr for r in regs)
    assert abs(rows[0].est_7d - round(a8.HLL_ALPHA_M2 / S, 4)) < 1e-9


def test_hll_sliding_window_grows_estimate(spark):
    """A trailing 7-day union can never estimate fewer distincts than
    the max single constituent day (register-wise max dominance)."""
    rows = {r.day: r for r in a8.hll_sliding_distinct(spark, SF_ORACLE).collect()}
    assert len(rows) >= 8
    # monotone dominance spot-check: with near-constant daily traffic,
    # the full 7-day windows should estimate more than day 1 alone
    full = [r for r in rows.values() if r.n_days == a8.HLL_WINDOW_DAYS]
    day1 = min(rows)
    assert full and all(r.est_7d >= rows[day1].est_7d for r in full)


def test_funnel_time_bounded_vs_bruteforce_triples(spark):
    """The two-window existence rule equals the brute-force 3-way
    self-join semantics: a user qualifies iff SOME (view, click,
    purchase) chain has both hops within the bound."""
    from abr_etl_spark.sources.lake import load_table

    r = a8.funnel_time_bounded(spark, SF_SMOKE).collect()[0]
    rows = (
        load_table(spark, SF_SMOKE, "events")
        .select("user_id", "event_type", F.col("ts").cast("long").alias("t"))
        .collect()
    )
    by_user: dict[int, dict[str, list[int]]] = {}
    for x in rows:
        by_user.setdefault(x.user_id, {}).setdefault(x.event_type, []).append(x.t)
    n_q = 0
    for u, ev in by_user.items():
        views = sorted(ev.get("view", []))
        buys = sorted(ev.get("purchase", []))
        ok = False
        for c in ev.get("click", []):
            if any(0 <= c - v <= a8.FUNNEL_STEP_S for v in views) and any(
                0 <= p - c <= a8.FUNNEL_STEP_S for p in buys
            ):
                ok = True
                break
        n_q += ok
    assert r.n_users_qualified == n_q
    assert r.n_users == len(by_user)


@pytest.mark.parametrize("n_true", [6, 12])
def test_hll_linear_counting_small_range(spark, tmp_path, n_true):
    """Regime boundary: below 2.5m distinct keys the linear-counting
    branch must be ACTIVE (est equals one of the m*ln(m/V) literals),
    agree bit-for-bit with the DuckDB oracle on the same parquet, and
    beat the raw estimator against the truth."""
    import duckdb

    import datetime as dt

    spark.createDataFrame(
        [(int(k), dt.datetime(2024, 1, 1), 1.0)
         for k in range(7, 7 + n_true)],
        "o_custkey long, o_orderdate timestamp, o_totalprice double",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    row = a8.hll_distinct(spark, str(tmp_path)).collect()[0]
    assert row.n_filled < a8.HLL_M  # V > 0: the correction regime
    lc_values = {
        float(lit) for lit in a8._HLL_LC_LIT.values()
    }
    assert row.est in lc_values  # linear-counting branch taken
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{tmp_path}/orders.parquet/*.parquet')"
    )
    want = con.execute(a8.ORACLES["hll_distinct"]).df()
    con.close()
    assert float(want["est"][0]) == row.est
    assert int(want["n_filled"][0]) == row.n_filled
    # the correction lands within 35% of truth at these tiny n (raw
    # m=16 small-range bias is far worse; exactness is not the claim)
    assert abs(row.est - n_true) / n_true < 0.35


def test_hll_raw_branch_above_threshold(spark, tmp_path):
    """Well above 2.5m distinct keys the estimator must stay on the raw
    branch: est is NOT a linear-counting literal and matches the raw
    formula recomputed from the registers."""
    import datetime as dt

    spark.createDataFrame(
        [(int(k) * 911 + 3, dt.datetime(2024, 1, 1), 1.0) for k in range(5000)],
        "o_custkey long, o_orderdate timestamp, o_totalprice double",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    row = a8.hll_distinct(spark, str(tmp_path)).collect()[0]
    lc_values = {float(lit) for lit in a8._HLL_LC_LIT.values()}
    assert row.est not in lc_values
    assert row.est > a8.HLL_LC_THRESHOLD


def test_hll_runtime_ln_variant_cross_engine_parity(spark):
    """The production-m estimator (runtime ln, round-to-4): identical
    values across Spark and DuckDB for EVERY possible empty-register
    count at m=1024, and it agrees with the m=16 literal table where
    both apply."""
    import duckdb

    m = 1024
    alpha_m2 = 0.7213 / (1 + 1.079 / m) * m * m
    expr = a8.hll_est_sql_runtime_ln("V", "S", m=m, alpha_m2=alpha_m2)
    got = {
        r.V: r.est
        for r in spark.range(1, m).selectExpr(
            "CAST(id AS BIGINT) AS V", "CAST(id AS DOUBLE) + 0.5 AS S"
        ).selectExpr("V", f"{expr} AS est").collect()
    }
    con = duckdb.connect()
    want = dict(
        con.execute(
            f"SELECT V, {expr} AS est FROM "
            f"(SELECT unnest(generate_series(1, {m - 1}))::BIGINT AS V, "
            f"unnest(generate_series(1, {m - 1}))::DOUBLE + 0.5 AS S)"
        ).fetchall()
    )
    con.close()
    assert got == want
    # agreement with the literal table at m=16 in the lc regime
    e16 = a8.hll_est_sql_runtime_ln(
        "V", "S", m=a8.HLL_M, alpha_m2=a8.HLL_ALPHA_M2
    )
    lit = a8.hll_est_sql("V", "S")
    rows = spark.range(1, a8.HLL_M).selectExpr(
        "CAST(id AS BIGINT) AS V", "CAST(id AS DOUBLE) + 0.5 AS S"
    ).selectExpr(f"{e16} AS a", f"{lit} AS b").collect()
    for r in rows:
        assert abs(r.a - r.b) < 2e-4, r


def test_hll_prod_m_linear_counting_active_and_accurate(spark):
    """The production-m key must actually sit in the linear-counting
    regime at test sf (that is its point: the runtime-ln branch runs
    under the oracle gate) and land within the LC error band of the
    true distinct-user count."""
    from abr_etl_spark.sources.lake import load_table

    row = a8.hll_distinct_prod_m(spark, SF_ORACLE).collect()[0]
    assert row.m == a8.HLL_PROD_M
    true = (
        load_table(spark, SF_ORACLE, "events")
        .select("user_id").distinct().count()
    )
    assert true < 2.5 * a8.HLL_PROD_M  # the regime the key exists for
    assert row.n_filled < a8.HLL_PROD_M  # V > 0: correction active
    assert abs(row.est - true) / true < 0.1, (row.est, true)
