"""Round-14 plan tests: the five §7.19 operator candidates.

Each key gets (a) the driver-equivalent oracle compare at sf0.01 and
(b) a semantics pin on a constructed frame where the closed form can be
hand-checked (the markov chain algebra, the SPRT decision labels, the
additive index's zero-mass grace, the conviction/leverage rationals,
the largest-remainder apportionment invariants).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from abr_etl_spark.plans import analytics14 as a14
from tests.conftest import SF_ORACLE, assert_matches_oracle

ORACLE_KEYS = [
    "markov_attribution",
    "sprt_conversion_monitor",
    "holt_winters_additive",
    "rule_conviction",
    "rule_ancestor_prune",
    "stratified_reservoir_alloc",
]


@pytest.mark.parametrize("key", ORACLE_KEYS)
def test_oracle_parity(spark, ddb, key):
    assert_matches_oracle(
        a14.QUERIES[key](spark, SF_ORACLE), ddb, a14.ORACLES[key], key
    )


# ------------------------------------------------------------- markov


def _events(spark, rows):
    """rows: (event_id, user_id, event_type, ts_iso)."""
    return spark.createDataFrame(
        [(i, u, t, ts) for i, u, t, ts in rows],
        "event_id LONG, user_id LONG, event_type STRING, ts_str STRING",
    ).select(
        "event_id",
        "user_id",
        "event_type",
        F.to_timestamp("ts_str").alias("ts"),
        F.lit(1.0).alias("value"),
        F.lit(None).cast("string").alias("props"),
    )


def test_markov_closed_form(spark, tmp_path, monkeypatch):
    """Three hand-built sessions: u1 view->click->purchase, u2
    view->NULL, u3 click->purchase. Counters: u1/u2 start with view
    (n_sa=2), u3 starts with click (n_sb=1); view->click once (n_ab=1),
    view->NULL once (n_an=1), click->purchase twice (n_bc=2). Closed:
    u_B = n_bc/n_b = 1; u_A = n_ab*u_B/n_a = 1/2;
    p(conv) = (2*(1/2) + 1*1)/3 = 2/3.
    Removal(view): u' = (n_sb*n_bc)/(n_s*n_b) = 1/3 -> RE = 1/2.
    Removal(click): u' = n_sc/n_s = 0 -> RE = 1.
    Credits: 1/3 and 2/3."""
    rows = [
        (1, 1, "view", "2024-01-01 10:00:00"),
        (2, 1, "click", "2024-01-01 10:01:00"),
        (3, 1, "purchase", "2024-01-01 10:02:00"),
        (4, 2, "view", "2024-01-01 11:00:00"),
        (5, 3, "click", "2024-01-01 12:00:00"),
        (6, 3, "purchase", "2024-01-01 12:01:00"),
    ]
    d = str(tmp_path / "lake")
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    out = {
        r["channel"]: r
        for r in a14.markov_attribution(spark, d).collect()
    }
    assert out["view"]["p_conv_e6"] == 666667
    assert out["view"]["removal_e6"] == 500000
    assert out["click"]["removal_e6"] == 1000000
    assert out["view"]["credit_e6"] == 333333
    assert out["click"]["credit_e6"] == 666667


def test_markov_truncates_after_first_purchase(spark, tmp_path):
    """Post-conversion events must not feed the chain: a view AFTER the
    purchase (same session) adds no transition."""
    rows = [
        (1, 1, "view", "2024-01-01 10:00:00"),
        (2, 1, "purchase", "2024-01-01 10:01:00"),
        (3, 1, "view", "2024-01-01 10:02:00"),
    ]
    d = str(tmp_path / "lake")
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    out = {
        r["channel"]: r
        for r in a14.markov_attribution(spark, d).collect()
    }
    # chain is START->view->CONV: view converts certainly
    assert out["view"]["n_from"] == 1
    assert out["view"]["p_conv_e6"] == 1000000
    assert out["click"]["n_from"] == 0


def test_markov_degenerate_no_conversions(spark, tmp_path):
    """No purchases anywhere -> p_conv 0, removal/credit NULL."""
    rows = [(1, 1, "view", "2024-01-01 10:00:00")]
    d = str(tmp_path / "lake")
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    out = {
        r["channel"]: r
        for r in a14.markov_attribution(spark, d).collect()
    }
    assert out["view"]["p_conv_e6"] == 0
    assert out["view"]["removal_e6"] is None
    assert out["view"]["credit_e6"] is None


# --------------------------------------------------------------- sprt


def test_sprt_decision_labels(spark):
    """The sf0.01 series must exercise the threshold logic coherently:
    labels agree with the rounded LLR against the integer threshold."""
    rows = a14.sprt_conversion_monitor(spark, SF_ORACLE).collect()
    assert rows, "empty series"
    for r in rows:
        if r["llr_e6"] >= a14.SPRT_THRESH_E6:
            assert r["decision"] == "accept_h1"
        elif r["llr_e6"] <= -a14.SPRT_THRESH_E6:
            assert r["decision"] == "accept_h0"
        else:
            assert r["decision"] == "continue"
    # cumulative counters are monotone
    n_prev = k_prev = 0
    for r in sorted(rows, key=lambda x: x["day"]):
        assert r["n_cum"] >= n_prev and r["k_cum"] >= k_prev
        n_prev, k_prev = r["n_cum"], r["k_cum"]


# ---------------------------------------------------- holt_winters_additive


def test_hw_additive_zero_mass_dow_still_reports(spark, tmp_path):
    """The additive index is defined where the multiplicative one is
    NULL: a type whose value mass is ZERO must still get idx/sa/sf
    (the motivating degeneracy)."""
    rows = []
    eid = 0
    # 14 consecutive days, all value 0.0 -> s_all = 0
    for day in range(1, 15):
        eid += 1
        rows.append((eid, 1, "view", f"2024-01-{day:02d} 10:00:00"))
    df = _events(spark, rows).withColumn("value", F.lit(0.0))
    d = str(tmp_path / "lake")
    df.write.parquet(f"{d}/events.parquet")
    out = a14.holt_winters_additive(spark, d).collect()
    assert len(out) == 14
    for r in out:
        assert r["idx_e4"] == 0
        assert r["sa_e4"] == 0
        assert r["sf_e4"] == 0  # all DOWs observed across 14 days
    from abr_etl_spark.plans.analytics13 import holt_winters_seasonal

    mult = holt_winters_seasonal(spark, d).collect()
    assert all(r["idx_e6"] is None for r in mult)  # the twin's gap


# ----------------------------------------------------------- rule keys


def _lineitem(spark, basket_rows):
    """Minimal lineitem lake satisfying load_table's type contract."""
    return spark.createDataFrame(
        [(o, p) for o, p in basket_rows],
        "l_orderkey LONG, l_partkey LONG",
    ).select(
        "l_orderkey",
        "l_partkey",
        F.lit(1).alias("l_linenumber"),
        F.lit(1).alias("l_suppkey"),
        F.lit(1.0).alias("l_quantity"),
        F.lit(1.0).alias("l_extendedprice"),
        F.lit(0.0).alias("l_discount"),
        F.lit(0.0).alias("l_tax"),
        F.to_timestamp(F.lit("2024-01-01")).alias("l_shipdate"),
    )


def test_rule_conviction_hand_rational(spark, tmp_path):
    """4 baskets: {1,2} x3, {1} x1 -> rule 1->2: n_pair=3, n_ant=4,
    n_cons=3, N=4. conviction = (4*(4-3))/(4*(4-3)) = 1 -> 1000000;
    leverage = (4*3 - 4*3)/16 = 0. Rule 2->1: conf=1 -> conviction
    NULL; leverage 0."""
    rows = []
    for o, parts in [(1, [1, 2]), (2, [1, 2]), (3, [1, 2]), (4, [1])]:
        for p in parts:
            rows.append((o, p))
    _lineitem(spark, rows).write.parquet(
        str(tmp_path / "lake" / "lineitem.parquet")
    )
    out = {
        (r["ant"], r["cons"]): r
        for r in a14.rule_conviction(spark, str(tmp_path / "lake")).collect()
    }
    r12 = out[(1, 2)]
    assert (r12["n_pair"], r12["n_ant"], r12["n_cons"]) == (3, 4, 3)
    assert r12["conviction_e6"] == 1000000
    assert r12["leverage_e6"] == 0
    r21 = out[(2, 1)]
    assert r21["conviction_e6"] is None  # exact rule, conf = 1
    assert r21["leverage_e6"] == 0


def test_rule_ancestor_prune_keeps_only_synergy(spark, tmp_path):
    """part 3 follows {1,2} together (conf 1) but NOT 1 or 2 alone
    (conf 1/2 each) -> the triple rule survives; a redundant triple
    whose consequent follows part 1 alone equally well is pruned."""
    baskets = [
        (1, [1, 2, 3]),
        (2, [1, 2, 3]),
        (3, [1, 4]),
        (4, [2, 4]),
        (5, [1, 5]),  # 5 follows 1 alone too
        (6, [1, 2, 5]),
        (7, [1, 2, 5]),
    ]
    rows = [(o, p) for o, parts in baskets for p in parts]
    _lineitem(spark, rows).write.parquet(
        str(tmp_path / "lake" / "lineitem.parquet")
    )
    out = {
        (r["ant_a"], r["ant_b"], r["cons"]): r
        for r in a14.rule_ancestor_prune(
            spark, str(tmp_path / "lake")
        ).collect()
    }
    # {1,2}->3: conf2 = 2/4 = 1/2; anc conf(1->3) = 2/6 = 1/3,
    # conf(2->3) = 2/5 -> beats both, kept
    assert (1, 2, 3) in out
    assert out[(1, 2, 3)]["conf2_e6"] == 500000
    # {1,2}->5: conf2 = 2/4 = 1/2; conf(1->5) = 3/6 = 1/2 -> NOT
    # strictly beaten, pruned
    assert (1, 2, 5) not in out


# ---------------------------------------------- stratified_reservoir_alloc


def test_alloc_invariants(spark):
    """Quotas sum to exactly SRA_K; every stratum draw respects its
    quota and is ranked 1..min(quota, |stratum|) without gaps."""
    out = a14.stratified_reservoir_alloc(spark, SF_ORACLE).toPandas()
    quotas = out.groupby(["lang", "source"]).quota.first()
    assert quotas.sum() == a14.SRA_K
    for (lang, src), g in out.groupby(["lang", "source"]):
        q = g.quota.iloc[0]
        assert len(g) <= q
        assert sorted(g.rn) == list(range(1, len(g) + 1))


def test_alloc_is_weight_proportional(spark):
    """A stratum's quota is within 1 of its exact proportional share
    (the largest-remainder guarantee)."""
    d = a14.load_table(spark, SF_ORACLE, "documents").select(
        "lang",
        "source",
        F.expr(
            f"CASE WHEN n_chars >= {a14.WRS_TIER_HI} THEN 4"
            f" WHEN n_chars >= {a14.WRS_TIER_LO} THEN 2 ELSE 1 END"
        ).alias("w"),
    )
    mass = {
        (r["lang"], r["source"]): r["m"]
        for r in d.groupBy("lang", "source")
        .agg(F.sum("w").alias("m"))
        .collect()
    }
    total = sum(mass.values())
    out = a14.stratified_reservoir_alloc(spark, SF_ORACLE).toPandas()
    quotas = out.groupby(["lang", "source"]).quota.first().to_dict()
    for k, q in quotas.items():
        exact = a14.SRA_K * mass[k] / total
        assert abs(q - exact) < 1, (k, q, exact)


# --------------------------------------------------------- survival_km


def test_survival_km_oracle(spark, ddb):
    from abr_etl_spark.plans import analytics14 as m

    assert_matches_oracle(
        m.QUERIES["survival_km"](spark, SF_ORACLE),
        ddb,
        m.ORACLES["survival_km"],
        "survival_km",
    )


def test_survival_km_hand_curve(spark, tmp_path):
    """4 entrants: u1 converts at lag 0, u2 at lag 2, u3/u4 never
    (censored at the horizon = the max event date, lag 2 for both).
    KM: S(0) = 1 - 1/4 = 0.75; at lag 2 risk set is {u2,u3,u4} -> S(2)
    = 0.75 * (1 - 1/3) = 0.5 (the censored pair still at risk AT 2)."""
    rows = [
        (1, 1, "view", "2024-01-01 10:00:00"),
        (2, 1, "purchase", "2024-01-01 11:00:00"),
        (3, 2, "view", "2024-01-01 10:00:00"),
        (4, 2, "purchase", "2024-01-03 10:00:00"),
        (5, 3, "view", "2024-01-01 10:00:00"),
        (6, 4, "view", "2024-01-01 10:00:00"),
        (7, 9, "click", "2024-01-03 23:00:00"),  # horizon = 2024-01-03
    ]
    d = str(tmp_path / "lake")
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    out = {
        r["lag_days"]: r for r in a14.survival_km(spark, d).collect()
    }
    assert set(out) == {0, 2}
    assert out[0]["n_risk"] == 4 and out[0]["n_event"] == 1
    assert out[0]["surv_e6"] == 750000
    assert out[2]["n_risk"] == 3 and out[2]["n_event"] == 1
    assert out[2]["n_censored_at"] == 2
    assert out[2]["surv_e6"] == 500000


def test_survival_km_absorbing_zero(spark, tmp_path):
    """When every user at risk converts at some lag, S pins to exactly
    0 from that lag on via the integer flag (never ln(0))."""
    rows = [
        (1, 1, "view", "2024-01-01 10:00:00"),
        (2, 1, "purchase", "2024-01-01 11:00:00"),
        (3, 2, "view", "2024-01-01 10:00:00"),
        (4, 2, "purchase", "2024-01-02 10:00:00"),
    ]
    d = str(tmp_path / "lake")
    _events(spark, rows).write.parquet(f"{d}/events.parquet")
    out = {
        r["lag_days"]: r for r in a14.survival_km(spark, d).collect()
    }
    assert out[0]["surv_e6"] == 500000
    assert out[1]["surv_e6"] == 0
