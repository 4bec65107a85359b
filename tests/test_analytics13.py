"""Round-13 second wave: seasonal Holt-Winters, Spearman, funnel
drop-off, the integer-exact A-Res weighted reservoir, and the
census-derived idf family."""

from __future__ import annotations

import math
from datetime import datetime, timedelta

import duckdb

from abr_etl_spark.plans import analytics13 as a13
from abr_etl_spark.plans import llm_pipeline13 as lp13

_E_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
_D_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)

_T0 = datetime(2024, 1, 1)  # a Monday


def _events_lake(spark, tmp_path, rows):
    d = tmp_path / "lake"
    d.mkdir(parents=True, exist_ok=True)
    spark.createDataFrame(rows, _E_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(d / "events.parquet"))
    return str(d)


def _docs_lake(spark, tmp_path, rows):
    d = tmp_path / "lake"
    d.mkdir(parents=True, exist_ok=True)
    spark.createDataFrame(rows, _D_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(d / "documents.parquet"))
    return str(d)


# --------------------------------------------------- holt_winters_seasonal


def test_hws_pure_multiplicative_pattern_is_exactly_deseasonalized(
    spark, tmp_path
):
    """v(day) = base * mult(dow) with mult in {1, 8} and three full
    weeks: the rational index is exactly mult/2 (weekly mass 14, mean
    2), the adjusted series is the CONSTANT 2*base, and past warm-up
    the seasonal forecast re-inflates to exactly base * mult(next
    dow)."""
    base = 5.0
    mult = [1, 1, 1, 1, 1, 1, 8]  # Mon..Sun; _T0 is a Monday
    rows = [
        (
            i,
            _T0 + timedelta(days=i),
            1,
            "purchase",
            base * mult[i % 7],
            None,
        )
        for i in range(21)
    ]
    out = a13.holt_winters_seasonal(
        spark, _events_lake(spark, tmp_path, rows)
    ).collect()
    assert len(out) == 21
    for r in out:
        dow = (
            datetime.strptime(r["day"], "%Y-%m-%d").date() - _T0.date()
        ).days % 7
        assert r["idx_e6"] == round(mult[dow] / 2 * 1_000_000)
        assert r["sa_e4"] == round(2 * base * 10_000)
    # past warm-up (HW_W observed days) the adjusted level is exact
    from abr_etl_spark.plans.analytics12 import HW_W

    for r in out[HW_W - 1 :]:
        dow = (
            datetime.strptime(r["day"], "%Y-%m-%d").date() - _T0.date()
        ).days % 7
        nxt = (dow + 1) % 7
        assert r["sf_e4"] == round(base * mult[nxt] * 10_000), r


def test_hws_flat_series_index_is_unit(spark, tmp_path):
    rows = [
        (i, _T0 + timedelta(days=i), 1, "view", 3.0, None)
        for i in range(14)
    ]
    out = a13.holt_winters_seasonal(
        spark, _events_lake(spark, tmp_path, rows)
    ).collect()
    for r in out:
        assert r["idx_e6"] == 1_000_000
        assert r["sa_e4"] == 30_000


# ------------------------------------------------------ spearman_rho_daily


def _spearman_ref(xs, ys):
    """Average-tie-rank Spearman, pure python (the R2 = 2*rank device)."""

    def r2(vals):
        return [
            2 * sum(1 for w in vals if w < v)
            + 2
            + sum(1 for w in vals if w == v)
            - 1
            for v in vals
        ]

    rx, ry = r2(xs), r2(ys)
    n = len(xs)
    sx, sy = sum(rx), sum(ry)
    sxx = sum(v * v for v in rx)
    syy = sum(v * v for v in ry)
    sxy = sum(a * b for a, b in zip(rx, ry))
    num = n * sxy - sx * sy
    den = math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    return round(num / den, 6)


def test_spearman_monotone_and_tied_series(spark, tmp_path):
    """A type whose daily count and value move together scores exactly
    1.0; an anti-monotone type scores -1.0; a tied series matches the
    average-rank reference computed in pure python."""
    rows = []
    eid = 0
    # 'up': day i has i+1 events of value 1.0 -> cnt and v both rise
    for i in range(5):
        for _ in range(i + 1):
            rows.append(
                (eid, _T0 + timedelta(days=i), 1, "up", 1.0, None)
            )
            eid += 1
    # 'down': cnt rises, value total falls
    for i in range(5):
        for _ in range(i + 1):
            rows.append(
                (
                    eid,
                    _T0 + timedelta(days=i),
                    1,
                    "down",
                    float(100 // (i + 1)) / (i + 1),
                    None,
                )
            )
            eid += 1
    # 'tied': counts [2,2,1], values [3,3,9] -> ties on both axes
    for i, (cnt, val) in enumerate([(2, 1.5), (2, 1.5), (1, 9.0)]):
        for _ in range(cnt):
            rows.append(
                (eid, _T0 + timedelta(days=i), 1, "tied", val, None)
            )
            eid += 1
    out = {
        r["event_type"]: r
        for r in a13.spearman_rho_daily(
            spark, _events_lake(spark, tmp_path, rows)
        ).collect()
    }
    assert out["up"]["rho_e6"] == 1.0
    assert out["down"]["rho_e6"] == -1.0
    assert out["tied"]["rho_e6"] == _spearman_ref(
        [2, 2, 1], [300, 300, 900]
    )


def test_spearman_constant_axis_is_null(spark, tmp_path):
    rows = [
        (i, _T0 + timedelta(days=i), 1, "flat", 2.0, None)
        for i in range(4)
    ]
    out = a13.spearman_rho_daily(
        spark, _events_lake(spark, tmp_path, rows)
    ).collect()
    assert out[0]["rho_e6"] is None  # both axes constant -> undefined


# ---------------------------------------------------------- funnel_dropoff


def test_funnel_dropoff_counts_and_rates(spark, tmp_path):
    """5 users: u1 full funnel, u2 view+click, u3 view only, u4
    click-without-view (must NOT count past stage 1 conversion), u5 no
    events of interest."""
    t = lambda m: _T0 + timedelta(minutes=m)  # noqa: E731
    rows = [
        (1, t(0), 1, "view", 1.0, None),
        (2, t(1), 1, "click", 1.0, None),
        (3, t(2), 1, "purchase", 1.0, None),
        (4, t(0), 2, "view", 1.0, None),
        (5, t(1), 2, "click", 1.0, None),
        (6, t(0), 3, "view", 1.0, None),
        (7, t(0), 4, "click", 1.0, None),
        (8, t(0), 5, "other", 1.0, None),
    ]
    out = {
        r["stage"]: r
        for r in a13.funnel_dropoff(
            spark, _events_lake(spark, tmp_path, rows)
        ).collect()
    }
    assert out["view"]["entered"] == 5 and out["view"]["converted"] == 3
    assert out["click"]["entered"] == 3 and out["click"]["converted"] == 2
    assert out["purchase"]["entered"] == 2
    assert out["purchase"]["converted"] == 1
    assert out["purchase"]["dropped"] == 1
    assert out["view"]["conv_e6"] == 600_000
    assert out["click"]["conv_e6"] == round(2 / 3 * 1_000_000)
    assert out["purchase"]["conv_e6"] == 500_000


# ------------------------------------------------ weighted_reservoir_sample


def test_wrs_matches_float_a_res_replay(spark):
    """The integer 4th-power key must select EXACTLY the docs a float
    A-Res replay (key = u^(1/w), the textbook rule) selects, per lang,
    on the real sf0.001 corpus -- proving the DECIMAL comparison is the
    same total order, not an approximation."""
    con = duckdb.connect()
    docs = con.execute(
        "SELECT lang, doc_id, n_chars FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    ).fetchall()
    P = a13._P
    per_lang: dict[str, list] = {}
    for lang, doc_id, n_chars in docs:
        h = (a13.WRS_A * (doc_id % P) + a13.WRS_B) % P + 1
        w = (
            4
            if n_chars >= a13.WRS_TIER_HI
            else 2
            if n_chars >= a13.WRS_TIER_LO
            else 1
        )
        u = h / P
        per_lang.setdefault(lang, []).append(
            (u ** (1.0 / w), -doc_id, doc_id, w)
        )
    want = {}
    for lang, lst in per_lang.items():
        lst.sort(reverse=True)
        want[lang] = [
            (rn + 1, doc_id, w)
            for rn, (_, _, doc_id, w) in enumerate(lst[: a13.WRS_K])
        ]
    out = a13.weighted_reservoir_sample(
        spark, "/root/testdata/sf0.001"
    ).collect()
    got: dict[str, list] = {}
    for r in out:
        got.setdefault(r["lang"], []).append(
            (r["rn"], r["doc_id"], r["w"])
        )
    assert got == want


def test_wrs_weights_tilt_the_sample(spark, tmp_path):
    """With ids fixed, promoting every doc to the top tier must keep
    the sample a function of h alone; mixing tiers must (on this seed)
    overselect heavy docs vs their population share."""
    rows = [
        (i, "x " * 30, "en", "s", 400 if i % 2 == 0 else 100)
        for i in range(400)
    ]
    out = a13.weighted_reservoir_sample(
        spark, _docs_lake(spark, tmp_path, rows)
    ).collect()
    assert len(out) == a13.WRS_K
    heavy = sum(1 for r in out if r["w"] == 4)
    # 50% of the population is heavy at 4x weight -> expected ~80%
    assert heavy > a13.WRS_K // 2


# ------------------------------------------------- census-derived idf keys


def test_census_plan_is_cache_shared_with_the_pair_machinery(spark):
    """shingle_df_census must canonicalize to the SAME plan as the
    census ngram_jaccard_pairs(with_census=True) materializes, so
    Spark's CacheManager serves one from the other's cache."""
    from abr_etl_spark.functions.cache import release_result_caches
    from abr_etl_spark.operators import dedup
    from abr_etl_spark.sources.lake import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    _, census_a = dedup.ngram_jaccard_pairs(
        d, threshold=0.9, with_census=True
    )
    census_b = dedup.shingle_df_census(d)
    pa = census_a._jdf.queryExecution().analyzed().canonicalized()
    pb = census_b._jdf.queryExecution().analyzed().canonicalized()
    assert pa.equals(pb)
    # and the cache manager actually serves census_b from the cache
    cm = spark._jsparkSession.sharedState().cacheManager()
    assert cm.lookupCachedData(census_b._jdf).isDefined()
    release_result_caches()


def test_doc_idf_profile_single_doc_corpus(spark, tmp_path):
    """One doc: every shingle has df = 1, weight N DIV df = 1, so
    idf_sum == n_sh and the mean is exactly 1.0 (1e4 units)."""
    rows = [(1, "a b c d e f", "en", "s", 11)]
    out = lp13.doc_idf_profile(
        spark, _docs_lake(spark, tmp_path, rows)
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_sh"] == 4  # 6 tokens -> 4 trigrams
    assert r["idf_sum"] == 4
    assert r["idf_mean_e4"] == 10_000


def test_boilerplate_simpson_flags_the_stamped_doc(spark, tmp_path):
    """Ten docs sharing one stamped sentence plus unique prose: the
    all-boilerplate doc concentrates df mass (lower simpson, higher
    hot share) than a mostly-unique doc."""
    stamp = "all rights reserved contact us today"
    rows = [
        (
            i,
            f"{stamp} unique prose number {i} keeps going differently "
            f"with extra words {i * 7} and {i * 13} more tail",
            "en",
            "s",
            100,
        )
        for i in range(10)
    ] + [(99, stamp, "en", "s", len(stamp))]
    out = {
        r["doc_id"]: r
        for r in lp13.doc_boilerplate_simpson(
            spark, _docs_lake(spark, tmp_path, rows)
        ).collect()
    }
    assert out[99]["hot_share_e6"] > out[0]["hot_share_e6"]
    assert out[99]["simpson_e6"] < out[0]["simpson_e6"]
    for r in out.values():
        assert 0 <= r["simpson_e6"] <= 1_000_000
        assert 0 < r["hot_share_e6"] <= 1_000_000


def test_vocab_df_zipf_small_lake_reports_null_anchors(spark, tmp_path):
    rows = [(1, "tiny corpus here", "en", "s", 16)]
    r = lp13.vocab_df_zipf(
        spark, _docs_lake(spark, tmp_path, rows)
    ).collect()[0]
    assert r["n_vocab"] == 1 and r["hapax"] == 1
    assert r["hapax_share_e6"] == 1_000_000
    assert r["f_lo"] is None and r["slope_e4"] is None


# ------------------------------------------------- funnel_time_to_convert


def test_funnel_time_to_convert_exact_lags(spark, tmp_path):
    """Three converting users with 1/2/4-minute view->click lags: p50
    is the exact interpolated middle, the mean the half-up integer."""
    t = lambda m: _T0 + timedelta(minutes=m)  # noqa: E731
    rows = []
    eid = 0
    for u, (lag_c, lag_p) in enumerate([(1, 10), (2, 20), (4, 40)], 1):
        rows += [
            (eid, t(0), u, "view", 1.0, None),
            (eid + 1, t(lag_c), u, "click", 1.0, None),
            (eid + 2, t(lag_p), u, "purchase", 1.0, None),
        ]
        eid += 3
    out = {
        r["transition"]: r
        for r in a13.funnel_time_to_convert(
            spark, _events_lake(spark, tmp_path, rows)
        ).collect()
    }
    m_us = 60_000_000
    vc = out["view_to_click"]
    assert vc["n"] == 3
    assert vc["p50_us"] == 2 * m_us
    assert vc["mean_us"] == round((1 + 2 + 4) / 3 * m_us)
    vp = out["view_to_purchase"]
    assert vp["p50_us"] == 20 * m_us
    # p90 interpolates between the 2nd and 3rd order stats: 2 + 0.8*2
    assert vc["p90_us"] == round((2 + 0.8 * 2) * m_us)


# ----------------------------------------------------- page_hinkley_drift


def test_page_hinkley_flat_series_is_zero(spark, tmp_path):
    rows = [
        (i, _T0 + timedelta(days=i), 1, "view", 5.0, None)
        for i in range(10)
    ]
    out = a13.page_hinkley_drift(
        spark, _events_lake(spark, tmp_path, rows)
    ).collect()
    assert out[0]["max_ph_e4"] == 0
    assert out[0]["peak_day"] == "2024-01-01"  # min-day tie-break


def test_page_hinkley_peaks_after_the_shift(spark, tmp_path):
    """10 quiet days then 10 elevated days: the PH statistic must peak
    at the END of the elevated run (running-mean deviations keep
    accumulating), and the max must be positive."""
    rows = [
        (
            i,
            _T0 + timedelta(days=i),
            1,
            "view",
            1.0 if i < 10 else 100.0,
            None,
        )
        for i in range(20)
    ]
    out = a13.page_hinkley_drift(
        spark, _events_lake(spark, tmp_path, rows)
    ).collect()[0]
    assert out["max_ph_e4"] > 0
    assert out["peak_day"] == "2024-01-20"
    assert out["n_days"] == 20


# --------------------------------------------------------- source_df_zipf


def test_source_df_zipf_splits_the_stamped_source(spark, tmp_path):
    """A stamped source (every doc shares one template sentence) must
    show a LOWER hapax share than a source of fully unique prose."""
    import abr_etl_spark.plans.llm_pipeline13 as _lp13

    stamp = "all rights reserved by the template press office"
    rows = [
        (
            i,
            f"{stamp} plus a tiny unique suffix {i}",
            "en",
            "stamped",
            80,
        )
        for i in range(20)
    ] + [
        (
            100 + i,
            f"completely original passage number {i} with words "
            f"{i * 3} {i * 7} {i * 11} never repeated elsewhere",
            "en",
            "natural",
            90,
        )
        for i in range(20)
    ]
    out = {
        r["source"]: r
        for r in _lp13.source_df_zipf(
            spark, _docs_lake(spark, tmp_path, rows)
        ).collect()
    }
    assert (
        out["stamped"]["hapax_share_e6"] < out["natural"]["hapax_share_e6"]
    )
    # both vocabularies are far shallower than rank 200 -> NULL anchors
    assert out["stamped"]["f_hi"] is None
    assert out["stamped"]["slope_e4"] is None


# ------------------------------------------------- q2_min_cost_supplier


def test_q2_keeps_only_the_min_cost_suppliers(spark, tmp_path):
    """Two European suppliers quote part 1 (unit costs 2.0 and 3.0) and
    one quotes part 2; only the cheapest quote per part survives, and a
    non-European supplier can never win."""
    d = tmp_path / "lake"
    d.mkdir(parents=True)

    def w(name, rows, schema):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(d / f"{name}.parquet")
        )

    w("region", [(0, "EUROPE"), (1, "ASIA")], "r_regionkey long, r_name string")
    w(
        "nation",
        [(10, "FRANCE", 0), (20, "JAPAN", 1)],
        "n_nationkey long, n_name string, n_regionkey long",
    )
    w(
        "supplier",
        [(1, "s_eu_cheap", 10, 50.0), (2, "s_eu_dear", 10, 900.0),
         (3, "s_asia", 20, 10.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )
    w(
        "part",
        [(1, "p1", "B1", "T", 45, 1.0), (2, "p2", "B2", "T", 45, 1.0),
         (3, "p_small", "B3", "T", 5, 1.0)],
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    )
    # lineitem rows: (partkey, suppkey, qty, extendedprice) + the full
    # production schema the load_table type contract expects
    li = [
        (1, 1, 10.0, 20.0),   # part 1, cheap: unit 2.0
        (1, 2, 10.0, 30.0),   # part 1, dear: unit 3.0
        (1, 3, 10.0, 1.0),    # part 1, asia: unit 0.1 (must not win)
        (2, 2, 4.0, 14.0),    # part 2, dear: unit 3.5
        (3, 1, 1.0, 1.0),     # part 3 too small -> filtered
    ]
    w(
        "lineitem",
        [
            (i + 1, pk, sk, 1, q, ep, 0.0, 0.0, "N", "O",
             datetime(1995, 1, 1))
            for i, (pk, sk, q, ep) in enumerate(li)
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp",
    )
    from abr_etl_spark.plans.analytics13 import q2_min_cost_supplier

    out = q2_min_cost_supplier(spark, str(d)).collect()
    got = {(r["p_partkey"], r["s_name"]): r for r in out}
    assert set(got) == {(1, "s_eu_cheap"), (2, "s_eu_dear")}
    assert got[(1, "s_eu_cheap")]["cost_e4"] == 20_000
    assert got[(2, "s_eu_dear")]["cost_e4"] == 35_000
    assert got[(1, "s_eu_cheap")]["acctbal_cents"] == 5_000


# ------------------------------------------------------ association_rules


def test_association_rules_exact_strengths(spark, tmp_path):
    """4 baskets: parts (1,2) co-occur in 2, part 1 also appears alone
    twice, part 2 nowhere else; rule 1->2 has conf 1/2, rule 2->1 conf
    1 (2 always implies 1) and both share lift = 4*2/(4*2) = 1... with
    n_1 = 4, n_2 = 2, N = 4: lift = N*n12/(n1*n2) = 4*2/(4*2) = 1."""
    d = tmp_path / "lake"
    d.mkdir(parents=True)
    rows = []
    ln = 0
    baskets = {10: [1, 2], 20: [1, 2], 30: [1], 40: [1]}
    for ok, parts in baskets.items():
        for pk in parts:
            ln += 1
            rows.append(
                (ok, pk, 1, ln, 1.0, 1.0, 0.0, 0.0, "N", "O",
                 datetime(1995, 1, 1))
            )
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp",
    ).coalesce(1).write.parquet(str(d / "lineitem.parquet"))
    from abr_etl_spark.plans.analytics13 import association_rules

    out = {(r["ant"], r["cons"]): r for r in
           association_rules(spark, str(d)).collect()}
    assert set(out) == {(1, 2), (2, 1)}
    r12, r21 = out[(1, 2)], out[(2, 1)]
    assert r12["n_pair"] == 2 and r12["n_ant"] == 4 and r12["n_cons"] == 2
    assert r12["supp_e6"] == 500_000       # 2/4 baskets
    assert r12["conf_e6"] == 500_000       # 2/4 of part-1 baskets
    assert r21["conf_e6"] == 1_000_000     # part 2 always implies 1
    assert r12["lift_e6"] == 1_000_000 and r21["lift_e6"] == 1_000_000
