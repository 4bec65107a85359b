"""Round-12 analytics batch 3: ABC classes, burstiness, U-shaped
attribution, reciprocal best match."""

from __future__ import annotations

from datetime import datetime, timedelta

import duckdb

from abr_etl_spark.plans import analytics11 as a11
from tests.conftest import SF_ORACLE, assert_matches_oracle

_T0 = datetime(2024, 1, 1)

_L_SCHEMA = (
    "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
    "l_quantity double, l_extendedprice double, l_discount double, "
    "l_tax double, l_returnflag string, l_linestatus string, "
    "l_shipdate timestamp"
)
_E_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
_C_SCHEMA = (
    "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
    "c_mktsegment string"
)


def _lake(spark, tmp_path, table, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / f"{table}.parquet"))


def _ddb(tmp_path, *tables):
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{tmp_path}/{t}.parquet/*.parquet')"
        )
    return con


# -------------------------------------------------------- abc_classification


def test_abc_boundary_semantics_closed_form(spark, tmp_path):
    """Revenues 80/15/5: the 80-part's own cumulative hits exactly 80%
    (class A), the 15-part lands at 95% (class B), the tail is C;
    shares are exact e6 integers."""
    rows = [
        (1, 1, 1, 1, 1.0, 80.0, 0.0, 0.0, "N", "O", None),
        (2, 2, 1, 1, 1.0, 15.0, 0.0, 0.0, "N", "O", None),
        (3, 3, 1, 1, 1.0, 5.0, 0.0, 0.0, "N", "O", None),
    ]
    _lake(spark, tmp_path, "lineitem", rows, _L_SCHEMA)
    con = _ddb(tmp_path, "lineitem")
    got = {r["abc_class"]: r for r in
           a11.abc_classification(spark, str(tmp_path)).collect()}
    assert got["A"]["n_parts"] == 1 and got["A"]["revenue_share_e6"] == 800_000
    assert got["B"]["n_parts"] == 1 and got["B"]["revenue_share_e6"] == 150_000
    assert got["C"]["n_parts"] == 1 and got["C"]["revenue_share_e6"] == 50_000
    assert_matches_oracle(
        a11.abc_classification(spark, str(tmp_path)),
        con,
        a11.ORACLES["abc_classification"],
        "abc_classification",
    )


def test_abc_matches_oracle_smoke(spark, ddb):
    assert_matches_oracle(
        a11.abc_classification(spark, SF_ORACLE),
        ddb,
        a11.ORACLES["abc_classification"],
        "abc_classification",
    )


# ---------------------------------------------------------- burstiness_fano


def test_burstiness_constant_vs_spiky(spark, tmp_path):
    """A perfectly flat daily series has fano exactly 0 and burstiness
    exactly -1 (sigma = 0); a one-big-spike series has fano >> 1."""
    rows = []
    eid = 0
    for d in range(20):
        for _ in range(5):
            rows.append((eid, _T0 + timedelta(days=d), eid, "flat", 1.0, "{}"))
            eid += 1
    for d in range(20):
        k = 100 if d == 0 else 1
        for _ in range(k):
            rows.append((eid, _T0 + timedelta(days=d), eid, "spiky", 1.0, "{}"))
            eid += 1
    _lake(spark, tmp_path, "events", rows, _E_SCHEMA)
    con = _ddb(tmp_path, "events")
    got = {r["event_type"]: r for r in
           a11.burstiness_fano(spark, str(tmp_path)).collect()}
    assert got["flat"]["fano"] == 0.0 and got["flat"]["burstiness"] == -1.0
    assert got["spiky"]["fano"] > 10
    assert -1 < got["spiky"]["burstiness"] <= 1
    assert_matches_oracle(
        a11.burstiness_fano(spark, str(tmp_path)),
        con,
        a11.ORACLES["burstiness_fano"],
        "burstiness_fano",
    )


def test_burstiness_matches_oracle_smoke(spark, ddb):
    assert_matches_oracle(
        a11.burstiness_fano(spark, SF_ORACLE),
        ddb,
        a11.ORACLES["burstiness_fano"],
        "burstiness_fano",
    )


# ------------------------------------------------------ attribution_position


def test_position_credits_sum_to_one_per_purchase(spark, tmp_path):
    """One purchase with 4 prior clicks: first/last earn 400000, the
    two middles split 200000 evenly; a single-click purchase earns the
    full 1e6; every purchase's credits total EXACTLY 1e6."""
    rows = [
        # user 1: 4 clicks then a purchase (all within the hour)
        (1, _T0 + timedelta(minutes=0), 1, "click", 0.0, "{}"),
        (2, _T0 + timedelta(minutes=5), 1, "click", 0.0, "{}"),
        (3, _T0 + timedelta(minutes=10), 1, "click", 0.0, "{}"),
        (4, _T0 + timedelta(minutes=15), 1, "click", 0.0, "{}"),
        (5, _T0 + timedelta(minutes=20), 1, "purchase", 9.0, "{}"),
        # user 2: one click, one purchase
        (6, _T0 + timedelta(minutes=0), 2, "click", 0.0, "{}"),
        (7, _T0 + timedelta(minutes=1), 2, "purchase", 9.0, "{}"),
    ]
    _lake(spark, tmp_path, "events", rows, _E_SCHEMA)
    con = _ddb(tmp_path, "events")
    got = {r["user_id"]: r for r in
           a11.attribution_position(spark, str(tmp_path)).collect()}
    assert got[1]["n_touches"] == 4
    assert got[1]["total_credit_e6"] == 1_000_000
    assert got[2]["n_touches"] == 1
    assert got[2]["total_credit_e6"] == 1_000_000
    assert_matches_oracle(
        a11.attribution_position(spark, str(tmp_path)),
        con,
        a11.ORACLES["attribution_position"],
        "attribution_position",
    )


def test_position_remainder_distributes_exactly(spark, tmp_path):
    """Five clicks -> three middles splitting 200000 = 66666*3 + 2:
    the two EARLIEST middles get the extra unit and the purchase still
    totals exactly 1e6."""
    rows = [
        (i, _T0 + timedelta(minutes=5 * i), 1, "click", 0.0, "{}")
        for i in range(5)
    ] + [(99, _T0 + timedelta(minutes=30), 1, "purchase", 9.0, "{}")]
    _lake(spark, tmp_path, "events", rows, _E_SCHEMA)
    got = a11.attribution_position(spark, str(tmp_path)).collect()
    assert got[0]["total_credit_e6"] == 1_000_000


def test_position_matches_oracle_smoke(spark, ddb):
    assert_matches_oracle(
        a11.attribution_position(spark, SF_ORACLE),
        ddb,
        a11.ORACLES["attribution_position"],
        "attribution_position",
    )


# ---------------------------------------------------- reciprocal_best_match


def test_rbm_drops_non_mutual_pairs(spark, tmp_path):
    """Probes 20 and 40 both hit candidate 3 at distance 0; candidate
    3's best probe is 20 (key tie-break), so (40, 3) survives the
    one-directional best but NOT the reciprocal filter."""
    rows = [
        (3, "AAAAAAAAX", 1, 0.0, "SEG"),
        (20, "AAAAAAAAXY", 1, 0.0, "SEG"),
        (40, "AAAAAAAAXZ", 1, 0.0, "SEG"),
    ]
    _lake(spark, tmp_path, "customer", rows, _C_SCHEMA)
    con = _ddb(tmp_path, "customer")
    from abr_etl_spark.plans.analytics3 import fuzzy_match_blocked

    one_dir = {(r["probe_key"], r["cand_key"]) for r in
               fuzzy_match_blocked(spark, str(tmp_path)).collect()}
    assert (40, 3) in one_dir  # the hub-capture RBM exists to fix
    got = [(r["probe_key"], r["cand_key"], r["dist"]) for r in
           a11.reciprocal_best_match(spark, str(tmp_path)).collect()]
    assert got == [(20, 3, 0)]
    assert_matches_oracle(
        a11.reciprocal_best_match(spark, str(tmp_path)),
        con,
        a11.ORACLES["reciprocal_best_match"],
        "reciprocal_best_match",
    )


def test_rbm_matches_oracle_smoke(spark, ddb):
    assert_matches_oracle(
        a11.reciprocal_best_match(spark, SF_ORACLE),
        ddb,
        a11.ORACLES["reciprocal_best_match"],
        "reciprocal_best_match",
    )


# ------------------------------------------------------ record_linkage_fs


def test_fs_weights_order_discriminative_fields_first(spark, tmp_path):
    """The corrupted-name field is (near-)perfectly discriminative --
    m ~ 1, u ~ 0 -> large positive w -- while a constant field agrees
    on every pair (m = u = 1 -> w ~ 0 after smoothing). With 21
    customers the bounded hash sample contains the whole table, so
    probe 20 meets every candidate (incl. its true match) through the
    u-pool regardless of blocking."""
    rows = [
        (i, f"AAAAAAAA{chr(66 + i) * 3}", 1, 0.0, "SEG")
        for i in range(1, 22)  # ids from 1: only key 20 probes
    ]
    _lake(spark, tmp_path, "customer", rows, _C_SCHEMA)
    con = _ddb(tmp_path, "customer")
    got = {r["field"]: r for r in
           a11.record_linkage_fs(spark, str(tmp_path)).collect()}
    name = got["name_lev2"]
    assert name["n_match"] == 1 and name["agree_match"] == 1
    # the probe 'AAAAAAAAVV' is distance 1 from its own 'AAAAAAAAVVV'
    # but distance 3 from every sibling 'AAAAAAAA???', so the name
    # field agrees ONLY on the true match; the constant fields agree
    # on all pairs.
    assert name["agree_nonmatch"] == 0 and name["w"] > 2
    seg = got["mktsegment"]
    assert seg["agree_nonmatch"] == seg["n_nonmatch"]
    # a constant field is non-discriminative: its weight sits near 0
    # (the +1/+2 smoothing bias is ln(2*(nn+2)/(3*(nn+1))) ~ -0.36 at
    # nm=1 and shrinks as matches grow) and always BELOW the name's
    assert abs(seg["w"]) < 0.5 and seg["w"] < got["name_lev2"]["w"]
    assert_matches_oracle(
        a11.record_linkage_fs(spark, str(tmp_path)),
        con,
        a11.ORACLES["record_linkage_fs"],
        "record_linkage_fs",
    )


def test_fs_discriminative_name_gets_positive_weight(spark, ddb):
    """On the real lake the corrupted-name predicate agrees on the true
    match far more often than across different customers: w(name) must
    be strictly positive and larger than the constant-ish segment
    field's."""
    got = {r["field"]: r for r in
           a11.record_linkage_fs(spark, SF_ORACLE).collect()}
    assert got["name_lev2"]["w"] > got["mktsegment"]["w"]
    assert got["name_lev2"]["w"] > 0
    assert_matches_oracle(
        a11.record_linkage_fs(spark, SF_ORACLE),
        ddb,
        a11.ORACLES["record_linkage_fs"],
        "record_linkage_fs",
    )
