"""Round-12 batch 3: collocations, link prediction, k-anon ladder, CMS
join-size estimation."""

from __future__ import annotations

import math

import duckdb
import pytest

from abr_etl_spark.plans import llm_pipeline11 as lp11
from tests.conftest import SF_ORACLE, assert_matches_oracle


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


# -------------------------------------------------------- collocations_pmi


def test_pmi_bound_phrase_beats_independent_pair(spark, tmp_path):
    """A bigram that ALWAYS co-occurs scores ln(N/c12); two frequent
    words that pair only occasionally score near 0. Closed form: docs
    are 'new york' x10 plus 'the cat' / 'the dog' fillers."""
    docs = ["new york"] * 10 + ["the cat"] * 20 + ["the dog"] * 20
    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(docs)]
    _lake(spark, tmp_path, "documents", rows,
          "doc_id long, text string, lang string, source string, n_chars long")
    con = _ddb(tmp_path, "documents")
    got = lp11.collocations_pmi(spark, str(tmp_path)).collect()
    by_pair = {(r["w1"], r["w2"]): r for r in got}
    n_total = 50  # one bigram per doc
    exp = round(math.log(10 * n_total / (10 * 10)), 6)
    assert by_pair[("new", "york")]["pmi"] == pytest.approx(exp)
    # 'the cat': c12=20, c1(the)=40, c2(cat)=20 -> ln(20*50/800) = ln(1.25)
    assert by_pair[("the", "cat")]["pmi"] == pytest.approx(
        round(math.log(20 * 50 / (40 * 20)), 6)
    )
    assert got[0]["w1"] == "new"  # highest PMI leads
    assert_matches_oracle(
        lp11.collocations_pmi(spark, str(tmp_path)),
        con,
        lp11.ORACLES["collocations_pmi"],
        "collocations_pmi",
    )


def test_pmi_min_count_excludes_hapax(spark, tmp_path):
    """Pairs under PMI_MIN_COUNT never appear, whatever their score."""
    docs = ["rare pair"] * (lp11.PMI_MIN_COUNT - 1) + ["the cat"] * 20
    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(docs)]
    _lake(spark, tmp_path, "documents", rows,
          "doc_id long, text string, lang string, source string, n_chars long")
    got = lp11.collocations_pmi(spark, str(tmp_path)).collect()
    assert ("rare", "pair") not in {(r["w1"], r["w2"]) for r in got}


def test_pmi_matches_oracle_smoke(spark, ddb):
    assert_matches_oracle(
        lp11.collocations_pmi(spark, SF_ORACLE),
        ddb,
        lp11.ORACLES["collocations_pmi"],
        "collocations_pmi",
    )


# ------------------------------------------------------ link_prediction_aa

_O_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)
_L_SCHEMA = (
    "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
    "l_quantity double, l_extendedprice double, l_discount double, "
    "l_tax double, l_returnflag string, l_linestatus string, "
    "l_shipdate timestamp"
)


def _graph_lake(spark, tmp_path, edges):
    """edges: list of (cust, part) -- one order per customer."""
    custs = sorted({c for c, _ in edges})
    orows = [(c, c, "O", 1.0, None, "P") for c in custs]
    lrows = [
        (c, p, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", None) for c, p in edges
    ]
    _lake(spark, tmp_path, "orders", orows, _O_SCHEMA)
    _lake(spark, tmp_path, "lineitem", lrows, _L_SCHEMA)
    return _ddb(tmp_path, "orders", "lineitem")


def test_aa_closed_form_two_vs_one_shared_part(spark, tmp_path):
    """Pair (1,2) shares parts 100 and 101 (both degree 2); pair (3,4)
    shares only part 102 -> aa(1,2) = 2/ln2 > aa(3,4) = 1/ln2, and
    common_parts counts exactly."""
    edges = [(1, 100), (2, 100), (1, 101), (2, 101), (3, 102), (4, 102)]
    con = _graph_lake(spark, tmp_path, edges)
    got = {(r["cust_a"], r["cust_b"]): r for r in
           lp11.link_prediction_aa(spark, str(tmp_path)).collect()}
    assert got[(1, 2)]["common_parts"] == 2
    assert got[(1, 2)]["aa"] == pytest.approx(round(2 / math.log(2), 6))
    assert got[(3, 4)]["aa"] == pytest.approx(round(1 / math.log(2), 6))
    assert set(got) == {(1, 2), (3, 4)}
    assert_matches_oracle(
        lp11.link_prediction_aa(spark, str(tmp_path)),
        con,
        lp11.ORACLES["link_prediction_aa"],
        "link_prediction_aa",
    )


def test_aa_hub_cap_drops_superconnector(spark, tmp_path):
    """A part bought by more than AA_DEG_CAP customers must generate NO
    pairs -- the stated df-cap contract."""
    hub = [(c, 999) for c in range(lp11.AA_DEG_CAP + 10)]
    con = _graph_lake(spark, tmp_path, hub)
    assert lp11.link_prediction_aa(spark, str(tmp_path)).count() == 0
    del con


def test_aa_matches_oracle_smoke(spark, ddb):
    assert_matches_oracle(
        lp11.link_prediction_aa(spark, SF_ORACLE),
        ddb,
        lp11.ORACLES["link_prediction_aa"],
        "link_prediction_aa",
    )


# --------------------------------------------- k_anon_generalization_sweep

_C_SCHEMA = (
    "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
    "c_mktsegment string"
)


def test_ka_ladder_monotone_and_flips_at_coarse_rung(spark, tmp_path):
    """Five customers with balances 0..40 dollars apart in one (nation,
    segment): width 10 leaves singleton groups (violators), width
    10000 collapses them into one group of 5 (k-anonymous). Each rung's
    buckets refine the next, so min_group_size is monotone."""
    rows = [(i, f"c{i}", 1, 10.0 * i, "SEG") for i in range(5)]
    _lake(spark, tmp_path, "customer", rows, _C_SCHEMA)
    con = _ddb(tmp_path, "customer")
    got = {r["width_dollars"]: r for r in
           lp11.k_anon_generalization_sweep(spark, str(tmp_path)).collect()}
    assert not got[10]["k_anonymous"] and got[10]["violator_rows"] == 5
    assert got[10000]["k_anonymous"] and got[10000]["min_group_size"] == 5
    sizes = [got[w]["min_group_size"] for w in sorted(got)]
    assert sizes == sorted(sizes)
    assert_matches_oracle(
        lp11.k_anon_generalization_sweep(spark, str(tmp_path)),
        con,
        lp11.ORACLES["k_anon_generalization_sweep"],
        "k_anon_generalization_sweep",
    )


def test_ka_matches_oracle_smoke(spark, ddb):
    assert_matches_oracle(
        lp11.k_anon_generalization_sweep(spark, SF_ORACLE),
        ddb,
        lp11.ORACLES["k_anon_generalization_sweep"],
        "k_anon_generalization_sweep",
    )


# --------------------------------------------- join_cardinality_estimate


def test_jc_estimate_overestimates_and_min_is_reported(spark, ddb):
    """CMS inner products only ever ADD collision mass, so every
    depth's estimate >= exact and the summary row carries min(est)
    with rel_err >= 0."""
    rows = lp11.join_cardinality_estimate(spark, SF_ORACLE).collect()
    summary = [r for r in rows if r["depth"] == -1][0]
    depths = [r for r in rows if r["depth"] >= 0]
    assert len(depths) == lp11.JC_D
    assert summary["est"] == min(r["est"] for r in depths)
    assert all(r["est"] >= summary["exact"] for r in depths)
    assert summary["rel_err"] >= 0.0
    assert_matches_oracle(
        lp11.join_cardinality_estimate(spark, SF_ORACLE),
        ddb,
        lp11.ORACLES["join_cardinality_estimate"],
        "join_cardinality_estimate",
    )


def test_jc_exact_matches_true_join_count(spark, ddb):
    """The 'exact' the sketch is judged against must equal the real
    join cardinality."""
    rows = lp11.join_cardinality_estimate(spark, SF_ORACLE).collect()
    exact = [r for r in rows if r["depth"] == -1][0]["exact"]
    true = ddb.execute(
        "SELECT count(*) FROM orders JOIN lineitem "
        "ON l_orderkey = o_orderkey"
    ).fetchone()[0]
    assert exact == true


# ----------------------------------------------------- keyness_g2_by_source


def test_g2_exclusive_term_tops_its_source(spark, tmp_path):
    """A term exclusive to one source gets the closed-form b=0 score
    2*a*ln(N/n1) with positive sign; a perfectly evenly spread term
    scores exactly 0."""
    docs = [("A", "zebra zebra common common")] * 10 + [
        ("B", "filler word common common")
    ] * 10
    rows = [(i, t, "en", s, len(t)) for i, (s, t) in enumerate(docs)]
    _lake(spark, tmp_path, "documents", rows,
          "doc_id long, text string, lang string, source string, n_chars long")
    con = _ddb(tmp_path, "documents")
    got = {(r["source"], r["term"]): r for r in
           lp11.keyness_g2_by_source(spark, str(tmp_path)).collect()}
    # zebra: a=20, b=0, n1=40, N=80 -> 2*20*ln(20*80/(40*20)) = 40*ln(2)
    assert got[("A", "zebra")]["g2"] == pytest.approx(
        round(2 * 20 * math.log(2), 6)
    )
    assert got[("A", "zebra")]["g2"] > 0
    # 'common' is split 20/20 across equal corpora -> expected == observed
    assert got[("A", "common")]["g2"] == pytest.approx(0.0)
    assert_matches_oracle(
        lp11.keyness_g2_by_source(spark, str(tmp_path)),
        con,
        lp11.ORACLES["keyness_g2_by_source"],
        "keyness_g2_by_source",
    )


def test_g2_matches_oracle_smoke(spark, ddb):
    assert_matches_oracle(
        lp11.keyness_g2_by_source(spark, SF_ORACLE),
        ddb,
        lp11.ORACLES["keyness_g2_by_source"],
        "keyness_g2_by_source",
    )
