"""Round-12 operators: MinHash perm-count sweep, tf-idf cosine pairs,
KS drift, t-closeness, token entropy, Zipf tail, dup-span coverage,
language-mix entropy."""

from __future__ import annotations

import pytest

import math

import duckdb

from abr_etl_spark.plans import llm_pipeline10 as lp10
from tests.conftest import SF_ORACLE, assert_matches_oracle


def _lake(spark, tmp_path, docs=None, customers=None):
    docs = docs if docs is not None else []
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
    if customers is not None:
        spark.createDataFrame(
            customers,
            "c_custkey long, c_name string, c_nationkey int, "
            "c_acctbal double, c_mktsegment string",
        ).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "customer.parquet")
        )
        con.execute(
            f"CREATE VIEW customer AS SELECT * FROM "
            f"read_parquet('{tmp_path}/customer.parquet/*.parquet')"
        )
    return con


# --------------------------------------------------- minhash_perm_sweep


def test_minhash_perm_identical_docs_zero_error(spark, tmp_path):
    """jaccard=1 pairs have identical gram sets, hence identical
    signatures at EVERY k -- estimator error exactly 0 on all grid
    rows."""
    base = " ".join(f"tok{i}" for i in range(30))
    docs = [
        (1, base, "en", "a", 1),
        (2, base, "en", "a", 1),
        (3, " ".join(f"zz{i}" for i in range(30)), "en", "b", 1),
    ]
    con = _lake(spark, tmp_path, docs=docs)
    try:
        rows = {
            r["k"]: r
            for r in lp10.minhash_perm_sweep(spark, str(tmp_path)).collect()
        }
        assert sorted(rows) == lp10.MH_PERM_GRID
        for k, r in rows.items():
            assert r["n_pairs"] == 1, k
            assert r["mean_err_e4"] == 0 and r["max_err_e4"] == 0, k
        assert_matches_oracle(
            lp10.minhash_perm_sweep(spark, str(tmp_path)),
            con,
            lp10.ORACLES["minhash_perm_sweep"],
            "minhash_perm_sweep",
        )
    finally:
        con.close()


@pytest.mark.slow
def test_minhash_perm_error_shrinks_with_k(spark, ddb):
    """On the shared corpus the mean estimator error at k=128 must sit
    at or below k=16's (the ~1/sqrt(k) contraction the sweep exists to
    show), and the pair population is constant across grid rows."""
    rows = {
        r["k"]: r
        for r in lp10.minhash_perm_sweep(spark, SF_ORACLE).collect()
    }
    ns = {r["n_pairs"] for r in rows.values()}
    assert len(ns) == 1 and ns.pop() > 0
    assert rows[128]["mean_err_e4"] <= rows[16]["mean_err_e4"]
    assert_matches_oracle(
        lp10.minhash_perm_sweep(spark, SF_ORACLE),
        ddb,
        lp10.ORACLES["minhash_perm_sweep"],
        "minhash_perm_sweep",
    )


# --------------------------------------------------- tfidf_cosine_pairs


def test_tfidf_identical_docs_top_pair(spark, tmp_path):
    """Byte-identical docs share every weighted coordinate -> cosine
    exactly 1 (10000), ranked first; a disjoint-vocabulary doc shares
    no kept token with anyone -> its pairs never appear (dot absent)."""
    a = "alpha beta gamma delta epsilon zeta"
    docs = [
        (1, a, "en", "s", 1),
        (2, a, "en", "s", 1),
        (3, "omega psi chi phi upsilon tau", "en", "s", 1),
    ]
    con = _lake(spark, tmp_path, docs=docs)
    try:
        rows = lp10.tfidf_cosine_pairs(spark, str(tmp_path)).collect()
        assert (rows[0]["doc_a"], rows[0]["doc_b"], rows[0]["cosine_e4"]) == (
            1,
            2,
            10000,
        )
        assert {(r["doc_a"], r["doc_b"]) for r in rows} == {(1, 2)}
        assert_matches_oracle(
            lp10.tfidf_cosine_pairs(spark, str(tmp_path)),
            con,
            lp10.ORACLES["tfidf_cosine_pairs"],
            "tfidf_cosine_pairs",
        )
    finally:
        con.close()


def test_tfidf_matches_oracle_smoke(spark, ddb):
    assert_matches_oracle(
        lp10.tfidf_cosine_pairs(spark, SF_ORACLE),
        ddb,
        lp10.ORACLES["tfidf_cosine_pairs"],
        "tfidf_cosine_pairs",
    )


# --------------------------------------------------- ks_drift_by_source


def test_ks_zero_for_identical_and_one_for_disjoint(spark, tmp_path):
    """A source whose length distribution equals the rest scores ~0;
    a source whose lengths sit entirely above the rest scores 10000
    (CDFs separate completely at the crossing point)."""
    docs = (
        [(i, "x", "en", "same_a", 10 + (i % 3)) for i in range(30)]
        + [(100 + i, "x", "en", "same_b", 10 + (i % 3)) for i in range(30)]
        + [(200 + i, "x", "en", "shifted", 1000 + i) for i in range(30)]
    )
    con = _lake(spark, tmp_path, docs=docs)
    try:
        rows = {
            r["source"]: r["ks_e4"]
            for r in lp10.ks_drift_by_source(spark, str(tmp_path)).collect()
        }
        assert rows["shifted"] == 10000
        # same_a vs (same_b + shifted): the shifted third pulls the
        # rest's CDF down, so same_a is nonzero but far from shifted's
        assert rows["same_a"] < rows["shifted"]
        assert_matches_oracle(
            lp10.ks_drift_by_source(spark, str(tmp_path)),
            con,
            lp10.ORACLES["ks_drift_by_source"],
            "ks_drift_by_source",
        )
    finally:
        con.close()


def test_ks_matches_oracle_smoke(spark, ddb):
    assert_matches_oracle(
        lp10.ks_drift_by_source(spark, SF_ORACLE),
        ddb,
        lp10.ORACLES["ks_drift_by_source"],
        "ks_drift_by_source",
    )


# --------------------------------------------------- t_closeness_report


def test_t_closeness_uniform_vs_skewed(spark, tmp_path):
    """Groups mirroring the global sensitive distribution have TV ~ 0
    (never at risk); a group concentrated on one value has TV near
    1 - p(value) and trips every threshold below that."""
    customers = []
    k = 0
    # 4 balanced groups: each with one member at every bal bucket 0..3
    for nk in range(4):
        for v in range(4):
            customers.append((k, f"c{k}", nk, v * 1000.0 + 1, "SEG"))
            k += 1
    # 1 skewed group: 8 members all in bucket 0
    for _ in range(8):
        customers.append((k, f"c{k}", 9, 1.0, "SEG"))
        k += 1
    con = _lake(spark, tmp_path, docs=[], customers=customers)
    try:
        rows = {
            r["t_e4"]: r
            for r in lp10.t_closeness_report(spark, str(tmp_path)).collect()
        }
        assert sorted(rows) == lp10.TCLOSE_GRID_E4
        # global: bucket0 = 12/24, others 4/24 each. Skewed group TV =
        # 0.5*(|1-0.5| + 3*|0-1/6|) = 0.5. Balanced groups TV =
        # 0.5*(|0.25-0.5| + 3*|0.25-1/6|) = 0.25.
        assert rows[2000]["n_groups_at_risk"] == 5  # all trip t=0.2
        assert rows[3500]["n_groups_at_risk"] == 1  # only the skewed one
        assert rows[5000]["n_groups_at_risk"] == 0  # TV=0.5 not > 0.5
        assert_matches_oracle(
            lp10.t_closeness_report(spark, str(tmp_path)),
            con,
            lp10.ORACLES["t_closeness_report"],
            "t_closeness_report",
        )
    finally:
        con.close()


def test_t_closeness_matches_oracle_smoke(spark, ddb):
    assert_matches_oracle(
        lp10.t_closeness_report(spark, SF_ORACLE),
        ddb,
        lp10.ORACLES["t_closeness_report"],
        "t_closeness_report",
    )


# --------------------------------------------------- doc_entropy_quality


def test_doc_entropy_known_values(spark, tmp_path):
    """One repeated token -> H = 0; n distinct tokens -> H = ln(n);
    boilerplate-heavy doc sits strictly between."""
    docs = [
        (1, "a a a a a a a a", "en", "s", 1),
        (2, "a b c d e f g h", "en", "s", 1),
        (3, "a a a a a a a b", "en", "s", 1),
    ]
    con = _lake(spark, tmp_path, docs=docs)
    try:
        rows = {
            r["doc_id"]: r
            for r in lp10.doc_entropy_quality(spark, str(tmp_path)).collect()
        }
        assert rows[1]["entropy_e4"] == 0
        assert rows[2]["entropy_e4"] == round(math.log(8) * 10000)
        assert 0 < rows[3]["entropy_e4"] < rows[2]["entropy_e4"]
        assert rows[2]["n_types"] == 8 and rows[1]["n_types"] == 1
        assert_matches_oracle(
            lp10.doc_entropy_quality(spark, str(tmp_path)),
            con,
            lp10.ORACLES["doc_entropy_quality"],
            "doc_entropy_quality",
        )
    finally:
        con.close()


def test_doc_entropy_matches_oracle_smoke(spark, ddb):
    assert_matches_oracle(
        lp10.doc_entropy_quality(spark, SF_ORACLE),
        ddb,
        lp10.ORACLES["doc_entropy_quality"],
        "doc_entropy_quality",
    )


# --------------------------------------------------- zipf_tail_by_source


def test_zipf_slope_known_geometry(spark, tmp_path):
    """Token i appearing (30 - i) times: f(rank 3) = 28, f(rank 20) =
    11 -> slope = ln(28/11) / ln(20/3); a source with < R_HI types is
    excluded."""
    text = " ".join(
        " ".join(f"w{i}" for _ in range(30 - i)) for i in range(25)
    )
    docs = [
        (1, text, "en", "rich", 1),
        (2, "only three types here types here", "en", "tiny", 1),
    ]
    con = _lake(spark, tmp_path, docs=docs)
    try:
        rows = {
            r["source"]: r
            for r in lp10.zipf_tail_by_source(spark, str(tmp_path)).collect()
        }
        assert set(rows) == {"rich"}
        r = rows["rich"]
        lo, hi = lp10.ZIPF_R_LO, lp10.ZIPF_R_HI
        assert (r["f_lo"], r["f_hi"]) == (31 - lo, 31 - hi)
        want = round(
            math.log(r["f_lo"] / r["f_hi"]) / math.log(hi / lo) * 10000
        )
        assert abs(r["slope_e4"] - want) <= 1
        assert_matches_oracle(
            lp10.zipf_tail_by_source(spark, str(tmp_path)),
            con,
            lp10.ORACLES["zipf_tail_by_source"],
            "zipf_tail_by_source",
        )
    finally:
        con.close()


def test_zipf_matches_oracle_smoke(spark, ddb):
    assert_matches_oracle(
        lp10.zipf_tail_by_source(spark, SF_ORACLE),
        ddb,
        lp10.ORACLES["zipf_tail_by_source"],
        "zipf_tail_by_source",
    )


# --------------------------------------------------- dup_span_coverage


def test_dup_span_overlap_merges_to_one_island(spark, tmp_path):
    """Two docs sharing a 25-token block: the 6 overlapping 20-token
    dup spans merge to ONE 25-token island per doc -- dup_tokens is 25
    per doc, not 6 x 20; the unique doc contributes zero."""
    block = " ".join(f"dup{i}" for i in range(25))
    docs = [
        (1, block + " " + " ".join(f"xa{i}" for i in range(10)), "en", "s1", 1),
        (2, block + " " + " ".join(f"xb{i}" for i in range(10)), "en", "s1", 1),
        (3, " ".join(f"solo{i}" for i in range(35)), "en", "s2", 1),
    ]
    con = _lake(spark, tmp_path, docs=docs)
    try:
        rows = {
            r["source"]: r
            for r in lp10.dup_span_coverage(spark, str(tmp_path)).collect()
        }
        assert rows["s1"]["n_docs_hit"] == 2
        assert rows["s1"]["dup_tokens"] == 50  # 25 per doc, merged
        assert rows["s1"]["total_tokens"] == 70
        assert rows["s2"]["dup_tokens"] == 0
        assert rows["s2"]["n_docs_hit"] == 0
        assert_matches_oracle(
            lp10.dup_span_coverage(spark, str(tmp_path)),
            con,
            lp10.ORACLES["dup_span_coverage"],
            "dup_span_coverage",
        )
    finally:
        con.close()


def test_dup_span_coverage_matches_oracle_smoke(spark, ddb):
    assert_matches_oracle(
        lp10.dup_span_coverage(spark, SF_ORACLE),
        ddb,
        lp10.ORACLES["dup_span_coverage"],
        "dup_span_coverage",
    )


# --------------------------------------------------- lang_entropy_by_source


def test_lang_entropy_known_mixes(spark, tmp_path):
    """Monolingual source -> 0; a 50/50 mix -> ln 2; 4-way uniform ->
    ln 4."""
    docs = (
        [(i, "x", "en", "mono", 1) for i in range(10)]
        + [(100 + i, "x", "en" if i < 5 else "de", "half", 1) for i in range(10)]
        + [
            (200 + i, "x", ["en", "de", "fr", "ja"][i % 4], "quad", 1)
            for i in range(16)
        ]
    )
    con = _lake(spark, tmp_path, docs=docs)
    try:
        rows = {
            r["source"]: r
            for r in lp10.lang_entropy_by_source(spark, str(tmp_path)).collect()
        }
        assert rows["mono"]["h_e4"] == 0 and rows["mono"]["n_langs"] == 1
        assert rows["half"]["h_e4"] == round(math.log(2) * 10000)
        assert rows["quad"]["h_e4"] == round(math.log(4) * 10000)
        assert_matches_oracle(
            lp10.lang_entropy_by_source(spark, str(tmp_path)),
            con,
            lp10.ORACLES["lang_entropy_by_source"],
            "lang_entropy_by_source",
        )
    finally:
        con.close()


def test_lang_entropy_matches_oracle_smoke(spark, ddb):
    assert_matches_oracle(
        lp10.lang_entropy_by_source(spark, SF_ORACLE),
        ddb,
        lp10.ORACLES["lang_entropy_by_source"],
        "lang_entropy_by_source",
    )
