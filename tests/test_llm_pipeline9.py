"""Round-11 late sweeps: shingle order n, HLL precision m, SimHash
band layout -- the last three axes of the tuning-curve family."""

from __future__ import annotations

import pytest

import math

import duckdb
from pyspark.sql import functions as F

from abr_etl_spark.plans import llm_pipeline9 as lp9
from tests.conftest import assert_matches_oracle


def _lake(spark, tmp_path, docs=None, events=None):
    docs = docs if docs is not None else []
    events = events if events is not None else []
    spark.createDataFrame(
        docs,
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    spark.createDataFrame(
        events,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    con = duckdb.connect()
    for t in ("documents", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{tmp_path}/{t}.parquet/*.parquet')"
        )
    return con


# --------------------------------------------------- shingle_size_sweep


@pytest.mark.slow
def test_shingle_sweep_identical_pair_all_orders(spark, tmp_path):
    """Two byte-identical long docs are jaccard=1 at EVERY shingle
    order, so each grid row reports the pair with a 10000 jaccard-e4
    contribution; the unrelated doc never pairs."""
    base = " ".join(f"tok{i}" for i in range(30))
    docs = [
        (1, base, "en", "a", len(base)),
        (2, base, "en", "a", len(base)),
        (3, " ".join(f"other{i}" for i in range(30)), "en", "b", 200),
    ]
    con = _lake(spark, tmp_path, docs=docs)
    try:
        rows = {
            r["n"]: r
            for r in lp9.shingle_size_sweep(spark, str(tmp_path)).collect()
        }
        assert sorted(rows) == lp9.SHINGLE_N_GRID
        for n, r in rows.items():
            assert r["n_pairs"] == 1, f"n={n}"
            assert r["sum_jaccard_e4"] == 10000, f"n={n}"
            # 30 distinct tokens -> 30 - n + 1 distinct n-grams per doc
            assert r["total_shingles"] == 3 * (30 - n + 1)
        assert_matches_oracle(
            lp9.shingle_size_sweep(spark, str(tmp_path)),
            con,
            lp9.ORACLES["shingle_size_sweep"],
            "shingle_size_sweep",
        )
    finally:
        con.close()


@pytest.mark.slow
def test_shingle_sweep_larger_n_separates_edited_pair(spark, tmp_path):
    """A single-token edit in an 80-token doc: 3-gram jaccard is
    75/81 ~ 0.926 (above tau=0.9) but 13-gram jaccard is 55/81 ~ 0.68
    (below it) -- the yield column must drop across the grid (the
    reason decontamination uses long n-grams)."""
    toks = [f"w{i}" for i in range(80)]
    edited = list(toks)
    edited[40] = "EDIT"
    docs = [
        (1, " ".join(toks), "en", "a", 200),
        (2, " ".join(edited), "en", "a", 200),
    ]
    con = _lake(spark, tmp_path, docs=docs)
    try:
        rows = {
            r["n"]: r["n_pairs"]
            for r in lp9.shingle_size_sweep(spark, str(tmp_path)).collect()
        }
        assert rows[3] == 1
        assert rows[13] == 0
        assert_matches_oracle(
            lp9.shingle_size_sweep(spark, str(tmp_path)),
            con,
            lp9.ORACLES["shingle_size_sweep"],
            "shingle_size_sweep",
        )
    finally:
        con.close()


@pytest.mark.slow
def test_shingle_sweep_short_doc_contract(spark, tmp_path):
    """Short-doc contract (r11 advice): more identical sub-n-token docs
    than df_cap would make the df-cap drop their whole-doc-shingle
    jaccard=1 pairs while the brute-force oracle kept them -- a
    data-dependent cross-engine divergence. The sweep excludes sub-n
    docs from the PAIR stats on both engines, so with 1005 identical
    one-token docs (> df_cap=1000) the engines agree bit-for-bit:
    no short-doc pairs anywhere, the 4-token twin pair counted only at
    n=3 (4 >= 3 but 4 < 5), and total_shingles still counts every doc."""
    n_short = 1005
    docs = [(i, "dup", "en", "s", 3) for i in range(n_short)] + [
        (n_short, "alpha beta gamma delta", "en", "t", 22),
        (n_short + 1, "alpha beta gamma delta", "en", "t", 22),
    ]
    con = _lake(spark, tmp_path, docs=docs)
    try:
        rows = {
            r["n"]: r
            for r in lp9.shingle_size_sweep(spark, str(tmp_path)).collect()
        }
        assert rows[3]["n_pairs"] == 1 and rows[3]["sum_jaccard_e4"] == 10000
        for n in (5, 7, 13):
            assert rows[n]["n_pairs"] == 0, f"n={n}"
        # index-size axis still counts every doc: one whole-doc shingle
        # per short doc; the 4-token docs carry 2 distinct 3-grams each
        # at n=3 and collapse to 1 whole-doc shingle at n >= 5.
        assert rows[3]["total_shingles"] == n_short + 2 * 2
        for n in (5, 7, 13):
            assert rows[n]["total_shingles"] == n_short + 2
        assert_matches_oracle(
            lp9.shingle_size_sweep(spark, str(tmp_path)),
            con,
            lp9.ORACLES["shingle_size_sweep"],
            "shingle_size_sweep",
        )
    finally:
        con.close()


def test_shingle_sweep_empty_corpus(spark, tmp_path):
    con = _lake(spark, tmp_path, docs=[])
    try:
        rows = {
            r["n"]: r
            for r in lp9.shingle_size_sweep(spark, str(tmp_path)).collect()
        }
        assert sorted(rows) == lp9.SHINGLE_N_GRID
        for r in rows.values():
            assert (
                r["total_shingles"] == 0
                and r["n_pairs"] == 0
                and r["sum_jaccard_e4"] == 0
            )
    finally:
        con.close()


# --------------------------------------------------- hll_precision_sweep


def test_hll_sweep_regimes_and_bounds(spark, tmp_path):
    """200 distinct users: every m reports n_filled <= min(m, 200);
    the m=1024 row must sit in the linear-counting regime and equal
    round(m*ln(m/V), 4) exactly; the exact count column is 200
    everywhere; oracle matches."""
    events = [
        (i, None, i % 200, "view", 1.0, "{}") for i in range(600)
    ]
    con = _lake(spark, tmp_path, events=events)
    try:
        rows = {
            r["m"]: r
            for r in lp9.hll_precision_sweep(spark, str(tmp_path)).collect()
        }
        assert sorted(rows) == lp9.HLL_M_GRID
        for m, r in rows.items():
            assert r["n_exact"] == 200
            assert 0 < r["n_filled"] <= min(m, 200)
            assert r["est"] > 0
        r1024 = rows[1024]
        v = 1024 - r1024["n_filled"]
        assert v > 0
        assert r1024["est"] == round(1024 * math.log(1024 / v), 4)
        assert_matches_oracle(
            lp9.hll_precision_sweep(spark, str(tmp_path)),
            con,
            lp9.ORACLES["hll_precision_sweep"],
            "hll_precision_sweep",
        )
    finally:
        con.close()


def test_hll_sweep_error_shrinks_with_precision(spark, tmp_path):
    """More registers -> tighter estimate on a spread key set: the
    m=1024 relative error must beat the m=16 one (the sweep's whole
    point). Keys are multiplied out so they don't sit on a lattice."""
    events = [
        (i, None, (i * 7919 + 13) % 100000, "view", 1.0, "{}")
        for i in range(3000)
    ]
    con = _lake(spark, tmp_path, events=events)
    try:
        rows = {
            r["m"]: r
            for r in lp9.hll_precision_sweep(spark, str(tmp_path)).collect()
        }
        assert rows[1024]["rel_err_e4"] < rows[16]["rel_err_e4"]
        assert_matches_oracle(
            lp9.hll_precision_sweep(spark, str(tmp_path)),
            con,
            lp9.ORACLES["hll_precision_sweep"],
            "hll_precision_sweep",
        )
    finally:
        con.close()


def test_hll_sweep_empty_events(spark, tmp_path):
    """No events -> no registers -> an EMPTY report (no m rows), same
    on both engines."""
    con = _lake(spark, tmp_path, events=[])
    try:
        assert lp9.hll_precision_sweep(spark, str(tmp_path)).count() == 0
        assert (
            len(con.execute(lp9.ORACLES["hll_precision_sweep"]).df()) == 0
        )
    finally:
        con.close()


# --------------------------------------------------- simhash_band_sweep


@pytest.mark.slow
def test_simhash_sweep_pigeonhole_and_nesting(spark, tmp_path):
    """Layouts with radius_guaranteed >= 3 must report recall 10000;
    the committed grid is NESTED (every wider band contains a narrower
    one), so candidates and hits are non-decreasing down the grid."""
    docs = []
    base = [f"tok{i}" for i in range(40)]
    for i in range(12):
        t = list(base)
        t[i % 40] = f"v{i}"
        docs.append((i, " ".join(t), "en", "a", 200))
    for i in range(12, 20):
        docs.append(
            (i, " ".join(f"z{i}w{j}" for j in range(40)), "en", "b", 300)
        )
    con = _lake(spark, tmp_path, docs=docs)
    try:
        rows = lp9.simhash_band_sweep(spark, str(tmp_path)).collect()
        assert [r["bands"] for r in rows] == [
            b for b, _ in lp9.SIMHASH_LAYOUTS
        ]
        for r in rows:
            assert r["radius_guaranteed"] == r["bands"] - 1
            if r["radius_guaranteed"] >= lp9.SIMHASH_SWEEP_RADIUS:
                assert r["recall_e4"] == 10000, r
        for a, b in zip(rows, rows[1:]):
            assert a["n_candidates"] <= b["n_candidates"]
            assert a["n_hits"] <= b["n_hits"]
        assert_matches_oracle(
            lp9.simhash_band_sweep(spark, str(tmp_path)),
            con,
            lp9.ORACLES["simhash_band_sweep"],
            "simhash_band_sweep",
        )
    finally:
        con.close()


@pytest.mark.slow
def test_simhash_sweep_no_pairs(spark, tmp_path):
    """A truthless corpus (every doc far in hamming): n_true = 0 rows
    report NULL recall, candidates still counted; oracle agrees."""
    docs = [
        (i, " ".join(f"s{i}x{j}" for j in range(50)), "en", "a", 300)
        for i in range(6)
    ]
    con = _lake(spark, tmp_path, docs=docs)
    try:
        sdf = lp9.simhash_band_sweep(spark, str(tmp_path))
        rows = sdf.collect()
        truth_empty = all(r["n_true"] == 0 for r in rows)
        if truth_empty:
            assert all(r["recall_e4"] is None for r in rows)
        assert_matches_oracle(
            sdf,
            con,
            lp9.ORACLES["simhash_band_sweep"],
            "simhash_band_sweep",
        )
    finally:
        con.close()


# --------------------------------------------------- ivfadc_nprobe_sweep


def test_ivfadc_nprobe_monotone_and_pins_nprobe1(spark):
    """Candidates are supersets as nprobe grows (strictly more cells
    scanned -> strictly more candidates on this data) and the nprobe=1
    row's n_common equals the overlap of ann_ivf_pq's ranking with the
    exact truth -- the sweep's first config IS ann_ivf_pq."""
    from abr_etl_spark.operators import similarity
    from abr_etl_spark.plans import llm_pipeline8 as lp8
    from abr_etl_spark.plans.llm_pipeline import ANN_K, N_QUERY_VECS
    from tests.conftest import SF_ORACLE

    rows = {
        r["nprobe"]: r
        for r in lp9.ivfadc_nprobe_sweep(spark, SF_ORACLE).collect()
    }
    assert sorted(rows) == lp9.IVFADC_NPROBE_GRID
    grid = lp9.IVFADC_NPROBE_GRID
    for a, b in zip(grid, grid[1:]):
        assert rows[a]["n_candidates"] < rows[b]["n_candidates"]
    e = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    q = e.where(F.col("vec_id") < N_QUERY_VECS)
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.cosine_topk(e, q, k=ANN_K).collect()
    }
    ivfpq = {
        (r["query_id"], r["neighbor_id"])
        for r in lp8.ann_ivf_pq(spark, SF_ORACLE).collect()
    }
    assert rows[1]["n_common"] == len(truth & ivfpq)
    assert rows[1]["n_true"] == len(truth)


# ---------------------------------------------------- ann_ivf_pq_kmeans


def test_ann_ivf_pq_kmeans_cell_routing_and_order(spark):
    """IVFADC semantics hold with TRAINED residual codebooks: every
    neighbor lives in the query's cell, ranks are contiguous from 1,
    scores strictly ordered, no self-matches."""
    from abr_etl_spark.operators.similarity import ivf_assign
    from abr_etl_spark.plans.llm_pipeline import N_QUERY_VECS
    from tests.conftest import SF_ORACLE

    e = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    cent = e.where(F.col("vec_id") % 50 == 0)
    cells = {
        r["vec_id"]: r["centroid_id"]
        for r in ivf_assign(e, cent).collect()
    }
    out = lp9.ann_ivf_pq_kmeans(spark, SF_ORACLE).collect()
    assert out, "non-empty result"
    by_q: dict = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) <= set(range(N_QUERY_VECS))
    for q, rows in by_q.items():
        assert all(cells[r["neighbor_id"]] == cells[q] for r in rows)
        assert all(r["neighbor_id"] != q for r in rows)
        ordered = sorted(rows, key=lambda r: r["rank"])
        assert [r["rank"] for r in ordered] == list(
            range(1, len(rows) + 1)
        )
        scores = [r["score_e6"] for r in ordered]
        assert scores == sorted(scores, reverse=True)


def test_pq_fingerprint_variant_tag_separates_sidecars():
    """The residual-space codebook must never collide with the plain-PQ
    sidecar trained on the same source file with the same params; a
    None variant reproduces the pre-variant fingerprint text."""
    from abr_etl_spark.operators.similarity import _pq_fingerprint
    from tests.conftest import SF_ORACLE

    src = f"{SF_ORACLE}/embeddings.parquet"
    base = _pq_fingerprint(src, 4, 16, 8, 1)
    tagged = _pq_fingerprint(src, 4, 16, 8, 1, variant="ivf-residual-mod50")
    assert base != tagged
    assert tagged.startswith(base)
    assert base.endswith("|v1")


# ----------------------------------------------------- hll_merge_by_type


def test_hll_merge_equals_single_pass_sketch(spark, tmp_path):
    """The point of the key: the '__ALL__' row, computed ONLY by
    merging per-scope registers (per-bucket max), is bit-identical to
    a direct single-pass sketch over all events -- max is associative,
    commutative, idempotent. Disjoint and overlapping user sets across
    scopes both covered; oracle matches."""
    from abr_etl_spark.plans.analytics8 import (
        HLL_M,
        _hll_hash_sql,
        _hll_rank_sql,
        hll_est_sql,
    )

    events = [
        (i, None, (i * 104729 + 7) % 5000, ["view", "click", "signup"][i % 3],
         1.0, "{}")
        for i in range(2000)
    ]
    con = _lake(spark, tmp_path, events=events)
    try:
        rows = {
            r["scope"]: r
            for r in lp9.hll_merge_by_type(spark, str(tmp_path)).collect()
        }
        assert set(rows) == {"__ALL__", "view", "click", "signup"}
        # direct single-pass sketch over ALL events, no scope split
        h = f"({_hll_hash_sql('user_id')})"
        direct = (
            spark.read.parquet(str(tmp_path / "events.parquet"))
            .selectExpr(
                f"{h} % {HLL_M} AS bucket",
                f"{_hll_rank_sql(f'{h} DIV {HLL_M}')} AS rank",
            )
            .groupBy("bucket")
            .agg(F.max("rank").alias("max_rank"))
            .groupBy()
            .agg(
                F.count("*").cast("long").alias("n_filled"),
                F.sum(F.expr("power(2.0, -max_rank)")).alias("S_f"),
            )
            .selectExpr(
                "n_filled",
                hll_est_sql(
                    f"({HLL_M} - n_filled)",
                    f"(({HLL_M} - n_filled) + S_f)",
                )
                + " AS est",
            )
            .collect()[0]
        )
        assert rows["__ALL__"]["n_filled"] == direct["n_filled"]
        assert rows["__ALL__"]["est"] == direct["est"]
        assert_matches_oracle(
            lp9.hll_merge_by_type(spark, str(tmp_path)),
            con,
            lp9.ORACLES["hll_merge_by_type"],
            "hll_merge_by_type",
        )
    finally:
        con.close()


def test_hll_merge_single_scope_all_equals_scope(spark, tmp_path):
    """One scope only: the merged row must equal that scope's row
    (idempotent merge), est included."""
    events = [
        (i, None, i % 37, "view", 1.0, "{}") for i in range(300)
    ]
    con = _lake(spark, tmp_path, events=events)
    try:
        rows = {
            r["scope"]: r
            for r in lp9.hll_merge_by_type(spark, str(tmp_path)).collect()
        }
        assert set(rows) == {"__ALL__", "view"}
        assert rows["__ALL__"]["n_filled"] == rows["view"]["n_filled"]
        assert rows["__ALL__"]["est"] == rows["view"]["est"]
        assert_matches_oracle(
            lp9.hll_merge_by_type(spark, str(tmp_path)),
            con,
            lp9.ORACLES["hll_merge_by_type"],
            "hll_merge_by_type",
        )
    finally:
        con.close()


# -------------------------------------------------- kmv_merge_by_source


def test_kmv_merge_equals_direct_sketch(spark, tmp_path):
    """The '__ALL__' row, computed only from per-source k-min lists,
    equals the direct whole-corpus KMV (k smallest distinct gram
    hashes): any globally-k-smallest hash is k-smallest in its own
    source. Sources share some text so the union has duplicates --
    the distinct-merge path is actually exercised."""
    from abr_etl_spark.functions import texthash as th
    from abr_etl_spark.plans.llm_pipeline3 import KMV_K

    shared = " ".join(f"s{i}" for i in range(60))
    docs = [
        (1, shared + " " + " ".join(f"a{i}" for i in range(60)), "en", "a", 1),
        (2, shared + " " + " ".join(f"b{i}" for i in range(60)), "en", "b", 1),
        (3, " ".join(f"c{i}" for i in range(120)), "en", "c", 1),
    ]
    con = _lake(spark, tmp_path, docs=docs)
    try:
        rows = {
            r["scope"]: r
            for r in lp9.kmv_merge_by_source(spark, str(tmp_path)).collect()
        }
        assert set(rows) == {"__ALL__", "a", "b", "c"}
        direct = (
            spark.read.parquet(str(tmp_path / "documents.parquet"))
            .selectExpr(
                f"{th.sp_token_hashes(th.sp_tokens('text'))} AS tth"
            )
            .selectExpr(
                f"explode({th.sp_gram_hashes_from_token_hashes('tth', 3)})"
                " AS h"
            )
            .distinct()
            .orderBy(F.col("h").asc())
            .limit(KMV_K)
            .groupBy()
            .agg(F.count("*").alias("k"), F.max("h").alias("kth_hash"))
            .collect()[0]
        )
        assert rows["__ALL__"]["k"] == direct["k"]
        assert rows["__ALL__"]["kth_hash"] == direct["kth_hash"]
        assert_matches_oracle(
            lp9.kmv_merge_by_source(spark, str(tmp_path)),
            con,
            lp9.ORACLES["kmv_merge_by_source"],
            "kmv_merge_by_source",
        )
    finally:
        con.close()


def test_kmv_merge_single_source_idempotent(spark, tmp_path):
    """One source: the merged row equals that source's row (k and
    kth_hash both), and a gram-poor source reports its own k in the
    estimate numerator (est ~ true distinct count, not the full-k
    formula)."""
    docs = [(1, "alpha beta gamma delta epsilon", "en", "solo", 1)]
    con = _lake(spark, tmp_path, docs=docs)
    try:
        rows = {
            r["scope"]: r
            for r in lp9.kmv_merge_by_source(spark, str(tmp_path)).collect()
        }
        assert set(rows) == {"__ALL__", "solo"}
        assert rows["__ALL__"]["k"] == rows["solo"]["k"]
        assert rows["__ALL__"]["kth_hash"] == rows["solo"]["kth_hash"]
        # 5 tokens -> 3 distinct 3-grams; k=3 < KMV_K
        assert rows["solo"]["k"] == 3
        assert_matches_oracle(
            lp9.kmv_merge_by_source(spark, str(tmp_path)),
            con,
            lp9.ORACLES["kmv_merge_by_source"],
            "kmv_merge_by_source",
        )
    finally:
        con.close()


# -------------------------------------------------- cms_merge_by_source


def test_cms_merge_equals_single_pass_sketch(spark, tmp_path):
    """Linearity: the '__ALL__' estimates, computed only from summing
    per-source cells, equal the direct single-pass heavy_hitters_cms
    output; a token absent from a source estimates 0 under that
    source's sketch."""
    from abr_etl_spark.plans import llm_pipeline4 as lp4

    docs = [
        (0, "apple banana apple cherry", "en", "a", 1),
        (1, "banana banana durian", "en", "b", 1),
        (2, "apple elder fig grape", "en", "b", 1),
        (3, "unrelated words only here", "en", "c", 1),
    ]
    con = _lake(spark, tmp_path, docs=docs)
    try:
        rows = lp9.cms_merge_by_source(spark, str(tmp_path)).collect()
        all_est = {
            r["tok"]: r["est_freq"] for r in rows if r["scope"] == "__ALL__"
        }
        direct = {
            r["tok"]: r["est_freq"]
            for r in lp4.heavy_hitters_cms(spark, str(tmp_path)).collect()
        }
        assert all_est == direct
        per_c = {
            r["tok"]: r["est_freq"] for r in rows if r["scope"] == "c"
        }
        # 'apple' never occurs in source c -> its cells are absent
        # there -> estimate 0 (collision-free at this tiny scale)
        assert per_c["apple"] == 0
        assert_matches_oracle(
            lp9.cms_merge_by_source(spark, str(tmp_path)),
            con,
            lp9.ORACLES["cms_merge_by_source"],
            "cms_merge_by_source",
        )
    finally:
        con.close()


def test_cms_merge_single_source_idempotent(spark, tmp_path):
    """One source: the merged sketch IS that source's sketch, so the
    two scopes' estimates agree token for token."""
    docs = [(0, "x y x z x y", "en", "solo", 1)]
    con = _lake(spark, tmp_path, docs=docs)
    try:
        rows = lp9.cms_merge_by_source(spark, str(tmp_path)).collect()
        by_scope: dict = {}
        for r in rows:
            by_scope.setdefault(r["scope"], {})[r["tok"]] = r["est_freq"]
        assert by_scope["__ALL__"] == by_scope["solo"]
        assert by_scope["solo"]["x"] == 3
        assert_matches_oracle(
            lp9.cms_merge_by_source(spark, str(tmp_path)),
            con,
            lp9.ORACLES["cms_merge_by_source"],
            "cms_merge_by_source",
        )
    finally:
        con.close()


# ----------------------------------------------- ivfadc_trained_nprobe


def test_trained_nprobe_shares_candidates_with_seed_sweep(spark):
    """Candidate generation reads only the coarse quantizer, never the
    codebook: the trained sweep's n_candidates and n_true columns must
    equal ivfadc_nprobe_sweep's row for row -- the two reports differ
    only in ranking quality (n_common may differ)."""
    from tests.conftest import SF_ORACLE

    seed = {
        r["nprobe"]: r
        for r in lp9.ivfadc_nprobe_sweep(spark, SF_ORACLE).collect()
    }
    trained = {
        r["nprobe"]: r
        for r in lp9.ivfadc_trained_nprobe(spark, SF_ORACLE).collect()
    }
    assert sorted(seed) == sorted(trained) == lp9.IVFADC_NPROBE_GRID
    for np_ in lp9.IVFADC_NPROBE_GRID:
        assert seed[np_]["n_candidates"] == trained[np_]["n_candidates"]
        assert seed[np_]["n_true"] == trained[np_]["n_true"]
        assert trained[np_]["n_common"] >= 0
