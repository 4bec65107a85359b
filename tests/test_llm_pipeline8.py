"""Round-10 operators: cross-source vocabulary overlap, packing
telemetry, MMR-diversified top-k."""

from __future__ import annotations

import pytest

import duckdb
from pyspark.sql import Window
from pyspark.sql import functions as F

from abr_etl_spark.plans import llm_pipeline8 as lp8
from tests.conftest import SF_ORACLE, assert_matches_oracle


def _lake(spark, tmp_path, docs=None, embs=None):
    docs = docs if docs is not None else []
    embs = embs if embs is not None else []
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, "
        "n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    spark.createDataFrame(
        embs, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{tmp_path}/{t}.parquet/*.parquet')"
        )
    return con


def test_overlap_identical_and_disjoint_sources(spark, tmp_path):
    """Identical vocabularies -> jaccard 10000; disjoint -> 0 and the
    pair still reported (zero-overlap pairs must not vanish)."""
    docs = [
        (1, "alpha beta gamma delta epsilon", "en", "a", 30),
        (2, "alpha beta gamma delta epsilon", "en", "b", 30),
        (3, "zebra yak xylo walrus vulture", "en", "c", 29),
    ]
    con = _lake(spark, tmp_path, docs=docs)
    try:
        rows = {
            (r["source_a"], r["source_b"]): r
            for r in lp8.cross_source_ngram_overlap(
                spark, str(tmp_path)
            ).collect()
        }
        assert set(rows) == {("a", "b"), ("a", "c"), ("b", "c")}
        assert rows[("a", "b")]["jaccard_e4"] == 10000
        assert rows[("a", "c")]["jaccard_e4"] == 0
        assert rows[("a", "c")]["n_common"] == 0
        assert_matches_oracle(
            lp8.cross_source_ngram_overlap(spark, str(tmp_path)),
            con,
            lp8.ORACLES["cross_source_ngram_overlap"],
            key="cross_source_ngram_overlap/synthetic",
        )
    finally:
        con.close()


def test_pack_efficiency_hand_computed(spark, tmp_path):
    """100+200+300 tokens into 256-token bins: 3 bins, 600/768 fill,
    two boundary-spanning docs, 168 wasted tokens."""
    docs = [
        (1, " ".join(["t"] * 100), "en", "a", 200),
        (2, " ".join(["t"] * 200), "en", "a", 400),
        (3, " ".join(["t"] * 300), "en", "a", 600),
    ]
    con = _lake(spark, tmp_path, docs=docs)
    try:
        r = lp8.pack_efficiency_report(spark, str(tmp_path)).collect()[0]
        assert r["n_docs"] == 3
        assert r["tokens_total"] == 600
        assert r["n_bins"] == 3 and r["capacity"] == 768
        assert r["fill_e4"] == (2 * 10000 * 600 + 768) // (2 * 768)
        assert r["n_spanning"] == 2
        assert r["waste_tokens"] == 168
        assert_matches_oracle(
            lp8.pack_efficiency_report(spark, str(tmp_path)),
            con,
            lp8.ORACLES["pack_efficiency_report"],
            key="pack_efficiency_report/synthetic",
        )
    finally:
        con.close()


def test_mmr_prefers_diverse_over_redundant(spark, tmp_path):
    """Candidate 11 is a near-duplicate of pick 10 and out-relevants
    candidate 12 -- plain top-k keeps 11 second, MMR must demote it
    below the diverse 12."""
    dim = 10

    def vec(*pairs):
        v = [0.0] * dim
        for i, x in pairs:
            v[i] = x
        return v

    # Geometry (in the e0/e1 plane, angles from query 0): pick-1 winner
    # at 25 deg, a near-duplicate 1 deg away (sim = cos 1 deg ~ 0.9998),
    # and a diverse candidate at -30 deg (sim to the winner = cos 55 deg
    # ~ 0.574). With lambda = 0.7: the near-dup scores 7*0.8988 -
    # 3*0.9998 = 3.292; the diverse one 7*0.8660 - 3*0.5736 = 4.341 --
    # MMR must flip the relevance order.
    embs = [(i, vec((i, 1.0)), 0) for i in range(10)]  # orthogonal queries
    embs += [
        (10, vec((0, 0.9063078), (1, 0.4226183)), 1),   # 25 deg
        (11, vec((0, 0.8987940), (1, 0.4383711)), 1),   # 26 deg: near-dup
        (12, vec((0, 0.8660254), (1, -0.5)), 1),        # -30 deg: diverse
    ]
    con = _lake(spark, tmp_path, embs=embs)
    try:
        out = lp8.mmr_diversify_topk(spark, str(tmp_path))
        q0 = {
            r["pick"]: r for r in out.where(F.col("query_id") == 0).collect()
        }
        assert q0[1]["neighbor_id"] == 10
        assert q0[2]["neighbor_id"] == 12, (
            "MMR must pick the diverse candidate over the near-dup"
        )
        assert q0[3]["neighbor_id"] == 11  # the near-dup lands third
        # ...and it really is a re-ranking, not the relevance order:
        # the demoted near-dup out-relevants the diverse winner.
        from abr_etl_spark.operators.similarity import cosine_topk
        from abr_etl_spark.sources.lake import load_table

        e = load_table(spark, str(tmp_path), "embeddings")
        topk = {
            r["neighbor_id"]: r["rank"]
            for r in cosine_topk(
                e, e.where(F.col("vec_id") == 0), k=lp8.MMR_CANDS
            ).collect()
        }
        assert topk[11] < topk[12]
        assert q0[1]["score_e7"] == lp8.MMR_WREL * q0[1]["rel_e6"]
        assert_matches_oracle(
            out,
            con,
            lp8.ORACLES["mmr_diversify_topk"],
            key="mmr_diversify_topk/synthetic",
        )
    finally:
        con.close()


def test_overlap_vs_oracle_sf001(spark):
    """Full-corpus parity at smoke sf (the driver gate re-proves at
    sf0.01)."""
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.001/{t}.parquet')"
        )
    try:
        assert_matches_oracle(
            lp8.pack_efficiency_report(spark, "/root/testdata/sf0.001"),
            con,
            lp8.ORACLES["pack_efficiency_report"],
            key="pack_efficiency_report",
        )
    finally:
        con.close()


def test_mmr_scores_monotone_within_query(spark):
    """Within a query, the greedy picks' scores are non-increasing and
    rel_e6 of pick 1 is the candidate max (pick 1 = pure relevance)."""
    out = lp8.mmr_diversify_topk(spark, SF_ORACLE).collect()
    by_q: dict = {}
    for r in out:
        by_q.setdefault(r["query_id"], {})[r["pick"]] = r
    assert by_q
    for picks in by_q.values():
        assert set(picks) == {1, 2, 3}
        assert picks[1]["score_e7"] == lp8.MMR_WREL * picks[1]["rel_e6"]
        assert picks[2]["score_e7"] >= picks[3]["score_e7"]


def test_waterfill_hand_case(spark, tmp_path):
    """tokens (10, 40, 50), budget 60% of 100 = 60: the small source
    keeps all 10, the two large ones split 50 as 25 each."""
    docs = [
        (1, " ".join(["t"] * 10), "en", "small", 20),
        (2, " ".join(["t"] * 40), "en", "mid", 80),
        (3, " ".join(["t"] * 50), "en", "big", 100),
    ]
    con = _lake(spark, tmp_path, docs=docs)
    try:
        rows = {
            r["source"]: r
            for r in lp8.corpus_budget_waterfill(
                spark, str(tmp_path)
            ).collect()
        }
        assert rows["small"]["tokens_allocated"] == 10
        assert rows["small"]["kept_full"] == 1
        assert rows["mid"]["tokens_allocated"] == 25
        assert rows["big"]["tokens_allocated"] == 25
        assert sum(r["tokens_allocated"] for r in rows.values()) == 60
        assert_matches_oracle(
            lp8.corpus_budget_waterfill(spark, str(tmp_path)),
            con,
            lp8.ORACLES["corpus_budget_waterfill"],
            key="corpus_budget_waterfill/hand",
        )
    finally:
        con.close()


@pytest.mark.slow
def test_waterfill_invariants_hypothesis():
    """Water-fill invariants over arbitrary small corpora, checked on
    the DuckDB text (the shared algorithm; Spark parity is the gate's
    job): total allocated == min(budget, total); never negative, never
    above a source's tokens; all capped sources sit within one unit of
    each other (the water level)."""
    import duckdb
    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=150, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=0, max_value=500),
            min_size=1,
            max_size=12,
        )
    )
    def run(tokens):
        con = duckdb.connect()
        rows = []
        for i, n in enumerate(tokens):
            rows.append((i, " ".join(["t"] * n) if n else "", f"s{i:02d}"))
        frame = pd.DataFrame(rows, columns=["doc_id", "text", "source"])
        con.register("documents", frame)
        out = con.execute(
            lp8.ORACLES["corpus_budget_waterfill"]
        ).fetchall()
        con.close()
        # the tokenizer counts the empty string as one token -- build
        # the expected availability the same way
        avail = {f"s{i:02d}": max(n, 1) for i, n in enumerate(tokens)}
        total = sum(avail.values())
        budget = (lp8.BUDGET_NUM * total) // lp8.BUDGET_DEN
        got = {s: (t, a, k) for s, t, a, k in out}
        assert set(got) == set(avail)
        alloc_total = 0
        capped = []
        for s, (t, a, k) in got.items():
            assert t == avail[s]
            assert 0 <= a <= t, (s, a, t)
            assert k == (1 if a == t else 0)
            alloc_total += a
            if a < t:
                capped.append(a)
        assert alloc_total == min(budget, total)
        if capped:
            assert max(capped) - min(capped) <= 1

    run()


def test_lang_mix_and_heatmap_conservation(spark, tmp_path):
    docs = [
        (1, "x", "en", "a", 1),
        (2, "x", "en", "a", 1),
        (3, "x", "de", "a", 1),
        (4, "x", "fr", "b", 1),
    ]
    con = _lake(spark, tmp_path, docs=docs)
    try:
        rows = {
            (r["source"], r["lang"]): r
            for r in lp8.lang_mix_by_source(spark, str(tmp_path)).collect()
        }
        assert rows[("a", "en")]["share_e4"] == 6667
        assert rows[("a", "de")]["share_e4"] == 3333
        assert rows[("b", "fr")]["share_e4"] == 10000
        assert_matches_oracle(
            lp8.lang_mix_by_source(spark, str(tmp_path)),
            con,
            lp8.ORACLES["lang_mix_by_source"],
            key="lang_mix_by_source/hand",
        )
    finally:
        con.close()
    hm = lp8.event_heatmap_cells(spark, "/root/testdata/sf0.001").collect()
    from abr_etl_spark.sources.lake import load_table

    assert sum(r["n_events"] for r in hm) == load_table(
        spark, "/root/testdata/sf0.001", "events"
    ).count()
    for r in hm:
        assert 0 <= r["dow"] <= 6 and 0 <= r["hour"] <= 23
        assert 1 <= r["n_users"] <= r["n_events"]


def test_mmr_lambda_one_reduces_to_topk(spark):
    """r10 verdict item 7 invariance: wdiv=0 (lambda=1) makes the greedy
    chain pick exactly the plain top-k by (rel_e6 desc, neighbor_id) --
    MMR with no diversity term IS relevance ranking."""
    cand, sim = lp8._mmr_inputs(spark, SF_ORACLE, lp8.MMR_CANDS)
    picks = lp8._mmr_greedy(cand, sim, k=3, wrel=10, wdiv=0).collect()
    got = {
        (r["query_id"], r["pick"]): r["neighbor_id"] for r in picks
    }
    # independent top-k: rank the candidate list directly
    rows = cand.collect()
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(
            (-r["rel_e6"], r["neighbor_id"])
        )
    assert by_q
    for q, lst in by_q.items():
        for pick, (_, nid) in enumerate(sorted(lst)[:3], start=1):
            assert got[(q, pick)] == nid
    # and every score is exactly 10 * rel (no diversity term leaked in)
    rel = {(r["query_id"], r["neighbor_id"]): r["rel_e6"] for r in rows}
    for r in picks:
        assert r["score_e7"] == 10 * rel[(r["query_id"], r["neighbor_id"])]


def test_mmr_lambda_sweep_tradeoff_axes(spark):
    """The sweep's two axes move the way the trade-off says they must:
    relevance is maximal at lambda=1 and non-increasing as the diversity
    weight grows; intra-list pair similarity is maximal at lambda=1."""
    out = lp8.mmr_lambda_sweep(spark, SF_ORACLE).collect()
    assert [r["wrel"] for r in out] == [10, 8, 7, 5, 3]
    n = out[0]["n_picks"]
    assert n > 0 and all(r["n_picks"] == n for r in out)
    rels = [r["sum_rel_e6"] for r in out]
    assert rels[0] == max(rels)
    assert all(a >= b for a, b in zip(rels, rels[1:]))
    sims = [r["sum_pairsim_e6"] for r in out]
    assert sims[0] == max(sims)


def test_pq_seed_vectors_encode_to_own_codeword(spark):
    """A corpus vector that IS a codebook seed must encode to its own
    codeword in every subspace (d=0 beats everything; ties break to the
    lower id, and seeds are distinct at this sf) -- and its ADC score
    against itself-as-query is then the exact sum of its own LUT cells.
    Also: exactly ANN_K rows per query, ranks 1..ANN_K."""
    from abr_etl_spark.plans.llm_pipeline import ANN_K, N_QUERY_VECS

    out = lp8.ann_pq_adc(spark, SF_ORACLE).collect()
    by_q: dict = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(range(N_QUERY_VECS))
    for q, rows in by_q.items():
        assert sorted(r["rank"] for r in rows) == list(range(1, ANN_K + 1))
        scores = [r["adc_e6"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert scores == sorted(scores, reverse=True)
        assert all(r["neighbor_id"] != q for r in rows)


def test_pq_adc_approximates_exact_ranking(spark):
    """The eval that justifies PQ: recall@5 of ADC vs exact cosine
    top-5 is well above chance (5/|corpus|), though below 1 -- it IS a
    lossy quantizer with 4 deterministic seeds."""
    from pyspark.sql import functions as F

    from abr_etl_spark.operators.similarity import cosine_topk

    e = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    q = e.where(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(e, q, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in lp8.ann_pq_adc(spark, SF_ORACLE).collect()
    }
    recall = len(exact & approx) / len(exact)
    n = e.count()
    assert recall > 5 * (5 / n)  # far above random
    assert recall >= 0.2


def test_weighted_jaccard_hand_case(spark, tmp_path, monkeypatch):
    """Weighting demotes boilerplate-heavy pairs: two docs sharing only
    CORPUS-WIDE boilerplate shingles score lower weighted than plain,
    while a pair sharing RARE prose scores higher. Identical docs score
    10000 on both axes."""
    import os

    from abr_etl_spark.plans import llm_pipeline8 as l8

    boiler = "click here to subscribe to the newsletter today"
    rare_a = "quantum ducks migrate beneath veiled auroras yearly"
    docs = [
        # pair (0,1): identical -> jaccard 1, weighted 1
        (0, f"{rare_a} {boiler}", "en", "s0", 1),
        (1, f"{rare_a} {boiler}", "en", "s0", 1),
        # docs 2..9: all contain the boilerplate, unique prose otherwise
    ] + [
        (
            i,
            f"{boiler} unique token{i}a token{i}b token{i}c token{i}d"
            f" token{i}e token{i}f",
            "en",
            "s1",
            1,
        )
        for i in range(2, 10)
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = tmp_path / "lake"
    d.mkdir()
    df.coalesce(1).write.parquet(str(d / "documents.parquet"))
    out = {
        (r["doc_a"], r["doc_b"]): (r["jaccard"], r["wjaccard_e4"])
        for r in l8.dedup_weighted_jaccard(spark, str(d)).collect()
    }
    assert out[(0, 1)] == (1.0, 10000)
    # every reported weighted score is a valid e4 share
    assert all(0 <= w <= 10000 for _, w in out.values())


def test_weighted_jaccard_matches_oracle_smoke(spark, ddb):
    from abr_etl_spark.plans import llm_pipeline8 as l8

    assert_matches_oracle(
        l8.dedup_weighted_jaccard(spark, SF_ORACLE),
        ddb,
        l8.ORACLES["dedup_weighted_jaccard"],
        key="dedup_weighted_jaccard",
    )


def test_weighted_jaccard_broadcast_guard(spark, monkeypatch):
    """The pair-list broadcast() hint is size-conditional (r11 verdict
    item 5): at the default cap (tau=0.9, sparse survivors) the
    analyzed plan carries the explicit broadcast ResolvedHints exactly
    as before; with the cap forced below the survivor count the hints
    vanish (AQE owns the strategy) and the VALUES are unchanged."""
    from abr_etl_spark.plans import llm_pipeline8 as l8

    def _n_hints(df):
        return df._jdf.queryExecution().analyzed().toString().count(
            "ResolvedHint"
        )

    hinted = l8.dedup_weighted_jaccard(spark, SF_ORACLE)
    baseline = _n_hints(hinted)
    rows_hinted = hinted.collect()

    monkeypatch.setattr(l8, "WJ_PAIR_BROADCAST_CAP", 0)
    unhinted = l8.dedup_weighted_jaccard(spark, SF_ORACLE)
    # survivors > 0 > cap: exactly the ONE survivor-explode hint
    # vanishes -- the fused union explode (r17: numerator and
    # denominator ride one frame; the bounded 1-row total-count hint
    # remains, that frame is 1-row by construction, not
    # survivor-scaled).
    assert _n_hints(unhinted) == baseline - 1
    assert unhinted.collect() == rows_hinted


def test_lsh_band_sweep_monotone(spark):
    """More bands of fewer rows -> the collision threshold drops, so
    candidates and recall are non-increasing as bands shrink; the
    (16,4) layout (s-curve ~0.5) catches every tau=0.9 truth pair at
    this sf (miss probability ~3e-4 per pair)."""
    out = lp8.lsh_band_sweep(spark, SF_ORACLE).collect()
    assert [(r["bands"], r["rows_per_band"]) for r in out] == lp8.LSH_GRID
    cands = [r["n_candidates"] for r in out]
    hits = [r["n_hits"] for r in out]
    assert all(a >= b for a, b in zip(cands, cands[1:]))
    assert all(a >= b for a, b in zip(hits, hits[1:]))
    n_true = out[0]["n_true"]
    assert n_true > 0 and all(r["n_true"] == n_true for r in out)
    assert out[0]["n_hits"] == n_true and out[0]["recall_e4"] == 10000
    assert all(r["n_hits"] <= r["n_candidates"] for r in out)


def test_pq_recall_sweep_monotone_in_codebook_size(spark):
    """Finer codebooks quantize better: recall@k is non-decreasing in
    pq_k, and every config's hits are bounded by the truth size."""
    out = lp8.pq_recall_sweep(spark, SF_ORACLE).collect()
    assert [r["pq_k"] for r in out] == lp8.PQ_K_GRID
    n_true = out[0]["n_true"]
    assert n_true > 0 and all(r["n_true"] == n_true for r in out)
    recalls = [r["recall_e4"] for r in out]
    assert all(a <= b for a, b in zip(recalls, recalls[1:]))
    assert all(0 <= r["n_hits"] <= n_true for r in out)
    assert recalls[-1] >= 2000  # 16 codewords: well above chance


def test_sessionize_gap_sweep_monotone_and_consistent(spark):
    """Larger gaps merge sessions: n_sessions and n_singletons are
    non-increasing in gap_s, mean session length non-decreasing,
    n_events constant; the 1800 row agrees with `sessionize`."""
    from abr_etl_spark.plans.analytics import sessionize

    out = lp8.sessionize_gap_sweep(spark, SF_ORACLE).collect()
    assert [r["gap_s"] for r in out] == lp8.SESSION_GAP_GRID
    ns = [r["n_sessions"] for r in out]
    assert all(a >= b for a, b in zip(ns, ns[1:]))
    sing = [r["n_singletons"] for r in out]
    assert all(a >= b for a, b in zip(sing, sing[1:]))
    me = [r["mean_events_e4"] for r in out]
    assert all(a <= b for a, b in zip(me, me[1:]))
    ev = [r["n_events"] for r in out]
    assert len(set(ev)) == 1 and ev[0] > 0
    base = sessionize(spark, SF_ORACLE).count()
    assert out[1]["n_sessions"] == base  # gap=1800 IS sessionize


def test_ann_ivf_pq_respects_cell_routing(spark):
    """IVFADC semantics: every returned neighbor lives in the QUERY'S
    cell (nprobe=1 -- cross-cell candidates are missed by design, the
    IVF approximation); ranks are 1..K-ish contiguous per query with
    strictly ordered scores; no self-matches."""
    from pyspark.sql import functions as F

    from abr_etl_spark.operators.similarity import ivf_assign
    from abr_etl_spark.plans.llm_pipeline import N_QUERY_VECS

    e = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    cent = e.where(F.col("vec_id") % 50 == 0)
    cells = {
        r["vec_id"]: r["centroid_id"]
        for r in ivf_assign(e, cent).collect()
    }
    out = lp8.ann_ivf_pq(spark, SF_ORACLE).collect()
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


def test_ann_ivf_pq_ranks_within_cell_sensibly(spark):
    """The ADC score is a usable within-cell ranking: overlap between
    IVFADC's top-5 and the EXACT cosine top-5 restricted to the same
    cell is well above chance (it is the same candidate set, ranked by
    a lossy 4x8 residual quantizer)."""
    from pyspark.sql import functions as F

    from abr_etl_spark.functions import texthash as th
    from abr_etl_spark.operators.similarity import ivf_assign
    from abr_etl_spark.plans.llm_pipeline import N_QUERY_VECS

    e = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    cent = e.where(F.col("vec_id") % 50 == 0)
    asg = ivf_assign(e, cent)
    a = asg.select("centroid_id", F.col("vec_id").alias("query_id"),
                   F.col("embedding").alias("qv"))
    b = asg.select("centroid_id", F.col("vec_id").alias("neighbor_id"),
                   F.col("embedding").alias("nv"))
    exact = (
        a.where(F.col("query_id") < N_QUERY_VECS)
        .join(b, "centroid_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(F.expr(th.sp_cosine("qv", "nv")), 6))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("cos").desc(), F.col("neighbor_id").asc()
                )
            ),
        )
        .where(F.col("rk") <= 5)
    )
    truth = {
        (r["query_id"], r["neighbor_id"]) for r in exact.collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in lp8.ann_ivf_pq(spark, SF_ORACLE).collect()
        if r["rank"] <= 5
    }
    recall = len(truth & approx) / max(1, len(truth))
    # measured 0.26 at sf0.01 (cells ~50 vectors -> chance ~5/50 = 0.1);
    # a 4x8 residual quantizer is lossy by design
    assert recall >= 0.2


def test_kmeans_k_sweep_elbow_axes(spark):
    """Elbow-curve sanity on the deterministic sweep: one row per grid
    k; more centroids never hurt the post-move inertia at this sf
    (nested seed prefixes); cell-balance improves; every cell is used
    and max_cell_n can't beat the pigeonhole bound n/k."""
    out = lp8.kmeans_k_sweep(spark, SF_ORACLE).collect()
    assert [r["k"] for r in out] == lp8.KSWEEP_GRID
    n = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet").count()
    inert = [r["inertia_e6"] for r in out]
    assert all(a >= b for a, b in zip(inert, inert[1:]))
    assert inert[-1] < inert[0]
    mx = [r["max_cell_n"] for r in out]
    assert all(a >= b for a, b in zip(mx, mx[1:]))
    for r in out:
        assert 0 < r["n_cells_used"] <= r["k"]
        assert r["max_cell_n"] * r["k"] >= n  # pigeonhole
        assert r["inertia_e6"] > 0


def test_vocab_coverage_sweep_properties(spark, tmp_path):
    """Hand case: 10 'a', 5 'b', 1 'c' with grid {100, 1000, 10000} --
    every grid point covers the full 3-type vocabulary (coverage
    10000); on the real corpus coverage and n_types are non-decreasing
    in v and coverage_e4 <= 10000."""
    docs = [
        (1, " ".join(["a"] * 10 + ["b"] * 5 + ["c"]), "en", "s", 16),
    ]
    con = _lake(spark, tmp_path, docs=docs)
    try:
        rows = lp8.vocab_coverage_sweep(spark, str(tmp_path)).collect()
        assert [r["v"] for r in rows] == lp8.VOCAB_GRID
        for r in rows:
            assert r["n_types"] == 3
            assert r["covered_tokens"] == 16 and r["total_tokens"] == 16
            assert r["coverage_e4"] == 10000
        assert_matches_oracle(
            lp8.vocab_coverage_sweep(spark, str(tmp_path)),
            con,
            lp8.ORACLES["vocab_coverage_sweep"],
            key="vocab_coverage_sweep/synthetic",
        )
    finally:
        con.close()
    out = lp8.vocab_coverage_sweep(spark, SF_ORACLE).collect()
    cov = [r["coverage_e4"] for r in out]
    assert all(a <= b for a, b in zip(cov, cov[1:]))
    assert all(0 < c <= 10000 for c in cov)
    nt = [r["n_types"] for r in out]
    assert all(a <= b for a, b in zip(nt, nt[1:]))
    tot = {r["total_tokens"] for r in out}
    assert len(tot) == 1


def test_k_anonymity_hand_case_and_monotone(spark):
    """Monotone in k: raising the threshold can only add at-risk
    groups/rows; share_e4 bounded; and a hand-checked tiny frame --
    groups of size (1, 2, 3): k=2 flags only the singleton, k=5 flags
    everything."""
    from pyspark.sql import Row

    out = lp8.k_anonymity_report(spark, SF_ORACLE).collect()
    assert [r["k"] for r in out] == lp8.KANON_GRID
    for axis in ("n_groups_at_risk", "n_rows_at_risk", "share_e4"):
        vals = [r[axis] for r in out]
        assert all(a <= b for a, b in zip(vals, vals[1:]))
    assert all(0 <= r["share_e4"] <= 10000 for r in out)

    # hand case through the same grouped-count + grid logic
    rows = (
        [Row(c_nationkey=1, c_mktsegment="A", c_acctbal=100.0)]
        + [Row(c_nationkey=2, c_mktsegment="A", c_acctbal=100.0)] * 2
        + [Row(c_nationkey=3, c_mktsegment="B", c_acctbal=100.0)] * 3
    )
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(rows).write.mode("overwrite").parquet(
            os.path.join(td, "customer.parquet")
        )
        res = {
            r["k"]: r for r in lp8.k_anonymity_report(spark, td).collect()
        }
    assert res[2]["n_groups_at_risk"] == 1
    assert res[2]["n_rows_at_risk"] == 1
    assert res[2]["share_e4"] == (2 * 10000 * 1 + 6) // 12
    assert res[5]["n_groups_at_risk"] == 3
    assert res[5]["n_rows_at_risk"] == 6
    assert res[5]["share_e4"] == 10000
    assert res[10].asDict() == {**res[5].asDict(), "k": 10}


def test_dup_quality_report_bands_and_bounds(spark):
    """All three bands exist (the two-tier planting guarantees it);
    shares sum to ~1; group arithmetic is consistent (a small_2_4
    group holds 2-4 docs, large 5+); quality means stay in [0, 10000
    + slack] (the integer score can exceed 10000 only via the length
    credit cap interplay -- it cannot go negative)."""
    out = {r["band"]: r for r in lp8.dup_quality_report(spark, SF_ORACLE).collect()}
    assert set(out) == {"unique", "small_2_4", "large_5_plus"}
    total_share = sum(r["share_e4"] for r in out.values())
    assert 9998 <= total_share <= 10002  # three half-up roundings
    u, s, l = out["unique"], out["small_2_4"], out["large_5_plus"]
    assert u["n_docs"] == u["n_groups"]
    assert 2 * s["n_groups"] <= s["n_docs"] <= 4 * s["n_groups"]
    assert l["n_docs"] >= 5 * l["n_groups"]
    # planted copies: 40 doubletons (doc_id 10..49), 10 sextuplets
    assert s["n_groups"] >= 40 and l["n_groups"] >= 10
    for r in out.values():
        assert 0 <= r["mean_q_e2"] <= 1000000


def test_bloom_fpr_sweep_monotone_and_sane(spark):
    """More bits -> fewer false positives: fpr_e4 and n_false_pos are
    non-increasing in m; occupancy grows in m but never beats K*n or
    m; the largest grid point IS bloom_membership's M (its absent
    count must agree)."""
    from abr_etl_spark.plans.analytics8 import BLOOM_M, bloom_membership

    out = lp8.bloom_fpr_sweep(spark, SF_ORACLE).collect()
    assert [r["m"] for r in out] == lp8.BLOOM_M_GRID
    fpr = [r["fpr_e4"] for r in out]
    assert all(a >= b for a, b in zip(fpr, fpr[1:]))
    nfp = [r["n_false_pos"] for r in out]
    assert all(a >= b for a, b in zip(nfp, nfp[1:]))
    occ = [r["n_bits_set"] for r in out]
    assert all(a <= b for a, b in zip(occ, occ[1:]))
    n = out[0]["n_probes"]
    for r in out:
        assert r["n_bits_set"] <= min(r["m"], 4 * n)
        assert 0 <= r["n_false_pos"] <= r["n_probes"] == n
    assert lp8.BLOOM_M_GRID[-1] == BLOOM_M
    bm = {
        r["probe_kind"]: r for r in bloom_membership(spark, SF_ORACLE).collect()
    }
    assert out[-1]["n_false_pos"] == bm["absent"]["n_flagged"]


def test_l_diversity_hand_case_and_monotone(spark):
    """Monotone in l; hand case: group A has balances in 2 distinct
    buckets (passes l=2, fails l=3+), group B all in one bucket (fails
    every l >= 2)."""
    import os
    import tempfile

    from pyspark.sql import Row

    out = lp8.l_diversity_report(spark, SF_ORACLE).collect()
    assert [r["l"] for r in out] == lp8.LDIV_GRID
    for axis in ("n_groups_at_risk", "n_rows_at_risk", "share_e4"):
        vals = [r[axis] for r in out]
        assert all(a <= b for a, b in zip(vals, vals[1:]))

    rows = [
        Row(c_nationkey=1, c_mktsegment="A", c_acctbal=100.0),
        Row(c_nationkey=1, c_mktsegment="A", c_acctbal=2100.0),
        Row(c_nationkey=2, c_mktsegment="B", c_acctbal=100.0),
        Row(c_nationkey=2, c_mktsegment="B", c_acctbal=150.0),
        Row(c_nationkey=2, c_mktsegment="B", c_acctbal=190.0),
    ]
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(rows).write.mode("overwrite").parquet(
            os.path.join(td, "customer.parquet")
        )
        res = {
            r["l"]: r for r in lp8.l_diversity_report(spark, td).collect()
        }
    assert res[2]["n_groups_at_risk"] == 1      # only the one-bucket group
    assert res[2]["n_rows_at_risk"] == 3
    assert res[3]["n_groups_at_risk"] == 2      # both fail l=3
    assert res[3]["n_rows_at_risk"] == 5
    assert res[3]["share_e4"] == 10000
    assert res[5]["n_groups_at_risk"] == 2


def test_watermark_lateness_monotone_and_hand_case(spark):
    """Allowing more lateness can only drop fewer events; hand case
    replayed through the same deterministic arrival order: with two
    events per user the late count depends only on whether the
    later-hashed one is older."""
    import os
    import tempfile

    from pyspark.sql import functions as SF

    out = lp8.watermark_lateness_sweep(spark, SF_ORACLE).collect()
    assert [r["delay_s"] for r in out] == lp8.LATENESS_GRID
    nl = [r["n_late"] for r in out]
    assert all(a >= b for a, b in zip(nl, nl[1:]))
    assert len({r["n_events"] for r in out}) == 1
    assert out[0]["n_late"] > 0  # hash order really is out-of-order
    assert all(0 <= r["late_share_e4"] <= 10000 for r in out)

    # hand case: one user, two events 120 s apart; whichever arrives
    # second (by the engine-shared hash order) decides lateness --
    # recompute the expected count from the SAME hash expression
    import datetime

    rows = [
        (1, datetime.datetime(2020, 1, 1, 0, 0, 0), 7, "a", 0.0, "{}"),
        (2, datetime.datetime(2020, 1, 1, 0, 2, 0), 7, "a", 0.0, "{}"),
    ]
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp_ntz, user_id long, "
            "event_type string, value double, props string",
        ).write.mode("overwrite").parquet(os.path.join(td, "events.parquet"))
        res = {
            r["delay_s"]: r["n_late"]
            for r in lp8.watermark_lateness_sweep(spark, td).collect()
        }

    # the shared scramble, replayed in plain Python big-int arithmetic
    def h(k):
        p = lp8._LAT_P
        b = (1103515245 * (k % p) + 12345) % p
        return (((b * b) % p) * 69069 + 362437) % p

    # late iff the OLD event (id 1) arrives second under the hash order
    expected0 = 1 if h(1) > h(2) else 0
    assert res[0] == expected0
    assert res[86400] == 0  # the 120 s gap is inside a 1-day allowance


def test_rank_fusion_rrf_properties(spark):
    """RRF sanity: scores bound by the two-list maximum 2*(1e6 DIV 61);
    any candidate ranked 1 by BOTH lists must fuse to rank 1; a
    candidate present in both lists outscores one present in a single
    list at an equal-or-worse rank; per-query ranks contiguous."""
    from abr_etl_spark.plans.llm_pipeline import ANN_K, q_ann_bruteforce

    out = lp8.rank_fusion_rrf(spark, SF_ORACLE).collect()
    assert out
    cap = 2 * (1000000 // (lp8.RRF_K + 1))
    by_q: dict = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
        assert 0 < r["rrf_e6"] <= cap
    for q, rows in by_q.items():
        ordered = sorted(rows, key=lambda r: r["rank"])
        assert [r["rank"] for r in ordered] == list(range(1, len(rows) + 1))
        sc = [r["rrf_e6"] for r in ordered]
        assert sc == sorted(sc, reverse=True)

    bf1 = {
        (r["query_id"], r["neighbor_id"])
        for r in q_ann_bruteforce(spark, SF_ORACLE).collect()
        if r["rank"] == 1
    }
    pq1 = {
        (r["query_id"], r["neighbor_id"])
        for r in lp8.ann_pq_adc(spark, SF_ORACLE).collect()
        if r["rank"] == 1
    }
    fused1 = {(r["query_id"], r["neighbor_id"]) for r in out if r["rank"] == 1}
    both = bf1 & pq1
    assert both <= fused1  # agreement on top-1 survives fusion


def test_dq_accepted_values_paths(spark):
    """Full contracts report zero violations on the clean corpus; the
    deliberately-narrowed strict_of contract flags exactly the 'P'
    backlog rows with one distinct bad value; NULL counts as a
    violation (hand frame)."""
    import os
    import tempfile

    from abr_etl_spark.operators.quality import accepted_values_report
    from abr_etl_spark.sources.lake import load_table

    out = {r["check_name"]: r for r in lp8.dq_accepted_values(spark, SF_ORACLE).collect()}
    assert set(out) == {n for n, *_ in lp8.DQ_ACCEPTED}
    for name in ("returnflag_full", "linestatus_full", "orderstatus_full",
                 "mktsegment_full"):
        assert out[name]["n_violations"] == 0
        assert out[name]["n_distinct_bad"] == 0
    o = load_table(spark, SF_ORACLE, "orders")
    n_p = o.where(F.col("o_orderstatus") == "P").count()
    assert n_p > 0
    assert out["orderstatus_strict_of"]["n_violations"] == n_p
    assert out["orderstatus_strict_of"]["n_distinct_bad"] == 1

    df = spark.createDataFrame(
        [("A",), ("X",), (None,)], "v string"
    )
    r = accepted_values_report(df, "t", [("c", "v", ["A"])]).collect()[0]
    assert r["n_rows"] == 3
    assert r["n_violations"] == 2      # X and NULL both violate
    assert r["n_distinct_bad"] == 1    # NULL excluded from distinct


def test_emb_dim_truncation_monotone_and_full_dim_exact(spark):
    """Truncation loss only shrinks as dims grow: recall_e4
    non-decreasing in dim; the full-dim point IS the truth (recall
    10000, n_hits == n_truth_pairs == ANN_K * n_queries)."""
    from abr_etl_spark.plans.llm_pipeline import ANN_K, N_QUERY_VECS

    out = lp8.emb_dim_truncation_sweep(spark, SF_ORACLE).collect()
    assert [r["dim"] for r in out] == lp8.EMB_TRUNC_GRID
    rec = [r["recall_e4"] for r in out]
    assert all(a <= b for a, b in zip(rec, rec[1:]))
    full = out[-1]
    assert full["recall_e4"] == 10000
    assert full["n_hits"] == full["n_truth_pairs"] == ANN_K * N_QUERY_VECS
    assert out[0]["recall_e4"] < 10000  # 16 dims really lose ranking
