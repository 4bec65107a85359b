"""Part-6 LLM-pipeline queries vs the DuckDB oracle, plus the
properties the oracle can't see (diversity bounds, TV identity vs a
brute-force vocab join, recall sanity against the ANN operators)."""

import pytest
from pyspark.sql import functions as F

from abr_etl_spark.plans import llm_pipeline6 as lp6
from tests.conftest import SF_ORACLE, SF_SMOKE, assert_matches_oracle


@pytest.mark.parametrize("key", sorted(lp6.QUERIES))
def test_llm_pipeline6_vs_oracle(spark, ddb, key):
    df = lp6.QUERIES[key](spark, SF_ORACLE)
    assert_matches_oracle(df, ddb, lp6.ORACLES[key], key)


def test_simpson_bounds_and_extremes(spark):
    """0 <= simpson_e6 < 1e6; all-distinct docs hit the exact
    (n-1)/n bound; the index recomputes from raw token counts."""
    rows = lp6.simpson_diversity(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0 <= r.simpson_e6 < 1_000_000
        assert r.n_distinct <= r.n_tokens
        if r.n_distinct == r.n_tokens:
            n = r.n_tokens
            want = (2 * (10**6 * (n * n - n)) + n * n) // (2 * n * n)
            assert r.simpson_e6 == want


def test_tv_matches_bruteforce_vocab_join(spark):
    """The absent-mass identity t*(T - present_ct) must equal the naive
    full vocab x source computation."""
    from abr_etl_spark.functions import texthash as th
    from abr_etl_spark.sources.lake import load_table

    d = load_table(spark, SF_SMOKE, "documents")
    toks = [
        (r.source, r.tok)
        for r in d.select(
            "source", F.explode(F.expr(th.sp_tokens("text"))).alias("tok")
        ).collect()
    ]
    from collections import Counter

    per_src: dict[str, Counter] = {}
    corpus: Counter = Counter()
    for s, t in toks:
        per_src.setdefault(s, Counter())[t] += 1
        corpus[t] += 1
    T = sum(corpus.values())
    want = {}
    for s, cnt in per_src.items():
        t = sum(cnt.values())
        dev = sum(
            abs(cnt.get(tok, 0) * T - C * t) for tok, C in corpus.items()
        )
        want[s] = (2 * (10**6 * dev) + (2 * t * T)) // (2 * (2 * t * T))
    got = {
        r.source: r.tv_e6
        for r in lp6.source_divergence_tv(spark, SF_SMOKE).collect()
    }
    assert got == want


def test_recall_bounds_and_consistency(spark):
    """recall_e4 in [0, 1e4], n_common <= min(n_true, n_ann), and the
    single-probe LSH recall is nontrivial (>0 somewhere) on this data."""
    rows = lp6.recall_at_k_eval(spark, SF_ORACLE).collect()
    assert len(rows) > 0
    assert any(r.n_common > 0 for r in rows)
    for r in rows:
        assert 0 <= r.recall_e4 <= 10_000
        assert r.n_common <= min(r.n_true, r.n_ann)


def test_embedding_outliers_are_global_minima(spark):
    """The report's k scores are exactly the k smallest cos-to-centroid
    values over the whole corpus (recomputed in numpy)."""
    import numpy as np

    rows = lp6.embedding_outlier_report(spark, SF_SMOKE).collect()
    emb = np.array(
        [
            r.q
            for r in spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
            .selectExpr(
                "transform(embedding, x -> cast(floor(cast(x as double)"
                " * 10000 + 0.5) as bigint)) AS q"
            )
            .collect()
        ],
        dtype=np.float64,
    )
    cent = emb.sum(axis=0)
    cos = emb @ cent / (
        np.linalg.norm(emb, axis=1) * np.linalg.norm(cent)
    )
    want = np.sort(cos)[: lp6.OUTLIER_K]
    got = np.array([r.cos_centroid for r in rows])
    assert np.allclose(np.sort(got), want, atol=1e-5)


def test_term_lift_known_cooccurrence(spark, tmp_path):
    """Hand-checkable lift on synthetic docs: terms that always
    co-occur get lift = N/df (> 1e4); independent-ish pairs sit near
    1e4."""
    docs = []
    # 10 docs with {alpha beta}, 10 docs with {alpha gamma}
    for i in range(10):
        docs.append((i, "alpha beta filler%d x y z w q r" % i, "en", "s", 20))
    for i in range(10, 20):
        docs.append((i, "alpha gamma filler%d x y z w q r" % i, "en", "s", 20))
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    from abr_etl_spark.plans import llm_pipeline6 as lp6

    got = {
        (r.term_a, r.term_b): (r.n_ab, r.lift_e4)
        for r in lp6.term_lift_topk(spark, str(tmp_path)).collect()
    }
    # beta co-occurs with alpha in all 10 of beta's docs:
    # lift = n_ab*N/(df_a*df_b) = 10*20/(20*10) = 1.0
    assert got[("alpha", "beta")] == (10, 10000)
    # beta never co-occurs with gamma -> pair absent (support 0)
    assert ("beta", "gamma") not in got
    # alpha and x co-occur in every doc: lift 20*20/(20*20) = 1.0
    assert got[("alpha", "x")] == (20, 10000)


def test_content_address_collisions_are_real_copies(spark, tmp_path):
    """Identical byte payloads share an address; distinct payloads never
    collide (at this scale); n_copies counts exactly."""
    rows = [
        (1, "same payload", "en", "s", 12),
        (2, "same payload", "en", "s", 12),
        (3, "different", "en", "s", 9),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    got = {
        r.doc_id: r
        for r in lp6.multimodal_content_address(spark, str(tmp_path)).collect()
    }
    assert got[1].payload_md5 == got[2].payload_md5
    assert got[1].n_copies == got[2].n_copies == 2
    assert got[3].payload_md5 != got[1].payload_md5
    assert got[3].n_copies == 1
    assert got[1].n_bytes == len("same payload".encode())


def test_lang_confusion_conserves_docs_and_matches_lang_id(spark):
    """Cell counts conserve the corpus; the matrix's per-doc prediction
    marginal equals the lang_id key's predictions."""
    from abr_etl_spark.sources.lake import load_table

    rows = lp6.lang_id_confusion(spark, SF_ORACLE).collect()
    n_total = load_table(spark, SF_ORACLE, "documents").count()
    assert sum(r.n for r in rows) == n_total
    by_true: dict[str, int] = {}
    for r in rows:
        by_true.setdefault(r.lang_true, r.n_true_total)
        assert by_true[r.lang_true] == r.n_true_total
    assert sum(by_true.values()) == n_total
    # prediction marginal equals the lang_id key's census
    from abr_etl_spark.plans.llm_pipeline import q_lang_id

    pred_census: dict[str, int] = {}
    for p in q_lang_id(spark, SF_ORACLE).collect():
        pred_census[p.lang_pred] = pred_census.get(p.lang_pred, 0) + 1
    got_census: dict[str, int] = {}
    for r in rows:
        got_census[r.lang_pred] = got_census.get(r.lang_pred, 0) + r.n
    assert got_census == pred_census


def test_threshold_sweep_cumulative_consistency(spark):
    """Bucket counts sum to the floor-threshold pair set; the running
    at-or-above totals are a proper suffix cumsum; and the top bucket's
    count matches the tau=0.9 verified pair key (floor(0.9*10)=9
    bucket alignment on this bimodal corpus)."""
    from abr_etl_spark.operators import dedup
    from abr_etl_spark.sources.lake import load_table

    rows = sorted(
        lp6.dedup_threshold_sweep(spark, SF_ORACLE).collect(),
        key=lambda r: r.tau_bucket_e1,
    )
    assert len(rows) >= 2  # non-vacuous: bimodal corpus fills 2+ buckets
    total = sum(r.n_pairs for r in rows)
    # suffix-cumsum property
    running = 0
    for r in sorted(rows, key=lambda r: -r.tau_bucket_e1):
        running += r.n_pairs
        assert r.n_pairs_at_or_above == running
    assert running == total
    d = load_table(spark, SF_ORACLE, "documents")
    n_09 = dedup.ngram_jaccard_pairs(d, threshold=0.9).count()
    at_9 = sum(r.n_pairs for r in rows if r.tau_bucket_e1 >= 9)
    assert at_9 == n_09
