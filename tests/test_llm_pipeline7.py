"""Part-7 tuning harnesses vs the DuckDB oracle, plus the curve
properties the oracle can't grade (monotone recall in probe radius,
family recall concentrated in the planted-near-dup band)."""

import pytest

from abr_etl_spark.plans import llm_pipeline7 as lp7
from tests.conftest import SF_ORACLE, SF_SMOKE, assert_matches_oracle


@pytest.mark.parametrize("key", sorted(lp7.QUERIES))
def test_llm_pipeline7_vs_oracle(spark, ddb, key):
    df = lp7.QUERIES[key](spark, SF_ORACLE)
    assert_matches_oracle(df, ddb, lp7.ORACLES[key], key)


def test_nprobe_sweep_monotone_and_bucket_counts(spark):
    """Widening the probe radius can only add candidates, so recall is
    nondecreasing; probe-bucket counts are the binomial sums 1/9/37."""
    rows = lp7.ann_nprobe_sweep(spark, SF_SMOKE).collect()
    assert [r.radius for r in rows] == list(lp7.SWEEP_RADII)
    assert [r.n_probe_buckets for r in rows] == [1, 9, 37]
    recalls = [r.recall_e4 for r in rows]
    assert recalls == sorted(recalls)
    assert all(0 <= r.n_common <= r.n_true for r in rows)
    # radius 2 must genuinely beat single-probe on this corpus
    assert recalls[-1] > recalls[0]
    # the cost axis: candidate sets strictly nest as radius widens
    cands = [r.n_candidates for r in rows]
    assert cands == sorted(cands) and cands[-1] > cands[0] > 0


def test_nprobe_sweep_radius0_matches_recall_eval_totals(spark):
    """The radius-0 row is the micro-average of recall_at_k_eval's
    per-probe report (same single-probe index, same truth)."""
    from abr_etl_spark.plans import llm_pipeline6 as lp6

    per_probe = lp6.recall_at_k_eval(spark, SF_SMOKE).collect()
    r0 = lp7.ann_nprobe_sweep(spark, SF_SMOKE).collect()[0]
    assert r0.n_true == sum(r.n_true for r in per_probe)
    assert r0.n_common == sum(r.n_common for r in per_probe)


def test_simhash_recall_concentrated_in_near_dup_band(spark):
    """The sketch family reproduces the planted near-dup band (bucket
    9 = jaccard in [0.9, 1.0)) and, by design, almost none of the far
    tail -- the curve an operator reads before substituting SimHash
    for shingle verification."""
    rows = {r.tau_bucket_e1: r for r in
            lp7.simhash_recall_by_tau(spark, SF_SMOKE).collect()}
    assert all(0 <= r.n_found <= r.n_true for r in rows.values())
    assert all(0 <= r.recall_e4 <= 10000 for r in rows.values())
    assert 9 in rows and rows[9].recall_e4 >= 9000
    if 0 in rows:
        assert rows[0].recall_e4 < rows[9].recall_e4


def test_bpe_encode_compression_properties(spark):
    """Merges can only shorten: tokens_after <= chars_before per source,
    compression <= 1, and the corpus-wide char reduction equals the sum
    over learned merges of merged-pair occurrences AT EACH STEP (each
    occurrence replaces 2 symbols with 1)."""
    from abr_etl_spark.plans import llm_pipeline5 as lp5

    rows = lp7.bpe_encode_corpus(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0 < r.tokens_after <= r.chars_before
        assert 0 < r.compression_e4 <= 10000
    merges = lp5.bpe_learn_merges(spark, SF_SMOKE).collect()
    saved = sum(m.n_occurrences for m in merges)
    total_before = sum(r.chars_before for r in rows)
    total_after = sum(r.tokens_after for r in rows)
    assert total_before - total_after == saved


def test_source_drift_bounds_and_totals(spark):
    """Cosines bounded, per-source vector counts conserve the corpus."""
    rows = lp7.source_embedding_drift(spark, SF_SMOKE).collect()
    assert rows
    assert all(-1.0 <= r.cos_centroid <= 1.0 for r in rows)
    total = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").count()
    assert sum(r.n_vecs for r in rows) == total


def test_dup_inflation_consistent_with_canonical_graph(spark):
    """Per-source identities hold, and the corpus-wide kept-doc deficit
    equals exactly the number of non-canonical members of the verified
    near-dup graph."""
    from abr_etl_spark.plans.llm_pipeline import jaccard_canonical

    rows = lp7.dup_inflation_report(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0 < r.n_kept <= r.n_docs
        assert 0 < r.tokens_kept <= r.tokens_total
        assert r.inflation_e4 >= 10000
    canon = jaccard_canonical(spark, SF_SMOKE).collect()
    n_members = sum(1 for c in canon if c.doc_id != c.canonical_id)
    assert (
        sum(r.n_docs for r in rows) - sum(r.n_kept for r in rows)
        == n_members
    )
