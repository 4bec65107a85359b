"""Training-pipeline part-2 queries vs the DuckDB oracle, plus the
semantic properties the oracle alone can't pin down."""

import pytest
from pyspark.sql import functions as F

from abr_etl_spark.plans import llm_pipeline2 as lp2
from tests.conftest import SF_ORACLE, assert_matches_oracle


@pytest.mark.parametrize("key", sorted(lp2.QUERIES))
def test_llm_pipeline2_vs_oracle(spark, ddb, key):
    df = lp2.QUERIES[key](spark, SF_ORACLE)
    assert_matches_oracle(df, ddb, lp2.ORACLES[key], key)


def test_decontaminate_excludes_benchmark_docs(spark):
    out = lp2.decontaminate_ngram(spark, SF_ORACLE)
    assert out.where(F.col("doc_id") % lp2.BENCH_MOD == 0).count() == 0


def test_repetition_bounds(spark):
    out = lp2.repetition_score(spark, SF_ORACLE)
    bad = out.where(
        (F.col("rep_permyriad") < 0)
        | (F.col("rep_permyriad") > 10000)
        | (F.col("n_dup") > F.col("n_grams"))
    )
    assert bad.count() == 0


def test_quantize_int8_range(spark):
    """Quantized checksums imply every component fits int8: |sum_abs_q|
    <= 127 * dim."""
    e = lp2.embedding_quantize(spark, SF_ORACLE)
    dim = 16  # testdata embedding width floor; recompute defensively
    from abr_etl_spark.sources.lake import load_table

    dim = load_table(spark, SF_ORACLE, "embeddings").select(
        F.size("embedding").alias("d")
    ).agg(F.max("d")).collect()[0][0]
    assert e.where(F.col("sum_abs_q") > 127 * dim).count() == 0


def test_pagerank_mass_and_dangling(spark):
    """Parts (dst-only nodes) receive rank; every rank >= the base."""
    r = lp2.pagerank_suppliers(spark, SF_ORACLE)
    assert r.where(F.col("r") < lp2.PR_BASE).count() == 0
    assert r.where((F.col("node") >= 10000) & (F.col("r") > lp2.PR_BASE)).count() > 0
