"""dedup_simhash_clusters: the bounded-output companion to
dedup_simhash (r13 verdict item 6)."""

from __future__ import annotations

from pyspark.sql import functions as F

from abr_etl_spark.plans import llm_pipeline14 as lp14
from tests.conftest import SF_ORACLE, assert_matches_oracle


def test_oracle_parity(spark, ddb):
    assert_matches_oracle(
        lp14.QUERIES["dedup_simhash_clusters"](spark, SF_ORACLE),
        ddb,
        lp14.ORACLES["dedup_simhash_clusters"],
        "dedup_simhash_clusters",
    )


def test_census_accounts_for_every_document(spark):
    """n_docs summed over the census (clustered + singleton rows)
    equals the corpus size, and the clustered mass equals the pair
    graph's node count -- the bounded report loses nothing."""
    from abr_etl_spark.operators import dedup
    from abr_etl_spark.sources.lake import load_table

    census = lp14.dedup_simhash_clusters(spark, SF_ORACLE).collect()
    d = load_table(spark, SF_ORACLE, "documents")
    n_corpus = d.count()
    assert sum(r["n_docs"] for r in census) == n_corpus
    pairs = dedup.simhash_pairs(
        d, max_hamming=lp14.SIMHASH_MAX_HAMMING
    )
    nodes = (
        pairs.select(F.col("doc_a").alias("x"))
        .unionByName(pairs.select(F.col("doc_b").alias("x")))
        .distinct()
        .count()
    )
    clustered = sum(
        r["n_docs"] for r in census if r["cluster_size"] > 1
    )
    assert clustered == nodes
    for r in census:
        assert r["n_docs"] == r["cluster_size"] * r["n_clusters"]
