"""C-block LLM-pipeline queries vs the DuckDB oracle, plus recall and
property checks that the oracle can't express."""

import pytest
from pyspark.sql import functions as F

from abr_etl_spark.operators import dedup, similarity
from abr_etl_spark.plans import llm_pipeline
from abr_etl_spark.sources.lake import load_table
from tests.conftest import SF_ORACLE, assert_matches_oracle


@pytest.mark.parametrize("key", sorted(llm_pipeline.QUERIES))
def test_llm_pipeline_vs_oracle(spark, ddb, key):
    df = llm_pipeline.QUERIES[key](spark, SF_ORACLE)
    assert_matches_oracle(df, ddb, llm_pipeline.ORACLES[key], key)


def test_minhash_equals_exact_jaccard(spark):
    """LSH banding finds every >=0.9 pair that exact shingle-join finds
    (miss probability ~3e-4/pair at the threshold; ~0 for the planted
    ~0.99 near-dups)."""
    d = load_table(spark, SF_ORACLE, "documents")
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.ngram_jaccard_pairs(d, threshold=0.9).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_lsh_pairs(d, threshold=0.9).collect()
    }
    assert exact, "test corpus should contain planted near-dup pairs"
    assert lsh == exact


def test_ann_lsh_recall(spark):
    """Bucketed ANN recall vs exact top-5 (single-probe LSH; recall is
    data-dependent -- assert it finds a nontrivial fraction)."""
    e = load_table(spark, SF_ORACLE, "embeddings")
    q = e.where(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.cosine_topk(e, q, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.lsh_ann_topk(e, q, k=5).collect()
    }
    # The synthetic embeddings are near-uniform (max pairwise cos ~0.51,
    # no planted neighbors), so single-probe hyperplane LSH recall is
    # bounded by the collision probability (1-theta/pi)^bits ~ 4% at
    # cos 0.5 -- assert structure, not magic: results nonempty, <=k per
    # query, and recall above the random-bucket floor.
    assert approx, "ANN returned nothing"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.02, f"ANN recall below random-bucket floor: {recall}"


def test_dedup_exact_finds_planted_copies(spark):
    deduped = llm_pipeline.q_dedup_exact(spark, SF_ORACLE)
    dups = deduped.where(F.col("n_copies") > 1)
    assert dups.count() == 50
    assert deduped.agg(F.sum("n_copies")).collect()[0][0] == 550


def test_connected_components_chain(spark):
    from abr_etl_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11)], "src long, dst long"
    )
    comp = {
        r["node"]: r["component"]
        for r in connected_components(edges).collect()
    }
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_multiprobe_recall_beats_single_probe(spark):
    from abr_etl_spark.operators import similarity as sim
    from abr_etl_spark.sources.lake import load_table as _lt

    e = _lt(spark, SF_ORACLE, "embeddings")
    q = e.where(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.cosine_topk(e, q, k=5).collect()
    }
    single = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.lsh_ann_topk(e, q, k=5).collect()
    }
    multi = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.lsh_ann_multiprobe_topk(e, q, k=5).collect()
    }
    assert len(multi & exact) >= len(single & exact)


def test_embedding_arrow_path_bit_identical(spark):
    """The Arrow-vectorized embedding-dedup kernels (numpy loops in the
    exact float64 op order of the SQL expressions) must produce the
    BIT-identical pair set -- same ids, same rounded cosines -- as the
    pure-expression plan, at every tested scale."""
    e = load_table(spark, SF_ORACLE, "embeddings")
    expr_pairs = {
        (r["doc_a"], r["doc_b"], r["cos"])
        for r in similarity.embedding_dup_pairs(e, use_arrow=False).collect()
    }
    arrow_pairs = {
        (r["doc_a"], r["doc_b"], r["cos"])
        for r in similarity.embedding_dup_pairs(e, use_arrow=True).collect()
    }
    assert expr_pairs == arrow_pairs and expr_pairs
    # the base features themselves agree exactly (norm doubles included)
    from pyspark.sql import functions as F
    from abr_etl_spark.operators.similarity import (
        arrow_base_features,
        sp_lsh_bucket,
    )
    from abr_etl_spark.functions import texthash as th

    expr_base = {
        (r["id"], r["__n"], r["bucket"])
        for r in e.select(
            F.col("vec_id").alias("id"),
            F.expr(th.sp_norm("embedding")).alias("__n"),
            F.expr(sp_lsh_bucket("embedding")).alias("bucket"),
        ).collect()
    }
    arrow_base = {
        (r["id"], r["__n"], r["bucket"])
        for r in arrow_base_features(e).select("id", "__n", "bucket").collect()
    }
    assert expr_base == arrow_base


def test_dedup_semantic_subset_of_bruteforce_and_blocked(spark):
    """SemDeDup pairs must be exactly the brute-force cosine>=tau pairs
    whose two sides landed in the SAME k-means cell (the documented
    blocking approximation -- no false pairs, misses only cross-cell)."""
    from abr_etl_spark.plans.llm_pipeline import (
        COS_TAU,
        KMEANS_ITERS,
        KMEANS_K,
        q_dedup_semantic,
    )

    e = load_table(spark, SF_ORACLE, "embeddings")
    got = {
        (r["doc_a"], r["doc_b"], r["cos"])
        for r in q_dedup_semantic(spark, SF_ORACLE).collect()
    }
    brute = {
        (r["doc_a"], r["doc_b"], r["cos"])
        for r in similarity.embedding_dup_pairs(
            e, threshold=COS_TAU, method="exact"
        ).collect()
    }
    assert got <= brute
    cent = similarity.kmeans_centroids(
        e, KMEANS_K, iters=KMEANS_ITERS
    ).withColumnRenamed("centroid_id", "vec_id")
    cells = {
        r["vec_id"]: r["centroid_id"]
        for r in similarity.ivf_assign(e, cent).collect()
    }
    same_cell = {
        (a, b, c) for (a, b, c) in brute if cells[a] == cells[b]
    }
    assert got == same_cell and got


def test_cc_memo_isolates_scale_factors(spark):
    """The (applicationId, sf_dir) memo must never serve one scale
    factor's components to another: run the canonical key at both sfs
    in one session and check each against its own corpus."""
    from abr_etl_spark.plans import llm_pipeline as lp
    from abr_etl_spark.sources.lake import load_table
    from tests.conftest import SF_ORACLE, SF_SMOKE

    small = lp.q_dedup_canonical(spark, SF_SMOKE).collect()
    big = lp.q_dedup_canonical(spark, SF_ORACLE).collect()
    n_small = load_table(spark, SF_SMOKE, "documents").count()
    n_big = load_table(spark, SF_ORACLE, "documents").count()
    assert all(r.doc_id < n_small for r in small)
    assert all(r.doc_id < n_big for r in big)
    # repeat calls hit the memo and stay identical
    again = lp.q_dedup_canonical(spark, SF_SMOKE).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, small))
