"""Lloyd k-means coarse quantizer: determinism + recall vs the subset
quantizer at equal nprobe (VERDICT r1 item 8)."""

from __future__ import annotations

from pyspark.sql import functions as F

from abr_etl_spark.operators.similarity import (
    cosine_topk,
    ivf_ann_topk,
    kmeans_centroids,
)

SF = "/root/testdata/sf0.01"


def _pairs(df):
    return {(r.query_id, r.neighbor_id) for r in df.collect()}


def test_kmeans_beats_subset_quantizer_recall(spark):
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = e.where(F.col("vec_id") < 10)
    exact = _pairs(cosine_topk(e, q, k=5))
    subset = e.where(F.col("vec_id") % 50 == 0)  # 10 deterministic seeds
    km = kmeans_centroids(e, 10, iters=2).withColumnRenamed(
        "centroid_id", "vec_id"
    )
    r_subset = len(_pairs(ivf_ann_topk(e, q, subset, k=5)) & exact) / len(exact)
    r_km = len(_pairs(ivf_ann_topk(e, q, km, k=5)) & exact) / len(exact)
    # measured: 0.30 subset vs 0.80 k-means at nprobe=1
    assert r_km > r_subset
    assert r_km >= 0.6


def test_kmeans_deterministic_across_runs(spark):
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    a = kmeans_centroids(e, 8, iters=2).orderBy("centroid_id").collect()
    b = kmeans_centroids(e, 8, iters=2).orderBy("centroid_id").collect()
    assert [r.embedding for r in a] == [r.embedding for r in b]


def test_kmeans_handles_k_larger_than_distinct_points(spark):
    rows = [(i, [float(i % 2), 1.0]) for i in range(4)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    cents = kmeans_centroids(df, 3, iters=2).collect()
    assert len(cents) == 3  # empty cells keep their previous centroid
