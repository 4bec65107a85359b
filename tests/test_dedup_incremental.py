"""Incremental minhash index == one-shot LSH for pairs touching the
increment; plus index round-trip through the lake."""

from pyspark.sql import functions as F

from abr_etl_spark.operators import dedup, dedup_incremental
from abr_etl_spark.sources.lake import load_table
from tests.conftest import SF_ORACLE


def test_incremental_probe_matches_full_run(spark):
    d = load_table(spark, SF_ORACLE, "documents")
    base = d.where(F.col("doc_id") % 5 != 0)  # 80% existing corpus
    new = d.where(F.col("doc_id") % 5 == 0)  # 20% increment

    full = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_lsh_pairs(d, threshold=0.9).collect()
    }
    new_ids = {r["doc_id"] for r in new.select("doc_id").collect()}
    want = {p for p in full if p[0] in new_ids or p[1] in new_ids}

    index = dedup_incremental.build_minhash_index(base).persist()
    got = {
        (r["doc_a"], r["doc_b"])
        for r in dedup_incremental.probe_index(new, index, threshold=0.9).collect()
    }
    assert got == want
    assert want, "increment should touch at least one near-dup pair"


def test_index_roundtrips_through_lake(spark, tmp_path):
    d = load_table(spark, SF_ORACLE, "documents")
    base = d.where(F.col("doc_id") < 400)
    path = str(tmp_path / "mh_index")
    dedup_incremental.build_minhash_index(base).write.parquet(path)
    index = spark.read.parquet(path)
    new = d.where(F.col("doc_id") >= 400)
    pairs = dedup_incremental.probe_index(new, index, threshold=0.9)
    assert pairs.columns == ["doc_a", "doc_b", "jaccard"]
    assert pairs.count() >= 0  # runs end-to-end off the persisted index
