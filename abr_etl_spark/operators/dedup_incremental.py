"""Incremental near-dup detection against a persisted signature index.

The 100 TB reality: the corpus grows by increments (weekly drops,
streaming batches); recomputing all-pairs LSH over the full corpus per
increment is O(corpus) when it should be O(increment). Split the
operator:

- ``build_minhash_index``: corpus -> ONE ROW PER DOC
  (doc_id, shingles, n_sh, bands array) -- written once to the lake.
  Bands stay as an array so shingle sets are stored exactly once.
- ``probe_index``: new docs -> signatures -> explode bands both sides ->
  equi-join on (band_idx, band_sig) -> exact-Jaccard verify. Finds
  new-vs-corpus AND new-vs-new pairs; cost scales with the increment
  plus the touched buckets only.

Equivalence to the one-shot operator is pytest-proven
(tests/test_dedup_incremental.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from abr_etl_spark.functions import texthash as th
from abr_etl_spark.operators.dedup import minhash_signatures


def build_minhash_index(
    df: DataFrame, *, text: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """Signature index: one row per doc, bands as an array column."""
    return minhash_signatures(df, text, id_col, n).select(
        F.col(id_col),
        F.col("shingles"),
        F.col("n_sh"),
        F.expr(th.sp_band_sigs("mh")).alias("bands"),
    )


def _banded(index: DataFrame, id_col: str) -> DataFrame:
    return index.select(
        F.col(id_col), F.posexplode("bands").alias("band_idx", "band_sig")
    )


def probe_index(
    new_docs: DataFrame,
    index: DataFrame,
    *,
    text: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.9,
) -> DataFrame:
    """Near-dup pairs involving at least one new doc: new-vs-index plus
    new-vs-new, verified with exact Jaccard. Pair ids are ordered
    (doc_a < doc_b) regardless of which side is new.

    Both sides of the probe are materialized exactly once: the increment's
    signatures are persisted, and the combined (index ∪ increment)
    relation is persisted too UNLESS the index side is already cached --
    without materialization, a lazily-built index side would re-derive
    the interpreted minhash lineage up to 4x across the three consumers
    (band join + the two exact-verify side joins; measured 280 s vs 4 s
    at sf0.01), while re-caching an already-cached index would hold the
    wide signature rows in storage twice."""
    new_index = build_minhash_index(
        new_docs, text=text, id_col=id_col, n=n
    ).persist()
    combined = index.unionByName(new_index)
    own_combined = not index.is_cached
    if own_combined:
        combined = combined.persist()
    nb = _banded(new_index, id_col)
    cb = _banded(combined, id_col)
    cand = (
        nb.alias("x")
        .join(cb.alias("y"), ["band_idx", "band_sig"])
        .where(F.col(f"x.{id_col}") != F.col(f"y.{id_col}"))
        .select(
            F.least(F.col(f"x.{id_col}"), F.col(f"y.{id_col}")).alias("doc_a"),
            F.greatest(F.col(f"x.{id_col}"), F.col(f"y.{id_col}")).alias("doc_b"),
        )
        .distinct()
    )
    side = combined.select(id_col, "shingles", "n_sh")
    verified = (
        cand.join(side.withColumnRenamed(id_col, "doc_a"), "doc_a")
        .withColumnRenamed("shingles", "sh_a")
        .withColumnRenamed("n_sh", "n_a")
        .join(side.withColumnRenamed(id_col, "doc_b"), "doc_b")
        .withColumnRenamed("shingles", "sh_b")
        .withColumnRenamed("n_sh", "n_b")
        .withColumn("common", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common")),
        )
        .where(F.col("jaccard") >= threshold)
    )
    out = verified.select(
        "doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard")
    ).localCheckpoint()
    new_index.unpersist()
    if own_combined:
        combined.unpersist()
    return out
