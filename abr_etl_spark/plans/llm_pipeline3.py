"""LLM-training-data pipeline, part 3 (round 3).

- ``kmv_distinct``: K-Minimum-Values distinct-counting sketch over the
  corpus vocabulary -- the mergeable cardinality sketch pattern (HLL's
  simpler cousin) built from the engine's oracle-replayable polynomial
  hash. The k smallest hashes come from ``orderBy(h).limit(k)``, which
  Catalyst compiles to TakeOrderedAndProject: a per-partition partial
  top-k then one k-row merge -- exactly how a sketch union works on a
  1000-executor cluster (no global sort, no single hot reducer). The
  estimate (k-1) * P / h_k is checked against the exact distinct count
  in the same row.
- ``bigram_lm``: corpus bigram language-model counts -- top bigrams
  with conditional probability P(w2|w1) in exact 1e-4 integer units.
  Explode is linear in corpus tokens; the conditioning total is a
  window sum over the (already count-aggregated) bigram table, and the
  final top-k is again TakeOrderedAndProject.
- ``containment_pairs``: asymmetric near-duplicate detection
  (|A∩B| / min) -- catches short-doc-quoted-in-long-doc dups that
  Jaccard structurally misses (operators/dedup.containment_pairs).

Reference parity: the reference (abr-etl, Go: agency-delta.go) has no
corpus tooling; these extend the engine's first-class training-data
block (SURVEY.md §2.C) with the sketch + LM-counts + containment
primitives a 100 TB curation pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from abr_etl_spark.functions import texthash as th
from abr_etl_spark.operators import dedup
from abr_etl_spark.sources.lake import load_table

KMV_K = 256
# (k-1) * P precomputed exactly in Python and inlined as ONE integer
# literal in both engines, so the estimate is a single identical
# int/int double division on each side.
_KMV_NUM = (KMV_K - 1) * th.P
BIGRAM_TOP = 20
CONTAIN_TAU = 0.8


def kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV cardinality sketch vs exact distinct over corpus 3-gram
    shingles (the vocabulary itself is deliberately tiny in the
    synthetic corpus; the shingle space is the realistic
    high-cardinality domain a dedup pipeline actually sketches).

    One row: (k, kth_hash, est_distinct, exact_distinct, err_pct_e2).
    Hashes are the cross-engine polynomial hash mod P, distinct-ed
    BEFORE the top-k (KMV is defined over the distinct hash set). The
    exact count rides the same distinct-hash relation, so the whole
    query is: explode shingles -> distinct hash -> {TakeOrdered(k),
    count} -- two small aggregates over one shared scan.
    """
    d = load_table(spark, sf_dir, "documents")
    hashes = (
        d.select(F.explode(F.expr(th.sp_shingles("text", 3))).alias("s"))
        .select(F.expr(th.sp_polyhash("s")).alias("h"))
        .distinct()
        .persist()
    )
    kth = (
        hashes.orderBy(F.col("h").asc())
        .limit(KMV_K)
        .agg(F.max("h").alias("kth_hash"), F.count("*").alias("k"))
    )
    exact = hashes.agg(F.count("*").alias("exact_distinct"))
    out = (
        kth.crossJoin(exact)
        .select(
            "k",
            "kth_hash",
            (F.lit(_KMV_NUM) / F.col("kth_hash")).alias("est_distinct"),
            "exact_distinct",
        )
        .withColumn(
            # floor() BEFORE the integer cast on both sides: Spark's
            # double->long cast truncates while DuckDB's rounds, so the
            # raw cast would diverge at .5+ estimates.
            "err_pct_e2",
            F.expr(
                "abs(cast(floor(est_distinct) as long) - exact_distinct)"
                " * 10000 DIV exact_distinct"
            ),
        )
    )
    out = out.localCheckpoint()
    hashes.unpersist()
    return out


def bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{BIGRAM_TOP} corpus bigrams with P(w2|w1) in exact 1e-4
    units. n_w1 conditions on total bigram occurrences starting with
    w1 (so each w1's distribution sums to ~1)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.expr(th.sp_tokens("text")).alias("tok"))
    bigrams = (
        toks.where(F.size("tok") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(tok) - 1), "
                    "i -> named_struct('w1', element_at(tok, i), "
                    "'w2', element_at(tok, i + 1)))"
                )
            ).alias("bg")
        )
        .select("bg.w1", "bg.w2")
    )
    counts = bigrams.groupBy("w1", "w2").agg(F.count("*").alias("n"))
    w_cur = Window.partitionBy("w1")
    return (
        counts.withColumn("n_w1", F.sum("n").over(w_cur))
        .withColumn("p_e4", F.expr("(20000 * n + n_w1) DIV (2 * n_w1)"))
        .orderBy(F.col("n").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(BIGRAM_TOP)
    )


def containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment near-dups on the documents corpus."""
    d = load_table(spark, sf_dir, "documents")
    return dedup.containment_pairs(d, threshold=CONTAIN_TAU)


QUERIES = {
    "kmv_distinct": kmv_distinct,
    "bigram_lm": bigram_lm,
    "containment_pairs": containment_pairs,
}

_DK_TOK = th.dk_tokens("text")
_DK_SH = th.dk_shingles("text", 3)

ORACLES = {
    "kmv_distinct": f"""
        WITH h AS (
            SELECT DISTINCT {th.dk_polyhash('t')} AS h
            FROM (SELECT unnest({_DK_SH}) AS t FROM documents)
        ), kmin AS (
            SELECT h FROM h ORDER BY h ASC LIMIT {KMV_K}
        ), kth AS (
            SELECT CAST(max(h) AS BIGINT) AS kth_hash,
                   CAST(count(*) AS BIGINT) AS k
            FROM kmin
        ), ex AS (
            SELECT CAST(count(*) AS BIGINT) AS exact_distinct FROM h
        )
        SELECT k, kth_hash,
               {_KMV_NUM} / kth_hash AS est_distinct,
               exact_distinct,
               CAST(abs(CAST(floor({_KMV_NUM} / kth_hash) AS BIGINT)
                        - exact_distinct) * 10000
                    // exact_distinct AS BIGINT) AS err_pct_e2
        FROM kth, ex
    """,
    "bigram_lm": f"""
        WITH toks AS (
            SELECT {_DK_TOK} AS tok FROM documents
        ), ix AS (
            SELECT tok, unnest(generate_series(1, len(tok) - 1)) AS i
            FROM toks WHERE len(tok) >= 2
        ), bg AS (
            SELECT tok[i] AS w1, tok[i + 1] AS w2 FROM ix
        ), counts AS (
            SELECT w1, w2, CAST(count(*) AS BIGINT) AS n
            FROM bg GROUP BY w1, w2
        )
        SELECT w1, w2, n,
               CAST(sum(n) OVER (PARTITION BY w1) AS BIGINT) AS n_w1,
               CAST((20000 * n + sum(n) OVER (PARTITION BY w1))
                    // (2 * sum(n) OVER (PARTITION BY w1)) AS BIGINT)
                   AS p_e4
        FROM counts
        ORDER BY n DESC, w1 ASC, w2 ASC
        LIMIT {BIGRAM_TOP}
    """,
    # Replays the algorithm INCLUDING its df-cap (candidates only from
    # shingles in <= cap docs) but verifies containment on the FULL
    # shingle sets -- exactly what the Spark side computes.
    "containment_pairs": f"""
        WITH t AS (
            SELECT doc_id, {_DK_SH} AS sh FROM documents
        ), e AS (
            SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s FROM t
        ), dfc AS (
            SELECT *, count(*) OVER (PARTITION BY s) AS df FROM e
        ), kept AS (
            SELECT * FROM dfc WHERE df <= 1000
        ), cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM kept a JOIN kept b ON a.s = b.s
            WHERE a.doc_id < b.doc_id
        ), common AS (
            SELECT c.doc_a, c.doc_b,
                   any_value(a.n_sh) AS n_a, any_value(b.n_sh) AS n_b,
                   CAST(count(*) AS BIGINT) AS common
            FROM cand c
            JOIN e a ON a.doc_id = c.doc_a
            JOIN e b ON b.doc_id = c.doc_b AND a.s = b.s
            GROUP BY c.doc_a, c.doc_b
        )
        SELECT doc_a, doc_b, common,
               CAST(least(n_a, n_b) AS BIGINT) AS m,
               CAST((20000 * common + least(n_a, n_b))
                    // (2 * least(n_a, n_b)) AS BIGINT) AS cont_e4
        FROM common
        WHERE (20000 * common + least(n_a, n_b))
              // (2 * least(n_a, n_b)) >= {int(CONTAIN_TAU * 10000)}
    """,
}
