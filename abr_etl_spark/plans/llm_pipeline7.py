"""LLM-training-data pipeline, part 7 (round 9): index- and
dedup-family tuning harnesses.

- ``ann_nprobe_sweep``: the multiprobe-LSH cost/recall curve measured
  IN-ENGINE -- micro-averaged recall@k vs brute-force truth at probe
  radius 0 (single-probe), 1 (classic multiprobe) and 2, with the
  probe-bucket count per radius. The tuning loop every ANN deployment
  runs before picking nprobe; recall_at_k_eval (llm_pipeline6) grades
  ONE configuration per probe, this grades the knob itself.
- ``simhash_recall_by_tau``: recall of the SimHash family against the
  exact-Jaccard truth per similarity bucket -- which tau regimes the
  48-bit hamming<=3 sketch actually covers. dedup_family_agreement
  counts the disagreement cells; this key turns them into the
  per-threshold recall curve an operator reads before trusting SimHash
  alone at a given tau.

Reference parity: the reference (abr-etl, Go) has no corpus tooling;
these extend SURVEY.md §2.C's evaluation harnesses.

Scale notes: the sweep reuses the audited multiprobe shape (literal
mask list exploded on the broadcast QUERY side -- the corpus streams
once per radius through an equi-join, never a cross join); the recall
curve reuses BOTH materialized pair caches (the sweep-floor Jaccard
pairs and the SimHash band pairs), so its own cost is a pair-graph-
cardinality join plus a <= 10-row census.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from abr_etl_spark.functions import texthash as th
from abr_etl_spark.operators import dedup, similarity
from abr_etl_spark.plans.llm_pipeline import (
    ANN_K,
    N_QUERY_VECS,
    ORACLES as _LP1_ORACLES,
)
from abr_etl_spark.plans.llm_pipeline6 import SWEEP_TAU
from abr_etl_spark.sources.lake import load_table

#: probe radii swept (hamming distance of probed buckets from the
#: query's own); bucket counts are sum of C(bits, 0..r) = 1, 9, 37 at
#: bits=8.
SWEEP_RADII = (0, 1, 2)


def ann_nprobe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiprobe cost/recall sweep: (radius, n_probe_buckets, n_true,
    n_common, recall_e4), one row per radius in {SWEEP_RADII},
    recall micro-averaged over the {N_QUERY_VECS} probe queries
    (total common / total true, half-up 1e-4 integer -- exact).

    Scale shape: the brute-force truth runs ONCE (its own audited
    broadcast-query shape); each radius adds one corpus stream through
    the banded equi-join with a literal probe-mask list -- cost grows
    with bucket fan-out, never with a cross join. The per-radius
    reductions are k*|queries|-row frames.
    """
    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < N_QUERY_VECS)
    bf = similarity.cosine_topk(e, q, k=ANN_K).select(
        "query_id", "neighbor_id"
    )
    nt = bf.agg(F.count("*").cast("long").alias("n_true"))
    out = None
    for r in SWEEP_RADII:
        ann = similarity.lsh_ann_multiprobe_topk(
            e, q, k=ANN_K, radius=r
        ).select("query_id", "neighbor_id")
        nc = bf.join(ann, ["query_id", "neighbor_id"]).agg(
            F.count("*").cast("long").alias("n_common")
        )
        row = (
            nt.crossJoin(F.broadcast(nc))
            .select(
                F.lit(r).cast("int").alias("radius"),
                F.lit(
                    len(similarity.probe_masks(similarity.HYPERPLANE_BITS, r))
                ).cast("int").alias("n_probe_buckets"),
                "n_true",
                "n_common",
                F.expr(
                    "(2 * 10000 * n_common + n_true) DIV (2 * n_true)"
                ).alias("recall_e4"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("radius")


def simhash_recall_by_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-family recall per exact-Jaccard bucket:
    (tau_bucket_e1, n_true, n_found, recall_e4). Truth = verified
    Jaccard pairs at the {SWEEP_TAU} sweep floor, bucketed by
    floor(jaccard*10); found = the 48-bit hamming<=3 SimHash pairs.
    recall_e4 is the half-up 1e-4 fraction of each bucket's pairs the
    sketch family reproduces -- near 0 in the far tail (by design) and
    high in the planted-near-dup band, quantifying where SimHash can
    substitute for shingle-set verification.

    Scale shape: both pair sets come from their MATERIALIZED caches
    (the df-capped PPJoin build and the pigeonhole band join); this key
    adds one pair-cardinality 16-byte left join and a <= 10-row census.
    """
    d = load_table(spark, sf_dir, "documents")
    truth = dedup.ngram_jaccard_pairs(d, threshold=SWEEP_TAU).select(
        "doc_a",
        "doc_b",
        F.floor(F.col("jaccard") * 10).cast("long").alias("tau_bucket_e1"),
    )
    found = dedup.simhash_pairs(d, max_hamming=3).select(
        "doc_a", "doc_b", F.lit(1).alias("hit")
    )
    return (
        truth.join(found, ["doc_a", "doc_b"], "left")
        .groupBy("tau_bucket_e1")
        .agg(
            F.count("*").alias("n_true"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_found"),
        )
        .select(
            "tau_bucket_e1",
            "n_true",
            "n_found",
            F.expr(
                "(2 * 10000 * n_found + n_true) DIV (2 * n_true)"
            ).alias("recall_e4"),
        )
        .orderBy("tau_bucket_e1")
    )


QUERIES = {
    "ann_nprobe_sweep": ann_nprobe_sweep,
    "simhash_recall_by_tau": simhash_recall_by_tau,
}


def _nprobe_sweep_oracle() -> str:
    """DuckDB replay of ann_nprobe_sweep: per radius, the hamming-<=r
    banded join + identical rounded-cosine rank cut, then the same
    micro-average -- composed from the ann_bruteforce oracle exactly
    like recall_at_k_eval's."""
    parts = [
        f"""
    WITH bf AS ({_LP1_ORACLES["ann_bruteforce"]}),
    qv AS (SELECT vec_id AS query_id, embedding AS q_vec,
                  {similarity.dk_lsh_bucket('embedding')} AS qb
           FROM embeddings WHERE vec_id < {N_QUERY_VECS}),
    cv AS (SELECT vec_id AS neighbor_id, embedding AS c_vec,
                  {similarity.dk_lsh_bucket('embedding')} AS cb
           FROM embeddings),
    nt AS (SELECT CAST(count(*) AS BIGINT) AS n_true FROM bf)"""
    ]
    for r in SWEEP_RADII:
        parts.append(
            f""", p{r} AS (
        SELECT query_id, neighbor_id FROM (
            SELECT qv.query_id, cv.neighbor_id,
                   row_number() OVER (
                       PARTITION BY qv.query_id
                       ORDER BY round({th.dk_cosine('qv.q_vec', 'cv.c_vec')},
                                      6) DESC,
                                cv.neighbor_id ASC) AS rank
            FROM cv JOIN qv
              ON bit_count(xor(cb::BIGINT, qb::BIGINT)) <= {r}
            WHERE qv.query_id <> cv.neighbor_id
        ) WHERE rank <= {ANN_K}
    ), c{r} AS (
        SELECT CAST(count(*) AS BIGINT) AS n_common
        FROM bf JOIN p{r} USING (query_id, neighbor_id)
    )"""
        )
    sel = " UNION ALL ".join(
        f"""SELECT {r} AS radius,
        {len(similarity.probe_masks(similarity.HYPERPLANE_BITS, r))}
            AS n_probe_buckets,
        nt.n_true, c{r}.n_common,
        CAST((2 * 10000 * c{r}.n_common + nt.n_true)
             // (2 * nt.n_true) AS BIGINT) AS recall_e4
    FROM nt, c{r}"""
        for r in SWEEP_RADII
    )
    parts.append(
        f" SELECT CAST(radius AS INTEGER) AS radius,"
        f" CAST(n_probe_buckets AS INTEGER) AS n_probe_buckets,"
        f" n_true, n_common, recall_e4 FROM ({sel}) ORDER BY radius"
    )
    return "".join(parts)


_DK_SH = th.dk_shingles("text", 3)

ORACLES = {
    "ann_nprobe_sweep": _nprobe_sweep_oracle(),
    "simhash_recall_by_tau": f"""
        WITH t AS (
            SELECT doc_id, {_DK_SH} AS sh FROM documents
        ), ex AS (
            SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s FROM t
        ), common AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   any_value(a.n_sh) AS n_a, any_value(b.n_sh) AS n_b,
                   count(*) AS c
            FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        ), truth AS (
            SELECT doc_a, doc_b,
                   CAST(floor(round(c::DOUBLE / (n_a + n_b - c), 4) * 10)
                        AS BIGINT) AS tau_bucket_e1
            FROM common
            WHERE c::DOUBLE / (n_a + n_b - c) >= {SWEEP_TAU}
        ), found AS (
            SELECT doc_a, doc_b, 1 AS hit
            FROM ({_LP1_ORACLES["dedup_simhash"]})
        )
        SELECT tau_bucket_e1,
               CAST(count(*) AS BIGINT) AS n_true,
               CAST(sum(coalesce(hit, 0)) AS BIGINT) AS n_found,
               CAST((2 * 10000 * sum(coalesce(hit, 0)) + count(*))
                    // (2 * count(*)) AS BIGINT) AS recall_e4
        FROM truth
        LEFT JOIN found USING (doc_a, doc_b)
        GROUP BY tau_bucket_e1 ORDER BY tau_bucket_e1
    """,
}
