"""LLM training-data pipeline, part 2 (round 2 additions).

Five more first-class training-pipeline operators, all pure JVM-side
column expressions / equi-joins (no Python in any hot path):

- ``decontaminate_ngram``: benchmark decontamination -- flag training
  docs sharing any word 4-gram with a held-out benchmark set. The
  benchmark side is tiny vs the corpus (broadcast); the corpus side is a
  map-only shingle explode, so at 100 TB the only shuffle is the final
  per-doc aggregate.
- ``repetition_score``: Gopher-style intra-document repetition signal
  (fraction of duplicate 3-grams) -- map-only, zero shuffle.
- ``embedding_quantize``: symmetric int8 quantization of the embedding
  column with exact integer checksums (the standard precursor to
  shipping vectors to an ANN index).
- ``quality_filter_pipeline``: precedence-ordered keep/drop routing
  (too_short > high_punct > low_quality > keep) over the integer quality
  score -- the composite filter step every corpus pipeline runs.
- ``pagerank_suppliers``: 3 fixed iterations of PageRank over the
  supplier->part shipment graph in EXACT integer arithmetic (micro-rank
  units, integer division), so the oracle replays it bit-for-bit --
  float PageRank would diverge on summation order.

Oracles compute shingles as strings while Spark uses xxhash64 gram
hashes: distinct/shared-gram COUNTS are identical unless a 64-bit
collision occurs (odds ~ m^2/2^65, negligible at oracle scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from abr_etl_spark.functions import texthash as th
from abr_etl_spark.operators import similarity, text
from abr_etl_spark.plans.llm_pipeline import _DK_QUALITY
from abr_etl_spark.sources.lake import load_table

DECONTAM_N = 4  # benchmark overlap n-gram width (27 hits at sf0.01; 5 is vacuous there)
BENCH_MOD = 25  # doc_id % BENCH_MOD == 0 -> held-out benchmark doc
PR_ITERS = 3
PR_UNIT = 1_000_000  # initial rank in micro-units
PR_BASE = 150_000  # (1 - d) * PR_UNIT with damping d = 0.85


def decontaminate_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training docs contaminated by benchmark 4-gram overlap.

    Output: (doc_id, n_shared_grams, n_bench_docs) for every training
    doc sharing at least one distinct 4-gram with any benchmark doc.

    Both sides are distinct (id, gram) pairs before the join (the
    counts are countDistinct, so dedup is lossless) and the join
    strategy is left to AQE: the benchmark side here is doc_id % 25 --
    ~4% of all corpus 4-gram rows, NOT a bounded set -- so a forced
    broadcast would OOM at the 100 TB corpus this targets. AQE
    broadcasts it while it fits and falls back to a shuffle hash join
    beyond the threshold; a real deployment with a genuinely bounded
    benchmark (distinct grams of a fixed eval suite) may re-add the
    hint.
    """
    d = load_table(spark, sf_dir, "documents").withColumn(
        "tok", F.expr(th.sp_tokens("text"))
    )
    sh = d.select(
        "doc_id",
        F.explode(
            F.expr(th.sp_shingle_hashes_from_tokens("tok", DECONTAM_N))
        ).alias("g"),
    ).distinct()
    bench = sh.where(F.col("doc_id") % BENCH_MOD == 0).select(
        F.col("doc_id").alias("bench_id"), "g"
    )
    train = sh.where(F.col("doc_id") % BENCH_MOD != 0)
    return (
        train.join(bench, "g")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("g").alias("n_shared_grams"),
            F.countDistinct("bench_id").alias("n_bench_docs"),
        )
    )


def repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition: duplicate 3-gram fraction per doc
    (integer permyriad so the oracle math is exact)."""
    d = load_table(spark, sf_dir, "documents").withColumn(
        "tok", F.expr(th.sp_tokens("text"))
    )
    grams = (
        "CASE WHEN size(tok) >= 3 THEN "
        "transform(sequence(0, size(tok) - 3), i -> xxhash64(slice(tok, i + 1, 3))) "
        "ELSE CAST(array() AS ARRAY<BIGINT>) END"
    )
    return (
        d.withColumn("grams", F.expr(grams))
        .select(
            "doc_id",
            F.size("grams").alias("n_grams"),
            (F.size("grams") - F.size(F.array_distinct(F.col("grams")))).alias(
                "n_dup"
            ),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_dup",
            F.expr(
                "CAST(CASE WHEN n_grams > 0 THEN (10000 * n_dup) DIV n_grams "
                "ELSE 0 END AS INT)"
            ).alias("rep_permyriad"),
        )
    )


def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization: q_i = floor(v_i * 127/amax + 0.5).

    Checksums are integer sums (order-independent, exact across
    engines); amax is reported in exact 1e-6 units for the same reason.
    Map-only over the vectors -- no shuffle, scan-bound at any scale.
    """
    e = load_table(spark, sf_dir, "embeddings").withColumn(
        "emb", F.expr("transform(embedding, x -> cast(x as double))")
    )
    q = (
        "transform(emb, v -> CAST(floor(v * (127.0 / greatest(amax, 1e-12))"
        " + 0.5) AS BIGINT))"
    )
    return (
        e.withColumn(
            "amax", F.expr("array_max(transform(emb, v -> abs(v)))")
        )
        .withColumn("qv", F.expr(q))
        .select(
            "vec_id",
            F.expr("aggregate(qv, 0L, (s, v) -> s + v)").alias("sum_q"),
            F.expr("aggregate(qv, 0L, (s, v) -> s + abs(v))").alias("sum_abs_q"),
            F.expr("CAST(floor(amax * 1000000 + 0.5) AS BIGINT)").alias("amax_e6"),
        )
    )


def quality_filter_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep/drop routing with precedence-ordered reasons, counted per
    source -- the composite corpus filter (all integer comparisons, so
    both engines agree exactly)."""
    d = load_table(spark, sf_dir, "documents")
    nt = text.n_tokens("text")
    n_punct = F.length(F.regexp_replace(F.col("text"), "[A-Za-z0-9\\s]", ""))
    nc = F.greatest(F.length(F.col("text")), F.lit(1))
    punct_pts = F.floor((3000 * n_punct) / nc)
    reason = (
        F.when(nt < 5, "too_short")
        .when(punct_pts > 1500, "high_punct")
        .when(text.quality_score("text") < 5000, "low_quality")
        .otherwise("keep")
    )
    return (
        d.select("source", reason.alias("reason"))
        .groupBy("source", "reason")
        .agg(F.count("*").alias("n_docs"))
    )


def pagerank_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 iterations, damping 0.85) over the supplier->part
    shipment graph, in exact micro-unit integer arithmetic.

    contribution = rank DIV outdeg; rank' = 150000 + (17 * in) DIV 20.
    Dangling nodes (parts) keep the base rank. The loop-invariant edge
    and node sets are localCheckpointed ONCE (lineage truncated, so the
    3 iterations don't re-scan or re-distinct them -- the audit shows
    per-iteration cost only); each iteration is one equi-join + one
    aggregate on dst -- the canonical distributed PageRank shape (at
    scale, pre-partition edges and ranks on the join key so the
    per-iteration shuffle moves only the rank column).
    """
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_partkey") < 200)
    edges = (
        l.select(
            F.col("l_suppkey").cast("long").alias("src"),
            (F.col("l_partkey") + 10000).cast("long").alias("dst"),
        )
        .distinct()
        .localCheckpoint()
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    ranks = nodes.select("node", F.lit(PR_UNIT).cast("long").alias("r"))
    for _ in range(PR_ITERS):
        contrib = (
            edges.join(ranks, edges.src == ranks.node)
            .join(broadcast(deg), "src")
            .select(F.col("dst").alias("node_in"), F.expr("r DIV outdeg").alias("c"))
        )
        incoming = contrib.groupBy("node_in").agg(F.sum("c").alias("inc"))
        ranks = nodes.join(
            incoming, nodes.node == incoming.node_in, "left"
        ).select(
            "node",
            (F.lit(PR_BASE) + F.expr("(17 * coalesce(inc, 0L)) DIV 20"))
            .cast("long")
            .alias("r"),
        )
    return ranks


def knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN majority-vote classification over the embedding column: the
    20 query vectors take the modal label of their 10 exact nearest
    neighbors (ties broken by smallest label -- deterministic in both
    engines because the cosine math is bit-identical).

    Plan shape: broadcast query side into the corpus scan (cosine_topk),
    then the vote aggregate runs on k x |queries| rows -- negligible. At
    scale swap cosine_topk for the IVF/LSH variants; the vote layer is
    unchanged.
    """
    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < KNN_QUERIES)
    topk = similarity.cosine_topk(e, q, k=KNN_K)
    labels = e.select(F.col("vec_id").alias("neighbor_id"), "label")
    votes = (
        labels.join(broadcast(topk), "neighbor_id")
        .groupBy("query_id", "label")
        .agg(F.count("*").alias("n_votes"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("n_votes").desc(), F.col("label").asc()
    )
    return (
        votes.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") == 1)
        .select("query_id", F.col("label").alias("pred_label"), "n_votes")
    )


KNN_K = 10
KNN_QUERIES = 20


def corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole pretraining-corpus pipeline as ONE declarative plan:
    quality filter -> exact dedup (keep min doc_id per normalized text)
    -> overlapping token chunking -> per-source chunk/token stats.

    Catalyst fuses the filter + normalize + dedup-window into one
    shuffle and the chunk explode stays map-side; this is the
    composition story -- each stage is the same operator the standalone
    queries check, so the driver verifying THIS query checks that the
    operators compose without semantic drift.
    """
    from abr_etl_spark.operators import dedup

    d = load_table(spark, sf_dir, "documents")
    nt = text.n_tokens("text")
    n_punct = F.length(F.regexp_replace(F.col("text"), "[A-Za-z0-9\\s]", ""))
    nc = F.greatest(F.length(F.col("text")), F.lit(1))
    keep = (
        (nt >= 5)
        & (F.floor((3000 * n_punct) / nc) <= 1500)
        & (text.quality_score("text") >= 5000)
    )
    filtered = d.where(keep)
    w = Window.partitionBy("__norm").orderBy("doc_id")
    kept = (
        filtered.withColumn("__norm", dedup.normalize_text("text"))
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("doc_id", "source", "text")
    )
    chunks = text.chunk_documents(kept, chunk_tokens=50, overlap=10)
    return (
        chunks.join(broadcast(kept.select("doc_id", "source")), "doc_id")
        .groupBy("source")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_chunks"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
    )


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sanctioned Python path, driver-verified: binary payloads run
    through the REAL Arrow-batched mapInPandas decode (operators/
    multimodal.extract_features) and the oracle replays the stub's
    header-parse checksum in pure SQL -- proving the Arrow batch
    plumbing (schema, row alignment, bytes) end-to-end, not just in
    pytest. Corpus is ASCII, so DuckDB's char slicing equals the stub's
    byte slicing.
    """
    from abr_etl_spark.operators import multimodal

    d = load_table(spark, sf_dir, "documents")
    return multimodal.extract_features(multimodal.attach_payload(d))


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over binary payloads (operators/multimodal.
    sample_frames): the video-style window sampler, Arrow-batched, with
    per-sample byte ranges and checksums the oracle replays byte-for-
    byte in SQL (ASCII corpus => char slicing == byte slicing, same
    contract multimodal_features relies on)."""
    from abr_etl_spark.operators import multimodal

    d = load_table(spark, sf_dir, "documents")
    return multimodal.sample_frames(multimodal.attach_payload(d))


QUERIES = {
    "multimodal_features": multimodal_features,
    "multimodal_frame_sample": multimodal_frame_sample,
    "decontaminate_ngram": decontaminate_ngram,
    "repetition_score": repetition_score,
    "embedding_quantize": embedding_quantize,
    "quality_filter_pipeline": quality_filter_pipeline,
    "pagerank_suppliers": pagerank_suppliers,
    "knn_classify": knn_classify,
    "corpus_pipeline": corpus_pipeline,
}


# ------------------------------------------------------------------ oracles

_DK_TOK = th.dk_tokens("text")
_DK_SH5 = th.dk_shingles("text", DECONTAM_N)
_DK_PUNCT = r"length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g'))"


def _pr_iter_sql(prev: str) -> str:
    return f"""
        SELECT n.node,
               CAST({PR_BASE} + (17 * coalesce(sum(r.r // d.outdeg), 0)) // 20
                    AS BIGINT) AS r
        FROM nodes n
        LEFT JOIN edges e ON e.dst = n.node
        LEFT JOIN {prev} r ON e.src = r.node
        LEFT JOIN deg d ON e.src = d.src
        GROUP BY n.node
    """


ORACLES = {
    # Replays decode_stub in SQL: width/height from byte length, checksum
    # = base-31 fold over the first 64 bytes (ASCII corpus: char ==
    # byte). greatest(unicode, 0) clamps DuckDB's unicode('') == -1 so an
    # empty payload folds to 0 like the stub's empty loop.
    # Replays sample_frames' stride/window/checksum byte math.
    "multimodal_frame_sample": """
        WITH d AS (
            SELECT doc_id, text,
                   (strlen(text) + 31) // 32 AS fc
            FROM documents
        ), s AS (
            SELECT doc_id, text,
                   greatest(1, fc // 4) AS stride,
                   unnest(range(0, least(4, fc))) AS sample_idx
            FROM d
        )
        SELECT doc_id,
               CAST(sample_idx AS BIGINT) AS sample_idx,
               CAST(sample_idx * stride AS BIGINT) AS frame_idx,
               CAST(sample_idx * stride * 32 AS BIGINT) AS byte_offset,
               CAST(strlen(substr(text, sample_idx * stride * 32 + 1, 32))
                    AS BIGINT) AS frame_len,
               CAST(list_reduce(list_prepend(0::BIGINT,
                        list_transform(
                            split(substr(text,
                                         sample_idx * stride * 32 + 1, 32),
                                  ''),
                            c -> ascii(c)::BIGINT)),
                    (a, b) -> (a * 31 + b) % 2147483647) AS BIGINT)
                   AS frame_checksum
        FROM s
    """,
    "multimodal_features": """
        SELECT doc_id,
               'text/plain' AS mime,
               CAST(strlen(text) AS INTEGER) AS n_bytes,
               CAST(strlen(text) % 64 + 1 AS INTEGER) AS width,
               CAST(strlen(text) % 48 + 1 AS INTEGER) AS height,
               CASE WHEN text IS NULL THEN NULL
                    ELSE CAST(list_reduce(list_prepend(0::BIGINT,
                             list_transform(split(substr(text, 1, 64), ''),
                                 c -> greatest(unicode(c), 0)::BIGINT)),
                         (acc, b) -> (acc * 31 + b) % 2147483647)
                         AS BIGINT)
               END AS checksum
        FROM documents
    """,
    "decontaminate_ngram": f"""
        WITH sh AS (
            SELECT doc_id, unnest({_DK_SH5}) AS g FROM documents
        ), b AS (
            SELECT doc_id AS bench_id, g FROM sh WHERE doc_id % {BENCH_MOD} = 0
        ), t AS (
            SELECT doc_id, g FROM sh WHERE doc_id % {BENCH_MOD} <> 0
        )
        SELECT t.doc_id,
               CAST(count(DISTINCT t.g) AS BIGINT) AS n_shared_grams,
               CAST(count(DISTINCT b.bench_id) AS BIGINT) AS n_bench_docs
        FROM t JOIN b ON t.g = b.g
        GROUP BY t.doc_id
    """,
    "repetition_score": f"""
        WITH t AS (
            SELECT doc_id, {_DK_TOK} AS tok FROM documents
        ), g AS (
            SELECT doc_id,
                   CASE WHEN len(tok) >= 3 THEN
                       list_transform(range(0, len(tok) - 3 + 1),
                           i -> array_to_string(list_slice(tok, i + 1, i + 3), ' '))
                   ELSE [] END AS grams
            FROM t
        )
        SELECT doc_id,
               CAST(len(grams) AS INTEGER) AS n_grams,
               CAST(len(grams) - len(list_distinct(grams)) AS INTEGER) AS n_dup,
               CAST(CASE WHEN len(grams) > 0 THEN
                        (10000 * (len(grams) - len(list_distinct(grams))))
                            // len(grams)
                    ELSE 0 END AS INTEGER) AS rep_permyriad
        FROM g
    """,
    "embedding_quantize": """
        WITH e AS (
            SELECT vec_id,
                   list_transform(embedding, x -> x::DOUBLE) AS emb
            FROM embeddings
        ), a AS (
            SELECT vec_id, emb,
                   list_max(list_transform(emb, v -> abs(v))) AS amax
            FROM e
        ), q AS (
            SELECT vec_id, amax,
                   list_transform(emb, v -> CAST(floor(
                       v * (127.0 / greatest(amax, 1e-12)) + 0.5) AS BIGINT))
                       AS qv
            FROM a
        )
        SELECT vec_id,
               CAST(list_reduce(list_prepend(0::BIGINT, qv),
                    (s, v) -> s + v) AS BIGINT) AS sum_q,
               CAST(list_reduce(list_prepend(0::BIGINT,
                        list_transform(qv, v -> abs(v))),
                    (s, v) -> s + v) AS BIGINT) AS sum_abs_q,
               CAST(floor(amax * 1000000 + 0.5) AS BIGINT) AS amax_e6
        FROM q
    """,
    "quality_filter_pipeline": f"""
        SELECT source,
               CASE WHEN len({_DK_TOK}) < 5 THEN 'too_short'
                    WHEN floor((3000 * {_DK_PUNCT})
                               / greatest(length(text), 1)) > 1500
                        THEN 'high_punct'
                    WHEN {_DK_QUALITY} < 5000 THEN 'low_quality'
                    ELSE 'keep' END AS reason,
               count(*) AS n_docs
        FROM documents
        GROUP BY source, reason
    """,
    "corpus_pipeline": f"""
        WITH filtered AS (
            SELECT doc_id, source, text,
                   regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm
            FROM documents
            WHERE len({_DK_TOK}) >= 5
              AND floor((3000 * {_DK_PUNCT}) / greatest(length(text), 1)) <= 1500
              AND {_DK_QUALITY} >= 5000
        ), kept AS (
            SELECT doc_id, source, text,
                   row_number() OVER (PARTITION BY norm ORDER BY doc_id) AS rn
            FROM filtered
        ), tok AS (
            SELECT doc_id, source, {_DK_TOK} AS t
            FROM kept WHERE rn = 1
        ), chunks AS (
            SELECT doc_id, source,
                   unnest(list_transform(
                       range(0, greatest(len(t) - 1, 0) + 1, 40),
                       s -> array_to_string(list_slice(t, s + 1, s + 50), ' ')
                   )) AS chunk_text
            FROM tok
        )
        SELECT source,
               count(DISTINCT doc_id) AS n_docs,
               count(*) AS n_chunks,
               CAST(sum(len(regexp_split_to_array(trim(chunk_text), '\\s+')))
                    AS BIGINT) AS total_tokens
        FROM chunks WHERE chunk_text <> ''
        GROUP BY source
    """,
    "knn_classify": f"""
        WITH q AS (SELECT vec_id AS query_id, embedding AS q_vec
                   FROM embeddings WHERE vec_id < {KNN_QUERIES}),
        c AS (SELECT vec_id AS neighbor_id, embedding AS c_vec
              FROM embeddings),
        scored AS (
            SELECT query_id, neighbor_id,
                   round({th.dk_cosine('q_vec', 'c_vec')}, 6) AS cos
            FROM c, q WHERE query_id <> neighbor_id
        ), topk AS (
            SELECT query_id, neighbor_id FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY query_id
                    ORDER BY cos DESC, neighbor_id ASC) AS rank
                FROM scored
            ) WHERE rank <= {KNN_K}
        ), votes AS (
            SELECT query_id, label, count(*) AS n_votes
            FROM topk JOIN embeddings ON neighbor_id = vec_id
            GROUP BY query_id, label
        )
        SELECT query_id, label AS pred_label, n_votes FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id
                ORDER BY n_votes DESC, label ASC) AS rk
            FROM votes
        ) WHERE rk = 1
    """,
    "pagerank_suppliers": f"""
        WITH edges AS (
            SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS src,
                   CAST(l_partkey + 10000 AS BIGINT) AS dst
            FROM lineitem WHERE l_partkey < 200
        ), deg AS (
            SELECT src, count(*) AS outdeg FROM edges GROUP BY src
        ), nodes AS (
            SELECT src AS node FROM edges
            UNION
            SELECT dst FROM edges
        ), it0 AS (
            SELECT node, CAST({PR_UNIT} AS BIGINT) AS r FROM nodes
        ), it1 AS ({_pr_iter_sql("it0")}
        ), it2 AS ({_pr_iter_sql("it1")}
        ), it3 AS ({_pr_iter_sql("it2")}
        )
        SELECT node, r FROM it3
    """,
}
