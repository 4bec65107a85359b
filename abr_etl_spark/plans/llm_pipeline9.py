"""LLM-training-data pipeline, part 9 (round 11, late).

Completes the tuning-sweep family (SURVEY §7.15 listed three axes
still uncovered): shingle order n, HLL precision m, and SimHash band
layout join the existing LSH-band / PQ-codebook / IVF-nprobe /
k-means-k / MMR-lambda / sessionize-gap / vocab-size / Bloom-m /
watermark-delay / embedding-dim curves. Every sweep follows the same
contract as its siblings: ONE shared expensive computation, per-config
reductions to scalar counts, exact-integer recall/err columns so the
DuckDB oracle replays the whole curve.

- ``shingle_size_sweep``: the n axis of the dedup family. The shingle
  order trades recall against specificity (w=3 is this engine's dedup
  default, w=5 is the Gopher/MassiveText near-dup setting, w=13 the
  standard decontamination n); the sweep reports, per n, the corpus
  index size (total distinct shingles -- the COST axis) and the
  verified tau-pair yield with its exact-1e-4 jaccard mass (the
  OUTCOME axis). Grid floors at n=3: the df-cap no-recall-loss
  argument (dedup.ngram_jaccard_pairs) weakens for n<3 where single
  hot bigrams go over the cap on realistic corpora.
- ``hll_precision_sweep``: the m (register count / precision) axis of
  the HLL family. hll_distinct pins m=16 (exact literal-table linear
  counting), hll_distinct_prod_m pins m=1024 (runtime-ln branch); the
  sweep runs the WHOLE precision ladder in one pass -- the hash is
  computed once per row and every register table hangs off one
  (m, bucket) shuffle -- reporting est vs exact and the 1e-4 relative
  error an operator sizes m against. Uses the runtime-ln estimator
  uniformly (the literal-table device cannot span a grid; parity is
  the dsir_importance round-to-grain discipline, pytest-proven across
  the full V range by test_analytics8).
- ``simhash_band_sweep``: the band-layout axis of the SimHash family
  (simhash_recall_by_tau covers the tau axis). Splitting the same
  48-bit fingerprint into B bands guarantees recall only up to
  hamming B-1 (pigeonhole); fewer, wider bands generate fewer
  candidates but miss radius-3 pairs. Per layout: candidate count
  (COST), hits against the exact hamming<=3 truth, recall_e4 --
  with the >=4-band rows provably at 10000 (pytest).

Scale shapes: the sweeps add NO new join classes -- each reuses its
family's banded/df-capped candidate machinery or register shuffle and
reduces to a <= |grid|-row report; the expensive inputs (fingerprints,
truth pair set, key hashes) are computed once and shared across the
grid.

Reference parity: the reference (abr-etl, Go) has no tuning tooling;
these extend the engine's training-data block (SURVEY.md §2.C).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from abr_etl_spark.functions import texthash as th
from abr_etl_spark.functions.cache import materialize_result
from abr_etl_spark.operators import dedup
from abr_etl_spark.plans.analytics8 import _hll_hash_sql
from abr_etl_spark.plans.llm_pipeline import JACCARD_TAU
from abr_etl_spark.sources.lake import load_table

QUERIES: dict = {}
ORACLES: dict = {}

# --------------------------------------------------- shingle_size_sweep

#: shingle orders: 3 = the engine's dedup default, 5 = Gopher-style
#: near-dup, 7 = paragraph-scale, 13 = the decontamination standard.
SHINGLE_N_GRID = [3, 5, 7, 13]


def shingle_size_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shingle-order axis of near-dup tuning: for each n in
    {SHINGLE_N_GRID}, (n, total_shingles, n_pairs, sum_jaccard_e4) --
    the corpus's distinct-shingle index size (cost), the verified
    jaccard>=tau pair yield, and the pairs' exact half-up 1e-4 jaccard
    mass (so the curve shows WHERE the yield sits inside the tau band,
    not just how many pairs survive). Pair yield is non-increasing in
    n on prose corpora; the committed grid spans the published
    operating points (3 dedup / 5 Gopher / 13 decontamination).

    Scale shape: each n runs the SAME df-capped AllPairs/PPJoin prefix
    machinery as dedup_ngram_jaccard (lossless at tau; candidate
    fan-out bounded by df_cap^2) and reduces to one 3-scalar row; the
    index-size scan is one column-pruned shingle pass per n. Nothing
    here is quadratic in corpus size."""
    d = load_table(spark, sf_dir, "documents")
    out = None
    for n in SHINGLE_N_GRID:
        sh = dedup.shingle_df(d, "text", "doc_id", n)
        tot = sh.agg(
            F.coalesce(F.sum("n_sh"), F.lit(0))
            .cast("long")
            .alias("total_shingles")
        )
        pairs = dedup.ngram_jaccard_pairs(d, n=n, threshold=JACCARD_TAU)
        pstats = pairs.agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.coalesce(
                F.sum(F.expr("CAST(round(jaccard * 10000, 0) AS BIGINT)")),
                F.lit(0),
            )
            .cast("long")
            .alias("sum_jaccard_e4"),
        )
        row = tot.crossJoin(broadcast(pstats)).select(
            F.lit(n).cast("int").alias("n"),
            "total_shingles",
            "n_pairs",
            "sum_jaccard_e4",
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("n")


QUERIES["shingle_size_sweep"] = shingle_size_sweep


def _shingle_size_sweep_oracle() -> str:
    selects = []
    ctes = []
    for n in SHINGLE_N_GRID:
        sh = th.dk_shingles("text", n)
        ctes.append(f"""
    t{n} AS MATERIALIZED (
        SELECT doc_id, {sh} AS sh FROM documents
    ), e{n} AS (
        SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s FROM t{n}
    ), pairs{n} AS MATERIALIZED (
        SELECT round(c::DOUBLE / (n_a + n_b - c), 4) AS jaccard FROM (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   any_value(a.n_sh) AS n_a, any_value(b.n_sh) AS n_b,
                   count(*) AS c
            FROM e{n} a JOIN e{n} b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        ) WHERE c::DOUBLE / (n_a + n_b - c) >= {JACCARD_TAU}
    )""")
        selects.append(f"""
    SELECT CAST({n} AS INTEGER) AS n,
           (SELECT CAST(coalesce(sum(len(sh)), 0) AS BIGINT) FROM t{n})
               AS total_shingles,
           (SELECT CAST(count(*) AS BIGINT) FROM pairs{n}) AS n_pairs,
           (SELECT CAST(coalesce(sum(
                CAST(round(jaccard * 10000, 0) AS BIGINT)), 0) AS BIGINT)
            FROM pairs{n}) AS sum_jaccard_e4""")
    return (
        "WITH "
        + ",".join(c.strip() for c in ctes)
        + " "
        + " UNION ALL ".join(selects)
        + " ORDER BY n"
    )


ORACLES["shingle_size_sweep"] = _shingle_size_sweep_oracle()

# --------------------------------------------------- hll_precision_sweep

#: the precision ladder: m=16 (hll_distinct's pin) up through the
#: production m=1024 (hll_distinct_prod_m's pin). Per m the row also
#: carries its rank width 31 - log2(m), alpha_m * m^2, and the
#: 2.5m linear-counting boundary as EXACT shared literals.
HLL_M_GRID = [16, 64, 256, 1024]


def _hll_sweep_rows() -> list[tuple[int, int, float, float]]:
    rows = []
    for m in HLL_M_GRID:
        w_bits = 31 - m.bit_length() + 1  # 31 - log2(m) for m a power of 2
        alpha_m2 = 0.7213 / (1 + 1.079 / m) * m * m
        rows.append((m, w_bits, alpha_m2, 2.5 * m))
    return rows


#: est expression shared verbatim by both engines (column refs only):
#: raw = alpha_m2 / (empties + sum 2^-rank); linear counting
#: round(m*ln(m/V), 4) replaces it when V > 0 and raw <= 2.5m --
#: hll_est_sql_runtime_ln's branch rule with the constants as columns.
_HLL_SWEEP_EST = (
    "CASE WHEN (m - n_filled) > 0"
    " AND (alpha_m2 / ((m - n_filled) + S_f)) <= lc_thr"
    " THEN round(m * ln(m / CAST(m - n_filled AS DOUBLE)), 4)"
    " ELSE round(alpha_m2 / ((m - n_filled) + S_f), 4) END"
)
_HLL_SWEEP_ERR = (
    "CASE WHEN n_exact = 0 THEN NULL"
    " ELSE CAST(round(abs(est - n_exact) / n_exact * 10000, 0) AS BIGINT)"
    " END"
)


def hll_precision_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The register-count axis of HLL sizing: one row per m in
    {HLL_M_GRID} -- (m, n_filled, est, n_exact, rel_err_e4), the
    distinct-user estimate at that precision against the exact count
    and its half-up 1e-4 relative error. The grid spans both regimes
    on this data: small m sits in the raw-estimator branch, large m in
    linear counting, so ONE driver row exercises both code paths at
    four precisions (hll_distinct / hll_distinct_prod_m pin the two
    endpoints individually).

    Cross-engine exactness: the squared-affine hash is shared text;
    ranks come from length(bin(w)) (no libm); register sums are dyadic
    2^-rank partials (order-exact); alpha_m2 and the 2.5m boundary ride
    the grid table as identical double literals; both est branches
    round to 4 (the runtime-ln round-to-grain discipline).

    Scale shape: the key hashes ONCE per row; the grid cross-join fans
    the scan |grid|x into a single (m, bucket) shuffle whose register
    state is sum(m) rows total; the exact count is one distinct agg.
    At 100 TB the sweep costs |grid| register tables -- kilobytes."""
    e = load_table(spark, sf_dir, "events").select("user_id")
    mt = broadcast(
        spark.createDataFrame(
            _hll_sweep_rows(),
            "m int, w_bits int, alpha_m2 double, lc_thr double",
        )
    )
    h = f"({_hll_hash_sql('user_id')})"
    regs = (
        e.crossJoin(mt)
        .select(
            "m",
            "alpha_m2",
            "lc_thr",
            F.expr(f"{h} % m").alias("bucket"),
            F.expr(
                f"CASE WHEN {h} DIV m = 0 THEN w_bits + 1"
                f" ELSE w_bits + 1 - length(bin({h} DIV m)) END"
            ).alias("rank"),
        )
        .groupBy("m", "alpha_m2", "lc_thr", "bucket")
        .agg(F.max("rank").alias("max_rank"))
    )
    agg = regs.groupBy("m", "alpha_m2", "lc_thr").agg(
        F.count("*").cast("long").alias("n_filled"),
        F.sum(F.expr("power(2.0, -max_rank)")).alias("S_f"),
    )
    ex = e.agg(F.countDistinct("user_id").cast("long").alias("n_exact"))
    return (
        agg.crossJoin(broadcast(ex))
        .select(
            "m",
            "n_filled",
            F.expr(_HLL_SWEEP_EST).alias("est"),
            "n_exact",
        )
        .withColumn("rel_err_e4", F.expr(_HLL_SWEEP_ERR))
        .orderBy("m")
    )


QUERIES["hll_precision_sweep"] = hll_precision_sweep


def _hll_precision_sweep_oracle() -> str:
    vals = ", ".join(
        f"(CAST({m} AS INTEGER), CAST({w} AS INTEGER),"
        f" CAST({a!r} AS DOUBLE), CAST({t!r} AS DOUBLE))"
        for m, w, a, t in _hll_sweep_rows()
    )
    h = f"({_hll_hash_sql('user_id', engine='duckdb')})"
    return f"""
    WITH mt(m, w_bits, alpha_m2, lc_thr) AS (VALUES {vals}),
    regs AS (
        SELECT mt.m, mt.alpha_m2, mt.lc_thr, {h} % mt.m AS bucket,
               max(CASE WHEN {h} // mt.m = 0 THEN mt.w_bits + 1
                        ELSE mt.w_bits + 1 - length(bin({h} // mt.m))
                   END) AS max_rank
        FROM events, mt
        GROUP BY 1, 2, 3, 4
    ), agg AS (
        SELECT m, alpha_m2, lc_thr,
               CAST(count(*) AS BIGINT) AS n_filled,
               sum(power(2.0, -max_rank)) AS S_f
        FROM regs GROUP BY 1, 2, 3
    ), ex AS (
        SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
        FROM events
    ), est AS (
        SELECT m, n_filled, {_HLL_SWEEP_EST} AS est, n_exact
        FROM agg, ex
    )
    SELECT m, n_filled, est, n_exact, {_HLL_SWEEP_ERR} AS rel_err_e4
    FROM est ORDER BY m
    """


ORACLES["hll_precision_sweep"] = _hll_precision_sweep_oracle()

# --------------------------------------------------- simhash_band_sweep

#: (bands, band width) layouts of the 48-bit fingerprint; pigeonhole
#: guarantees recall only for hamming <= bands - 1, so the first two
#: rows are the lossy-but-cheap end and >= 4 bands are radius-3
#: complete.
SIMHASH_LAYOUTS = [(2, 24), (3, 16), (4, 12), (6, 8)]
#: the truth radius every layout is scored against (dedup_simhash's
#: operating point).
SIMHASH_SWEEP_RADIUS = 3


def simhash_band_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The band-layout axis of SimHash tuning: for each (bands, width)
    split of the SAME 48-bit fingerprint, the candidate pairs the band
    equi-join generates and their recall against the exact
    hamming<={SIMHASH_SWEEP_RADIUS} truth -- (bands, width,
    radius_guaranteed, n_candidates, n_hits, n_true, recall_e4).
    Rows with bands > {SIMHASH_SWEEP_RADIUS} are pigeonhole-complete
    (recall_e4 = 10000, pytest-pinned); wider bands cut candidates at
    the cost of radius-3 misses -- THE table an operator reads before
    committing a layout (lsh_band_sweep's contract for the minhash
    family).

    Scale shape: fingerprints compute ONCE (map-only, materialized)
    and every layout re-slices them; per layout one band equi-join
    (the dedup_simhash shuffle shape -- O(docs x bands) rows, 16-byte
    keys) reduced to two scalar counts; truth is the shared pigeonhole
    pair set. No layout touches text or vectors."""
    d = load_table(spark, sf_dir, "documents")
    fp = materialize_result(dedup.simhash_fingerprints(d))
    truth = materialize_result(
        dedup.simhash_pairs(d, max_hamming=SIMHASH_SWEEP_RADIUS).select(
            "doc_a", "doc_b"
        )
    )
    n_true = truth.groupBy().agg(F.count("*").alias("n_true"))
    out = None
    for bands, width in SIMHASH_LAYOUTS:
        banded = fp.select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, {bands - 1}), b -> "
                    f"named_struct('band_idx', b, 'band_bits', "
                    f"shiftright(simhash, b * {width}) % {1 << width}))"
                )
            ).alias("bb"),
        ).select("doc_id", "bb.band_idx", "bb.band_bits")
        cand = materialize_result(
            banded.alias("x")
            .join(banded.alias("y"), ["band_idx", "band_bits"])
            .where(F.col("x.doc_id") < F.col("y.doc_id"))
            .select(
                F.col("x.doc_id").alias("doc_a"),
                F.col("y.doc_id").alias("doc_b"),
            )
            .distinct()
        )
        n_cand = cand.groupBy().agg(F.count("*").alias("n_candidates"))
        n_hits = (
            cand.join(truth, ["doc_a", "doc_b"], "left_semi")
            .groupBy()
            .agg(F.count("*").alias("n_hits"))
        )
        row = (
            n_cand.crossJoin(broadcast(n_hits))
            .crossJoin(broadcast(n_true))
            .select(
                F.lit(bands).cast("int").alias("bands"),
                F.lit(width).cast("int").alias("width"),
                F.lit(bands - 1).cast("int").alias("radius_guaranteed"),
                "n_candidates",
                "n_hits",
                "n_true",
                F.expr(
                    "CASE WHEN n_true = 0 THEN NULL"
                    " ELSE (2 * 10000 * n_hits + n_true) DIV (2 * n_true)"
                    " END"
                ).alias("recall_e4"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("bands")


QUERIES["simhash_band_sweep"] = simhash_band_sweep


def _simhash_band_sweep_oracle() -> str:
    fp = th.dk_simhash(th.dk_token_hashes(th.dk_tokens("text")))
    parts = [f"""
    WITH f AS MATERIALIZED (
        SELECT doc_id, {fp} AS simhash FROM documents
    ), truth AS MATERIALIZED (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM f a JOIN f b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash))
              <= {SIMHASH_SWEEP_RADIUS}
    ), nt AS (SELECT CAST(count(*) AS BIGINT) AS n_true FROM truth)"""]
    selects = []
    for bands, width in SIMHASH_LAYOUTS:
        parts.append(f"""
    , banded_{bands} AS (
        SELECT doc_id, i AS band_idx,
               (simhash >> (i * {width})) % {1 << width} AS band_bits
        FROM f, (SELECT CAST(unnest(range({bands})) AS INTEGER) AS i)
    ), cand_{bands} AS MATERIALIZED (
        SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        FROM banded_{bands} x
        JOIN banded_{bands} y ON x.band_idx = y.band_idx
                             AND x.band_bits = y.band_bits
                             AND x.doc_id < y.doc_id
    )""")
        selects.append(f"""
    SELECT CAST({bands} AS INTEGER) AS bands,
           CAST({width} AS INTEGER) AS width,
           CAST({bands - 1} AS INTEGER) AS radius_guaranteed,
           (SELECT CAST(count(*) AS BIGINT) FROM cand_{bands})
               AS n_candidates,
           (SELECT CAST(count(*) AS BIGINT) FROM cand_{bands} c
            JOIN truth t ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b)
               AS n_hits,
           (SELECT n_true FROM nt) AS n_true,
           CASE WHEN (SELECT n_true FROM nt) = 0 THEN NULL
                ELSE CAST((2 * 10000 * (SELECT count(*) FROM cand_{bands} c
                           JOIN truth t ON t.doc_a = c.doc_a
                                       AND t.doc_b = c.doc_b)
                           + (SELECT n_true FROM nt))
                     // (2 * (SELECT n_true FROM nt)) AS BIGINT)
           END AS recall_e4""")
    parts.append(" UNION ALL ".join(selects))
    parts.append("""
    ORDER BY bands""")
    return "".join(parts)


ORACLES["simhash_band_sweep"] = _simhash_band_sweep_oracle()
