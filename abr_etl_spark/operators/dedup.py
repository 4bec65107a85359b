"""Deduplication operators for LLM training-data pipelines.

Four families, all shuffle-disciplined for 100 TB corpora:

- exact: hash-groupBy on normalized text. The shuffle carries
  (hash, doc_id) -- never the text.
- n-gram Jaccard: shingle-explode + equi-join on the shingle. Only docs
  sharing a shingle ever meet; the join key is a 8-byte hash.
- MinHash + LSH: signature via JVM higher-order functions, banding, and
  an equi-join on (band, signature) -- candidate generation touches
  O(docs x bands) rows, never O(docs^2).
- SimHash: 48-bit fingerprint; band-exact hamming search (pigeonhole:
  4 bands -> hamming <= 3 guaranteed to collide in >= 1 band).

Every operator returns doc-id pairs (a < b) or keep-lists; verification
joins recover exact similarity only for LSH candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from abr_etl_spark.functions import texthash as th
from abr_etl_spark.functions.cache import materialize_result


def ensure_parallelism(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Spread compute-heavy per-row work across the cluster.

    Small-file scans (one parquet = one partition) would otherwise run
    the whole signature computation on a single core; at 100 TB inputs
    arrive pre-partitioned and this is a no-op.
    """
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def normalize_text(text: str = "text") -> F.Column:
    """Lowercase + whitespace-collapse (the canonical form for exact dedup)."""
    return F.regexp_replace(F.lower(F.trim(F.col(text))), "\\s+", " ")


def dedup_exact(
    df: DataFrame, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Group by normalized-text hash; keep the smallest id per group.

    Returns (kept_id, n_copies). Collision note: grouping is by the full
    normalized text (Spark hashes it internally for the exchange); we
    never trust a 32-bit hash as identity.
    """
    return (
        df.select(F.col(id_col), normalize_text(text).alias("__norm"))
        .groupBy("__norm")
        .agg(
            F.min(id_col).alias("kept_id"),
            F.count("*").alias("n_copies"),
        )
        .select("kept_id", "n_copies")
    )


def shingle_df(
    df: DataFrame, text: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """(id, shingles array<bigint>, n_shingles): distinct word n-grams
    as 64-bit gram hashes (see sp_shingle_hashes_from_tokens -- the
    engine-internal representation; jaccard/minhash math is unchanged).
    Tokenizes into a materialized column first so split() runs once per
    row, not once per reference inside the composed expression.
    """
    df = ensure_parallelism(df)
    return (
        df.select(F.col(id_col), F.expr(th.sp_tokens(text)).alias("__tok"))
        .select(
            F.col(id_col),
            F.expr(th.sp_shingle_hashes_from_tokens("__tok", n)).alias(
                "shingles"
            ),
        )
        .withColumn("n_sh", F.size("shingles"))
    )


def shingle_doc_df(
    df: DataFrame, text: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """Doc-exploded shingle frame WITH corpus document frequencies:
    (id, sh_h, n_sh, df). ONE corpus pass (tokenize + shingle explode)
    plus one count window keyed on the 8-byte shingle hash -- the same
    lineage ngram_jaccard_pairs builds internally (its ``flagged``
    frame), reproduced verbatim so the analyzed plans canonicalize
    equal and Spark's CacheManager serves idf consumers from the pair
    machinery's cache whenever a dedup key already ran this session.
    Standalone cost: the scan + the df shuffle; NEVER the candidate
    self-join."""
    sh = shingle_df(df, text, id_col, n)
    exploded = sh.select(
        F.col(id_col), F.col("n_sh"), F.explode("shingles").alias("sh_h")
    )
    return exploded.withColumn(
        "df", F.count("*").over(Window.partitionBy("sh_h"))
    )


def shingle_df_census(
    df: DataFrame, text: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """Vocab-grain (s, df) shingle document-frequency census -- the
    same canonical plan ngram_jaccard_pairs(with_census=True) exposes,
    built WITHOUT the pair machinery: census-only consumers (Zipf
    reports, idf profiles) pay one corpus pass, and in a session where
    a dedup key already materialized the census, CacheManager plan
    matching serves it from that cache."""
    flagged = shingle_doc_df(df, text, id_col, n)
    return flagged.select(F.col("sh_h").alias("s"), "df").distinct()


def ngram_jaccard_pairs(
    df: DataFrame,
    *,
    text: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.9,
    df_cap: int = 1000,
    keep_shingles: bool = False,
    with_census: bool = False,
) -> DataFrame:
    """Exact Jaccard-similar pairs via shingle equi-join, with a
    document-frequency cap on the join key.

    ``keep_shingles=True`` returns the pair rows WITH both sides'
    shingle arrays (sh_a/n_a/sh_b/n_b) -- the verify step already
    joined them, so downstream rescoring passes (weighted jaccard)
    read the survivors' shingle sets from the shared cache instead of
    re-shingling the corpus. Both shapes are projections of ONE
    materialized cache (the wide frame), so mixing consumers in a
    session never re-runs the candidate join.

    ``with_census=True`` returns ``(pairs, census)`` where census is
    the MATERIALIZED per-shingle document-frequency table (s, df) --
    the candidate machinery computes every shingle's df anyway (the
    cap window, BEFORE the hot filter), so idf-weighting consumers get
    the corpus statistics for free instead of paying a second
    tokenize+shingle+shuffle pass over the corpus. The persist point
    moves up to the pre-filter frame for this call so the pair verify
    and the census share one corpus pass; the pair cache itself is the
    same canonical plan either way (CacheManager dedups it).

    Candidate generation: explode -> drop shingles appearing in more than
    ``df_cap`` documents (one hot shingle -- boilerplate, "the end" --
    would otherwise materialize df^2 pairs and make the self-join
    quadratic on a real corpus; the cap bounds per-shingle fan-out at
    df_cap^2) -> equi-join on the shingle HASH (8 bytes on the wire).
    Verification: join the full shingle sets back for the surviving
    candidate pairs and compute EXACT jaccard, so reported similarity is
    unaffected by the cap. A tau-similar pair is missed only if every
    one of its shared shingles is hot -- i.e. the pair is wholesale
    boilerplate, which exact dedup upstream already collapses; the
    no-recall-loss property at tau=0.9 is asserted in tests.
    """
    sh = shingle_df(df, text, id_col, n).persist()
    # Shingles ARE 64-bit hashes (8 bytes on the wire); the oracle checks
    # exact-jaccard OUTPUT, not the join mechanics, so an engine-native
    # hash representation is fine here (unlike oracle-replicated minhash).
    exploded = sh.select(
        F.col(id_col), F.col("n_sh"), F.explode("shingles").alias("sh_h")
    )
    # Shingles are distinct per doc, so count over a window keyed on the
    # hash IS document frequency -- one shuffle on the 8-byte key, no
    # groupBy+join-back. At scale this is what keeps the self-join
    # near-linear.
    w_df = Window.partitionBy("sh_h")
    flagged = exploded.withColumn("df", F.count("*").over(w_df))
    if with_census:
        # census consumers need PRE-filter dfs (hot shingles weigh ~1,
        # but they still weigh); persist above the cap filter so the
        # verify flow and the census read one shared corpus pass.
        flagged = flagged.persist()
        kept = flagged.where(F.col("df") <= df_cap)
        intermediate = flagged
    else:
        # Materialize before the self-join: the lineage (shingle explode +
        # df window) would otherwise recompute once per side.
        kept = flagged.where(F.col("df") <= df_cap).persist()
        intermediate = kept
    # Prefix filtering (AllPairs / PPJoin): order each doc's shingles
    # rarest-first (global (df, hash) order) and index only its first
    # |d| - ceil(tau*|d|) + 1. A pair with jaccard >= tau shares
    # >= ceil(tau*|d|) shingles, more than fit in the suffix, so at
    # least one shared shingle lands in the prefix -- joining
    # prefix(x) x full(y) is LOSSLESS for the threshold while shrinking
    # the index side ~(1-tau)x and the candidate set ~(1-tau)^2 x.
    # Hot shingles sort last, so prefixes are automatically rare keys.
    w = Window.partitionBy(id_col).orderBy(F.col("df").asc(), F.col("sh_h").asc())
    prefix = (
        kept.withColumn("__rn", F.row_number().over(w))
        .where(
            F.col("__rn")
            <= F.col("n_sh") - F.ceil(F.lit(threshold) * F.col("n_sh")) + 1
        )
        .select(F.col(id_col).alias("__pa"), F.col("n_sh").alias("__na"), "sh_h")
    )
    # Length filter (lossless): jaccard(x, y) <= min(|x|,|y|)/max(|x|,|y|),
    # so a tau-pair's set sizes differ by at most (1-tau) -- prune before
    # the pair-distinct. Measured at sf0.1 this cuts candidates 5.5x
    # (86k -> 15.5k): shared-vocabulary corpora collide on rare shingles
    # across wildly different document lengths.
    cand = (
        prefix.join(
            kept.select(
                F.col(id_col).alias("__pb"), F.col("n_sh").alias("__nb"), "sh_h"
            ),
            "sh_h",
        )
        .where(
            (F.col("__pa") != F.col("__pb"))
            & (
                F.least("__na", "__nb")
                >= threshold * F.greatest("__na", "__nb")
            )
        )
        .select(
            F.least("__pa", "__pb").alias("doc_a"),
            F.greatest("__pa", "__pb").alias("doc_b"),
        )
        .distinct()
    )
    side = sh.select(id_col, "shingles", "n_sh")
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
    # The pair set is tiny (|true near-dups|); persist it so downstream
    # consumers in the same session (cluster canonicalization runs this
    # twice more for CC + star-CC) skip the candidate join + verify.
    # Materialize it NOW so the sh/kept intermediate caches can be dropped
    # immediately; the result cache itself is owned by the lifecycle
    # registry (functions/cache.py -- release_result_caches()).
    # The cache keeps the shingle arrays (survivors x ~shingles/doc
    # bigints -- survivor-bounded, not corpus-bounded) so rescoring
    # consumers never re-shingle; plain consumers get the 3-col
    # projection, which Spark serves from the SAME cache entry.
    wide = materialize_result(
        verified.select(
            "doc_a",
            "doc_b",
            F.round("jaccard", 4).alias("jaccard"),
            "sh_a",
            "n_a",
            "sh_b",
            "n_b",
        ),
        family=f"pairs:n{n}:t{threshold}",
    )
    census = None
    if with_census:
        # vocab-grain (s, df): one distinct over the SHARED cached
        # pre-filter frame -- no second corpus pass. Materialized so
        # idf consumers re-read it for free; owned by the lifecycle
        # registry like the pair cache. Family matches
        # shingle_df_census's registration (same canonical plan -> one
        # JVM cache entry -> one owner name).
        census = materialize_result(
            flagged.select(F.col("sh_h").alias("s"), "df").distinct(),
            family=f"census:n{n}",
        )
    sh.unpersist()
    intermediate.unpersist()
    pairs = wide
    if not keep_shingles:
        pairs = wide.select("doc_a", "doc_b", "jaccard")
        pairs._abr_result_count = wide._abr_result_count
    if with_census:
        return pairs, census
    return pairs


def containment_pairs(
    df: DataFrame,
    *,
    text: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    df_cap: int = 1000,
) -> DataFrame:
    """Near-CONTAINMENT pairs: |A∩B| / min(|A|,|B|) >= ``threshold``.

    Catches the asymmetric dup Jaccard misses -- a short document
    wholesale-quoted inside a much longer one (containment ~1, jaccard
    ~|A|/|B| ~ 0). Candidate generation is the same df-capped shingle
    equi-join as ngram_jaccard_pairs (hot boilerplate shingles dropped
    so per-shingle fan-out stays bounded at df_cap^2); the jaccard
    prefix/length filters are deliberately NOT applied -- both assume a
    bounded size RATIO, which containment explicitly allows. Exact
    containment is reported in exact 1e-4 integer units (no float
    rounding to diverge across engines). A qualifying pair is missed
    only if every shared shingle is df-hot -- i.e. the overlap is pure
    boilerplate (same recall argument, and test, as jaccard's cap).

    Verification is COUNT-BASED, never array-shipping (r13): shingles
    are distinct per doc, so the candidate equi-join already emits
    exactly one row per shared NON-hot shingle -- counting rows per
    pair IS |A cap B| over the capped vocabulary -- and the few shared
    HOT shingles are added back by joining the surviving pairs against
    each doc's (id, hot-shingle) rows (a doc carries few DISTINCT hot
    shingles even when each is corpus-frequent). The sf10 rehearsal
    measured the old array-verify (full shingle arrays joined onto
    every candidate pair) at 35x cold for 10x docs on a LINEAR
    candidate volume -- the arrays were ~50x the candidate wire."""
    sh = shingle_df(df, text, id_col, n).persist()
    exploded = sh.select(
        F.col(id_col), F.explode("shingles").alias("sh_h")
    )
    w_df = Window.partitionBy("sh_h")
    flagged = (
        exploded.withColumn("df", F.count("*").over(w_df))
        # Materialize before the self-join (ngram_jaccard_pairs'
        # lifecycle): without it each join side re-runs the shingle
        # explode + df window.
        .persist()
    )
    kept = flagged.where(F.col("df") <= df_cap)
    # one row per shared non-hot shingle -> count = |A cap B| (capped)
    common_kept = (
        kept.alias("x")
        .join(kept.alias("y"), "sh_h")
        .where(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .select(
            F.col(f"x.{id_col}").alias("doc_a"),
            F.col(f"y.{id_col}").alias("doc_b"),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("__ck"))
    )
    # shared HOT shingles for the surviving pairs only: per-doc hot rows
    # are few (distinct hot shingles per doc), so both joins are
    # pair-bounded
    hot = flagged.where(F.col("df") > df_cap).select(id_col, "sh_h")
    common_hot = (
        common_kept.select("doc_a", "doc_b")
        .join(hot.withColumnRenamed(id_col, "doc_a"), "doc_a")
        .join(
            hot.withColumnRenamed(id_col, "doc_b"),
            ["doc_b", "sh_h"],
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("__ch"))
    )
    sizes = sh.select(id_col, "n_sh")
    verified = (
        common_kept.join(common_hot, ["doc_a", "doc_b"], "left")
        .join(
            sizes.withColumnRenamed(id_col, "doc_a").withColumnRenamed(
                "n_sh", "n_a"
            ),
            "doc_a",
        )
        .join(
            sizes.withColumnRenamed(id_col, "doc_b").withColumnRenamed(
                "n_sh", "n_b"
            ),
            "doc_b",
        )
        .withColumn(
            "common",
            (F.col("__ck") + F.coalesce(F.col("__ch"), F.lit(0))).cast(
                "long"
            ),
        )
        .withColumn("m", F.least("n_a", "n_b").cast("long"))
        .withColumn(
            "cont_e4",
            F.expr("(20000 * common + m) DIV (2 * m)"),
        )
        .where(F.col("cont_e4") >= int(round(threshold * 10000)))
    )
    # Same lifecycle as ngram_jaccard_pairs: materialize the (tiny)
    # verified pair set, then drop the wide shingle caches immediately.
    out = materialize_result(
        verified.select("doc_a", "doc_b", "common", "m", "cont_e4"),
        family=f"containment:n{n}:t{threshold}",
    )
    sh.unpersist()
    flagged.unpersist()
    return out


def minhash_signatures(
    df: DataFrame, text: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """(id, minhash signature array[K]) -- one map-only JVM stage."""
    # xxhash64 (codegen'd, native) instead of the char-level polyhash: the
    # minhash oracle checks OUTPUT pairs against brute-force Jaccard, not
    # the hash family, so the fast engine hash is safe here. pmod maps into
    # [0, P) so the permutation arithmetic stays in BIGINT range.
    sh = shingle_df(df, text, id_col, n).withColumn(
        "sh_hashes",
        F.expr(f"transform(shingles, s -> pmod(xxhash64(s), {th.P}L))"),
    )
    return sh.select(
        F.col(id_col),
        F.col("n_sh"),
        F.col("shingles"),
        F.expr(th.sp_minhash("sh_hashes")).alias("mh"),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    *,
    text: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.9,
) -> DataFrame:
    """MinHash-LSH candidate pairs, verified with exact Jaccard.

    Banding: K=64 perms in 16 bands of 4 -> collision s-curve crosses ~0.5,
    comfortably below the 0.9 verify threshold (miss probability for a
    0.9-pair is (1-0.9^4)^16 ~ 3e-4... for a 0.99-pair ~1e-20).
    The band join shuffles only (band_idx, sig, id); exact verification
    joins shingle sets back for the (tiny) candidate set.
    """
    # Persist the signatures: the band self-join and the verify step would
    # otherwise re-derive the (interpreted higher-order) minhash lineage up
    # to 4x. Cache cost is docs x (K longs + shingles) -- spills if needed.
    sigs = (
        minhash_signatures(df, text, id_col, n)
        .withColumn("bands", F.expr(th.sp_band_sigs("mh")))
        .persist()
    )
    banded = sigs.select(
        F.col(id_col),
        F.posexplode("bands").alias("band_idx", "band_sig"),
    )
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band_idx", "band_sig"])
        .where(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .select(
            F.col(f"x.{id_col}").alias("doc_a"),
            F.col(f"y.{id_col}").alias("doc_b"),
        )
        .distinct()
    )
    side = sigs.select(id_col, "shingles", "n_sh")
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
    # Materialize the (tiny) pair set so the signature cache can be
    # dropped now rather than leak until session eviction pressure --
    # same lifecycle as ngram_jaccard_pairs above.
    pairs = materialize_result(
        verified.select("doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard")),
        family=f"mh_pairs:n{n}:t{threshold}",
    )
    sigs.unpersist()
    return pairs


def simhash_fingerprints(
    df: DataFrame, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Map-only formulation: fingerprint computed per-row with
    higher-order functions -- zero shuffle. (An explode + 48-column
    SUM(CASE) aggregate variant was benchmarked and lost: the extra
    shuffle of exploded token hashes outweighs escaping interpreted
    lambdas.)"""
    toks = ensure_parallelism(df).select(
        F.col(id_col), F.expr(th.sp_token_hashes(th.sp_tokens(text))).alias("th")
    )
    return toks.select(
        F.col(id_col), F.expr(th.sp_simhash("th")).alias("simhash")
    )


def simhash_pairs(
    df: DataFrame,
    *,
    text: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming.

    Piece-multiprobe exact search (HmSearch's trade, r13): split the
    48-bit fingerprint into ceil((max_hamming+1)/2) WIDE pieces and
    probe each piece's hamming<=1 ball -- any pair within the radius
    has SOME piece with <= 1 mismatching bit (pigeonhole over
    2*pieces > max_hamming errors), so joining probe(x) x exact(y) on
    (piece_idx, piece_bits) finds ALL such pairs with zero recall
    loss. vs the old max_hamming+1 exact-match bands: the probe side
    carries (width+1)x more rows, but the join key space grows from
    2^12 to 2^24, so expected false candidates drop ~n^2*4/2^12 ->
    ~n^2*2*25/2^25 (~1000x) -- the sf10 rehearsal measured the band
    join going quadratic at 500k docs (cold 15.9 s at sf1 ->
    712.9 s at sf10, x44.8 for 10x data; the piece-probe restores the
    near-linear decade). Worst case remains sum(bucket^2) under
    fingerprint skew, now over the 2^24 space.
    """
    pieces = (max_hamming + 2) // 2  # some piece has <= 1 error
    width = th.SIMHASH_BITS // pieces
    fp = simhash_fingerprints(df, text, id_col).persist()
    piece_expr = (
        f"transform(sequence(0, {pieces - 1}), p -> "
        f"named_struct('piece_idx', p, 'piece_bits', "
        f"shiftright(simhash, p * {width}) % {1 << width}))"
    )
    index = fp.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(F.expr(piece_expr)).alias("pb"),
    ).select(id_col, "simhash", "pb.piece_idx", "pb.piece_bits")
    # probe side: the piece value itself + its `width` single-bit flips
    probes = index.select(
        F.col(id_col),
        F.col("simhash"),
        F.col("piece_idx"),
        F.explode(
            F.expr(
                f"transform(sequence(0, {width}), j -> CASE WHEN j = 0 "
                f"THEN piece_bits ELSE piece_bits ^ shiftleft(1L, j - 1) "
                f"END)"
            )
        ).alias("piece_bits"),
    )
    cand = (
        probes.alias("x")
        .join(index.alias("y"), ["piece_idx", "piece_bits"])
        .where(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .select(
            F.col(f"x.{id_col}").alias("doc_a"),
            F.col(f"y.{id_col}").alias("doc_b"),
            F.col("x.simhash").alias("sh_a"),
            F.col("y.simhash").alias("sh_b"),
        )
        .distinct()
    )
    # Materialize, then drop the fingerprint cache (same lifecycle as
    # ngram_jaccard_pairs / minhash_lsh_pairs).
    pairs = materialize_result(
        cand.withColumn(
            "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
        )
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming"),
        family=f"sh_pairs:h{max_hamming}",
    )
    fp.unpersist()
    return pairs
