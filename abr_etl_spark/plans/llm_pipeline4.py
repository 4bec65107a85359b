"""LLM-training-data pipeline, part 4 (round 5).

- ``sequence_pack``: concat-and-chunk sequence packing -- the step that
  turns a filtered corpus into fixed-size training examples. Documents
  are laid head-to-tail in deterministic doc_id order and the resulting
  token stream is cut into CAP-token context windows; each doc reports
  its token offset and the first/last bin it lands in. The global
  running offset is a two-level distributed prefix sum (see the
  docstring) -- the naive formulation is a single-partition global
  window, the classic scale-killer this engine already evicted from
  its other cumulative operators in r3.
- ``corpus_mix``: deterministic source-weighted downsampling -- the
  "mix web-scrape down, keep curated sources whole" re-weighting every
  corpus assembly does. Keep/drop is a pure function of (doc_id,
  source) via a Knuth multiplicative hash, so the sample is exactly
  reproducible on any cluster size / partitioning, and the DuckDB
  oracle replays it bit-for-bit.

- ``heavy_hitters_cms``: Count-Min-Sketch frequency estimation for a
  probe set of tokens -- the bounded-memory alternative to an exact
  token groupBy when the vocabulary doesn't fit anywhere. The sketch is
  D x W counters built with ONE shuffle of at most D*W cells (map-side
  partial aggregation collapses each partition to the sketch size
  first -- the mergeability that makes CMS the standard distributed
  heavy-hitter structure); estimates are the min over the D rows.
  Hash rows are (a_j * polyhash(tok) + b_j) mod P mod W from shared
  literal seeds, so the DuckDB oracle rebuilds the identical sketch.

Reference parity: the reference (abr-etl, Go) has no corpus tooling;
these extend the engine's training-data block (SURVEY.md §2.C).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from abr_etl_spark.functions import texthash as th
from abr_etl_spark.sources.lake import load_table

#: tokens per packed training example (context window).
PACK_CAP = 256
#: docs per prefix-sum bucket -- a DEFAULT, not a constant: sequence_pack
#: takes it as a parameter (r5 verdict: the test-scale value must not be
#: shippable by accident). Level-2 (per-bucket totals) is corpus_docs /
#: bucket rows through one task -- at 10^10 docs size the bucket ~10^6 so
#: level 2 is ~10^4 rows; the tiny default keeps the two-level shape
#: visible (and tested) at the 500-doc sf0.01 corpus.
PACK_BUCKET = 128
#: Knuth 32-bit multiplicative constant (public domain, TAOCP vol 3).
_MIX_MULT = 2654435761
_MIX_MOD = 2147483647
#: keep-rate in 1e-4 units: every 4th source is "curated" (kept whole),
#: the rest are "web-ish" (kept at 25%).
MIX_KEEP_ALL_E4 = 10000
MIX_KEEP_WEB_E4 = 2500


def sequence_pack(
    spark: SparkSession,
    sf_dir: str,
    *,
    bucket: int = PACK_BUCKET,
    cap: int = PACK_CAP,
) -> DataFrame:
    """Per-doc packing manifest: (doc_id, n_tok, tok_offset, bin_first,
    bin_last) under head-to-tail packing into ``cap``-token windows.

    Scale shape -- distributed exclusive prefix sum, never a global
    window:

    1. bucket = doc_id DIV PACK_BUCKET; within-bucket running sums use a
       window partitioned BY BUCKET (bounded partitions, shuffles once
       on bucket).
    2. per-bucket totals (one row per bucket) get an exclusive running
       sum over bucket order -- a window over corpus/PACK_BUCKET tiny
       rows, broadcast-joined back.
    3. tok_offset = bucket_prefix + within_bucket_exclusive_sum; bins
       are integer division by CAP.

    A doc spanning a window boundary reports bin_first < bin_last --
    exactly what a loader needs to know to split it.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        (F.col("doc_id") / F.lit(bucket)).cast("long").alias("__b"),
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_tok"),
    )
    w_in = (
        Window.partitionBy("__b")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = toks.withColumn(
        "__run", F.sum("n_tok").over(w_in) - F.col("n_tok")
    )
    bucket_tot = toks.groupBy("__b").agg(F.sum("n_tok").alias("__tot"))
    w_b = (
        Window.orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = bucket_tot.select(
        "__b", F.coalesce(F.sum("__tot").over(w_b), F.lit(0)).alias("__pre")
    )
    return (
        within.join(F.broadcast(prefix), "__b")
        .select(
            "doc_id",
            "n_tok",
            (F.col("__pre") + F.col("__run")).alias("tok_offset"),
            ((F.col("__pre") + F.col("__run")) / cap)
            .cast("long")
            .alias("bin_first"),
            (
                (F.col("__pre") + F.col("__run") + F.col("n_tok") - 1)
                / cap
            )
            .cast("long")
            .alias("bin_last"),
        )
    )


def sequence_pack_chunks(
    spark: SparkSession,
    sf_dir: str,
    *,
    bucket: int = PACK_BUCKET,
    cap: int = PACK_CAP,
) -> DataFrame:
    """Loader-facing packed chunks: one row per (bin, doc) slice --
    (bin_id, doc_id, tok_start, tok_len), where tok_start is the offset
    INSIDE the document and the slices of one bin concatenate to exactly
    ``cap`` tokens (the last bin may be short).

    Pure integer math exploded off the sequence_pack manifest: a doc
    spanning bins b..b' emits one row per bin, its [tok_start, tok_start
    + tok_len) intervals partitioning [0, n_tok). Fan-out is bounded --
    sum over docs of (1 + n_tok/cap) rows, i.e. corpus_tokens/cap extra
    rows total -- so the explode adds O(number of training examples),
    never a blow-up (r5 verdict item 5).
    """
    manifest = sequence_pack(spark, sf_dir, bucket=bucket, cap=cap)
    g_start = F.greatest(F.col("bin_id") * cap, F.col("tok_offset"))
    g_end = F.least(
        (F.col("bin_id") + 1) * cap, F.col("tok_offset") + F.col("n_tok")
    )
    return (
        manifest.where(F.col("n_tok") > 0)
        .select(
            "doc_id",
            "tok_offset",
            "n_tok",
            F.explode(F.sequence("bin_first", "bin_last")).alias("bin_id"),
        )
        .select(
            "bin_id",
            "doc_id",
            (g_start - F.col("tok_offset")).alias("tok_start"),
            (g_end - g_start).alias("tok_len"),
        )
    )


def corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic source-weighted corpus sample: every 4th source
    (numeric suffix % 4 == 0) is kept whole, the rest at 25%, decided by
    a Knuth multiplicative hash of doc_id -- partition-count-independent,
    cluster-size-independent, and exactly replayable in the oracle.

    Output = kept rows (doc_id, source) plus the keep-rate that admitted
    them; downstream this composes with quality_filter / dedup exactly
    like sample_deterministic does.
    """
    d = load_table(spark, sf_dir, "documents")
    # nullif('') guard: a source with no trailing digits extracts '' -- the
    # bare cast would NULL here but ERROR under ANSI mode, and the oracle's
    # bare ::BIGINT would error too. NULLIF on both sides makes the no-suffix
    # case take the same (web-rate) branch in both engines.
    src_idx = F.nullif(
        F.regexp_extract("source", r"(\d+)$", 1), F.lit("")
    ).cast("long")
    rate = (
        F.when(src_idx % 4 == 0, F.lit(MIX_KEEP_ALL_E4))
        .otherwise(F.lit(MIX_KEEP_WEB_E4))
        .cast("long")  # driver compare is dtype-sensitive; oracle is BIGINT
    )
    h = (F.col("doc_id") * F.lit(_MIX_MULT)) % F.lit(_MIX_MOD)
    return (
        d.select(
            "doc_id",
            "source",
            rate.alias("rate_e4"),
            (h % 10000).alias("__h"),
        )
        .where(F.col("__h") < F.col("rate_e4"))
        .select("doc_id", "source", "rate_e4")
    )


#: hashed-bigram feature buckets for dsir_importance.
DSIR_B = 1024


def _curated_src() -> F.Column:
    """True for every 4th source (numeric suffix % 4 == 0) -- the shared
    "curated" rule corpus_mix uses, NULLIF-guarded the same way."""
    idx = F.nullif(
        F.regexp_extract("source", r"(\d+)$", 1), F.lit("")
    ).cast("long")
    return idx % 4 == 0


def dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-flavored importance weights (Data Selection via Importance
    Resampling, Xie et al. 2023 -- hashed-n-gram features scoring each
    doc by target-domain vs whole-corpus likelihood). Features are the
    per-doc distinct bigram hashes folded into DSIR_B buckets; the
    target domain is the curated sources (corpus_mix's rule). Instead of
    float log-likelihood ratios (libm-divergent across engines), the
    weight is the exact integer ratio of smoothed hit mass,
    weight_e4 = round(1e4 * (tgt_hits+1) / (ref_hits+1)) -- rank-
    equivalent for selection and bit-replayable in the oracle.

    Scale shape: both count tables collapse to <= DSIR_B rows before
    their shuffle (map-side partials), then broadcast back onto the
    exploded gram stream -- one doc-keyed shuffle for the final
    aggregate. Nothing global exceeds the 1024-row feature table.
    """
    d = load_table(spark, sf_dir, "documents")
    # Checkpoint BARRIER after token hashing: the gram expression
    # references its input array several times, and Catalyst's projection
    # collapse would inline the whole char-level token-hash computation
    # into every reference (measured 21 s vs 3 s at sf0.1). Materializing
    # the token-hash column makes each downstream reference an array
    # lookup.
    toks = d.select(
        "doc_id",
        _curated_src().cast("int").alias("__cur"),
        F.expr(th.sp_token_hashes(th.sp_tokens("text"))).alias("__th"),
    ).localCheckpoint()
    grams = toks.select(
        "doc_id",
        "__cur",
        F.expr(
            f"transform({th.sp_gram_hashes_from_token_hashes('__th', 2)}, "
            f"g -> g % {DSIR_B})"
        ).alias("bkts"),
    )
    # Second materialization: the exploded gram stream feeds THREE
    # consumers (both count tables + the per-doc aggregate); without it
    # each would replay the gram fold. After the two checkpoints the
    # whole query is joins over integer pairs.
    ex = grams.select(
        "doc_id", "__cur", F.explode("bkts").alias("b")
    ).localCheckpoint()
    tgt_counts = (
        ex.where(F.col("__cur") == 1)
        .groupBy("b")
        .agg(F.count("*").alias("tc"))
    )
    ref_counts = ex.groupBy("b").agg(F.count("*").alias("rc"))
    return (
        ex.join(F.broadcast(tgt_counts), "b", "left")
        .join(F.broadcast(ref_counts), "b")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.coalesce(F.col("tc"), F.lit(0))).alias("tgt_hits"),
            F.sum("rc").alias("ref_hits"),
        )
        .withColumn(
            "weight_e4",
            F.expr(
                "(10000 * (tgt_hits + 1) + (ref_hits + 1) DIV 2) "
                "DIV (ref_hits + 1)"
            ),
        )
    )


#: shared PII regexes (same patterns redact_pii scrubs with).
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\+?[0-9][0-9()\-\s]{7,}[0-9]"


def pii_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compliance-style PII exposure report per source: docs scanned,
    docs containing an email / phone, and total match counts -- the
    measurement side of redact_pii (you report before you scrub, and
    re-report after to prove the scrub). The corpus has no organic PII,
    so the query plants a deterministic email on every 3rd doc and a
    phone on every 5th (both on every 15th), identically in the oracle
    -- making the expected counts provable, not incidental. One map-only
    regexp_count pass, one aggregate."""
    d = load_table(spark, sf_dir, "documents")
    planted = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit(" reach user"),
                F.col("doc_id").cast("string"),
                F.lit("@mail.example.org"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.lit(" call +61 3 9999 00"),
                F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0"),
            ),
        ).otherwise(F.lit("")),
    )
    per_doc = d.select(
        "source",
        F.regexp_count(planted, F.lit(_EMAIL_RE)).cast("long").alias("ne"),
        F.regexp_count(planted, F.lit(_PHONE_RE)).cast("long").alias("np"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").alias("docs_scanned"),
            F.sum((F.col("ne") > 0).cast("long")).alias("docs_with_email"),
            F.sum((F.col("np") > 0).cast("long")).alias("docs_with_phone"),
            F.sum("ne").alias("n_emails"),
            F.sum("np").alias("n_phones"),
        )
        .orderBy("source")
    )


def doc_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc novelty score for curation ordering: the fraction of a
    doc's distinct 3-gram hashes whose FIRST corpus occurrence (min
    doc_id) is this doc -- high for fresh content, near zero for
    documents assembled from already-seen text. The diversity-aware
    companion to dedup: dedup drops near-copies, novelty RANKS partial
    rehashes.

    Shape: one (doc_id, gram) explode (same checkpoint-barrier rule as
    dsir_importance), one groupBy(gram) min for first-occurrence, one
    16-byte-row equi-join back, one doc-keyed aggregate. Ratio in exact
    integer 1e-4 units, bit-replayable.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.expr(th.sp_token_hashes(th.sp_tokens("text"))).alias("__th"),
    ).localCheckpoint()
    grams = toks.select(
        "doc_id",
        F.explode(
            F.expr(th.sp_gram_hashes_from_token_hashes("__th", 3))
        ).alias("g"),
    ).localCheckpoint()
    first = grams.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    return (
        grams.join(first, "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(
                (F.col("doc_id") == F.col("first_doc")).cast("long")
            ).alias("n_novel"),
        )
        .withColumn(
            "novelty_e4",
            F.expr("(10000 * n_novel + n_grams DIV 2) DIV n_grams"),
        )
    )


#: docs concatenated per synthetic multi-line "page" for dedup_lines.
LINES_PER_PAGE = 5
#: boilerplate header prepended to every synthetic page -- the repeated
#: line the dedup exists to drop.
PAGE_HEADER = "=== corpus page header ==="


def dedup_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-level boilerplate dedup (CCNet-style): across a multi-line
    corpus, keep only the FIRST occurrence of every (normalized) line
    and report per-page counts (page_id, n_lines, n_kept, n_dropped).

    The testdata corpus has no newlines (and no byte-exact duplicate
    docs), so the query synthesizes its multi-line pages in its own CTE
    -- LINES_PER_PAGE consecutive docs joined with \\n under a shared
    boilerplate header line (PAGE_HEADER), identically in the DuckDB
    oracle -- then runs the real operator shape: split + explode into
    lines, ONE shuffle on the line value (first-occurrence window), one
    aggregate back to pages. The header repeats on every page, so the
    dedup provably drops n_pages - 1 occurrences of it.

    Scale shape: the shuffle key is the line itself (the row IS the
    line, so keying on xxhash64(line) would not shrink the wire); the
    window per line holds df(line) rows -- bounded by page count, and
    boilerplate-hot lines are exactly what the operator exists to
    collapse. First-occurrence ties inside one page are broken
    arbitrarily; per-page COUNTS are invariant to the tie-break, which
    is why the oracle can match without an intra-page line index.
    """
    d = load_table(spark, sf_dir, "documents")
    pages = d.groupBy(
        F.expr(f"CAST(doc_id DIV {LINES_PER_PAGE} AS BIGINT)").alias(
            "page_id"
        )
    ).agg(
        F.concat(
            F.lit(PAGE_HEADER + "\n"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("doc_id", "text"))),
                    lambda s: s["text"],
                ),
                "\n",
            ),
        ).alias("page_text")
    )
    lines = pages.select(
        "page_id",
        F.explode(F.split("page_text", "\n")).alias("__raw"),
    ).select("page_id", F.lower(F.trim("__raw")).alias("line"))
    w = Window.partitionBy("line").orderBy("page_id")
    return (
        lines.withColumn("__rn", F.row_number().over(w))
        .groupBy("page_id")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.when(F.col("__rn") == 1, 1).otherwise(0)).alias(
                "n_kept"
            ),
            F.sum(F.when(F.col("__rn") > 1, 1).otherwise(0)).alias(
                "n_dropped"
            ),
        )
    )


#: Count-Min sketch geometry: D independent hash rows x W counters.
#: Error bound: over-estimate <= e*N/W per row w.p. 1-(1/e)^D; D=4, W=1024
#: keeps the whole sketch at 4096 cells -- one map-side-combined shuffle.
CMS_D = 4
CMS_W = 1024
_CMS_A, _CMS_B = (s[:CMS_D] for s in th.perm_seeds(CMS_D))
#: probe tokens come from the first PROBE_DOCS docs (deterministic set).
CMS_PROBE_DOCS = 5


def _cms_stack_expr(hash_col: str) -> str:
    """``stack(D, j, cell_j, ...) AS (j, cell)`` over an already-computed
    hash COLUMN -- shared literal seeds, identical string math in the
    DuckDB oracle. Folds the former array-build + posexplode into one
    generator whose per-row work is D cheap (a*h+b)%P%W expressions; the
    expensive char-level polyhash is evaluated exactly once per token
    behind its own generator boundary (CollapseProject cannot inline
    through Generate, the dsir_importance lesson)."""
    rows = ", ".join(
        f"{j}, (({a} * {hash_col} + {b}) % {th.P}) % {CMS_W}"
        for j, (a, b) in enumerate(zip(_CMS_A, _CMS_B))
    )
    return f"stack({CMS_D}, {rows}) AS (j, cell)"


def _cms_cells(df: DataFrame, tok: str = "tok", *, keep_tok: bool = False) -> DataFrame:
    """(j, cell) rows, D per input token, hash computed once per token."""
    hashed = df.select(
        "*",
        F.explode(F.array(F.expr(th.sp_polyhash(tok)))).alias("__h"),
    )
    keep = [c for c in df.columns if keep_tok or c != tok]
    return hashed.select(*keep, F.expr(_cms_stack_expr("__h")))


def heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min-Sketch frequency estimates for a deterministic probe
    set of tokens (the distinct tokens of the first CMS_PROBE_DOCS
    docs): (tok, est_freq) with est_freq = min_j sketch[j][h_j(tok)].

    Scale shape: token occurrences never shuffle -- each partition
    partially aggregates into at most D*W cells (HashAggregate partial),
    so the exchange carries O(D*W * partitions) tiny rows regardless of
    corpus size; the probe join touches D rows per probe token against
    the <=4096-row sketch (broadcast). This is the bounded-memory
    heavy-hitter path for vocabularies where the exact groupBy
    (tfidf_top_terms) would shuffle the full distinct domain.
    """
    d = load_table(spark, sf_dir, "documents")
    occ = d.select(F.explode(F.expr(th.sp_tokens("text"))).alias("tok"))
    cells = _cms_cells(occ)
    sketch = cells.groupBy("j", "cell").agg(F.count("*").alias("n"))
    probe = (
        d.where(F.col("doc_id") < CMS_PROBE_DOCS)
        .select(F.explode(F.expr(th.sp_tokens("text"))).alias("tok"))
        .distinct()
    )
    probe_cells = _cms_cells(probe, keep_tok=True)
    return (
        probe_cells.join(F.broadcast(sketch), ["j", "cell"])
        .groupBy("tok")
        .agg(F.min("n").alias("est_freq"))
    )


def _dk_cms_union(src: str, *, with_tok: bool) -> str:
    """DuckDB twin of _cms_stack_expr as a UNION ALL over the D rows."""
    tok = ", tok" if with_tok else ""
    return " UNION ALL ".join(
        f"SELECT {j} AS j, (({a} * h + {b}) % {th.P}) % {CMS_W} AS cell{tok}"
        f" FROM {src}"
        for j, (a, b) in enumerate(zip(_CMS_A, _CMS_B))
    )


QUERIES = {
    "sequence_pack": sequence_pack,
    "sequence_pack_chunks": sequence_pack_chunks,
    "dedup_lines": dedup_lines,
    "dsir_importance": dsir_importance,
    "doc_ngram_novelty": doc_ngram_novelty,
    "pii_report": pii_report,
    "corpus_mix": corpus_mix,
    "heavy_hitters_cms": heavy_hitters_cms,
}

ORACLES = {
    # The oracle states packing DECLARATIVELY (one global window) -- the
    # Spark side's two-level prefix sum must equal it exactly.
    "sequence_pack": f"""
        WITH t AS (
            SELECT doc_id,
                   len(regexp_split_to_array(trim(text), '\\s+'))::BIGINT
                       AS n_tok
            FROM documents
        ), c AS (
            SELECT doc_id, n_tok,
                   (sum(n_tok) OVER (ORDER BY doc_id) - n_tok)::BIGINT
                       AS tok_offset
            FROM t
        )
        SELECT doc_id, n_tok, tok_offset,
               tok_offset // {PACK_CAP} AS bin_first,
               (tok_offset + n_tok - 1) // {PACK_CAP} AS bin_last
        FROM c
    """,
    # Identical plant + the same regexes redact_pii scrubs with.
    "pii_report": f"""
        WITH p AS (
            SELECT source,
                   text
                   || CASE WHEN doc_id % 3 = 0
                           THEN ' reach user' || doc_id
                                || '@mail.example.org'
                           ELSE '' END
                   || CASE WHEN doc_id % 5 = 0
                           THEN ' call +61 3 9999 00'
                                || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
                           ELSE '' END AS t
            FROM documents
        ), c AS (
            SELECT source,
                   CAST(len(regexp_extract_all(t,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}'))
                       AS BIGINT) AS ne,
                   CAST(len(regexp_extract_all(t,
                       '\\+?[0-9][0-9()\\-\\s]{{7,}}[0-9]'))
                       AS BIGINT) AS np
            FROM p
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS docs_scanned,
               CAST(sum(CASE WHEN ne > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS docs_with_email,
               CAST(sum(CASE WHEN np > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS docs_with_phone,
               CAST(sum(ne) AS BIGINT) AS n_emails,
               CAST(sum(np) AS BIGINT) AS n_phones
        FROM c GROUP BY source
    """,
    # Identical distinct-gram first-occurrence rule and integer ratio.
    "doc_ngram_novelty": f"""
        WITH t AS (
            SELECT doc_id,
                   {th.dk_gram_hashes_from_token_hashes(
                       th.dk_token_hashes(th.dk_tokens('text')), 3)} AS gs
            FROM documents
        ), ex AS (
            SELECT doc_id, unnest(gs) AS g FROM t
        ), f AS (
            SELECT g, min(doc_id) AS first_doc FROM ex GROUP BY g
        ), agg AS (
            SELECT doc_id,
                   CAST(count(*) AS BIGINT) AS n_grams,
                   CAST(sum(CASE WHEN doc_id = first_doc THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_novel
            FROM ex JOIN f USING (g)
            GROUP BY doc_id
        )
        SELECT doc_id, n_grams, n_novel,
               ((10000 * n_novel) + (n_grams // 2)) // n_grams
                   AS novelty_e4
        FROM agg
    """,
    # Identical hashed-bigram features and integer ratio math.
    "dsir_importance": f"""
        WITH t AS (
            SELECT doc_id, source,
                   list_transform(
                       {th.dk_gram_hashes_from_token_hashes(
                           th.dk_token_hashes(th.dk_tokens('text')), 2)},
                       g -> g % {DSIR_B}) AS bkts
            FROM documents
        ), ex AS (
            SELECT doc_id, source, unnest(bkts) AS b FROM t
        ), tgt AS (
            SELECT b, count(*) AS tc FROM ex
            WHERE NULLIF(regexp_extract(source, '(\\d+)$', 1), '')::BIGINT
                  % 4 = 0
            GROUP BY b
        ), refc AS (
            SELECT b, count(*) AS rc FROM ex GROUP BY b
        ), agg AS (
            SELECT doc_id,
                   CAST(count(*) AS BIGINT) AS n_grams,
                   CAST(sum(coalesce(tc, 0)) AS BIGINT) AS tgt_hits,
                   CAST(sum(rc) AS BIGINT) AS ref_hits
            FROM ex LEFT JOIN tgt USING (b) JOIN refc USING (b)
            GROUP BY doc_id
        )
        SELECT doc_id, n_grams, tgt_hits, ref_hits,
               ((10000 * (tgt_hits + 1)) + ((ref_hits + 1) // 2))
                   // (ref_hits + 1) AS weight_e4
        FROM agg
    """,
    # Identical page synthesis (string_agg ORDER BY doc_id == the sorted
    # collect_list) and the same first-occurrence-by-page rule; per-page
    # counts are tie-break-invariant (see dedup_lines docstring).
    "dedup_lines": f"""
        WITH p AS (
            SELECT doc_id // {LINES_PER_PAGE} AS page_id,
                   '{PAGE_HEADER}' || chr(10)
                       || string_agg(text, chr(10) ORDER BY doc_id)
                       AS page_text
            FROM documents GROUP BY 1
        ), l AS (
            SELECT page_id,
                   lower(trim(unnest(string_split(page_text, chr(10)))))
                       AS line
            FROM p
        ), r AS (
            SELECT page_id,
                   row_number() OVER (PARTITION BY line ORDER BY page_id)
                       AS rn
            FROM l
        )
        SELECT page_id,
               CAST(count(*) AS BIGINT) AS n_lines,
               CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_kept,
               CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dropped
        FROM r GROUP BY page_id
    """,
    # Same declarative manifest, exploded per (bin, doc): slice bounds are
    # greatest/least clamps of the bin window against the doc interval.
    "sequence_pack_chunks": f"""
        WITH t AS (
            SELECT doc_id,
                   len(regexp_split_to_array(trim(text), '\\s+'))::BIGINT
                       AS n_tok
            FROM documents
        ), c AS (
            SELECT doc_id, n_tok,
                   (sum(n_tok) OVER (ORDER BY doc_id) - n_tok)::BIGINT
                       AS tok_offset
            FROM t
        ), m AS (
            SELECT doc_id, n_tok, tok_offset,
                   tok_offset // {PACK_CAP} AS bin_first,
                   (tok_offset + n_tok - 1) // {PACK_CAP} AS bin_last
            FROM c WHERE n_tok > 0
        ), e AS (
            SELECT m.*, unnest(generate_series(bin_first, bin_last)) AS bin_id
            FROM m
        )
        SELECT bin_id, doc_id,
               CAST(greatest(bin_id * {PACK_CAP}, tok_offset) - tok_offset
                    AS BIGINT) AS tok_start,
               CAST(least((bin_id + 1) * {PACK_CAP}, tok_offset + n_tok)
                    - greatest(bin_id * {PACK_CAP}, tok_offset)
                    AS BIGINT) AS tok_len
        FROM e
    """,
    "corpus_mix": f"""
        WITH t AS (
            SELECT doc_id, source,
                   CASE WHEN NULLIF(regexp_extract(source, '(\\d+)$', 1),
                                    '')::BIGINT
                             % 4 = 0
                        THEN {MIX_KEEP_ALL_E4}::BIGINT
                        ELSE {MIX_KEEP_WEB_E4}::BIGINT END AS rate_e4,
                   (doc_id * {_MIX_MULT}) % {_MIX_MOD} % 10000 AS h
            FROM documents
        )
        SELECT doc_id, source, rate_e4
        FROM t WHERE h < rate_e4
    """,
    # Rebuilds the IDENTICAL sketch from the shared (a_j, b_j) literals
    # and probes it with the same min-over-rows rule.
    "heavy_hitters_cms": f"""
        WITH occ AS (
            SELECT {th.dk_polyhash('tok')} AS h
            FROM (SELECT unnest({th.dk_tokens('text')}) AS tok
                  FROM documents)
        ), cells AS (
            {_dk_cms_union('occ', with_tok=False)}
        ), sketch AS (
            SELECT j, cell, count(*) AS n FROM cells GROUP BY j, cell
        ), probe AS (
            SELECT DISTINCT tok
            FROM (SELECT unnest({th.dk_tokens('text')}) AS tok
                  FROM documents WHERE doc_id < {CMS_PROBE_DOCS})
        ), ph AS (
            SELECT tok, {th.dk_polyhash('tok')} AS h FROM probe
        ), pcells AS (
            {_dk_cms_union('ph', with_tok=True)}
        )
        SELECT p.tok, CAST(min(s.n) AS BIGINT) AS est_freq
        FROM pcells p JOIN sketch s ON s.j = p.j AND s.cell = p.cell
        GROUP BY p.tok
    """,
}
