"""Text-analysis operators for LLM training-data pipelines.

All pure JVM-side column expressions (no Python UDFs): token counting,
quality ratios, language-ID heuristic, content fingerprinting. Each is a
narrow projection over the documents table -- at 100 TB these are
scan-bound map-only stages with zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from abr_etl_spark.functions import texthash as th

# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation marks
# (mirrors the GPT-2 pre-tokenizer's coarse classes without the merges).
BPE_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "de": ["der", "die", "das", "und", "ist"],
    "es": ["el", "la", "los", "de", "y", "es"],
    "fr": ["le", "la", "les", "et", "est"],
    "zh": ["的", "是", "了", "在", "和"],
}


def tokens_col(text: str = "text") -> Column:
    return F.expr(th.sp_tokens(text))


def n_tokens(text: str = "text") -> Column:
    return F.size(tokens_col(text))


def n_bpe_tokens(text: str = "text") -> Column:
    # Spark SQL string literals consume one backslash level -- re-escape.
    sql_pat = BPE_REGEX.replace("\\", "\\\\")
    return F.size(F.expr(f"regexp_extract_all({text}, '{sql_pat}', 0)"))


def punct_ratio(text: str = "text") -> Column:
    """Fraction of non-alnum, non-space characters."""
    n_punct = F.length(F.regexp_replace(F.col(text), "[A-Za-z0-9\\s]", ""))
    return n_punct / F.greatest(F.length(F.col(text)), F.lit(1))


def stopword_hits(text: str, words: list[str]) -> Column:
    lst = "array(" + ",".join(f"'{w}'" for w in words) + ")"
    return F.expr(
        f"size(filter({th.sp_tokens(text)}, t -> array_contains({lst}, lower(t))))"
    )


def stopword_ratio(text: str = "text", lang: str = "en") -> Column:
    return stopword_hits(text, STOPWORDS[lang]) / F.greatest(
        n_tokens(text), F.lit(1)
    )


def lang_id(text: str = "text") -> Column:
    """Argmax of per-language stopword hits; deterministic tie-break by
    the fixed language order (first max wins)."""
    langs = list(STOPWORDS)
    hits = [stopword_hits(text, STOPWORDS[g]) for g in langs]
    best = F.greatest(*hits)
    expr = F.lit("unknown")
    for g, h in reversed(list(zip(langs, hits))):
        expr = F.when((best > 0) & (h == best), F.lit(g)).otherwise(expr)
    return expr


def quality_score(text: str = "text") -> Column:
    """Composite quality score scaled to integer [0, 10000].

    Deliberately integer arithmetic (integer DIV, no doubles): float
    formulas whose rationals land exactly on decimal rounding ties
    (e.g. 0.53575) round differently across engines -- Spark rounds the
    shortest decimal repr, DuckDB/C the true binary value. Integer math is
    bit-exact everywhere. 4000 pts stopword density + 3000 pts length
    credit (capped at 100 tokens) + 3000 pts low punctuation.
    """
    nt = F.greatest(n_tokens(text), F.lit(1))
    hits = stopword_hits(text, STOPWORDS["en"])
    n_punct = F.length(F.regexp_replace(F.col(text), "[A-Za-z0-9\\s]", ""))
    nc = F.greatest(F.length(F.col(text)), F.lit(1))
    # floor((small int)/(small int)) on doubles is exact (numerators < 2e6).
    return (
        F.floor((4000 * hits) / nt)
        + F.least(30 * n_tokens(text), F.lit(3000))
        + (F.lit(3000) - F.floor((3000 * n_punct) / nc))
    )


def fingerprint(text: str = "text") -> Column:
    """64-bit-range content fingerprint (polynomial hash mod 2^31-1;
    oracle-reproducible -- production callers wanting a wider hash can use
    F.xxhash64 at the cost of oracle checkability)."""
    return F.expr(th.sp_polyhash(text))


def chunk_documents(
    df: DataFrame,
    *,
    text: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 50,
    overlap: int = 10,
) -> DataFrame:
    """Split documents into overlapping token-window chunks (the unit of
    LLM pretraining examples). stride = chunk_tokens - overlap; one
    explode, no Python. Output: (doc_id, chunk_idx, chunk_text, n_tokens).
    """
    stride = chunk_tokens - overlap
    t = th.sp_tokens(text)
    starts = f"sequence(0, greatest(size({t}) - 1, 0), {stride})"
    chunks = (
        f"transform({starts}, s -> array_join(slice({t}, s + 1, {chunk_tokens}), ' '))"
    )
    return (
        df.select(
            F.col(id_col),
            F.posexplode(F.expr(chunks)).alias("chunk_idx", "chunk_text"),
        )
        .withColumn("n_tokens", F.size(F.expr(th.sp_tokens("chunk_text"))))
        .where(F.col("chunk_text") != "")
    )


PII_PATTERNS = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\+?[0-9][0-9()\-\s]{7,}[0-9]", "<PHONE>"),
]


def redact_pii(col: Column) -> Column:
    """Regex PII scrubbing (emails, phone-like digit runs) -- JVM
    regexp_replace chain, extendable with further patterns."""
    out = col
    for pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def text_stats(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    return df.select(
        id_col,
        F.length(text).alias("n_chars_actual"),
        n_tokens(text).alias("n_tokens"),
        n_bpe_tokens(text).alias("n_bpe_tokens"),
        F.round(punct_ratio(text), 4).alias("punct_ratio"),
        F.round(stopword_ratio(text), 4).alias("stopword_ratio_en"),
    )


def with_language(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    return df.select(id_col, lang_id(text).alias("lang_pred"))


def with_quality(df: DataFrame, text: str = "text", id_col: str = "doc_id", threshold: int = 5000) -> DataFrame:
    q = quality_score(text)
    return df.select(
        id_col,
        q.alias("quality"),
        (q >= threshold).cast("int").alias("keep"),
    )


def with_fingerprint(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    return df.select(id_col, fingerprint(text).alias("fingerprint"))
