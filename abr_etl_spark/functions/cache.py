"""Result-cache lifecycle for eager pair/materialized operators.

Several operators (the four pair-dedup families, embedding_dup_pairs,
incremental_agg) materialize their -- tiny -- result with ``persist()`` +
``count()`` so their large intermediate caches (shingle sets, signatures,
vectors, classify joins) can be unpersisted immediately instead of living
until eviction pressure.  The result cache itself is the documented reuse
contract: a repeat invocation canonicalizes to the same plan, Spark's
CacheManager dedups it (no second entry), and downstream consumers (e.g.
cluster canonicalization calling a pair op again) get the pairs for free.

What was missing (round-5 advice) is an OWNER for those result caches:
nothing ever unpersisted them.  ``materialize_result`` now registers every
such cache here, and ``release_result_caches()`` frees them all -- callers
that embed the engine long-term (driver loops, benchmarks) can call it
between workloads; short-lived sessions can ignore it (caches die with the
session).  Registry growth is bounded: CacheManager dedups identical
canonical plans, so at most one JVM-side cache exists per distinct
(operator, input) regardless of how many times it is registered, and
``unpersist`` is idempotent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: every eagerly-materialized result cache, in registration order.
_RESULT_CACHES: list[DataFrame] = []


def materialize_result(df: DataFrame) -> DataFrame:
    """Persist ``df``, force materialization NOW (so callers may unpersist
    the lineage's intermediate caches), and register the result cache for
    ``release_result_caches``.

    The materializing ``count()`` is stashed on the returned frame as
    ``_abr_result_count`` so consumers that need the result's size (e.g.
    dedup_weighted_jaccard's broadcast guard) read it for free instead of
    launching a second count job over the cache."""
    out = df.persist()
    out._abr_result_count = out.count()
    _RESULT_CACHES.append(out)
    return out


def release_result_caches() -> int:
    """Unpersist every registered result cache; returns how many released.

    Safe to call at any time, from any session: caches belonging to an
    already-stopped session are simply dropped (their blocks died with the
    session's JVM context)."""
    n = 0
    while _RESULT_CACHES:
        df = _RESULT_CACHES.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session stopped: the cache is already gone
    return n
