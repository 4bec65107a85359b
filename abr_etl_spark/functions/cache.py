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
nothing ever unpersisted them.  ``materialize_result`` registers every
such cache here, and ``release_result_caches()`` frees them -- callers
that embed the engine long-term (driver loops, benchmarks) can call it
between workloads; short-lived sessions can ignore it (caches die with the
session).  Registry growth is bounded: CacheManager dedups identical
canonical plans, so at most one JVM-side cache exists per distinct
(operator, input) regardless of how many times it is registered, and
``unpersist`` is idempotent.

Round-17 addition (r16 verdict item 1): caches carry a FAMILY tag so a
long-running benchmark can release one operator family's frames as soon
as its last consumer finishes, instead of all-or-nothing.  With ~150
headline keys in one 8 GB local JVM, never releasing anything piles every
family's storage into the unified region until execution memory evicts
the very caches the in-flight key is re-reading (the r16 32-core
minhash_perm_sweep 1.0 s -> 11.7 s cliff); releasing everything between
keys would instead destroy the documented cross-key warm-reuse contract.
Family-scoped release is the middle path: ``release_result_caches(fam)``
frees exactly the frames whose consumers are done.

CacheManager-dedup caveat: two call sites that materialize the SAME
canonical plan under different family tags share one JVM cache entry, so
releasing either family drops it for both.  Keep overlapping call sites
on one family name (tools/bench_cache_probe.py flags overlaps: a
``materialize_result`` that observes a pre-existing JVM cache entry under
a different family is reported).
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame

#: every eagerly-materialized result cache, in registration order,
#: tagged with its owning family.
_RESULT_CACHES: list[tuple[str, DataFrame]] = []

#: probe hook (tools/bench_cache_probe.py): called as
#: ``observer(family, already_cached, eager)`` on every registration.
#: None in production -- the JVM cache lookup is only paid when a probe
#: installs an observer.
_OBSERVER: Optional[Callable[[str, bool, bool], None]] = None


def set_cache_observer(fn: Optional[Callable[[str, bool, bool], None]]) -> None:
    global _OBSERVER
    _OBSERVER = fn


def _already_cached(df: DataFrame) -> bool:
    """True if df's canonical plan already has a JVM cache entry (i.e.
    this registration is a CacheManager dedup hit, not a new build)."""
    try:
        cm = df.sparkSession._jsparkSession.sharedState().cacheManager()
        return cm.lookupCachedData(df._jdf).isDefined()
    except Exception:
        return False


def note_cache_touch(family: str) -> None:
    """Report a cache CONSUMER that reaches a registered frame through a
    module-level memo (e.g. jaccard_canonical's _CC_CACHE hit path, which
    returns the frame without re-registering).  No-op in production; lets
    tools/bench_cache_probe.py see every consumer, so the bench release
    schedule is derived from the full toucher set."""
    if _OBSERVER is not None:
        _OBSERVER(family, True, False)


def register_cache(df: DataFrame, family: str = "misc") -> DataFrame:
    """Persist ``df`` LAZILY and register it for family-scoped release.

    For intermediates that are populated on first downstream use (no
    eager count); gives plain ``.persist()`` call sites an owner so a
    benchmark can reclaim them (the r16 32-core eviction cliff was driven
    by exactly such unowned frames)."""
    if _OBSERVER is not None:
        _OBSERVER(family, _already_cached(df), False)
    out = df.persist()
    _RESULT_CACHES.append((family, out))
    return out


#: (applicationId, canonical-plan semanticHash) -> row count, recorded by
#: the materializing count.  Lets a repeat registration that CacheManager
#: dedups to an ALREADY-POPULATED cache skip its count job entirely: when
#: the plan is cached, count() would be served from those same blocks, so
#: the memoized value is identical by CacheManager's own same-plan
#: contract -- no new assumption.  Entries are only consulted together
#: with a live cache entry, so a release (which removes the CacheManager
#: entry) automatically forces the next registration to re-count.
_COUNT_MEMO: dict[tuple[str, int], int] = {}


def _plan_key(df: DataFrame) -> tuple[str, int] | None:
    try:
        return (
            df.sparkSession.sparkContext.applicationId,
            df._jdf.queryExecution().analyzed().semanticHash(),
        )
    except Exception:
        return None


def materialize_result(df: DataFrame, family: str = "misc") -> DataFrame:
    """Persist ``df``, force materialization NOW (so callers may unpersist
    the lineage's intermediate caches), and register the result cache for
    ``release_result_caches``.

    The materializing ``count()`` is stashed on the returned frame as
    ``_abr_result_count`` so consumers that need the result's size (e.g.
    dedup_weighted_jaccard's broadcast guard) read it for free instead of
    launching a second count job over the cache.  Repeat registrations of
    a plan whose cache is still live reuse the memoized count (r17): at
    32 local cores even a cached-frame count job costs ~0.1-0.3 s of pure
    stage latency, paid per rep by every consumer of a shared family."""
    hit = _already_cached(df)
    if _OBSERVER is not None:
        _OBSERVER(family, hit, True)
    out = df.persist()
    key = _plan_key(out)
    memo = _COUNT_MEMO.get(key) if key is not None else None
    if hit and memo is not None:
        out._abr_result_count = memo
    else:
        out._abr_result_count = out.count()
        if key is not None:
            _COUNT_MEMO[key] = out._abr_result_count
    _RESULT_CACHES.append((family, out))
    return out


def release_result_caches(*families: str) -> int:
    """Unpersist registered result caches; returns how many released.

    With no arguments releases EVERY cache (the pre-r17 behaviour every
    tool relies on); with family names releases only those families'
    frames, leaving other families' warm-reuse contract intact.

    Safe to call at any time, from any session: caches belonging to an
    already-stopped session are simply dropped (their blocks died with the
    session's JVM context)."""
    global _RESULT_CACHES
    if families:
        keep = [(f, df) for (f, df) in _RESULT_CACHES if f not in families]
        drop = [(f, df) for (f, df) in _RESULT_CACHES if f in families]
    else:
        keep, drop = [], _RESULT_CACHES
    _RESULT_CACHES = keep
    n = 0
    for _f, df in drop:
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session stopped: the cache is already gone
    return n
