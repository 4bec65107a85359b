#!/usr/bin/env python3
"""Paired A/B bench harness (r16 verdict item 4).

The box drifts 1.3-2x within a round, so two medians taken an hour apart
cannot prove a 20% win.  This harness alternates the two implementations'
reps inside ONE session (A B A B ...), so ambient drift hits both arms
equally, and reports the per-pair deltas plus a sign summary -- a win is
real when (nearly) every pair agrees on the sign, regardless of the
absolute level the box happens to be at.

Usage:
    python tools/bench_ab.py A B [pairs] [warm]
where each arm is either
    key:<queries() key>           e.g. key:minhash_perm_sweep
    <module.path>:<fn>            e.g. tools.ab_variants:minhash_old
(fn signature: (spark, sf_dir) -> DataFrame; timed to .count()).

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (bench contract defaults).
Default (cold) mode releases every result cache between PAIRS, so each
arm pays its own builds -- note A runs first inside a pair, so when the
arms SHARE a cache family, A pays the build and B reads warm, biasing
FOR B; use `warm` mode for such keys. Warm mode runs both arms once
untimed (caches stay resident) and never releases: both arms read the
same warm caches, which is exactly the bench-median contrast.
"""

from __future__ import annotations

import importlib
import json
import os
import statistics
import sys
import time


def _resolve(spec: str):
    kind, _, name = spec.partition(":")
    if kind == "key":
        import __spark_entry__ as entry_mod

        fn = entry_mod.queries().get(name)
        if fn is None:
            raise SystemExit(f"unknown queries() key: {name}")
        return fn
    mod = importlib.import_module(kind)
    return getattr(mod, name)


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    a_spec, b_spec = sys.argv[1], sys.argv[2]
    pairs = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    warm = len(sys.argv) > 4 and sys.argv[4] == "warm"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(2 * int(cpus)))

    from abr_etl_spark.functions.cache import release_result_caches
    from abr_etl_spark.session import get_spark

    fa, fb = _resolve(a_spec), _resolve(b_spec)
    spark = get_spark("abr-bench-ab", master=f"local[{cpus}]")

    # JVM/codegen warmup outside the measurement
    fa(spark, sf_dir).count()
    if warm:
        fb(spark, sf_dir).count()
    else:
        release_result_caches()

    rows = []
    for i in range(pairs):
        spark.sparkContext.setJobDescription(f"AB pair {i}: A={a_spec}")
        t0 = time.perf_counter()
        fa(spark, sf_dir).count()
        ta = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(f"AB pair {i}: B={b_spec}")
        t0 = time.perf_counter()
        fb(spark, sf_dir).count()
        tb = time.perf_counter() - t0
        if not warm:
            release_result_caches()
        rows.append((round(ta, 3), round(tb, 3)))
        print(f"  pair {i}: A={ta:.3f}s B={tb:.3f}s  B/A={tb / ta:.3f}",
              file=sys.stderr)

    ratios = [b / a for a, b in rows]
    payload = {
        "a": a_spec,
        "b": b_spec,
        "sf_dir": sf_dir,
        "cpus": int(cpus),
        "mode": "warm" if warm else "cold",
        "pairs": rows,
        "a_median": round(statistics.median(r[0] for r in rows), 3),
        "b_median": round(statistics.median(r[1] for r in rows), 3),
        "ratio_median": round(statistics.median(ratios), 3),
        "b_wins": sum(1 for r in ratios if r < 1.0),
        "n": pairs,
    }
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
