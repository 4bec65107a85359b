#!/usr/bin/env python3
"""Planning-vs-execution wall split for the big-plan sweep keys
(r15 verdict item 4): mmr_lambda_sweep compiles 235 exchanges /
403 scans, dedup_weighted_jaccard 107/195, ann_pareto_frontier 37 --
bounded frames, so the data movement is cheap, but at cluster
shuffle-partition settings driver PLANNING time can dominate. This
measures where the wall actually goes, at two shuffle-partition
settings (the local default and a cluster-like 256).

    python tools/bench_plan_compile.py [sf_dir] [key ...]

Phases per key (cache released between keys):
  build_s -- fn(spark, sf_dir): DataFrame construction incl. eager
             analysis of every intermediate frame;
  plan_s  -- queryExecution().sparkPlan(): optimization + physical
             planning of the FINAL frame (pre-AQE);
  exec_s  -- .count(): execution, incl. AQE re-planning per stage.

Writes BENCH_PLAN_COMPILE.json (one entry per key per setting).
"""

from __future__ import annotations

import json
import os
import sys
import time

KEYS_DEFAULT = [
    "mmr_lambda_sweep",
    "dedup_weighted_jaccard",
    "ann_pareto_frontier",
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    keys = sys.argv[2:] or KEYS_DEFAULT
    sys.path.insert(0, ".")
    import __spark_entry__ as entry
    from abr_etl_spark.functions.cache import release_result_caches
    from abr_etl_spark.session import get_spark

    out = {"sf_dir": sf_dir, "settings": {}}
    qs = entry.queries()
    for parts in ("32", "256"):
        os.environ["SPARK_GRAFT_SHUFFLE_PARTITIONS"] = parts
        spark = get_spark(f"plan-compile-{parts}")
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        qs["q1_pricing_summary"](spark, sf_dir).count()  # JVM warm
        rows = {}
        for key in keys:
            release_result_caches()
            rec = {}
            # cold pass: build_s INCLUDES the cache-registry
            # materialization (real execution) these keys share, so its
            # planning_share overstates driver work; the warm pass
            # rebuilds the same frame against live caches -- its build_s
            # is the pure analysis cost.
            for phase in ("cold", "warm"):
                t0 = time.perf_counter()
                df = qs[key](spark, sf_dir)
                t1 = time.perf_counter()
                df._jdf.queryExecution().sparkPlan()
                t2 = time.perf_counter()
                df.count()
                t3 = time.perf_counter()
                rec[phase] = {
                    "build_s": round(t1 - t0, 3),
                    "plan_s": round(t2 - t1, 3),
                    "exec_s": round(t3 - t2, 3),
                    "wall_s": round(t3 - t0, 3),
                    "planning_share": round((t2 - t0) / (t3 - t0), 3),
                }
            rows[key] = rec
            print(json.dumps({key: rec, "partitions": parts}),
                  flush=True)
        out["settings"][parts] = rows
        spark.stop()
    with open("BENCH_PLAN_COMPILE.json", "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
