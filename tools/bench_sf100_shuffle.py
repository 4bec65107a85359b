#!/usr/bin/env python3
"""Fourth scale decade, SHUFFLE-HEAVY family (r14 verdict item 4):
time the join/CDC keys whose 100 TB cost is a key-partitioned shuffle
(not just the scan) at sf100 vs sf10, per-key, in one process.

    python tools/bench_sf100_shuffle.py [sf100_dir] [sf10_dir]

Writes/updates the ``shuffle_keys`` section of BENCH_sf100.json under
the SAME min-of-two-runs rule the scan family used (run the script
twice; the merge keeps the per-key minimum median and records both
runs) -- single-box sf100 walls carry cold-I/O and GC ambient
artifacts that hit different keys in different runs
(BENCH_NOISE_PROBE.json).

Family choice: delta_apply_roundtrip is the reference's CDC semantics
end-to-end (two ~0.9x-corpus snapshot joins + the apply merge);
q5_local_supplier and profit_by_nation_year are the canonical
fact-to-fact shuffle joins (lineitem x orders with broadcast dims).
bucketed_join_revenue is deliberately absent: at sf100 it would write
a second ~20 GB bucketed copy of lineitem to disk -- the operator's
point is the PRE-paid shuffle, and its certified decades live in
BENCH_sf1/sf10.
"""

from __future__ import annotations

import json
import os
import sys
import time

SHUFFLE_KEYS = [
    "delta_apply_roundtrip",
    "q5_local_supplier",
    "profit_by_nation_year",
]

REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))


def _median(xs: list[float]) -> float:
    return sorted(xs)[len(xs) // 2]


def main() -> int:
    sf100 = sys.argv[1] if len(sys.argv) > 1 else ".scale/sf100"
    sf10 = sys.argv[2] if len(sys.argv) > 2 else ".scale/sf10"
    sys.path.insert(0, ".")
    import __spark_entry__ as entry

    from abr_etl_spark.functions.cache import release_result_caches
    from abr_etl_spark.session import get_spark

    spark = get_spark("abr-etl-bench-sf100-shuffle")
    qs = entry.queries()
    qs["q5_local_supplier"](spark, sf10).count()  # JVM warm

    rows: dict[str, dict] = {}
    for key in SHUFFLE_KEYS:
        fn = qs[key]
        med = {}
        for label, sf_dir in (("sf10", sf10), ("sf100", sf100)):
            samples = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                fn(spark, sf_dir).count()
                samples.append(time.perf_counter() - t0)
            release_result_caches()
            med[label] = round(_median(samples), 3)
        ratio = (
            round(med["sf100"] / med["sf10"], 2) if med["sf10"] else None
        )
        rows[key] = {
            "sf10_median_s": med["sf10"],
            "sf100_median_s": med["sf100"],
            "ratio": ratio,
        }
        print(json.dumps({key: rows[key]}), flush=True)

    # merge: min-of-runs into BENCH_sf100.json's shuffle section
    path = "BENCH_sf100.json"
    payload = json.load(open(path)) if os.path.exists(path) else {}
    prior = payload.get("shuffle_keys_runs", [])
    prior.append(rows)
    merged = {}
    for key in SHUFFLE_KEYS:
        cands = [r[key] for r in prior if key in r]
        if not cands:  # key added after a prior run was recorded
            continue
        best10 = min(c["sf10_median_s"] for c in cands)
        best100 = min(c["sf100_median_s"] for c in cands)
        merged[key] = {
            "sf10_median_s": best10,
            "sf100_median_s": best100,
            "ratio": round(best100 / best10, 2) if best10 else None,
        }
    payload["shuffle_keys_runs"] = prior
    payload["shuffle_keys"] = merged
    payload["shuffle_method"] = (
        f"per-key MIN of {len(prior)} independent run(s), reps={REPS} "
        "medians each, same min-of-runs ambient-noise rule as the scan "
        "family (BENCH_NOISE_PROBE.json); heap = "
        + os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
    )
    payload["shuffle_worst_ratio"] = max(
        (r["ratio"] for r in merged.values() if r["ratio"]), default=None
    )
    with open(path, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps({"shuffle_keys": merged,
                      "worst": payload["shuffle_worst_ratio"]}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
