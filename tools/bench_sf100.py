#!/usr/bin/env python3
"""Fourth scale decade, Spark-only (r13 verdict item 5): time the
pure SCAN-SHAPED headliners at sf100 (tools/gen_scale.py's 1000x
derivation of the driver's sf0.1, ~24 GB) against sf10 in the same
process and report the per-key wall ratio vs the 10x data step --
"does any scan plan pick up a superlinear term three decades past the
gate scale?". The pair/ANN families are deliberately absent: their
certified decades live in BENCH_sf1.json / BENCH_sf10.json, and at
sf100 their answer sets (not their plans) dominate the wall.

    python tools/bench_sf100.py [sf100_dir] [sf10_dir]

Writes BENCH_sf100.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

#: keys whose documented 100 TB cost is "the scan": the TPC-H
#: aggregate headliners, the delta/CDC family, and the events-table
#: day-grain monitors (incl. the r14-born SPRT + additive HW so the
#: fourth decade covers every new scan shape).
SCAN_KEYS = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q6_forecast_revenue",
    "q12_shipping_buckets",
    "q14_promo_revenue",
    "delta_updated",
    "delta_classify_lake",
    "scd2",
    "incremental_agg",
    "sessionize",
    "daily_value_bands",
    "seasonal_index_dow",
    "holt_winters_forecast",
    "holt_winters_seasonal",
    "holt_winters_additive",
    "dq_completeness",
    "page_hinkley_drift",
    "sprt_conversion_monitor",
    "markov_attribution",
    "funnel_time_to_convert",
    "weighted_reservoir_sample",
    "stratified_reservoir_alloc",
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

    spark = get_spark("abr-etl-bench-sf100")
    qs = entry.queries()
    qs["q1_pricing_summary"](spark, sf10).count()  # JVM warm

    rows: dict[str, dict] = {}
    for key in SCAN_KEYS:
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

    payload = {
        "metric": "sf10_to_sf100_scan_family",
        "sf100_dir": sf100,
        "reps": REPS,
        "keys": rows,
        "worst_ratio": max(
            (r["ratio"] for r in rows.values() if r["ratio"]), default=None
        ),
        "sum_sf10_s": round(
            sum(r["sf10_median_s"] for r in rows.values()), 1
        ),
        "sum_sf100_s": round(
            sum(r["sf100_median_s"] for r in rows.values()), 1
        ),
    }
    with open("BENCH_sf100.json", "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))
    return 0


if __name__ == "__main__":
    sys.exit(main())
