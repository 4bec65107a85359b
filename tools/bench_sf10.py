#!/usr/bin/env python3
"""Second scale decade, Spark-only (r12 verdict item 4): time the
SCAN-SHAPED headliners at sf10 (tools/gen_scale.py's 100x derivation
of the driver's sf0.1, ~2.4 GB) against sf1 in the same process and
report the per-key wall-clock ratio vs the 10x data step. The
oracle-checked slice of the ladder stays at sf1 (CORRECTNESS_sf1.json)
exactly as SURVEY.md S7.17 scopes it -- a DuckDB replay of the dedup /
ANN families at sf10 would take half a day for no extra correctness
signal; THIS tool answers the remaining question, "does any scan-shaped
plan pick up a superlinear term in the second decade?".

    python tools/bench_sf10.py [sf10_dir] [sf1_dir]

Writes BENCH_sf10.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

#: keys whose documented 100 TB cost is "the scan" (one pass + bounded
#: reductions): the TPC-H aggregate headliners, the delta/CDC family,
#: and the events-table day-grain monitors. Pair/ANN families are
#: deliberately absent -- their decade lives in BENCH_sf1.json where
#: the oracle certifies values too.
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
    "dq_completeness",
    # r13 second wave: the pair/ANN candidate machinery past sf1 --
    # the one family whose joins had never been timed at the third
    # decade (df-capped prefix join, banded LSH, the census-backed
    # weighted rescore, brute-force/compound ANN). Spark-only like the
    # rest; the oracle-checked slice of the ladder stays at sf1.
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "containment_pairs",
    "dedup_weighted_jaccard",
    "ann_bruteforce",
    "ann_ivf_pq",
    "lsh_band_sweep",
    # r13 wave 2/3: the corpus-shaped newcomers (census idf family,
    # the two-scan bucketed reservoir) and the new day-grain monitors,
    # so the third decade covers every r13-born shape too.
    "doc_idf_profile",
    "doc_boilerplate_simpson",
    "vocab_df_zipf",
    "source_df_zipf",
    "weighted_reservoir_sample",
    "holt_winters_seasonal",
    "page_hinkley_drift",
    "spearman_rho_daily",
    "funnel_time_to_convert",
    "q2_min_cost_supplier",
]

REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))


def _median(xs: list[float]) -> float:
    return sorted(xs)[len(xs) // 2]


def main() -> int:
    sf10 = sys.argv[1] if len(sys.argv) > 1 else ".scale/sf10"
    sf1 = sys.argv[2] if len(sys.argv) > 2 else ".scale/sf1"
    sys.path.insert(0, ".")
    import __spark_entry__ as entry

    from abr_etl_spark.functions.cache import release_result_caches
    from abr_etl_spark.session import get_spark

    spark = get_spark("abr-etl-bench-sf10")
    qs = entry.queries()
    qs["q1_pricing_summary"](spark, sf1).count()  # JVM warm

    rows: dict[str, dict] = {}
    for key in SCAN_KEYS:
        fn = qs[key]
        med, cold = {}, {}
        for label, sf_dir in (("sf1", sf1), ("sf10", sf10)):
            samples = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                fn(spark, sf_dir).count()
                samples.append(time.perf_counter() - t0)
            release_result_caches()
            med[label] = round(_median(samples), 3)
            # the pair/ANN families materialize result caches on rep 1,
            # so their MEDIAN prices the cached-read path; the max (the
            # one cold rep) is what answers "is the candidate join
            # superlinear" -- report both ratios.
            cold[label] = round(max(samples), 3)
        ratio = round(med["sf10"] / med["sf1"], 2) if med["sf1"] else None
        cold_ratio = (
            round(cold["sf10"] / cold["sf1"], 2) if cold["sf1"] else None
        )
        rows[key] = {
            "sf1_median_s": med["sf1"],
            "sf10_median_s": med["sf10"],
            "ratio": ratio,
            "sf1_cold_s": cold["sf1"],
            "sf10_cold_s": cold["sf10"],
            "cold_ratio": cold_ratio,
        }
        print(f"  {key}: sf1 {med['sf1']}s  sf10 {med['sf10']}s  "
              f"x{ratio}  (cold {cold['sf1']}s -> {cold['sf10']}s "
              f"x{cold_ratio})", file=sys.stderr)

    worst = max(rows.items(), key=lambda kv: kv[1]["ratio"] or 0)
    payload = {
        "metric": "sf10_scale_decade_spark_only",
        "unit": "sec",
        "reps": REPS,
        "sf10_dir": sf10,
        "keys": rows,
        "sum_sf1_s": round(sum(r["sf1_median_s"] for r in rows.values()), 3),
        "sum_sf10_s": round(
            sum(r["sf10_median_s"] for r in rows.values()), 3
        ),
        "worst_ratio_key": worst[0],
        "worst_ratio": worst[1]["ratio"],
        "worst_cold_ratio_key": max(
            rows.items(), key=lambda kv: kv[1]["cold_ratio"] or 0
        )[0],
        "worst_cold_ratio": max(
            r["cold_ratio"] or 0 for r in rows.values()
        ),
    }
    print(json.dumps(payload))
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_sf10.json")
    with open(out, "w") as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
        fh.write("\n")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
