#!/usr/bin/env python3
"""Scale-rehearsal bench (r11 verdict item 2): time the heavy families
at sf1 (tools/gen_scale.py's 10x derivation of the driver's sf0.1) AND
at sf0.1 in the same process/config, and report the per-key wall-clock
ratio. The derivation replicates structure LINEARLY (token-remapped
copies, key shifts, per-copy orthogonal embedding maps), so a key whose
ratio blows far past 10x has a superlinear term the docstring's
fan-out bound missed; ~10x or below means the bound holds.

    python tools/bench_sf1.py [sf1_dir] [sf01_dir]

Writes BENCH_sf1.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

#: the r11 verdict's named families: dedup pairs, ANN/IVFADC,
#: delta/merge, plus the top keys by cold time in BENCH_PERKEY.json.
HEAVY_KEYS = [
    # dedup pair family
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_canonical",
    "dedup_weighted_jaccard",
    # ANN / IVFADC family
    "ann_bruteforce",
    "ann_ivf_kmeans",
    "ann_pq_adc",
    "ann_ivf_pq",
    "ivfadc_nprobe_sweep",
    # delta / snapshot family
    "delta_updated",
    "delta_classify_lake",
    "scd2",
    "incremental_agg",
    # top-of-cold-list sweeps and pair reports
    "lsh_band_sweep",
    "embedding_pca_topk",
    "simhash_recall_by_tau",
    "mmr_lambda_sweep",
    "containment_pairs",
    # scan-shaped headliners for the baseline ratio
    "q1_pricing_summary",
    "q3_shipping_priority",
    # r13 wave 2/3 keys: the corpus-shaped ones (census idf family, the
    # bucketed reservoir) plus the day-grain reports and the Q2 window
    # join -- each ratio shows whether the shape holds a decade up.
    "holt_winters_seasonal",
    "spearman_rho_daily",
    "funnel_dropoff",
    "funnel_time_to_convert",
    "page_hinkley_drift",
    "weighted_reservoir_sample",
    "vocab_df_zipf",
    "doc_idf_profile",
    "doc_boilerplate_simpson",
    "source_df_zipf",
    "q2_min_cost_supplier",
]

REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))


def _median(xs: list[float]) -> float:
    return sorted(xs)[len(xs) // 2]


def main() -> int:
    sf1 = sys.argv[1] if len(sys.argv) > 1 else ".scale/sf1"
    sf01 = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    sys.path.insert(0, ".")
    import __spark_entry__ as entry

    from abr_etl_spark.functions.cache import release_result_caches
    from abr_etl_spark.session import get_spark

    spark = get_spark("abr-etl-bench-sf1")
    qs = entry.queries()
    qs["q1_pricing_summary"](spark, sf01).count()  # JVM warm

    rows: dict[str, dict] = {}
    for key in HEAVY_KEYS:
        fn = qs[key]
        med = {}
        for label, sf_dir in (("sf01", sf01), ("sf1", sf1)):
            samples = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                fn(spark, sf_dir).count()
                samples.append(time.perf_counter() - t0)
            release_result_caches()
            med[label] = round(_median(samples), 3)
        ratio = round(med["sf1"] / med["sf01"], 2) if med["sf01"] else None
        rows[key] = {
            "sf01_median_s": med["sf01"],
            "sf1_median_s": med["sf1"],
            "ratio": ratio,
        }
        print(f"  {key}: sf0.1 {med['sf01']}s  sf1 {med['sf1']}s  "
              f"x{ratio}", file=sys.stderr)

    # the COMPOSED reference-parity flow (r12 verdict item 4: "add a
    # weekly_pipeline sf1 row"): not a queries() key (it writes merge
    # state to temp dirs), so it rides bench.py's harness here.
    import bench as bench_mod

    med = {}
    for label, sf_dir in (("sf01", sf01), ("sf1", sf1)):
        samples = bench_mod._bench_weekly_pipeline(spark, sf_dir, REPS)
        release_result_caches()
        med[label] = round(_median(samples), 3)
    rows["weekly_pipeline"] = {
        "sf01_median_s": med["sf01"],
        "sf1_median_s": med["sf1"],
        "ratio": round(med["sf1"] / med["sf01"], 2) if med["sf01"] else None,
    }
    print(f"  weekly_pipeline: sf0.1 {med['sf01']}s  sf1 {med['sf1']}s  "
          f"x{rows['weekly_pipeline']['ratio']}", file=sys.stderr)

    worst = max(rows.items(), key=lambda kv: kv[1]["ratio"] or 0)
    payload = {
        "metric": "sf1_scale_rehearsal",
        "unit": "sec",
        "reps": REPS,
        "sf1_dir": sf1,
        "keys": rows,
        "sum_sf01_s": round(sum(r["sf01_median_s"] for r in rows.values()), 3),
        "sum_sf1_s": round(sum(r["sf1_median_s"] for r in rows.values()), 3),
        "worst_ratio_key": worst[0],
        "worst_ratio": worst[1]["ratio"],
    }
    print(json.dumps(payload))
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_sf1.json")
    with open(out, "w") as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
        fh.write("\n")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
