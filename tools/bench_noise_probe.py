#!/usr/bin/env python3
"""Isolate the r12->r13 warm-median tail inflation (r13 verdict item 1).

Observation: the 65 tail keys common to BENCH_r12/BENCH_r13 summed
50.5 -> 81.5 s (~1.6x uniformly) while the 5-rep r1_subset comparator
stayed flat and the plans were unchanged. Candidate causes: (a)
CATALOG-LENGTH accumulation -- JVM/codegen-cache/listener state built
up by the keys that ran before the tail inside the one bench process
(136 keys in r13 vs 115 in r12); (b) ambient host variance between the
two driver runs.

Instrument: ONE bench-identical process walks the full headliner list
in catalog order; a fixed PROBE set of cheap, plan-stable keys is
re-timed (5 reps, median + min) after every SLICE keys. If probe
medians climb with keys-run-so-far, accumulation is the cause and the
curve prices it; if they stay flat while historical payloads differ,
the inflation was ambient to the r13 run.

    python tools/bench_noise_probe.py [sf_dir]

Writes BENCH_NOISE_PROBE.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

#: plan-stable sub-second keys spanning three shapes (scan+agg,
#: window, broadcast join) -- the keys the verdict named as inflated.
PROBE_KEYS = ["abc_classification", "benford_first_digit", "profile_columns"]
SLICE = int(os.environ.get("NOISE_PROBE_SLICE", "20"))
PROBE_REPS = int(os.environ.get("NOISE_PROBE_REPS", "5"))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    os.environ.setdefault(
        "SPARK_GRAFT_SHUFFLE_PARTITIONS", str(2 * int(cpus))
    )
    sys.path.insert(0, ".")
    import bench as bench_mod
    import __spark_entry__ as entry

    from abr_etl_spark.functions.cache import release_result_caches
    from abr_etl_spark.session import get_spark

    spark = get_spark("abr-etl-noise-probe", master=f"local[{cpus}]")
    qs = entry.queries()
    qs["q1_pricing_summary"](spark, sf_dir).count()  # JVM warm

    def probe() -> dict:
        out = {}
        for key in PROBE_KEYS:
            samples = []
            for _ in range(PROBE_REPS):
                t0 = time.perf_counter()
                qs[key](spark, sf_dir).count()
                samples.append(time.perf_counter() - t0)
            out[key] = {
                "median": round(sorted(samples)[len(samples) // 2], 3),
                "min": round(min(samples), 3),
            }
        return out

    walked = [k for k in bench_mod.HEADLINERS if k in qs]
    checkpoints = [{"keys_run": 0, "probe": probe()}]
    print(json.dumps(checkpoints[0]), flush=True)
    for i, key in enumerate(walked, start=1):
        t0 = time.perf_counter()
        qs[key](spark, sf_dir).count()
        _ = time.perf_counter() - t0
        release_result_caches()
        if i % SLICE == 0 or i == len(walked):
            cp = {"keys_run": i, "probe": probe()}
            checkpoints.append(cp)
            print(json.dumps(cp), flush=True)

    base = checkpoints[0]["probe"]
    last = checkpoints[-1]["probe"]
    drift = {
        k: round(last[k]["median"] / base[k]["median"], 2)
        for k in PROBE_KEYS
        if base[k]["median"]
    }
    payload = {
        "metric": "catalog_position_noise_probe",
        "sf_dir": sf_dir,
        "slice": SLICE,
        "probe_reps": PROBE_REPS,
        "keys_walked": len(walked),
        "checkpoints": checkpoints,
        "end_over_start_median_ratio": drift,
    }
    with open("BENCH_NOISE_PROBE.json", "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps({"summary": drift}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
