#!/usr/bin/env python3
"""Cache-ownership probe for the bench headliner sequence (r16 verdict
item 1).

Runs every bench.HEADLINERS key once, in bench order, with an observer
installed on functions/cache.py that records every result-cache
registration: which FAMILY it belongs to, and whether the canonical plan
already had a JVM cache entry (a CacheManager dedup hit, i.e. this key is
a CONSUMER of a cache some earlier key built).  After each key it
snapshots the JVM's RDD storage totals.

Output (JSON, one file): per key -> {sec, families: {family: [hits,
misses]}, mem_mb, disk_mb, n_cached}, plus the derived last-toucher map
(family -> last headliner that registered against it) that bench.py's
RELEASE_AFTER schedule is generated from, and an overlap report (families
whose FIRST registration was already a hit -- i.e. two families sharing
one canonical plan, which must share one name before scheduling).

Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 python tools/bench_cache_probe.py out.json
"""

from __future__ import annotations

import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/cache_probe.json"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(2 * int(cpus)))

    from abr_etl_spark.functions import cache as rc
    from abr_etl_spark.session import get_spark

    import __spark_entry__ as entry_mod
    from bench import HEADLINERS

    spark = get_spark("abr-cache-probe", master=f"local[{cpus}]")
    qs = entry_mod.queries()

    current_key = {"k": None}
    # key -> family -> [hits, misses]; family -> ordered list of touching keys
    touched: dict[str, dict[str, list[int]]] = defaultdict(
        lambda: defaultdict(lambda: [0, 0])
    )
    family_keys: dict[str, list[str]] = defaultdict(list)
    first_reg_hit: dict[str, bool] = {}

    def observer(family: str, hit: bool, eager: bool) -> None:
        k = current_key["k"]
        touched[k][family][0 if hit else 1] += 1
        if not family_keys[family] or family_keys[family][-1] != k:
            family_keys[family].append(k)
        if family not in first_reg_hit:
            first_reg_hit[family] = hit

    rc.set_cache_observer(observer)

    def storage() -> tuple[float, float, int]:
        infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
        mem = sum(i.memSize() for i in infos) / 2**20
        disk = sum(i.diskSize() for i in infos) / 2**20
        return round(mem, 1), round(disk, 1), len(infos)

    report: dict[str, dict] = {}
    for name in HEADLINERS:
        fn = qs.get(name)
        if fn is None:
            continue
        current_key["k"] = name
        spark.sparkContext.setJobDescription(f"probe: {name}")
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        sec = round(time.perf_counter() - t0, 3)
        mem, disk, n = storage()
        report[name] = {
            "sec": sec,
            "families": {f: c for f, c in touched[name].items()},
            "mem_mb": mem,
            "disk_mb": disk,
            "n_cached": n,
        }
        print(f"  {name}: {sec}s mem={mem}MB disk={disk}MB n={n}", file=sys.stderr)

    last_toucher = {f: ks[-1] for f, ks in family_keys.items()}
    overlaps = [f for f, hit in first_reg_hit.items() if hit]
    payload = {
        "sf_dir": sf_dir,
        "cpus": int(cpus),
        "per_key": report,
        "family_keys": dict(family_keys),
        "last_toucher": last_toucher,
        "first_reg_was_hit": overlaps,
    }
    with open(out_path, "w") as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {out_path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
