#!/usr/bin/env python3
"""A/B the Arrow-vectorized similarity kernels against the SQL
expression plan at the scale the r6/r7 verdicts asked about (>= 100k
vectors) -- the committed measurement behind the use_arrow default in
operators/similarity.embedding_dup_pairs.

Vectors are synthesized deterministically in Spark SQL (hash-seeded
uniforms in [-1, 1], 64 dims) so the run replays anywhere; testdata
tops out at 2k vectors, far below the crossover region. Both paths are
bit-identical by construction (pytest-asserted at small n), so only
wall time is compared here.

Usage: python tools/bench_arrow_crossover.py [n_vectors] [reps]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    os.environ.setdefault(
        "SPARK_GRAFT_SHUFFLE_PARTITIONS", str(2 * int(cpus))
    )
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from pyspark.sql import functions as F

    from abr_etl_spark.operators.similarity import embedding_dup_pairs
    from abr_etl_spark.session import get_spark

    spark = get_spark("arrow-crossover", master=f"local[{cpus}]")
    # deterministic synthetic corpus: 64-dim hash-seeded uniforms
    vecs = (
        spark.range(n)
        .select(
            F.col("id").alias("vec_id"),
            F.expr(
                "transform(sequence(0, 63), j -> cast("
                "pmod(hash(id * 64 + j), 20001) / 10000.0 - 1.0"
                " as float))"
            ).alias("embedding"),
        )
        .localCheckpoint(eager=True)
    )

    out: dict[str, object] = {"n_vectors": n, "dims": 64, "reps": reps}
    for label, arrow in (("expr", False), ("arrow", True)):
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            n_pairs = embedding_dup_pairs(
                vecs, bits=24, n_bands=2, use_arrow=arrow
            ).count()
            samples.append(round(time.perf_counter() - t0, 2))
        out[label] = {"median": sorted(samples)[len(samples) // 2],
                      "samples": samples, "n_pairs": n_pairs}
        print(f"  {label}: {samples}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
