"""Lake maintenance: small-file compaction and per-dataset transforms.

Compaction is THE recurring ops problem of streaming/weekly ingest at
scale: thousands of small files per partition destroy scan throughput
(per-file open cost, tiny row groups, starved vectorized readers).

The transform registry realizes the reference's TransformLocation
placeholder (transform.go:3-7, empty ``locationTransformSQL``): named SQL
transforms applied to a dataset between ingest and lake write.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TARGET_FILE_BYTES = 128 * 1024 * 1024  # cluster-friendly parquet file size


def compact_partition(
    spark: SparkSession,
    path: str,
    *,
    target_file_bytes: int = TARGET_FILE_BYTES,
) -> int:
    """Rewrite a lake partition directory into ~target-sized files.

    Sizes the output file count from the actual input bytes (cheap
    filesystem listing, no data read), then rewrites via a temp dir so a
    crash never leaves the partition half-compacted. Returns the new file
    count. Run per-partition (importdate=...), never on the whole table.
    """
    import glob
    import os
    import shutil

    files = [
        f
        for f in glob.glob(os.path.join(path, "*.parquet"))
        + glob.glob(os.path.join(path, "part-*"))
        if os.path.isfile(f)
    ]
    total = sum(os.path.getsize(f) for f in set(files))
    n_out = max(1, -(-total // target_file_bytes))  # ceil div
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "__compacting"
    df.repartition(int(n_out)).write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path)
    os.rename(tmp, path)
    return int(n_out)


# ---------------------------------------------------------------- transforms

TransformFn = Callable[[DataFrame], DataFrame]
_TRANSFORMS: dict[str, TransformFn] = {}


def register_transform(dataset: str) -> Callable[[TransformFn], TransformFn]:
    """Decorator: attach a named transform to a dataset (the post-ingest
    hook the reference left as an empty stub)."""

    def deco(fn: TransformFn) -> TransformFn:
        _TRANSFORMS[dataset] = fn
        return fn

    return deco


def apply_transform(dataset: str, df: DataFrame) -> DataFrame:
    fn = _TRANSFORMS.get(dataset)
    return fn(df) if fn else df


@register_transform("Businesslocation")
def location_transform(df: DataFrame) -> DataFrame:
    """The transform TransformLocation was going to be: normalize state
    codes and postcodes for the location dataset (applied only when the
    columns exist, so partial schemas pass through)."""
    out = df
    if "state" in df.columns:
        out = out.withColumn("state", F.upper(F.trim("state")))
    if "postcode" in df.columns:
        out = out.withColumn(
            "postcode", F.lpad(F.regexp_replace("postcode", "[^0-9]", ""), 4, "0")
        )
    return out


def write_zordered(
    df: DataFrame,
    path: str,
    x: str,
    y: str,
    *,
    bits: int = 16,
    n_files: int = 8,
) -> int:
    """Write ``df`` as parquet clustered on the z-order (Morton)
    interleave of two non-negative integer SQL expressions -- the
    layout that gives every output file a bounded rectangle in BOTH
    dimensions, so per-file min/max column stats prune scans filtered
    on either one (the reason lakehouse tables z-order instead of
    sorting by a single key; plans/analytics8.zorder_layout is the
    read-side locality report over the same formula).

    Mechanics: repartitionByRange on the z-key (range-sampled
    boundaries -> balanced files regardless of key skew) +
    sortWithinPartitions, then the helper column is projected away
    before the write. Pure map-side arithmetic plus the ONE range
    exchange any clustering write needs. Returns the output file count
    (<= n_files; the range partitioner may emit fewer for tiny
    inputs). Locality contract is pytest-asserted against a
    single-column sort baseline (tests/test_maintenance.py).
    """
    import glob
    import os

    from abr_etl_spark.functions.zorder import zkey_sql

    zk = zkey_sql(
        f"pmod({x}, {1 << bits})", f"pmod({y}, {1 << bits})", " DIV ",
        bits=bits,
    )
    (
        df.withColumn("__zkey", F.expr(zk))
        .repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
    return len(
        [
            f
            for f in glob.glob(os.path.join(path, "part-*"))
            if os.path.isfile(f) and not f.endswith(".crc")
        ]
    )
