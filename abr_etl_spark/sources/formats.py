"""Source/sink format coverage beyond parquet.

The reference emits gzipped pipe-delimited text and CSV deltas; a modern
lake needs the same data in whatever format downstream consumers speak.
All writers preserve the partition layout; compression defaults follow
format norms (snappy parquet/orc, gzip text formats).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_READERS = {
    "parquet": lambda sp: sp.read,
    "orc": lambda sp: sp.read,
    "csv": lambda sp: sp.read.option("header", True).option("inferSchema", True),
    "json": lambda sp: sp.read,
}

SUPPORTED = ("parquet", "orc", "csv", "json")


def write_fmt(
    df: DataFrame,
    path: str,
    fmt: str,
    *,
    mode: str = "overwrite",
    compression: str | None = None,
    partition_by: str | None = None,
) -> None:
    if fmt not in SUPPORTED:
        raise ValueError(f"unsupported format: {fmt}")
    w = df.write.mode(mode).format(fmt)
    if fmt == "csv":
        w = w.option("header", True)
    if compression:
        w = w.option("compression", compression)
    if partition_by:
        w = w.partitionBy(partition_by)
    w.save(path)


def read_fmt(spark: SparkSession, path: str, fmt: str, schema=None) -> DataFrame:
    if fmt not in SUPPORTED:
        raise ValueError(f"unsupported format: {fmt}")
    reader = _READERS[fmt](spark).format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)
