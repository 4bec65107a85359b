"""Approximate/sketch aggregations -- the scale path when exact
distinct-count or quantile shuffles get too expensive.

These cannot be oracle-checked across engines (sketch internals differ),
so their contract is an error bound against the exact operator, enforced
in tests/test_sketches.py. At 100 TB: approx_count_distinct turns a
full shuffle of distinct keys into fixed-size HLL buffers merged
map-side; approx quantiles stream one Greenwald-Khanna-style summary per
partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct_by(
    df: DataFrame, group_col: str, value_col: str, *, rsd: float = 0.02
) -> DataFrame:
    """(group, approx_distinct) with relative standard deviation rsd."""
    return df.groupBy(group_col).agg(
        F.approx_count_distinct(value_col, rsd=rsd).alias("approx_distinct")
    )


def approx_quantiles_by(
    df: DataFrame,
    group_col: str,
    value_col: str,
    probabilities: list[float] = (0.25, 0.5, 0.75),
    *,
    accuracy: int = 10000,
) -> DataFrame:
    """(group, q_25, q_50, ...) via percentile_approx."""
    aggs = [
        F.percentile_approx(value_col, p, accuracy).alias(
            f"q_{int(p * 100)}"
        )
        for p in probabilities
    ]
    return df.groupBy(group_col).agg(*aggs)


def histogram(
    df: DataFrame, value_col: str, *, bins: int = 20
) -> DataFrame:
    """Fixed-width histogram as (bin, lo, hi, n) -- two scans (min/max +
    binning); at scale pass known bounds to make it one."""
    lo, hi = df.agg(
        F.min(value_col).alias("lo"), F.max(value_col).alias("hi")
    ).first()
    width = (hi - lo) / bins or 1.0
    binned = df.select(
        F.least(
            F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)),
            F.lit(bins - 1),
        ).alias("bin")
    )
    return (
        binned.groupBy("bin")
        .agg(F.count("*").alias("n"))
        .select(
            "bin",
            (F.lit(lo) + F.col("bin") * F.lit(width)).alias("lo"),
            (F.lit(lo) + (F.col("bin") + 1) * F.lit(width)).alias("hi"),
            "n",
        )
        .orderBy("bin")
    )
