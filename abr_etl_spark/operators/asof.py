"""As-of (point-in-time) join -- an operator Spark lacks natively.

Semantics: for each left row, attach the single most recent right row
with right.ts <= left.ts within the same key group (DuckDB/kdb ASOF JOIN,
pandas merge_asof).

Spark-first implementation: NOT an inequality join (which Catalyst can
only execute as broadcast-nested-loop) but the union trick:

    union(left tagged, right tagged)
      -> window last_value(right payload) over (key ORDER BY ts, side)
      -> filter back to left rows

One shuffle on the key, linear scan within each partition -- the same
plan shape a native as-of operator would produce, and it scales to
arbitrarily large sides (no broadcast requirement).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str = "ts",
    by: str,
    value_cols: list[str],
    suffix: str = "_asof",
    direction: str = "backward",
) -> DataFrame:
    """Attach the nearest right row per ``by`` key: at-or-before each
    left row's ``on`` time (``direction="backward"``, the default
    kdb/pandas semantics) or at-or-after it (``"forward"`` -- the
    "next event" lookup). Right ties on (ts) resolve to the row latest
    in the right's own order; left rows with no match get NULLs.

    Both directions are the same one-shuffle union+window plan -- forward
    simply reverses the window's time order, so "most recent at-or-
    before" becomes "soonest at-or-after"; nothing about the scale story
    changes.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown as-of direction: {direction}")
    lcols = left.columns
    l = left.select(
        *lcols,
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
    )
    r = right.select(
        F.col(by),
        F.col(on),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )
    for c in lcols:
        if c not in (by, on):
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = l.unionByName(r.select(l.columns))
    # right rows (side 0) sort before left rows at equal ts => "at or
    # before"/"at or after" includes same-timestamp right rows. Forward
    # reverses the time order so the trailing window sees FOLLOWING rows.
    ts_order = (
        F.col(on).asc() if direction == "backward" else F.col(on).desc()
    )
    w = (
        Window.partitionBy(by)
        .orderBy(ts_order, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *lcols,
        F.col("__side"),
        *[
            F.last(f"__r_{c}", ignorenulls=True)
            .over(w)
            .alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )
    return filled.where(F.col("__side") == 1).drop("__side")
