"""Event-time type contract.

The testdata's ``events.ts`` is parquet TIMESTAMP(NANOS, isAdjustedToUTC=false)
-- a tz-naive instant. Different Spark runtimes infer different types for it:

* with ``spark.sql.legacy.parquet.nanosAsLong=true`` honored: ``bigint`` nanos
  (Spark 3.x behavior this engine originally targeted);
* Spark 4.x (HybridAnalyzer line): ``timestamp_ntz`` truncated to micros,
  ignoring the legacy conf;
* hypothetically (isAdjustedToUTC=true data): ``timestamp`` (LTZ).

Every event-time operator downstream (sessionize, as-of join, range join,
OHLC, trailing windows, decay sums, interval coverage, stream attribution)
needs ``cast(ts as long)`` / ``unix_micros(ts)`` -- both of which are illegal
on TIMESTAMP_NTZ.  Rather than patching ten call sites per runtime change,
``normalize_event_time`` is the single load-time contract: whatever the
runtime inferred, the column leaves the reader as a session-timezone
``timestamp`` (LTZ) whose underlying epoch treats the naive wall-clock as
UTC -- exactly the mapping DuckDB's ``epoch(ts)`` applies to the same
parquet, so the oracle and the engine agree on every instant.

A plain NTZ->LTZ ``cast`` would route through the *session* timezone -- and
resolve it lazily at ACTION time, so a caller flipping the zone between plan
build and action would silently shift every epoch.  Instead the NTZ branch
computes the epoch arithmetically from the wall-clock fields (days since
1970-01-01 + time-of-day), which references no timezone at all: the plan is
deterministic however the session is configured, now or later.

tests/test_plans.py::test_event_time_schema_contract pins the loaded type and
one known epoch value so the next runtime drift fails in ONE place, loudly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: dtypes string for the tz-naive parquet type Spark 4 infers.
_NTZ = "timestamp_ntz"


def normalize_event_time(df: DataFrame, col: str = "ts") -> DataFrame:
    """Return ``df`` with ``col`` as a plain (LTZ) ``timestamp`` whose epoch
    interprets naive wall-clock as UTC, regardless of how the runtime read
    the parquet (bigint nanos / TIMESTAMP_NTZ / TIMESTAMP).

    Works on batch and streaming DataFrames alike (type-only projection).
    """
    dtype = dict(df.dtypes).get(col)
    if dtype == "bigint":
        # legacy nanosAsLong path: integer nanos -> micros (exact DIV,
        # the same truncation DuckDB applies to nanos parquet).
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} DIV 1000")))
    if dtype == _NTZ:
        # Timezone-FREE epoch extraction: a cast would consult the session
        # zone lazily at action time; arithmetic on the wall-clock fields
        # (date-diff days + time-of-day) consults nothing.  extract(SECOND)
        # carries the fractional part (DECIMAL), so micros are exact.
        c = F.col(col)
        days = F.datediff(c.cast("date"), F.to_date(F.lit("1970-01-01")))
        micros = (
            days.cast("long") * F.lit(86_400_000_000)
            + F.hour(c).cast("long") * F.lit(3_600_000_000)
            + F.minute(c).cast("long") * F.lit(60_000_000)
            + F.expr(f"CAST(extract(SECOND FROM {col}) * 1000000 AS BIGINT)")
        )
        return df.withColumn(col, F.timestamp_micros(micros))
    return df
