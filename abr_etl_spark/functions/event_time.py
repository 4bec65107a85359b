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

The NTZ->LTZ cast routes through the *session* timezone, so the helper pins
``spark.sql.session.timeZone=UTC`` first (always runtime-settable) -- without
that, a caller session in another zone would silently shift every epoch.

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
        # NTZ -> LTZ cast interprets wall-clock in the SESSION timezone;
        # the session must therefore be UTC for a deterministic epoch.
        spark = df.sparkSession
        try:
            spark.conf.set("spark.sql.session.timeZone", "UTC")
        except Exception:
            pass  # a locked conf can only mean it was pinned at build time
        if spark.conf.get("spark.sql.session.timeZone") != "UTC":
            raise ValueError(
                "normalize_event_time requires spark.sql.session.timeZone=UTC "
                "to map TIMESTAMP_NTZ wall-clock to a deterministic epoch"
            )
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df
