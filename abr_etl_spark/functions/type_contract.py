"""Load-time type contract for DATE-like and MONEY-like columns.

Same defensive pattern as functions/event_time.py (the NTZ episode: a
Spark-4 inference change silently retyped events.ts and broke ten keys at
once): every type the engine depends on is normalized AT THE READER to one
pinned type, so the next runtime inference change fails in ONE named
pytest (tests/test_plans.py::test_table_type_contract) instead of as
scattered DATATYPE_MISMATCH / hash-mismatch failures across the query
surface.

Pinned types:

* DATE-like columns (o_orderdate, l_shipdate -- parquet
  TIMESTAMP(NANOS, isAdjustedToUTC=false) midnights): ``timestamp_ntz``.
  Wall-clock comparisons against date literals and parquet pushdown both
  work on NTZ, and DuckDB sees the same naive timestamps, so oracle
  comparisons are tz-proof. Drift handled: DATE (cast up, midnight --
  tz-free), TIMESTAMP/LTZ (epoch rebuilt onto an NTZ base arithmetically,
  no session-timezone dependence), bigint legacy nanos (integer DIV).
* MONEY-like columns (prices, balances, discounts -- parquet DOUBLE):
  ``double``. Drift handled: any DECIMAL(p,s) re-inference is cast back,
  so float arithmetic and oracle rounding stay byte-stable.

events.ts is intentionally NOT here -- event-time operators need epoch
arithmetic (cast to long), so it normalizes to an LTZ timestamp via
functions/event_time.py instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: per-table columns the engine requires to be timestamp_ntz wall-clocks.
DATE_COLS: dict[str, tuple[str, ...]] = {
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}

#: per-table columns the engine requires to be double.
MONEY_COLS: dict[str, tuple[str, ...]] = {
    "orders": ("o_totalprice",),
    "lineitem": ("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
    "part": ("p_retailprice",),
    "customer": ("c_acctbal",),
    "supplier": ("s_acctbal",),
    "events": ("value",),
}


def _to_ntz(col: str, dtype: str) -> F.Column:
    """Rebuild ``col`` as timestamp_ntz whatever the runtime inferred --
    never via a session-timezone-dependent cast."""
    c = F.col(col)
    if dtype == "timestamp_ntz":
        return c
    if dtype == "date":
        # DATE -> NTZ midnight is pure calendar math, tz-free.
        return c.cast("timestamp_ntz")
    if dtype == "bigint":
        # legacy nanosAsLong: integer nanos since epoch -> NTZ wall clock.
        return F.expr(
            f"timestampadd(MICROSECOND, {col} DIV 1000, "
            f"TIMESTAMP_NTZ'1970-01-01 00:00:00')"
        )
    if dtype == "timestamp":
        # LTZ: unix_micros is timezone-free on an instant; rebuilding the
        # wall clock from epoch-as-UTC arithmetic avoids the lazy
        # session-zone dependence an LTZ->NTZ cast would introduce.
        return F.expr(
            f"timestampadd(MICROSECOND, unix_micros({col}), "
            f"TIMESTAMP_NTZ'1970-01-01 00:00:00')"
        )
    raise TypeError(f"unsupported runtime type for {col}: {dtype}")


def normalize_table_types(df: DataFrame, table: str) -> DataFrame:
    """Apply the date/money contract for ``table`` (no-op when the
    runtime already inferred the pinned types -- the common case)."""
    dtypes = dict(df.dtypes)
    out = df
    for col in DATE_COLS.get(table, ()):
        if dtypes[col] != "timestamp_ntz":
            out = out.withColumn(col, _to_ntz(col, dtypes[col]))
    for col in MONEY_COLS.get(table, ()):
        if dtypes[col] != "double":
            out = out.withColumn(col, F.col(col).cast("double"))
    return out
