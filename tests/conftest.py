"""Shared fixtures: one SparkSession + a DuckDB oracle comparator that
mirrors the driver's gate (row count + schema names + order-insensitive
value compare with columns sorted by name)."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from abr_etl_spark.session import get_spark
from abr_etl_spark.sources.lake import TPCH_TABLES

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")
    s = get_spark("abr-etl-tests", master="local[4]")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_ORACLE}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm_cell(v):
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def normalize(df_pandas):
    """Columns sorted by name; rows -> sorted list of normalized tuples."""
    cols = sorted(df_pandas.columns)
    rows = [
        tuple(_norm_cell(v) for v in row)
        for row in df_pandas[cols].itertuples(index=False, name=None)
    ]
    return cols, sorted(rows)


def assert_matches_oracle(spark_df, ddb_con, sql: str, key: str = "?"):
    """The driver-equivalent compare for one query."""
    got = spark_df.toPandas()
    want = ddb_con.execute(sql).df()
    gcols, grows = normalize(got)
    wcols, wrows = normalize(want)
    assert gcols == wcols, f"[{key}] schema mismatch: spark={gcols} oracle={wcols}"
    assert len(grows) == len(wrows), (
        f"[{key}] row count mismatch: spark={len(grows)} oracle={len(wrows)}"
    )
    mismatches = [
        (a, b) for a, b in zip(grows, wrows) if a != b
    ]
    assert not mismatches, f"[{key}] value mismatch (first 3): {mismatches[:3]}"


def run_registry_parallel(items, call, workers=8):
    """Run call(name, fn) for every (name, fn) pair from a small thread
    pool, collecting (name, exc_type, msg) failures.  The registry-wide
    survival tests execute ~300 independent tiny jobs; running them
    serially pays ~0.6 s of scheduling latency each (opt guide 2.6 --
    Spark happily overlaps concurrent actions, and these frames are
    row-count-bounded), which dominated the suite's wall time."""
    from concurrent.futures import ThreadPoolExecutor

    failures = []

    def one(item):
        name, fn = item
        try:
            call(name, fn)
        except Exception as exc:  # noqa: BLE001 - collecting a report
            failures.append((name, type(exc).__name__, str(exc)[:120]))

    with ThreadPoolExecutor(max_workers=workers) as pool:
        list(pool.map(one, list(items)))
    return failures
