"""bm25_topk's DECIMAL(38,0) factor math at and past the old int64
boundary (r7 verdict item 3).

The old all-BIGINT formula wrapped once ``1e6 * 44 * T * tf`` crossed
2^63 (~1e6 docs at realistic token counts). The widened formula must
(a) equal exact Python big-int arithmetic at corpus stats far past that
boundary, and (b) stay bit-identical to the DuckDB-engine formula text
in the shared small-value range (the oracle's operating regime).
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from abr_etl_spark.plans.llm_pipeline5 import _bm25_term_sql


def _py_term(N: int, T: int, dl: int, tf: int, df: int) -> int:
    """Exact big-int replay of the shared formula (positive values, so
    floor == truncation and Python // matches both engines)."""
    if tf <= 0:
        return 0
    idf = (2 * (10**6 * (2 * N - 2 * df + 1)) + (2 * df + 1)) // (
        2 * (2 * df + 1)
    )
    den = 20 * T * tf + 6 * T + 18 * dl * N
    tfp = (2 * (10**6 * 44 * T * tf) + den) // (2 * den)
    return (2 * (idf * tfp) + 10**8) // (2 * 10**8)


CASES = [
    # (N, T, dl, tf, df) -- first rows small (oracle regime), the rest
    # chosen so 1e6*44*T*tf > 2^63 (the old wrap): T*tf >= ~2.1e11.
    (500, 25_000, 80, 3, 40),
    (1_000_000, 500_000_000, 700, 12, 90_000),
    (2_000_000, 1_000_000_000, 1000, 800, 50_000),   # 3.5e19 > 2^63
    (1_000_000_000, 500_000_000_000, 2000, 1500, 12_345_678),
    (10**11, 5 * 10**13, 5000, 4000, 9 * 10**9),     # the 100 TB regime
]


def test_spark_decimal_path_matches_bigint_exact(spark):
    rows = [
        {"N": n, "T": t, "dl": dl, "tf_0": tf, "df_0": df}
        for (n, t, dl, tf, df) in CASES
    ]
    df = spark.createDataFrame(rows).select(
        F.col("N").cast("long"),
        F.col("T").cast("long"),
        F.col("dl").cast("long"),
        F.col("tf_0").cast("long"),
        F.col("df_0").cast("long"),
    )
    got = [
        r.term
        for r in df.select(
            F.expr(_bm25_term_sql(0, engine="spark")).alias("term")
        ).collect()
    ]
    want = [_py_term(*c) for c in CASES]
    assert got == want
    # sanity: the boundary cases genuinely exceed the old int64 path
    assert any(10**6 * 44 * t * tf >= 2**63 for (_, t, _, tf, _) in CASES)


def test_duckdb_engine_text_matches_in_oracle_range(spark):
    small = [c for c in CASES if 10**6 * 44 * c[1] * c[3] < 2**63]
    assert small, "need at least one in-range case"
    con = duckdb.connect()
    for n, t, dl, tf, df in small:
        (dk,) = con.execute(
            f"SELECT {_bm25_term_sql(0, engine='duckdb')} FROM "
            f"(SELECT {n}::BIGINT AS N, {t}::BIGINT AS T, "
            f"{dl}::BIGINT AS dl, {tf}::BIGINT AS tf_0, "
            f"{df}::BIGINT AS df_0)"
        ).fetchone()
        assert dk == _py_term(n, t, dl, tf, df)
    con.close()
