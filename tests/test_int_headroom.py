"""DECIMAL(38,0) headroom for the r8 integer-product keys (r8 verdict
item 5): simpson_diversity, source_divergence_tv and term_lift_topk
carry their overflow-prone products in DECIMAL(38,0) on the Spark side
(the bm25 pattern, tests/test_bm25_decimal.py). Each formula must
(a) equal exact Python big-int arithmetic at stats far past 2^63, and
(b) stay bit-identical to the DuckDB-engine text in the shared
small-value range (the oracle's operating regime).
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from abr_etl_spark.plans.llm_pipeline6 import (
    _lift_e4_sql,
    _simpson_e6_sql,
    _tv_e6_sql,
)

# (n_tokens, s2): last rows have n_tokens^2 ~ 1e20..1e24 >> 2^63
SIMPSON_CASES = [
    (80, 400),
    (30_000, 2_000_000),
    (10**10, 10**15),
    (10**12, 7 * 10**20),
]

# (present_dev, src_t, corpus_t, present_ct): src_t*corpus_t to ~1e25
TV_CASES = [
    (1_000, 500, 10_000, 4_000),
    (10**6, 10**5, 10**7, 9 * 10**6),
    (10**22, 2 * 10**12, 2 * 10**13, 10**13),
    (5 * 10**24, 10**13, 9 * 10**13, 8 * 10**13),
]

# (n_ab, N, df_a, df_b): n_ab*N to ~1e21
LIFT_CASES = [
    (5, 1_000, 40, 60),
    (900, 10**6, 10**4, 2 * 10**4),
    (10**9, 10**12, 10**10, 3 * 10**10),
    (7 * 10**10, 10**11, 9 * 10**10, 8 * 10**10),
]


def _py_simpson(nt: int, s2: int) -> int:
    return (2 * (10**6 * (nt * nt - s2)) + nt * nt) // (2 * nt * nt)


def _py_tv(pd_: int, st: int, ct: int, pct: int) -> int:
    den = 2 * st * ct
    return (2 * (10**6 * (pd_ + st * (ct - pct))) + den) // (2 * den)


def _py_lift(nab: int, n: int, dfa: int, dfb: int) -> int:
    den = dfa * dfb
    return (2 * 10**4 * nab * n + den) // (2 * den)


def _spark_eval(spark, expr: str, schema_cols: list[str], case: tuple):
    sel = ", ".join(
        f"CAST('{v}' AS DECIMAL(38,0)) AS __d_{c}" if abs(v) >= 2**63
        else f"CAST({v} AS BIGINT) AS __d_{c}"
        for c, v in zip(schema_cols, case)
    )
    named = ", ".join(f"__d_{c} AS {c}" for c in schema_cols)
    return spark.sql(
        f"SELECT {expr} AS out FROM "
        f"(SELECT {named} FROM (SELECT {sel}))"
    ).collect()[0].out


def test_spark_decimal_paths_match_bigint_exact(spark):
    for case in SIMPSON_CASES:
        got = _spark_eval(
            spark, _simpson_e6_sql(engine="spark"), ["n_tokens", "s2"], case
        )
        assert got == _py_simpson(*case), case
    for case in TV_CASES:
        got = _spark_eval(
            spark,
            _tv_e6_sql(engine="spark"),
            ["present_dev", "src_t", "corpus_t", "present_ct"],
            case,
        )
        assert got == _py_tv(*case), case
    for case in LIFT_CASES:
        got = _spark_eval(
            spark,
            _lift_e4_sql(engine="spark"),
            ["n_ab", "N", "df_a", "df_b"],
            case,
        )
        assert got == _py_lift(*case), case
    # sanity: the boundary cases genuinely exceed int64
    assert any(nt * nt >= 2**63 for nt, _ in SIMPSON_CASES)
    assert any(st * ct >= 2**63 for _, st, ct, _ in TV_CASES)
    assert any(nab * n >= 2**63 for nab, n, _, _ in LIFT_CASES)


def test_duckdb_engine_texts_match_in_oracle_range():
    con = duckdb.connect()

    def run(expr, cols, case):
        sel = ", ".join(
            f"{v}::BIGINT AS {c}" for c, v in zip(cols, case)
        )
        return con.execute(f"SELECT {expr} FROM (SELECT {sel})").fetchone()[0]

    for case in SIMPSON_CASES[:2]:
        assert run(
            _simpson_e6_sql(engine="duckdb"), ["n_tokens", "s2"], case
        ) == _py_simpson(*case)
    for case in TV_CASES[:2]:
        assert run(
            _tv_e6_sql(engine="duckdb"),
            ["present_dev", "src_t", "corpus_t", "present_ct"],
            case,
        ) == _py_tv(*case)
    for case in LIFT_CASES[:2]:
        assert run(
            _lift_e4_sql(engine="duckdb"),
            ["n_ab", "N", "df_a", "df_b"],
            case,
        ) == _py_lift(*case)
    con.close()
