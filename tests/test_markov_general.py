"""The r15 generalization contracts.

1. functions/markov.py at k=2 with the legacy names REDUCES to the
   r14 hand-written markov_attribution constants: byte-identical text
   for every expression except __bnum's two commuted DOUBLE factors,
   and bit-for-bit identical VALUES everywhere (2-operand IEEE
   multiply is commutative), swept over randomized and degenerate
   counter grids in DuckDB.
2. markov_attribution_k (k=4) report invariants.
3. quantile_merge_by_source's '__ALL__' row, computed only from the
   per-source registers, equals the direct single-pass sketch of the
   whole corpus exactly -- the hll_merge_by_type mergeability
   contract.
"""

from __future__ import annotations

import duckdb
import pytest

from abr_etl_spark.functions import markov
from tests.conftest import SF_ORACLE

# The r14 hand-written constants, FROZEN at their pre-generator text
# (commit 45c2dfb's analytics14.py) -- the reduction target.
_R14 = {
    "d": (
        "(CAST(na_eff AS DOUBLE) * CAST(nb_eff AS DOUBLE)"
        " - CAST(n_ab AS DOUBLE) * CAST(n_ba AS DOUBLE))"
    ),
    "anum": (
        "(CAST(n_ac AS DOUBLE) * CAST(nb_eff AS DOUBLE)"
        " + CAST(n_ab AS DOUBLE) * CAST(n_bc AS DOUBLE))"
    ),
    "bnum": (
        "(CAST(n_bc AS DOUBLE) * CAST(na_eff AS DOUBLE)"
        " + CAST(n_ba AS DOUBLE) * CAST(n_ac AS DOUBLE))"
    ),
    "u": (
        "(CAST(n_sa AS DOUBLE) * __anum + CAST(n_sb AS DOUBLE) * __bnum"
        " + CAST(n_sc AS DOUBLE) * __d)"
    ),
    "va": (
        "(CAST(n_sb AS DOUBLE) * CAST(n_bc AS DOUBLE)"
        " + CAST(n_sc AS DOUBLE) * CAST(nb_eff AS DOUBLE))"
    ),
    "vb": (
        "(CAST(n_sa AS DOUBLE) * CAST(n_ac AS DOUBLE)"
        " + CAST(n_sc AS DOUBLE) * CAST(na_eff AS DOUBLE))"
    ),
}
_R14_RATIO_A = "(__va * __d / (CAST(nb_eff AS DOUBLE) * __u))"
_R14_RATIO_B = "(__vb * __d / (CAST(na_eff AS DOUBLE) * __u))"
_R14_RE_A = f"(CAST(1 AS DOUBLE) - {_R14_RATIO_A})"
_R14_RE_B = f"(CAST(1 AS DOUBLE) - {_R14_RATIO_B})"
_R14_RE_SUM = f"({_R14_RE_A} + {_R14_RE_B})"
_R14_REMOVAL_A = (
    "CASE WHEN __u > 0 AND __d > 0 THEN "
    f"CAST(floor({_R14_RE_A} * 1000000 + 0.5) AS BIGINT) END"
)
_R14_REMOVAL_B = (
    "CASE WHEN __u > 0 AND __d > 0 THEN "
    f"CAST(floor({_R14_RE_B} * 1000000 + 0.5) AS BIGINT) END"
)
_R14_CREDIT_A = (
    f"CASE WHEN __u > 0 AND __d > 0 AND {_R14_RE_SUM} > 0 THEN "
    f"CAST(floor({_R14_RE_A} / {_R14_RE_SUM} * 1000000 + 0.5)"
    " AS BIGINT) END"
)
_R14_CREDIT_B = (
    f"CASE WHEN __u > 0 AND __d > 0 AND {_R14_RE_SUM} > 0 THEN "
    f"CAST(floor({_R14_RE_B} / {_R14_RE_SUM} * 1000000 + 0.5)"
    " AS BIGINT) END"
)
_R14_P_CONV = (
    "CASE WHEN n_s > 0 AND __d > 0 THEN CAST(floor("
    "__u / (CAST(n_s AS DOUBLE) * __d) * 1000000 + 0.5) AS BIGINT)"
    " WHEN n_s > 0 THEN CAST(floor(CAST(n_sc AS DOUBLE)"
    " / CAST(n_s AS DOUBLE) * 1000000 + 0.5) AS BIGINT) END"
)


@pytest.fixture(scope="module")
def gen():
    return markov.mk_attr_exprs(markov.legacy_two_channel_names())


def test_k2_text_reduces_to_r14_constants(gen):
    assert gen["d"] == _R14["d"]
    assert gen["num"][0] == _R14["anum"]
    assert gen["u"] == _R14["u"]
    assert gen["v"][0] == _R14["va"]
    assert gen["v"][1] == _R14["vb"]
    assert gen["removal"][0] == _R14_REMOVAL_A
    assert gen["removal"][1] == _R14_REMOVAL_B
    assert gen["credit"][0] == _R14_CREDIT_A
    assert gen["credit"][1] == _R14_CREDIT_B
    assert gen["p_conv"] == _R14_P_CONV


def test_k2_bnum_is_the_commuted_twin(gen):
    # the ONE textual divergence: both factors of both terms commute.
    # a*b == b*a bit-for-bit in IEEE double, so values are unchanged.
    assert gen["num"][1] == (
        "(CAST(na_eff AS DOUBLE) * CAST(n_bc AS DOUBLE)"
        " + CAST(n_ac AS DOUBLE) * CAST(n_ba AS DOUBLE))"
    )
    # same multiset of factor pairs as the frozen text
    def pairs(text):
        terms = text[1:-1].split(" + ")
        return {
            frozenset(t.split(" * ")) for t in terms
        }

    assert pairs(gen["num"][1]) == pairs(_R14["bnum"])


def _report_sql(d, anum, bnum, u, va, vb, ra, rb, ca, cb, pc) -> str:
    """The full r14 staging pipeline over a literal counter row."""
    return f"""
        WITH counts AS (SELECT * FROM grid), mid00 AS (
            SELECT *, n_ab + n_ac + n_an AS n_a,
                   n_ba + n_bc + n_bn AS n_b,
                   n_sa + n_sb + n_sc AS n_s
            FROM counts
        ), mid0 AS (
            SELECT *, CASE WHEN n_a > 0 THEN n_a ELSE 1 END AS na_eff,
                   CASE WHEN n_b > 0 THEN n_b ELSE 1 END AS nb_eff
            FROM mid00
        ), mid1 AS (
            SELECT *, {d} AS __d, {anum} AS __anum, {bnum} AS __bnum,
                   {va} AS __va, {vb} AS __vb
            FROM mid0
        ), mid AS (SELECT *, {u} AS __u FROM mid1)
        SELECT gid, {ra} AS ra, {rb} AS rb, {ca} AS ca, {cb} AS cb,
               {pc} AS pc
        FROM mid ORDER BY gid
    """


def test_k2_values_bit_for_bit_on_counter_sweep(gen):
    """Old text vs generated text over 2000 pseudorandom counter rows
    plus the degenerate corners (zero conversions, unused channels,
    empty chain): the e6 BIGINT reports must be IDENTICAL."""
    con = duckdb.connect()
    con.execute("""
        CREATE TABLE grid AS
        WITH r AS (
            SELECT i AS gid,
              CAST(hash(i * 11 + 1) % 1000 AS BIGINT) AS n_sa,
              CAST(hash(i * 11 + 2) % 1000 AS BIGINT) AS n_sb,
              CAST(hash(i * 11 + 3) % 100 AS BIGINT) AS n_sc,
              CAST(hash(i * 11 + 4) % 500 AS BIGINT) AS n_ab,
              CAST(hash(i * 11 + 5) % 100 AS BIGINT) AS n_ac,
              CAST(hash(i * 11 + 6) % 500 AS BIGINT) AS n_an,
              CAST(hash(i * 11 + 7) % 500 AS BIGINT) AS n_ba,
              CAST(hash(i * 11 + 8) % 100 AS BIGINT) AS n_bc,
              CAST(hash(i * 11 + 9) % 500 AS BIGINT) AS n_bn
            FROM range(2000) t(i)
        )
        SELECT * FROM r
        UNION ALL SELECT 9001, 0,0,0, 0,0,0, 0,0,0
        UNION ALL SELECT 9002, 5,0,0, 0,0,5, 0,0,0
        UNION ALL SELECT 9003, 5,0,2, 0,3,2, 0,0,0
        UNION ALL SELECT 9004, 0,7,1, 0,0,0, 0,2,5
        UNION ALL SELECT 9005, 3,3,0, 3,0,0, 3,0,0
    """)
    old = con.sql(
        _report_sql(
            _R14["d"], _R14["anum"], _R14["bnum"], _R14["u"],
            _R14["va"], _R14["vb"], _R14_REMOVAL_A, _R14_REMOVAL_B,
            _R14_CREDIT_A, _R14_CREDIT_B, _R14_P_CONV,
        )
    ).fetchall()
    new = con.sql(
        _report_sql(
            gen["d"], gen["num"][0], gen["num"][1], gen["u"],
            gen["v"][0], gen["v"][1], gen["removal"][0],
            gen["removal"][1], gen["credit"][0], gen["credit"][1],
            gen["p_conv"],
        )
    ).fetchall()
    assert old == new
    con.close()


def test_k4_report_invariants(spark):
    from abr_etl_spark.plans.analytics15 import (
        MKK_CHANNELS,
        markov_attribution_k,
    )

    rows = {
        r["channel"]: r
        for r in markov_attribution_k(spark, SF_ORACLE).collect()
    }
    assert sorted(rows) == MKK_CHANNELS
    pcs = {r["p_conv_e6"] for r in rows.values()}
    assert len(pcs) == 1  # one chain, one conversion probability
    (pc,) = pcs
    assert 0 < pc <= 1_000_000
    credits = [r["credit_e6"] for r in rows.values()]
    if all(c is not None for c in credits):
        # credits are half-up shares of the removal-effect mass
        assert abs(sum(credits) - 1_000_000) <= len(credits)
    for r in rows.values():
        assert r["n_from"] >= 0
        if r["removal_e6"] is not None:
            assert 0 <= r["removal_e6"] <= 1_000_000


def _k3_names() -> markov.MkNames:
    return markov.MkNames(
        ne=[f"ne{i}" for i in range(3)],
        ns=[f"n_s{i}" for i in range(3)],
        nc=[f"n_c{i}" for i in range(3)],
        nt={
            (i, j): f"n_t{i}{j}"
            for i in range(3)
            for j in range(3)
            if i != j
        },
    )


_K3_STAGE = """
        mid00 AS (SELECT *,
                  n_t01 + n_t02 + n_c0 + n_x0 AS n_o0,
                  n_t10 + n_t12 + n_c1 + n_x1 AS n_o1,
                  n_t20 + n_t21 + n_c2 + n_x2 AS n_o2,
                  n_s0 + n_s1 + n_s2 + n_sc AS n_s FROM counts),
        mid0 AS (SELECT *,
                 CASE WHEN n_o0 > 0 THEN n_o0 ELSE 1 END AS ne0,
                 CASE WHEN n_o1 > 0 THEN n_o1 ELSE 1 END AS ne1,
                 CASE WHEN n_o2 > 0 THEN n_o2 ELSE 1 END AS ne2
                 FROM mid00)
"""


def test_k3_closed_subcycle_zeroes_det_and_reports_null():
    """A closed 1<->2 sub-cycle (those channels never exit) zeroes the
    FULL determinant -- the M-matrix argument in functions/markov.py:
    a singular removal subsystem cannot coexist with det > 0. The
    report must degrade to NULL removal/credit with the n_sc/n_s
    conversion fallback, never a division blowup."""
    x = markov.mk_attr_exprs(_k3_names())
    con = duckdb.connect()
    lits = {
        "n_s0": 5, "n_s1": 3, "n_s2": 0, "n_sc": 1,
        "n_t01": 0, "n_t02": 0, "n_t10": 0, "n_t12": 4,
        "n_t20": 0, "n_t21": 4, "n_c0": 3, "n_c1": 0, "n_c2": 0,
        "n_x0": 2, "n_x1": 0, "n_x2": 0,
    }
    sel = ", ".join(f"CAST({v} AS BIGINT) AS {k}" for k, v in lits.items())
    nums = ", ".join(f"{x['num'][i]} AS __num{i}" for i in range(3))
    vs = ", ".join(f"{x['v'][i]} AS __v{i}" for i in range(3))
    row = con.sql(f"""
        WITH counts AS (SELECT {sel}), {_K3_STAGE},
        mid1 AS (SELECT *, {x['d']} AS __d, {nums}, {vs} FROM mid0),
        mid AS (SELECT *, {x['u']} AS __u FROM mid1)
        SELECT __d, {x['removal'][0]} AS r0, {x['credit'][0]} AS c0,
               {x['p_conv']} AS pc
        FROM mid
    """).fetchone()
    d, r0, c0, pc = row
    assert d == 0.0  # the closed sub-cycle zeroes the full det
    assert r0 is None and c0 is None
    # fallback: n_sc / n_s = 1/9 in e6 half-up
    assert pc == 111111
    con.close()


def test_k3_det_positive_implies_removal_dets_positive():
    """Numeric evidence for the M-matrix guard reduction: over random
    k=3 counter grids, every row with __d > 0 has ALL three removal
    subsystem dets > 0 (so the single `__d > 0` guard is sufficient at
    any k, exactly as at k=2)."""
    x = markov.mk_attr_exprs(_k3_names())
    con = duckdb.connect()
    bad = con.sql(f"""
        WITH counts AS (
            SELECT
              CAST(hash(i * 17 + 1) % 50 AS BIGINT) AS n_s0,
              CAST(hash(i * 17 + 2) % 50 AS BIGINT) AS n_s1,
              CAST(hash(i * 17 + 3) % 50 AS BIGINT) AS n_s2,
              CAST(hash(i * 17 + 4) % 10 AS BIGINT) AS n_sc,
              CAST(hash(i * 17 + 5) % 20 AS BIGINT) AS n_t01,
              CAST(hash(i * 17 + 6) % 20 AS BIGINT) AS n_t02,
              CAST(hash(i * 17 + 7) % 20 AS BIGINT) AS n_t10,
              CAST(hash(i * 17 + 8) % 20 AS BIGINT) AS n_t12,
              CAST(hash(i * 17 + 9) % 20 AS BIGINT) AS n_t20,
              CAST(hash(i * 17 + 10) % 20 AS BIGINT) AS n_t21,
              CAST(hash(i * 17 + 11) % 5 AS BIGINT) AS n_c0,
              CAST(hash(i * 17 + 12) % 5 AS BIGINT) AS n_c1,
              CAST(hash(i * 17 + 13) % 5 AS BIGINT) AS n_c2,
              CAST(hash(i * 17 + 14) % 5 AS BIGINT) AS n_x0,
              CAST(hash(i * 17 + 15) % 5 AS BIGINT) AS n_x1,
              CAST(hash(i * 17 + 16) % 5 AS BIGINT) AS n_x2
            FROM range(5000) t(i)
        ), {_K3_STAGE}
        SELECT count(*) FROM mid0
        WHERE {x['d']} > 0
          AND ({x['dr'][0]} <= 0 OR {x['dr'][1]} <= 0
               OR {x['dr'][2]} <= 0)
    """).fetchone()[0]
    assert bad == 0
    con.close()


def test_quantile_merge_equals_single_pass(spark):
    """The mergeability contract: the '__ALL__' row (computed only
    from per-source registers) must equal a DIRECT single-pass sketch
    of the union -- same n, same interpolated p50/p90, exactly."""
    from pyspark.sql import functions as F

    from abr_etl_spark.plans.analytics15 import (
        Q_GRID,
        quantile_merge_by_source,
    )
    from abr_etl_spark.sources.lake import load_table

    merged = {
        r["scope"]: r
        for r in quantile_merge_by_source(spark, SF_ORACLE).collect()
    }
    allrow = merged["__ALL__"]
    # direct single-pass sketch over the whole corpus, no scopes
    d = load_table(spark, SF_ORACLE, "documents").select(
        F.expr(f"n_chars DIV {Q_GRID}").alias("bucket")
    )
    regs = sorted(
        (r["bucket"], r["cnt"])
        for r in d.groupBy("bucket")
        .agg(F.count("*").alias("cnt"))
        .collect()
    )
    n = sum(c for _, c in regs)
    assert allrow["n_rows"] == n

    def pct(p_e4: int) -> int:
        t = (n - 1) * p_e4
        k, f = divmod(t, 10000)
        def bucket_at(r):
            cum = 0
            for b, c in regs:
                cum += c
                if cum >= r + 1:
                    return b
            raise AssertionError("rank out of range")
        bk = bucket_at(k)
        bk1 = bucket_at(min(k + 1, n - 1))
        return Q_GRID * (bk * 10000 + f * (bk1 - bk))

    assert allrow["p50_e4"] == pct(5000)
    assert allrow["p90_e4"] == pct(9000)
    # and every per-source row is itself replayable from its register
    assert len(merged) == 21  # 20 sources + __ALL__


def test_quantile_grid_sweep_invariants(spark):
    """Coarser grids cost fewer registers; every grid's p50/p90 is
    within one grid width BELOW the exact percentile (members are
    priced at their bucket's lower edge, so the sketch never
    over-reports)."""
    from abr_etl_spark.plans.analytics15 import quantile_grid_sweep
    from abr_etl_spark.sources.lake import load_table

    rows = {
        r["grid"]: r for r in quantile_grid_sweep(spark, SF_ORACLE).collect()
    }
    grids = sorted(rows)
    for a, b in zip(grids, grids[1:]):
        assert rows[a]["n_buckets"] >= rows[b]["n_buckets"]
    vals = sorted(
        r["n_chars"]
        for r in load_table(spark, SF_ORACLE, "documents")
        .select("n_chars")
        .collect()
    )
    n = len(vals)
    for p_e4, col in ((5000, "p50_e4"), (9000, "p90_e4")):
        t = (n - 1) * p_e4
        k, f = divmod(t, 10000)
        exact_e4 = vals[k] * 10000 + f * (vals[min(k + 1, n - 1)] - vals[k])
        for g in grids:
            got = rows[g][col]
            assert got <= exact_e4  # lower-edge pricing never overshoots
            assert exact_e4 - got < g * 10000  # within one grid width
