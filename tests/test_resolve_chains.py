"""resolve_chains (operators/graph.py) + the abn_current plan key.

The functional-graph pointer-doubling contracts: exact depths, cycle
and self-replacement flagging, the max_depth cap boundary (a chain of
exactly the cap resolves; one hop longer flags), and the synthesized
Replacedabn workload's structure invariants.
"""

from __future__ import annotations

import pytest

from abr_etl_spark.operators.graph import resolve_chains
from tests.conftest import SF_ORACLE


def _resolve(spark, edges, **kw):
    df = spark.createDataFrame(edges, ["src", "dst"])
    return {
        r["src"]: (r["current"], r["depth"], r["is_cycle"])
        for r in resolve_chains(df, **kw).collect()
    }


def test_simple_chain_exact_depths(spark):
    # 3 -> 2 -> 1 -> 0 (terminal)
    out = _resolve(spark, [(3, 2), (2, 1), (1, 0)])
    assert out == {
        3: (0, 3, False),
        2: (0, 2, False),
        1: (0, 1, False),
    }


def test_self_replacement_is_a_cycle(spark):
    out = _resolve(spark, [(5, 5), (1, 0)])
    assert out[5] == (None, None, True)
    assert out[1] == (0, 1, False)


def test_two_cycle_and_entering_chain(spark):
    # 9 -> 6 <-> 7: the cycle AND the walk that enters it both flag
    out = _resolve(spark, [(6, 7), (7, 6), (9, 6)])
    assert out[6] == (None, None, True)
    assert out[7] == (None, None, True)
    assert out[9] == (None, None, True)


def test_converging_chains(spark):
    # two historical ids replaced by the same successor
    out = _resolve(spark, [(10, 1), (20, 1), (1, 0)])
    assert out[10] == (0, 2, False)
    assert out[20] == (0, 2, False)
    assert out[1] == (0, 1, False)


@pytest.mark.parametrize("cap,length,resolves", [
    (8, 8, True),   # chain of exactly the cap resolves...
    (8, 9, False),  # ...one hop longer reports unresolved/cycle
])
def test_max_depth_cap_boundary(spark, cap, length, resolves):
    edges = [(i, i - 1) for i in range(1, length + 1)]
    out = _resolve(spark, edges, max_depth=cap)
    top = out[length]
    if resolves:
        assert top == (0, length, False)
    else:
        assert top == (None, None, True)
    # shorter suffixes of the same chain always resolve
    assert out[1] == (0, 1, False)
    assert out[min(cap, length - 1)] == (0, min(cap, length - 1), False)


def test_abn_current_structure(spark):
    """The synthesized Replacedabn workload: depths {1,2,3} on the
    r=1,2,3 chains, cycles exactly on r=5 (self) and r=6,7 (2-cycle),
    and every resolved current lands on an r=0 terminal."""
    from abr_etl_spark.plans.etl_parity import q_abn_current

    rows = q_abn_current(spark, SF_ORACLE).collect()
    assert rows  # non-empty
    for r in rows:
        m = r["abn"] % 8
        if m in (1, 2, 3):
            assert not r["is_cycle"]
            assert r["depth"] == m
            assert r["current_abn"] == r["abn"] - m
            assert r["current_abn"] % 8 == 0
        else:
            assert m in (5, 6, 7)
            assert r["is_cycle"]
            assert r["current_abn"] is None and r["depth"] is None


def test_duplicate_src_fails_loudly(spark):
    # r15 ADVICE: a non-functional graph (one src replaced by TWO dsts)
    # must raise, not silently multiply rows through the doubling joins.
    df = spark.createDataFrame([(1, 2), (1, 3), (2, 0)], ["src", "dst"])
    with pytest.raises(ValueError, match="functional"):
        resolve_chains(df)
