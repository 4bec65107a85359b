"""Large-star/small-star CC: equivalence with min-label propagation on
adversarial graph shapes (chains are the case label propagation is bad
at; cliques and stars are the near-dup shapes)."""

from __future__ import annotations

import pytest

import random

from abr_etl_spark.operators.graph import (
    connected_components,
    connected_components_star,
)


def _cc(spark, edges, fn):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {(r.node, r.component) for r in fn(df).collect()}


def _assert_same(spark, edges):
    a = _cc(spark, edges, connected_components)
    b = _cc(spark, edges, connected_components_star)
    assert a == b, (sorted(a - b)[:5], sorted(b - a)[:5])


@pytest.mark.slow
def test_star_long_chain(spark):
    # 40-node chain: diameter 39 -- the shape star-contraction wins on
    _assert_same(spark, [(i, i + 1) for i in range(40)])


def test_star_cliques_and_isolated_pairs(spark):
    edges = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    edges += [(10, 11), (20, 21)]
    edges += [(30 + a, 30 + b) for a in range(4) for b in range(a + 1, 4)]
    _assert_same(spark, edges)


def test_star_random_graph_matches_label_propagation(spark):
    rng = random.Random(42)
    nodes = list(range(120))
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(150)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    _assert_same(spark, edges)


def test_star_single_edge_and_self_contained(spark):
    _assert_same(spark, [(7, 3)])


def test_reliable_checkpoint_rounds(spark, tmp_path):
    """reliable_checkpoint=True must route per-round barriers to the
    session checkpoint dir (cluster fault tolerance) and produce the
    identical components as the local-checkpoint default."""
    import os

    spark.sparkContext.setCheckpointDir(str(tmp_path / "chk"))
    edges = [(1, 2), (2, 3), (10, 11)]
    base = _cc(spark, edges, connected_components)
    rel = _cc(
        spark,
        edges,
        lambda e: connected_components(e, reliable_checkpoint=True),
    )
    star_rel = _cc(
        spark,
        edges,
        lambda e: connected_components_star(e, reliable_checkpoint=True),
    )
    assert rel == base and star_rel == base
    chk = tmp_path / "chk"
    assert any(chk.rglob("*")), "no reliable checkpoint data written"
