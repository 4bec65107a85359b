"""Connected components over near-duplicate pair graphs.

Dedup pipelines need a CANONICAL document per duplicate *cluster*, not
just pairs: pairs (a,b), (b,c) must collapse to one keeper. That is
connected components, computed here with iterative min-label propagation:

    label(v) <- min(label(v), min over neighbors(label(u)))

repeated until fixpoint. Near-dup graphs have tiny diameters (clusters
are cliques or short chains), so the loop converges in a handful of
rounds; each round is one shuffle (join + groupBy on node). The driver
only reads a single convergence COUNT per round -- labels themselves
never leave the cluster. localCheckpoint truncates the growing lineage.
For planet-scale graphs swap in the large-star/small-star algorithm
(same API); for dedup clusters this propagation is the right cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    small_graph_edges: int = 1_000_000,
) -> DataFrame:
    """(node, component) where component = min node id reachable.

    ``edges`` is undirected input given as one direction; isolated nodes
    don't appear (callers union them in if needed).
    """
    # The union below traverses ``edges`` twice (once per direction);
    # persist first so an expensive upstream (e.g. a similarity join)
    # computes once, not twice.
    edges = edges.persist()
    sym = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
    sym = sym.distinct().persist()

    # Near-dup pair graphs are usually orders of magnitude smaller than
    # the corpus that produced them. Below the threshold, collapse to one
    # partition so each propagation round is a single-task job instead of
    # a full-width shuffle (pure scheduling overhead on tiny graphs);
    # above it, the loop stays distributed -- same plan, AQE-managed.
    n_edges = sym.count()  # also materializes the persist
    if n_edges <= small_graph_edges:
        sym = sym.coalesce(1)

    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .persist()
    )

    # Convergence check: labels only ever DECREASE under min-propagation,
    # so the label sum is strictly monotone and "sum unchanged" iff
    # "no label changed" -- a single aggregate on the already-materialized
    # round, replacing a third join per round.
    prev_sum = None
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy("a")
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.a, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
                ).alias("label"),
            )
            # Lazy checkpoint: the convergence aggregate right below is
            # the action that materializes it, so each round is ONE job
            # (eager=True would run a separate materialization job first).
            .localCheckpoint(eager=False)
        )
        label_sum = new_labels.agg(F.sum("label")).first()[0]
        labels.unpersist()
        labels = new_labels
        if label_sum == prev_sum:
            break
        prev_sum = label_sum
    sym.unpersist()
    return labels.select(F.col("node"), F.col("label").alias("component"))


def canonicalize_pairs(pairs: DataFrame, *, a: str = "doc_a", b: str = "doc_b") -> DataFrame:
    """(doc_id, canonical_id) for every doc appearing in a duplicate pair;
    canonical = smallest id in the component (the keeper)."""
    comp = connected_components(pairs, src=a, dst=b)
    return comp.select(
        F.col("node").alias("doc_id"), F.col("component").alias("canonical_id")
    )
