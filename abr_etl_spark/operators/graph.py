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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F




def _lineage_barrier(df: DataFrame, reliable: bool) -> DataFrame:
    """Per-round lineage truncation for the iterative loops.

    ``reliable=False`` (default): localCheckpoint -- blocks live on
    executors; fastest, right for local mode and for clusters where
    re-running the whole operator on a lost executor is acceptable.
    ``reliable=True``: RDD checkpoint to ``sc.setCheckpointDir`` storage
    (HDFS / object store) -- survives executor loss, the correct choice
    for long iterative jobs on a real cluster where a single lost
    executor mid-iteration would otherwise have NO lineage to recompute
    from (localCheckpoint deliberately severs it). Lazy either way: the
    convergence aggregate that follows each round is the materializing
    action, keeping one job per round.
    """
    if reliable:
        return df.checkpoint(eager=False)
    return df.localCheckpoint(eager=False)


def connected_components(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    small_graph_edges: int = 1_000_000,
    reliable_checkpoint: bool = False,
) -> DataFrame:
    """(node, component) where component = min node id reachable.

    ``edges`` is undirected input given as one direction; isolated nodes
    don't appear (callers union them in if needed).

    ``reliable_checkpoint``: per-round barriers go to the session's
    checkpoint dir instead of executor-local blocks (see
    ``_lineage_barrier`` -- set it on a real cluster where executor loss
    mid-iteration must not restart the whole operator; requires
    ``spark.sparkContext.setCheckpointDir(...)``).
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
    # NOTE: ``edges`` stays persisted deliberately -- it is the CALLER's
    # pair DataFrame (persist is not reference-counted, and an unpersist
    # here would evict a cache the caller may share across queries, e.g.
    # dedup_canonical / dedup_canonical_star reusing one verified pair
    # set). Callers own the returned/input pair cache lifecycle.
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
    converged = False
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy("a")
            .agg(F.min("label").alias("nlabel"))
        )
        propagated = labels.join(
            neighbor_min, labels.node == neighbor_min.a, "left"
        ).select(
            "node",
            F.least(
                F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
            ).alias("label"),
        )
        # Pointer jumping: also adopt label(label(v)). Neighbor
        # propagation alone moves the component min ONE hop per round
        # (O(diameter) rounds -- a 40-node chain silently exhausted the
        # old iteration cap); following the label's own label halves the
        # remaining distance each round, giving O(log diameter).
        new_labels = (
            propagated.alias("x")
            .join(
                propagated.select(
                    F.col("node").alias("lnode"), F.col("label").alias("llabel")
                ),
                F.col("x.label") == F.col("lnode"),
                "left",
            )
            .select(
                F.col("x.node").alias("node"),
                F.least(
                    F.col("x.label"),
                    F.coalesce(F.col("llabel"), F.col("x.label")),
                ).alias("label"),
            )
        )
        # Lazy barrier: the convergence aggregate right below is the
        # action that materializes it, so each round is ONE job
        # (eager=True would run a separate materialization job first).
        new_labels = _lineage_barrier(new_labels, reliable_checkpoint)
        label_sum = new_labels.agg(F.sum("label")).first()[0]
        labels.unpersist()
        labels = new_labels
        if label_sum == prev_sum:
            converged = True
            break
        prev_sum = label_sum
    sym.unpersist()
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            "raise max_iter (or use connected_components_star for "
            "high-diameter graphs)"
        )
    return labels.select(F.col("node"), F.col("label").alias("component"))


def connected_components_star(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    reliable_checkpoint: bool = False,
) -> DataFrame:
    """(node, component) via alternating large-star / small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond").

    The planet-scale alternative to min-label propagation: converges in
    O(log^2 n) rounds on ANY graph shape (label propagation needs
    O(diameter) rounds -- fine for near-dup clusters, ruinous for long
    chains), and each round is window + filter + distinct with NO
    per-node neighbor materialization (the window min replaces a
    collect_set, so hub nodes never build giant arrays).

    large-star(v): every neighbor u > v re-attaches to min(Γ(v) ∪ {v});
    small-star(v): every neighbor u <= v (and v itself) attaches to it.
    Fixpoint = the edge set is a union of stars rooted at component
    minima; the root's own row (root, root) then labels every node.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .where(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    w = Window.partitionBy("a")

    def _round(e: DataFrame, large: bool) -> DataFrame:
        # The star operations see the edge set as UNDIRECTED: every edge
        # is processed from both endpoints, so re-symmetrize the (u -> m)
        # output of the previous round before grouping by center.
        bi = (
            e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
            .where(F.col("a") != F.col("b"))
            .distinct()
        )
        withmin = bi.withColumn("m", F.least(F.min("b").over(w), F.col("a")))
        cond = F.col("b") > F.col("a") if large else F.col("b") <= F.col("a")
        moved = withmin.where(cond).select(
            F.col("b").alias("a"), F.col("m").alias("b")
        )
        self_edge = withmin.select(F.col("a"), F.col("m").alias("b"))
        out = (
            moved.union(self_edge)
            .where(F.col("a") != F.col("b"))
            .distinct()
        )
        return _lineage_barrier(out, reliable_checkpoint)

    cur = sym
    prev_sig = None
    converged = False
    for _ in range(max_iter):
        cur = _round(_round(cur, large=True), large=False)
        # One aggregate = (count, order-independent hash) convergence
        # signature; the edge set is a fixpoint iff it stopped changing.
        # bit_xor: order-independent and overflow-free under ANSI mode
        # (sum of hashes overflows BIGINT); the edge set is distinct so
        # XOR cancellation of duplicates cannot occur.
        row = cur.agg(
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(a, b))").alias("h"),
        ).first()
        sig = (row["n"], row["h"])
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    if not converged:
        # Same contract as connected_components: never return
        # possibly-wrong labels silently when the cap is exhausted.
        sym.unpersist()
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} "
            "star rounds; raise max_iter"
        )
    labels = (
        cur.union(cur.select(F.col("b").alias("a"), F.col("b").alias("b")))
        .groupBy("a")
        .agg(F.min("b").alias("component"))
        .select(F.col("a").alias("node"), "component")
    )
    sym.unpersist()
    return labels


def canonicalize_pairs(pairs: DataFrame, *, a: str = "doc_a", b: str = "doc_b") -> DataFrame:
    """(doc_id, canonical_id) for every doc appearing in a duplicate pair;
    canonical = smallest id in the component (the keeper)."""
    comp = connected_components(pairs, src=a, dst=b)
    return comp.select(
        F.col("node").alias("doc_id"), F.col("component").alias("canonical_id")
    )


def resolve_chains(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    max_depth: int = 64,
    reliable_checkpoint: bool = False,
) -> DataFrame:
    """Resolve every node of a FUNCTIONAL replacement graph to its
    terminal successor by pointer doubling (the Replacedabn ask,
    r14 verdict item 2: historical ABN -> current ABN).

    ``edges`` holds one row per replacement: ``src`` (the replaced /
    historical id) -> ``dst`` (its immediate successor). PRECONDITION:
    functional -- each ``src`` appears at most once (an id is replaced
    by exactly one successor); duplicate srcs would multiply rows in
    the doubling joins. Self-loops need no special casing: a
    self-replacement is a 1-cycle and reports as one.

    Returns one row per input ``src``:
      (src, current, depth, is_cycle)
    - resolved walks (terminal reached within ``max_depth`` hops):
      current = the terminal id (never itself replaced), depth = exact
      hop count, is_cycle = false;
    - walks still inside the graph after ``max_depth`` hops -- true
      cycles, walks that ENTER a cycle, or chains longer than the cap
      -- report (NULL, NULL, true): never a silently wrong answer.
      ``max_depth`` should be a power of two (coverage is exactly
      2^ceil(log2(max_depth)) hops); real registry replacement chains
      are bounded by years of operation, so the default 64 is generous.

    Scale shape: ceil(log2(max_depth)) self-joins of the |edges|-sized
    pointer table -- O(E log D) total shuffle instead of the naive
    O(E * D) iteration; the driver reads ONE monotone convergence
    aggregate per round (depth-sum, strictly increasing while any
    pointer advances) and exits early once every walk has terminated.
    Lineage is truncated per round (``_lineage_barrier``).

    Reference parity: Replacedabn is the one routed dataset
    (sources/abr_schemas.py, load.go:45-64) whose natural query is
    chain resolution; SURVEY.md S2.A.
    """
    import math

    rounds = max(1, math.ceil(math.log2(max(2, max_depth))))
    e = edges.select(
        F.col(src).alias("node"), F.col(dst).alias("cur")
    ).persist()
    # Enforce the functional precondition instead of documenting it
    # (r15 ADVICE): a duplicate src would silently MULTIPLY rows through
    # the doubling joins. One scalar aggregate over the (now-cached)
    # pointer table -- cheap next to the log-depth join rounds.
    guard = e.agg(
        F.count("*").alias("__n"),
        F.count_distinct("node").alias("__nd"),
    ).first()
    if guard["__n"] != guard["__nd"]:
        raise ValueError(
            "resolve_chains: edges must be functional (each src replaced "
            f"by exactly one dst); got {guard['__n']} rows over "
            f"{guard['__nd']} distinct src keys"
        )
    ptr = e.withColumn("depth", F.lit(1).cast("long"))
    prev_sum = None
    for _ in range(rounds):
        hop = ptr.select(
            F.col("node").alias("__n2"),
            F.col("cur").alias("__c2"),
            F.col("depth").alias("__d2"),
        )
        ptr = ptr.join(hop, ptr.cur == hop.__n2, "left").select(
            "node",
            F.coalesce("__c2", "cur").alias("cur"),
            (F.col("depth") + F.coalesce("__d2", F.lit(0))).alias(
                "depth"
            ),
        )
        ptr = _lineage_barrier(ptr, reliable_checkpoint)
        depth_sum = ptr.agg(F.sum("depth")).first()[0]
        if depth_sum == prev_sum:
            break  # every walk terminal: remaining rounds are no-ops
        prev_sum = depth_sum
    # Sever heads' lineage from the cached edge table EAGERLY before
    # releasing the cache (r15 ADVICE: a lazy unpersist here released
    # the blocks ahead of the final join, so the cache never benefited
    # the returned plan). ptr's lineage was already truncated by the
    # last round's barrier + convergence aggregate.
    heads = _lineage_barrier(
        e.select(F.col("node").alias("__h")).distinct(),
        reliable_checkpoint,
    )
    heads.count()  # materialize the barrier; e is now unreferenced
    out = ptr.join(heads, ptr.cur == heads.__h, "left").select(
        F.col("node").alias("src"),
        F.when(F.col("__h").isNull(), F.col("cur")).alias("current"),
        F.when(F.col("__h").isNull(), F.col("depth")).alias("depth"),
        F.col("__h").isNotNull().alias("is_cycle"),
    )
    e.unpersist()
    return out
