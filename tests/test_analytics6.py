"""Part-6 queries vs the DuckDB oracle, plus the plan/structure
properties the value oracle can't see (no-exchange bucketed join,
frontier monotonicity, window shapes)."""

import pytest
from pyspark.sql import functions as F

from abr_etl_spark.plans import analytics6 as a6
from tests.conftest import SF_ORACLE, assert_matches_oracle


@pytest.mark.parametrize("key", sorted(a6.QUERIES))
def test_analytics6_vs_oracle(spark, ddb, key):
    df = a6.QUERIES[key](spark, SF_ORACLE)
    assert_matches_oracle(df, ddb, a6.ORACLES[key], key)


def test_triangle_counts_are_consistent(spark):
    """Sum of per-vertex counts is 3x the number of triangles (each
    triangle credits exactly its three vertices)."""
    out = a6.triangle_count(spark, SF_ORACLE)
    total = out.agg(F.sum("n_triangles").alias("s")).first()["s"]
    assert total is not None and total % 3 == 0 and total > 0


def test_bfs_reachability_grows_with_hops(spark, monkeypatch):
    """A 1-hop reachable set can never exceed the 3-hop set."""
    out3 = {
        r["seed"]: r["n_reachable"]
        for r in a6.reachability_bfs(spark, SF_ORACLE).collect()
    }
    monkeypatch.setattr(a6, "BFS_HOPS", 1)
    out1 = {
        r["seed"]: r["n_reachable"]
        for r in a6.reachability_bfs(spark, SF_ORACLE).collect()
    }
    assert out1 and all(out1[s] <= out3[s] for s in out1)


def test_markov_rows_sum_to_one(spark):
    """Each cur's transition probabilities sum to ~1 (1e-4 units,
    rounding slack <= half a unit per destination)."""
    out = a6.markov_transitions(spark, SF_ORACLE)
    sums = (
        out.groupBy("cur")
        .agg(F.sum("p_e4").alias("s"), F.count("*").alias("k"))
        .collect()
    )
    assert sums and all(abs(r["s"] - 10000) <= r["k"] for r in sums)


def test_skyline_is_mutually_nondominated(spark):
    """No frontier point dominates another frontier point."""
    rows = a6.skyline_pareto(spark, SF_ORACLE).collect()
    by_brand: dict[str, list] = {}
    for r in rows:
        by_brand.setdefault(r["p_brand"], []).append(r)
    assert rows
    for pts in by_brand.values():
        for p in pts:
            for q in pts:
                dominated = (
                    q["price_c"] < p["price_c"] and q["p_size"] >= p["p_size"]
                ) or (
                    q["price_c"] <= p["price_c"] and q["p_size"] > p["p_size"]
                )
                assert not dominated


def test_interval_coverage_bounds(spark):
    """Every merged island spans at least one full interval, so covered
    time >= n_intervals * interval length."""
    rows = a6.interval_coverage(spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert r["covered_s"] >= r["n_intervals"] * a6.COVERAGE_INTERVAL_S


def test_bucketed_join_plan_has_no_join_exchange(spark):
    """Once both sides are bucketed on the join key, the JOIN inputs
    need zero shuffle -- the only Exchange left is the post-join
    aggregate's. (Broadcast disabled so the planner exercises the
    bucketed path, as it would at real scale.)"""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = a6.bucketed_join_revenue(spark, SF_ORACLE)
        df.collect()
        plan = (
            df._jdf.queryExecution()
            .executedPlan()
            .toString()
            .split("== Initial Plan ==")[0]
        )
        assert "Bucketed: true" in plan, plan
        assert plan.count("Exchange hashpartitioning") <= 1, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_asof_interpolate_within_neighbor_bounds(spark):
    """Every interpolated value must lie within [min, max] of that
    user's view values (convex combination of two neighbors), and a
    purchase sharing a second with a view must return that view's value
    exactly."""
    from pyspark.sql import functions as F

    from abr_etl_spark.sources.lake import load_table
    from tests.conftest import SF_ORACLE

    out = a6.asof_interpolate(spark, SF_ORACLE)
    e = load_table(spark, SF_ORACLE, "events")
    bounds = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    )
    violations = (
        out.where(F.col("v_interp").isNotNull())
        .join(bounds, "user_id")
        .where(
            (F.col("v_interp") < F.col("lo") - 1e-9)
            | (F.col("v_interp") > F.col("hi") + 1e-9)
        )
        .count()
    )
    assert violations == 0
    # exact-match property on a planted same-second pair
    views = e.where(F.col("event_type") == "view").select(
        "user_id", F.col("ts").cast("long").alias("ts_s"),
        F.col("value").alias("vv"), F.col("event_id").alias("veid"),
    )
    exact = (
        out.join(views, ["user_id", "ts_s"])
        .groupBy("user_id", "ts_s", "v_interp")
        .agg(F.expr("max_by(vv, veid)").alias("vv"))
    )
    mismatches = exact.where(
        F.abs(F.col("v_interp") - F.round(F.col("vv"), 4)) > 1e-9
    ).count()
    assert mismatches == 0
