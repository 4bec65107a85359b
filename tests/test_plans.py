"""Plan-shape assertions: the scale properties SURVEY.md §4 promises.

These read the physical plan, not timings -- a pushed filter or a
broadcast join holds at any scale factor."""

import pytest
from pyspark.sql import functions as F

from abr_etl_spark.operators import delta
from abr_etl_spark.plans import analytics
from abr_etl_spark.sources.lake import load_table
from tests.conftest import SF_ORACLE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    l = load_table(spark, SF_ORACLE, "lineitem").where(
        F.col("l_shipdate") <= "1998-09-02"
    ).select("l_returnflag", "l_quantity")
    plan = _plan(l)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_column_pruning_reaches_scan(spark):
    df = analytics.q1_pricing_summary(spark, SF_ORACLE)
    plan = _plan(df)
    # the scan must not read columns q1 doesn't touch
    assert "l_orderkey" not in plan.split("ReadSchema")[1].split("\n")[0]
    assert "l_comment" not in plan


def test_dim_joins_are_broadcast(spark):
    plan = _plan(analytics.q5_local_supplier(spark, SF_ORACLE))
    assert plan.count("BroadcastHashJoin") >= 3
    # the fact-fact join may be broadcast at this SF; what matters is no
    # cartesian and no nested loop on the fact side
    assert "CartesianProduct" not in plan


def test_q1_stays_in_wholestage_codegen(spark):
    df = analytics.q1_pricing_summary(spark, SF_ORACLE)
    # AQE keeps executedPlan un-finalized until run; the codegen explain
    # compiles subtrees regardless.
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "codegen"
    )
    assert "WholeStageCodegen" in plan
    assert "BatchEvalPython" not in plan  # no Python in the hot path


def test_delta_join_projects_only_key_and_hash(spark):
    """The CDC classify join must shuffle (key, hash), not payload."""
    new, old = (
        load_table(spark, SF_ORACLE, "orders"),
        load_table(spark, SF_ORACLE, "orders"),
    )
    classified = delta.delta_classify(new, old, "o_orderkey")
    opt = _optimized(classified)
    # payload columns are folded into xxhash64 before the join
    assert "xxhash64" in opt
    join_section = opt.split("Join")[1]
    assert "o_totalprice" not in join_section.split("Project")[0]


def test_sessionize_single_exchange(spark):
    """lag + cumulative-sum + groupBy share one hash partitioning."""
    plan = _plan(analytics.sessionize(spark, SF_ORACLE))
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, f"expected 1 shuffle, plan has {n_exchanges}"


def test_no_collect_in_operators(spark):
    """Operators return lazy DataFrames (driver never materializes)."""
    df = analytics.q3_shipping_priority(spark, SF_ORACLE)
    assert hasattr(df, "queryExecution") or df.schema is not None


def test_event_time_schema_contract(spark):
    """Load-time type contract for events.ts (functions/event_time.py).

    Pins BOTH the loaded type (LTZ timestamp -- NOT timestamp_ntz, NOT
    bigint) and one known epoch value, so a Spark-runtime change in parquet
    timestamp inference (bigint nanos vs TIMESTAMP_NTZ vs TIMESTAMP) breaks
    HERE, in one test, instead of as ten DATATYPE_MISMATCH crashes across
    the event-time operator surface (sessionize / as-of / range join / OHLC
    / trailing windows / decay / interval / attribution).
    """
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    assert dict(ev.dtypes)["ts"] == "timestamp", (
        "events.ts must normalize to an LTZ timestamp; got "
        + dict(ev.dtypes)["ts"]
    )
    # epoch semantics: naive wall-clock treated as UTC (DuckDB epoch(ts)
    # parity). event_id=0 is 2024-01-01 00:09:58.778549 naive -> this epoch
    # micros iff the NTZ->LTZ mapping went through UTC.
    got = (
        ev.where(F.col("event_id") == 0)
        .select(F.unix_micros("ts").alias("us"))
        .collect()[0]["us"]
    )
    assert got == 1704067798778549, got
    # cast-to-long (epoch seconds) must be legal -- the exact expression the
    # event-time operators use.
    sec = (
        ev.where(F.col("event_id") == 0)
        .select(F.col("ts").cast("long").alias("s"))
        .collect()[0]["s"]
    )
    assert sec == 1704067798, sec


def test_event_time_epoch_parity_whole_table(spark, ddb):
    """Whole-table epoch agreement with DuckDB (the oracle's view of the
    same parquet): sum of epoch-seconds over every event must match,
    not just the single pinned row -- catches any partial or
    rounding-differing NTZ->LTZ mapping."""
    got = (
        load_table(spark, SF_ORACLE, "events")
        .agg(F.sum(F.col("ts").cast("long")).alias("s"))
        .first()["s"]
    )
    # floor, not CAST: DuckDB's epoch() is a DOUBLE and BIGINT-casting
    # ROUNDS fractional seconds where Spark's cast(ts as long) truncates.
    want = ddb.execute(
        "SELECT CAST(sum(CAST(floor(epoch(ts)) AS BIGINT)) AS BIGINT)"
        " FROM events"
    ).fetchone()[0]
    assert got == want, (got, want)


def test_table_type_contract(spark):
    """Load-time date/money contract (functions/type_contract.py): every
    DATE-like column loads as timestamp_ntz with its known wall-clock,
    every MONEY-like column as double with its known value -- the ONE
    test that fails first if a Spark upgrade re-infers parquet types
    (the event_time twin of this pin caught the r4 NTZ break)."""
    from abr_etl_spark.functions import type_contract as tc

    for table, cols in tc.DATE_COLS.items():
        dt = dict(load_table(spark, SF_ORACLE, table).dtypes)
        for c in cols:
            assert dt[c] == "timestamp_ntz", (table, c, dt[c])
    for table, cols in tc.MONEY_COLS.items():
        dt = dict(load_table(spark, SF_ORACLE, table).dtypes)
        for c in cols:
            assert dt[c] == "double", (table, c, dt[c])
    # pinned values (sf0.01): the first order's date and price
    row = (
        load_table(spark, SF_ORACLE, "orders")
        .where(F.col("o_orderkey") == 1)
        .select("o_orderdate", "o_totalprice")
        .collect()[0]
    )
    assert str(row["o_orderdate"]) == "1997-05-28 00:00:00"
    assert isinstance(row["o_totalprice"], float)


def test_type_contract_normalizes_simulated_drift(spark):
    """Feed the normalizer every drift shape a future runtime could
    produce -- DATE, LTZ timestamp, legacy bigint nanos, DECIMAL -- and
    assert it lands on the pinned types with exactly the right values."""
    from abr_etl_spark.functions.type_contract import normalize_table_types

    drifted = spark.sql(
        """
        SELECT DATE'1992-01-01'                          AS o_orderdate,
               CAST(12.34 AS DECIMAL(15, 2))             AS o_totalprice
        """
    )
    out = normalize_table_types(drifted, "orders")
    assert dict(out.dtypes) == {
        "o_orderdate": "timestamp_ntz",
        "o_totalprice": "double",
    }
    r = out.collect()[0]
    assert str(r["o_orderdate"]) == "1992-01-01 00:00:00"
    assert r["o_totalprice"] == 12.34
    # LTZ drift: the rebuild must be session-timezone-INDEPENDENT
    ltz = spark.sql(
        "SELECT timestamp_micros(694224000000000) AS o_orderdate,"
        " CAST(1.0 AS DOUBLE) AS o_totalprice"
    )
    r2 = normalize_table_types(ltz, "orders").collect()[0]
    assert str(r2["o_orderdate"]) == "1992-01-01 00:00:00"
    # bigint legacy nanos drift
    nanos = spark.sql(
        "SELECT CAST(694224000000000000 AS BIGINT) AS o_orderdate,"
        " CAST(1.0 AS DOUBLE) AS o_totalprice"
    )
    r3 = normalize_table_types(nanos, "orders").collect()[0]
    assert str(r3["o_orderdate"]) == "1992-01-01 00:00:00"


def test_sweep_plan_growth_is_linear_in_grid(spark, monkeypatch):
    """r11 verdict item 3: the band-sweep family's static plan size must
    grow LINEARLY with its grid -- each layout contributes a bounded
    slice of exchanges, with a shared prefix that does not multiply.
    Pin: exchanges-per-layout at |grid|=3 equals (within one) the
    per-layout count at |grid|=2, so doubling a grid can never blow up
    the plan superlinearly."""
    from abr_etl_spark.plans import llm_pipeline8 as l8

    def n_ex(df):
        return _plan(df).count("Exchange ")

    # plan-SHAPE pin: run under the production AQE setting (the shared
    # test session disables AQE for latency; this test's constants were
    # tuned against production plans)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try:
        e3 = n_ex(l8.lsh_band_sweep(spark, SF_ORACLE))
        monkeypatch.setattr(l8, "LSH_GRID", l8.LSH_GRID[:2])
        e2 = n_ex(l8.lsh_band_sweep(spark, SF_ORACLE))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
    assert e2 < e3
    per3, per2 = e3 / 3, e2 / 2
    assert abs(per3 - per2) <= 1.0, (e2, e3)


def test_mmr_chain_planning_stays_linear_in_k(spark, monkeypatch):
    """The MMR greedy chain embeds its own subtree ~3x per pick, so an
    untruncated plan grows exponentially in k (measured 25 s analysis
    at k=6). Past _MMR_PLAN_TRUNC_K picks the chain localCheckpoints
    every _MMR_PLAN_TRUNC_EVERY steps; pin the effect on the ANALYZED
    tree: the k=8 plan stays within a small multiple of the k=3 plan
    instead of ~3^5 times larger, and the k-dial values are a strict
    prefix-consistent superset (pick 1..3 identical)."""
    from abr_etl_spark.plans import llm_pipeline8 as l8

    def tree_chars(df):
        return len(df._jdf.queryExecution().analyzed().toString())

    base = l8.mmr_diversify_topk(spark, SF_ORACLE)  # k = MMR_K = 3
    big = l8.mmr_diversify_topk(spark, SF_ORACLE, k=8)
    assert tree_chars(big) <= 8 * tree_chars(base), (
        tree_chars(base),
        tree_chars(big),
    )
    first3 = {
        (r["query_id"], r["pick"]): r["neighbor_id"]
        for r in base.collect()
    }
    big_first3 = {
        (r["query_id"], r["pick"]): r["neighbor_id"]
        for r in big.collect()
        if r["pick"] <= 3
    }
    assert big_first3 == first3  # greedy prefix property survives


# Keys whose registered plan carries an unpartitioned Window node OVER A
# FRAME WITH A STATED CARDINALITY BOUND. Every entry must say what bounds
# the frame -- "it passed at sf0.001" is not a bound. Anything NOT listed
# here must keep every Window partitioned (r12 verdict item 5: the
# abc_classification shape -- an unpartitioned window whose frame grows
# with the data -- must not land silently again).
BOUNDED_GLOBAL_WINDOW_KEYS = {
    # two-level prefix sums: the single-partition window reads the
    # per-bucket TOTALS table (<= #buckets rows, a compile-time constant)
    "abc_classification",  # <= ABC_BUCKETS+1 bucket totals
    "sequence_pack",  # <= bucket count (llm_pipeline4)
    "sequence_pack_chunks",  # same device as sequence_pack
    "weighted_sample_systematic",  # <= orders/WS_BUCKET totals
    "rfm_segments",  # 3x _ntile_distributed bucket prefixes
    "corpus_budget_waterfill",  # waterfill ladder over bucket totals
    "gini_concentration",  # <= GINI_BUCKETS+1 bucket-count census
    # calendar/grid grains: the window input is day-, month-, bin- or
    # grid-sized, bounded by the time span or a constant grid
    "cumulative_distinct_users",  # day grain (dates in the lake)
    "sprt_conversion_monitor",  # day grain (cumulative LLR series)
    "survival_km",  # day-lag grid (calendar-bounded KM curve)
    "decompose_trend_dow",  # day + dow grain
    "hll_sliding_distinct",  # day grain
    "mom_growth",  # month grain
    "ks_drift_by_source",  # per-source value grid (ECDF support)
    "psi_drift_by_source",  # PSI bin grid (constant bins)
    "mannwhitney_u_value",  # rank ties grid: distinct event values
    # report/sweep grains: input is a sweep grid or partition census
    "dedup_threshold_sweep",  # tau grid rows
    "ann_pareto_frontier",  # sweep-grid union (|radii|+|nprobe| rows)
    "vocab_coverage_sweep",  # vocab-size grid rows
    "pack_efficiency_report",  # report rows (pack-size census)
    "lake_partitions",  # partition census (metadata-sized)
    "stratified_reservoir_alloc",  # strata census (|lang x source|)
}


@pytest.mark.slow
def test_unpartitioned_windows_are_whitelisted_and_bounded(spark):
    """Walk the ANALYZED plan of every registered query (subqueries
    included) and collect Window nodes with an empty partitionSpec.
    Each such key must be whitelisted above with its cardinality bound;
    a stale whitelist entry (key no longer global-windowed) fails too,
    so the list cannot rot in either direction."""
    import __spark_entry__ as entry

    def has_unpartitioned_window(df) -> bool:
        found = []

        def walk(node):
            if found:
                return
            if (
                node.getClass().getSimpleName() == "Window"
                and node.partitionSpec().isEmpty()
            ):
                found.append(True)
                return
            ch = node.children()
            for i in range(ch.size()):
                walk(ch.apply(i))
            sq = node.subqueries()
            for i in range(sq.size()):
                walk(sq.apply(i))

        walk(df._jdf.queryExecution().analyzed())
        return bool(found)

    from concurrent.futures import ThreadPoolExecutor

    def probe(item):
        key, fn = item
        return key, has_unpartitioned_window(
            fn(spark, "/root/testdata/sf0.001")
        )

    # plan analysis is driver-side and per-query; a small pool overlaps
    # the ~300 independent analyze passes (opt guide 2.6)
    with ThreadPoolExecutor(max_workers=8) as pool:
        hits = dict(pool.map(probe, list(entry.queries().items())))
    offenders, stale = [], []
    for key, hit in hits.items():
        if hit and key not in BOUNDED_GLOBAL_WINDOW_KEYS:
            offenders.append(key)
        if not hit and key in BOUNDED_GLOBAL_WINDOW_KEYS:
            stale.append(key)
    assert not offenders, (
        "unpartitioned Window over a non-whitelisted frame -- partition "
        f"it or document its bound in BOUNDED_GLOBAL_WINDOW_KEYS: {offenders}"
    )
    assert not stale, f"whitelist entries no longer global-windowed: {stale}"
