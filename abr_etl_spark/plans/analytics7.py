"""Coverage part 7 (round 7): robust statistics, time-series BI, and
product analytics shapes.

- ``anomaly_mad``: MAD-based robust outlier report per customer segment
  -- median absolute deviation tolerates the very outliers that inflate
  a mean/stddev z-score (the outlier_filter IQR rule's robust sibling).
- ``mom_growth``: month-over-month revenue growth -- monthly aggregate
  (exact cents) + a lag over the tiny month table, growth as one
  deterministic double division.
- ``new_vs_returning``: daily new-vs-returning user split off the
  first-seen identity (the cumulative_distinct_users trick applied to
  cohort accounting): each user is "new" exactly once.

Reference parity: the reference (abr-etl, Go) delegates analytics to
Athena SQL; these are Spark-native shapes its users run downstream
(SURVEY.md §2.B rationale).

Scale notes: anomaly_mad is three pruned scans with two tiny
(segment-cardinality) broadcasts -- medians are exact here and would
swap to approx_percentile at 100 TB (the histogram_equi_depth
precedent, noted in the docstring); mom_growth's global window runs
over the aggregated month table (tens of rows -- the sanctioned tiny
frame); new_vs_returning shuffles (day, user) pairs once and joins
narrow 16-byte rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from abr_etl_spark.sources.lake import load_table

#: MAD multiplier for the outlier rule (≈ 2 sigma for normal data, since
#: MAD ≈ 0.674 sigma; kept integer so the threshold math is exact).
MAD_K = 3

#: approx_percentile accuracy for the documented 100 TB swap: rank error
#: is bounded by n/accuracy per group (Greenwald-Khanna bound), so 1e4
#: keeps the p50/p90 estimates within 0.01% of the true rank while the
#: per-group state is O(accuracy * log n) instead of O(n) raw rows.
PCT_ACCURACY = 10_000


def _pct(col: str, q: float, exact: bool) -> F.Column:
    """percentile_cont when ``exact`` (the oracle-checked default),
    approx_percentile at the documented accuracy otherwise -- the
    toggleable 100 TB swap the histogram_equi_depth docstring
    prescribes. Cast to double so the output schema is mode-invariant
    (approx_percentile returns the input type, an actual element)."""
    if exact:
        return F.expr(f"percentile({col}, {q})")
    return F.expr(f"approx_percentile({col}, {q}, {PCT_ACCURACY})").cast(
        "double"
    )


def anomaly_mad(
    spark: SparkSession, sf_dir: str, *, exact: bool = True
) -> DataFrame:
    """Robust outlier report per market segment over customer balances:
    (segment, n, med, mad, n_outliers) where an outlier is
    |x - median| > MAD_K * MAD. Medians default to exact percentile_cont
    (cross-engine parity proven by the percentiles query); at 100 TB
    pass ``exact=False`` and both medians run as approx_percentile at
    PCT_ACCURACY (the histogram_equi_depth swap, now implemented, not
    just documented -- rank-error bound asserted in
    tests/test_approx_percentile_swap.py). The plan shape (tiny
    broadcast per segment) is mode-invariant.

    Scale shape: three column-pruned scans; each reduction broadcasts a
    segment-cardinality (5-row) aggregate; no row-level joins shuffle.
    """
    c = load_table(spark, sf_dir, "customer").select(
        "c_mktsegment", "c_acctbal"
    )
    med = c.groupBy("c_mktsegment").agg(
        _pct("c_acctbal", 0.5, exact).alias("med")
    )
    with_med = c.join(F.broadcast(med), "c_mktsegment")
    mad = (
        with_med.select(
            "c_mktsegment", F.abs(F.col("c_acctbal") - F.col("med")).alias("dev")
        )
        .groupBy("c_mktsegment")
        .agg(_pct("dev", 0.5, exact).alias("mad"))
    )
    return (
        with_med.join(F.broadcast(mad), "c_mktsegment")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            F.round(F.first("med"), 4).alias("med"),
            F.round(F.first("mad"), 4).alias("mad"),
            F.sum(
                F.when(
                    F.abs(F.col("c_acctbal") - F.col("med"))
                    > MAD_K * F.col("mad"),
                    1,
                ).otherwise(0)
            ).alias("n_outliers"),
        )
        .orderBy("c_mktsegment")
    )


def mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth: (month, revenue_c, growth)
    with revenue in exact cents and growth = (rev - prev)/prev, a
    DOUBLE rounded to 6 (one double division -- identical IEEE both
    engines; a bare integer DIV is avoided because both Spark DIV and
    DuckDB // truncate toward zero, which is not the half-up floor the
    operator wants on NEGATIVE growth months -- the sign-safe pmod
    floor used by time_weighted_avg would be needed on BOTH sides).
    First month reports NULL growth.

    Scale shape: the order scan collapses to one row per month before
    the lag window touches anything -- the global window runs over tens
    of rows (the sequence_pack tiny-frame pattern).
    """
    o = load_table(spark, sf_dir, "orders")
    monthly = (
        o.select(
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias(
                "month"
            ),
            F.floor(F.col("o_totalprice") * 100 + 0.5)
            .cast("long")
            .alias("cents"),
        )
        .groupBy("month")
        .agg(F.sum("cents").alias("revenue_c"))
    )
    # single-partition window is BOUNDED: input is one row per month
    # (tens of rows for any corpus age), never order-scale
    w = Window.orderBy("month")
    prev = F.lag("revenue_c").over(w)
    return monthly.select(
        "month",
        "revenue_c",
        F.round(
            (F.col("revenue_c") - prev) / prev,
            6,
        ).alias("growth"),
    ).orderBy("month")


def new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-vs-returning active users: (day, n_new, n_returning).
    A user is "new" on their first-ever active day (the first-seen
    identity -- each user contributes to n_new exactly once, so the
    n_new column alone reproduces cumulative_distinct_users).

    Scale shape: ONE shuffle builds the distinct (day, user) activity
    set; first days reduce it per user; the flag is arithmetic on the
    joined 16-byte rows and one final day aggregate. No day-by-day
    rescans, state is O(users).
    """
    e = load_table(spark, sf_dir, "events")
    day_user = e.select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"), "user_id"
    ).distinct()
    first_day = day_user.groupBy("user_id").agg(
        F.min("day").alias("first_day")
    )
    return (
        day_user.join(first_day, "user_id")
        .groupBy("day")
        .agg(
            F.sum(
                F.when(F.col("day") == F.col("first_day"), 1).otherwise(0)
            ).alias("n_new"),
            F.sum(
                F.when(F.col("day") != F.col("first_day"), 1).otherwise(0)
            ).alias("n_returning"),
        )
        .orderBy("day")
    )



def _touches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, click_id, purchase_id, gap_s) -- every click within the
    1h horizon before each same-user purchase (the batch face of the
    stream-stream interval join, streaming/stream_ops.attribution_join)."""
    from abr_etl_spark.streaming.stream_ops import attribution_join

    e = load_table(spark, sf_dir, "events")
    return attribution_join(
        e.where(F.col("event_type") == "click"),
        e.where(F.col("event_type") == "purchase"),
    )


def attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: each purchase's 1e4 units of
    credit split equally across its qualifying clicks (half-up integer
    per touch), credited to the CLICKING user's census row: (user_id,
    n_touches, total_credit_e4). The single-touch models (first/last)
    are the min/max-gap specializations of this same join.

    Scale shape: the interval join is the attribution_join shape (time
    bound keeps it from being a cross product; on streams the same
    expression state-expires); per-purchase touch counts come from ONE
    window over the join output partitioned by purchase_id; the census
    is one aggregate. Integer credit math replays exactly.
    """
    t = _touches(spark, sf_dir)
    w = Window.partitionBy("purchase_id")
    credited = t.withColumn("n", F.count("*").over(w)).withColumn(
        "credit_e4", F.expr("(2 * 10000 + n) DIV (2 * n)")
    )
    return (
        credited.groupBy("user_id")
        .agg(
            F.count("*").alias("n_touches"),
            F.sum("credit_e4").alias("total_credit_e4"),
        )
        .orderBy("user_id")
    )


def conversion_lag_stats(
    spark: SparkSession, sf_dir: str, *, exact: bool = True
) -> DataFrame:
    """Click-to-purchase lag distribution under LAST-touch attribution
    (nearest qualifying click per purchase): one row of
    (n_conversions, min_s, med_s, p90_s, max_s). Median/p90 default to
    exact percentile_cont (cross-engine parity proven by the
    percentiles query); ``exact=False`` runs both as approx_percentile
    at PCT_ACCURACY -- the implemented 100 TB swap (rank-error pytest:
    tests/test_approx_percentile_swap.py).

    Scale shape: interval join -> per-purchase min-gap aggregate ->
    one global reduction.
    """
    t = _touches(spark, sf_dir)
    last_touch = t.groupBy("purchase_id").agg(F.min("gap_s").alias("lag_s"))
    return last_touch.agg(
        F.count("*").alias("n_conversions"),
        F.min("lag_s").alias("min_s"),
        F.round(_pct("lag_s", 0.5, exact), 4).alias("med_s"),
        F.round(_pct("lag_s", 0.9, exact), 4).alias("p90_s"),
        F.max("lag_s").alias("max_s"),
    )


#: Knuth multiplicative constant (TAOCP vol 3), as in corpus_mix.
QS_MULT = 2654435761
QS_MOD = 2147483647
#: keep ~2% of rows in the deterministic quantile sample.
QS_RATE_E4 = 200


def quantile_sketch_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate order-price quantiles from a DETERMINISTIC hash
    sample: (n_sample, p50, p90, p99). Rows survive iff
    ``(pmod(o_orderkey, P) * KNUTH) % P < rate`` -- a partition-count-
    and cluster-size-independent ~2% sample both engines derive
    identically, so unlike t-digest/GK sketches the "approximate" result
    is exactly replayable. Sample-then-exact-percentile is the honest
    distributed sketch here: the reduction input is bounded at rate * N
    rows and the error is the standard sampling error (binomial on
    ranks). The key is FOLDED into [0, P) before the Knuth multiply so
    the product stays < P * KNUTH ~ 5.7e18 < 2^63 for ANY key domain:
    the unfolded ``o_orderkey * KNUTH`` silently wraps negative in Spark
    at keys >~ 3.5e9 (keeping extra rows) while DuckDB raises -- exactly
    the 100 TB key range this sketch targets. Folding is a no-op below
    P = 2^31-1, so small-sf results are unchanged.

    Scale shape: the hash filter evaluates at the SCAN (map-side, no
    shuffle survives it); one reduction computes the exact percentiles
    of the sample. QS_RATE_E4 is a parameter of the DATA SIZE, not a
    constant: at 100 TB you lower the rate so the sample stays
    ~10^5-10^6 rows (the HIST_DEPTH_SAMPLE_MOD contract) -- rank error
    is binomial in the SAMPLE size, so a fixed-size sample keeps both
    the reducer memory and the error bound constant as N grows.
    """
    o = load_table(spark, sf_dir, "orders")
    kept = o.where(
        (F.expr(f"pmod(o_orderkey, {QS_MOD})") * QS_MULT) % QS_MOD
        < (QS_MOD * QS_RATE_E4) / 10000
    )
    return kept.agg(
        F.count("*").alias("n_sample"),
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(o_totalprice, 0.99)"), 4).alias("p99"),
    )


def hot_keys_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-skew diagnostics: the 10 heaviest join keys of the
    orders⋈lineitem equi-join -- (o_orderkey, n_lineitems) by count
    desc, key asc. The report an operator reads BEFORE picking between
    plain shuffle, AQE skew split, and the salted join
    (operators/joins.salted_join); at 100 TB this is the 30-second
    query that explains a straggler.

    Scale shape: map-side partial count per key, one exchange, global
    top-k as TakeOrderedAndProject (per-partition partial top-k, k-row
    merge).
    """
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_orderkey")
        .agg(F.count("*").alias("n_lineitems"))
        .orderBy(F.col("n_lineitems").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


def _cramer3_sql(pref: str = "") -> dict[str, str]:
    """Cramer's-rule solve of the 3x3 normal equations, as ONE shared
    SQL-arithmetic string evaluated verbatim by BOTH engines (Spark SQL
    and DuckDB) -- identical parenthesization means identical IEEE
    rounding, so the coefficients hash-match without any integer-unit
    contortions. Moments are exact integers < 2^53; the determinant
    products round identically because the operation order is the text.
    """
    n, s1, s2 = f"{pref}nd", f"{pref}s1", f"{pref}s2"
    sy, s11, s12 = f"{pref}sy", f"{pref}s11", f"{pref}s12"
    s22, s1y, s2y = f"{pref}s22", f"{pref}s1y", f"{pref}s2y"
    det = (
        f"({n} * ({s11} * {s22} - {s12} * {s12})"
        f" - {s1} * ({s1} * {s22} - {s12} * {s2})"
        f" + {s2} * ({s1} * {s12} - {s11} * {s2}))"
    )
    det0 = (
        f"({sy} * ({s11} * {s22} - {s12} * {s12})"
        f" - {s1} * ({s1y} * {s22} - {s12} * {s2y})"
        f" + {s2} * ({s1y} * {s12} - {s11} * {s2y}))"
    )
    det1 = (
        f"({n} * ({s1y} * {s22} - {s12} * {s2y})"
        f" - {sy} * ({s1} * {s22} - {s12} * {s2})"
        f" + {s2} * ({s1} * {s2y} - {s1y} * {s2}))"
    )
    det2 = (
        f"({n} * ({s11} * {s2y} - {s1y} * {s12})"
        f" - {s1} * ({s1} * {s2y} - {s1y} * {s2})"
        f" + {sy} * ({s1} * {s12} - {s11} * {s2}))"
    )
    return {"det": det, "det0": det0, "det1": det1, "det2": det2}


def linreg_normal_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed 2-feature OLS by sufficient statistics: fit
    price_cents ~ b0 + b1*quantity + b2*discount_pct over lineitem via
    the normal equations -- (n, b0, b1, b2) in one row, coefficients
    rounded to 6.

    This is how regression actually runs at 100 TB: ONE map-side-combined
    aggregate collapses the fact table to nine exact integer moments
    (n, Sx1, Sx2, Sy, Sx1x1, Sx1x2, Sx2x2, Sx1y, Sx2y); the 3x3 solve is
    driver-free arithmetic on that single row (Cramer's rule, shared
    formula text => identical IEEE rounding cross-engine). No gradient
    loop, no per-row Python, no second scan.
    """
    l = load_table(spark, sf_dir, "lineitem")
    x1 = F.col("l_quantity").cast("long")
    x2 = F.floor(F.col("l_discount") * 100 + 0.5).cast("long")
    y = F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
    m0 = l.agg(
        F.count("*").alias("n"),
        F.sum(x1).alias("i1"),
        F.sum(x2).alias("i2"),
        F.sum(y).alias("iy"),
        F.sum(x1 * x1).alias("i11"),
        F.sum(x1 * x2).alias("i12"),
        F.sum(x2 * x2).alias("i22"),
        F.sum(x1 * y).alias("i1y"),
        F.sum(x2 * y).alias("i2y"),
    )
    # the solve runs in doubles: every moment is an exact integer far
    # below 2^53 (lossless conversion) while determinant PRODUCTS exceed
    # int64 -- double keeps both engines on the identical IEEE path
    # (DuckDB would raise on BIGINT overflow, Spark would wrap).
    m = m0.select(
        "n",
        F.col("n").cast("double").alias("nd"),
        *[
            F.col(f"i{s}").cast("double").alias(f"s{s}")
            for s in ("1", "2", "y", "11", "12", "22", "1y", "2y")
        ],
    )
    c = _cramer3_sql()
    return m.select(
        "n",
        F.round(F.expr(f"{c['det0']} / {c['det']}"), 6).alias("b0"),
        F.round(F.expr(f"{c['det1']} / {c['det']}"), 6).alias("b1"),
        F.round(F.expr(f"{c['det2']} / {c['det']}"), 6).alias("b2"),
    )


BASKET_TOP = 20


def basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: the top-{BASKET_TOP} part pairs
    bought together in the same order -- (part_a, part_b, n_orders),
    pair stored once as (a < b), count desc / pair asc. The
    bought-together primitive behind recommendations.

    Scale shape: a within-order self-join (a < b) generates pairs;
    fanout is quadratic IN BASKET SIZE only (TPC-H baskets are <= 7
    lines, so <= 21 pairs/order; retail baskets are similarly bounded
    -- a df-cap on pathological mega-baskets is the hot-shingle
    analogue if one ever appears). Pairs collapse map-side into the
    co-occurrence vocabulary; top-k is TakeOrderedAndProject.
    """
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct()
    a = l.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = l.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    return (
        a.join(b, "l_orderkey")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_orders"))
        .orderBy(
            F.col("n_orders").desc(),
            F.col("part_a").asc(),
            F.col("part_b").asc(),
        )
        .limit(BASKET_TOP)
    )


#: systematic weighted sample: target size and prefix-sum bucket width.
WS_K = 100
WS_BUCKET = 4096


def weighted_sample_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling WITHOUT pow/log: systematic
    sampling over cumulative weight space. Lay orders head-to-tail in
    o_orderkey order, each spanning [cum_lo, cum_hi) of total weight W
    (weight = totalprice cents); a grid of WS_K equally spaced marks
    selects every order a mark lands in:

        n_picks = (cum_hi * K) DIV W - (cum_lo * K) DIV W

    Exactly K picks in total, inclusion probability proportional to weight,
    heavy items can be picked multiple times (reported) -- and unlike
    A-ES / exponential-race sampling there is no u^(1/w), so both
    engines replay the sample from pure integer arithmetic.

    Scale shape: per-order cumulative weights come from the
    sequence_pack two-level prefix sum (bucket window + tiny per-bucket
    prefix broadcast), one narrow shuffle; selection is a map-side
    filter. Output (o_orderkey, cents, n_picks), ~K rows.
    """
    o = load_table(spark, sf_dir, "orders")
    w = o.select(
        "o_orderkey",
        (F.col("o_orderkey") / F.lit(WS_BUCKET)).cast("long").alias("__b"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
    )
    w_in = (
        Window.partitionBy("__b")
        .orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = w.withColumn(
        "__run", F.sum("cents").over(w_in) - F.col("cents")
    )
    btot = w.groupBy("__b").agg(F.sum("cents").alias("__t"))
    # single-partition window is BOUNDED: input is the per-bucket total
    # table (WS_BUCKETS rows), never order-scale
    w_b = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    prefix = btot.select(
        "__b", F.coalesce(F.sum("__t").over(w_b), F.lit(0)).alias("__pre")
    )
    total = btot.agg(F.sum("__t").alias("W"))
    cum = (
        within.join(F.broadcast(prefix), "__b")
        .crossJoin(F.broadcast(total))
        .select(
            "o_orderkey",
            "cents",
            (F.col("__pre") + F.col("__run")).alias("cum_lo"),
            (F.col("__pre") + F.col("__run") + F.col("cents")).alias(
                "cum_hi"
            ),
            "W",
        )
    )
    picks = F.expr(
        f"(cum_hi * {WS_K}) DIV W - (cum_lo * {WS_K}) DIV W"
    )
    return (
        cum.select("o_orderkey", "cents", picks.alias("n_picks"))
        .where(F.col("n_picks") > 0)
        .orderBy("o_orderkey")
    )


def daily_value_bands(
    spark: SparkSession, sf_dir: str, *, exact: bool = True
) -> DataFrame:
    """Daily value-distribution bands over the purchase stream:
    (day, n, p50, p90) -- the metrics-over-time percentile query every
    monitoring dashboard runs. Percentiles default to exact
    percentile_cont (parity proven by the percentiles query);
    ``exact=False`` swaps both to approx_percentile at PCT_ACCURACY --
    the implemented 100 TB path (rank-error pytest:
    tests/test_approx_percentile_swap.py); per-day GK state is
    O(accuracy) instead of the day's raw rows. One day-partitioned
    aggregate either way.
    """
    e = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    return (
        e.select(
            F.date_format("ts", "yyyy-MM-dd").alias("day"), "value"
        )
        .groupBy("day")
        .agg(
            F.count("*").alias("n"),
            F.round(_pct("value", 0.5, exact), 4).alias("p50"),
            F.round(_pct("value", 0.9, exact), 4).alias("p90"),
        )
        .orderBy("day")
    )


def cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime value: cumulative purchase value per first-seen
    cohort day over activity days, in exact 1e-4 units -- the revenue
    companion to cohort_retention: (cohort_day, day, day_value_e4,
    cum_value_e4).

    Scale shape: first-day reduction + one (cohort, day) aggregate
    sharing the user shuffle, then a running sum windowed PER COHORT
    (cohort-cardinality partitions, never global).
    """
    e = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    base = e.select(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.floor(F.col("value") * 10000 + 0.5).cast("long").alias("v_e4"),
    )
    first = base.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    daily = (
        base.join(first, "user_id")
        .groupBy("cohort_day", "day")
        .agg(F.sum("v_e4").alias("day_value_e4"))
    )
    w = (
        Window.partitionBy("cohort_day")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return daily.select(
        "cohort_day",
        "day",
        "day_value_e4",
        F.sum("day_value_e4").over(w).alias("cum_value_e4"),
    ).orderBy("cohort_day", "day")

QUERIES = {
    "anomaly_mad": anomaly_mad,
    "attribution_linear": attribution_linear,
    "conversion_lag_stats": conversion_lag_stats,
    "quantile_sketch_hash": quantile_sketch_hash,
    "hot_keys_report": hot_keys_report,
    "linreg_normal_eq": linreg_normal_eq,
    "basket_pairs": basket_pairs,
    "weighted_sample_systematic": weighted_sample_systematic,
    "daily_value_bands": daily_value_bands,
    "cohort_ltv": cohort_ltv,
    "mom_growth": mom_growth,
    "new_vs_returning": new_vs_returning,
}

ORACLES = {
    "anomaly_mad": f"""
        WITH med AS (
            SELECT c_mktsegment, quantile_cont(c_acctbal, 0.5) AS med
            FROM customer GROUP BY c_mktsegment
        ), wm AS (
            SELECT c.c_mktsegment, c.c_acctbal, m.med
            FROM customer c JOIN med m USING (c_mktsegment)
        ), mad AS (
            SELECT c_mktsegment,
                   quantile_cont(abs(c_acctbal - med), 0.5) AS mad
            FROM wm GROUP BY c_mktsegment
        )
        SELECT w.c_mktsegment, CAST(count(*) AS BIGINT) AS n,
               round(any_value(w.med), 4) AS med,
               round(any_value(d.mad), 4) AS mad,
               CAST(sum(CASE WHEN abs(w.c_acctbal - w.med)
                                  > {MAD_K} * d.mad
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        FROM wm w JOIN mad d USING (c_mktsegment)
        GROUP BY w.c_mktsegment ORDER BY w.c_mktsegment
    """,
    "mom_growth": """
        WITH monthly AS (
            SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m')
                       AS month,
                   CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                 AS BIGINT)) AS BIGINT) AS revenue_c
            FROM orders GROUP BY 1
        )
        SELECT month, revenue_c,
               round((revenue_c - lag(revenue_c) OVER (ORDER BY month))
                     / lag(revenue_c) OVER (ORDER BY month), 6) AS growth
        FROM monthly ORDER BY month
    """,
    "new_vs_returning": """
        WITH du AS (
            SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS day, user_id
            FROM events
        ), fd AS (
            SELECT user_id, min(day) AS first_day FROM du GROUP BY user_id
        )
        SELECT du.day,
               CAST(sum(CASE WHEN du.day = fd.first_day
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
               CAST(sum(CASE WHEN du.day != fd.first_day
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_returning
        FROM du JOIN fd USING (user_id)
        GROUP BY du.day ORDER BY du.day
    """,
}

_TOUCH_CTE = """
    WITH c AS (
        SELECT user_id, ts AS click_ts, event_id AS click_id
        FROM events WHERE event_type = 'click'
    ), p AS (
        SELECT user_id, ts AS purchase_ts, event_id AS purchase_id
        FROM events WHERE event_type = 'purchase'
    ), t AS (
        SELECT c.user_id, c.click_id, p.purchase_id,
               CAST(floor(epoch(p.purchase_ts)) AS BIGINT)
               - CAST(floor(epoch(c.click_ts)) AS BIGINT) AS gap_s
        FROM c JOIN p ON c.user_id = p.user_id
         AND p.purchase_ts >= c.click_ts
         AND p.purchase_ts < c.click_ts + INTERVAL 1 HOUR
    )
"""

ORACLES["attribution_linear"] = _TOUCH_CTE + """
    , credited AS (
        SELECT user_id,
               count(*) OVER (PARTITION BY purchase_id) AS n
        FROM t
    )
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_touches,
           CAST(sum((2 * 10000 + n) // (2 * n)) AS BIGINT)
               AS total_credit_e4
    FROM credited GROUP BY user_id ORDER BY user_id
"""

ORACLES["conversion_lag_stats"] = _TOUCH_CTE + """
    , lt AS (
        SELECT purchase_id, min(gap_s) AS lag_s FROM t
        GROUP BY purchase_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_conversions,
           CAST(min(lag_s) AS BIGINT) AS min_s,
           round(quantile_cont(lag_s, 0.5), 4) AS med_s,
           round(quantile_cont(lag_s, 0.9), 4) AS p90_s,
           CAST(max(lag_s) AS BIGINT) AS max_s
    FROM lt
"""

ORACLES["quantile_sketch_hash"] = f"""
    WITH kept AS (
        SELECT o_totalprice FROM orders
        WHERE ((o_orderkey % {QS_MOD}) * {QS_MULT}) % {QS_MOD}
              < ({QS_MOD}::BIGINT * {QS_RATE_E4}) / 10000
    )
    SELECT CAST(count(*) AS BIGINT) AS n_sample,
           round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
           round(quantile_cont(o_totalprice, 0.99), 4) AS p99
    FROM kept
"""

ORACLES["hot_keys_report"] = """
    SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_lineitems
    FROM lineitem GROUP BY l_orderkey
    ORDER BY n_lineitems DESC, l_orderkey ASC LIMIT 10
"""

_C3 = _cramer3_sql()
ORACLES["linreg_normal_eq"] = f"""
    WITH mi AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS i1,
               CAST(sum(CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS i2,
               CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS iy,
               CAST(sum(CAST(l_quantity AS BIGINT)
                        * CAST(l_quantity AS BIGINT)) AS BIGINT) AS i11,
               CAST(sum(CAST(l_quantity AS BIGINT)
                        * CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS i12,
               CAST(sum(CAST(floor(l_discount * 100 + 0.5) AS BIGINT)
                        * CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS i22,
               CAST(sum(CAST(l_quantity AS BIGINT)
                        * CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS i1y,
               CAST(sum(CAST(floor(l_discount * 100 + 0.5) AS BIGINT)
                        * CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS i2y
        FROM lineitem
    ), m AS (
        SELECT n, n::DOUBLE AS nd,
               i1::DOUBLE AS s1, i2::DOUBLE AS s2, iy::DOUBLE AS sy,
               i11::DOUBLE AS s11, i12::DOUBLE AS s12,
               i22::DOUBLE AS s22, i1y::DOUBLE AS s1y, i2y::DOUBLE AS s2y
        FROM mi
    )
    SELECT n,
           round({_C3['det0']} / {_C3['det']}, 6) AS b0,
           round({_C3['det1']} / {_C3['det']}, 6) AS b1,
           round({_C3['det2']} / {_C3['det']}, 6) AS b2
    FROM m
"""

ORACLES["basket_pairs"] = f"""
    WITH lp AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    )
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey
     AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    ORDER BY n_orders DESC, part_a ASC, part_b ASC
    LIMIT {BASKET_TOP}
"""

ORACLES["weighted_sample_systematic"] = f"""
    WITH w AS (
        SELECT o_orderkey,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        FROM orders
    ), c AS (
        SELECT o_orderkey, cents,
               CAST(sum(cents) OVER (ORDER BY o_orderkey) - cents
                    AS BIGINT) AS cum_lo,
               CAST(sum(cents) OVER (ORDER BY o_orderkey) AS BIGINT)
                   AS cum_hi,
               CAST(sum(cents) OVER () AS BIGINT) AS W
        FROM w
    )
    SELECT o_orderkey, cents,
           CAST((cum_hi * {WS_K}) // W - (cum_lo * {WS_K}) // W
                AS BIGINT) AS n_picks
    FROM c
    WHERE (cum_hi * {WS_K}) // W - (cum_lo * {WS_K}) // W > 0
    ORDER BY o_orderkey
"""

ORACLES["daily_value_bands"] = """
    SELECT strftime(ts, '%Y-%m-%d') AS day,
           CAST(count(*) AS BIGINT) AS n,
           round(quantile_cont(value, 0.5), 4) AS p50,
           round(quantile_cont(value, 0.9), 4) AS p90
    FROM events WHERE event_type = 'purchase'
    GROUP BY 1 ORDER BY day
"""

ORACLES["cohort_ltv"] = """
    WITH base AS (
        SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
               CAST(floor(value * 10000 + 0.5) AS BIGINT) AS v_e4
        FROM events WHERE event_type = 'purchase'
    ), first AS (
        SELECT user_id, min(day) AS cohort_day FROM base GROUP BY user_id
    ), daily AS (
        SELECT f.cohort_day, b.day,
               CAST(sum(b.v_e4) AS BIGINT) AS day_value_e4
        FROM base b JOIN first f USING (user_id)
        GROUP BY f.cohort_day, b.day
    )
    SELECT cohort_day, day, day_value_e4,
           CAST(sum(day_value_e4) OVER (
               PARTITION BY cohort_day ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_value_e4
    FROM daily ORDER BY cohort_day, day
"""
