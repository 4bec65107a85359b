"""Round-13 analytics batch: forecasting primitives.

- ``holt_winters_forecast``: Brown's double-exponential smoothing of
  the daily value series per event type, via closed-form truncated
  power weights (decay_weighted_sum's machinery with the linear-ramp
  second term), all-integer until the pinned fixed-point report.

Reference parity: downstream-of-the-weekly-delta analytics (SURVEY.md
S2.B rationale) -- the one-step-ahead forecast a capacity dashboard
draws next to seasonal_index_dow / decompose_trend_dow.

Scale notes: one scan map-side combines to the (type, day) grain;
the smoothing windows are partitioned by event_type over day-grain
rows (bounded by the calendar span, never raw events).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from abr_etl_spark.sources.lake import load_table

QUERIES: dict = {}
ORACLES: dict = {}

# ------------------------------------------------- holt_winters_forecast

#: truncation depth of the smoothing window (alpha = 1/2, so weights
#: are exact powers of two and the fold is pure BIGINT arithmetic).
HW_W = 8
#: closed-form weight totals: the single smooth's geometric series and
#: the double smooth's (j+1)-ramped series, both at alpha = 1/2 scaled
#: by 2^(W-1) -- computed ONCE here and inlined as literals into both
#: engines' SQL.
HW_D1 = 2**HW_W - 1  # sum_j 2^(W-1-j)             = 255
HW_D2 = 2 ** (HW_W + 1) - HW_W - 2  # sum_j (j+1)*2^(W-1-j) = 502


def _hw_round_e4(num: str, den: int) -> str:
    """Pinned-text half-up fixed-point division ``round(num/den)`` that
    floors sign-safely on BOTH engines: add den (the half step of 2*den),
    subtract the non-negative pmod remainder so the final integer
    division is exact (truncation == floor even for negative trends --
    the time_weighted_avg device)."""
    x = f"(2 * ({num}) + {den})"
    return f"(({x} - pmod({x}, {2 * den})) DIV {2 * den})"


def _hw_round_e4_duck(num: str, den: int) -> str:
    """DuckDB twin of _hw_round_e4 (pmod spelled ((x%y)+y)%y; // floors,
    and the numerator is an exact multiple so floor == truncate)."""
    x = f"(2 * ({num}) + {den})"
    return (
        f"(({x} - ((({x}) % {2 * den} + {2 * den}) % {2 * den}))"
        f" // {2 * den})"
    )


def holt_winters_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown's double-exponential smoothing (Holt-Winters' non-seasonal
    double smooth) of the daily total value per event type, with the
    one-step-ahead forecast: level a = 2S' - S'', trend b = S' - S''
    (alpha = 1/2 makes alpha/(1-alpha) = 1), forecast = a + b.
    Output (event_type, day, v_e4, level_e4, trend_e4, forecast_e4) --
    one row per observed (type, day), values in half-up 1e-4 units.

    Determinism: the recursion is replaced by its CLOSED FORM truncated
    at {HW_W} observations -- S' ~ sum_j 2^(W-1-j) y_{{t-j}} / D1 and
    S'' ~ sum_j (j+1) 2^(W-1-j) y_{{t-j}} / D2 (the geometric kernel
    convolved with itself gives the (j+1) ramp) -- so both engines fold
    the SAME {HW_W} stacked lag() calls with integer power weights;
    missing history coalesces to 0 (documented warm-up bias, exactly
    decay_weighted_sum's rule) and the three reports are one pinned
    sign-safe fixed-point division each (negative trends floor
    identically on both engines). Lags step over the OBSERVED day
    sequence, not the calendar -- gap days contribute no row.

    Scale shape: ONE events scan map-side combines to the (type, day)
    grain; the {HW_W} lags share one (event_type)-partitioned window
    (single shuffle, day-grain frames bounded by the calendar span).
    100 TB cost = the scan."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.floor(F.col("value") * 10000 + 0.5).cast("long").alias("v"),
    )
    daily = e.groupBy("event_type", "day").agg(
        F.coalesce(F.sum("v"), F.lit(0)).alias("v_e4")
    )
    w = Window.partitionBy("event_type").orderBy(F.col("day").asc())
    s1 = sum(
        F.coalesce(F.lag("v_e4", j).over(w), F.lit(0))
        * F.lit(2 ** (HW_W - 1 - j))
        for j in range(HW_W)
    )
    s2 = sum(
        F.coalesce(F.lag("v_e4", j).over(w), F.lit(0))
        * F.lit((j + 1) * 2 ** (HW_W - 1 - j))
        for j in range(HW_W)
    )
    den = HW_D1 * HW_D2
    smoothed = daily.select(
        "event_type",
        "day",
        "v_e4",
        s1.cast("long").alias("__s1"),
        s2.cast("long").alias("__s2"),
    )
    return (
        smoothed.select(
            "event_type",
            "day",
            "v_e4",
            F.expr(
                _hw_round_e4(f"2 * __s1 * {HW_D2} - __s2 * {HW_D1}", den)
            ).alias("level_e4"),
            F.expr(
                _hw_round_e4(f"__s1 * {HW_D2} - __s2 * {HW_D1}", den)
            ).alias("trend_e4"),
            F.expr(
                _hw_round_e4(f"3 * __s1 * {HW_D2} - 2 * __s2 * {HW_D1}", den)
            ).alias("forecast_e4"),
        )
        .orderBy("event_type", "day")
    )


QUERIES["holt_winters_forecast"] = holt_winters_forecast


def _hw_oracle() -> str:
    lag_s1 = " + ".join(
        f"coalesce(lag(v_e4, {j}) OVER w, 0) * {2 ** (HW_W - 1 - j)}"
        for j in range(HW_W)
    )
    lag_s2 = " + ".join(
        f"coalesce(lag(v_e4, {j}) OVER w, 0)"
        f" * {(j + 1) * 2 ** (HW_W - 1 - j)}"
        for j in range(HW_W)
    )
    den = HW_D1 * HW_D2
    return f"""
        WITH daily AS (
            SELECT event_type,
                   strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
                   CAST(coalesce(sum(
                       CAST(floor(value * 10000 + 0.5) AS BIGINT)
                   ), 0) AS BIGINT) AS v_e4
            FROM events GROUP BY 1, 2
        ), sm AS (
            SELECT event_type, day, v_e4,
                   CAST({lag_s1} AS BIGINT) AS s1,
                   CAST({lag_s2} AS BIGINT) AS s2
            FROM daily
            WINDOW w AS (PARTITION BY event_type ORDER BY day ASC)
        )
        SELECT event_type, day, v_e4,
               CAST({_hw_round_e4_duck(f"2 * s1 * {HW_D2} - s2 * {HW_D1}", den)}
                   AS BIGINT) AS level_e4,
               CAST({_hw_round_e4_duck(f"s1 * {HW_D2} - s2 * {HW_D1}", den)}
                   AS BIGINT) AS trend_e4,
               CAST({_hw_round_e4_duck(f"3 * s1 * {HW_D2} - 2 * s2 * {HW_D1}", den)}
                   AS BIGINT) AS forecast_e4
        FROM sm
        ORDER BY event_type, day
    """


ORACLES["holt_winters_forecast"] = _hw_oracle()

# ---------------------------------------------------- gini_concentration

#: range-bucket count for the two-level rank device (abc_classification's
#: bucketing applied to ranks instead of prefix sums).
GINI_BUCKETS = 4096


def gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer spend concentration -- the Lorenz
    summary a marketplace reads beside rfm_segments (0 = everyone
    spends alike, ~1 = one whale). Output ONE row (n_customers,
    total_cents, gini_e6) via the rank formula
    G = (2*sum(r_i*s_i) - (n+1)*sum(s_i)) / (n*sum(s_i)) with r_i the
    ascending spend rank.

    Determinism: spend is exact BIGINT cents; ranks come from the total
    order (spend, custkey) -- within a tie group the rank SUM is
    permutation-invariant and the spends are equal, so G does not
    depend on the tie-break; the report is one half-up integer division
    in DECIMAL(38,0) (sum r*s ~ n^2 * mean spend wraps int64 at ~1e6
    customers already).

    Scale shape: orders map-side combine to the customer grain; the
    global ascending rank is a TWO-LEVEL device (abc_classification's
    bucketing): customers range-bucket on spend, row_number runs
    bucket-partitioned, and cross-bucket offsets come from a broadcast
    COUNT prefix over the <= {GINI_BUCKETS}+1-row bucket census -- no
    data-sized global window. The report is 1 row."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("c"),
    )
    per_cust = o.groupBy("o_custkey").agg(F.sum("c").alias("s"))
    span = per_cust.agg(F.max("s").alias("__mx"), F.min("s").alias("__mn"))
    bucketed = per_cust.crossJoin(F.broadcast(span)).withColumn(
        "__b",
        F.expr(f"(s - __mn) DIV ((__mx - __mn) DIV {GINI_BUCKETS} + 1)"),
    )
    w_in = Window.partitionBy("__b").orderBy(
        F.col("s").asc(), F.col("o_custkey").asc()
    )
    within = bucketed.select(
        "s", "__b", F.row_number().over(w_in).alias("__rk")
    )
    bcnt = bucketed.groupBy("__b").agg(F.count("*").alias("__c"))
    # single-partition window is BOUNDED: <= GINI_BUCKETS + 1 census rows
    w_b = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    prefix = bcnt.select(
        "__b", F.coalesce(F.sum("__c").over(w_b), F.lit(0)).alias("__pre")
    )
    ranked = within.join(F.broadcast(prefix), "__b").select(
        "s", (F.col("__pre") + F.col("__rk")).alias("r")
    )
    return (
        ranked.agg(
            F.count("*").alias("n"),
            F.sum("s").alias("S"),
            # the r*s terms MUST accumulate in DECIMAL(38,0): a BIGINT
            # product sum (~n^2 * mean cents) wraps int64 at ~1.5e6
            # customers -- ANSI raised exactly there at the r15 sf10
            # cert (the simhash_band_sweep r14-ADVICE accumulator-width
            # class; the oracle's HUGEINT sum never wraps).
            F.sum(F.expr("CAST(r AS DECIMAL(38,0)) * s")).alias("RS"),
        )
        .where(F.col("n") > 0)
        .select(
            F.col("n").cast("long").alias("n_customers"),
            F.col("S").cast("long").alias("total_cents"),
            F.expr(
                "CAST((2 * (2 * CAST(RS AS DECIMAL(38,0))"
                " - (n + 1) * CAST(S AS DECIMAL(38,0))) * 1000000"
                " + CAST(n AS DECIMAL(38,0)) * S)"
                " DIV (2 * CAST(n AS DECIMAL(38,0)) * S) AS BIGINT)"
            ).alias("gini_e6"),
        )
    )


QUERIES["gini_concentration"] = gini_concentration

ORACLES["gini_concentration"] = f"""
    WITH pc AS (
        SELECT o_custkey,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                   AS BIGINT) AS s
        FROM orders GROUP BY 1
    ), span AS (
        SELECT max(s) AS mx, min(s) AS mn FROM pc
    ), b AS (
        SELECT s, o_custkey,
               (s - mn) // ((mx - mn) // {GINI_BUCKETS} + 1) AS bk
        FROM pc CROSS JOIN span
    ), w AS (
        SELECT s, bk,
               row_number() OVER (
                   PARTITION BY bk ORDER BY s ASC, o_custkey ASC) AS rk
        FROM b
    ), bc AS (
        SELECT bk, count(*) AS c FROM b GROUP BY 1
    ), pre AS (
        SELECT bk, coalesce(sum(c) OVER (
            ORDER BY bk ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
        ), 0) AS pre FROM bc
    ), r AS (
        SELECT w.s, pre.pre + w.rk AS r FROM w JOIN pre USING (bk)
    )
    SELECT CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(s) AS BIGINT) AS total_cents,
           CAST((2 * (2 * CAST(sum(r * s) AS HUGEINT)
                 - (count(*) + 1) * CAST(sum(s) AS HUGEINT)) * 1000000
                 + CAST(count(*) AS HUGEINT) * sum(s))
                // (2 * CAST(count(*) AS HUGEINT) * sum(s)) AS BIGINT)
               AS gini_e6
    FROM r
    HAVING count(*) > 0
"""

# ----------------------------------------------------- kendall_tau_daily


def kendall_tau_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-a rank correlation between a type's daily event
    COUNT and daily total VALUE series -- "do busy days also carry
    value?" without Pearson's linearity assumption or Spearman's
    tie-averaged float ranks. Output (event_type, n_days, concordant,
    discordant, tau_e6): over all day pairs d1 < d2, concordant when
    the count delta and value delta share a strict sign, discordant
    when they oppose; ties contribute to neither (tau-a), and tau =
    (C - D) / (n(n-1)/2) reports as one sign-safe half-up e6 division
    (the pmod floor device -- tau is negative for anti-correlated
    series).

    Scale shape: ONE scan to the (type, day) grain; the pair frame is
    a within-type self-join over day-grain rows -- calendar-bounded
    (~days^2/2 per type, 6.6M pairs per type at a DECADE of days),
    never event-scale. 100 TB cost = the scan."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("c"),
    )
    daily = e.groupBy("event_type", "day").agg(
        F.count("*").alias("cnt"), F.sum("c").alias("v")
    )
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(b, "event_type").where(F.expr("a.day < b.day"))
    sgn = F.expr(
        "sign(b.cnt - a.cnt) * sign(b.v - a.v)"
    )
    per_type = pairs.groupBy("event_type").agg(
        F.sum(F.when(sgn > 0, 1).otherwise(0)).cast("long").alias("concordant"),
        F.sum(F.when(sgn < 0, 1).otherwise(0)).cast("long").alias("discordant"),
    )
    nd = daily.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_days")
    )
    num = "(2 * 1000000 * (concordant - discordant) + (n_days * (n_days - 1) DIV 2))"
    den = "(2 * (n_days * (n_days - 1) DIV 2))"
    return (
        per_type.join(nd, "event_type")
        .where(F.col("n_days") >= 2)
        .select(
            "event_type",
            "n_days",
            "concordant",
            "discordant",
            F.expr(
                f"({num} - pmod({num}, {den})) DIV {den}"
            ).alias("tau_e6"),
        )
        .orderBy("event_type")
    )


QUERIES["kendall_tau_daily"] = kendall_tau_daily

_KT_NUM = (
    "(2 * 1000000 * (concordant - discordant)"
    " + (n_days * (n_days - 1) // 2))"
)
_KT_DEN = "(2 * (n_days * (n_days - 1) // 2))"
ORACLES["kendall_tau_daily"] = f"""
    WITH daily AS (
        SELECT event_type,
               strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
               CAST(count(*) AS BIGINT) AS cnt,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                   AS BIGINT) AS v
        FROM events GROUP BY 1, 2
    ), pt AS (
        SELECT a.event_type,
               CAST(sum(CASE WHEN sign(b.cnt - a.cnt) * sign(b.v - a.v) > 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
               CAST(sum(CASE WHEN sign(b.cnt - a.cnt) * sign(b.v - a.v) < 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS discordant
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND a.day < b.day
        GROUP BY 1
    ), nd AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
        FROM daily GROUP BY 1
    )
    SELECT event_type, n_days, concordant, discordant,
           CAST(({_KT_NUM} - ((({_KT_NUM}) % {_KT_DEN} + {_KT_DEN})
                              % {_KT_DEN})) // {_KT_DEN} AS BIGINT)
               AS tau_e6
    FROM pt JOIN nd USING (event_type)
    WHERE n_days >= 2
    ORDER BY event_type
"""

# ------------------------------------------------------ runs_test_daily


def runs_test_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test for randomness of each type's daily
    value series: map the day-over-day deltas to up/down moves (zero
    deltas dropped, the standard treatment), count sign runs, and
    report the normal-approximation z against the random-ordering null
    -- |z| >> 2 means the series trends or oscillates rather than
    wandering. Output (event_type, n_up, n_down, n_runs, z_e6).

    Determinism: moves and runs are exact BIGINT counts off one
    lag() pass; mu = 2pm/(p+m) + 1 and sigma^2 =
    2pm(2pm-p-m)/((p+m)^2(p+m-1)) evaluate as ONE pinned-text double
    expression over those integers (identical IEEE on both engines),
    NULL-guarded for the degenerate series (fewer than two moves, or
    sigma^2 = 0 when p or m is 0 -- the all-NULL lake collapses here,
    the mannwhitney nullif rule).

    Scale shape: ONE scan to the (type, day) grain, one type-partitioned
    lag window (calendar-bounded frames), |types| report rows."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("c"),
    )
    daily = e.groupBy("event_type", "day").agg(F.sum("c").alias("v"))
    w = Window.partitionBy("event_type").orderBy(F.col("day").asc())
    moves = (
        daily.withColumn("__d", F.col("v") - F.lag("v").over(w))
        .where(F.col("__d").isNotNull() & (F.col("__d") != 0))
        .select(
            "event_type",
            "day",
            F.when(F.col("__d") > 0, 1).otherwise(0).alias("up"),
        )
    )
    w2 = Window.partitionBy("event_type").orderBy(F.col("day").asc())
    flagged = moves.withColumn(
        "__new_run",
        F.when(
            F.lag("up").over(w2).isNull()
            | (F.col("up") != F.lag("up").over(w2)),
            1,
        ).otherwise(0),
    )
    z_expr = (
        "CASE WHEN p > 0 AND m > 0 AND p + m > 1 THEN "
        "round((CAST(r AS DOUBLE) - (2.0D * p * m / (p + m) + 1.0D))"
        " / sqrt(2.0D * p * m * (2.0D * p * m - p - m)"
        " / ((CAST(p + m AS DOUBLE)) * (p + m) * (p + m - 1))), 6)"
        " ELSE NULL END"
    )
    return (
        flagged.groupBy("event_type")
        .agg(
            F.sum("up").cast("long").alias("p"),
            F.sum(F.expr("1 - up")).cast("long").alias("m"),
            F.sum("__new_run").cast("long").alias("r"),
        )
        .select(
            "event_type",
            F.col("p").alias("n_up"),
            F.col("m").alias("n_down"),
            F.col("r").alias("n_runs"),
            F.expr(z_expr).alias("z_e6"),
        )
        .orderBy("event_type")
    )


QUERIES["runs_test_daily"] = runs_test_daily

ORACLES["runs_test_daily"] = """
    WITH daily AS (
        SELECT event_type,
               strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                   AS BIGINT) AS v
        FROM events GROUP BY 1, 2
    ), mv AS (
        SELECT event_type, day,
               v - lag(v) OVER (PARTITION BY event_type ORDER BY day ASC)
                   AS d
        FROM daily
    ), moves AS (
        SELECT event_type, day,
               CASE WHEN d > 0 THEN 1 ELSE 0 END AS up
        FROM mv WHERE d IS NOT NULL AND d <> 0
    ), fl AS (
        SELECT event_type, up,
               CASE WHEN lag(up) OVER (
                        PARTITION BY event_type ORDER BY day ASC
                    ) IS NULL
                    OR up <> lag(up) OVER (
                        PARTITION BY event_type ORDER BY day ASC
                    ) THEN 1 ELSE 0 END AS new_run
        FROM moves
    ), agg AS (
        SELECT event_type,
               CAST(sum(up) AS BIGINT) AS p,
               CAST(sum(1 - up) AS BIGINT) AS m,
               CAST(sum(new_run) AS BIGINT) AS r
        FROM fl GROUP BY 1
    )
    SELECT event_type, p AS n_up, m AS n_down, r AS n_runs,
           CASE WHEN p > 0 AND m > 0 AND p + m > 1 THEN
               round((CAST(r AS DOUBLE) - (2.0 * p * m / (p + m) + 1.0))
               / sqrt(2.0 * p * m * (2.0 * p * m - p - m)
               / ((CAST(p + m AS DOUBLE)) * (p + m) * (p + m - 1))), 6)
           ELSE NULL END AS z_e6
    FROM agg
    ORDER BY event_type
"""

# ------------------------------------------------ winsorized_mean_by_type

#: winsorization percentiles (the robust-mean standard: clamp the 5%
#: tails instead of dropping them).
WINSOR_LO = 0.05
WINSOR_HI = 0.95


def winsorized_mean_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean of event value per type: clamp each value at the
    exact interpolated p5/p95 of its type, then average -- the robust
    center a metrics pipeline reports when raw means are whale-skewed
    but trimming would understate mass. Output (event_type, n,
    lo_cents, hi_cents, winsorized_mean_e4).

    Determinism: values are exact BIGINT cents; the interpolated
    percentile bounds (percentile <-> quantile_cont parity, proven by
    the percentiles key) are rounded HALF-UP TO INTEGER CENTS before
    clamping, so the clamped column stays BIGINT and the mean is one
    exact integer sum and one half-up e4 division -- no float
    accumulation order anywhere.

    Scale shape: two passes over the (type, value) projection -- one
    percentile aggregate (|types| rows, broadcast back), one clamped
    sum. 100 TB cost = two scans (or one with a cached projection)."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("c"),
    )
    bounds = e.groupBy("event_type").agg(
        F.expr(
            f"CAST(floor(percentile(c, {WINSOR_LO}) + 0.5) AS BIGINT)"
        ).alias("lo_cents"),
        F.expr(
            f"CAST(floor(percentile(c, {WINSOR_HI}) + 0.5) AS BIGINT)"
        ).alias("hi_cents"),
    )
    clamped = e.join(F.broadcast(bounds), "event_type").select(
        "event_type",
        "lo_cents",
        "hi_cents",
        F.expr("least(greatest(c, lo_cents), hi_cents)").alias("w"),
    )
    num = "(2 * 100 * sum(w) + count(*))"
    den = "(2 * count(*))"
    return (
        clamped.groupBy("event_type", "lo_cents", "hi_cents")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.expr(
                f"({num} - pmod({num}, {den})) DIV {den}"
            ).alias("winsorized_mean_e4"),
        )
        .select(
            "event_type", "n", "lo_cents", "hi_cents", "winsorized_mean_e4"
        )
        .orderBy("event_type")
    )


QUERIES["winsorized_mean_by_type"] = winsorized_mean_by_type

_WM_NUM = "(2 * 100 * sum(w) + count(*))"
_WM_DEN = "(2 * count(*))"
ORACLES["winsorized_mean_by_type"] = f"""
    WITH e AS (
        SELECT event_type,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
        FROM events
    ), b AS (
        SELECT event_type,
               CAST(floor(quantile_cont(c, {WINSOR_LO}) + 0.5) AS BIGINT)
                   AS lo_cents,
               CAST(floor(quantile_cont(c, {WINSOR_HI}) + 0.5) AS BIGINT)
                   AS hi_cents
        FROM e GROUP BY 1
    ), cl AS (
        SELECT e.event_type, b.lo_cents, b.hi_cents,
               least(greatest(e.c, b.lo_cents), b.hi_cents) AS w
        FROM e JOIN b USING (event_type)
    )
    SELECT event_type, CAST(count(*) AS BIGINT) AS n, lo_cents, hi_cents,
           CAST(({_WM_NUM} - ((({_WM_NUM}) % {_WM_DEN} + {_WM_DEN})
                              % {_WM_DEN})) // {_WM_DEN} AS BIGINT)
               AS winsorized_mean_e4
    FROM cl GROUP BY event_type, lo_cents, hi_cents
    ORDER BY event_type
"""
