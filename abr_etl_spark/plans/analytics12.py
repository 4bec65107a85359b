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
