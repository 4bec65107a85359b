"""Round-12 analytics batch 2: data-quality forensics and time-series
diagnostics -- the monitors an analyst points at a warehouse BEFORE
trusting it.

- ``benford_first_digit``: Benford's-law first-digit audit per order
  priority (the classic fabricated-numbers alarm).
- ``seasonal_index_dow``: day-of-week seasonal index of event value --
  integer-exact ratio-of-means via cross-multiplication.
- ``mutual_information_type_dow``: per-type mutual-information
  contribution between event_type and day-of-week (the effect-size
  companion to chi2_event_dow's test statistic).
- ``acf_daily_lag``: autocorrelation of the daily value series at lags
  1..7 per event type, exact DECIMAL moments, one float division.
- ``theilsen_slope_daily``: Theil-Sen robust trend slope per event type
  (median of pairwise slopes over a bounded trailing window).
- ``profile_columns``: the generic column profiler (null rate, distinct,
  min/max, top value) over orders via ONE unpivoted value census.

Reference parity: the reference (abr-etl, Go) ships its weekly delta to
Athena and leaves profiling/monitoring to downstream SQL; these are the
Spark-native shapes of that downstream work (SURVEY.md §2.B rationale).

Scale notes: every key reduces at the first shuffle to a bounded frame
-- digit cells (priorities x 9), DOW cells (7), (type, day) grains,
pairwise slopes over a TS_WINDOW_DAYS-bounded window, or a per-column
value census -- so the fact scan is touched once and everything
downstream is broadcast-sized.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from abr_etl_spark.functions.texthash import P
from abr_etl_spark.sources.lake import load_table

QUERIES: dict = {}
ORACLES: dict = {}

#: shared DOW anchor (a Monday; analytics8's convention) so both
#: engines derive day-of-week as pmod(datediff(day, anchor), 7).
_DOW_ANCHOR = "1992-01-06"

# ---------------------------------------------------- benford_first_digit

#: Benford expected first-digit probabilities log10(1 + 1/d), computed
#: ONCE here (CPython libm) and inlined as identical literals into both
#: engines' SQL -- no runtime log10 to diverge cross-engine.
BENFORD_P = {d: math.log10(1.0 + 1.0 / d) for d in range(1, 10)}


def _benford_term(p: float) -> str:
    """Pinned-text chi-square cell term (o - n*p)^2 / (n*p) -- ``o``
    BIGINT observed count, ``n`` BIGINT group total, ``p`` an inlined
    float literal. Shared verbatim by both engines."""
    return (
        f"((CAST(o AS DOUBLE) - CAST(n AS DOUBLE) * {p!r})"
        f" * (CAST(o AS DOUBLE) - CAST(n AS DOUBLE) * {p!r}))"
        f" / (CAST(n AS DOUBLE) * {p!r})"
    )


#: sorted-struct fold (chi2_event_dow's contract): both engines add the
#: nine digit terms in ascending digit order.
_BENFORD_FOLD = (
    "aggregate(array_sort(collect_list(s)), cast(0 as double), "
    "(acc, x) -> acc + x.t)"
)


def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit of o_totalprice per order priority: the
    first significant digit of a naturally-grown monetary amount
    follows P(d) = log10(1 + 1/d); a flat or spiky digit histogram is
    the classic fabricated-data alarm (Nigrini's forensic-accounting
    test). Output (o_orderpriority, n, chi2_benford) -- the chi-square
    distance from the Benford curve, 6-dp.

    Determinism: the first digit is extracted from the DECIMAL STRING
    of the exact cent value (substring of CAST(BIGINT AS STRING) --
    no float log10), expected probabilities are inlined literals, each
    cell term is one pinned-text double expression, and the nine terms
    fold in sorted (priority, digit) order.

    Scale shape: ONE scan map-side combines to |priorities| x 9 cells;
    the dense digit grid, marginals, and fold all run on that bounded
    frame (broadcast joins). 100 TB cost = the scan."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.expr(
            "CAST(substring(CAST(CAST(round(o_totalprice * 100, 0)"
            " AS BIGINT) AS STRING), 1, 1) AS INT)"
        ).alias("d"),
    )
    # census restricted to digits 1-9 BEFORE the marginal: zero /
    # negative / NULL amounts (d = 0, '-', NULL) must not inflate n,
    # or every expected count n*p skews while contributing no cell.
    cells = (
        o.where(F.col("d").between(1, 9))
        .groupBy("o_orderpriority", "d")
        .agg(F.count("*").alias("o"))
    )
    tot = cells.groupBy("o_orderpriority").agg(F.sum("o").alias("n"))
    grid = spark.createDataFrame([(d,) for d in range(1, 10)], "d int")
    term_case = "CASE " + " ".join(
        f"WHEN d = {d} THEN {_benford_term(p)}" for d, p in BENFORD_P.items()
    ) + " END"
    dense = (
        tot.crossJoin(broadcast(grid))
        .join(cells, ["o_orderpriority", "d"], "left")
        .select(
            "o_orderpriority",
            "n",
            "d",
            F.coalesce("o", F.lit(0)).alias("o"),
        )
    )
    terms = dense.select(
        "o_orderpriority",
        "n",
        F.struct(F.col("d").alias("k1"), F.expr(term_case).alias("t")).alias(
            "s"
        ),
    )
    return (
        terms.groupBy("o_orderpriority")
        .agg(
            F.max("n").cast("long").alias("n"),
            F.round(F.expr(_BENFORD_FOLD), 6).alias("chi2_benford"),
        )
        .orderBy("o_orderpriority")
    )


QUERIES["benford_first_digit"] = benford_first_digit


def _benford_oracle() -> str:
    term_case = "CASE " + " ".join(
        f"WHEN d = {d} THEN {_benford_term(p)}" for d, p in BENFORD_P.items()
    ) + " END"
    return f"""
        WITH cells AS MATERIALIZED (
            SELECT o_orderpriority, d, count(*) AS o
            FROM (
                SELECT o_orderpriority,
                       CAST(substring(CAST(CAST(round(o_totalprice * 100, 0)
                            AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS d
                FROM orders
            ) WHERE d BETWEEN 1 AND 9 GROUP BY 1, 2
        ), tot AS (
            SELECT o_orderpriority, sum(o) AS n FROM cells GROUP BY 1
        ), grid AS (
            SELECT CAST(unnest(range(1, 10)) AS INTEGER) AS d
        ), dense AS (
            SELECT t.o_orderpriority, t.n, g.d,
                   coalesce(c.o, 0) AS o
            FROM tot t CROSS JOIN grid g
            LEFT JOIN cells c
              ON c.o_orderpriority = t.o_orderpriority AND c.d = g.d
        ), terms AS (
            SELECT o_orderpriority, n,
                   {{'k1': d, 't': ({term_case})}} AS s
            FROM dense
        )
        SELECT o_orderpriority, CAST(max(n) AS BIGINT) AS n,
               round(list_aggregate(list_transform(list_sort(list(s)),
                     x -> x['t']), 'sum'), 6) AS chi2_benford
        FROM terms GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """


ORACLES["benford_first_digit"] = _benford_oracle()

# ---------------------------------------------------- seasonal_index_dow


def seasonal_index_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal index of event value: idx(d) = mean value
    on DOW d / overall mean value -- the ratio-to-overall seasonal
    profile (index 1.0 = flat). Output (dow, n, idx_e6) with the index
    an INTEGER-EXACT micro-unit: idx_e6 = (s_d * C * 1e6) DIV (c_d * S)
    where s/c are per-DOW cent sum/row count and S/C the global ones --
    cross-multiplied so no float division ever runs.

    Determinism: pure BIGINT/DECIMAL arithmetic end to end; DECIMAL(38)
    headroom holds to ~1e9 rows x $1e4 values (s_d*C*1e6 ~ 1e31 < 1e38).

    Scale shape: ONE scan map-side combines to 7 DOW cells; the global
    marginal is a broadcast of those same cells re-aggregated. 100 TB
    cost = the scan."""
    e = load_table(spark, sf_dir, "events").select(
        F.expr(
            f"pmod(datediff(CAST(ts AS DATE), DATE '{_DOW_ANCHOR}'), 7)"
        ).alias("dow"),
        F.expr("CAST(round(value * 100, 0) AS BIGINT)").alias("v_e2"),
    )
    cells = e.groupBy("dow").agg(
        F.count("*").alias("c_d"), F.sum("v_e2").alias("s_d")
    )
    tot = cells.agg(
        F.sum("c_d").alias("c_all"), F.sum("s_d").alias("s_all")
    )
    return (
        cells.crossJoin(broadcast(tot))
        .select(
            "dow",
            F.col("c_d").cast("long").alias("n"),
            F.expr(
                "CAST((CAST(s_d AS DECIMAL(38,0)) * c_all * 1000000)"
                " DIV (CAST(c_d AS DECIMAL(38,0)) * s_all) AS BIGINT)"
            ).alias("idx_e6"),
        )
        .orderBy("dow")
    )


QUERIES["seasonal_index_dow"] = seasonal_index_dow

ORACLES["seasonal_index_dow"] = f"""
    WITH cells AS MATERIALIZED (
        SELECT ((CAST(ts AS DATE) - DATE '{_DOW_ANCHOR}') % 7 + 7) % 7
                   AS dow,
               count(*) AS c_d,
               sum(CAST(round(value * 100, 0) AS BIGINT)) AS s_d
        FROM events GROUP BY 1
    ), tot AS (
        SELECT sum(c_d) AS c_all, sum(s_d) AS s_all FROM cells
    )
    SELECT CAST(dow AS INTEGER) AS dow, CAST(c_d AS BIGINT) AS n,
           CAST((CAST(s_d AS HUGEINT) * c_all * 1000000)
                // (CAST(c_d AS HUGEINT) * s_all) AS BIGINT) AS idx_e6
    FROM cells CROSS JOIN tot
    ORDER BY dow
"""

# ------------------------------------------- mutual_information_type_dow

#: sorted fold over the 7 DOW terms of one event type (chi2's contract).
_MI_FOLD = (
    "aggregate(array_sort(collect_list(s)), cast(0 as double), "
    "(acc, x) -> acc + x.t)"
)


def mutual_information_type_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type mutual-information contribution between event_type and
    day-of-week: MI = sum_{t,d} p(t,d) ln(p(t,d) / (p(t) p(d))); this
    reports each type's partial sum (event_type, n, mi_part) in nats,
    6-dp -- the EFFECT-SIZE companion to chi2_event_dow (chi2 grows
    with n even for trivial dependence; MI does not). Zero cells
    contribute exactly 0 and are skipped, so no dense grid is needed.

    Determinism: cell/marginal counts are exact BIGINTs; each term is
    the one pinned-text expression (o/T) * ln((o*T)/(r*c)) over those
    integers (o*T <= n^2 < 2^63 to ~3e9 rows); terms fold per type in
    sorted DOW order.

    Scale shape: identical to chi2_event_dow -- ONE map-side-combined
    aggregate to |types| x 7 cells, broadcast marginals, bounded fold."""
    e = load_table(spark, sf_dir, "events")
    cells = (
        e.select(
            "event_type",
            F.expr(
                f"pmod(datediff(CAST(ts AS DATE), DATE '{_DOW_ANCHOR}'), 7)"
            ).alias("dow"),
        )
        .groupBy("event_type", "dow")
        .agg(F.count("*").alias("o"))
    )
    rows = cells.groupBy("event_type").agg(F.sum("o").alias("r"))
    cols = cells.groupBy("dow").agg(F.sum("o").alias("c"))
    tot = cells.agg(F.sum("o").alias("T"))
    terms = (
        cells.join(broadcast(rows), "event_type")
        .join(broadcast(cols), "dow")
        .crossJoin(broadcast(tot))
        .select(
            "event_type",
            "r",
            F.struct(
                F.col("dow").alias("k1"),
                F.expr(
                    "(CAST(o AS DOUBLE) / CAST(T AS DOUBLE))"
                    " * ln(CAST(o * T AS DOUBLE) / CAST(r * c AS DOUBLE))"
                ).alias("t"),
            ).alias("s"),
        )
    )
    return (
        terms.groupBy("event_type")
        .agg(
            F.max("r").cast("long").alias("n"),
            F.round(F.expr(_MI_FOLD), 6).alias("mi_part"),
        )
        .orderBy("event_type")
    )


QUERIES["mutual_information_type_dow"] = mutual_information_type_dow

ORACLES["mutual_information_type_dow"] = f"""
    WITH cells AS MATERIALIZED (
        SELECT event_type,
               ((CAST(ts AS DATE) - DATE '{_DOW_ANCHOR}') % 7 + 7) % 7
                   AS dow,
               count(*) AS o
        FROM events GROUP BY 1, 2
    ), rws AS (SELECT event_type, sum(o) AS r FROM cells GROUP BY 1),
    cls AS (SELECT dow, sum(o) AS c FROM cells GROUP BY 1),
    tot AS (SELECT sum(o) AS T FROM cells),
    terms AS (
        SELECT cells.event_type, r,
               {{'k1': dow,
                 't': (CAST(o AS DOUBLE) / CAST(T AS DOUBLE))
                      * ln(CAST(o * T AS DOUBLE) / CAST(r * c AS DOUBLE))}}
                   AS s
        FROM cells
        JOIN rws USING (event_type) JOIN cls USING (dow) CROSS JOIN tot
    )
    SELECT event_type, CAST(max(r) AS BIGINT) AS n,
           round(list_aggregate(list_transform(list_sort(list(s)),
                 x -> x['t']), 'sum'), 6) AS mi_part
    FROM terms GROUP BY event_type
    ORDER BY event_type
"""

# --------------------------------------------------------- acf_daily_lag

#: autocorrelation lags reported (days).
ACF_MAX_LAG = 7


def acf_daily_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the daily event-value series at lags 1..{lag}
    per event type -- the seasonality detector (a weekly cycle shows as
    a lag-7 peak). acf(k) = sum_t (x_t - m)(x_{{t+k}} - m) / sum_t
    (x_t - m)^2 with m the series mean; pairs join on calendar day + k,
    so missing days simply contribute no pair. Output (event_type,
    lag, n_pairs, acf) 6-dp.

    Determinism: daily sums are exact BIGINT cents; both numerator and
    denominator are cleared of the rational mean by multiplying through
    by n^2 -- num*n^2 = n^2*Sxy - n*s*Spair + m_k*s^2, den*n^2 =
    n^2*Sxx - n*s^2 -- all in DECIMAL(38,0) EXACTLY (headroom ~1e9
    rows/day-grain); the single float op is the final division of the
    two exact decimals, identical cross-engine.

    Scale shape: ONE scan to the (type, day) grain; the lag pairs are a
    broadcast-grid day-offset self-join of that bounded frame; partial
    sums reduce to |types| x {lag} rows."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("CAST(ts AS DATE)").alias("day"),
        F.expr("CAST(round(value * 100, 0) AS BIGINT)").alias("v_e2"),
    )
    daily = e.groupBy("event_type", "day").agg(F.sum("v_e2").alias("v"))
    mom = daily.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("v").cast("decimal(38,0)").alias("s"),
        F.sum(F.expr("CAST(v AS DECIMAL(38,0)) * v")).alias("sxx"),
    )
    lg = spark.createDataFrame(
        [(k,) for k in range(1, ACF_MAX_LAG + 1)], "lag int"
    )
    pairs = (
        daily.crossJoin(broadcast(lg))
        .alias("a")
        .join(
            daily.alias("b"),
            (F.col("a.event_type") == F.col("b.event_type"))
            & (
                F.col("b.day")
                == F.expr("date_add(a.day, a.lag)")
            ),
        )
        .select(
            F.col("a.event_type").alias("event_type"),
            F.col("a.lag").alias("lag"),
            F.col("a.v").alias("x"),
            F.col("b.v").alias("y"),
        )
        .groupBy("event_type", "lag")
        .agg(
            F.count("*").alias("m_k"),
            F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * y")).alias("sxy"),
            F.sum(F.expr("CAST(x AS DECIMAL(38,0)) + y")).alias("spair"),
        )
    )
    return (
        pairs.join(broadcast(mom), "event_type")
        .select(
            "event_type",
            "lag",
            F.col("m_k").cast("long").alias("n_pairs"),
            F.round(
                F.expr(
                    "CAST(CAST(n AS DECIMAL(38,0)) * n * sxy"
                    " - CAST(n AS DECIMAL(38,0)) * s * spair"
                    " + CAST(m_k AS DECIMAL(38,0)) * s * s AS DOUBLE)"
                    " / CAST(CAST(n AS DECIMAL(38,0)) * n * sxx"
                    " - CAST(n AS DECIMAL(38,0)) * s * s AS DOUBLE)"
                ),
                6,
            ).alias("acf"),
        )
        .orderBy("event_type", "lag")
    )


QUERIES["acf_daily_lag"] = acf_daily_lag

ORACLES["acf_daily_lag"] = f"""
    WITH daily AS MATERIALIZED (
        SELECT event_type, CAST(ts AS DATE) AS day,
               sum(CAST(round(value * 100, 0) AS BIGINT)) AS v
        FROM events GROUP BY 1, 2
    ), mom AS (
        SELECT event_type, count(*) AS n,
               CAST(sum(v) AS DECIMAL(38,0)) AS s,
               sum(CAST(v AS DECIMAL(38,0)) * v) AS sxx
        FROM daily GROUP BY 1
    ), lg AS (
        SELECT CAST(unnest(range(1, {ACF_MAX_LAG + 1})) AS INTEGER) AS lag
    ), pairs AS (
        SELECT a.event_type, a.lag, count(*) AS m_k,
               sum(CAST(a.v AS DECIMAL(38,0)) * b.v) AS sxy,
               sum(CAST(a.v AS DECIMAL(38,0)) + b.v) AS spair
        FROM (SELECT daily.*, lag FROM daily CROSS JOIN lg) a
        JOIN daily b
          ON b.event_type = a.event_type
         AND b.day = a.day + CAST(a.lag AS INTEGER)
        GROUP BY 1, 2
    )
    SELECT p.event_type, p.lag, CAST(m_k AS BIGINT) AS n_pairs,
           round(CAST(CAST(n AS DECIMAL(38,0)) * n * sxy
                      - CAST(n AS DECIMAL(38,0)) * s * spair
                      + CAST(m_k AS DECIMAL(38,0)) * s * s AS DOUBLE)
                 / CAST(CAST(n AS DECIMAL(38,0)) * n * sxx
                        - CAST(n AS DECIMAL(38,0)) * s * s AS DOUBLE),
                 6) AS acf
    FROM pairs p JOIN mom USING (event_type)
    ORDER BY p.event_type, p.lag
"""

# ---------------------------------------------------- theilsen_slope_daily

#: trailing window (calendar days, relative to the global max day) the
#: slope is fit over -- bounds the pairwise-slope frame to
#: ~|types| x W^2/2 rows at EVERY sf (the Theil-Sen estimator is
#: quadratic in the series length by construction).
TS_WINDOW_DAYS = 120


def theilsen_slope_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend per event type: the MEDIAN of all
    pairwise slopes (v_j - v_i) / (d_j - d_i) over the daily value
    series of the trailing {w}-day window -- a single outlier day
    cannot move it (vs linreg_normal_eq's least squares, which it
    breaks). Output (event_type, n_days, n_pairs, slope_e2) -- median
    slope in cents/day, 6-dp.

    Determinism: each slope is ONE IEEE division of exact BIGINT cent
    and day-count integers (bit-identical cross-engine); the median is
    the exact order statistic -- row_number over (slope, i, j) picks
    ranks ceil(m/2) and ceil((m+1)/2), averaged with one pinned-text
    expression. The (i, j) tie-break makes the pick deterministic even
    under duplicate slope values.

    Scale shape: ONE scan to the (type, day) grain, window-filtered to
    <= {w} days per type, then a per-type self-join bounded at {w}^2/2
    pairs -- the frame is grid-bounded, NOT data-bounded, so the plan
    survives any corpus size unchanged."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("CAST(ts AS DATE)").alias("day"),
        F.expr("CAST(round(value * 100, 0) AS BIGINT)").alias("v_e2"),
    )
    daily = e.groupBy("event_type", "day").agg(F.sum("v_e2").alias("v"))
    mx = daily.agg(F.max("day").alias("dmax"))
    win = (
        daily.crossJoin(broadcast(mx))
        .where(F.expr(f"day > date_sub(dmax, {TS_WINDOW_DAYS})"))
        .select("event_type", "day", "v")
    )
    pairs = (
        win.alias("a")
        .join(
            win.alias("b"),
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.day") < F.col("b.day")),
        )
        .select(
            F.col("a.event_type").alias("event_type"),
            F.col("a.day").alias("di"),
            F.col("b.day").alias("dj"),
            F.expr(
                "CAST(b.v - a.v AS DOUBLE)"
                " / CAST(datediff(b.day, a.day) AS DOUBLE)"
            ).alias("slope"),
        )
    )
    wr = Window.partitionBy("event_type").orderBy("slope", "di", "dj")
    ranked = pairs.select(
        "event_type", "slope", F.row_number().over(wr).alias("rn")
    )
    stats = win.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_days")
    )
    m = ranked.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_pairs")
    )
    med = (
        ranked.join(broadcast(m), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n_pairs").alias("n_pairs"),
            F.round(
                F.expr(
                    "(max(CASE WHEN rn = CAST((n_pairs + 1) DIV 2 AS INT)"
                    " THEN slope END)"
                    " + max(CASE WHEN rn = CAST((n_pairs + 2) DIV 2 AS INT)"
                    " THEN slope END)) / 2"
                ),
                6,
            ).alias("slope_e2"),
        )
    )
    return (
        stats.join(med, "event_type")
        .select("event_type", "n_days", "n_pairs", "slope_e2")
        .orderBy("event_type")
    )


QUERIES["theilsen_slope_daily"] = theilsen_slope_daily

ORACLES["theilsen_slope_daily"] = f"""
    WITH daily AS MATERIALIZED (
        SELECT event_type, CAST(ts AS DATE) AS day,
               sum(CAST(round(value * 100, 0) AS BIGINT)) AS v
        FROM events GROUP BY 1, 2
    ), mx AS (SELECT max(day) AS dmax FROM daily),
    win AS MATERIALIZED (
        SELECT event_type, day, v FROM daily CROSS JOIN mx
        WHERE day > dmax - {TS_WINDOW_DAYS}
    ), pairs AS (
        SELECT a.event_type,
               CAST(b.v - a.v AS DOUBLE)
                   / CAST(b.day - a.day AS DOUBLE) AS slope,
               a.day AS di, b.day AS dj
        FROM win a JOIN win b
          ON b.event_type = a.event_type AND a.day < b.day
    ), ranked AS (
        SELECT event_type, slope,
               row_number() OVER (PARTITION BY event_type
                   ORDER BY slope, di, dj) AS rn
        FROM pairs
    ), m AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs
        FROM ranked GROUP BY event_type
    ), med AS (
        SELECT event_type, max(n_pairs) AS n_pairs,
               round((max(CASE WHEN rn = (n_pairs + 1) // 2
                          THEN slope END)
                      + max(CASE WHEN rn = (n_pairs + 2) // 2
                            THEN slope END)) / 2, 6) AS slope_e2
        FROM ranked JOIN m USING (event_type) GROUP BY event_type
    ), stats AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
        FROM win GROUP BY event_type
    )
    SELECT s.event_type, s.n_days, m.n_pairs, m.slope_e2
    FROM stats s JOIN med m USING (event_type)
    ORDER BY s.event_type
"""

# -------------------------------------------------------- profile_columns

#: profiled orders columns -> (string form, injective sort key). The
#: sort key is the value's natural order embedded in a string (numerics
#: zero-padded; dates/strings already ordinal), so min/max/top-tie-break
#: all resolve on ONE census frame without per-type branches.
_PROFILE_COLS: list[tuple[str, str, str]] = [
    ("o_orderkey", "CAST(o_orderkey AS STRING)",
     "lpad(CAST(o_orderkey AS STRING), 20, '0')"),
    ("o_custkey", "CAST(o_custkey AS STRING)",
     "lpad(CAST(o_custkey AS STRING), 20, '0')"),
    ("o_orderstatus", "o_orderstatus", "o_orderstatus"),
    ("o_totalprice_e2",
     "CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT) AS STRING)",
     "lpad(CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT) AS STRING),"
     " 20, '0')"),
    ("o_orderdate", "CAST(CAST(o_orderdate AS DATE) AS STRING)",
     "CAST(CAST(o_orderdate AS DATE) AS STRING)"),
    ("o_orderpriority", "o_orderpriority", "o_orderpriority"),
]


def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The generic column profiler over orders -- the first query a
    data platform runs against a new feed: per column, (n_null,
    n_distinct, min_s, max_s, top_value, top_freq), with the mode's
    ties broken toward the smallest value. Numeric columns profile via
    exact cent/key strings; min/max order on an injective zero-padded
    sort key, so '9' < '10' resolves numerically.

    Scale shape: ONE unpivoted scan (|cols| struct projections, no
    shuffle yet) -> ONE grouped (col, value) census with map-side
    combine -- the census is value-cardinality-bounded, and every
    downstream stat (nulls, distinct, extrema, mode) reduces the census,
    never the fact table. At 100 TB this is the profiler that works;
    per-column full-table passes are the one that does not.

    Determinism: counts are exact; extrema/mode resolve via min_by/
    max_by over the injective sort key with pinned tie-breaks."""
    o = load_table(spark, sf_dir, "orders")
    stack_expr = "stack({n}, {args}) AS (col, val_s, val_k)".format(
        n=len(_PROFILE_COLS),
        args=", ".join(
            f"'{name}', {vs}, {vk}" for name, vs, vk in _PROFILE_COLS
        ),
    )
    census = (
        o.select(F.expr(stack_expr))
        .groupBy("col", "val_s", "val_k")
        .agg(F.count("*").alias("c"))
    )
    wtop = Window.partitionBy("col").orderBy(
        F.col("c").desc(), F.col("val_k").asc()
    )
    nn = census.where(F.col("val_s").isNotNull())
    top = (
        nn.withColumn("rn", F.row_number().over(wtop))
        .where(F.col("rn") == 1)
        .select(
            "col",
            F.col("val_s").alias("top_value"),
            F.col("c").cast("long").alias("top_freq"),
        )
    )
    stats = nn.groupBy("col").agg(
        F.count("*").cast("long").alias("n_distinct"),
        F.expr("min_by(val_s, val_k)").alias("min_s"),
        F.expr("max_by(val_s, val_k)").alias("max_s"),
    )
    nulls = census.groupBy("col").agg(
        F.coalesce(
            F.sum(F.when(F.col("val_s").isNull(), F.col("c"))), F.lit(0)
        )
        .cast("long")
        .alias("n_null")
    )
    return (
        nulls.join(stats, "col")
        .join(top, "col")
        .select(
            "col", "n_null", "n_distinct", "min_s", "max_s",
            "top_value", "top_freq",
        )
        .orderBy("col")
    )


QUERIES["profile_columns"] = profile_columns


def _profile_oracle() -> str:
    unions = "\nUNION ALL\n".join(
        f"SELECT '{name}' AS col, {vs} AS val_s, {vk} AS val_k FROM orders"
        .replace(" AS STRING)", " AS VARCHAR)")
        for name, vs, vk in _PROFILE_COLS
    )
    return f"""
        WITH unp AS MATERIALIZED ({unions}),
        census AS MATERIALIZED (
            SELECT col, val_s, val_k, count(*) AS c
            FROM unp GROUP BY 1, 2, 3
        ), nn AS (SELECT * FROM census WHERE val_s IS NOT NULL),
        top AS (
            SELECT col, val_s AS top_value, CAST(c AS BIGINT) AS top_freq
            FROM (
                SELECT *, row_number() OVER (PARTITION BY col
                    ORDER BY c DESC, val_k ASC) AS rn
                FROM nn
            ) WHERE rn = 1
        ), stats AS (
            SELECT col, CAST(count(*) AS BIGINT) AS n_distinct,
                   min_by(val_s, val_k) AS min_s,
                   max_by(val_s, val_k) AS max_s
            FROM nn GROUP BY col
        ), nulls AS (
            SELECT col,
                   CAST(coalesce(sum(CASE WHEN val_s IS NULL THEN c END),
                        0) AS BIGINT) AS n_null
            FROM census GROUP BY col
        )
        SELECT col, n_null, n_distinct, min_s, max_s, top_value, top_freq
        FROM nulls JOIN stats USING (col) JOIN top USING (col)
        ORDER BY col
    """


ORACLES["profile_columns"] = _profile_oracle()

# ---------------------------------------------------- decompose_trend_dow

#: sorted-struct fold returning (sum, count) of ratio terms -- both
#: engines add per-day ratios in calendar order.
_DTD_FOLD_SUM = (
    "aggregate(array_sort(collect_list(s)), cast(0 as double), "
    "(acc, x) -> acc + x.t)"
)


def decompose_trend_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical multiplicative decomposition of the daily event-value
    series (the ratio-to-moving-average method -- STL's ancestor and
    the textbook X-11 step): trend = centered 7-day moving window,
    seasonal = the DOW mean of the detrended ratio normalized to mean
    1 over the week, remainder = ratio / seasonal. Output one row per
    interior day (day, v_e2, trend_sum_e2, ratio, seasonal, remainder),
    6-dp floats -- the series health dashboard in one frame.

    Determinism: daily sums are exact BIGINT cents; the trend window
    is kept as the un-divided 7-day SUM (integer), with edge windows
    (fewer than 7 calendar-contiguous days) excluded by an integer
    day-span check rather than emitting a biased partial mean; ratio =
    7*v/trend_sum is the first float op; the DOW means and the weekly
    normalizer fold in sorted (day / dow) order.

    Scale shape: ONE scan to the day grain; everything after is
    windows and broadcast joins over the |days| frame (calendar-
    bounded, not row-bounded)."""
    e = load_table(spark, sf_dir, "events").select(
        F.expr("CAST(ts AS DATE)").alias("day"),
        F.expr("CAST(round(value * 100, 0) AS BIGINT)").alias("v_e2"),
    )
    daily = e.groupBy("day").agg(F.sum("v_e2").alias("v"))
    w7 = Window.orderBy("day").rowsBetween(-3, 3)
    tr = daily.select(
        "day",
        "v",
        F.sum("v").over(w7).alias("tsum"),
        F.count("*").over(w7).alias("tcnt"),
        F.expr(f"datediff(max(day) OVER (ORDER BY day ROWS BETWEEN 3 "
               f"PRECEDING AND 3 FOLLOWING), min(day) OVER (ORDER BY day "
               f"ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING))").alias("span"),
    ).where((F.col("tcnt") == 7) & (F.col("span") == 6))
    rat = tr.select(
        "day",
        "v",
        "tsum",
        F.expr(
            f"pmod(datediff(day, DATE '{_DOW_ANCHOR}'), 7)"
        ).alias("dow"),
        F.expr("7 * CAST(v AS DOUBLE) / CAST(tsum AS DOUBLE)").alias("r"),
    )
    sdow = (
        rat.select(
            "dow",
            F.struct(F.col("day").alias("k1"), F.col("r").alias("t")).alias(
                "s"
            ),
        )
        .groupBy("dow")
        .agg(
            (F.expr(_DTD_FOLD_SUM) / F.count("*")).alias("s_raw")
        )
    )
    norm = sdow.select(
        F.struct(F.col("dow").alias("k1"), F.col("s_raw").alias("t")).alias(
            "s"
        )
    ).agg(F.expr(_DTD_FOLD_SUM).alias("s_tot"))
    seas = sdow.crossJoin(broadcast(norm)).select(
        "dow", F.expr("s_raw * 7 / s_tot").alias("seasonal")
    )
    return (
        rat.join(broadcast(seas), "dow")
        .select(
            F.expr("CAST(day AS STRING)").alias("day"),
            F.col("v").alias("v_e2"),
            F.col("tsum").alias("trend_sum_e2"),
            F.round("r", 6).alias("ratio"),
            F.round("seasonal", 6).alias("seasonal"),
            F.round(F.expr("r / seasonal"), 6).alias("remainder"),
        )
        .orderBy("day")
    )


QUERIES["decompose_trend_dow"] = decompose_trend_dow

ORACLES["decompose_trend_dow"] = f"""
    WITH daily AS MATERIALIZED (
        SELECT CAST(ts AS DATE) AS day,
               sum(CAST(round(value * 100, 0) AS BIGINT)) AS v
        FROM events GROUP BY 1
    ), tr AS MATERIALIZED (
        SELECT day, v, tsum, dow,
               7 * CAST(v AS DOUBLE) / CAST(tsum AS DOUBLE) AS r
        FROM (
            SELECT day, v,
                   sum(v) OVER w AS tsum,
                   count(*) OVER w AS tcnt,
                   max(day) OVER w - min(day) OVER w AS span,
                   ((day - DATE '{_DOW_ANCHOR}') % 7 + 7) % 7 AS dow
            FROM daily
            WINDOW w AS (ORDER BY day
                ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
        ) WHERE tcnt = 7 AND span = 6
    ), sdow AS MATERIALIZED (
        SELECT dow,
               list_aggregate(list_transform(
                   list_sort(list({{'k1': day, 't': r}})), x -> x['t']),
                   'sum') / count(*) AS s_raw
        FROM tr GROUP BY dow
    ), norm AS (
        SELECT list_aggregate(list_transform(
                   list_sort(list({{'k1': dow, 't': s_raw}})), x -> x['t']),
                   'sum') AS s_tot
        FROM sdow
    ), seas AS (
        SELECT dow, s_raw * 7 / s_tot AS seasonal
        FROM sdow CROSS JOIN norm
    )
    SELECT CAST(day AS VARCHAR) AS day, CAST(v AS BIGINT) AS v_e2,
           CAST(tsum AS BIGINT) AS trend_sum_e2,
           round(r, 6) AS ratio, round(seasonal, 6) AS seasonal,
           round(r / seasonal, 6) AS remainder
    FROM tr JOIN seas USING (dow)
    ORDER BY day
"""

# -------------------------------------------------- stratified_kfold_assign

#: fold count for cross-validation assignment.
KFOLD_K = 5
#: LCG + squaring mix (bootstrap_ci_poisson's lesson: affine-only
#: hashes stripe shards into one band).
_KF_A = 1664525
_KF_C = 1013904223


def _kf_fold_expr(id_col: str) -> str:
    """Deterministic fold id in [0, K) -- shared Spark/DuckDB text."""
    u0 = f"(({_KF_A} * (CAST({id_col} AS BIGINT) + 1) + {_KF_C}) % {P})"
    u1 = f"(({u0} * {u0} + {u0}) % {P})"
    return f"CAST({u1} % {KFOLD_K} AS INT)"


def stratified_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified k-fold assignment for cross-validation:
    every event lands in fold = mix(event_id) % {k}, and the report
    audits the balance the modeler cares about -- per (event_type,
    fold): row count and the fold's share of its stratum in exact
    1e-6 units (share_e6 = n*1e6 DIV stratum_total). A healthy
    assignment reads ~200_000 +/- noise in every cell.

    Determinism: the fold id is the squared-LCG integer mix (no RNG,
    re-runs reproduce bit-for-bit -- the property that makes CV
    results auditable); shares are integer cross-divisions.

    Scale shape: fold assignment is pure map-side arithmetic at the
    scan; ONE grouped census to |types| x {k} cells. The assignment
    column itself (not shown) rides the row for free -- zero shuffle
    beyond the audit's census."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr(_kf_fold_expr("event_id")).alias("fold")
    )
    cells = e.groupBy("event_type", "fold").agg(F.count("*").alias("n"))
    tot = cells.groupBy("event_type").agg(F.sum("n").alias("n_t"))
    return (
        cells.join(broadcast(tot), "event_type")
        .select(
            "event_type",
            "fold",
            F.col("n").cast("long").alias("n"),
            F.expr("CAST(n * 1000000 DIV n_t AS BIGINT)").alias("share_e6"),
        )
        .orderBy("event_type", "fold")
    )


QUERIES["stratified_kfold_assign"] = stratified_kfold_assign

ORACLES["stratified_kfold_assign"] = f"""
    WITH cells AS MATERIALIZED (
        SELECT event_type, {_kf_fold_expr('event_id')} AS fold,
               count(*) AS n
        FROM events GROUP BY 1, 2
    ), tot AS (SELECT event_type, sum(n) AS n_t FROM cells GROUP BY 1)
    SELECT event_type, fold, CAST(n AS BIGINT) AS n,
           CAST(n * 1000000 // n_t AS BIGINT) AS share_e6
    FROM cells JOIN tot USING (event_type)
    ORDER BY event_type, fold
"""
