"""Round-12 analytics: distributed uncertainty quantification via the
Poisson bootstrap -- THE resampling scheme that works on sharded data,
because each row draws its replicate weights independently (no global
index, no sampling-without-replacement coordination across executors).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from abr_etl_spark.functions.texthash import P
from abr_etl_spark.sources.lake import load_table

QUERIES: dict = {}
ORACLES: dict = {}

# --------------------------------------------------- bootstrap_ci_poisson

#: bootstrap replicates; 100 gives 2.5/97.5 percentile ranks 3 and 98.
BOOT_B = 100
#: order-statistic ranks of the B replicate means forming the ~95% CI.
BOOT_LO_RANK = 3
BOOT_HI_RANK = 98
#: Poisson(1) inverse-CDF ladder as EXACT integer thresholds on the
#: [0, P) uniform hash: floor(P * CDF(k)) for k = 0..5 (weights beyond
#: 6 have probability < 1e-4 and clamp to 6). Integer comparisons only
#: -- no float CDF to diverge cross-engine.
_POIS_CDF = [
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
]
BOOT_THRESH = [int(P * c) for c in _POIS_CDF]

#: LCG mixing constants for the per-(row, replicate) uniform draw.
_LCG_A = 1664525
_LCG_C = 1013904223


def _w_expr(id_col: str, b_col: str) -> str:
    """Poisson(1) weight for (row, replicate) -- shared Spark/DuckDB
    text: a NONLINEAR hash of the row id and replicate index into
    [0, P), then the integer CDF ladder. A single linear LCG round is
    not enough: for fixed b it maps consecutive ids to an arithmetic
    progression mod P, so a shard's draws huddle in one narrow band
    and whole replicates collapse to all-zero / all-heavy weights
    (measured: 20% of replicates empty over 200 rows). The squaring
    round breaks the progression; per-replicate weight sums then match
    Poisson(1) x n (mean ~n, sd ~sqrt(2n))."""
    u0 = (
        f"(({_LCG_A} * (CAST({id_col} AS BIGINT) + 1)"
        f" + {_LCG_C} * (CAST({b_col} AS BIGINT) + 1)) % {P})"
    )
    u1 = f"(({u0} * {u0} + {u0} + CAST({b_col} AS BIGINT)) % {P})"
    u = f"(({u1} * {_LCG_A} + {_LCG_C}) % {P})"
    ladder = "CASE "
    for k, t in enumerate(BOOT_THRESH):
        ladder += f"WHEN {u} < {t} THEN {k} "
    ladder += "ELSE 6 END"
    return ladder


def bootstrap_ci_poisson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~95% bootstrap confidence interval for the mean event value per
    event type, via the POISSON bootstrap (Chamandy et al. 2012 --
    'Estimating Uncertainty for Massive Data Streams', the
    shard-friendly bootstrap): instead of resampling n rows with
    replacement (needs a global index), every row independently draws
    Poisson(1) multiplicity per replicate, which converges to the same
    bootstrap distribution and is embarrassingly parallel. Output
    (event_type, n, mean_e2, lo_e2, hi_e2) -- point mean and the
    2.5/97.5 percentile replicate means, cent-integer units.

    Determinism: the per-(row, replicate) weight is an LCG mix of
    event_id and the replicate index against EXACT integer Poisson-CDF
    thresholds; values fold as BIGINT cents; replicate means are
    integer DIVs; the CI picks order statistics of the {BOOT_B}
    replicate means -- no float enters until display, so both engines
    agree bit-for-bit.

    Scale shape: ONE scan with a broadcast {BOOT_B}-row replicate grid;
    the crossed frame map-side combines straight down to
    |event_types| x {BOOT_B} partial sums -- shuffle carries only
    those, never the expanded rows. At 100 TB this is the textbook
    one-pass uncertainty sweep; B scales the combine width, not the
    shuffle."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.expr("CAST(round(value * 100, 0) AS BIGINT)").alias("v_e2"),
    )
    bg = spark.createDataFrame([(b,) for b in range(BOOT_B)], "b int")
    reps = (
        e.crossJoin(broadcast(bg))
        .withColumn("w", F.expr(_w_expr("event_id", "b")))
        .groupBy("event_type", "b")
        .agg(
            F.sum("w").alias("sw"),
            F.sum(F.expr("w * v_e2")).alias("swv"),
        )
        .where(F.col("sw") > 0)
        .select(
            "event_type",
            "b",
            F.expr("CAST((2 * swv + sw) DIV (2 * sw) AS BIGINT)").alias(
                "mean_b_e2"
            ),
        )
    )
    wr = Window.partitionBy("event_type").orderBy(
        F.col("mean_b_e2").asc(), F.col("b").asc()
    )
    ci = (
        reps.withColumn("rn", F.row_number().over(wr))
        .where(F.col("rn").isin(BOOT_LO_RANK, BOOT_HI_RANK))
        .groupBy("event_type")
        .agg(
            F.max(
                F.when(F.col("rn") == BOOT_LO_RANK, F.col("mean_b_e2"))
            ).alias("lo_e2"),
            F.max(
                F.when(F.col("rn") == BOOT_HI_RANK, F.col("mean_b_e2"))
            ).alias("hi_e2"),
        )
    )
    point = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.expr(
                "CAST((2 * sum(CAST(round(value * 100, 0) AS BIGINT))"
                " + count(*)) DIV (2 * count(*)) AS BIGINT)"
            ).alias("mean_e2"),
        )
    )
    return (
        point.join(ci, "event_type")
        .select("event_type", "n", "mean_e2", "lo_e2", "hi_e2")
        .orderBy("event_type")
    )


QUERIES["bootstrap_ci_poisson"] = bootstrap_ci_poisson


def _bootstrap_oracle() -> str:
    w = _w_expr("event_id", "b")
    return f"""
        WITH e AS MATERIALIZED (
            SELECT event_id, event_type,
                   CAST(round(value * 100, 0) AS BIGINT) AS v_e2
            FROM events
        ), bg AS (
            SELECT CAST(unnest(range(0, {BOOT_B})) AS INTEGER) AS b
        ), reps AS MATERIALIZED (
            SELECT event_type, b,
                   CAST((2 * swv + sw) // (2 * sw) AS BIGINT)
                       AS mean_b_e2
            FROM (
                SELECT event_type, b,
                       CAST(sum(w) AS BIGINT) AS sw,
                       CAST(sum(w * v_e2) AS BIGINT) AS swv
                FROM (SELECT e.*, bg.b, ({w}) AS w FROM e, bg)
                GROUP BY event_type, b
            ) WHERE sw > 0
        ), ranked AS (
            SELECT event_type, mean_b_e2,
                   row_number() OVER (PARTITION BY event_type
                       ORDER BY mean_b_e2 ASC, b ASC) AS rn
            FROM reps
        ), ci AS (
            SELECT event_type,
                   max(CASE WHEN rn = {BOOT_LO_RANK} THEN mean_b_e2 END)
                       AS lo_e2,
                   max(CASE WHEN rn = {BOOT_HI_RANK} THEN mean_b_e2 END)
                       AS hi_e2
            FROM ranked WHERE rn IN ({BOOT_LO_RANK}, {BOOT_HI_RANK})
            GROUP BY event_type
        ), point AS (
            SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                   CAST((2 * sum(CAST(round(value * 100, 0) AS BIGINT))
                         + count(*)) // (2 * count(*)) AS BIGINT)
                       AS mean_e2
            FROM events GROUP BY event_type
        )
        SELECT p.event_type, p.n, p.mean_e2,
               CAST(c.lo_e2 AS BIGINT) AS lo_e2,
               CAST(c.hi_e2 AS BIGINT) AS hi_e2
        FROM point p JOIN ci c USING (event_type)
        ORDER BY p.event_type
    """


ORACLES["bootstrap_ci_poisson"] = _bootstrap_oracle()

# --------------------------------------------------- psi_drift_by_source

#: quantile bucket count for the PSI binning (the industry-standard 10).
PSI_BUCKETS = 10
#: sorted-struct fold (chi2_event_dow's pattern): both engines add the
#: per-bucket terms in the same (source, bucket) order.
_PSI_FOLD = (
    "aggregate(array_sort(collect_list(s)), cast(0 as double), "
    "(acc, x) -> acc + x.t)"
)


def psi_drift_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per source -- the OTHER standard
    drift alarm beside the KS statistic (ks_drift_by_source): each
    source's doc-length distribution vs the rest of the corpus over
    the global decile buckets, PSI = sum_i (p_i - q_i) ln(p_i / q_i)
    with +1 Laplace smoothing so empty buckets stay finite. PSI < 0.1
    is the conventional 'stable' line; the report is (source, n, psi)
    with psi a 6-dp double.

    Determinism: bucket edges come from the INTEGER cumulative count
    over distinct lengths (bucket(v) = ((cum_le(v) - 1) * B) DIV N,
    ties collapse into one bucket -- group-based, no global row sort);
    p/q are exact rationals; the ln terms fold in sorted bucket order
    (chi2's contract). At 100 TB the distinct-value frame, not the row
    count, bounds the window input -- bucketize continuous metrics
    first.

    Scale shape: one grouped count per (source, value), one
    value-grain cumulative window, a broadcast bucket reduction --
    |sources| x {PSI_BUCKETS} cells before the fold."""
    d = load_table(spark, sf_dir, "documents")
    vals = (
        d.groupBy(F.col("n_chars").alias("x"))
        .agg(F.count("*").alias("cx"))
        .withColumn(
            "cum",
            F.sum("cx").over(
                Window.orderBy("x").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            ),
        )
    )
    tot = d.agg(F.count("*").alias("n_all"))
    buckets = vals.crossJoin(broadcast(tot)).select(
        "x",
        F.expr(
            f"CAST(((cum - 1) * {PSI_BUCKETS}) DIV n_all AS INT)"
        ).alias("bkt"),
    )
    sv = (
        d.groupBy("source", F.col("n_chars").alias("x"))
        .agg(F.count("*").alias("c"))
        .join(broadcast(buckets), "x")
        .groupBy("source", "bkt")
        .agg(F.sum("c").alias("c_sb"))
    )
    srcs = sv.groupBy("source").agg(F.sum("c_sb").alias("n_s"))
    gb = sv.groupBy("bkt").agg(F.sum("c_sb").alias("c_b"))
    bg = spark.createDataFrame([(b,) for b in range(PSI_BUCKETS)], "bkt int")
    dense = (
        srcs.crossJoin(broadcast(bg))
        .join(sv, ["source", "bkt"], "left")
        .join(broadcast(gb), "bkt", "left")
        .crossJoin(broadcast(tot))
        .select(
            "source",
            "n_s",
            "bkt",
            F.coalesce("c_sb", F.lit(0)).alias("cs"),
            (F.coalesce("c_b", F.lit(0)) - F.coalesce("c_sb", F.lit(0))).alias(
                "cr"
            ),
            (F.col("n_all") - F.col("n_s")).alias("n_r"),
        )
    )
    terms = dense.select(
        "source",
        "n_s",
        F.struct(
            F.col("bkt").alias("k1"),
            F.expr(
                f"((CAST(cs + 1 AS DOUBLE) / (n_s + {PSI_BUCKETS}))"
                f" - (CAST(cr + 1 AS DOUBLE) / (n_r + {PSI_BUCKETS})))"
                f" * ln((CAST(cs + 1 AS DOUBLE) / (n_s + {PSI_BUCKETS}))"
                f" / (CAST(cr + 1 AS DOUBLE) / (n_r + {PSI_BUCKETS})))"
            ).alias("t"),
        ).alias("s"),
    )
    return (
        terms.groupBy("source")
        .agg(
            F.max("n_s").cast("long").alias("n"),
            F.round(F.expr(_PSI_FOLD), 6).alias("psi"),
        )
        .orderBy("source")
    )


QUERIES["psi_drift_by_source"] = psi_drift_by_source

ORACLES["psi_drift_by_source"] = f"""
    WITH vals AS MATERIALIZED (
        SELECT x, sum(cx) OVER (ORDER BY x
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM (
            SELECT n_chars AS x, CAST(count(*) AS BIGINT) AS cx
            FROM documents GROUP BY n_chars
        )
    ), tot AS (SELECT CAST(count(*) AS BIGINT) AS n_all FROM documents),
    buckets AS (
        SELECT x, CAST(((cum - 1) * {PSI_BUCKETS}) // n_all AS INTEGER)
            AS bkt
        FROM vals, tot
    ), sv AS MATERIALIZED (
        SELECT source, bkt, CAST(sum(c) AS BIGINT) AS c_sb FROM (
            SELECT source, n_chars AS x, CAST(count(*) AS BIGINT) AS c
            FROM documents GROUP BY source, n_chars
        ) JOIN buckets USING (x) GROUP BY source, bkt
    ), srcs AS (SELECT source, CAST(sum(c_sb) AS BIGINT) AS n_s
                FROM sv GROUP BY source),
    gb AS (SELECT bkt, CAST(sum(c_sb) AS BIGINT) AS c_b FROM sv GROUP BY bkt),
    bg AS (SELECT CAST(unnest(range(0, {PSI_BUCKETS})) AS INTEGER) AS bkt),
    dense AS (
        SELECT s.source, s.n_s, b.bkt,
               COALESCE(sv.c_sb, 0) AS cs,
               COALESCE(g.c_b, 0) - COALESCE(sv.c_sb, 0) AS cr,
               t.n_all - s.n_s AS n_r
        FROM srcs s CROSS JOIN bg b
        LEFT JOIN sv ON sv.source = s.source AND sv.bkt = b.bkt
        LEFT JOIN gb g ON g.bkt = b.bkt
        CROSS JOIN tot t
    ), terms AS (
        SELECT source, n_s, bkt,
               ((CAST(cs + 1 AS DOUBLE) / (n_s + {PSI_BUCKETS}))
                - (CAST(cr + 1 AS DOUBLE) / (n_r + {PSI_BUCKETS})))
               * ln((CAST(cs + 1 AS DOUBLE) / (n_s + {PSI_BUCKETS}))
                    / (CAST(cr + 1 AS DOUBLE) / (n_r + {PSI_BUCKETS})))
                   AS t
        FROM dense
    )
    SELECT source, CAST(max(n_s) AS BIGINT) AS n,
           round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(list_sort(list({{'k1': bkt, 't': t}})),
                              x -> x.t)),
               (acc, x) -> acc + x), 6) AS psi
    FROM terms GROUP BY source ORDER BY source
"""

# --------------------------------------------------- cusum_changepoint_daily


def cusum_changepoint_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detector over each event type's daily value
    series: the day t maximizing |sum_{d<=t} s_d * D - T * t| -- the
    cumulative deviation from a uniform-rate baseline, in exact
    cent-day BIGINT units (cross-multiplied, no float means). The
    argmax day is where the level shift happened; a series with no
    shift peaks near the middle with a small deviation. Output
    (event_type, cp_date, n_days, max_abs_dev); ties resolve to the
    earliest day.

    Scale shape: one (type, day) grouped sum (map-side combined, day
    grain bounds the frame), one per-type cumulative window over days,
    one argmax reduction -- |types| rows out."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.groupBy(
            "event_type", F.expr("CAST(ts AS DATE)").alias("d")
        )
        .agg(
            F.sum(
                F.expr("CAST(round(value * 100, 0) AS BIGINT)")
            ).alias("s_d")
        )
    )
    wd = Window.partitionBy("event_type").orderBy("d")
    per = (
        daily.withColumn(
            "cum",
            F.sum("s_d").over(
                wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .withColumn("t", F.row_number().over(wd))
    )
    stats = daily.groupBy("event_type").agg(
        F.count("*").alias("n_days"), F.sum("s_d").alias("tot")
    )
    dev = per.join(broadcast(stats), "event_type").select(
        "event_type",
        "d",
        "n_days",
        F.expr("abs(cum * n_days - tot * t)").alias("adev"),
    )
    wr = Window.partitionBy("event_type").orderBy(
        F.col("adev").desc(), F.col("d").asc()
    )
    return (
        dev.withColumn("rn", F.row_number().over(wr))
        .where(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("d").cast("string").alias("cp_date"),
            F.col("n_days").cast("long").alias("n_days"),
            F.col("adev").cast("long").alias("max_abs_dev"),
        )
        .orderBy("event_type")
    )


QUERIES["cusum_changepoint_daily"] = cusum_changepoint_daily

ORACLES["cusum_changepoint_daily"] = """
    WITH daily AS MATERIALIZED (
        SELECT event_type, CAST(ts AS DATE) AS d,
               CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
                   AS s_d
        FROM events GROUP BY event_type, CAST(ts AS DATE)
    ), per AS (
        SELECT event_type, d,
               sum(s_d) OVER (PARTITION BY event_type ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum,
               row_number() OVER (PARTITION BY event_type ORDER BY d)
                   AS t
        FROM daily
    ), stats AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(s_d) AS BIGINT) AS tot
        FROM daily GROUP BY event_type
    ), dev AS (
        SELECT p.event_type, p.d, s.n_days,
               abs(p.cum * s.n_days - s.tot * p.t) AS adev
        FROM per p JOIN stats s USING (event_type)
    )
    SELECT event_type, CAST(d AS VARCHAR) AS cp_date, n_days,
           CAST(adev AS BIGINT) AS max_abs_dev
    FROM (
        SELECT *, row_number() OVER (PARTITION BY event_type
            ORDER BY adev DESC, d ASC) AS rn
        FROM dev
    ) WHERE rn = 1 ORDER BY event_type
"""

# --------------------------------------------------- anova_f_event_value

#: sorted-struct fold of the per-group S_g^2 / n_g terms.
_ANOVA_FOLD = (
    "aggregate(array_sort(collect_list(s)), cast(0 as double), "
    "(acc, x) -> acc + x.t)"
)


def anova_f_event_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F statistic for event value across event types --
    does the metric's MEAN differ by type beyond noise (the k-group
    generalization of ab_test_conversion's two-sample z). Sums, counts
    and sum-of-squares are exact BIGINTs in cent units; the only
    doubles are the per-group S_g^2 / n_g terms (pinned multiply
    order, folded in sorted type order -- chi2's contract) and the one
    final F expression: F = ((A - S^2/N) / (k-1)) / ((SQ - A) / (N-k)).
    Output one row (n, k, f) with f a 6-dp double.

    Scale shape: ONE map-side-combined aggregate to |types| partials
    plus their global rollup; the fact scan is touched once, nothing
    shuffles but the k-row frame."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("CAST(round(value * 100, 0) AS BIGINT)").alias("v"),
    )
    g = e.groupBy("event_type").agg(
        F.count("*").alias("n_g"), F.sum("v").alias("s_g")
    )
    tot = e.agg(
        F.count("*").alias("n"),
        F.sum("v").alias("s"),
        # v*v accumulates in DECIMAL(38,0): per-term ~2.4e9 e4-units^2
        # over a corpus-sized row count wraps a BIGINT sum around
        # sf1000 (the gini_concentration r15 accumulator-width class);
        # the CAST AS DOUBLE downstream is value-identical in range.
        F.sum(F.expr("CAST(v AS DECIMAL(38,0)) * v")).alias("sq"),
    )
    terms = g.select(
        F.struct(
            F.col("event_type").alias("k1"),
            F.expr(
                "(CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE))"
                " / CAST(n_g AS DOUBLE)"
            ).alias("t"),
        ).alias("s")
    )
    return (
        terms.agg(
            F.count("*").alias("k"), F.expr(_ANOVA_FOLD).alias("a")
        )
        .crossJoin(broadcast(tot))
        .select(
            F.col("n").cast("long").alias("n"),
            F.col("k").cast("long").alias("k"),
            F.expr(
                "round(((a - (CAST(s AS DOUBLE) * CAST(s AS DOUBLE))"
                " / CAST(n AS DOUBLE)) / (k - 1))"
                " / ((CAST(sq AS DOUBLE) - a) / (n - k)), 6)"
            ).alias("f"),
        )
    )


QUERIES["anova_f_event_value"] = anova_f_event_value

ORACLES["anova_f_event_value"] = """
    WITH e AS MATERIALIZED (
        SELECT event_type,
               CAST(round(value * 100, 0) AS BIGINT) AS v
        FROM events
    ), g AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_g,
               CAST(sum(v) AS BIGINT) AS s_g
        FROM e GROUP BY event_type
    ), tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(v) AS BIGINT) AS s,
               CAST(sum(v * v) AS BIGINT) AS sq
        FROM e
    ), folded AS (
        SELECT CAST(count(*) AS BIGINT) AS k,
               list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(
                       list_sort(list({'k1': event_type,
                                       't': (CAST(s_g AS DOUBLE)
                                             * CAST(s_g AS DOUBLE))
                                            / CAST(n_g AS DOUBLE)})),
                       x -> x.t)),
                   (acc, x) -> acc + x) AS a
        FROM g
    )
    SELECT t.n, f.k,
           round(((f.a - (CAST(t.s AS DOUBLE) * CAST(t.s AS DOUBLE))
                   / CAST(t.n AS DOUBLE)) / (f.k - 1))
                 / ((CAST(t.sq AS DOUBLE) - f.a) / (t.n - f.k)), 6)
               AS f
    FROM folded f CROSS JOIN tot t
"""

# --------------------------------------------------- mannwhitney_u_value


def mannwhitney_u_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U test of event value between the deterministic
    user buckets pmod(user_id, 2) -- the RANK-based two-sample test
    that catches distribution shifts the mean-based z misses (and the
    robust companion to ab_test_conversion). Tie handling is exact:
    per distinct value the doubled average rank is lo + hi (both
    BIGINT cumulative counts), so R1 and U1 are exact integers doubled
    (u2_a column); the normal approximation with tie correction is the
    ONE float expression. Output (n_a, n_b, u2_a, z). Degenerate
    inputs where the tie-corrected variance is 0 (every value
    identical -- e.g. an all-NULL payload lake -- or an empty bucket)
    yield z = NULL via nullif guards on BOTH engines, never a
    divide-by-zero.

    Scale shape: one grouped count per (value, bucket) -- value
    cardinality bounds everything downstream (bucketize continuous
    metrics first); one cumulative window over distinct values; one
    scalar fold. Nothing row-scaled shuffles."""
    e = load_table(spark, sf_dir, "events").select(
        F.expr("CAST(round(value * 100, 0) AS BIGINT)").alias("v"),
        F.expr("pmod(user_id, 2)").alias("grp"),
    )
    vc = e.groupBy("v").agg(
        F.count("*").alias("t_v"),
        F.sum(F.expr("IF(grp = 0, 1, 0)")).alias("c_a"),
    )
    w = Window.orderBy("v")
    ranked = vc.withColumn(
        "hi",
        F.sum("t_v").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).withColumn("lo", F.col("hi") - F.col("t_v") + 1)
    return ranked.agg(
        F.sum("c_a").cast("long").alias("n_a"),
        F.sum(F.expr("t_v - c_a")).cast("long").alias("n_b"),
        F.expr(
            "CAST(sum(c_a * (lo + hi)) - sum(c_a) * (sum(c_a) + 1)"
            " AS BIGINT)"
        ).alias("u2_a"),
        F.expr(
            "round((CAST(sum(c_a * (lo + hi)) - sum(c_a) * (sum(c_a) + 1)"
            " AS DOUBLE) / 2 - CAST(sum(c_a) AS DOUBLE)"
            " * sum(t_v - c_a) / 2)"
            " / nullif(sqrt(CAST(sum(c_a) AS DOUBLE) * sum(t_v - c_a) / 12.0"
            " * ((sum(t_v) + 1) - CAST(sum(t_v * t_v * t_v - t_v)"
            " AS DOUBLE) / nullif(CAST(sum(t_v) * (sum(t_v) - 1) AS DOUBLE),"
            " CAST(0 AS DOUBLE)))), CAST(0 AS DOUBLE)), 6)"
        ).alias("z"),
    )


QUERIES["mannwhitney_u_value"] = mannwhitney_u_value

ORACLES["mannwhitney_u_value"] = """
    WITH e AS MATERIALIZED (
        SELECT CAST(round(value * 100, 0) AS BIGINT) AS v,
               user_id % 2 AS grp
        FROM events
    ), vc AS (
        SELECT v, CAST(count(*) AS BIGINT) AS t_v,
               CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS c_a
        FROM e GROUP BY v
    ), ranked AS (
        SELECT v, t_v, c_a,
               sum(t_v) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS hi
        FROM vc
    )
    SELECT CAST(sum(c_a) AS BIGINT) AS n_a,
           CAST(sum(t_v - c_a) AS BIGINT) AS n_b,
           CAST(sum(c_a * ((hi - t_v + 1) + hi))
                - sum(c_a) * (sum(c_a) + 1) AS BIGINT) AS u2_a,
           round((CAST(sum(c_a * ((hi - t_v + 1) + hi))
                  - sum(c_a) * (sum(c_a) + 1) AS DOUBLE) / 2
                  - CAST(sum(c_a) AS DOUBLE) * sum(t_v - c_a) / 2)
                 / nullif(sqrt(CAST(sum(c_a) AS DOUBLE) * sum(t_v - c_a)
                 / 12.0
                 * ((sum(t_v) + 1) - CAST(sum(t_v * t_v * t_v - t_v)
                    AS DOUBLE) / nullif(CAST(sum(t_v) * (sum(t_v) - 1)
                    AS DOUBLE), CAST(0 AS DOUBLE)))),
                 CAST(0 AS DOUBLE)), 6) AS z
    FROM ranked
"""
