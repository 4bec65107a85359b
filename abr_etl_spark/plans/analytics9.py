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
