"""Coverage part 8 (round 8): sketch infrastructure, experiment /
distribution statistics, path analysis, and data-layout clustering.

- ``hll_distinct``: HyperLogLog distinct-count sketch over ordering
  customers -- register maxima from a deterministic shared hash, so the
  "approximate" estimate replays exactly cross-engine (the
  quantile_sketch_hash philosophy applied to cardinality).
- ``bloom_membership``: Bloom-filter membership probe + false-positive
  report -- the pre-join filter a 100 TB pipeline ships to the fact scan
  before paying a shuffle for keys that can't match.
- ``gini_nation_revenue``: revenue-concentration (Gini) per nation from
  exact integer rank sums.
- ``chi2_event_dow``: chi-square independence of event_type x
  day-of-week with order-pinned double reduction.
- ``ab_test_conversion``: two-proportion z-test of event-level purchase
  rate between deterministic user buckets.
- ``winsorized_mean``: per-segment robust mean with exact-percentile
  clipping (the anomaly_mad companion).
- ``session_paths_topk``: top event-type paths per session -- the
  navigation-flow query over the sessionize primitive.
- ``zorder_layout``: z-order (Morton) interleaved sort key + bucket
  locality report -- the lakehouse clustering primitive that makes
  multi-dimensional file pruning work.
- ``hll_sliding_distinct``: trailing-window distinct estimates from
  pre-aggregated daily HLL registers (window = register max-merge).
- ``kmv_set_ops``: |A|, |B|, union and intersection estimates from
  three k-row KMV sketches; sub-k sets counted exactly.
- ``funnel_time_bounded``: the MATCH_RECOGNIZE-shaped sequence funnel
  via two conditional running windows over one sort -- no self-joins.

Reference parity: the reference (abr-etl, Go) delegates analytics to
Athena SQL; these are Spark-native shapes its users run downstream
(SURVEY.md §2.B rationale).

Scale notes: every sketch evaluates its hash AT THE SCAN and reduces to
bounded state (HLL registers, Bloom bit positions, contingency cells);
gini/winsorize window per group, never globally; session paths reuse
the one (user)-partitioned window + per-session aggregate; the z-order
key is pure map-side arithmetic (a sort key, not a shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from abr_etl_spark.sources.lake import load_table

# ------------------------------------------------------------ hll_distinct

#: HLL bucket count (power of two). A DATA-SIZE parameter like
#: QS_RATE_E4: m=16 keeps the raw-HLL regime (n > 2.5m) at every
#: testdata sf; production uses m=2^14 for ~1% error. The standard
#: small-range linear-counting correction IS applied (hll_est_sql
#: below) via a pre-evaluated literal table, so small cardinalities
#: stay accurate without any runtime ln() on either engine.
HLL_M = 16
#: shared 31-bit hash h = ((A*k + B mod P)^2 mod P) * A2 + B2 mod P.
#: The SQUARE matters: an affine-only hash maps sequential keys onto a
#: lattice whose leading-zero statistics are wildly biased (measured
#: +82% on this data); squaring breaks the lattice and lands the
#: estimator inside its theoretical error band (measured <= ~0.2 rel
#: err over 5 disjoint key ranges vs the 26% m=16 sigma). Every
#: intermediate stays < 2^63 (h1 < P so h1^2 < 4.7e18; the pmod fold
#: keeps A*key in range for ANY key domain -- the quantile_sketch_hash
#: lesson).
HLL_P = 2147483647
HLL_A = 1103515245
HLL_B = 12345
HLL_A2 = 1664525
HLL_B2 = 1013904223


def _hll_hash_sql(key: str, *, engine: str = "spark") -> str:
    fold = (
        f"pmod({key}, {HLL_P})" if engine == "spark"
        else f"({key} % {HLL_P})"
    )
    h1 = f"(({HLL_A} * {fold} + {HLL_B}) % {HLL_P})"
    return f"((({h1} * {h1}) % {HLL_P}) * {HLL_A2} + {HLL_B2}) % {HLL_P}"
#: alpha_16 * 16^2, computed once here and inlined as the same literal
#: in both engines (0.7213 / (1 + 1.079 / 16) * 256).
HLL_ALPHA_M2 = 0.7213 / (1 + 1.079 / 16) * 256
#: rank width: h DIV m leaves 31 - log2(m) = 27 usable bits.
_HLL_W_BITS = 27


def _hll_rank_sql(w: str) -> str:
    """Leading-zero rank of the 27-bit word ``w`` via length(bin(w)) --
    bin() prints the minimal binary string in BOTH engines, so
    bit-length needs no libm log2. w = 0 maps to the max rank."""
    return (
        f"(CASE WHEN {w} = 0 THEN {_HLL_W_BITS + 1} "
        f"ELSE {_HLL_W_BITS + 1} - length(bin({w})) END)"
    )


#: Linear-counting literals m*ln(m/V) for every possible empty-register
#: count V in [1, m): with m=16 the small-range correction needs NO
#: runtime ln() on either engine -- the 15 possible values are computed
#: once here (CPython libm, round-to-4 = the output grain) and inlined
#: as identical literals into both SQL texts, keeping the sketch
#: bit-replayable. V = m (empty sketch) estimates 0.0. Production-sized
#: m (2^14) would instead round a runtime ln() to the output grain on
#: both sides -- the dsir_importance round-for-parity discipline --
#: since a 16k-entry CASE is impractical.
import math as _math

_HLL_LC_LIT = {
    v: repr(round(HLL_M * _math.log(HLL_M / v), 4))
    for v in range(1, HLL_M)
}
#: the standard regime boundary (Flajolet et al. 2007): raw estimates
#: at or below 2.5m are biased, linear counting takes over
HLL_LC_THRESHOLD = 2.5 * HLL_M


def hll_est_sql_runtime_ln(
    V: str, S: str, *, m: int, alpha_m2: float
) -> str:
    """Production-m variant of hll_est_sql (SURVEY §7.11): for m too
    large for a literal table (2^10+ registers), the linear-counting
    branch computes round(m*ln(m/V), 4) at RUNTIME on both engines.
    ln() is not IEEE-correctly-rounded-guaranteed, so the
    round-to-output-grain discipline (dsir_importance's precedent)
    absorbs last-ulp engine differences; identical-text parity across
    the FULL V range at m=1024 is pytest-checked
    (tests/test_analytics8.py). m=16 keys keep the exact literal table
    above."""
    raw = f"({alpha_m2!r} / ({S}))"
    lc = f"round({m} * ln({m} / CAST(({V}) AS DOUBLE)), 4)"
    return (
        f"(CASE WHEN ({V}) > 0 AND {raw} <= {2.5 * m!r} "
        f"THEN {lc} ELSE round({raw}, 4) END)"
    )


def hll_est_sql(V: str, S: str) -> str:
    """Shared HLL-estimate text (identical both engines) WITH the
    small-range correction: raw = alpha_m*m^2 / S, where ``S`` sums
    2^-rank over ALL m registers (empties contribute 2^0 = 1); when
    raw <= 2.5m and ``V`` > 0 registers are empty, linear counting
    m*ln(m/V) replaces it -- via the _HLL_LC_LIT literal table, so the
    correction is exactly replayable. Both branches round to 4."""
    raw = f"({HLL_ALPHA_M2!r} / ({S}))"
    whens = " ".join(
        f"WHEN ({V}) = {v} THEN {lit}" for v, lit in _HLL_LC_LIT.items()
    )
    return (
        f"(CASE WHEN ({V}) > 0 AND {raw} <= {HLL_LC_THRESHOLD!r} "
        f"THEN (CASE {whens} ELSE 0.0 END) "
        f"ELSE round({raw}, 4) END)"
    )


def hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog estimate of distinct ordering customers:
    (m, n_filled, est). Each key hashes once at the scan; registers are
    per-bucket max ranks; the estimate alpha*m^2 / sum(2^-rank) uses
    only exact powers of two (dyadic rationals whose partial sums are
    exact doubles -- order-independent), so the sketch replays
    bit-identically cross-engine, unlike engine-native approx_count_
    distinct whose HLL++ buckets no oracle can replay.

    Scale shape: the register table is the ONLY state -- m rows after
    one (bucket) shuffle of 16-byte rows; the input scan is
    column-pruned to the key. Compare kmv_distinct (order statistics):
    same contract, different sketch family.
    """
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    h = f"({_hll_hash_sql('o_custkey')})"
    regs = (
        o.select(
            F.expr(f"{h} % {HLL_M}").alias("bucket"),
            F.expr(_hll_rank_sql(f"{h} DIV {HLL_M}")).alias("rank"),
        )
        .groupBy("bucket")
        .agg(F.max("rank").alias("max_rank"))
    )
    agg = regs.agg(
        F.count("*").cast("long").alias("n_filled"),
        F.sum(F.expr("power(2.0, -max_rank)")).alias("S_f"),
    )
    return agg.select(
        F.lit(HLL_M).cast("int").alias("m"),
        "n_filled",
        F.expr(
            hll_est_sql(
                f"({HLL_M} - n_filled)",
                f"(({HLL_M} - n_filled) + S_f)",
            )
        ).alias("est"),
    )


# ---------------------------------------------------- hll_distinct_prod_m

#: the production-sized register count: at every testdata sf the
#: distinct-user count sits BELOW 2.5m, so the runtime-ln
#: linear-counting branch is what the driver's oracle gate actually
#: exercises here (the m=16 key exercises the raw branch; between them
#: both regimes are driver-checked).
HLL_PROD_M = 1024
HLL_PROD_ALPHA_M2 = 0.7213 / (1 + 1.079 / HLL_PROD_M) * HLL_PROD_M**2
#: h DIV m leaves 31 - log2(m) = 21 usable rank bits at m=1024.
_HLL_PROD_W_BITS = 31 - 10


def hll_distinct_prod_m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct users at the PRODUCTION register count
    m={HLL_PROD_M}: (m, n_filled, est). Same deterministic squared-
    affine hash; rank width shrinks to {_HLL_PROD_W_BITS} bits; the
    estimate uses hll_est_sql_runtime_ln -- the round-to-grain runtime
    ln() variant -- because a 1024-entry literal table is impractical.
    At every testdata sf the corpus sits in the small-range regime
    (n < 2.5m), so THIS key puts the linear-counting branch itself
    under the cross-engine oracle gate; hll_distinct (m=16) covers the
    raw branch. Cross-engine ln-parity for every possible V is
    additionally pytest-proven (tests/test_analytics8.py).

    Scale shape: identical to hll_distinct -- one column-pruned scan,
    one {HLL_PROD_M}-row register shuffle, O(m) state.
    """
    e = load_table(spark, sf_dir, "events").select("user_id")
    h = f"({_hll_hash_sql('user_id')})"
    rank = (
        f"(CASE WHEN {h} DIV {HLL_PROD_M} = 0 THEN {_HLL_PROD_W_BITS + 1} "
        f"ELSE {_HLL_PROD_W_BITS + 1} - length(bin({h} DIV {HLL_PROD_M}))"
        f" END)"
    )
    regs = (
        e.select(
            F.expr(f"{h} % {HLL_PROD_M}").alias("bucket"),
            F.expr(rank).alias("rank"),
        )
        .groupBy("bucket")
        .agg(F.max("rank").alias("max_rank"))
    )
    agg = regs.agg(
        F.count("*").cast("long").alias("n_filled"),
        F.sum(F.expr("power(2.0, -max_rank)")).alias("S_f"),
    )
    return agg.select(
        F.lit(HLL_PROD_M).cast("int").alias("m"),
        "n_filled",
        F.expr(
            hll_est_sql_runtime_ln(
                f"({HLL_PROD_M} - n_filled)",
                f"(({HLL_PROD_M} - n_filled) + S_f)",
                m=HLL_PROD_M,
                alpha_m2=HLL_PROD_ALPHA_M2,
            )
        ).alias("est"),
    )


# --------------------------------------------------------- bloom_membership

#: Bloom geometry: M bits, K shared-hash functions (minhash-family
#: seeds). M is a data-size parameter -- sized for the build-side key
#: count at ~10 bits/key; the probe math is identical at any M.
BLOOM_M = 16384
BLOOM_K = 4
_BLOOM_SEEDS = [
    (1103515245, 12345),
    (22695477, 1),
    (1664525, 1013904223),
    (69069, 362437),
]


def _bloom_pos_sql(key: str, i: int, *, engine: str = "spark") -> str:
    a, b = _BLOOM_SEEDS[i]
    # pmod folds arbitrary (possibly huge/negative) key domains on the
    # Spark side; the oracle's keys are positive, where plain % agrees
    fold = f"pmod({key}, {HLL_P})" if engine == "spark" else f"({key} % {HLL_P})"
    return f"((({a} * {fold} + {b}) % {HLL_P}) % {BLOOM_M})"


def bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership report: build a {BLOOM_K}-hash filter
    over customer keys, probe it with (a) every customer key shifted
    into a disjoint absent range and (b) the original present keys --
    (probe_kind, n_probes, n_flagged). Present keys MUST all flag
    (Bloom filters have no false negatives -- pytest-pinned); absent
    flags measure the false-positive rate at this M/K/n.

    This is the pre-join filter at 100 TB: ship the (BLOOM_M)-bit set
    to the fact scan and drop unmatched keys before the shuffle.

    Scale shape: the filter materializes as DISTINCT bit positions
    (<= M rows after one dedup shuffle, broadcast-joined to probes);
    a probe flags iff all K of its positions are present -- the
    position join moves 8-byte rows only.
    """
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    bits = (
        c.select(
            F.explode(
                F.array(
                    *[
                        F.expr(_bloom_pos_sql("c_custkey", i))
                        for i in range(BLOOM_K)
                    ]
                )
            ).alias("pos")
        )
        .distinct()
    )
    probes = c.select(
        F.col("c_custkey").alias("key"), F.lit("present").alias("probe_kind")
    ).unionByName(
        c.select(
            (F.col("c_custkey") + 1_000_000_000).alias("key"),
            F.lit("absent").alias("probe_kind"),
        )
    )
    # a probe flags iff EVERY one of its distinct positions is set --
    # compare against the probe's own distinct-position count, not K:
    # two of a key's K hashes may collide into one position
    probe_pos = probes.select(
        "probe_kind",
        "key",
        F.explode(
            F.array_distinct(
                F.array(
                    *[
                        F.expr(_bloom_pos_sql("key", i))
                        for i in range(BLOOM_K)
                    ]
                )
            )
        ).alias("pos"),
    )
    per_key = probe_pos.join(
        F.broadcast(bits.withColumn("__set", F.lit(1))), "pos", "left"
    ).groupBy("probe_kind", "key").agg(
        F.count("*").alias("np"),
        F.sum(F.coalesce("__set", F.lit(0))).alias("nm"),
    )
    hits = (
        per_key.where(F.col("nm") == F.col("np"))
        .groupBy("probe_kind")
        .agg(F.count("*").alias("n_flagged"))
    )
    totals = probes.groupBy("probe_kind").agg(
        F.count("*").alias("n_probes")
    )
    return (
        totals.join(hits, "probe_kind", "left")
        .select(
            "probe_kind",
            "n_probes",
            F.coalesce("n_flagged", F.lit(0)).alias("n_flagged"),
        )
        .orderBy("probe_kind")
    )


# ----------------------------------------------------- gini_nation_revenue

#: Gini from exact integer rank sums -- ONE formula text for both
#: engines (identical IEEE op order): G = (2*swr - (n+1)*sr) / (n*sr)
#: over cents, with rank by (rev, custkey) pinning ties.
_GINI_SQL = (
    "round((2.0 * CAST(swr AS DOUBLE) - (CAST(nd AS DOUBLE) + 1.0) "
    "* CAST(sr AS DOUBLE)) / (CAST(nd AS DOUBLE) * CAST(sr AS DOUBLE)), 6)"
)


def gini_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration per nation: Gini coefficient over each
    nation's per-customer order revenue -- (nation, n_customers,
    revenue_c, gini). Exact integer rank sums (cents; rank pinned by
    (revenue, custkey)), one shared double formula at the end.

    Scale shape: revenue per customer is one aggregate; the rank window
    partitions PER NATION (never global); rank*revenue products stay
    int64 to ~10^9 customers/nation at 10^9 cents each (DECIMAL(38,0)
    swap documented for beyond, the bm25 pattern).
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"),
        F.col("n_name").alias("nation"),
    )
    rev = (
        o.select(
            F.col("o_custkey").alias("c_custkey"),
            F.floor(F.col("o_totalprice") * 100 + 0.5)
            .cast("long")
            .alias("cents"),
        )
        .groupBy("c_custkey")
        .agg(F.sum("cents").alias("rev"))
        .join(c, "c_custkey")
        .join(F.broadcast(n), "c_nationkey")
    )
    w = Window.partitionBy("nation").orderBy(
        F.col("rev").asc(), F.col("c_custkey").asc()
    )
    ranked = rev.withColumn("rk", F.row_number().over(w))
    return (
        ranked.groupBy("nation")
        .agg(
            F.count("*").alias("nd"),
            F.sum("rev").alias("sr"),
            F.sum(F.col("rk") * F.col("rev")).alias("swr"),
        )
        .select(
            "nation",
            F.col("nd").alias("n_customers"),
            F.col("sr").alias("revenue_c"),
            F.expr(_GINI_SQL).alias("gini"),
        )
        .orderBy("nation")
    )


# --------------------------------------------------------- chi2_event_dow

#: order-pinned double fold (the embedding_top_eigvec pattern): sort
#: the cell structs, fold their t fields sequentially from 0.0.
_CHI2_FOLD = (
    "aggregate(array_sort(collect_list(s)), cast(0 as double), "
    "(acc, x) -> acc + x.t)"
)
#: shared day-of-week: days since a fixed Monday mod 7 (0 = Monday) --
#: engine dayofweek() disagrees on week start, date arithmetic doesn't.
_DOW_ANCHOR = "1992-01-06"


def chi2_event_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test of event_type x day-of-week:
    (n_rows, n_cols, dof, chi2). Cell/marginal counts are exact; each
    cell's contribution (o*T - r*c)^2 / (T*r*c) is double arithmetic
    with the multiply order pinned in one shared text, and the final
    sum folds cells in sorted (event_type, dow) order -- bit-identical
    cross-engine.

    Scale shape: the contingency table is ONE map-side-combined
    aggregate to (types x 7) cells; marginals and the fold run on that
    bounded frame (broadcast joins). The fact scan is touched once.
    """
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
        cells.join(F.broadcast(rows), "event_type")
        .join(F.broadcast(cols), "dow")
        .crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            "dow",
            F.expr(
                "(CAST(o * T - r * c AS DOUBLE) * CAST(o * T - r * c AS "
                "DOUBLE)) / ((CAST(T AS DOUBLE) * CAST(r AS DOUBLE)) * "
                "CAST(c AS DOUBLE))"
            ).alias("t"),
        )
    )
    return (
        terms.select(
            F.struct(
                F.col("event_type").alias("k1"),
                F.col("dow").alias("k2"),
                F.col("t"),
            ).alias("s")
        )
        .agg(
            F.countDistinct("s.k1").cast("long").alias("n_rows"),
            F.countDistinct("s.k2").cast("long").alias("n_cols"),
            (
                (F.countDistinct("s.k1") - 1)
                * (F.countDistinct("s.k2") - 1)
            ).cast("long").alias("dof"),
            F.round(F.expr(_CHI2_FOLD), 6).alias("chi2"),
        )
    )


# ----------------------------------------------------- ab_test_conversion

#: two-proportion z statistic, ONE formula text (pinned op order) over
#: exact counts (na, ca, nb, cb). Degenerate experiments -- an empty
#: bucket, zero conversions anywhere, or everyone converted -- have no
#: defined z (the pooled variance is 0 or a bucket size divides by
#: zero): the guard returns NULL identically in both engines instead
#: of Spark's ANSI DIVIDE_BY_ZERO error / DuckDB's silent inf.
_Z_SQL = (
    "CASE WHEN na IS NULL OR nb IS NULL OR na = 0 OR nb = 0 "
    "OR (ca + cb) = 0 OR (ca + cb) = (na + nb) THEN NULL ELSE "
    "round(((CAST(ca AS DOUBLE) / na) - (CAST(cb AS DOUBLE) / nb)) / "
    "sqrt(((CAST(ca + cb AS DOUBLE) / (na + nb)) * "
    "(1.0 - (CAST(ca + cb AS DOUBLE) / (na + nb)))) * "
    "((1.0 / na) + (1.0 / nb))), 6) END"
)


def ab_test_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test of event-level purchase rate between the
    deterministic user buckets pmod(user_id, 2): one row of (n_a, conv_a,
    n_b, conv_b, z). Counts are exact; the z statistic is one shared
    double expression (sqrt is IEEE-correctly-rounded), so the result
    replays bit-for-bit -- the experiment readout every growth team
    runs, minus the nondeterministic assignment service.

    Scale shape: one conditional aggregate over the event scan
    (map-side combine to 2 rows); the statistic is arithmetic on that
    single collected-free frame.
    """
    e = load_table(spark, sf_dir, "events")
    g = (
        e.select(
            F.expr("pmod(user_id, 2)").alias("bucket"),
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .alias("is_p"),
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("n"), F.sum("is_p").alias("conv"))
    )
    wide = (
        g.agg(
            F.sum(F.when(F.col("bucket") == 0, F.col("n"))).alias("na"),
            F.sum(F.when(F.col("bucket") == 0, F.col("conv"))).alias("ca"),
            F.sum(F.when(F.col("bucket") == 1, F.col("n"))).alias("nb"),
            F.sum(F.when(F.col("bucket") == 1, F.col("conv"))).alias("cb"),
        )
    )
    return wide.select(
        F.col("na").alias("n_a"),
        F.col("ca").alias("conv_a"),
        F.col("nb").alias("n_b"),
        F.col("cb").alias("conv_b"),
        F.expr(_Z_SQL).alias("z"),
    )


# ------------------------------------------------------- winsorized_mean

WINSOR_LO = 0.05
WINSOR_HI = 0.95


def winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean of customer balance per market segment:
    (segment, n, cut_lo_c, cut_hi_c, wmean_e4) -- balances in exact
    cents, clipped at floor(percentile(0.05/0.95)) integer cents, mean
    as a sign-safe half-up 1e-4-unit integer (balances go negative, so
    BOTH engines subtract the non-negative pmod remainder before the
    truncating integer division -- Spark DIV and DuckDB // each
    truncate toward zero, so the floor must be built explicitly on
    each side; see time_weighted_avg).
    The robust-mean companion to anomaly_mad's robust outlier count.

    Scale shape: two segment-partitioned aggregates with a tiny
    (segment-cardinality) cut broadcast between them; approx_percentile
    swaps in for the cuts at 100 TB exactly as anomaly_mad's exact
    parameter documents.
    """
    c = load_table(spark, sf_dir, "customer").select(
        "c_mktsegment",
        F.floor(F.col("c_acctbal") * 100 + 0.5).cast("long").alias("cents"),
    )
    cuts = c.groupBy("c_mktsegment").agg(
        F.expr(f"CAST(floor(percentile(cents, {WINSOR_LO})) AS BIGINT)").alias(
            "cut_lo_c"
        ),
        F.expr(f"CAST(floor(percentile(cents, {WINSOR_HI})) AS BIGINT)").alias(
            "cut_hi_c"
        ),
    )
    clipped = c.join(F.broadcast(cuts), "c_mktsegment").select(
        "c_mktsegment",
        "cut_lo_c",
        "cut_hi_c",
        F.least(F.greatest("cents", F.col("cut_lo_c")), F.col("cut_hi_c")).alias(
            "w"
        ),
    )
    return (
        clipped.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            F.first("cut_lo_c").alias("cut_lo_c"),
            F.first("cut_hi_c").alias("cut_hi_c"),
            F.sum("w").alias("sw"),
        )
        .select(
            "c_mktsegment",
            "n",
            "cut_lo_c",
            "cut_hi_c",
            F.expr(
                "((2 * sw * 100 + n) - pmod(2 * sw * 100 + n, 2 * n))"
                " DIV (2 * n)"
            ).alias("wmean_e4"),
        )
        .orderBy("c_mktsegment")
    )


# ----------------------------------------------------- session_paths_topk

SESSION_GAP_S = 1800
PATH_MAX_EVENTS = 10
PATH_TOP = 20


def session_paths_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{PATH_TOP} session event-type paths: (path, n_sessions) --
    the navigation-flow census over gap-based sessions (gap >
    {SESSION_GAP_S}s starts a new session, the sessionize rule). A
    path is the session's first {PATH_MAX_EVENTS} event types joined
    by '>', event order pinned by (ts, event_id).

    Scale shape: ONE (user)-partitioned window assigns sessions (lag +
    running sum over the same sort); per-session paths aggregate
    bounded arrays (sliced at {PATH_MAX_EVENTS}); the path census
    collapses map-side into path-vocabulary cardinality and top-k is
    TakeOrderedAndProject.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    base = e.select(
        "user_id",
        "event_id",
        "event_type",
        F.col("ts").cast("long").alias("ts_s"),
    )
    sess = (
        base.withColumn("prev", F.lag("ts_s").over(w))
        .withColumn(
            "brk",
            F.when(
                F.col("prev").isNull()
                | (F.col("ts_s") - F.col("prev") > SESSION_GAP_S),
                1,
            ).otherwise(0),
        )
        .withColumn("sess", F.sum("brk").over(w))
    )
    paths = sess.groupBy("user_id", "sess").agg(
        F.array_join(
            F.expr(
                "transform(slice(array_sort(collect_list("
                "struct(ts_s, event_id, event_type))), 1, "
                f"{PATH_MAX_EVENTS}), x -> x.event_type)"
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), F.col("path").asc())
        .limit(PATH_TOP)
    )


# --------------------------------------------------------- zorder_layout

from abr_etl_spark.functions.zorder import ZORDER_BITS, zkey_sql as _zkey_sql

#: report granularity: top 8 interleaved bits = 256 z-buckets, each
#: covering a 4096 x 4096 rectangle of (x, y) space.
ZBUCKET_SHIFT = 24


def zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering report over orders on the classic
    pruning pair (customer, order day): (zbucket, n, min_x, max_x,
    min_y, max_y) for the {2**(2*ZORDER_BITS - ZBUCKET_SHIFT)}-bucket
    layout. Writing files in zkey order gives every file a BOUNDED
    rectangle in BOTH dimensions (pytest-pinned at 4096 per side here),
    so min/max column stats prune scans filtered on either dimension --
    the reason lakehouse tables z-order instead of sorting by one key.

    Scale shape: the z-key is pure map-side integer arithmetic at the
    scan (a sort key for the writer, not a shuffle); this report
    aggregates per bucket in one exchange. At 100 TB the same
    expression feeds repartitionByRange(zkey) + sortWithinPartitions.
    """
    o = load_table(spark, sf_dir, "orders")
    x = f"pmod(o_custkey, {1 << ZORDER_BITS})"
    y = (
        f"pmod(datediff(o_orderdate, DATE '{_DOW_ANCHOR}'), "
        f"{1 << ZORDER_BITS})"
    )
    zkey = _zkey_sql(x, y, " DIV ")
    base = o.select(
        F.expr(x).cast("long").alias("xk"),
        F.expr(y).cast("long").alias("yk"),
        F.expr(f"({zkey}) DIV {1 << ZBUCKET_SHIFT}").alias("zbucket"),
    )
    return (
        base.groupBy("zbucket")
        .agg(
            F.count("*").alias("n"),
            F.min("xk").alias("min_x"),
            F.max("xk").alias("max_x"),
            F.min("yk").alias("min_y"),
            F.max("yk").alias("max_y"),
        )
        .orderBy("zbucket")
    )


# ------------------------------------------------------------- kmv_set_ops

#: KMV sketch size for the set-operation estimates. Small enough that
#: the testdata regime exercises BOTH branches of the degenerate guard
#: (purchase-user sets near |B| ~ k), large enough for a real estimate.
KMV_SET_K = 64


def kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-set algebra from KMV sketches: estimate |A|, |B|,
    |A ∪ B| and |A ∩ B| for A = click users, B = purchase users, from
    three k-row sketches -- one row (k_a, k_b, k_u, est_a, est_b,
    est_union, est_intersection). The set-overlap question every
    audience/cohort tool answers WITHOUT shuffling the raw sets.

    Mechanics (all deterministic, shared squared-affine hash):
    each set's sketch is its k smallest distinct hashes; the union
    sketch is the k smallest of the two sketches' union (correct
    because h_k(U) <= h_k(A), so every union-sketch member's A/B
    membership is decided by the A/B sketches alone -- the standard
    KMV theorem); jaccard_hat = |S_u ∩ skA ∩ skB| / |S_u|;
    est_intersection = jaccard_hat * est_union. A set with fewer than
    k distinct members is counted EXACTLY (the sketch saw everything
    -- guard applied identically in both engines).

    Scale shape: two map-side-filtered distinct + TakeOrdered(k)
    reductions (the kmv_distinct O(k)-exchange shape), then arithmetic
    on <= 3k rows. Nothing scales with |users|.
    """
    e = load_table(spark, sf_dir, "events")

    def sketch(event_type: str) -> DataFrame:
        return (
            e.where(F.col("event_type") == event_type)
            .select(F.expr(_hll_hash_sql("user_id")).alias("h"))
            .distinct()
            .orderBy(F.col("h").asc())
            .limit(KMV_SET_K)
        )

    ska = sketch("click").localCheckpoint(eager=False)
    skb = sketch("purchase").localCheckpoint(eager=False)
    sku = (
        ska.unionByName(skb)
        .distinct()
        .orderBy(F.col("h").asc())
        .limit(KMV_SET_K)
    )
    in_both = sku.join(ska, "h", "left_semi").join(skb, "h", "left_semi")
    stats = (
        ska.agg(F.count("*").alias("k_a"), F.max("h").alias("kth_a"))
        .crossJoin(
            skb.agg(F.count("*").alias("k_b"), F.max("h").alias("kth_b"))
        )
        .crossJoin(
            sku.agg(F.count("*").alias("k_u"), F.max("h").alias("kth_u"))
        )
        .crossJoin(in_both.agg(F.count("*").alias("n_both")))
    )
    est = (
        f"CASE WHEN {{k}} < {KMV_SET_K} THEN CAST({{k}} AS DOUBLE) "
        f"ELSE ({KMV_SET_K - 1} * {HLL_P}.0) / {{kth}} END"
    )
    return stats.select(
        "k_a",
        "k_b",
        "k_u",
        F.round(F.expr(est.format(k="k_a", kth="kth_a")), 4).alias("est_a"),
        F.round(F.expr(est.format(k="k_b", kth="kth_b")), 4).alias("est_b"),
        F.round(F.expr(est.format(k="k_u", kth="kth_u")), 4).alias(
            "est_union"
        ),
        # k_u = 0 (both sets empty) would divide by zero under ANSI;
        # an empty union has an exactly-empty intersection
        F.round(
            F.expr(
                f"CASE WHEN k_u = 0 THEN 0.0 ELSE "
                f"(CAST(n_both AS DOUBLE) / k_u) * "
                f"({est.format(k='k_u', kth='kth_u')}) END"
            ),
            4,
        ).alias("est_intersection"),
    )


# ------------------------------------------------------- hll_sliding_distinct

#: trailing window width (days) for the sliding distinct estimate.
HLL_WINDOW_DAYS = 7


def hll_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-{HLL_WINDOW_DAYS}-day distinct-user estimate per day
    from PRE-AGGREGATED daily HLL registers: (day, n_days, est_7d).
    The reason sketches exist at 100 TB: the raw stream collapses ONCE
    into (day, bucket, max_rank) daily registers, and ANY trailing
    window is then a register-level max-merge -- no per-window rescan
    of raw events, state O(days x m). HLL registers merge by max, so
    the window union is exact sketch algebra (not an approximation of
    the sketch).

    Plan: one map-side-combined daily-register aggregate; a dense
    (day x bucket) grid from two tiny frames; one bucket-partitioned
    RANGE window (6 preceding); one per-day reduction. Dyadic 2^-rank
    sums stay exact doubles -- bit-replayable cross-engine.
    """
    e = load_table(spark, sf_dir, "events")
    h = f"({_hll_hash_sql('user_id')})"
    daily = (
        e.select(
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            F.expr(f"{h} % {HLL_M}").alias("bucket"),
            F.expr(_hll_rank_sql(f"{h} DIV {HLL_M}")).alias("rank"),
        )
        .groupBy("day", "bucket")
        .agg(F.max("rank").alias("max_rank"))
    )
    days = daily.select("day").distinct()
    buckets = spark.range(HLL_M).select(F.col("id").cast("long").alias("bucket"))
    grid = days.crossJoin(F.broadcast(buckets)).join(
        daily, ["day", "bucket"], "left"
    ).select(
        "day",
        "bucket",
        F.expr("datediff(CAST(day AS DATE), DATE '1992-01-06')").alias(
            "day_idx"
        ),
        "max_rank",
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("day_idx")
        .rangeBetween(-(HLL_WINDOW_DAYS - 1), 0)
    )
    w_days = Window.orderBy("day_idx").rangeBetween(
        -(HLL_WINDOW_DAYS - 1), 0
    )
    merged = grid.select(
        "day",
        "day_idx",
        "bucket",
        F.max("max_rank").over(w).alias("mr"),
    )
    per_day = merged.groupBy("day", "day_idx").agg(
        F.sum(F.coalesce(F.expr("power(2.0, -mr)"), F.lit(1.0))).alias("S"),
        F.sum(F.when(F.col("mr").isNull(), 1).otherwise(0)).alias("V"),
    )
    return (
        per_day.select(
            "day",
            F.count("*").over(w_days).cast("long").alias("n_days"),
            F.expr(hll_est_sql("V", "S")).alias("est_7d"),
        )
        .orderBy("day")
    )


# --------------------------------------------------------- funnel_time_bounded

FUNNEL_STEP_S = 3600


def funnel_time_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bounded sequence funnel (the MATCH_RECOGNIZE shape):
    one row of (n_users, n_users_qualified, n_qualifying_clicks) where
    a click QUALIFIES iff some view happened at most {FUNNEL_STEP_S}s
    before it AND some purchase happens at most {FUNNEL_STEP_S}s after
    it (same user) -- i.e. the user ran view -> click -> purchase with
    each step inside the bound. Unlike funnel_counts (first-event
    ordering), this detects ANY qualifying chain.

    Plan: per-user event stream sorted once; a running conditional MAX
    (latest view so far) looks backward and a reversed running
    conditional MIN (next purchase) looks forward -- two frames over
    the SAME (user, ts, event_id) sort, so Catalyst plans ONE
    Exchange+Sort and zero self-joins (the naive 3-way event self-join
    is quadratic in per-user activity).
    """
    e = load_table(spark, sf_dir, "events")
    base = e.select(
        "user_id",
        "event_id",
        "event_type",
        F.col("ts").cast("long").alias("ts_s"),
    )
    w_back = (
        Window.partitionBy("user_id")
        .orderBy("ts_s", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy("ts_s", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    tagged = base.select(
        "user_id",
        "event_type",
        "ts_s",
        F.max(
            F.when(F.col("event_type") == "view", F.col("ts_s"))
        ).over(w_back).alias("last_view"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts_s"))
        ).over(w_fwd).alias("next_purchase"),
    )
    quals = tagged.where(
        (F.col("event_type") == "click")
        & (F.col("ts_s") - F.col("last_view") <= FUNNEL_STEP_S)
        & (F.col("next_purchase") - F.col("ts_s") <= FUNNEL_STEP_S)
    )
    per_user = quals.groupBy("user_id").agg(
        F.count("*").alias("n_clicks")
    )
    totals = load_table(spark, sf_dir, "events").agg(
        F.countDistinct("user_id").alias("n_users")
    )
    return totals.crossJoin(
        per_user.agg(
            F.count("*").alias("n_users_qualified"),
            F.coalesce(F.sum("n_clicks"), F.lit(0)).alias(
                "n_qualifying_clicks"
            ),
        )
    )


QUERIES = {
    "hll_distinct": hll_distinct,
    "hll_distinct_prod_m": hll_distinct_prod_m,
    "hll_sliding_distinct": hll_sliding_distinct,
    "funnel_time_bounded": funnel_time_bounded,
    "kmv_set_ops": kmv_set_ops,
    "bloom_membership": bloom_membership,
    "gini_nation_revenue": gini_nation_revenue,
    "chi2_event_dow": chi2_event_dow,
    "ab_test_conversion": ab_test_conversion,
    "winsorized_mean": winsorized_mean,
    "session_paths_topk": session_paths_topk,
    "zorder_layout": zorder_layout,
}

# ------------------------------------------------------------------ oracles

_KMV_EST = (
    f"CASE WHEN {{k}} < {KMV_SET_K} THEN CAST({{k}} AS DOUBLE) "
    f"ELSE ({KMV_SET_K - 1} * {HLL_P}.0) / {{kth}} END"
)

ORACLES = {
    "funnel_time_bounded": f"""
        WITH base AS (
            SELECT user_id, event_id, event_type,
                   CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
            FROM events
        ), tagged AS (
            SELECT user_id, event_type, ts_s,
                   max(CASE WHEN event_type = 'view' THEN ts_s END)
                       OVER (PARTITION BY user_id
                             ORDER BY ts_s, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS last_view,
                   min(CASE WHEN event_type = 'purchase' THEN ts_s END)
                       OVER (PARTITION BY user_id
                             ORDER BY ts_s, event_id
                             ROWS BETWEEN CURRENT ROW
                                   AND UNBOUNDED FOLLOWING)
                       AS next_purchase
            FROM base
        ), quals AS (
            SELECT user_id FROM tagged
            WHERE event_type = 'click'
              AND ts_s - last_view <= {FUNNEL_STEP_S}
              AND next_purchase - ts_s <= {FUNNEL_STEP_S}
        ), pu AS (
            SELECT user_id, CAST(count(*) AS BIGINT) AS n_clicks
            FROM quals GROUP BY user_id
        )
        SELECT (SELECT CAST(count(DISTINCT user_id) AS BIGINT)
                FROM events) AS n_users,
               CAST(count(*) AS BIGINT) AS n_users_qualified,
               CAST(coalesce(sum(n_clicks), 0) AS BIGINT)
                   AS n_qualifying_clicks
        FROM pu
    """,
    "hll_sliding_distinct": f"""
        WITH daily AS (
            SELECT strftime(ts, '%Y-%m-%d') AS day,
                   ({_hll_hash_sql('user_id', engine='duckdb')})
                       % {HLL_M} AS bucket,
                   max(CASE WHEN ({_hll_hash_sql('user_id',
                                                 engine='duckdb')})
                                 // {HLL_M} = 0
                            THEN {_HLL_W_BITS + 1}
                            ELSE {_HLL_W_BITS + 1} - length(bin(
                                ({_hll_hash_sql('user_id',
                                                engine='duckdb')})
                                // {HLL_M}))
                       END) AS max_rank
            FROM events GROUP BY 1, 2
        ), days AS (
            SELECT DISTINCT day,
                   CAST(CAST(day AS DATE) - DATE '1992-01-06' AS BIGINT)
                       AS day_idx
            FROM daily
        ), grid AS (
            SELECT d.day, d.day_idx, b.bucket, daily.max_rank
            FROM days d
            CROSS JOIN (SELECT unnest(generate_series(0,
                {HLL_M - 1}))::BIGINT AS bucket) b
            LEFT JOIN daily ON daily.day = d.day
                           AND daily.bucket = b.bucket
        ), merged AS (
            SELECT day, day_idx, bucket,
                   max(max_rank) OVER (
                       PARTITION BY bucket ORDER BY day_idx
                       RANGE BETWEEN {HLL_WINDOW_DAYS - 1} PRECEDING
                             AND CURRENT ROW) AS mr
            FROM grid
        ), per_day AS (
            SELECT day, day_idx,
                   sum(coalesce(power(2.0, -mr), 1.0)) AS S,
                   sum(CASE WHEN mr IS NULL THEN 1 ELSE 0 END) AS V
            FROM merged GROUP BY day, day_idx
        )
        SELECT day,
               CAST(count(*) OVER (
                   ORDER BY day_idx
                   RANGE BETWEEN {HLL_WINDOW_DAYS - 1} PRECEDING
                         AND CURRENT ROW) AS BIGINT) AS n_days,
               {hll_est_sql("V", "S")} AS est_7d
        FROM per_day ORDER BY day
    """,
    "kmv_set_ops": f"""
        WITH ska AS (
            SELECT DISTINCT {_hll_hash_sql('user_id', engine='duckdb')}
                       AS h
            FROM events WHERE event_type = 'click'
            ORDER BY h ASC LIMIT {KMV_SET_K}
        ), skb AS (
            SELECT DISTINCT {_hll_hash_sql('user_id', engine='duckdb')}
                       AS h
            FROM events WHERE event_type = 'purchase'
            ORDER BY h ASC LIMIT {KMV_SET_K}
        ), sku AS (
            SELECT DISTINCT h FROM (
                SELECT h FROM ska UNION ALL SELECT h FROM skb
            ) ORDER BY h ASC LIMIT {KMV_SET_K}
        ), nb AS (
            SELECT CAST(count(*) AS BIGINT) AS n_both FROM sku
            WHERE h IN (SELECT h FROM ska)
              AND h IN (SELECT h FROM skb)
        ), stats AS (
            SELECT (SELECT CAST(count(*) AS BIGINT) FROM ska) AS k_a,
                   (SELECT max(h) FROM ska) AS kth_a,
                   (SELECT CAST(count(*) AS BIGINT) FROM skb) AS k_b,
                   (SELECT max(h) FROM skb) AS kth_b,
                   (SELECT CAST(count(*) AS BIGINT) FROM sku) AS k_u,
                   (SELECT max(h) FROM sku) AS kth_u,
                   (SELECT n_both FROM nb) AS n_both
        )
        SELECT k_a, k_b, k_u,
               round({_KMV_EST.format(k='k_a', kth='kth_a')}, 4) AS est_a,
               round({_KMV_EST.format(k='k_b', kth='kth_b')}, 4) AS est_b,
               round({_KMV_EST.format(k='k_u', kth='kth_u')}, 4)
                   AS est_union,
               round(CASE WHEN k_u = 0 THEN 0.0 ELSE
                     (CAST(n_both AS DOUBLE) / k_u)
                     * ({_KMV_EST.format(k='k_u', kth='kth_u')}) END, 4)
                   AS est_intersection
        FROM stats
    """,
    "hll_distinct": f"""
        WITH regs AS (
            SELECT ({_hll_hash_sql('o_custkey', engine='duckdb')})
                       % {HLL_M} AS bucket,
                   max(CASE WHEN ({_hll_hash_sql('o_custkey',
                                                 engine='duckdb')})
                                 // {HLL_M} = 0
                            THEN {_HLL_W_BITS + 1}
                            ELSE {_HLL_W_BITS + 1} - length(bin(
                                ({_hll_hash_sql('o_custkey',
                                                engine='duckdb')})
                                // {HLL_M}))
                       END) AS max_rank
            FROM orders GROUP BY 1
        )
        , agg AS (
            SELECT CAST(count(*) AS BIGINT) AS n_filled,
                   sum(power(2.0, -max_rank)) AS S_f
            FROM regs
        )
        SELECT CAST({HLL_M} AS INTEGER) AS m, n_filled,
               {hll_est_sql(f"({HLL_M} - n_filled)",
                            f"(({HLL_M} - n_filled) + S_f)")} AS est
        FROM agg
    """,
    "hll_distinct_prod_m": f"""
        WITH regs AS (
            SELECT ({_hll_hash_sql('user_id', engine='duckdb')})
                       % {HLL_PROD_M} AS bucket,
                   max(CASE WHEN ({_hll_hash_sql('user_id',
                                                 engine='duckdb')})
                                 // {HLL_PROD_M} = 0
                            THEN {_HLL_PROD_W_BITS + 1}
                            ELSE {_HLL_PROD_W_BITS + 1} - length(bin(
                                ({_hll_hash_sql('user_id',
                                                engine='duckdb')})
                                // {HLL_PROD_M}))
                       END) AS max_rank
            FROM events GROUP BY 1
        ), agg AS (
            SELECT CAST(count(*) AS BIGINT) AS n_filled,
                   sum(power(2.0, -max_rank)) AS S_f
            FROM regs
        )
        SELECT CAST({HLL_PROD_M} AS INTEGER) AS m, n_filled,
               {hll_est_sql_runtime_ln(
                   f"({HLL_PROD_M} - n_filled)",
                   f"(({HLL_PROD_M} - n_filled) + S_f)",
                   m=HLL_PROD_M,
                   alpha_m2=HLL_PROD_ALPHA_M2,
               )} AS est
        FROM agg
    """,
    "gini_nation_revenue": f"""
        WITH rev AS (
            SELECT o_custkey AS c_custkey,
                   CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                 AS BIGINT)) AS BIGINT) AS rev
            FROM orders GROUP BY 1
        ), tagged AS (
            SELECT n.n_name AS nation, r.c_custkey, r.rev
            FROM rev r
            JOIN customer c USING (c_custkey)
            JOIN nation n ON n.n_nationkey = c.c_nationkey
        ), ranked AS (
            SELECT nation, rev,
                   row_number() OVER (PARTITION BY nation
                                      ORDER BY rev ASC, c_custkey ASC)
                       AS rk
            FROM tagged
        ), agg AS (
            SELECT nation, CAST(count(*) AS BIGINT) AS nd,
                   CAST(sum(rev) AS BIGINT) AS sr,
                   CAST(sum(rk * rev) AS BIGINT) AS swr
            FROM ranked GROUP BY nation
        )
        SELECT nation, nd AS n_customers, sr AS revenue_c,
               {_GINI_SQL} AS gini
        FROM agg ORDER BY nation
    """,
    "chi2_event_dow": f"""
        WITH cells AS (
            SELECT event_type,
                   ((CAST(ts AS DATE) - DATE '{_DOW_ANCHOR}') % 7 + 7)
                       % 7 AS dow,
                   CAST(count(*) AS BIGINT) AS o
            FROM events GROUP BY 1, 2
        ), r AS (
            SELECT event_type, CAST(sum(o) AS BIGINT) AS r
            FROM cells GROUP BY 1
        ), c AS (
            SELECT dow, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY 1
        ), t AS (
            SELECT CAST(sum(o) AS BIGINT) AS T FROM cells
        ), terms AS (
            SELECT cells.event_type AS k1, cells.dow AS k2,
                   (CAST(cells.o * t.T - r.r * c.c AS DOUBLE)
                    * CAST(cells.o * t.T - r.r * c.c AS DOUBLE))
                   / ((CAST(t.T AS DOUBLE) * CAST(r.r AS DOUBLE))
                      * CAST(c.c AS DOUBLE)) AS t
            FROM cells JOIN r USING (event_type) JOIN c USING (dow), t
        )
        SELECT CAST(count(DISTINCT k1) AS BIGINT) AS n_rows,
               CAST(count(DISTINCT k2) AS BIGINT) AS n_cols,
               CAST((count(DISTINCT k1) - 1) * (count(DISTINCT k2) - 1)
                    AS BIGINT) AS dof,
               round(list_reduce(list_prepend(0.0::DOUBLE,
                   list_transform(list_sort(list(struct_pack(
                       k1 := k1, k2 := k2, t := t))),
                       x -> x['t'])), (a, b) -> a + b), 6) AS chi2
        FROM terms
    """,
    "ab_test_conversion": f"""
        WITH g AS (
            SELECT user_id % 2 AS bucket,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CASE WHEN event_type = 'purchase'
                            THEN 1 ELSE 0 END) AS BIGINT) AS conv
            FROM events GROUP BY 1
        ), wide AS (
            SELECT CAST(sum(CASE WHEN bucket = 0 THEN n END) AS BIGINT)
                       AS na,
                   CAST(sum(CASE WHEN bucket = 0 THEN conv END)
                        AS BIGINT) AS ca,
                   CAST(sum(CASE WHEN bucket = 1 THEN n END) AS BIGINT)
                       AS nb,
                   CAST(sum(CASE WHEN bucket = 1 THEN conv END)
                        AS BIGINT) AS cb
            FROM g
        )
        SELECT na AS n_a, ca AS conv_a, nb AS n_b, cb AS conv_b,
               {_Z_SQL} AS z
        FROM wide
    """,
    "winsorized_mean": f"""
        WITH c AS (
            SELECT c_mktsegment,
                   CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
            FROM customer
        ), cuts AS (
            SELECT c_mktsegment,
                   CAST(floor(quantile_cont(cents, {WINSOR_LO}))
                        AS BIGINT) AS cut_lo_c,
                   CAST(floor(quantile_cont(cents, {WINSOR_HI}))
                        AS BIGINT) AS cut_hi_c
            FROM c GROUP BY 1
        ), clipped AS (
            SELECT c.c_mktsegment, cuts.cut_lo_c, cuts.cut_hi_c,
                   least(greatest(c.cents, cuts.cut_lo_c),
                         cuts.cut_hi_c) AS w
            FROM c JOIN cuts USING (c_mktsegment)
        ), agg AS (
            SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
                   CAST(any_value(cut_lo_c) AS BIGINT) AS cut_lo_c,
                   CAST(any_value(cut_hi_c) AS BIGINT) AS cut_hi_c,
                   CAST(sum(w) AS BIGINT) AS sw
            FROM clipped GROUP BY 1
        )
        SELECT c_mktsegment, n, cut_lo_c, cut_hi_c,
               -- sign-safe floor: DuckDB // truncates toward zero like
               -- Spark DIV, so subtract the non-negative mod first
               CAST(((2 * sw * 100 + n)
                     - (((2 * sw * 100 + n) % (2 * n) + 2 * n) % (2 * n)))
                    // (2 * n) AS BIGINT) AS wmean_e4
        FROM agg ORDER BY c_mktsegment
    """,
    "session_paths_topk": f"""
        WITH b AS (
            SELECT user_id, event_id, event_type,
                   CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
            FROM events
        ), s AS (
            SELECT *, CASE WHEN lag(ts_s) OVER w IS NULL
                            OR ts_s - lag(ts_s) OVER w > {SESSION_GAP_S}
                           THEN 1 ELSE 0 END AS brk
            FROM b
            WINDOW w AS (PARTITION BY user_id
                         ORDER BY ts_s ASC, event_id ASC)
        ), s2 AS (
            SELECT *, sum(brk) OVER (PARTITION BY user_id
                                     ORDER BY ts_s ASC, event_id ASC
                                     ROWS UNBOUNDED PRECEDING) AS sess
            FROM s
        ), p AS (
            SELECT user_id, sess,
                   array_to_string(list_transform(
                       list_sort(list(struct_pack(ts_s := ts_s,
                           event_id := event_id,
                           event_type := event_type)))
                       [1:{PATH_MAX_EVENTS}],
                       x -> x['event_type']), '>') AS path
            FROM s2 GROUP BY user_id, sess
        )
        SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
        FROM p GROUP BY path
        ORDER BY n_sessions DESC, path ASC LIMIT {PATH_TOP}
    """,
}

_ZK_DK = _zkey_sql(
    f"(o_custkey % {1 << ZORDER_BITS})",
    f"(((CAST(o_orderdate AS DATE) - DATE '{_DOW_ANCHOR}') % "
    f"{1 << ZORDER_BITS} + {1 << ZORDER_BITS}) % {1 << ZORDER_BITS})",
    " // ",
)

ORACLES["zorder_layout"] = f"""
    WITH base AS (
        SELECT o_custkey % {1 << ZORDER_BITS} AS xk,
               ((CAST(o_orderdate AS DATE) - DATE '{_DOW_ANCHOR}') %
                {1 << ZORDER_BITS} + {1 << ZORDER_BITS})
                   % {1 << ZORDER_BITS} AS yk,
               ({_ZK_DK}) // {1 << ZBUCKET_SHIFT} AS zbucket
        FROM orders
    )
    SELECT CAST(zbucket AS BIGINT) AS zbucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(xk) AS BIGINT) AS min_x,
           CAST(max(xk) AS BIGINT) AS max_x,
           CAST(min(yk) AS BIGINT) AS min_y,
           CAST(max(yk) AS BIGINT) AS max_y
    FROM base GROUP BY zbucket ORDER BY zbucket
"""

ORACLES["bloom_membership"] = f"""
    WITH bits AS (
        SELECT DISTINCT pos FROM (
            {" UNION ALL ".join(
                f"SELECT {_bloom_pos_sql('c_custkey', i, engine='duckdb')} AS pos "
                "FROM customer"
                for i in range(BLOOM_K)
            )}
        )
    ), probes AS (
        SELECT c_custkey AS key, 'present' AS probe_kind FROM customer
        UNION ALL
        SELECT c_custkey + 1000000000 AS key, 'absent' AS probe_kind
        FROM customer
    ), pp AS (
        SELECT DISTINCT probe_kind, key, pos FROM (
            {" UNION ALL ".join(
                f"SELECT probe_kind, key, {_bloom_pos_sql('key', i, engine='duckdb')} AS pos "
                "FROM probes"
                for i in range(BLOOM_K)
            )}
        )
    ), per_key AS (
        SELECT pp.probe_kind, pp.key,
               count(*) AS np,
               sum(CASE WHEN bits.pos IS NOT NULL THEN 1 ELSE 0 END)
                   AS nm
        FROM pp LEFT JOIN bits ON bits.pos = pp.pos
        GROUP BY pp.probe_kind, pp.key
    ), flagged AS (
        SELECT probe_kind, key FROM per_key WHERE nm = np
    ), f AS (
        SELECT probe_kind, CAST(count(*) AS BIGINT) AS n_flagged
        FROM flagged GROUP BY probe_kind
    ), t AS (
        SELECT probe_kind, CAST(count(*) AS BIGINT) AS n_probes
        FROM probes GROUP BY probe_kind
    )
    SELECT t.probe_kind, t.n_probes,
           CAST(coalesce(f.n_flagged, 0) AS BIGINT) AS n_flagged
    FROM t LEFT JOIN f USING (probe_kind)
    ORDER BY probe_kind
"""
