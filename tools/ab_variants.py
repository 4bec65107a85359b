"""Old-implementation variants for tools/bench_ab.py paired runs.

Each function freezes the PRE-optimization formulation of a key this
round rewrites, so the A/B harness can alternate old/new inside one
session. These are measurement twins, not product code: they must stay
row-identical to the key's committed r16 behaviour.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def rule_ancestor_old(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r16 rule_ancestor_prune: triple explosion WITHOUT the a-priori
    prefix semi-join (analytics14.py before r17)."""
    from abr_etl_spark.plans.analytics13 import AR_MIN_PAIR, _basket_census
    from abr_etl_spark.plans.analytics14 import _halfup

    l, pc_all = _basket_census(spark, sf_dir)
    x = l.select("l_orderkey", F.col("l_partkey").alias("ant_a"))
    y = l.select("l_orderkey", F.col("l_partkey").alias("ant_b"))
    ab = x.join(y, "l_orderkey").where(F.col("ant_a") < F.col("ant_b"))
    pair_ab = pc_all.where(F.col("ant") < F.col("cons")).select(
        F.col("ant").alias("ant_a"),
        F.col("cons").alias("ant_b"),
        "n_pair",
    )
    c = l.select("l_orderkey", F.col("l_partkey").alias("cons"))
    triples = (
        ab.join(c, "l_orderkey")
        .where(
            (F.col("cons") != F.col("ant_a"))
            & (F.col("cons") != F.col("ant_b"))
        )
        .groupBy("ant_a", "ant_b", "cons")
        .agg(F.count("*").cast("long").alias("n_triple"))
        .where(F.col("n_triple") >= AR_MIN_PAIR)
    )
    pc = pc_all.select(
        F.col("ant").alias("ant_a"), "cons",
        F.col("n_pair").alias("n_xc"),
    )
    per_part = l.groupBy("l_partkey").agg(
        F.count("*").cast("long").alias("n_part")
    )
    dec = "CAST({} AS DECIMAL(38,0))"
    beats_a = (
        f"{dec.format('n_triple')} * n_a > {dec.format('n_ac')} * n_pair"
    )
    beats_b = (
        f"{dec.format('n_triple')} * n_b > {dec.format('n_bc')} * n_pair"
    )
    return (
        triples.join(pair_ab, ["ant_a", "ant_b"])
        .join(
            pc.select("ant_a", "cons", F.col("n_xc").alias("n_ac")),
            ["ant_a", "cons"],
        )
        .join(
            pc.select(
                F.col("ant_a").alias("ant_b"),
                "cons",
                F.col("n_xc").alias("n_bc"),
            ),
            ["ant_b", "cons"],
        )
        .join(
            per_part.select(
                F.col("l_partkey").alias("ant_a"),
                F.col("n_part").alias("n_a"),
            ),
            "ant_a",
        )
        .join(
            per_part.select(
                F.col("l_partkey").alias("ant_b"),
                F.col("n_part").alias("n_b"),
            ),
            "ant_b",
        )
        .where(F.expr(f"({beats_a}) AND ({beats_b})"))
        .select(
            "ant_a",
            "ant_b",
            "cons",
            "n_triple",
            "n_pair",
            F.expr(
                "CAST("
                + _halfup("n_triple * 1000000", "n_pair")
                + " AS BIGINT)"
            ).alias("conf2_e6"),
            F.expr(
                "CAST(greatest("
                + _halfup(dec.format("n_ac") + " * 1000000", "n_a")
                + ", "
                + _halfup(dec.format("n_bc") + " * 1000000", "n_b")
                + ") AS BIGINT)"
            ).alias("anc_max_e6"),
        )
        .orderBy("ant_a", "ant_b", "cons")
    )
