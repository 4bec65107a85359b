"""Round-13 LLM-pipeline batch: ANN Pareto frontier + boilerplate census."""

from __future__ import annotations

from abr_etl_spark.plans import llm_pipeline12 as l12
from tests.conftest import SF_ORACLE, assert_matches_oracle


def test_pareto_frontier_flags_exactly_the_undominated(spark):
    """Re-derive dominance brute-force over the collected rows: r is on
    the frontier iff no s has cost <= r.cost and recall >= r.recall with
    at least one strict -- the flag column must match exactly, and at
    least one row must be on the frontier (the max-recall row always
    is, via its cheapest representative)."""
    rows = l12.ann_pareto_frontier(spark, SF_ORACLE).collect()
    assert rows, "sweeps produced no configs"

    def dominated(r):
        return any(
            s["n_candidates"] <= r["n_candidates"]
            and s["recall_e4"] >= r["recall_e4"]
            and (
                s["n_candidates"] < r["n_candidates"]
                or s["recall_e4"] > r["recall_e4"]
            )
            for s in rows
        )

    for r in rows:
        assert r["on_frontier"] == (not dominated(r)), r
    assert any(r["on_frontier"] for r in rows)
    fams = {r["family"] for r in rows}
    assert fams == {"lsh_multiprobe", "ivfadc"}


def test_pareto_frontier_matches_oracle_smoke(spark, ddb):
    assert_matches_oracle(
        l12.ann_pareto_frontier(spark, SF_ORACLE),
        ddb,
        l12.ORACLES["ann_pareto_frontier"],
        key="ann_pareto_frontier",
    )


def test_boiler_census_counts_the_header(spark, tmp_path):
    """Two sources, one with a repeated non-header line: the page
    header is boilerplate everywhere a source has >= 2 pages; the
    planted repeated line raises s1's boiler share above s0's."""
    from abr_etl_spark.plans.llm_pipeline4 import LINES_PER_PAGE

    n = 4 * LINES_PER_PAGE  # 4 pages per source interleaved below
    docs = []
    for i in range(n):
        src = f"s{i % 2}"
        text = (
            "repeated boilerplate footer"
            if src == "s1" and i % 4 == 1
            else f"unique prose number {i} with its own words"
        )
        docs.append((i, text, "en", src, len(text)))
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = tmp_path / "lake"
    d.mkdir()
    df.coalesce(1).write.parquet(str(d / "documents.parquet"))
    out = {r["source"]: r for r in l12.boilerplate_line_census(spark, str(d)).collect()}
    assert set(out) == {"s0", "s1"}
    for src, r in out.items():
        assert r["n_boiler_lines"] >= 1  # the page header
        assert r["boiler_occurrences"] >= r["n_pages"]
        assert 0 <= r["boiler_share_e4"] <= 10000
        assert r["n_boiler_lines"] <= r["n_distinct_lines"]
    assert out["s1"]["n_boiler_lines"] == 2  # header + planted footer
    assert out["s1"]["boiler_share_e4"] > out["s0"]["boiler_share_e4"]


def test_boiler_census_matches_oracle_smoke(spark, ddb):
    assert_matches_oracle(
        l12.boilerplate_line_census(spark, SF_ORACLE),
        ddb,
        l12.ORACLES["boilerplate_line_census"],
        key="boilerplate_line_census",
    )


def test_cross_source_matrix_locates_the_planted_dup(spark, tmp_path):
    """Plant one near-identical doc pair across two sources and an
    in-source twin in a third: the matrix reports exactly those cells,
    pair sides lexically normalized."""
    base = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "green turtles watch from a mossy riverbank in the late summer"
    )
    docs = [
        (0, base, "en", "srcA", len(base)),
        (1, base + " indeed", "en", "srcB", len(base) + 7),
        (2, base + " truly", "en", "srcC", len(base) + 6),
        (3, base + " truly!", "en", "srcC", len(base) + 7),
        (4, "completely unrelated prose about spark shuffles and disks",
         "en", "srcA", 58),
    ]
    d = tmp_path / "lake"
    d.mkdir()
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    out = {
        (r["source_a"], r["source_b"]): r["n_pairs"]
        for r in l12.dedup_cross_source_matrix(spark, str(d)).collect()
    }
    assert out[("srcC", "srcC")] == 1  # the in-source twin
    # every cross cell among the planted near-dup cluster is ordered
    for a, b in out:
        assert a <= b
    assert ("srcA", "srcB") in out


def test_cross_source_matrix_matches_oracle_smoke(spark, ddb):
    assert_matches_oracle(
        l12.dedup_cross_source_matrix(spark, SF_ORACLE),
        ddb,
        l12.ORACLES["dedup_cross_source_matrix"],
        key="dedup_cross_source_matrix",
    )


def test_norm_outliers_flags_the_planted_vectors(spark, tmp_path, ddb):
    """A tight cluster of unit-ish vectors plus one zero vector and one
    10x vector: exactly those two flag, with the right sides -- and the
    planted lake round-trips the oracle (the sf tables are too uniform
    to exercise the flag, so parity is proven HERE)."""
    import duckdb

    cluster = [
        (i, [1.0, 0.0, 0.1 + 0.001 * (i % 7), 0.5], i % 3) for i in range(40)
    ]

    def lake(sub, extra):
        d = tmp_path / sub
        d.mkdir(parents=True)
        spark.createDataFrame(
            cluster + extra, "vec_id long, embedding array<float>, label int"
        ).coalesce(1).write.parquet(str(d / "embeddings.parquet"))
        return str(d)

    # one planted outlier per lake: a single extreme inflates sigma (the
    # z-fence is deliberately non-robust), so co-planting both would
    # mask the milder one -- each lake isolates one side
    low = lake("low", [(100, [0.0, 0.0, 0.0, 0.0], 0)])
    out = {r["vec_id"]: r["side"] for r in
           l12.embedding_norm_outliers(spark, low).collect()}
    assert out == {100: "low"}
    high = lake("high", [(101, [10.0, 10.0, 10.0, 10.0], 1)])
    out = {r["vec_id"]: r["side"] for r in
           l12.embedding_norm_outliers(spark, high).collect()}
    assert out == {101: "high"}
    # oracle parity on the SAME planted lakes
    for d, want in ((low, (100, "low")), (high, (101, "high"))):
        con = duckdb.connect()
        con.execute(
            # Spark writes a parquet DIRECTORY; glob its part files
            f"CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{d}/embeddings.parquet/*.parquet')"
        )
        got = con.sql(l12.ORACLES["embedding_norm_outliers"]).fetchall()
        assert {(r[0], r[2]) for r in got} == {want}


def test_norm_outliers_matches_oracle_smoke(spark, ddb):
    assert_matches_oracle(
        l12.embedding_norm_outliers(spark, SF_ORACLE),
        ddb,
        l12.ORACLES["embedding_norm_outliers"],
        key="embedding_norm_outliers",
    )
