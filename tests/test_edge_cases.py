"""Edge cases the 100 TB runs will hit: null keys, empty snapshots,
unicode text, single-token docs, empty embeddings handled upstream."""

from pyspark.sql import functions as F

from abr_etl_spark.operators import dedup, delta, text


def _snap(spark, rows):
    return spark.createDataFrame(rows, "pid string, v string, importdate string")


def test_delta_with_empty_old_snapshot(spark):
    new = _snap(spark, [("k1", "a", "d2"), ("k2", "b", "d2")])
    old = _snap(spark, []).where(F.lit(False))
    assert delta.delta_added(new, old, "pid").count() == 2
    assert delta.delta_updated(new, old, "pid").count() == 0
    assert delta.delta_removed(new, old, "pid").count() == 0


def test_delta_null_key_rows_kept_distinct(spark):
    """NULL keys never equi-join; they classify as added+removed (the
    safe CDC interpretation -- a keyless row can't be 'the same' row)."""
    new = _snap(spark, [(None, "a", "d2"), ("k1", "x", "d2")])
    old = _snap(spark, [(None, "a", "d1"), ("k1", "x", "d1")])
    classified = delta.delta_classify(new, old, "pid")
    by = {r["change"] for r in classified.collect()}
    assert "unchanged" in by  # k1
    added = delta.delta_added(new, old, "pid").count()
    removed = delta.delta_removed(new, old, "pid").count()
    assert (added, removed) == (1, 1)


def test_dedup_exact_unicode_and_whitespace(spark):
    df = spark.createDataFrame(
        [
            (1, "Héllo  Wörld"),
            (2, "héllo wörld"),
            (3, "中文 文本"),
            (4, "中文  文本"),
            (5, "distinct"),
        ],
        "doc_id long, text string",
    )
    out = {r["kept_id"]: r["n_copies"] for r in dedup.dedup_exact(df).collect()}
    assert out == {1: 2, 3: 2, 5: 1}


def test_shingles_shorter_than_n(spark):
    df = spark.createDataFrame(
        [(1, "one two"), (2, "single"), (3, "one two")],
        "doc_id long, text string",
    )
    sh = {r["doc_id"]: r["shingles"] for r in dedup.shingle_df(df, n=3).collect()}
    # short docs produce exactly one whole-doc shingle hash; identical
    # text -> identical hash, different text -> different hash
    assert len(sh[1]) == len(sh[2]) == 1
    assert sh[1] == sh[3] and sh[1] != sh[2]


def test_jaccard_identical_short_docs(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha beta"), (3, "gamma delta")],
        "doc_id long, text string",
    )
    pairs = dedup.ngram_jaccard_pairs(df, threshold=0.9).collect()
    assert [(r["doc_a"], r["doc_b"], r["jaccard"]) for r in pairs] == [(1, 2, 1.0)]


def test_quality_score_empty_text(spark):
    df = spark.createDataFrame([(1, ""), (2, "the of and")], "doc_id long, text string")
    rows = {r["doc_id"]: r["quality"] for r in text.with_quality(df).collect()}
    assert rows[1] >= 0  # no division-by-zero under ANSI mode
    assert rows[2] > rows[1]


def test_scd2_single_snapshot(spark):
    df = _snap(spark, [("k1", "a", "2024-01-01")])
    hist = delta.scd2(df, "pid").collect()
    assert len(hist) == 1 and hist[0]["is_current"]


def test_ngram_df_cap_keeps_rare_shingle_pairs(spark):
    """VERDICT r1 item 4: a hot shingle (boilerplate in every doc) must
    not blow up the candidate set, and a true near-dup pair sharing rare
    shingles must survive the cap with EXACT jaccard."""
    boiler = "lorem ipsum dolor sit amet consectetur"
    rows = [
        (i, f"unique text {i} alpha beta gamma delta epsilon zeta " + boiler)
        for i in range(20)
    ]
    rows += [
        (100, "the quick brown fox jumps over the lazy dog again and again today"),
        (101, "the quick brown fox jumps over the lazy dog again and again tonight"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.ngram_jaccard_pairs(df, threshold=0.8, df_cap=5).collect()
    assert [(r.doc_a, r.doc_b, r.jaccard) for r in out] == [(100, 101, 0.8333)]


def test_ngram_prefix_filter_is_lossless_vs_bruteforce(spark):
    """AllPairs prefix filtering must find every pair >= tau that brute
    force finds (losslessness is a theorem; pin it against drift)."""
    import itertools

    words = ["w%d" % i for i in range(12)]
    rows = []
    for i in range(30):
        # overlapping rotations -> many medium-similarity pairs
        toks = [words[(i + j) % 12] for j in range(8)]
        rows.append((i, " ".join(toks)))
    rows.append((200, rows[0][1]))  # exact dup of doc 0
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(df, threshold=0.5).collect()
    }
    # brute force in python
    def sh(text):
        t = text.split()
        return {tuple(t[i : i + 3]) for i in range(len(t) - 2)}

    texts = dict(rows)
    want = {}
    for a, b in itertools.combinations(sorted(texts), 2):
        sa, sb = sh(texts[a]), sh(texts[b])
        j = len(sa & sb) / len(sa | sb)
        if j >= 0.5:
            want[(a, b)] = round(j, 4)
    assert got == want


def test_result_cache_lifecycle(spark):
    """Pair operators register their materialized result caches with
    functions/cache.py; release_result_caches() frees every one (r5 advice:
    nothing previously unpersisted them, leaking one cache per distinct
    operator input for session lifetime)."""
    from abr_etl_spark.functions import cache as result_cache
    from abr_etl_spark.operators import dedup as dd
    from abr_etl_spark.sources.lake import load_table

    result_cache.release_result_caches()  # start clean
    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    pairs = dd.simhash_pairs(d)
    assert pairs.storageLevel.useMemory, "result should be materialized"
    assert len(result_cache._RESULT_CACHES) >= 1
    released = result_cache.release_result_caches()
    assert released >= 1
    assert not result_cache._RESULT_CACHES
    assert not pairs.storageLevel.useMemory, "release must unpersist"
    # the DataFrame itself must stay usable post-release (lineage intact)
    assert pairs.count() >= 0


def test_ntile_distributed_degenerate_inputs(spark):
    """Distributed ntile on n < tiles and on an all-equal metric must
    still produce valid tiles (ties split purely by the key)."""
    from abr_etl_spark.plans.analytics5 import _ntile_distributed

    tiny = spark.createDataFrame(
        [(1, 5), (2, 5)], "o_custkey long, m long"
    )
    got = {
        r["o_custkey"]: r["__tile"]
        for r in _ntile_distributed(tiny, "m", ascending=True).collect()
    }
    assert got == {1: 1, 2: 2}
    flat = spark.createDataFrame(
        [(i, 7) for i in range(8)], "o_custkey long, m long"
    )
    tiles = [
        r["__tile"]
        for r in _ntile_distributed(flat, "m", ascending=False)
        .orderBy("o_custkey")
        .collect()
    ]
    assert tiles == [1, 1, 2, 2, 3, 3, 4, 4]


def test_time_weighted_avg_constant_value_user(spark, monkeypatch):
    """A user whose value never changes must report exactly that value
    (trapezoids of a constant)."""
    from abr_etl_spark.plans import analytics6 as a6

    df = spark.createDataFrame(
        [
            (1, 100, "2024-01-01 00:00:00", 2.5),
            (2, 100, "2024-01-01 01:00:00", 2.5),
            (3, 100, "2024-01-01 05:00:00", 2.5),
        ],
        "event_id long, user_id long, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    monkeypatch.setattr(a6, "load_table", lambda s, d, t: df)
    rows = a6.time_weighted_avg(spark, "ignored").collect()
    assert len(rows) == 1 and rows[0]["twa_e4"] == 25000


def test_unzip_drop_empty_zip(tmp_path):
    """An empty weekly zip extracts to an empty drop, not an error."""
    import zipfile

    from abr_etl_spark import pipeline

    zp = tmp_path / "empty.zip"
    zipfile.ZipFile(zp, "w").close()
    assert pipeline.unzip_drop(str(zp), str(tmp_path / "out")) == []


def test_weighted_sample_single_heavy_item(spark, monkeypatch):
    """One item holding nearly all weight must be picked ~K times."""
    from abr_etl_spark.plans import analytics7 as a7

    df = spark.createDataFrame(
        [(1, 1000000.0)] + [(i, 0.01) for i in range(2, 12)],
        "o_orderkey long, o_totalprice double",
    )
    monkeypatch.setattr(a7, "load_table", lambda s, d, t: df)
    rows = a7.weighted_sample_systematic(spark, "ignored").collect()
    total = sum(r["n_picks"] for r in rows)
    heavy = {r["o_orderkey"]: r["n_picks"] for r in rows}[1]
    assert total == a7.WS_K and heavy >= a7.WS_K - 1
