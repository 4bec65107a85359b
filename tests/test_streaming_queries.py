"""Staging lifecycle tests for the streaming driver keys."""

from tests.conftest import SF_ORACLE

def test_stage_restages_on_source_fingerprint_change(spark, tmp_path):
    """A regenerated source table at the same path must restage the drops
    (the stale-replay-vs-fresh-oracle mismatch from the r6 advice)."""
    import shutil
    from pathlib import Path

    from abr_etl_spark.plans import streaming_queries as sq

    src = tmp_path / "sfX"
    src.mkdir()
    ev_src = Path(SF_ORACLE) / "events.parquet"
    if ev_src.is_dir():
        shutil.copytree(ev_src, src / "events.parquet")
    else:
        shutil.copy2(ev_src, src / "events.parquet")
    stage1 = Path(sq._stage_event_drops(spark, str(src)))
    marker = stage1 / "_STAGED_FP"
    fp1 = marker.read_text()
    # idempotent while the source is unchanged
    assert Path(sq._stage_event_drops(spark, str(src))) == stage1
    assert marker.read_text() == fp1
    # "regenerate" the source: touch mtimes forward
    import os
    import time

    ev = src / "events.parquet"
    for p in ev.iterdir() if ev.is_dir() else [ev]:
        os.utime(p, (time.time() + 5, time.time() + 5))
    sq._stage_event_drops(spark, str(src))
    assert marker.read_text() != fp1, "fingerprint must change -> restaged"


def test_stream_hll_matches_batch_sketch(spark):
    """The streaming registers' fixpoint equals the batch sketch built
    from the same deterministic hash -- order-invariance of max(rank)
    across microbatches."""
    from pyspark.sql import functions as F

    from abr_etl_spark.plans import streaming_queries as sq
    from abr_etl_spark.plans.analytics8 import (
        HLL_M,
        _hll_hash_sql,
        _hll_rank_sql,
    )
    from abr_etl_spark.sources.lake import load_table
    from tests.conftest import SF_SMOKE

    got = sq.q_stream_hll_distinct(spark, SF_SMOKE).collect()[0]
    h = f"({_hll_hash_sql('user_id')})"
    batch = (
        load_table(spark, SF_SMOKE, "events")
        .select(
            F.expr(f"{h} % {HLL_M}").alias("bucket"),
            F.expr(_hll_rank_sql(f"{h} DIV {HLL_M}")).alias("rank"),
        )
        .groupBy("bucket")
        .agg(F.max("rank").alias("max_rank"))
        .collect()
    )
    assert got.n_filled == len(batch)
    assert got.m == HLL_M


def test_stream_topk_windowed_matches_batch_rank(spark):
    """The streaming fixpoint's per-window top-k equals the batch
    window-count + rank recomputation, ranks are contiguous from 1 and
    counts non-increasing within each window."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from abr_etl_spark.plans import streaming_queries as sq
    from abr_etl_spark.sources.lake import load_table
    from tests.conftest import SF_SMOKE

    got = sq.q_stream_topk_windowed(spark, SF_SMOKE).collect()
    assert got
    per_w: dict = {}
    for r in got:
        per_w.setdefault(r.window_start, []).append(r)
    for rows in per_w.values():
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        ns = [r.n for r in rows]
        assert ns == sorted(ns, reverse=True)
    batch = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy(
            F.date_format(
                F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss"
            ).alias("window_start"),
            "event_type",
        )
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("window_start").orderBy(
        F.col("n").desc(), F.col("event_type").asc()
    )
    want = (
        batch.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= sq.STREAM_TOPK)
        .collect()
    )
    assert sorted((r.window_start, r.event_type, r.n, r.rank) for r in got) \
        == sorted((r.window_start, r.event_type, r.n, r.rank) for r in want)
