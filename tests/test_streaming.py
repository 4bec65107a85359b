"""D-block: file-source streaming replay == batch result; stateful op
maintains keyed state across microbatches; oracle check for the shared
windowed-count semantics."""

import shutil

from pyspark.sql import functions as F

from abr_etl_spark.plans import streaming_queries
from abr_etl_spark.sources.lake import load_table
from abr_etl_spark.streaming import stateful, stream_ops
from tests.conftest import SF_ORACLE, SF_SMOKE, assert_matches_oracle


def test_stream_window_counts_vs_oracle(spark, ddb):
    df = streaming_queries.q_stream_window_counts(spark, SF_ORACLE)
    assert_matches_oracle(
        df, ddb, streaming_queries.ORACLES["stream_window_counts"], "stream"
    )


def _stage_events(tmp_path):
    d = tmp_path / "events_stream"
    d.mkdir()
    shutil.copy(f"{SF_SMOKE}/events.parquet", d / "events.parquet")
    return str(d)


def test_streaming_replay_equals_batch(spark, tmp_path):
    src_dir = _stage_events(tmp_path)
    stream = stream_ops.read_event_stream(spark, src_dir)
    assert stream.isStreaming
    q = stream_ops.run_stream_to_memory(
        stream_ops.windowed_counts(stream), "wc_stream"
    )
    try:
        got = {
            tuple(r)
            for r in spark.sql("select * from wc_stream").collect()
        }
        want = {
            tuple(r)
            for r in stream_ops.windowed_counts(
                load_table(spark, SF_SMOKE, "events")
            ).collect()
        }
        assert got == want and len(got) > 0
    finally:
        q.stop()


def test_stateful_running_counts(spark, tmp_path):
    src_dir = _stage_events(tmp_path)
    stream = stream_ops.read_event_stream(spark, src_dir)
    result = stateful.running_counts_stateful(stream)
    q = stream_ops.run_stream_to_memory(result, "rc_stream", output_mode="update")
    try:
        got = {
            r["user_id"]: r["n_events_total"]
            for r in spark.sql(
                "select user_id, max(n_events_total) n_events_total from rc_stream group by user_id"
            ).collect()
        }
        want = {
            r["user_id"]: r["n"]
            for r in load_table(spark, SF_SMOKE, "events")
            .groupBy("user_id")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        assert got == want
    finally:
        q.stop()
