"""Multimodal plumbing: binary payloads survive the Arrow round-trip and
the mapInPandas feature extractor is deterministic and distributed."""

from pyspark.sql import functions as F

from abr_etl_spark.operators import multimodal
from abr_etl_spark.sources.lake import load_table
from tests.conftest import SF_SMOKE


def test_payload_roundtrip(spark):
    d = load_table(spark, SF_SMOKE, "documents")
    mm = multimodal.attach_payload(d)
    row = mm.join(d, "doc_id").select("payload", "text", "meta").first()
    assert bytes(row["payload"]).decode("utf-8") == row["text"]
    assert row["meta"]["n_bytes"] == len(row["text"].encode())


def test_extract_features_matches_local_stub(spark):
    d = load_table(spark, SF_SMOKE, "documents")
    feats = multimodal.extract_features(multimodal.attach_payload(d))
    rows = {r["doc_id"]: r for r in feats.collect()}
    texts = {r["doc_id"]: r["text"] for r in d.collect()}
    assert len(rows) == len(texts)
    for doc_id, t in list(texts.items())[:20]:
        want = multimodal.decode_stub(t.encode())
        got = rows[doc_id]
        assert (got["width"], got["height"], got["checksum"]) == (
            want["width"],
            want["height"],
            want["checksum"],
        )
    assert feats.rdd.getNumPartitions() >= 1
