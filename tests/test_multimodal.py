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


def test_frame_sample_covers_and_bounds(spark):
    """Frame samples must (a) emit at most FRAME_SAMPLES rows per doc,
    (b) start frame 0 at offset 0, (c) keep every slice inside the
    payload with len <= FRAME_BYTES, and (d) use a uniform stride."""
    from abr_etl_spark.operators import multimodal as mm
    from abr_etl_spark.sources.lake import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    payloads = {
        r["doc_id"]: r["n_bytes"]
        for r in mm.attach_payload(d).select("doc_id", "meta.n_bytes").collect()
    }
    rows = mm.sample_frames(mm.attach_payload(d)).collect()
    assert rows
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r["sample_idx"])
        n = payloads[doc_id]
        assert 1 <= len(rs) <= mm.FRAME_SAMPLES
        assert rs[0]["byte_offset"] == 0 and rs[0]["frame_idx"] == 0
        strides = {
            b["frame_idx"] - a["frame_idx"] for a, b in zip(rs, rs[1:])
        }
        assert len(strides) <= 1, "stride must be uniform"
        for r in rs:
            assert r["byte_offset"] < n
            assert 1 <= r["frame_len"] <= mm.FRAME_BYTES
            assert r["byte_offset"] + r["frame_len"] <= n


def test_worker_udf_modules_pickle_by_value():
    """Modules whose functions cross the driver/worker boundary must be
    registered for by-value cloudpickle: a driver process with a foreign
    cwd (the round driver) spawns workers that cannot import this
    package, and by-reference pickling then dies with
    ModuleNotFoundError (caught live in r6, fixed at module import)."""
    from pyspark import cloudpickle

    import abr_etl_spark.operators.multimodal as mm
    import abr_etl_spark.operators.similarity as sim
    import abr_etl_spark.streaming.stateful as st

    registered = {
        m if isinstance(m, str) else m.__name__
        for m in cloudpickle.list_registry_pickle_by_value()
    }
    for mod in (mm, sim, st):
        assert mod.__name__ in registered, mod.__name__
