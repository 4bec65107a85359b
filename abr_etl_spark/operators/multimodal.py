"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode/feature-extraction runs as Arrow-batched
``mapInPandas`` (the ONLY sanctioned Python-in-the-loop path in this
engine). The decode itself is STUBBED -- this container has no
image/audio libraries -- behind ``decode_stub``, a deterministic fake
with the real batch shape, schema, and partitioning, so the Spark-side
plumbing is fully exercised and a real decoder (PIL/torchaudio) drops in
by replacing one function.

Scale notes: payload bytes never pass through the driver; mapInPandas
streams Arrow batches per partition, so memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` x mean payload size --
repartition upstream by size class if payloads are skewed.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("checksum", LongType()),
    ]
)


def attach_payload(df: DataFrame, text: str = "text") -> DataFrame:
    """Lift a text corpus into multimodal shape: (doc_id, payload binary,
    meta struct). Stand-in for reading real image/audio bytes."""
    payload = F.encode(F.col(text), "utf-8")
    return df.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(payload).alias("n_bytes"),
        ).alias("meta"),
    )


def decode_stub(payload: bytes | None) -> dict:
    """Deterministic fake decoder. A real implementation would be e.g.
    PIL.Image.open(io.BytesIO(payload)); raising NotImplementedError here
    would be honest too, but a deterministic fake lets the full pipeline
    run end-to-end in tests. A NULL payload (all-NULL upstream export)
    decodes to NULL features, like every SQL function over NULL."""
    if payload is None:
        return {"width": None, "height": None, "checksum": None}
    n = len(payload)
    checksum = 0
    for b in payload[:64]:  # bounded work per row, like a header parse
        checksum = (checksum * 31 + b) % 2147483647
    return {"width": (n % 64) + 1, "height": (n % 48) + 1, "checksum": checksum}


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_stub(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "mime": [m["mime"] for m in pdf["meta"]],
                    "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "checksum": [f["checksum"] for f in feats],
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


#: bytes per synthetic "frame" and frames sampled per payload.
FRAME_BYTES = 32
FRAME_SAMPLES = 4

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sample_idx", LongType()),
        StructField("frame_idx", LongType()),
        StructField("byte_offset", LongType()),
        StructField("frame_len", LongType()),
        StructField("frame_checksum", LongType()),
    ]
)


def sample_frames(df: DataFrame) -> DataFrame:
    """Deterministic frame sampling over binary payloads -- the video
    analogue of extract_features: treat every FRAME_BYTES-byte window as
    a frame, uniformly sample up to FRAME_SAMPLES of them (stride =
    frame_count DIV FRAME_SAMPLES), and emit per-sample byte ranges plus
    a header-style checksum. A real pipeline replaces the byte-window
    slicing with an actual demuxer keyframe fetch; the Spark plumbing --
    Arrow batches, fan-out bounded at FRAME_SAMPLES rows per payload,
    nothing through the driver -- is the part exercised here, and the
    checksum math is replayed by the DuckDB oracle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    # NULL payload: zero frames, matching the oracle's
                    # unnest(range(0, NULL)) -> no rows semantics.
                    continue
                n = len(payload)
                fc = (n + FRAME_BYTES - 1) // FRAME_BYTES
                k = min(FRAME_SAMPLES, fc)
                stride = max(1, fc // FRAME_SAMPLES)
                for j in range(k):
                    off = j * stride * FRAME_BYTES
                    fb = payload[off : off + FRAME_BYTES]
                    cs = 0
                    for b in fb:
                        cs = (cs * 31 + b) % 2147483647
                    rows.append(
                        (doc_id, j, j * stride, off, len(fb), cs)
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "sample_idx",
                    "frame_idx",
                    "byte_offset",
                    "frame_len",
                    "frame_checksum",
                ],
            )

    return df.mapInPandas(run, FRAME_SCHEMA)


# Self-contained worker pickling: these module-level functions cross the
# driver/worker boundary (Arrow/stateful UDFs). By default cloudpickle
# serializes them BY REFERENCE, so a Python worker spawned from a driver
# process with a foreign cwd (the round driver, notebooks) dies with
# ModuleNotFoundError on this package. Registering the module for
# by-value pickling ships the function bodies with the task instead --
# no sys.path assumptions on workers.
try:
    import sys as _sys

    from pyspark import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(_sys.modules[__name__])
except Exception:  # pragma: no cover - ancient cloudpickle
    pass
