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


def decode_stub(payload: bytes) -> dict:
    """Deterministic fake decoder. A real implementation would be e.g.
    PIL.Image.open(io.BytesIO(payload)); raising NotImplementedError here
    would be honest too, but a deterministic fake lets the full pipeline
    run end-to-end in tests."""
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
