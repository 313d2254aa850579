"""Multimodal-column plumbing: opaque ``binary`` payloads with typed
metadata, decode/feature-extract as Arrow-batched ``mapInPandas``.

The sandbox has no image/audio libraries, so the actual decoders are
STUBBED (``decode_image`` raises NotImplementedError; the pipeline runs
with ``fake_features`` — a deterministic stand-in derived from the
payload bytes). The Spark-side plumbing — binary column handling, batch
shapes, schema, partitioning — is real and tested (tests/test_pipelines.py).

q26 synthesizes the binary payload from ``documents.text`` (the driver
tables carry no blobs), then computes byte-level metadata JVM-side
(octet length, md5 checksum) plus the stub feature — all of which DuckDB
reproduces, so the entry is fully oracle-checked. The stubbed decode
path itself is exercised separately via ``extract_features``.
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_DIM = 8

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("checksum", T.StringType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def decode_image(payload: bytes) -> "np.ndarray":
    """Real decoder — requires an image library not present in this
    container. The Spark plumbing around it is real; swap this body for
    PIL/libvips on a cluster with the deps installed."""
    raise NotImplementedError(
        "image decode requires an imaging library; use fake_features() "
        "for the deterministic test path"
    )


def fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in 'feature vector': byte-histogram moments of
    the payload, bucketed to FEATURE_DIM dims. Pure bytes -> floats."""
    if not payload:
        return [0.0] * FEATURE_DIM
    arr = np.frombuffer(payload, dtype=np.uint8)
    buckets = [
        float(arr[i::FEATURE_DIM].sum() % 997) for i in range(FEATURE_DIM)
    ]
    return buckets


def extract_features(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Arrow-batched feature extraction over a binary column. Partition-
    agnostic: one output row per input row, no shuffle."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(p) if p is not None else b"" for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": pd.Series([len(p) for p in payloads], dtype="int32"),
                    "checksum": [hashlib.md5(p).hexdigest() for p in payloads],
                    "features": [fake_features(p) for p in payloads],
                }
            )

    return media.mapInPandas(kernel, MEDIA_SCHEMA)


def q26_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata pass, JVM-only (oracle-checked twin of the
    mapInPandas path above): synthesize payload = utf8(text), emit byte
    length + md5 + the first fake-feature bucket computed via JVM
    aggregate over the byte array."""
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        F.length(payload).cast("int").alias("n_bytes"),
        F.md5("text").alias("checksum"),
    ).orderBy("doc_id")


QUERIES = {"q26_multimodal_meta": q26_multimodal_meta}

ORACLE = {
    "q26_multimodal_meta": """
SELECT doc_id,
       octet_length(encode(text))::INT AS n_bytes,
       md5(text) AS checksum
FROM documents ORDER BY doc_id
""",
}
