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
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import _tables

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
    container. The Spark plumbing around it is real; on a cluster with
    the deps installed, pass a PIL/libvips-backed callable as the
    ``decoder`` argument of :func:`extract_features` (zero engine-code
    change) or swap this body."""
    raise NotImplementedError(
        "image decode requires an imaging library; inject decoder= on "
        "extract_features, or use fake_features() for the deterministic "
        "test path"
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


def extract_features(
    media: DataFrame,
    payload_col: str = "payload",
    decoder: "Callable[[bytes], object] | None" = None,
) -> DataFrame:
    """Arrow-batched feature extraction over a binary column. Partition-
    agnostic: one output row per input row, no shuffle.

    ``decoder`` is the injection point for a REAL media decoder
    (``bytes -> array-like of floats``, e.g. PIL decode + embedding):
    it is cloudpickled to the executors, so a cluster with imaging libs
    installed plugs one in with zero engine-code change. Default is the
    deterministic byte-histogram stub (the oracle-checked path)."""
    feat = decoder if decoder is not None else fake_features

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(p) if p is not None else b"" for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": pd.Series([len(p) for p in payloads], dtype="int32"),
                    "checksum": [hashlib.md5(p).hexdigest() for p in payloads],
                    "features": [
                        [float(x) for x in np.asarray(feat(p)).ravel()]
                        for p in payloads
                    ],
                }
            )

    return media.mapInPandas(kernel, MEDIA_SCHEMA)


def q26_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata pass, JVM-only (oracle-checked twin of the
    mapInPandas path above): synthesize payload = utf8(text), emit byte
    length + md5 + the first fake-feature bucket computed via JVM
    aggregate over the byte array."""
    docs = _tables.load(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        F.length(payload).cast("int").alias("n_bytes"),
        F.md5("text").alias("checksum"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# q74: the ACTUAL mapInPandas feature pipeline under the oracle gate —
# payload = utf8(text) (fixture text is ASCII, so DuckDB codepoints ==
# bytes), decode-stub -> FEATURE_DIM byte-histogram features ->
# average-pool "resize" to POOL_DIM dims, one row per doc. Unlike q26
# (the JVM twin), this drives the real Arrow batch path — binary column
# in, array<double> out — and DuckDB recomputes the identical feature
# math, so a batch-shape or dtype regression in extract_features
# hash-fails the round gate. Values are exact small integers (sums mod
# 997) and exact halves after pooling — bit-stable, no rounding needed.
# --------------------------------------------------------------------------

POOL_DIM = FEATURE_DIM // 2  # 2:1 average pooling


def q74_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _tables.load(spark, sf_dir, "documents")
    media = docs.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    feats = extract_features(media)
    pooled = [
        (
            (F.get("features", 2 * j) + F.get("features", 2 * j + 1))
            / F.lit(2.0)
        ).alias(f"g{j}")
        for j in range(POOL_DIM)
    ]
    return feats.select("doc_id", "n_bytes", *pooled).orderBy("doc_id")


# --------------------------------------------------------------------------
# q75: frame sampling (video-style payload → every Nth fixed-size frame
# → per-frame feature). Exercises the 1→N Arrow batch shape (one input
# row explodes into a variable number of frame rows inside the kernel —
# the shape a real video sampler has), with a deterministic per-frame
# feature so DuckDB reproduces every sampled frame bit-for-bit. Frame
# fan-out is bounded by payload size / FRAME_BYTES / FRAME_STRIDE, so a
# task's output stays proportional to its input split at any scale.
# --------------------------------------------------------------------------

FRAME_BYTES = 32  # "frame" = fixed 32-byte window of the payload
FRAME_STRIDE = 4  # keep every 4th frame

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("f", T.LongType()),
    ]
)


def sample_frames(
    media: DataFrame,
    payload_col: str = "payload",
    frame_feature: "Callable[[np.ndarray], int] | None" = None,
) -> DataFrame:
    """Arrow-batched frame sampler over a binary column: one output row
    per KEPT frame (indices 0, FRAME_STRIDE, 2·FRAME_STRIDE, …).
    ``frame_feature`` (uint8 frame array -> int) is the injection point
    for a real per-frame featurizer; default is the deterministic
    byte-sum stub the oracle reproduces."""
    feat = frame_feature if frame_feature is not None else (
        lambda frame: int(frame.sum()) % 997
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            feats: list[int] = []
            for doc_id, p in zip(pdf["doc_id"], pdf[payload_col]):
                payload = bytes(p) if p is not None else b""
                arr = np.frombuffer(payload, dtype=np.uint8)
                n_frames = (len(arr) + FRAME_BYTES - 1) // FRAME_BYTES
                for k in range(0, n_frames, FRAME_STRIDE):
                    frame = arr[k * FRAME_BYTES : (k + 1) * FRAME_BYTES]
                    ids.append(int(doc_id))
                    idxs.append(k)
                    feats.append(int(feat(frame)))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "f": pd.Series(feats, dtype="int64"),
                }
            )

    return media.mapInPandas(kernel, FRAME_SCHEMA)


def q75_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _tables.load(spark, sf_dir, "documents")
    media = docs.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return sample_frames(media).orderBy("doc_id", "frame_idx")


QUERIES = {
    "q26_multimodal_meta": q26_multimodal_meta,
    "q74_multimodal_features": q74_multimodal_features,
    "q75_frame_sample": q75_frame_sample,
}

ORACLE = {
    "q26_multimodal_meta": """
SELECT doc_id,
       octet_length(encode(text))::INT AS n_bytes,
       md5(text) AS checksum
FROM documents ORDER BY doc_id
""",
    # q74: recompute fake_features relationally — byte value at 0-based
    # position p lands in bucket p % FEATURE_DIM; bucket sum mod 997;
    # 2:1 average pool. ASCII fixture => unicode(char) == byte value.
    "q74_multimodal_features": """
WITH pos AS (
  SELECT doc_id, i, unicode(substr(text, i, 1)) AS code
  FROM documents, unnest(range(1, length(text) + 1)) AS u(i)
),
f AS (
  SELECT doc_id, (i - 1) % 8 AS b, (sum(code) % 997)::DOUBLE AS v
  FROM pos GROUP BY doc_id, (i - 1) % 8
),
w AS (
  SELECT doc_id,
         coalesce(max(CASE WHEN b = 0 THEN v END), 0) AS f0,
         coalesce(max(CASE WHEN b = 1 THEN v END), 0) AS f1,
         coalesce(max(CASE WHEN b = 2 THEN v END), 0) AS f2,
         coalesce(max(CASE WHEN b = 3 THEN v END), 0) AS f3,
         coalesce(max(CASE WHEN b = 4 THEN v END), 0) AS f4,
         coalesce(max(CASE WHEN b = 5 THEN v END), 0) AS f5,
         coalesce(max(CASE WHEN b = 6 THEN v END), 0) AS f6,
         coalesce(max(CASE WHEN b = 7 THEN v END), 0) AS f7
  FROM f GROUP BY doc_id
)
SELECT d.doc_id,
       octet_length(encode(d.text))::INT AS n_bytes,
       (coalesce(f0, 0) + coalesce(f1, 0)) / 2.0 AS g0,
       (coalesce(f2, 0) + coalesce(f3, 0)) / 2.0 AS g1,
       (coalesce(f4, 0) + coalesce(f5, 0)) / 2.0 AS g2,
       (coalesce(f6, 0) + coalesce(f7, 0)) / 2.0 AS g3
FROM documents d LEFT JOIN w USING (doc_id)
ORDER BY doc_id
""",
    # q75: frame of 0-based byte position p = p // FRAME_BYTES; keep
    # frames where idx % FRAME_STRIDE == 0; per-frame byte sum mod 997.
    "q75_frame_sample": """
SELECT doc_id, ((i - 1) // 32)::INT AS frame_idx,
       (sum(unicode(substr(text, i, 1))) % 997)::BIGINT AS f
FROM documents, unnest(range(1, length(text) + 1)) AS u(i)
WHERE ((i - 1) // 32) % 4 = 0
GROUP BY doc_id, (i - 1) // 32
ORDER BY doc_id, frame_idx
""",
}
