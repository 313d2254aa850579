"""Streaming exact deduplication — the incremental twin of the batch
q15 operator (pipelines/dedup.py): suppress any document whose content
hash was already seen in ANY earlier micro-batch, so a continuously
ingested corpus stays dup-free without re-scanning history.

Reference analog: the crawler's seen-URL check
(/root/reference/src/search/jobs/Crawler.java:136-141) is a frontier-
level dedup; here the same idea runs content-level over the stream.

State design (the 100 TB consideration): `dropDuplicates` keeps one
state row per distinct key for ever, so the key must be the 16-byte md5
of the text, never the text itself — state size = n_distinct * O(16 B),
hash-partitioned across executors by key, persisted in the checkpoint
(RocksDB state store on a real cluster) and restored on restart, so a
crash cannot re-admit a duplicate. When the dup horizon is time-bounded
(near-line ingest where a dup only ever arrives within hours of the
original), `stream_dedup_within_watermark` bounds state by event time
instead — expired keys are dropped with the watermark.

Keep semantics differ from batch q15 on purpose: the stream keeps the
FIRST-ARRIVED copy (there is no global min-doc_id before the stream
ends); the kept *content set* is identical, which is what the batch-
equivalence test asserts.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def stream_dedup_exact(
    spark: SparkSession,
    docs_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: T.StructType = DOCS_SCHEMA,
):
    """availableNow stream: append every first-seen document to
    ``out_dir`` (parquet), drop every later content-identical arrival —
    across micro-batches and across restarts. Returns the
    StreamingQuery."""
    s = spark.readStream.schema(schema).parquet(docs_dir)
    dd = s.withColumn("h", F.md5("text")).dropDuplicates(["h"]).drop("h")
    return (
        dd.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def stream_dedup_within_watermark(
    spark: SparkSession,
    docs_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    ts_col: str,
    delay: str,
    schema: T.StructType,
):
    """Bounded-state variant: duplicates are only suppressed while their
    key is younger than the ``delay`` watermark on ``ts_col`` — state for
    older keys is evicted, so memory is O(distinct keys per horizon)
    instead of O(distinct keys ever)."""
    s = (
        spark.readStream.schema(schema)
        .parquet(docs_dir)
        .withWatermark(ts_col, delay)
    )
    dd = (
        s.withColumn("h", F.md5("text"))
        .dropDuplicatesWithinWatermark(["h"])
        .drop("h")
    )
    return (
        dd.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
