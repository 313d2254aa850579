"""Streaming burst detection — the q86 analytic maintained live.

Architecture (the shape that survives 100 TB/day event volume): the
STREAM does the expensive part — one incremental pass over the event
firehose maintaining the (event_type, hour-bucket, cnt) series as a
watermarked windowed aggregation (state is types × in-watermark hours,
bounded). The burst analytic itself (trailing-24-bucket baseline,
``pipelines.relational.burst_flags``) is a DERIVED VIEW recomputed per
micro-batch over that tiny series — O(types × hours), not O(events).
Splitting it this way is deliberate: an analytic window over the whole
series cannot be maintained incrementally by Structured Streaming
(each new bucket re-flags nothing but itself, but the frame spec needs
the series), while the count maintenance — the only part that touches
the firehose — maps exactly onto Spark's stateful windowed agg.

Equality contract (tests/test_streaming.py): after availableNow
drains N arrival batches, ``burst_flags`` over the sink equals the
batch ``q86_burst_detect`` on the union of all events.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .windows import EVENTS_SCHEMA, WATERMARK


def streaming_hourly_counts(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    out_table: str = "stream_burst_counts",
):
    """availableNow stream maintaining q86's hourly-count series:
    1h event-time tumbling windows with a late-data watermark,
    complete-mode into the in-memory sink ``out_table`` keyed
    (event_type, b). Returns the StreamingQuery."""
    from ..pipelines.relational import BURST_BUCKET_S

    ev = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .parquet(events_dir)
        .withWatermark("ts", WATERMARK)
    )
    cnt = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"))
        .select(
            "event_type",
            F.expr(f"unix_timestamp(w.start) div {BURST_BUCKET_S}").alias(
                "b"
            ),
            "cnt",
        )
    )
    return (
        cnt.writeStream.outputMode("complete")
        .format("memory")
        .queryName(out_table)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def burst_view(spark: SparkSession, counts_table: str):
    """The derived burst view over the streaming sink — q86's analytic
    verbatim."""
    from ..pipelines.relational import burst_flags

    return burst_flags(spark.table(counts_table))
