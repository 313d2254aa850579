"""Watermarked stream-stream interval join — the incremental twin of
the batch range join (pipelines/relational.py q51): purchases arriving
on one stream join clicks arriving on another when the click falls in
the hour preceding the purchase.

Scale shape: Structured Streaming buffers both sides in state keyed by
user_id; the event-time interval condition plus the watermark lets the
engine EVICT state older than purchase_ts - 1h - watermark, so state is
bounded by stream rate × (interval + watermark), not by history length.
Without the time-interval condition the state would grow forever — the
join condition below is therefore load-bearing on both the correctness
AND the memory bound.

The test asserts the streamed pair set (each side delivered in two
micro-batches, arbitrarily interleaved) equals the batch banded join's
pair set exactly — inner joins emit only matched pairs, so replay order
and batch boundaries must not change the result.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .windows import EVENTS_SCHEMA

WATERMARK = "2 hours"


def stream_range_join(
    spark: SparkSession,
    clicks_dir: str,
    purchases_dir: str,
    out_dir: str,
    checkpoint_dir: str,
):
    """availableNow stream-stream inner join: for each purchase, every
    click by the same user within the preceding hour; appends
    (purchase_id, user_id, click_id) rows to ``out_dir``. Returns the
    StreamingQuery."""
    clicks = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .parquet(clicks_dir)
        .withWatermark("ts", WATERMARK)
        .alias("c")
    )
    purchases = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .parquet(purchases_dir)
        .withWatermark("ts", WATERMARK)
        .alias("p")
    )
    joined = purchases.join(
        clicks,
        F.expr(
            "c.user_id = p.user_id"
            " AND c.ts >= p.ts - INTERVAL 1 HOUR"
            " AND c.ts < p.ts"
        ),
    )
    return (
        joined.select(
            F.col("p.event_id").alias("purchase_id"),
            F.col("p.user_id").alias("user_id"),
            F.col("c.event_id").alias("click_id"),
        )
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
