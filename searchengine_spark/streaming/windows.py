"""Watermarked windowed aggregation over an events stream.

Demonstrates the Structured Streaming operator set the engine exposes
for time-series side-data (the driver's ``events`` table shape):
event-time tumbling windows with a late-data watermark, counts and
exact decimal sums per (window, event_type). Results are checked equal
to the batch twin (``pipelines.relational.q08_window_agg`` semantics)
in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

WATERMARK = "2 hours"
WINDOW = "1 hour"


def windowed_event_counts(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    out_table: str = "stream_window_counts",
):
    """availableNow stream: tumbling 1h event-time windows with a 2h
    watermark, complete-mode into an in-memory sink named
    ``out_table``. Returns the StreamingQuery."""
    ev = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .parquet(events_dir)
        .withWatermark("ts", WATERMARK)
    )
    agg = (
        ev.groupBy(F.window("ts", WINDOW).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("hour"),
            "event_type",
            "n",
            "sum_value",
        )
    )
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(out_table)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
