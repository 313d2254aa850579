"""Custom stateful streaming operator: per-user sessionization via
``applyInPandasWithState`` — the streaming twin of the batch
``pipelines.relational.q07_sessionize`` (same 1800 s gap rule, same
(ts, event_id) tie order).

State per user is three longs (last event-time µs, session count, event
count); each micro-batch folds its (sorted) events into the state and
emits the running totals in update mode. The operator assumes per-key
batches arrive in event-time order ACROSS batches (the file source
processes files in discovery order; a production deployment would pair
this with a watermark + dropped-late-data policy or buffer a
reorder-window in state — the within-batch sort already handles
intra-batch disorder). tests/test_streaming.py feeds two time-split
files and asserts the final totals equal the batch twin.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .windows import EVENTS_SCHEMA

SESSION_GAP_S = 1800  # keep equal to relational.SESSION_GAP_S

OUT_SCHEMA = "user_id long, n_sessions long, n_events long"
STATE_SCHEMA = "last_ts_us long, n_sessions long, n_events long"


def _fold(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        last, ns, ne = state.get
    else:
        last, ns, ne = None, 0, 0
    rows = pd.concat(list(pdfs))
    rows = rows.sort_values(["ts", "event_id"], kind="mergesort")
    for ts in rows["ts"]:
        us = int(pd.Timestamp(ts).value // 1000)
        if last is None or us - last > SESSION_GAP_S * 1_000_000:
            ns += 1
        last = us
        ne += 1
    state.update((last, ns, ne))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_sessions": [ns], "n_events": [ne]}
    )


def sessionize_stream(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    out_table: str = "stream_sessions",
):
    """availableNow stream: stateful per-user sessionization into an
    in-memory sink named ``out_table`` (update mode — the final totals
    for a user are its row with the largest n_events). Returns the
    StreamingQuery."""
    ev = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)  # one file per batch: exercises
        .parquet(events_dir)              # cross-batch state carry-over
    )
    out = ev.groupBy("user_id").applyInPandasWithState(
        _fold, OUT_SCHEMA, STATE_SCHEMA, "update",
        GroupStateTimeout.NoTimeout,
    )
    return (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(out_table)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
