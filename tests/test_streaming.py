"""Structured Streaming: incremental tokenize equals batch tokenize,
checkpoint prevents re-ingestion, watermarked window agg equals batch."""

import os
import shutil

from pyspark.sql import functions as F

STREAMDIR = "/tmp/se_spark_fixtures/streaming"


def _batch_tokens(spark, pages_path):
    from searchengine_spark.indexer import (
        _ingest_filter,
        docs_with_scoring_text,
        tokenize,
    )

    docs = docs_with_scoring_text(_ingest_filter(spark.read.parquet(pages_path)))
    return tokenize(docs)


def test_stream_tokenize_incremental(spark, tiny_pages_path):
    from searchengine_spark.streaming.ingest import stream_tokenize

    shutil.rmtree(STREAMDIR, ignore_errors=True)
    pages_in = os.path.join(STREAMDIR, "pages")
    tokens_out = os.path.join(STREAMDIR, "tokens")
    ckpt = os.path.join(STREAMDIR, "ckpt")
    os.makedirs(pages_in)

    # split the fixture corpus into two arriving file batches
    import pyarrow.parquet as pq

    tbl = pq.read_table(tiny_pages_path)
    half = tbl.num_rows // 2
    pq.write_table(tbl.slice(0, half), os.path.join(pages_in, "b0.parquet"))

    q = stream_tokenize(spark, pages_in, tokens_out, ckpt, n_buckets=4)
    q.awaitTermination()
    n1 = spark.read.parquet(tokens_out).count()
    assert n1 > 0

    # batch 2: the rest lands; restart ingests ONLY the new file
    pq.write_table(tbl.slice(half), os.path.join(pages_in, "b1.parquet"))
    q = stream_tokenize(spark, pages_in, tokens_out, ckpt, n_buckets=4)
    q.awaitTermination()
    streamed = spark.read.parquet(tokens_out)

    batch = _batch_tokens(spark, tiny_pages_path)
    assert streamed.count() == batch.count()
    # identical (doc_id, term, tf) multiset — no dup ingestion, no loss
    key = lambda df: df.groupBy("doc_id", "term").agg(
        F.sum("tf").alias("tf")
    ).orderBy("doc_id", "term")
    assert [r.asDict() for r in key(streamed).collect()] == [
        r.asDict() for r in key(batch).collect()
    ]

    # third restart with nothing new: no rows added (checkpoint resume)
    q = stream_tokenize(spark, pages_in, tokens_out, ckpt, n_buckets=4)
    q.awaitTermination()
    assert spark.read.parquet(tokens_out).count() == batch.count()


def test_stream_windowed_agg_matches_batch(spark):
    from searchengine_spark.streaming.windows import windowed_event_counts

    events_dir = os.path.join(STREAMDIR, "events")
    ckpt = os.path.join(STREAMDIR, "ckpt_ev")
    shutil.rmtree(events_dir, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    os.makedirs(events_dir, exist_ok=True)
    src = "/root/testdata/sf0.001/events.parquet"
    shutil.copy(src, os.path.join(events_dir, "events.parquet"))

    q = windowed_event_counts(spark, events_dir, ckpt, out_table="swc_test")
    q.awaitTermination()
    got = {
        (r["hour"], r["event_type"]): (r["n"], r["sum_value"])
        for r in spark.sql("SELECT * FROM swc_test").collect()
    }
    batch = (
        spark.read.parquet(src)
        .groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_value"),
        )
    )
    want = {
        (r["hour"], r["event_type"]): (r["n"], r["sum_value"])
        for r in batch.collect()
    }
    assert got == want
