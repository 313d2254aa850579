"""Iceberg catalog path — exercised only when the Iceberg Spark
runtime jar is on the classpath (this sandbox ships none, SURVEY §7.0;
on a cluster these run for real). The import/config surface is tested
unconditionally so a typo can't hide behind the skip."""

import os
import shutil

import pytest

from searchengine_spark import iceberg

ICE_DIR = "/tmp/se_spark_fixtures/iceberg_wh"


def test_conf_shape_is_importable_without_jars():
    conf = iceberg.iceberg_conf("/tmp/wh")
    assert conf["spark.sql.catalog.se"] == "org.apache.iceberg.spark.SparkCatalog"
    assert conf["spark.sql.catalog.se.warehouse"] == "/tmp/wh"
    assert iceberg.ident("tokens") == "se.search_index.tokens"


@pytest.fixture(scope="module")
def ice_spark(spark):
    """A session WITH the catalog configured; skip everything if the
    runtime jar is absent (config keys alone are inert).

    Built as ``newSession()`` over the shared suite session, NEVER a
    fresh ``get_spark`` + ``stop()``: ``getOrCreate`` hands back the
    process-shared session, so stopping "our" session here stops the
    one SparkContext of the whole pytest process and every later Spark
    test dies with a closed-context py4j error (this happened —
    139 cascade failures). The probe runs on the shared session (same
    JVM classpath); the catalog keys are runtime-settable per session,
    so no dedicated context is needed.
    """
    if not iceberg.iceberg_available(spark):
        pytest.skip("Iceberg Spark runtime jar not on classpath")
    shutil.rmtree(ICE_DIR, ignore_errors=True)
    s = spark.newSession()
    for k, v in iceberg.iceberg_conf(ICE_DIR).items():
        if k != "spark.sql.extensions":  # static conf; writeTo needs none
            s.conf.set(k, v)
    yield s


def test_availability_probe_is_honest(spark):
    # the shared plain session has no Iceberg conf/jars in this sandbox;
    # the probe must say so rather than raise
    assert iceberg.iceberg_available(spark) in (True, False)


def test_pages_roundtrip(ice_spark, tiny_pages_path):
    iceberg.ensure_namespace(ice_spark)
    pages = ice_spark.read.parquet(tiny_pages_path)
    t = iceberg.ident("pages")
    iceberg.create_pages_table(ice_spark, pages, t)
    got = iceberg.read_pages(ice_spark, t)
    assert got.count() == pages.count()
    assert set(got.columns) == set(pages.columns)


def test_tokens_append_and_bucket_prune(ice_spark, tiny_pages_path):
    from pyspark.sql import functions as F

    from searchengine_spark.indexer import (
        _bucket,
        docs_with_scoring_text,
        tokenize,
    )

    iceberg.ensure_namespace(ice_spark)
    pages = ice_spark.read.parquet(tiny_pages_path)
    toks = (
        tokenize(docs_with_scoring_text(pages))
        .withColumn("bucket", _bucket("term", 4))
        .withColumn("chunk", F.lit("0"))
    )
    t = iceberg.ident("tokens")
    iceberg.append_tokens(toks, t)
    n1 = iceberg.read_tokens(ice_spark, t).count()
    iceberg.append_tokens(toks.withColumn("chunk", F.lit("1")), t)
    assert iceberg.read_tokens(ice_spark, t).count() == 2 * n1
    only0 = iceberg.read_tokens(ice_spark, t, buckets=[0])
    assert only0.select("bucket").distinct().collect() == [
        only0.sparkSession.createDataFrame([(0,)], "bucket int").first()
    ] or {r["bucket"] for r in only0.select("bucket").distinct().collect()} == {0}


def test_segment_partition_replace_is_atomic_swap(ice_spark, tiny_pages_path):
    """overwritePartitions must replace ONLY the written (group, bucket)
    partitions — the Iceberg twin of merge.py's per-bucket swap."""
    from pyspark.sql import functions as F

    iceberg.ensure_namespace(ice_spark)
    t = iceberg.ident("postings_test")
    base = ice_spark.createDataFrame(
        [(g, b, f"seg-{g}-{b}") for g in (0, 1) for b in (0, 1)],
        "group int, bucket int, payload string",
    )
    iceberg.replace_segment_partitions(base, t)
    patch = ice_spark.createDataFrame(
        [(0, 1, "seg-0-1-MERGED")], "group int, bucket int, payload string"
    )
    iceberg.replace_segment_partitions(patch, t)
    rows = {
        (r["group"], r["bucket"]): r["payload"]
        for r in ice_spark.read.table(t).collect()
    }
    assert rows[(0, 1)] == "seg-0-1-MERGED"
    assert rows[(1, 1)] == "seg-1-1" and len(rows) == 4
