"""SparkSession construction with the engine's standard configuration.

One place to encode the execution-model decisions that matter at 100 TB:
Arrow-batched Python boundary, AQE (skew joins + partition coalescing),
and a shuffle-partition default sized for the local harness (the real
cluster overrides via spark-submit --conf).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "searchengine-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[*]")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Arrow is mandatory: every Python UDF in this engine is
        # pandas/Arrow-vectorized (input_hint: no per-row Python).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # AQE: runtime partition coalescing + skew-join splitting. Head
        # terms are additionally salted explicitly at index build.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(
                shuffle_partitions
                or int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
            ),
        )
        # Smaller input splits: the corpus parquet is dense (binary html),
        # and the tokenize mapInPandas must fan out to every core even
        # when the file count is small. Real clusters re-tune per job.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", str(4 * 1024 * 1024)),
        )
        .config("spark.sql.session.timeZone", "UTC")
        # shuffle/scratch location; benchmarks point this at tmpfs so
        # virtio-disk throttling can't distort scaling measurements
        .config(
            "spark.local.dir",
            os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/tmp"),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # no \r progress bars: they interleave with harness stdout and
        # garble the one-line JSON / gate reports this repo's tools emit
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
