"""Crawl-frontier scheduling (q79): the politeness scheduler the
reference's crawler implements imperatively, re-expressed as one window
function plus a global top-k.

Reference parity: the reference crawler caps each crawl iteration at
20,000 frontier URLs (``jobs/Crawler.java:53-56,136-141``) and enforces
a default 1000 ms per-host crawl delay (``jobs/Crawler.java:421-429``)
by checking last-access times in a KVS table. Here the same policy is
declarative: rank URLs within each host, schedule the k-th URL of a
host at ``(k-1) * delay_ms``, and take the earliest ``cap`` entries as
the iteration's fetch list.

Scale notes: the window partitions by host — web-scale frontiers have
billions of hosts, so partitions are small and the shuffle is uniform
(a pathological single-host frontier is exactly the case the delay
policy serializes anyway). The global cap is a TakeOrderedAndProject
(ordered by the unique (sched_ms, host_id) pair), never a full sort.
URLs are synthesized deterministically from doc_id because the driver
tables carry no URL column; on a real crawl the frontier table provides
them.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import _tables

FRONTIER_NUM_HOSTS = 13
FRONTIER_DELAY_MS = 1000  # Crawler.java:421-429 default per-host delay
FRONTIER_CAP = 120  # per-iteration cap (ref: 20,000 — Crawler.java:53)


def q79_crawl_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _tables.load(spark, sf_dir, "documents")
    host_id = F.abs(F.col("doc_id")) % FRONTIER_NUM_HOSTS
    url = F.concat(
        F.lit("https://h"),
        host_id.cast("string"),
        F.lit(".example.com/doc/"),
        F.col("doc_id").cast("string"),
    )
    base = docs.select(
        host_id.alias("host_id"), url.alias("url"), "doc_id", "n_chars"
    )
    # bigger pages first within a host (deterministic priority),
    # doc_id tie-break makes the rank total
    w = Window.partitionBy("host_id").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    sched = base.withColumn("host_rank", F.row_number().over(w)).withColumn(
        "sched_ms",
        (F.col("host_rank") - F.lit(1)).cast("long") * FRONTIER_DELAY_MS,
    )
    # (sched_ms, host_id) is unique -> the cap is deterministic
    return (
        sched.orderBy("sched_ms", "host_id")
        .limit(FRONTIER_CAP)
        .select("host_id", "url", "host_rank", "sched_ms")
        .orderBy("sched_ms", "host_id")
    )


QUERIES = {
    "q79_crawl_frontier": q79_crawl_frontier,
}

ORACLE = {
    "q79_crawl_frontier": f"""
WITH base AS (
  SELECT abs(doc_id) % {FRONTIER_NUM_HOSTS} AS host_id,
         'https://h' || (abs(doc_id) % {FRONTIER_NUM_HOSTS})::VARCHAR
           || '.example.com/doc/' || doc_id::VARCHAR AS url,
         doc_id, n_chars
  FROM documents
),
sched AS (
  SELECT host_id, url,
         row_number() OVER (PARTITION BY host_id
                            ORDER BY n_chars DESC, doc_id ASC) AS host_rank
  FROM base
)
SELECT host_id, url, host_rank,
       (host_rank - 1) * {FRONTIER_DELAY_MS} AS sched_ms
FROM sched
ORDER BY (host_rank - 1) * {FRONTIER_DELAY_MS}, host_id
LIMIT {FRONTIER_CAP}
""",
}
