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


# --------------------------------------------------------------------------
# q107: crawl snapshot diff — the re-crawl ops report: given snapshot A
# (this corpus) and snapshot B (the next crawl of the same URL space),
# classify every doc_id as added / removed / changed / unchanged by
# CONTENT HASH and roll up counts per source. This is the number a
# crawl pipeline tracks per snapshot to size its incremental-merge
# delta (see merge.py) and to spot a feed that went dead (all-removed)
# or a CMS that stamps every page (all-changed).
#
# Scale shape: both sides immediately project to (doc_id, source,
# md5(text)) — the full-outer join shuffles 16-byte hashes keyed by
# doc_id, never text; the rollup is a |sources|×4 hash agg. Snapshot B
# is synthesized deterministically from the same table (the driver has
# one snapshot): docs with doc_id % {REMOVED_MOD} == 0 drop out, docs
# with doc_id % {CHANGED_MOD} == 0 re-crawl with edited content, and
# every doc_id % {ADDED_MOD} == 0 doc also yields a brand-new page at
# doc_id + ADDED_OFFSET. On a real pipeline A and B are two crawl
# partitions of the pages table.
# --------------------------------------------------------------------------

DIFF_REMOVED_MOD = 13
DIFF_CHANGED_MOD = 7
DIFF_ADDED_MOD = 17
DIFF_ADDED_OFFSET = 1_000_000_000


def q107_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _tables.load(spark, sf_dir, "documents")
    a = docs.select("doc_id", "source", F.md5("text").alias("h"))
    surviving = docs.filter(F.col("doc_id") % DIFF_REMOVED_MOD != 0)
    b_kept = surviving.select(
        "doc_id",
        "source",
        F.md5(
            F.when(
                F.col("doc_id") % DIFF_CHANGED_MOD == 0,
                F.concat(F.col("text"), F.lit(" rev2")),
            ).otherwise(F.col("text"))
        ).alias("h"),
    )
    b_added = docs.filter(F.col("doc_id") % DIFF_ADDED_MOD == 0).select(
        (F.col("doc_id") + DIFF_ADDED_OFFSET).alias("doc_id"),
        "source",
        F.md5(F.concat(F.lit("new page "), F.col("text"))).alias("h"),
    )
    b = b_kept.unionAll(b_added)
    joined = a.alias("a").join(
        b.alias("b"), F.col("a.doc_id") == F.col("b.doc_id"), "full_outer"
    )
    status = (
        F.when(F.col("a.doc_id").isNull(), F.lit("added"))
        .when(F.col("b.doc_id").isNull(), F.lit("removed"))
        .when(F.col("a.h") != F.col("b.h"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        joined.select(
            F.coalesce(F.col("a.source"), F.col("b.source")).alias("source"),
            status.alias("status"),
        )
        .groupBy("source", "status")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .orderBy("source", "status")
    )


# --------------------------------------------------------------------------
# q118: robots-rules gate — reference parity for the crawler's robots
# machinery (``jobs/Crawler.java:332-505``): pick the
# ``user-agent: search-crawler`` section if present, else the
# ``user-agent: *`` section, else no rules; a URL is crawlable iff its
# PATH matches no ``disallow:`` prefix (the reference's ``checkRules``
# never lets ``allow:`` override a disallow match — ``Crawler.java:
# 487-500`` returns true on allow-match AND on no-allow-match, a quirk
# kept deliberately); ``crawl-delay: <secs>`` scales to ms with the
# 1000 ms default (``Crawler.java:422-429``). Robots text is
# synthesized per host from host_id (three shapes: a *-section host, a
# search-crawler-section host whose section must be CUT at the next
# user-agent line, and a no-matching-section host).
#
# Scale shape: map-only — section slicing, rule extraction
# (regexp_extract_all in the Java∩RE2 dialect — the reference's
# lookahead rewritten as a capture group, identical on \n-terminated
# files), prefix test and delay parse are all string expressions in
# the scan stage; the per-host robots table is |hosts| rows and joins
# broadcast on a real crawl.
# --------------------------------------------------------------------------

_ROBOTS_SC = "user-agent: search-crawler\n"
_ROBOTS_ANY = "user-agent: *\n"
_ROBOTS_TXT = {
    0: "user-agent: *\ndisallow: /private\ncrawl-delay: 2.5\n",
    1: (
        "user-agent: googlebot\ndisallow: /\n"
        "user-agent: search-crawler\ndisallow: /tmp\nallow: /tmp/ok\n"
        "crawl-delay: 0.5\n"
        "user-agent: *\ndisallow: /\n"
    ),
    2: "user-agent: googlebot\ndisallow: /\n",
}


def _robots_section(txt: "F.Column") -> "F.Column":
    """The reference's section slicing: substring after the preferred
    user-agent line, cut at the next 'user-agent:'."""

    def cut(after: str) -> F.Column:
        start = F.locate(after, txt) + len(after)
        rest = F.substring(txt, start, 100000)
        nxt = F.locate("user-agent:", rest)
        return F.when(nxt > 0, F.substring(rest, 1, nxt - 1)).otherwise(rest)

    return (
        F.when(F.locate(_ROBOTS_SC, txt) > 0, cut(_ROBOTS_SC))
        .when(F.locate(_ROBOTS_ANY, txt) > 0, cut(_ROBOTS_ANY))
        .otherwise(F.lit(""))
    )


def q118_robots_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _tables.load(spark, sf_dir, "documents")
    host_id = F.abs(F.col("doc_id")) % FRONTIER_NUM_HOSTS
    txt = (
        F.when(host_id % 3 == 0, F.lit(_ROBOTS_TXT[0]))
        .when(host_id % 3 == 1, F.lit(_ROBOTS_TXT[1]))
        .otherwise(F.lit(_ROBOTS_TXT[2]))
    )
    path = F.concat(
        F.element_at(
            F.array(
                F.lit("/doc/"),
                F.lit("/private/"),
                F.lit("/tmp/"),
                F.lit("/tmp/ok/"),
            ),
            (F.col("doc_id") % 4 + 1).cast("int"),
        ),
        F.col("doc_id").cast("string"),
    )
    sec = _robots_section(F.lower(txt))
    dis = F.regexp_extract_all(sec, F.lit(r"disallow: ([^\n]*)"), 1)
    delay_s = F.regexp_extract(sec, r"crawl-delay: ([0-9.]*)", 1)
    blocked = F.exists(dis, lambda d: F.col("p").startswith(d))
    # explicit floor on BOTH engines: Spark's double->int cast truncates
    # while DuckDB's ::INT rounds half-to-even, so a bare cast diverges
    # for non-exact products (crawl-delay 2.3 -> 2299 vs 2300). floor()
    # of the same IEEE product is engine-independent.
    delay_ms = F.when(
        F.coalesce(delay_s, F.lit("")) != "",
        F.floor(delay_s.cast("double") * 1000).cast("int"),
    ).otherwise(F.lit(1000))
    return (
        docs.select(
            "doc_id",
            host_id.alias("host_id"),
            path.alias("p"),
            sec.alias("sec"),
            delay_ms.alias("crawl_delay_ms"),
        )
        .select(
            "doc_id",
            "host_id",
            F.col("p").alias("path"),
            (~blocked).cast("int").alias("crawl_allowed"),
            "crawl_delay_ms",
        )
        .orderBy("doc_id")
    )


QUERIES = {
    "q79_crawl_frontier": q79_crawl_frontier,
    "q107_snapshot_diff": q107_snapshot_diff,
    "q118_robots_gate": q118_robots_gate,
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
    # q107: snapshot B synthesized with the identical mod rules; diff =
    # full-outer join of (doc_id, md5) projections, |sources|×4 rollup.
    "q107_snapshot_diff": f"""
WITH a AS (
  SELECT doc_id, source, md5(text) AS h FROM documents
),
b AS (
  SELECT doc_id, source,
         md5(CASE WHEN doc_id % {DIFF_CHANGED_MOD} = 0
                  THEN text || ' rev2' ELSE text END) AS h
  FROM documents WHERE doc_id % {DIFF_REMOVED_MOD} <> 0
  UNION ALL
  SELECT doc_id + {DIFF_ADDED_OFFSET} AS doc_id, source,
         md5('new page ' || text) AS h
  FROM documents WHERE doc_id % {DIFF_ADDED_MOD} = 0
)
SELECT coalesce(a.source, b.source) AS source,
       CASE WHEN a.doc_id IS NULL THEN 'added'
            WHEN b.doc_id IS NULL THEN 'removed'
            WHEN a.h <> b.h THEN 'changed'
            ELSE 'unchanged' END AS status,
       count(*)::BIGINT AS n_docs
FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
GROUP BY 1, 2 ORDER BY source, status
""",
}


def _q118_oracle() -> str:
    """q118: the reference's section slicing spelled with strpos/substr;
    rules in the Java∩RE2 regex dialect; the allow-never-overrides
    quirk reproduced by testing disallow only."""

    def cut(marker: str) -> str:
        after = f"substr(txt, strpos(txt, '{marker}') + {len(marker)})"
        return (
            f"CASE WHEN strpos({after}, 'user-agent:') > 0 "
            f"THEN substr({after}, 1, strpos({after}, 'user-agent:') - 1) "
            f"ELSE {after} END"
        )

    return f"""
WITH d AS (
  SELECT doc_id, abs(doc_id) % {FRONTIER_NUM_HOSTS} AS host_id
  FROM documents
),
r AS (
  SELECT doc_id, host_id,
         lower(CASE WHEN host_id % 3 = 0 THEN '{_ROBOTS_TXT[0]}'
                    WHEN host_id % 3 = 1 THEN '{_ROBOTS_TXT[1]}'
                    ELSE '{_ROBOTS_TXT[2]}' END) AS txt,
         ['/doc/', '/private/', '/tmp/', '/tmp/ok/'][(doc_id % 4 + 1)::INT]
           || doc_id::VARCHAR AS path
  FROM d
),
secs AS (
  SELECT doc_id, host_id, path,
         CASE WHEN strpos(txt, '{_ROBOTS_SC}') > 0 THEN {cut(_ROBOTS_SC)}
              WHEN strpos(txt, '{_ROBOTS_ANY}') > 0 THEN {cut(_ROBOTS_ANY)}
              ELSE '' END AS sec
  FROM r
),
rules AS (
  SELECT doc_id, host_id, path,
         regexp_extract_all(sec, 'disallow: ([^\n]*)', 1) AS dis,
         regexp_extract(sec, 'crawl-delay: ([0-9.]*)', 1) AS ds
  FROM secs
)
SELECT doc_id, host_id, path,
       CASE WHEN len(list_filter(dis, x -> starts_with(path, x))) > 0
            THEN 0 ELSE 1 END::INT AS crawl_allowed,
       CASE WHEN coalesce(ds, '') <> ''
            THEN floor(CAST(ds AS DOUBLE) * 1000)::INT
            ELSE 1000 END::INT AS crawl_delay_ms
FROM rules ORDER BY doc_id
"""


ORACLE["q118_robots_gate"] = _q118_oracle()
