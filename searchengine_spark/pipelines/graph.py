"""Iterative PageRank as a DataFrame join-aggregate, oracle-checked.

The engine's real PageRank (``searchengine_spark/pagerank.py``) runs the
reference math (0.85 transfer, +0.15 base, L∞ stop —
jobs/PageRank.java:75,107,120-142) over the crawled link graph and is
validated against the committed oracle goldens. This entry demonstrates
the same iteration shape over a graph derived from the driver tables —
the bipartite part↔supplier graph of ``lineitem`` — with a DuckDB
oracle (iterations unrolled as CTEs).

Determinism across parallelism: per-edge contributions are quantized to
DECIMAL(28,12) *before* the per-node sum, so partial/final aggregation
order cannot change a single bit (float sums are order-sensitive; this
is the same order-insensitivity rule SURVEY §7.3 imposes on the index).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_ITERS = 3
DAMPING = 0.85
BASE = 0.15
SUPP_OFFSET = 1_000_000  # supplier node ids, disjoint from part ids
QDEC = "decimal(28,12)"


def edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric bipartite edges part <-> supplier from lineitem."""
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).select(
        F.col("l_partkey").cast("long").alias("part"),
        (F.col("l_suppkey").cast("long") + SUPP_OFFSET).alias("supp"),
    ).distinct()
    fwd = li.select(F.col("part").alias("src"), F.col("supp").alias("dst"))
    rev = li.select(F.col("supp").alias("src"), F.col("part").alias("dst"))
    return fwd.unionAll(rev)


def q27_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = edges(spark, sf_dir).cache()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    ranks = nodes.withColumn("rank", F.lit(1.0))
    for _ in range(N_ITERS):
        contrib = (
            e.join(ranks, e.src == ranks.node)
            .join(outdeg, "src")
            .select(
                "dst",
                F.round(
                    F.lit(DAMPING) * F.col("rank") / F.col("outdeg"), 12
                ).cast(QDEC).alias("c"),
            )
        )
        incoming = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        # the rank is kept in exact decimal and ALSO as the double the
        # next iteration consumes; the final 9-dp rounding happens on
        # the DECIMAL (HALF_UP in both engines) — ranks are exact
        # 12-decimal values, so rounding the nearest-DOUBLE instead
        # lands on .5 ties that Spark and DuckDB break differently
        # sum(DECIMAL(28,12)) is DECIMAL(38,12); cast back to (28,12)
        # (values are tiny) so the + stays within precision 38 on BOTH
        # engines — Spark would otherwise silently reduce the scale
        rank_dec = F.lit(BASE).cast(QDEC) + F.coalesce(
            F.col("s"), F.lit(0).cast(QDEC)
        ).cast(QDEC)
        ranks = nodes.join(
            incoming, nodes.node == incoming.dst, "left"
        ).select(
            "node",
            rank_dec.cast("double").alias("rank"),
            rank_dec.alias("rank_dec"),
        )
    return ranks.select(
        "node", F.round("rank_dec", 9).cast("double").alias("rank")
    ).orderBy("node")


QUERIES = {"q27_pagerank": q27_pagerank}


def _iteration_sql(prev: str, cur: str) -> str:
    return f"""
{cur} AS (
  SELECT n.node,
         CAST(0.15::DECIMAL(28,12)
              + coalesce(s.s, 0::DECIMAL(28,12))::DECIMAL(28,12)
              AS DOUBLE) AS rank,
         0.15::DECIMAL(28,12)
           + coalesce(s.s, 0::DECIMAL(28,12))::DECIMAL(28,12) AS rank_dec
  FROM nodes n LEFT JOIN (
    SELECT e.dst, sum(CAST(round(0.85 * r.rank / o.outdeg, 12) AS DECIMAL(28,12))) AS s
    FROM e JOIN {prev} r ON e.src = r.node
           JOIN outdeg o ON e.src = o.src
    GROUP BY e.dst
  ) s ON n.node = s.dst
)"""


_ITER_CTES = ",".join(_iteration_sql(f"r{i}", f"r{i + 1}") for i in range(N_ITERS))

ORACLE = {
    "q27_pagerank": f"""
WITH li AS (
  SELECT DISTINCT l_partkey::BIGINT AS part,
                  l_suppkey::BIGINT + {SUPP_OFFSET} AS supp
  FROM lineitem
),
e AS (
  SELECT part AS src, supp AS dst FROM li
  UNION ALL
  SELECT supp AS src, part AS dst FROM li
),
nodes AS (SELECT DISTINCT node FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
outdeg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
r0 AS (SELECT node, 1.0::DOUBLE AS rank FROM nodes),
{_ITER_CTES}
SELECT node, CAST(round(rank_dec, 9) AS DOUBLE) AS rank
FROM r{N_ITERS} ORDER BY node
""",
}
