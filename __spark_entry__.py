"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship BM25 top-k over the sf0.001
``documents`` table. ``queries()`` exposes every implemented operator
from SURVEY.md §2 plus the training-data-pipeline ops (dedup,
similarity search, text analysis, multimodal); ``oracle_sql()`` gives
the DuckDB twin for each SQL-expressible entry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from searchengine_spark.pipelines import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: disjunctive BM25 top-k
    with total tie-break, all JVM-side DataFrame ops."""
    from searchengine_spark.pipelines.fulltext import q13_bm25_topk

    return q13_bm25_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
