"""Explicit schemas for the driver testdata tables (TESTDATA.md).

``spark.read.parquet`` without a schema runs a footer-sampling job per
call before the real query can even plan — at plan-construction time
the round-3 retrievers were paying 1–4 such jobs each, and at 100 TB a
schema-inference pass over the file listing is a real scheduling cost.
Production tables have known schemas; declaring them makes every
pipeline plan job-free until the caller executes it.

The declared types mirror the driver-generated parquet exactly (a
mismatch errors loudly at read time rather than silently casting).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

SCHEMAS = {
    "region": "r_regionkey int, r_name string",
    "nation": "n_nationkey int, n_name string, n_regionkey int",
    "customer": (
        "c_custkey bigint, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string"
    ),
    "supplier": (
        "s_suppkey bigint, s_name string, s_nationkey int, s_acctbal double"
    ),
    "part": (
        "p_partkey bigint, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double"
    ),
    "orders": (
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
    ),
    "lineitem": (
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp"
    ),
    "events": (
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string"
    ),
    "documents": (
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint"
    ),
    "embeddings": "vec_id bigint, embedding array<float>, label int",
}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read a testdata table with its declared schema (no inference job)."""
    return spark.read.schema(SCHEMAS[name]).parquet(
        os.path.join(sf_dir, f"{name}.parquet")
    )
