"""Driver-contract query pipelines: each submodule exposes QUERIES
(name -> callable(spark, sf_dir) -> DataFrame) and ORACLE (name ->
DuckDB SQL). ``all_queries()`` / ``all_oracles()`` merge them."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import (
    curation,
    dedup,
    engine_ops,
    fulltext,
    graph,
    multimodal,
    relational,
    similarity,
    textstats,
)

_MODULES = [
    relational,
    fulltext,
    dedup,
    similarity,
    textstats,
    curation,
    multimodal,
    graph,
    engine_ops,
]


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        out.update(m.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLE)
    return out
