"""File-format connectors beyond Parquet (SURVEY §2.1 "file formats").

The reference persists everything through its KVS table layer
(``kvs/Table.java``); the rebuild's primary format is Parquet-in-
directories (``catalog.py``), and these helpers cover the interchange
formats a corpus actually arrives in — JSON-lines (API dumps, WET-style
sidecars) and CSV (metadata manifests).

Scale rules baked in:
* ALWAYS an explicit schema — ``inferSchema`` forces a full extra pass
  over 100 TB before the real read;
* JSONL is a splittable line format: one file still parallelizes by
  ``maxPartitionBytes`` slices, so no repartition dance is needed. CSV
  is splittable ONLY when no field contains a quoted newline — readers
  default to the splittable single-line mode and must opt in to
  ``multiline=True`` (one task per file!) when the data embeds
  newlines;
* timestamps round-trip as ISO-8601 strings with explicit
  ``timestampFormat`` — never locale-dependent inference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# microsecond fidelity: Spark's DEFAULT json/csv timestamp format writes
# milliseconds only, silently rounding timestamp[us] values. TIMESTAMP
# (ltz) and TIMESTAMP_NTZ take SEPARATE options.
TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
TS_NTZ_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"

_TS_OPTS = {"timestampFormat": TS_FMT, "timestampNTZFormat": TS_NTZ_FMT}


def write_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").options(**_TS_OPTS).json(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    return (
        spark.read.schema(schema)
        .options(**_TS_OPTS)
        .option("mode", "FAILFAST")  # silent nulling hides corrupt shards
        .json(path)
    )


def write_csv(df: DataFrame, path: str) -> None:
    (
        df.write.mode("overwrite")
        .option("header", "true")
        .options(**_TS_OPTS)
        # quote/escape so free text with commas/newlines round-trips
        .option("quote", '"')
        .option("escape", '"')
        .csv(path)
    )


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType,
    multiline: bool = False,
) -> DataFrame:
    """``multiline=True`` is required when fields embed quoted newlines
    but makes every file single-task (non-splittable) — keep the default
    for large manifests and strip newlines at write time instead."""
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .options(**_TS_OPTS)
        .option("quote", '"')
        .option("escape", '"')
        .option("multiLine", "true" if multiline else "false")
        .option("mode", "FAILFAST")
        .csv(path)
    )


def write_orc(df: DataFrame, path: str) -> None:
    """ORC keeps types natively (timestamps binary, no string format
    round-trip) — the columnar interchange twin of the parquet primary."""
    df.write.mode("overwrite").orc(path)


def read_orc(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    # explicit schema anyway: a schema-drifted shard must fail the read,
    # not silently widen the frame
    return spark.read.schema(schema).orc(path)
