"""Identity functions: reference Hasher replica vs Java goldens, and the
pure-Python xxh64 vs Spark's builtin (oracle/engine doc_id agreement)."""

import base64
import os

from searchengine_spark.ids import reference_hash
from searchengine_spark.xxhash64 import spark_xxhash64_str

GOLD = os.path.join(os.path.dirname(__file__), "..", "golden", "url_hashes.tsv")


def test_reference_hash_matches_java():
    checked = 0
    with open(GOLD) as f:
        for line in f:
            u64, h = line.rstrip("\n").split("\t")
            u = base64.b64decode(u64).decode("utf-8")
            assert reference_hash(u) == h, u
            checked += 1
    assert checked >= 300


def test_xxhash64_matches_spark(spark):
    from pyspark.sql import functions as F

    vals = ["", "a", "ab" * 40, "https://site1.example:443/p/3.html", "中文"]
    rows = (
        spark.createDataFrame([(v,) for v in vals], ["s"])
        .select("s", F.xxhash64("s").alias("h"))
        .collect()
    )
    for r in rows:
        assert spark_xxhash64_str(r["s"]) == r["h"]
