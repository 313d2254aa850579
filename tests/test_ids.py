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


def test_xxhash64_randomized_parity_and_bucket(spark):
    """term_buckets now evaluates pmod(xxhash64(term), n) driver-side
    (no Spark job in the query plan phase): pin the replica bit-exact
    against the JVM over randomized printable + unicode strings in
    every XXH64 length class (empty/tail-only/4-byte/8-byte/32-byte
    stripes), and pin the pmod bucket semantics themselves."""
    import random
    import string

    from pyspark.sql import functions as F

    from searchengine_spark.indexer import term_buckets

    rng = random.Random(20260820)

    def rchar():
        while True:
            c = chr(rng.randint(1, 0x024F if rng.random() < 0.8 else 0x2FFFF))
            if not 0xD800 <= ord(c) <= 0xDFFF:
                return c

    vals = ["", "a", "abc", "abcd", "abcdefg", "abcdefgh", "x" * 31,
            "y" * 32, "z" * 33, "w" * 100]
    vals += ["".join(rng.choices(string.printable, k=rng.randint(0, 64)))
             for _ in range(400)]
    vals += ["".join(rchar() for _ in range(rng.randint(0, 40)))
             for _ in range(100)]
    vals = list(dict.fromkeys(vals))
    rows = (
        spark.createDataFrame([(v,) for v in vals], ["s"])
        .select(
            "s",
            F.xxhash64("s").alias("h"),
            F.pmod(F.xxhash64("s"), F.lit(8)).cast("int").alias("b"),
        )
        .collect()
    )
    tb = term_buckets(spark, vals, 8)
    for r in rows:
        assert spark_xxhash64_str(r["s"]) == r["h"], repr(r["s"])
        assert tb[r["s"]] == r["b"], repr(r["s"])
