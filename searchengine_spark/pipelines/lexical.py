"""Lexical serving operators over the ``documents`` vocabulary:
prefix autocomplete (q77) and spell correction (q78).

Reference parity: the reference serves raw keyword queries with no
lexical assistance (``webserver/Mainpage.java`` passes the query string
straight to the ranker), so both operators are additions a production
search frontend needs on top of the reference's surface — they run over
the same term/cf statistics the indexer already computes
(jobs/Indexer.java:22-66 wordcount shape).

Scale notes:
* q77 is one token-count aggregation plus a per-prefix top-k window —
  the window partitions by prefix (bounded cardinality), so no global
  sort; at 10^12 docs the cf table is vocabulary-sized, many orders of
  magnitude smaller than the corpus.
* q78 is the SymSpell structure: candidate generation via a DELETE-1
  NEIGHBORHOOD equi-join instead of an all-pairs edit-distance scan.
  Two strings are within Levenshtein distance 1 only if their delete-1
  key sets intersect (the converse has false positives — e.g. "ab" vs
  "ba" share keys at distance 2 — so candidates are verified with an
  exact ``levenshtein() <= 1`` filter after the join). The vocab side
  explodes to O(len) keys per term (linear in vocabulary bytes); the
  query side is broadcast. The DuckDB oracle is the EXHAUSTIVE
  query x vocab edit-distance scan, so the contract gate itself proves
  the banded path lossless, the same oracle-twin structure as
  q17/q32/q33.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import _tables

AUTOCOMPLETE_PREFIX_LEN = 1
AUTOCOMPLETE_K = 3

SPELL_NUM_QUERIES = 20  # most-frequent tokens misspelled into the query set
SPELL_MIN_LEN = 4  # only tokens long enough to survive a char drop


def load_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _tables.load(spark, sf_dir, "documents")


def _term_cf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(term, cf) collection-frequency table — the Indexer wordcount."""
    return (
        load_docs(spark, sf_dir)
        .select(F.explode(F.split(F.col("text"), " ")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count("*").alias("cf"))
    )


def q77_prefix_autocomplete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{AUTOCOMPLETE_K} completions per prefix by collection
    frequency, tie-break completion ASC (total order)."""
    cf = _term_cf(spark, sf_dir)
    pref = cf.withColumn(
        "prefix", F.substring("term", 1, AUTOCOMPLETE_PREFIX_LEN)
    )
    w = Window.partitionBy("prefix").orderBy(F.desc("cf"), F.asc("term"))
    return (
        pref.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= AUTOCOMPLETE_K)
        .select("prefix", "rank", F.col("term").alias("completion"), "cf")
        .orderBy("prefix", "rank")
    )


def del1_keys(col: Column) -> Column:
    """The string itself plus every single-character deletion,
    deduplicated — the SymSpell delete-1 neighborhood."""
    return F.array_union(
        F.array(col),
        F.transform(
            F.sequence(F.lit(1), F.length(col)),
            lambda i: F.concat(
                col.substr(F.lit(1), i - 1),
                col.substr(i + 1, F.length(col)),
            ),
        ),
    )


def q78_spell_correct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correct deterministic misspellings (2nd char dropped from the
    {SPELL_NUM_QUERIES} most frequent len>={SPELL_MIN_LEN} tokens)
    against the vocabulary: candidates via delete-1 key equi-join,
    exact levenshtein<=1 verify, best = max cf then corrected ASC."""
    vocab = _term_cf(spark, sf_dir)
    queries = (
        vocab.filter(F.length("term") >= SPELL_MIN_LEN)
        .orderBy(F.desc("cf"), F.asc("term"))
        .limit(SPELL_NUM_QUERIES)
        .select(
            F.col("term").alias("intended"),
            F.concat(
                F.substring("term", 1, 1), F.expr("substring(term, 3)")
            ).alias("query"),
        )
    )
    qk = queries.select(
        "query", "intended", F.explode(del1_keys(F.col("query"))).alias("k")
    )
    vk = vocab.select(
        "term", "cf", F.explode(del1_keys(F.col("term"))).alias("k")
    )
    cand = (
        vk.join(F.broadcast(qk), "k")
        .select("query", "intended", "term", "cf")
        .distinct()
        .filter(F.levenshtein("query", "term") <= 1)
    )
    w = Window.partitionBy("query", "intended").orderBy(
        F.desc("cf"), F.asc("term")
    )
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "query",
            "intended",
            F.col("term").alias("corrected"),
            F.col("cf").alias("corrected_cf"),
            F.levenshtein("query", F.col("term")).alias("dist"),
        )
        .orderBy("query", "intended")
    )


KWIC_TERMS = ["spark", "merge", "filter"]
KWIC_WINDOW = 3  # tokens of context on each side of the hit


def q80_kwic_snippets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword-in-context snippets: for each query term, the +/-
    {KWIC_WINDOW}-token window around its FIRST occurrence per doc —
    the hit-centered twin of ``serving.extract_snippet`` (which serves
    the leading page words); map-only, one scan for all terms."""
    docs = load_docs(spark, sf_dir)
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    d = docs.select("doc_id", toks.alias("toks")).withColumn(
        "term", F.explode(F.array(*[F.lit(t) for t in KWIC_TERMS]))
    )
    pos = F.array_position("toks", F.col("term"))
    start = F.greatest(F.lit(1).cast("long"), pos - KWIC_WINDOW)
    end = F.least(F.size("toks").cast("long"), pos + KWIC_WINDOW)
    return (
        d.withColumn("pos", pos)
        .filter(F.col("pos") > 0)
        .select(
            "doc_id",
            "term",
            "pos",
            F.array_join(
                F.slice("toks", start, end - start + 1), " "
            ).alias("snippet"),
        )
        .orderBy("doc_id", "term")
    )


QUERIES = {
    "q77_prefix_autocomplete": q77_prefix_autocomplete,
    "q78_spell_correct": q78_spell_correct,
    "q80_kwic_snippets": q80_kwic_snippets,
}

_CF_CTE = """
cf AS (
  SELECT w AS term, count(*) AS cf
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> '' GROUP BY w
)
"""

ORACLE = {
    "q77_prefix_autocomplete": f"""
WITH {_CF_CTE},
r AS (
  SELECT substr(term, 1, {AUTOCOMPLETE_PREFIX_LEN}) AS prefix,
         term AS completion, cf,
         row_number() OVER (
           PARTITION BY substr(term, 1, {AUTOCOMPLETE_PREFIX_LEN})
           ORDER BY cf DESC, term ASC) AS rank
  FROM cf
)
SELECT prefix, rank, completion, cf
FROM r WHERE rank <= {AUTOCOMPLETE_K}
ORDER BY prefix, rank
""",
    # exhaustive edit-distance oracle: every (query, vocab-term) pair is
    # scanned, no banding — proves the Spark delete-1 join lossless.
    "q78_spell_correct": f"""
WITH {_CF_CTE},
q AS (
  SELECT term AS intended,
         substr(term, 1, 1) || substr(term, 3) AS query
  FROM cf WHERE length(term) >= {SPELL_MIN_LEN}
  ORDER BY cf DESC, term ASC LIMIT {SPELL_NUM_QUERIES}
),
cand AS (
  SELECT q.query, q.intended, c.term, c.cf,
         levenshtein(q.query, c.term) AS dist
  FROM q CROSS JOIN cf c
  WHERE levenshtein(q.query, c.term) <= 1
),
best AS (
  SELECT *, row_number() OVER (
           PARTITION BY query, intended
           ORDER BY cf DESC, term ASC) AS rn
  FROM cand
)
SELECT query, intended, term AS corrected, cf AS corrected_cf, dist
FROM best WHERE rn = 1
ORDER BY query, intended
""",
    "q80_kwic_snippets": f"""
WITH d AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
hits AS (
  SELECT doc_id, term, toks,
         list_position(toks, term)::BIGINT AS pos
  FROM d CROSS JOIN (
    SELECT unnest([{", ".join(repr(t) for t in KWIC_TERMS)}]) AS term)
  WHERE list_position(toks, term) > 0
)
SELECT doc_id, term, pos,
       array_to_string(
         list_slice(toks,
                    greatest(1, pos - {KWIC_WINDOW}),
                    least(len(toks), pos + {KWIC_WINDOW})), ' ') AS snippet
FROM hits
ORDER BY doc_id, term
""",
}
