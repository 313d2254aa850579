"""Search serving layer — the rebuild of the reference frontend's result
rendering (``frontend/Mainpage.java``): blended top-k + title + snippet
+ offset/limit pagination.

Reference parity:
* title     = substring between ``<title>`` tags (``Mainpage.java:324-338``)
* snippet   = first <= 50 words of the concatenated ``<p>`` blocks
              (``Mainpage.java:340-368``)
* paginate  = sort desc -> skip(offset).limit(limit), defaults offset=0,
              limit=15 (``Mainpage.java:48-51,121-132``)

Physical shape: the ranked top-k (a handful of rows) joins the pages
corpus on url — a broadcast of the *results*, so the corpus-side lookup
is a semi-join pruned scan, never a full-corpus shuffle. Title/snippet
extraction runs as one Arrow-vectorized pandas UDF over the joined rows
only (k rows, not the corpus).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .query import phrase_match, score_exhaustive
from .textprep import _RE_P, _RE_TITLE, java_tokens

SNIPPET_WORDS = 50
DEFAULT_LIMIT = 15


def extract_title(html: str) -> str:
    m = _RE_TITLE.search(html or "")
    return m.group(1) if m else ""


def extract_snippet(html: str, max_words: int = SNIPPET_WORDS) -> str:
    words: list[str] = []
    for m in _RE_P.finditer(html or ""):
        words.extend(java_tokens(m.group(1), max_len=1 << 30))
        if len(words) >= max_words:
            break
    return " ".join(words[:max_words])


@F.pandas_udf(T.StringType())
def title_udf(html: pd.Series) -> pd.Series:
    return html.map(
        lambda h: extract_title(
            bytes(h).decode("utf-8", "replace") if h is not None else ""
        )
    )


@F.pandas_udf(T.StringType())
def snippet_udf(html: pd.Series) -> pd.Series:
    return html.map(
        lambda h: extract_snippet(
            bytes(h).decode("utf-8", "replace") if h is not None else ""
        )
    )


def split_exclusions(query: str) -> tuple[str, str]:
    """Split web-search exclusion syntax: whitespace tokens starting
    with ``-`` (and longer than the bare dash) become the exclusion
    string; the rest recombine as the positive query. Runs BEFORE
    tokenization because ``java_tokens`` strips punctuation."""
    pos: list[str] = []
    neg: list[str] = []
    for tok in (query or "").split():
        if tok.startswith("-") and len(tok) > 1:
            neg.append(tok[1:])
        else:
            pos.append(tok)
    return " ".join(pos), " ".join(neg)


def search(
    spark: SparkSession,
    root: str,
    pages_path: str,
    query: str,
    mode: str = "OR",
    k: int = DEFAULT_LIMIT,
    offset: int = 0,
) -> DataFrame:
    """(rank, url, title, snippet, bm25, blended) for one query —
    the full reference serving pipeline, paginated.

    ``mode``: ``OR`` (disjunctive blend, the reference default), ``AND``
    (conjunctive), or ``PHRASE`` — candidates restricted to docs where
    the stemmed terms occur at consecutive positions (positional index),
    scored with the same blended formula so ranks stay comparable.

    ``-term`` tokens in the query string are EXCLUSIONS (NOT): docs
    containing any of them are dropped before the top-k, so k fills
    from survivors. Exclusions compose with every mode (in PHRASE they
    apply on top of the positional restriction)."""
    mode = str(mode).upper()
    query, exclude = split_exclusions(query)
    restrict = None
    if mode == "PHRASE":
        # keep token order and duplicates — parse_query dedups, which is
        # right for bag-of-words scoring but wrong for a phrase
        toks = java_tokens(query.lower())
        restrict = phrase_match(spark, root, toks).select(
            F.lit(0).alias("query_id"), "doc_id"
        )
        # a phrase match contains every term, so AND == OR over the
        # restricted candidates; AND is declared for plan clarity
        mode = "AND"
    qs = [{"query_id": 0, "query": query, "mode": mode, "k": offset + k,
           "exclude": exclude}]
    topk = score_exhaustive(spark, root, qs, restrict=restrict).filter(
        F.col("rank") > offset
    )

    from . import catalog

    docstats = spark.read.parquet(catalog.path(root, catalog.DOCSTATS)).select(
        "doc_id", "url"
    )
    pages = spark.read.parquet(pages_path).select("url", "html")
    # broadcast the k ranked rows into both lookups — the corpus and
    # docstats sides stream, nothing big ever shuffles
    ranked = docstats.join(F.broadcast(topk), "doc_id")
    return (
        pages.join(F.broadcast(ranked), "url")
        .select(
            "rank",
            "url",
            title_udf("html").alias("title"),
            snippet_udf("html").alias("snippet"),
            "bm25",
            "blended",
        )
        .orderBy("rank")
    )
