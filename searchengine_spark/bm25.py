"""BM25 scoring math — the single definition shared by the Spark engine,
the pure-pandas oracle, and the DuckDB oracle SQL.

The reference computes augmented TF-IDF (``jobs/TF_IDF.java:59,81-86,
119-125``), not BM25; the north_rule upgrades the relevance component to
standard BM25. We use the Robertson/Lucene formulation with a
non-negative idf:

    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
    tf_norm(t,d)= tf / (tf + k1 * (1 - b + b * dl/avgdl))
    bm25(t,d)   = idf(t) * (k1 + 1) * tf_norm(t,d)

Constants k1=1.2, b=0.75. All arithmetic in float64; block-max metadata
stores tf_norm (see compress.py) so the exact per-block score bound is
idf * (k1+1) * max_tf_norm.

The reference's legacy formulas are also provided for the TF-IDF parity
queries: aug_tf = 0.4 + 0.6 * tf / max_tf  (``TF_IDF.java:59``),
idf_ref = ln(N / df)  (``TF_IDF.java:124``).

Blend (reference weights, ``frontend/Mainpage.java:88-89,105``):
    blended = 0.3 * pagerank + 0.5 * title_hit + 0.2 * bm25
where title_hit = 1.0 iff any query term occurs in the doc's title index
(the reference's pt-title candidates), else 0.0.
"""

from __future__ import annotations

import math

K1 = 1.2
B = 0.75
W_PAGERANK = 0.3
W_TITLE = 0.5
W_RELEVANCE = 0.2


def idf(n_docs: int, df: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def tf_norm(tf: float, doc_len: float, avgdl: float) -> float:
    return tf / (tf + K1 * (1.0 - B + B * doc_len / avgdl))


def bm25(tf: float, doc_len: float, avgdl: float, n_docs: int, df: int) -> float:
    return idf(n_docs, df) * (K1 + 1.0) * tf_norm(tf, doc_len, avgdl)


def aug_tf_ref(tf: float, max_tf: float) -> float:
    """Reference augmented TF (a=0.4): TF_IDF.java:59,85."""
    return 0.4 + 0.6 * tf / max_tf


def idf_ref(n_docs: int, df: int) -> float:
    """Reference IDF: ln(N/df), TF_IDF.java:124."""
    return math.log(n_docs / float(df))


def blend(pagerank: float, title_hit: float, bm25_score: float) -> float:
    return W_PAGERANK * pagerank + W_TITLE * title_hit + W_RELEVANCE * bm25_score
