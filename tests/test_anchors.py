"""Inbound anchor-text field: extraction rules, aggregation vs the
planted link structure, and blended rank identity engine-vs-oracle with
a nonzero anchor weight (default weight 0 must stay bit-identical to
the reference-parity path)."""

import os
from collections import Counter

import pyarrow.parquet as pq
import pytest

from searchengine_spark import catalog, corpus
from searchengine_spark.anchors import (
    anchor_terms,
    build_anchor_stage,
    extract_anchors,
)
from searchengine_spark.oracle import (
    build_oracle_index,
    oracle_all_queries,
    oracle_pagerank,
)
from searchengine_spark.query import score_exhaustive
from searchengine_spark.xxhash64 import spark_xxhash64_str


def test_extract_anchors_rules():
    html = (
        '<a href="#top">top</a><a href="">empty</a>'
        '<a href="https://site0.example:443/p/1.html">link 1</a>'
        '<a href="2.html">link\n2</a>'
    )
    assert extract_anchors(html) == [
        ("https://site0.example:443/p/1.html", "link 1"),
        ("2.html", "link\n2"),
    ]


def test_anchor_terms_match_planted_edges(spark, tiny_pages_path):
    """The aggregated anchor field equals what the planted edge list
    implies: every edge contributes its anchor text's stemmed token set
    to the TARGET doc (anchor text is 'link <dst page id>'); noise
    anchors (#fragment, mailto:) contribute nothing."""
    pages = pq.read_table(tiny_pages_path).to_pylist()
    n = len(pages)
    in_corpus = {p["url"] for p in pages}
    want: Counter = Counter()
    for src, dst in corpus.expected_edges(n):
        assert dst in in_corpus
        d = spark_xxhash64_str(dst)
        page_id = int(dst.rsplit("/", 1)[1].split(".")[0])
        want[(d, "link")] += 1
        want[(d, str(page_id))] += 1
    got = {
        (r["doc_id"], r["term"]): r["n_anchors"]
        for r in anchor_terms(
            spark, spark.read.parquet(tiny_pages_path)
        ).collect()
    }
    assert got == dict(want)
    assert got, "fixture must plant links"


@pytest.mark.usefixtures("tiny_index")
def test_anchor_blend_rank_identity(spark, tiny_index, tiny_pages_path):
    build_anchor_stage(spark, tiny_pages_path, tiny_index, "anchor-1")
    assert os.path.isdir(catalog.path(tiny_index, catalog.ANCHOR_INDEX))

    pages = pq.read_table(tiny_pages_path).to_pylist()
    idx = build_oracle_index(pages, corpus.expected_edges(len(pages)))
    oracle_pagerank(idx)
    # 'link' appears in every anchor; pair it with corpus vocab so the
    # anchor weight has candidates to reorder
    qs = [
        {"query_id": 0, "query": "link", "mode": "OR", "k": 15},
        {"query_id": 1, "query": f"link {corpus.VOCAB[0]}", "mode": "OR",
         "k": 15},
        {"query_id": 2, "query": corpus.VOCAB[1], "mode": "OR", "k": 15},
        {"query_id": 3, "query": f"link {corpus.VOCAB[2]}", "mode": "AND",
         "k": 15},
    ]

    def as_map(rows):
        return {
            (r["query_id"], r["rank"]): (r["doc_id"], round(r["blended"], 9))
            for r in rows
        }

    # default weight: bit-identical to the reference-parity path even
    # with the anchor index present on disk
    base = as_map(score_exhaustive(spark, tiny_index, qs).collect())
    zero = as_map(
        score_exhaustive(spark, tiny_index, qs, w_anchor=0.0).collect()
    )
    assert base == zero == as_map(oracle_all_queries(idx, qs))

    eng = as_map(
        score_exhaustive(spark, tiny_index, qs, w_anchor=0.1).collect()
    )
    gol = as_map(oracle_all_queries(idx, qs, w_anchor=0.1))
    assert eng == gol
    assert eng != base, "anchor weight must actually move the blend"
