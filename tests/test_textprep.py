"""Extraction byte-identity vs goldens from the compiled reference Java
(Indexer.removeTagsAndPunctuation / TF_IDF.removeHTMLTagsAndPunctuation)
— the BASELINE.json input_hint invariant."""

import base64
import os

from searchengine_spark import corpus
from searchengine_spark.textprep import (
    extract_text_title,
    java_tokens,
    remove_tags_and_punctuation,
)

GOLD_DIR = os.path.join(os.path.dirname(__file__), "..", "golden")


def _load(fname):
    out = {}
    with open(os.path.join(GOLD_DIR, fname)) as f:
        for line in f:
            k64, v64 = line.rstrip("\n").split("\t")
            out[base64.b64decode(k64).decode()] = base64.b64decode(v64).decode()
    return out


def _htmls():
    n = corpus.SCALES["tiny"]
    pages = {p["url"]: p["html"].decode("utf-8") for p in (corpus.render_page(i, n) for i in range(n))}
    return pages


def test_title_extraction_byte_identical():
    gold = _load("extracted_title.tsv")
    pages = _htmls()
    checked = 0
    for key, expected in gold.items():
        html = pages.get(key)
        if html is None:
            continue  # adversarial extras handled in the other test
        assert remove_tags_and_punctuation(html) == expected, f"url={key}"
        checked += 1
    assert checked == corpus.SCALES["tiny"]


def test_adversarial_extraction_byte_identical():
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.gen_goldens import ADVERSARIAL_HTML

    for fname, include_p in (
        ("extracted_title.tsv", False),
        ("extracted_titlep.tsv", True),
    ):
        gold = _load(fname)
        checked = 0
        for i, html in enumerate(ADVERSARIAL_HTML):
            expected = gold[f"extra:{i}"]
            got = remove_tags_and_punctuation(html, include_p=include_p)
            assert got == expected, f"{fname} extra:{i}: {got!r} != {expected!r}"
            checked += 1
        assert checked == len(ADVERSARIAL_HTML)


def test_titlep_extraction_byte_identical():
    pages = _htmls()
    gold_p = _load("extracted_titlep.tsv")
    checked = 0
    for key, expected in gold_p.items():
        html = pages.get(key)
        if html is None:
            continue
        assert remove_tags_and_punctuation(html, include_p=True) == expected, key
        checked += 1
    assert checked == corpus.SCALES["tiny"]


def test_pages_text_column_matches_goldens():
    """The corpus 'text' column IS the canonical extraction (input_hint)."""
    gold = _load("extracted_title.tsv")
    n = corpus.SCALES["tiny"]
    for i in range(0, n, 7):
        p = corpus.render_page(i, n)
        assert p["text"] == gold[p["url"]]
        assert p["text"] == extract_text_title(p["html"].decode())


def test_java_tokenize_semantics():
    assert java_tokens("") == []
    assert java_tokens("   \t\n ") == []
    assert java_tokens(" a  b\tc ") == ["a", "b", "c"]
    assert java_tokens("x" * 101 + " ok") == ["ok"]  # >100-char drop
