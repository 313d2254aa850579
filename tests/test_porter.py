"""Porter stemmer fidelity: token-for-token vs goldens generated from the
compiled reference Java class (external/PorterStemmer.java)."""

import base64
import os

from searchengine_spark.porter import porter_stem

GOLD = os.path.join(os.path.dirname(__file__), "..", "golden", "stems.tsv")


def _load():
    with open(GOLD) as f:
        for line in f:
            t64, s64 = line.rstrip("\n").split("\t")
            yield (
                base64.b64decode(t64).decode("utf-8"),
                base64.b64decode(s64).decode("utf-8"),
            )


def test_stems_match_java_goldens():
    pairs = list(_load())
    assert len(pairs) > 5000
    bad = [(t, porter_stem(t), s) for t, s in pairs if porter_stem(t) != s]
    assert not bad, f"{len(bad)} divergences, first 10: {bad[:10]}"


def test_short_words_unchanged():
    for w in ("", "a", "ab", "is", "by"):
        assert porter_stem(w) == w
