"""Generate golden fixtures from the COMPILED reference Java classes
(FIXTURES.md §4). Run once; goldens are committed.

The reference at /root/reference is read-only; we copy its sources to a
/tmp build dir, fix the case-mismatched `search.Spark` imports (the repo
only compiles on case-insensitive filesystems as-is), compile with
javac -encoding UTF-8, and drive a small stdin/stdout harness
(tools/java/GoldenGen.java) in base64 so arbitrary bytes survive.

Outputs (committed under golden/):
  stems.tsv            token<TAB>stem (base64 both) from the Java PorterStemmer
  url_hashes.tsv       input<TAB>hash (base64 input) from tools/Hasher.java
  extracted_title.tsv  url<TAB>base64(text) via Indexer.removeTagsAndPunctuation
  extracted_titlep.tsv url<TAB>base64(text) via TF_IDF.removeHTMLTagsAndPunctuation
"""

from __future__ import annotations

import base64
import os
import random
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUILD = "/tmp/refbuild"
REF_SRC = "/root/reference/src/search"

sys.path.insert(0, REPO)

from searchengine_spark import corpus  # noqa: E402


def ensure_compiled() -> None:
    classes = os.path.join(BUILD, "classes")
    if os.path.exists(os.path.join(classes, "GoldenGen.class")):
        return
    os.makedirs(os.path.join(BUILD, "src"), exist_ok=True)
    dst = os.path.join(BUILD, "src", "search")
    if not os.path.exists(dst):
        shutil.copytree(REF_SRC, dst)
    subprocess.run(
        ["bash", "-c", f"sed -i 's/search\\.Spark/search.spark/g' {dst}/jobs/*.java"],
        check=True,
    )
    harness = os.path.join(REPO, "tools", "java", "GoldenGen.java")
    subprocess.run(
        [
            "javac", "-encoding", "UTF-8", "-d", classes,
            "-sourcepath", os.path.join(BUILD, "src"),
            os.path.join(dst, "jobs", "Indexer.java"),
            os.path.join(dst, "jobs", "TF_IDF.java"),
            os.path.join(dst, "external", "PorterStemmer.java"),
            os.path.join(dst, "tools", "Hasher.java"),
        ],
        check=True,
    )
    subprocess.run(
        ["javac", "-encoding", "UTF-8", "-cp", classes, "-d", classes, harness],
        check=True,
    )


def run_mode(mode: str, inputs: list[str]) -> list[str]:
    ensure_compiled()
    stdin = "\n".join(
        base64.b64encode(s.encode("utf-8")).decode("ascii") for s in inputs
    )
    proc = subprocess.run(
        ["java", "-cp", os.path.join(BUILD, "classes"), "GoldenGen", mode],
        input=stdin + "\n",
        capture_output=True,
        text=True,
        check=True,
    )
    lines = proc.stdout.split("\n")[: len(inputs)]
    assert len(lines) == len(inputs), (len(lines), len(inputs))
    return [base64.b64decode(line).decode("utf-8") for line in lines]


def token_set() -> list[str]:
    rng = random.Random("goldens")
    toks: list[str] = list(corpus.VOCAB)
    suffixes = ["s", "es", "ies", "ed", "ing", "ational", "ization", "fulness",
                "iveness", "ousness", "aliti", "iviti", "biliti", "icate",
                "ative", "alize", "iciti", "ical", "ful", "ness", "ant",
                "ence", "ance", "er", "able", "ible", "ment", "ent", "ion",
                "ou", "ism", "ate", "iti", "ous", "ive", "ize", "eed", "y"]
    base = ["caress", "poni", "ti", "cat", "feed", "agree", "disable", "mat",
            "mate", "meet", "mill", "mess", "run", "hop", "hope", "love",
            "snow", "box", "tray", "relat", "condition", "rational", "valenc",
            "hesit", "digit", "oper", "feudal", "decis", "plia", "differ",
            "vile", "analog", "vietnam", "predic", "formal", "sensitiv",
            "sensibl", "triplic", "form", "clean", "hopeful", "good", "sky",
            "the", "a", "an", "is", "be", "by", "controll", "roll"]
    for b in base:
        toks.append(b)
        for s in suffixes:
            toks.append(b + s)
    # adversarial: digits, mixed case, punctuation leftovers, y-runs, long
    toks += ["", "a", "ab", "abc", "123", "a1b2", "ABC", "Running", "RUNNING",
             "yyyy", "yyyyyyyyyy", "syzygy", "rhythm", "sssses", "eeed",
             "x" * 100, "ba" * 60, "0arational", "enjoyed", "dyed", "died",
             "agreed", "exceed", "sized", "hoping", "hopping", "falling",
             "failing", "filing", "relational", "conditional", "happy",
             "happiness", "skies", "utilities"]
    seen: dict[str, None] = {}
    for t in toks:
        seen.setdefault(t, None)
    out = list(seen)
    rng.shuffle(out)
    return out


# adversarial html beyond the generator's shapes (index = "extra:<i>" key)
ADVERSARIAL_HTML = [
    "<title>unclosed",
    "<TITLE>case</TITLE>",
    "<title>a<b>bold</b>c</title>",
    "<title>one</title><title>two</title>",
    "<script>while(1){if(a<b){}}</script><title>after script</title>",
    "<style>p{}</style><p>para &amp; stuff</p><title>t</title>",
    "<title>\nnewline\ttab\r</title>",
    "<title>punct !@#$%^&*()_+-=[]{};':\",./<>?</title>",
    "<p>only paragraph</p>",
    "no tags at all",
    "",
    "<title></title>",
    "<title>café 中文 Über</title>",
    "<script src=x>s</script><title>t2</title><p>p1</p><p>p2</p>",
]


def main() -> None:
    gold = os.path.join(REPO, "golden")
    os.makedirs(gold, exist_ok=True)

    toks = token_set()
    stems = run_mode("stem", toks)
    with open(os.path.join(gold, "stems.tsv"), "w") as f:
        for t, s in zip(toks, stems):
            f.write(
                base64.b64encode(t.encode()).decode()
                + "\t"
                + base64.b64encode(s.encode()).decode()
                + "\n"
            )
    print(f"stems.tsv: {len(toks)} tokens")

    hash_inputs = [corpus.url_of(i) for i in range(300)] + [
        "", "a", "hello world", "https://example.com/", "éü中文",
    ]
    hashes = run_mode("hash", hash_inputs)
    with open(os.path.join(gold, "url_hashes.tsv"), "w") as f:
        for u, h in zip(hash_inputs, hashes):
            f.write(base64.b64encode(u.encode()).decode() + "\t" + h + "\n")
    print(f"url_hashes.tsv: {len(hash_inputs)} inputs")

    n = corpus.SCALES["tiny"]
    pages = [corpus.render_page(i, n) for i in range(n)]
    htmls = [p["html"].decode("utf-8") for p in pages]
    all_html = htmls + ADVERSARIAL_HTML
    keys = [p["url"] for p in pages] + [
        f"extra:{i}" for i in range(len(ADVERSARIAL_HTML))
    ]
    for mode, fname in (
        ("extract_title", "extracted_title.tsv"),
        ("extract_titlep", "extracted_titlep.tsv"),
    ):
        outs = run_mode(mode, all_html)
        with open(os.path.join(gold, fname), "w") as f:
            for k, o in zip(keys, outs):
                f.write(
                    base64.b64encode(k.encode()).decode()
                    + "\t"
                    + base64.b64encode(o.encode()).decode()
                    + "\n"
                )
        print(f"{fname}: {len(all_html)} documents")


if __name__ == "__main__":
    main()
