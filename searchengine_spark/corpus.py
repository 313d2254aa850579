"""Deterministic synthetic web corpus (FIXTURES.md §1-§3).

Generates the ``pages`` table with exactly the BASELINE.json ``input_hint``
schema: ``(url string, warc_ts timestamp, html binary, text string,
lang string)``. Everything is a pure function of (seed, page_id): pages can
be generated in any order, in parallel, at any scale, and always come out
identical — the property the resume/parallelism-invariance tests rely on.

Content design:
* ~5,000-lemma vocabulary with Zipfian frequencies (exercises head-term
  salting) + planted rare terms with exactly known df (hand-checkable BM25).
* Canonical page URLs carry an explicit port (``https://siteN.example:443/
  p/I.html``) because the reference's URL normalizer
  (``jobs/PageRank.java:173-215``) always default-fills the port — link
  targets then resolve exactly to other pages' canonical urls.
* The embedded link graph has a hub, authorities, a sink, a self-link and
  a disconnected triangle (FIXTURES.md §3), plus deterministic "random"
  links; anchors are emitted in absolute / relative / ``../`` / ``#frag`` /
  mailto / image forms to exercise normalization.
* ``text`` is the byte-identical title-only extraction (the input_hint
  invariant), computed with :mod:`.textprep` (itself golden-verified
  against the compiled reference Java).
"""

from __future__ import annotations

import datetime as _dt
import math
import random

import pyarrow as pa
import pyarrow.parquet as pq

from .textprep import extract_text_title

SEED = 42
N_SITES = 50
VOCAB_SIZE = 5000
EPOCH = _dt.datetime(2024, 1, 1, tzinfo=_dt.timezone.utc)

# Planted rare terms: term -> sorted page_id selector (df known exactly).
# zyqvexa appears in the title of pages where page_id % 211 == 7;
# wubblorn in the body of pages where page_id % 499 == 11; qoxarnel in
# both title and twice in body where page_id % 997 == 13.
PLANTED = {
    "zyqvexa": (211, 7, "title"),
    "wubblorn": (499, 11, "body"),
    "qoxarnel": (997, 13, "both"),
}

_SYL_A = "b c d f g h j k l m n p r s t v w z br ch cl dr fl gr pl st tr".split()
_SYL_B = "a e i o u ai ea io ou".split()
_SYL_C = "n r s t l m ck x".split()

SCALES = {"tiny": 200, "small": 5000, "bench": 200_000}


def _make_vocab() -> list[str]:
    """Deterministic pseudo-English lemmas + suffixed variants."""
    rng = random.Random(7_001)
    seen: dict[str, None] = {}
    while len(seen) < VOCAB_SIZE:
        n_syl = rng.choice((2, 2, 2, 3, 3))
        w = "".join(
            rng.choice(_SYL_A) + rng.choice(_SYL_B) for _ in range(n_syl)
        )
        if rng.random() < 0.35:
            w += rng.choice(_SYL_C)
        if rng.random() < 0.30:
            w += rng.choice(("ing", "ed", "s", "ation", "ness", "ly", "ies"))
        if 3 <= len(w) <= 18:
            seen.setdefault(w, None)
    return list(seen)


VOCAB = _make_vocab()
# Zipf weights: P(rank r) ~ 1/(r+2.7)^1.07 (classic web-text shape)
_ZIPF_CUM: list[float] = []
_total = 0.0
for _r in range(VOCAB_SIZE):
    _total += 1.0 / (_r + 2.7) ** 1.07
    _ZIPF_CUM.append(_total)


def _zipf_word(rng: random.Random) -> str:
    x = rng.random() * _total
    lo, hi = 0, VOCAB_SIZE - 1
    while lo < hi:
        mid = (lo + hi) // 2
        if _ZIPF_CUM[mid] < x:
            lo = mid + 1
        else:
            hi = mid
    return VOCAB[lo]


def site_of(page_id: int) -> int:
    """Zipf-ish deterministic host assignment."""
    r = random.Random(f"{SEED}:site:{page_id}")
    return min(int((1.0 / max(r.random(), 1e-9)) ** 0.7) % N_SITES, N_SITES - 1)


def url_of(page_id: int) -> str:
    return f"https://site{site_of(page_id)}.example:443/p/{page_id}.html"


def _planted_in(page_id: int, where: str) -> list[str]:
    out = []
    for term, (mod, rem, loc) in PLANTED.items():
        if page_id % mod == rem and (loc == where or loc == "both"):
            out.append(term)
    return out


def expected_links(page_id: int, n_pages: int) -> list[int]:
    """The planted out-link targets of a page (post-normalization truth)."""
    n = n_pages
    if n < 20:
        return [(page_id + 1) % n] if page_id != n - 1 else []
    sink, selfp = n - 1, n - 2
    disc = {n - 5, n - 4, n - 3}
    if page_id == sink:
        return []
    if page_id == selfp:
        return [selfp]
    if page_id in disc:  # disconnected triangle
        others = sorted(disc - {page_id})
        return others
    if page_id == 0:  # hub
        return list(range(1, 11))
    out = []
    if 1 <= page_id <= 10:  # authorities link back to hub
        out.append(0)
    bound = n - 6  # keep generic targets clear of sink/self/triangle
    out.append((page_id * 7 + 3) % bound)
    out.append((page_id * 13 + 5) % bound)
    if page_id % 17 == 0:
        out.append(sink)
    # dedup preserving order; drop accidental self refs except planted one
    seen: dict[int, None] = {}
    for t in out:
        if t != page_id:
            seen.setdefault(t, None)
    return list(seen)


def _anchor_html(rng: random.Random, src_id: int, dst_id: int) -> str:
    """Render one link in a randomly chosen (but deterministic) raw form."""
    dst_url = url_of(dst_id)
    form = rng.randrange(4)
    if form == 0:  # absolute without port (normalizer re-adds :443)
        href = f"https://site{site_of(dst_id)}.example/p/{dst_id}.html"
    elif form == 1 and site_of(src_id) == site_of(dst_id):
        href = f"{dst_id}.html"  # relative, same dir
    elif form == 2 and site_of(src_id) == site_of(dst_id):
        href = f"../p/{dst_id}.html"  # relative with ..
    else:
        href = dst_url  # already canonical
    return f'<a href="{href}">link {dst_id}</a>'


def render_page(page_id: int, n_pages: int) -> dict:
    rng = random.Random(f"{SEED}:page:{page_id}")
    title_words = [_zipf_word(rng) for _ in range(rng.randrange(3, 9))]
    title_words += _planted_in(page_id, "title")
    title = " ".join(title_words)

    paras = []
    for _ in range(rng.randrange(2, 6)):
        n_words = rng.randrange(8, 40)
        words = [_zipf_word(rng) for _ in range(n_words)]
        paras.append(" ".join(words))
    body_planted = _planted_in(page_id, "body")
    if body_planted:
        paras.append(" ".join(body_planted * 2))

    anchors = [
        _anchor_html(rng, page_id, dst)
        for dst in expected_links(page_id, n_pages)
    ]
    # noise links that the normalizer must drop
    noise = ['<a href="#top">top</a>', '<a href="mailto:x@y.z">mail</a>',
             f'<a href="https://site0.example/p/{page_id}.png">img</a>']

    script = "<script>var x = 1 < 2; console.log('drop me');</script>"
    style = "<style>.a{color:red}</style>"
    html = (
        f"<html><head><title>{title}</title>{style}</head><body>{script}"
        + "".join(f"<p>{p}</p>" for p in paras)
        + "".join(anchors)
        + "".join(noise)
        + "</body></html>"
    )
    html_bytes = html.encode("utf-8")
    return {
        "url": url_of(page_id),
        "warc_ts": EPOCH + _dt.timedelta(seconds=37 * page_id),
        "html": html_bytes,
        "text": extract_text_title(html),
        "lang": "xx" if page_id % 97 == 95 else "en",
    }


PAGES_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us", tz="UTC")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ]
)


def write_pages_parquet(
    path: str, n_pages: int, batch_rows: int = 2_000, n_files: int = 16
) -> None:
    """Write the corpus as a DIRECTORY of parquet part files (row groups
    of ``batch_rows``). Multiple files mirror the real corpus shape
    (Common Crawl = many WARCs) and give the index build file-granular
    chunk lineage + natural scan parallelism. Content depends only on
    page ids — the file split never changes what is written."""
    import os
    import shutil

    n_files = min(n_files, max(1, n_pages // max(batch_rows // 4, 1)) or 1)
    if os.path.exists(path) and not os.path.isdir(path):
        os.remove(path)
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    per = (n_pages + n_files - 1) // n_files
    tasks = [
        (path, f, f * per, min((f + 1) * per, n_pages), n_pages, batch_rows)
        for f in range(n_files)
        if f * per < n_pages
    ]
    # page content depends only on the page id, so per-file rendering
    # parallelizes with no effect on the bytes written
    if len(tasks) > 1 and n_pages >= 20_000:
        from multiprocessing import Pool

        with Pool(min(len(tasks), 16)) as pool:
            pool.map(_write_pages_file, tasks)
    else:
        for t in tasks:
            _write_pages_file(t)


def _write_pages_file(args: tuple) -> None:
    import os

    path, f, lo, hi, n_pages, batch_rows = args
    writer = pq.ParquetWriter(
        os.path.join(path, f"part-{f:05d}.parquet"),
        PAGES_SCHEMA,
        compression="zstd",
    )
    try:
        for start in range(lo, hi, batch_rows):
            rows = [
                render_page(i, n_pages)
                for i in range(start, min(start + batch_rows, hi))
            ]
            cols = {
                k: [r[k] for r in rows]
                for k in ("url", "warc_ts", "html", "text", "lang")
            }
            writer.write_table(pa.Table.from_pydict(cols, schema=PAGES_SCHEMA))
    finally:
        writer.close()


def expected_edges(n_pages: int) -> list[tuple[str, str]]:
    """Planted (src_url, dst_url) edge list, post-normalization."""
    return [
        (url_of(i), url_of(j))
        for i in range(n_pages)
        for j in expected_links(i, n_pages)
    ]


def reference_queries() -> list[dict]:
    """The reference query set (~50 queries; FIXTURES.md §2)."""
    rng = random.Random(f"{SEED}:queries")
    qs: list[dict] = []

    def add(query: str, mode: str = "OR", k: int = 15) -> None:
        qs.append({"query_id": len(qs), "query": query, "mode": mode, "k": k})

    heads = VOCAB[:8]
    mids = VOCAB[40:48]
    rares = VOCAB[2000:2008]
    for w in heads[:4]:
        add(w)
    for w in rares[:4]:
        add(w)
    for t in PLANTED:
        add(t)
        add(t, "AND")
    for a, b in zip(heads, mids):
        add(f"{a} {b}")
        add(f"{a} {b}", "AND")
    for a, b in zip(mids, rares):
        add(f"{a} {b} {rng.choice(heads)}", rng.choice(("AND", "OR")))
    add("Running")          # mixed case + stemming
    add("qqqabsentterm")    # absent
    add(f"qqqabsentterm {heads[0]}")          # mixed present/absent, OR
    add(f"qqqabsentterm {heads[0]}", "AND")   # mixed present/absent, AND
    add(" ".join(heads[:5]))                   # stopword-ish heavy OR
    add(f"{PLANTED and list(PLANTED)[0]} {heads[0]}", "AND")
    add(heads[0], "OR", 3)
    add(heads[1], "OR", 50)
    return qs
