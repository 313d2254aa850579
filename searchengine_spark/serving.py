"""Search serving layer — the rebuild of the reference frontend's result
rendering (``frontend/Mainpage.java``): blended top-k + title + snippet
+ offset/limit pagination.

Reference parity:
* title     = substring between ``<title>`` tags (``Mainpage.java:324-338``)
* snippet   = first <= 50 words of the concatenated ``<p>`` blocks
              (``Mainpage.java:340-368``)
* paginate  = sort desc -> skip(offset).limit(limit), defaults offset=0,
              limit=15 (``Mainpage.java:48-51,121-132``)

Physical shape: with a docstore built (``build_docstore``), the ranked
top-k is looked up in a doc-id-sorted forward index via a pushed
``In(doc_id)`` filter — O(k) row groups, the Spark analog of the
reference's per-URL KVS point GET. Without one, the fallback joins the
pages corpus on url — a broadcast of the *results*, so the corpus-side
lookup is a semi-join pruned scan, never a full-corpus shuffle; title/
snippet extraction then runs as one Arrow-vectorized pandas UDF over
the joined rows only (k rows, not the corpus).
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


DOCSTORE_FILES = 16


def build_docstore(
    spark: SparkSession, root: str, pages_path: str,
    n_files: int = DOCSTORE_FILES,
) -> None:
    """Forward index for serving: (doc_id, url, title, snippet),
    doc-id range-partitioned and SORTED so a top-k lookup's pushed
    ``In(doc_id, ...)`` filter prunes to O(k) row groups — the
    Spark-native analog of the reference frontend's per-URL KVS point
    GET (``Mainpage.java:150-160`` fetches each result's page from
    pt-crawl by key; it never scans the crawl table).

    Title/snippet extraction — the only per-request Python cost — is
    paid ONCE here over the corpus (Arrow-vectorized), instead of per
    query at serve time. At 100 TB the docstore is the one corpus-sized
    serving artifact, and it is only ever read k rows at a time."""
    from . import catalog

    docstats = spark.read.parquet(
        catalog.path(root, catalog.DOCSTATS)
    ).select("doc_id", "url")
    pages = spark.read.parquet(pages_path).select("url", "html")
    df = pages.join(docstats, "url").select(
        "doc_id",
        "url",
        title_udf("html").alias("title"),
        snippet_udf("html").alias("snippet"),
    )
    (
        df.repartitionByRange(n_files, "doc_id")
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite")
        .parquet(catalog.path(root, catalog.DOCSTORE))
    )


def refresh_docstore(
    spark: SparkSession, root: str, pages_path: str,
    rows_per_file: int = 50_000,
) -> int:
    """Catch the docstore up after streaming ingest + merge: docs now in
    docstats but absent from the docstore append as ADDITIONAL
    doc-id-sorted files (no global re-sort — per-file doc ranges may
    overlap across generations, which weakens row-group pruning slightly
    but never correctness; rebuild with :func:`build_docstore` to
    re-compact). Docs whose docstats url is NULL (merged without a
    ``pages_path`` — see ``merge._docstats_from_tokens``) are skipped
    until a docstats batch run fills their urls. Returns the number of
    docs appended. The ingest model is append-only by doc_id
    (= xxhash64(url)), so existing rows are never stale.
    """
    from . import catalog

    if not catalog.exists(root, catalog.DOCSTORE):
        build_docstore(spark, root, pages_path)
        return -1  # full build, not an append
    store_path = catalog.path(root, catalog.DOCSTORE)
    docstats = (
        spark.read.parquet(catalog.path(root, catalog.DOCSTATS))
        .select("doc_id", "url")
        .filter(F.col("url").isNotNull())
    )
    have = spark.read.parquet(store_path).select("doc_id")
    missing = docstats.join(have, "doc_id", "left_anti")
    n = missing.count()
    if n == 0:
        return 0
    pages = spark.read.parquet(pages_path).select("url", "html")
    df = pages.join(missing, "url").select(
        "doc_id",
        "url",
        title_udf("html").alias("title"),
        snippet_udf("html").alias("snippet"),
    )
    n_files = max(1, -(-n // rows_per_file))
    (
        df.repartitionByRange(n_files, "doc_id")
        .sortWithinPartitions("doc_id")
        .write.mode("append")
        .parquet(store_path)
    )
    return n


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


def _topk_df(
    spark: SparkSession, root: str, reqs: list[dict],
    w_anchor: float = 0.0,
) -> DataFrame:
    """(query_id, rank, doc_id, bm25, blended) for a list of request
    dicts ``{query, mode, k, offset}``; query_id = list index; rank
    spans [1, offset+k] (the caller applies the per-query offset cut).

    PHRASE requests score in a separate ``score_exhaustive`` call:
    its ``restrict`` allow-list must cover every query_id it scores
    with, so phrase and non-phrase requests cannot share one."""
    plain_qs: list[dict] = []
    phrase_qs: list[dict] = []
    restricts: list[DataFrame] = []
    for i, r in enumerate(reqs):
        mode = str(r.get("mode", "OR")).upper()
        query, exclude = split_exclusions(r["query"])
        k = int(r.get("k", DEFAULT_LIMIT))
        offset = int(r.get("offset", 0) or 0)
        q = {"query_id": i, "query": query, "k": offset + k,
             "exclude": exclude}
        if mode == "PHRASE":
            # keep token order and duplicates — parse_query dedups,
            # which is right for bag-of-words scoring but wrong for a
            # phrase
            toks = java_tokens(query.lower())
            restricts.append(
                phrase_match(spark, root, toks).select(
                    F.lit(i).alias("query_id"), "doc_id"
                )
            )
            # a phrase match contains every term, so AND == OR over the
            # restricted candidates; AND is declared for plan clarity
            q["mode"] = "AND"
            phrase_qs.append(q)
        else:
            q["mode"] = mode
            plain_qs.append(q)
    parts: list[DataFrame] = []
    if plain_qs:
        parts.append(
            score_exhaustive(spark, root, plain_qs, w_anchor=w_anchor)
        )
    if phrase_qs:
        restrict = restricts[0]
        for extra in restricts[1:]:
            restrict = restrict.unionAll(extra)
        parts.append(
            score_exhaustive(
                spark, root, phrase_qs, restrict=restrict,
                w_anchor=w_anchor,
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def _attach_docs(
    spark: SparkSession, root: str, pages_path: str, topk: DataFrame
) -> DataFrame:
    """(query_id, rank, url, title, snippet, bm25, blended) for a
    ranked (query_id, rank, doc_id, bm25, blended) frame."""
    from . import catalog

    if catalog.exists(root, catalog.DOCSTORE):
        # fast path: the ranked k rows are materialized (the sanctioned
        # k-row serving fetch), then looked up in the doc-id-sorted
        # docstore via a pushed In(doc_id) filter — O(k) row groups
        # decoded, no corpus scan, no re-run of the scoring job on the
        # lookup side.
        rows = topk.collect()
        local = spark.createDataFrame(rows, schema=topk.schema)
        store = spark.read.parquet(catalog.path(root, catalog.DOCSTORE))
        if rows:
            store = store.filter(
                F.col("doc_id").isin(
                    sorted({r["doc_id"] for r in rows})
                )
            )
        else:
            store = store.filter(F.lit(False))
        fast_df = store.join(F.broadcast(local), "doc_id").select(
            "query_id", "rank", "url", "title", "snippet", "bm25", "blended"
        )
        # Docs in the post-merge lag window (ranked from docstats but
        # not yet appended to the docstore — fsck flags these as a
        # warning) must not leave rank gaps. Precheck coverage with a
        # doc_id-only probe — column-pruned and In-pushed, it decodes
        # the SAME O(k) row groups the fetch will (cache-warm, one tiny
        # job per batch) — and route misses through the corpus-scan
        # fallback, so serving degrades to slower, never to missing
        # results. The common covered case returns the lazy pushed-In
        # plan unchanged.
        have = {r["doc_id"] for r in store.select("doc_id").collect()}
        missed = [r for r in rows if r["doc_id"] not in have]
        if not missed:
            return fast_df
        miss_df = spark.createDataFrame(missed, schema=topk.schema)
        return fast_df.unionAll(
            _attach_docs_corpus(spark, root, pages_path, miss_df)
        )

    return _attach_docs_corpus(spark, root, pages_path, topk)


def _attach_docs_corpus(
    spark: SparkSession, root: str, pages_path: str, topk: DataFrame
) -> DataFrame:
    """Slow-path doc attach: join the ranked rows back through docstats
    and the raw corpus, extracting title/snippet per request."""
    from . import catalog

    docstats = spark.read.parquet(catalog.path(root, catalog.DOCSTATS)).select(
        "doc_id", "url"
    )
    pages = spark.read.parquet(pages_path).select("url", "html")
    # broadcast the k ranked rows into both lookups — the corpus and
    # docstats sides stream, nothing big ever shuffles
    ranked = docstats.join(F.broadcast(topk), "doc_id")
    return pages.join(F.broadcast(ranked), "url").select(
        "query_id",
        "rank",
        "url",
        title_udf("html").alias("title"),
        snippet_udf("html").alias("snippet"),
        "bm25",
        "blended",
    )


def search(
    spark: SparkSession,
    root: str,
    pages_path: str,
    query: str,
    mode: str = "OR",
    k: int = DEFAULT_LIMIT,
    offset: int = 0,
    w_anchor: float = 0.0,
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
    req = {"query": query, "mode": mode, "k": k, "offset": offset}
    topk = _topk_df(spark, root, [req], w_anchor=w_anchor).filter(
        F.col("rank") > offset
    )
    return (
        _attach_docs(spark, root, pages_path, topk)
        .select("rank", "url", "title", "snippet", "bm25", "blended")
        .orderBy("rank")
    )


def search_many(
    spark: SparkSession, root: str, pages_path: str, reqs: list[dict],
    w_anchor: float = 0.0,
) -> list[list]:
    """Batched serving: one scoring job + one doc lookup for N
    requests; returns per-request row lists (rank-ascending, ranks
    absolute as in :func:`search`). ``reqs``: ``{query, mode, k,
    offset}`` dicts. Results are identical to N independent
    :func:`search` calls — the batch only amortizes the per-job cost
    (scheduling, segment reads, python decode spin-up) across the
    requests sharing it."""
    if not reqs:
        return []
    offs = spark.createDataFrame(
        [(i, int(r.get("offset", 0) or 0)) for i, r in enumerate(reqs)],
        "query_id int, off int",
    )
    topk = (
        _topk_df(spark, root, reqs, w_anchor=w_anchor)
        .join(F.broadcast(offs), "query_id")
        .filter(F.col("rank") > F.col("off"))
        .drop("off")
    )
    rows = _attach_docs(spark, root, pages_path, topk).collect()
    by_q: dict[int, list] = {i: [] for i in range(len(reqs))}
    for r in rows:
        by_q[r["query_id"]].append(r)
    for rs in by_q.values():
        rs.sort(key=lambda r: r["rank"])
    return [by_q[i] for i in range(len(reqs))]


class QueryBatcher:
    """Micro-batches concurrent search requests into one Spark job.

    The reference serves from a 100-thread pool over one shared backend
    (``webserver/Server.java:17``); the Spark analog is sharing one
    *job* — a single request pays ~2 s of fixed per-job cost (stage
    scheduling, segment reads, python decode spin-up) while the
    marginal cost of adding a query to a batch is ~0.2-0.35 s. The
    batcher needs no artificial time window: the in-flight job IS the
    window — requests arriving while a batch executes queue up and all
    ship in the next one, so an idle server still answers a lone
    request at single-query latency.

    Thread-safe; results are identical to per-request :func:`search`
    calls (``search_many`` is the same plan with more query_ids).
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        pages_path: str,
        max_batch: int = 64,
        w_anchor: float = 0.0,
    ) -> None:
        import threading

        self._spark = spark
        self._root = root
        self._pages_path = pages_path
        self._max_batch = max_batch
        self._w_anchor = w_anchor
        self._lock = threading.Lock()
        self._wake = threading.Event()
        self._queue: list[dict] = []
        self._stopped = False
        self.batches_run = 0  # introspection (tests assert coalescing)
        self.requests_served = 0
        self._thread = threading.Thread(
            target=self._loop, daemon=True, name="se-query-batcher"
        )
        self._thread.start()

    def search(
        self,
        query: str,
        mode: str = "OR",
        k: int = DEFAULT_LIMIT,
        offset: int = 0,
    ) -> list:
        """Enqueue one request and block until its batch lands."""
        import threading

        pend = {
            "req": {"query": query, "mode": mode, "k": k, "offset": offset},
            "event": threading.Event(),
            "rows": None,
            "err": None,
        }
        with self._lock:
            if self._stopped:
                raise RuntimeError("QueryBatcher is stopped")
            self._queue.append(pend)
        self._wake.set()
        pend["event"].wait()
        if pend["err"] is not None:
            raise pend["err"]
        return pend["rows"]

    def close(self) -> None:
        with self._lock:
            self._stopped = True
            pending, self._queue = self._queue, []
        for p in pending:
            p["err"] = RuntimeError("QueryBatcher closed")
            p["event"].set()
        self._wake.set()

    GATHER_WINDOW_S = 0.05

    def _loop(self) -> None:
        import time

        while True:
            self._wake.wait(timeout=0.5)
            with self._lock:
                if self._stopped:
                    return
                pending = len(self._queue)
            if pending:
                # gather window: the first arrival after an idle gap (or
                # a just-finished batch) waits a beat so the convoy of
                # clients released by the previous batch lands in THIS
                # one instead of trickling into 1-request batches. 50 ms
                # against a multi-second job is noise for a lone client
                # and the difference between batch=1 and batch=N under
                # load.
                time.sleep(self.GATHER_WINDOW_S)
            with self._lock:
                if self._stopped:
                    return
                batch = self._queue[: self._max_batch]
                del self._queue[: len(batch)]
                if not self._queue:
                    self._wake.clear()
            if not batch:
                continue
            try:
                results = search_many(
                    self._spark,
                    self._root,
                    self._pages_path,
                    [p["req"] for p in batch],
                    w_anchor=self._w_anchor,
                )
                for p, rows in zip(batch, results):
                    p["rows"] = rows
            except Exception as e:  # propagate to every waiter
                for p in batch:
                    p["err"] = e
            finally:
                self.batches_run += 1
                self.requests_served += len(batch)
                for p in batch:
                    p["event"].set()
