"""Block-max WAND top-k over the compressed posting segments.

The scale path for query serving (north_rule: "top-k conjunctive /
disjunctive keyword queries via posting-list intersection with
block-max WAND pruning"). The reference frontend scores every candidate
of every term (``frontend/Mainpage.java:63-110``); WAND visits only
documents that can still enter the top-k.

Physical shape: one bucket-pruned segment scan for all query terms →
broadcast-join the query-term table → ``applyInPandas`` grouped by
query_id, so each query's WAND runs where its (few) segment rows land —
queries parallelize across the cluster, posting data never leaves the
executor that read it, and the driver sees only k rows per query.

Scoring: BM25 with the engine's constants — score(q,d) = Σ_t idf_t ·
(k1+1) · tf_norm where tf_norm = tf/(tf + k1(1-b+b·dl/avgdl)) is
PRE-COMPUTED at build time into the blocks' max metadata
(``indexer._postings_kernel``), so the upper bounds used for pruning are
exact bounds of the stored scores. Results are rank-identical to the
exhaustive path: same fold order (sorted terms), same tie-break
(score DESC, doc_id ASC) — asserted by tests/test_wand.py.

Salted head terms: a term's salted blobs are doc-disjoint; the kernel
concatenates and re-sorts them into one logical posting list (the
salt-aware merge at query time).
"""

from __future__ import annotations

import heapq
import os
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .bm25 import B, K1
from .compress import BLOCK, to_signed, varbyte_decode
from .query import all_query_terms, load_segments, parse_query, term_idfs

TOPK_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.IntegerType()),
        T.StructField("rank", T.IntegerType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("bm25", T.DoubleType()),
    ]
)


@dataclass
class _TermList:
    """One query term's merged posting list + block metadata."""

    idf: float
    docs: np.ndarray          # sorted int64 doc ids
    norms: np.ndarray         # float64 tf_norm per posting
    block_last: np.ndarray    # last doc id per block
    block_max: np.ndarray     # max SCORE (idf*(k1+1)*norm) per block
    max_score: float = 0.0
    pos: int = 0              # cursor into docs
    field_order: int = 0

    def cur_doc(self) -> int:
        return int(self.docs[self.pos]) if self.pos < len(self.docs) else _END

    def advance_to(self, target: int) -> None:
        """Move cursor to first doc >= target (galloping via searchsorted)."""
        if target > _INT64_MAX:
            self.pos = len(self.docs)
            return
        if self.pos < len(self.docs):
            self.pos += int(
                np.searchsorted(self.docs[self.pos:], target, side="left")
            )

    def score_at(self) -> float:
        return self.idf * (K1 + 1.0) * float(self.norms[self.pos])

    def block_of(self, doc: int) -> int:
        return int(np.searchsorted(self.block_last, doc, side="left"))

    def block_ub(self, doc: int) -> float:
        b = self.block_of(doc)
        return float(self.block_max[b]) if b < len(self.block_max) else 0.0

    def block_end(self, doc: int) -> int:
        b = self.block_of(doc)
        return int(self.block_last[b]) if b < len(self.block_last) else _END


# exhausted-cursor sentinel: must exceed every possible doc id; doc ids
# are full-range signed int64 (xxhash64), so use 2^63 (> int64 max).
# Python ints compare fine; numpy never sees this value.
_INT64_MAX = (1 << 63) - 1
_END = (1 << 63)


def merge_salted(rows: list[dict], idf: float) -> _TermList:
    """Concatenate a term's (doc-disjoint) salted blobs, re-sort by doc,
    rebuild block metadata over the merged order."""
    docs_parts, norm_parts = [], []
    for r in rows:
        d = to_signed(
            np.cumsum(varbyte_decode(bytes(r["doc_blob"])), dtype=np.uint64)
        )
        tf = varbyte_decode(bytes(r["tf_blob"])).astype(np.float64)
        dl = varbyte_decode(bytes(r["dl_blob"])).astype(np.float64)
        docs_parts.append(d)
        norm_parts.append(tf / (tf + K1 * (1.0 - B + B * dl / r["_avgdl"])))
    docs = np.concatenate(docs_parts)
    norms = np.concatenate(norm_parts)
    order = np.argsort(docs, kind="mergesort")
    docs, norms = docs[order], norms[order]
    n_blocks = (len(docs) + BLOCK - 1) // BLOCK
    block_last = np.empty(n_blocks, dtype=np.int64)
    block_max = np.empty(n_blocks, dtype=np.float64)
    scale = idf * (K1 + 1.0)
    for b in range(n_blocks):
        lo, hi = b * BLOCK, min((b + 1) * BLOCK, len(docs))
        block_last[b] = docs[hi - 1]
        block_max[b] = scale * norms[lo:hi].max()
    tl = _TermList(idf, docs, norms, block_last, block_max)
    tl.max_score = float(block_max.max()) if n_blocks else 0.0
    return tl


def _full_score(terms: list[_TermList], doc: int) -> float:
    """Deterministic fold: per-term scores summed in field_order (sorted
    term name) — the exact order the exhaustive path folds in."""
    parts = []
    for t in terms:
        t.advance_to(doc)
        if t.cur_doc() == doc:
            parts.append((t.field_order, t.score_at()))
    s = 0.0
    for _o, v in sorted(parts):
        s += v
    return s


def wand_topk(terms: list[_TermList], k: int, mode: str = "OR") -> list[tuple[int, float]]:
    """Block-max WAND (OR) / pruned intersection (AND) top-k.
    Returns [(doc_id, score)] sorted score DESC, doc_id ASC."""
    terms = [t for t in terms if len(t.docs)]
    if not terms or k <= 0:
        return []
    if mode == "AND":
        return _and_topk(terms, k)

    # heap of (score, -doc_id) so the worst kept entry is heap[0]
    heap: list[tuple[float, int]] = []
    theta = -np.inf
    while True:
        live = [t for t in terms if t.cur_doc() < _END]
        if not live:
            break
        live.sort(key=lambda t: (t.cur_doc(), t.field_order))
        # pivot: first prefix whose Σ max_score can still enter the
        # top-k. ">=" not ">": an equal score with a smaller doc_id
        # outranks the kept entry under the total tie-break.
        acc = 0.0
        pivot_i = -1
        for i, t in enumerate(live):
            acc += t.max_score
            if acc >= theta or len(heap) < k:
                pivot_i = i
                break
        if pivot_i < 0:
            break  # nothing can beat theta
        pivot_doc = live[pivot_i].cur_doc()
        # extend the prefix across lists tied at pivot_doc — they
        # contribute to pivot_doc's score, so the block upper bound and
        # the skip advancement must include them
        while (
            pivot_i + 1 < len(live)
            and live[pivot_i + 1].cur_doc() == pivot_doc
        ):
            pivot_i += 1
        if live[0].cur_doc() == pivot_doc:
            # block-max check: refine the upper bound with block maxima
            block_ub = sum(
                t.block_ub(pivot_doc) for t in live[: pivot_i + 1]
            )
            if len(heap) >= k and block_ub < theta:
                # skip: jump past the earliest block boundary, but never
                # past the next list's current doc (it could join the
                # bound for docs inside the skipped range)
                next_doc = min(
                    t.block_end(pivot_doc) for t in live[: pivot_i + 1]
                ) + 1
                if pivot_i + 1 < len(live):
                    next_doc = min(next_doc, live[pivot_i + 1].cur_doc())
                next_doc = max(next_doc, pivot_doc + 1)
                for t in live[: pivot_i + 1]:
                    t.advance_to(next_doc)
                continue
            s = _full_score(live, pivot_doc)
            entry = (s, -pivot_doc)
            if len(heap) < k:
                heapq.heappush(heap, entry)
                if len(heap) == k:
                    theta = heap[0][0]
            elif entry > heap[0]:
                heapq.heapreplace(heap, entry)
                theta = heap[0][0]
            for t in live:
                if t.cur_doc() == pivot_doc:
                    t.advance_to(pivot_doc + 1)
        else:
            # advance all pre-pivot lists to the pivot doc
            for t in live[:pivot_i]:
                t.advance_to(pivot_doc)
    out = sorted(heap, key=lambda e: (-e[0], -e[1]))
    return [(-nd, s) for s, nd in out]


def _and_topk(terms: list[_TermList], k: int) -> list[tuple[int, float]]:
    """Posting-list intersection (rarest list drives; galloping advance),
    then exact scoring of intersected docs."""
    terms = sorted(terms, key=lambda t: len(t.docs))
    driver, rest = terms[0], terms[1:]
    heap: list[tuple[float, int]] = []
    exhausted = False
    for i in range(len(driver.docs)):
        if exhausted:
            break
        doc = int(driver.docs[i])
        ok = True
        for t in rest:
            t.advance_to(doc)
            if t.cur_doc() != doc:
                ok = False
                if t.cur_doc() == _END:
                    exhausted = True
                break
        if not ok:
            continue
        driver.pos = i
        s = _full_score(terms, doc)
        entry = (s, -doc)
        if len(heap) < k:
            heapq.heappush(heap, entry)
        elif entry > heap[0]:
            heapq.heapreplace(heap, entry)
    out = sorted(heap, key=lambda e: (-e[0], -e[1]))
    return [(-nd, s) for s, nd in out]


def score_wand(
    spark: SparkSession, root: str, queries: list[dict]
) -> DataFrame:
    """Distributed WAND: (query_id, rank, doc_id, bm25) for every query.
    Pure-BM25 ranking (tie doc_id ASC); the blend path stays in
    ``query.score_exhaustive``."""
    from .indexer import read_stats

    n_docs, avgdl = read_stats(spark, root)
    terms = all_query_terms(queries)
    idfs = term_idfs(spark, root, terms, n_docs)

    qmeta = []
    for q in queries:
        qterms = parse_query(q["query"])
        qmeta.append(
            {
                "query_id": int(q["query_id"]),
                "terms": qterms,
                "mode": q.get("mode", "OR"),
                "k": int(q.get("k", 15)),
            }
        )
    qmeta_b = spark.sparkContext.broadcast(qmeta)
    idfs_b = spark.sparkContext.broadcast(idfs)

    segs = load_segments(spark, root, terms).select(
        "term", "salt", "doc_blob", "tf_blob", "dl_blob"
    )
    qt_rows = [
        (qm["query_id"], t) for qm in qmeta for t in qm["terms"]
    ]
    if not qt_rows:
        return spark.createDataFrame([], TOPK_SCHEMA)
    qt = spark.createDataFrame(qt_rows, "query_id int, term string")
    joined = segs.join(F.broadcast(qt), "term")

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(pdf["query_id"].iloc[0])
        qm = next(m for m in qmeta_b.value if m["query_id"] == qid)
        by_term: dict[str, list[dict]] = {}
        for r in pdf.to_dict("records"):
            r["_avgdl"] = avgdl
            by_term.setdefault(r["term"], []).append(r)
        tls = []
        present = sorted(set(qm["terms"]))
        for order, t in enumerate(present):
            if t in by_term:
                tl = merge_salted(by_term[t], idfs_b.value.get(t, 0.0))
                tl.field_order = order
                tls.append(tl)
        if qm["mode"] == "AND" and len(tls) != len(set(qm["terms"])):
            tls = []  # an absent term empties a conjunction
        hits = wand_topk(tls, qm["k"], qm["mode"])
        return pd.DataFrame(
            {
                "query_id": pd.Series([qid] * len(hits), dtype="int32"),
                "rank": pd.Series(range(1, len(hits) + 1), dtype="int32"),
                "doc_id": pd.Series([d for d, _ in hits], dtype="int64"),
                "bm25": pd.Series([s for _, s in hits], dtype="float64"),
            }
        )

    return (
        joined.groupBy("query_id")
        .applyInPandas(kernel, TOPK_SCHEMA)
        .orderBy("query_id", "rank")
    )
