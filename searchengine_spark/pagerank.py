"""PageRank over the extracted link graph — iterative DataFrame
join-aggregate with the reference's exact math (SURVEY.md §3.3):

* link extraction: ``<a\\s+(?:[^>]*?\\s+)?href="([^"]*)"`` case-insensitive,
  skipping ``#``-prefixed and empty hrefs (``jobs/PageRank.java:155-171``);
* URL normalization replica of ``jobs/PageRank.java:173-215`` +
  ``tools/URLParser.java:8-31``: protocol/host/port default-fill
  (80/443), relative-path resolution, RFC-2396 dot-segment removal,
  drop non-http(s) and ``.jpg|.jpeg|.gif|.png|.txt`` targets, and the
  normalizer's always-explicit port in the output;
* iteration: contribution = 0.85 * rank / outdeg per out-link
  (duplicates count, ``PageRank.java:75``), new = sum(incoming) + 0.15
  (fixed additive base, NOT 0.15/N — the reference's deliberate
  simplification, ``PageRank.java:107``), targets outside the corpus
  dropped (the join against the state table, ``PageRank.java:99-100``);
* convergence: L-inf max |new - old| <= threshold (``PageRank.java:120-142``).

Scale notes: edges and ranks are both keyed by doc_id; the join is a
shuffle hash/sort-merge join that AQE handles, ranks are checkpointed
every CHECKPOINT_EVERY iterations to cut lineage (SURVEY.md §7.3), and
out-degrees are precomputed once.
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from urllib.parse import urljoin

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import catalog, checkpoint

_RE_HREF = re.compile(r'<a\s+(?:[^>]*?\s+)?href="([^"]*)"', re.IGNORECASE)
_RE_IMG_EXT = re.compile(r".*\.(jpg|jpeg|gif|png|txt)$")



def extract_hrefs(page: str) -> list[str]:
    """PageRank.extractUrls: all href captures, minus #fragments/empties."""
    out = []
    for m in _RE_HREF.finditer(page):
        u = m.group(1)
        if u.startswith("#") or not u.strip():
            continue
        out.append(u)
    return out


def _parse_url(url: str) -> tuple[str | None, str | None, str | None, str]:
    """tools/URLParser.parseURL replica: (protocol, host, port, path)."""
    slashslash = url.find("//")
    protocol = host = port = None
    if slashslash > 0:
        protocol = url[: slashslash - 1]
        nextslash = url.find("/", slashslash + 2)
        if nextslash >= 0:
            host = url[slashslash + 2 : nextslash]
            path = url[nextslash:]
        else:
            host = url[slashslash + 2 :]
            path = "/"
        colon = host.find(":")
        if colon > 0:
            port = host[colon + 1 :]
            host = host[:colon]
    else:
        path = url
    return protocol, host, port, path


def _normalize_path_rfc2396(path: str) -> str | None:
    """java.net.URI(path).normalize().getPath() for a plain path: collapse
    '.' and 'seg/..' but KEEP excess leading '..' segments."""
    if not path:
        return path
    segs = path.split("/")
    out: list[str] = []
    for s in segs:
        if s == ".":
            continue
        if s == ".." and out and out[-1] not in ("..", ""):
            out.pop()
            continue
        out.append(s)
    # preserve trailing-slash semantics of '.'/'..' enders
    if path.endswith(("/.", "/..")) and out and out[-1] != "":
        out.append("")
    norm = "/".join(out)
    if path.startswith("/") and not norm.startswith("/"):
        norm = "/" + norm
    return norm


def normalize_url(raw_url: str, base_url: str) -> str | None:
    """Replica of jobs/PageRank.normalizeUrl (returns None for dropped)."""
    try:
        base_proto, base_host, base_port, _ = _parse_url(base_url)
        raw_proto, raw_host, raw_port, path = _parse_url(raw_url)

        protocol, host, port = base_proto, base_host, base_port
        if raw_proto is None:
            if ":" in path.split("/")[0] and not path.startswith("/"):
                # scheme-like relative (mailto:, javascript:) — Java's
                # `new URL(base, raw)` throws unknown-protocol -> null
                scheme = path.split(":", 1)[0].lower()
                if scheme not in ("http", "https"):
                    return None
            if not path.startswith("/"):
                joined = urljoin(base_url, raw_url)
                p2 = _parse_url(joined)[3]
                path = p2
        else:
            protocol, host, port = raw_proto, raw_host, raw_port

        path = _normalize_path_rfc2396(path)
        if path is None:
            return None

        if protocol is None or protocol.lower() not in ("http", "https"):
            return None
        if _RE_IMG_EXT.match(path):
            return None
        if port is None or port == "":
            port = "80" if protocol.lower() == "http" else "443"
        int(port)  # NumberFormatException parity
        return f"{protocol}://{host}:{port}{path}"
    except (ValueError, AttributeError):
        return None


EDGES_SCHEMA = T.StructType(
    [
        T.StructField("src", T.LongType()),
        T.StructField("dst", T.LongType()),
    ]
)


def extract_edges(spark: SparkSession, pages: DataFrame) -> DataFrame:
    """pages(url, html) -> (src doc_id, dst doc_id) with dst resolved by the
    reference normalizer. Duplicate links are KEPT (reference semantics:
    they contribute multiple shares and count in outdeg)."""
    from .xxhash64 import spark_xxhash64_str

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            srcs: list[int] = []
            dsts: list[int] = []
            for url, html in zip(pdf["url"], pdf["html"]):
                page = bytes(html).decode("utf-8", errors="replace")
                src = spark_xxhash64_str(url)
                for raw in extract_hrefs(page):
                    norm = normalize_url(raw, url)
                    if norm is not None:
                        srcs.append(src)
                        dsts.append(spark_xxhash64_str(norm))
            yield pd.DataFrame(
                {
                    "src": pd.Series(srcs, dtype="int64"),
                    "dst": pd.Series(dsts, dtype="int64"),
                }
            )

    return pages.select("url", "html").mapInPandas(kernel, EDGES_SCHEMA)


def pagerank(
    spark: SparkSession,
    edges: DataFrame,
    docs: DataFrame,
    threshold: float = 1e-4,
    max_iter: int = 200,
) -> DataFrame:
    """(doc_id, rank) for every doc in ``docs`` (column doc_id)."""
    docs = docs.select("doc_id").distinct().cache()
    # keep only edges whose target is in the corpus (the reference's join
    # against the state table drops foreign targets) — src is by
    # construction in the corpus.
    edges = (
        edges.join(docs.withColumnRenamed("doc_id", "dst"), "dst")
        .select("src", "dst")
        .cache()
    )
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg")).cache()
    edges.count()

    ranks = docs.select("doc_id", F.lit(1.0).alias("rank"))
    for it in range(max_iter):
        contribs = (
            edges.join(ranks.withColumnRenamed("doc_id", "src"), "src")
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("doc_id"),
                (F.lit(0.85) * F.col("rank") / F.col("outdeg")).alias("c"),
            )
        )
        new_ranks = (
            docs.join(
                contribs.groupBy("doc_id").agg(F.sum("c").alias("in_sum")),
                "doc_id",
                "left",
            )
            .select(
                "doc_id",
                (F.coalesce(F.col("in_sum"), F.lit(0.0)) + F.lit(0.15)).alias(
                    "rank"
                ),
            )
        )
        # localCheckpoint cuts lineage AND materializes new_ranks, which is
        # consumed twice (delta check + next iteration's contribs).
        new_ranks = new_ranks.localCheckpoint()
        delta_df = (
            new_ranks.withColumnRenamed("rank", "new_rank")
            .join(ranks, "doc_id")
            .agg(F.max(F.abs(F.col("new_rank") - F.col("rank"))).alias("d"))
        )
        delta = delta_df.collect()[0]["d"]
        ranks = new_ranks
        if delta is not None and delta <= threshold:
            break
    return ranks


def build_pagerank_stage(
    spark: SparkSession,
    pages_path: str,
    root: str,
    build_id: str,
    threshold: float = 1e-4,
) -> None:
    from .indexer import ingest

    fp = checkpoint.fingerprint(stage="pagerank", pages=pages_path, threshold=threshold, v=1)

    def run(_pid: int) -> tuple[str, int, int]:
        pages = ingest(spark, pages_path)
        docs = pages.select(F.xxhash64("url").alias("doc_id"))
        edges = extract_edges(spark, pages)
        ranks = pagerank(spark, edges, docs, threshold=threshold)
        out = catalog.path(root, catalog.PAGERANKS)
        ranks.write.mode("overwrite").parquet(out)
        return out, spark.read.parquet(out).count(), 0

    checkpoint.run_partitioned_stage(root, build_id, "pagerank", [0], fp, run)
