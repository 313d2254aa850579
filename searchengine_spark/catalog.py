"""Index/table layout on storage.

The reference persists everything as ``pt-*`` KVS tables (``kvs/Table.java:
33-45``); the rebuild uses an Iceberg-shaped layout that is plain
Parquet-in-directories in this sandbox (SURVEY.md §7.0 — no Iceberg jars
here; on a real cluster the same names become Iceberg identifiers and the
bucket directory becomes a bucket partition spec).

Layout under an index root:

    tokens/chunk=<c>/      staged tokenized corpus (resume unit: chunk)
    docstats/              (doc_id, url, doc_len) + corpus scalars in stats/
    stats/                 single-row (n_docs, avgdl)
    postings/bucket=<b>/   compressed posting segments (resume unit: bucket)
    title_index/           (term, doc_id) pairs from the title pipeline
    pageranks/             (doc_id, rank)
    _lineage/              per-partition completion records (checkpoint.py)
"""

from __future__ import annotations

import os

TOKENS = "tokens"
DOCSTATS = "docstats"
STATS = "stats"
POSTINGS = "postings"
TITLE_INDEX = "title_index"
PAGERANKS = "pageranks"
LINEAGE = "_lineage"

# Defaults sized for the sandbox; a 1000-executor build would raise
# N_BUCKETS to O(1024) and TARGET_POSTINGS stays the per-blob memory bound.
N_BUCKETS = 8
N_CHUNKS = 8
TARGET_POSTINGS = 1 << 17  # max postings per (term, salt) blob
BUCKET_GROUP_SIZE = 4  # buckets per postings job (resume unit = group)


def path(root: str, table: str) -> str:
    return os.path.join(root, table)


def exists(root: str, table: str) -> bool:
    return os.path.exists(path(root, table))


def parquet_rows_bytes(dir_path: str) -> tuple[int, int]:
    """(row_count, file_bytes) for a parquet directory tree, from file
    footers only — no Spark job, no data read. Used by the lineage
    records so a completed partition never pays a verification rescan."""
    from concurrent.futures import ThreadPoolExecutor

    import pyarrow.parquet as pq

    paths = [
        os.path.join(dp, f)
        for dp, _dirs, files in os.walk(dir_path)
        for f in files
    ]
    nbytes = sum(os.path.getsize(p) for p in paths)

    def _rows(p: str) -> int:
        return pq.ParquetFile(p).metadata.num_rows if p.endswith(".parquet") else 0

    if not paths:
        return 0, 0
    with ThreadPoolExecutor(max_workers=16) as pool:
        rows = sum(pool.map(_rows, paths))
    return rows, nbytes
