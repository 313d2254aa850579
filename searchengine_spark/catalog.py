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

import hashlib
import json
import os
import shutil
import uuid

TOKENS = "tokens"
DOCSTATS = "docstats"
STATS = "stats"
POSTINGS = "postings"
TITLE_INDEX = "title_index"
ANCHOR_INDEX = "anchor_index"  # optional inbound-anchor-text field
PAGERANKS = "pageranks"
DOCSTORE = "docstore"  # forward index for serving: doc_id-sorted (url, title, snippet)
LINEAGE = "_lineage"

# Defaults sized for the sandbox; a 1000-executor build would raise
# N_BUCKETS to O(1024) and TARGET_POSTINGS stays the per-blob memory bound.
N_BUCKETS = 8
N_CHUNKS = 8
TARGET_POSTINGS = 1 << 17  # max postings per (term, salt) blob
BUCKET_GROUP_SIZE = 4  # buckets per postings job (resume unit = group)


META = "_meta.json"

# bump when the on-disk segment format changes (columns, salting,
# compression); readers and cached test fixtures key off it
INDEX_FORMAT = 4


def path(root: str, table: str) -> str:
    return os.path.join(root, table)


def exists(root: str, table: str) -> bool:
    return os.path.exists(path(root, table))


# ---------------------------------------------------------------------------
# Filesystem access — every listdir/glob/rename in the engine goes through
# these, so porting to an object store (S3 listing + Iceberg commits) is a
# one-module change instead of a hunt through indexer/query/checkpoint.
# ---------------------------------------------------------------------------

def list_files(dir_path: str, suffix: str = "") -> list[str]:
    """Sorted absolute paths of the files directly under ``dir_path``."""
    if not os.path.isdir(dir_path):
        return []
    return sorted(
        os.path.join(dir_path, f)
        for f in os.listdir(dir_path)
        if f.endswith(suffix) and os.path.isfile(os.path.join(dir_path, f))
    )


def glob_dirs(pattern: str) -> list[str]:
    """Sorted directory paths matching a glob pattern."""
    import glob as _glob

    return sorted(p for p in _glob.glob(pattern) if os.path.isdir(p))


def tree_manifest(dir_path: str) -> list[tuple[str, int, int]]:
    """Sorted (relative_path, size, mtime_ns) of every data file under
    ``dir_path`` (recursive; skips hidden/_ bookkeeping files). The
    input-content identity of a table: any append/replace/delete changes
    it — mtime_ns is included so a same-size in-place rewrite is not
    invisible to the stage fingerprints. (merge.py's delta detection
    deliberately drops the mtime field — see its comment.)"""
    out: list[tuple[str, int, int]] = []
    if os.path.isfile(dir_path):
        st = os.stat(dir_path)
        return [(os.path.basename(dir_path), st.st_size, st.st_mtime_ns)]
    for dp, dirs, files in os.walk(dir_path):
        # prune hidden/bookkeeping DIRECTORIES too: Spark's job-commit
        # scratch (_temporary/) holds normally-named part files, so a
        # basename check alone would manifest a half-written batch —
        # and merge would fold it in, then flag it "vanished" after the
        # stream's replay rewrote the chunk
        dirs[:] = [d for d in dirs if not d.startswith((".", "_"))]
        for f in files:
            if f.startswith((".", "_")):
                continue
            p = os.path.join(dp, f)
            st = os.stat(p)
            out.append((os.path.relpath(p, dir_path), st.st_size, st.st_mtime_ns))
    return sorted(out)


def content_fingerprint(dir_path: str) -> str:
    """md5 of the tree manifest — folded into stage lineage fingerprints
    so resume never serves results computed from different input data."""
    m = hashlib.md5(json.dumps(tree_manifest(dir_path)).encode())
    return m.hexdigest()


def write_atomic(final_path: str, data: bytes) -> None:
    """Write-then-rename so concurrent/killed writers never expose a
    partial file (an Iceberg commit on a real catalog)."""
    os.makedirs(os.path.dirname(final_path), exist_ok=True)
    tmp = f"{final_path}.{uuid.uuid4().hex}.tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, final_path)


# ---------------------------------------------------------------------------
# Index metadata — build parameters persisted at build time so readers
# never re-derive them from directory shape (an empty term-hash bucket
# must not change the bucket count the query planner hashes against).
# ---------------------------------------------------------------------------

def write_meta(root: str, **updates: object) -> dict:
    meta = read_meta(root)
    meta.update(updates)
    write_atomic(os.path.join(root, META), json.dumps(meta, sort_keys=True).encode())
    return meta


def read_meta(root: str) -> dict:
    p = os.path.join(root, META)
    if not os.path.exists(p):
        return {}
    with open(p, "rb") as f:
        return json.loads(f.read())


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


def replace_dir(live: str, write_fn) -> None:
    """Write via ``write_fn(tmp_path)`` then swap into ``live`` with an
    atomic aside+rename pair: readers never observe a missing or
    half-written directory, and a crash between the two renames is
    repaired by ``restore_aside`` on the next run (plain
    mode('overwrite') to the live path had both failure modes)."""
    tmp, aside = live + ".swap-tmp", live + ".swap-old"
    shutil.rmtree(tmp, ignore_errors=True)
    write_fn(tmp)
    shutil.rmtree(aside, ignore_errors=True)
    if os.path.exists(live):
        os.replace(live, aside)
    os.replace(tmp, live)
    shutil.rmtree(aside, ignore_errors=True)


def restore_aside(live: str) -> None:
    """Undo a replace_dir crash window: live missing, aside present."""
    aside = live + ".swap-old"
    if not os.path.exists(live) and os.path.exists(aside):
        os.replace(aside, live)
