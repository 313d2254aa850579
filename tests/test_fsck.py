"""fsck: a healthy index is clean; seeded corruptions are detected."""

import glob
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from searchengine_spark import catalog
from searchengine_spark.fsck import fsck


def test_healthy_index_is_clean(spark, tiny_index):
    rows = fsck(spark, tiny_index).collect()
    assert rows == [], [r.asDict() for r in rows]


@pytest.fixture()
def corruptible_index(tiny_index, tmp_path):
    root = str(tmp_path / "idx")
    shutil.copytree(tiny_index, root)
    return root


def _one_segment_file(root):
    files = sorted(glob.glob(os.path.join(
        catalog.path(root, catalog.POSTINGS), "group=*", "bucket=*", "*.parquet")))
    assert files
    return files[0]


def _rewrite(path, mutate):
    t = pq.read_table(path)
    pq.write_table(mutate(t), path)
    # drop Hadoop's checksum sidecar — the corruption should reach the
    # fsck logic, not be masked by the filesystem layer
    crc = os.path.join(os.path.dirname(path), f".{os.path.basename(path)}.crc")
    if os.path.exists(crc):
        os.remove(crc)


def test_detects_wrong_n_postings(spark, corruptible_index):
    def mutate(t):
        col = t["n_postings"].to_pylist()
        col[0] += 1
        return t.set_column(
            t.schema.get_field_index("n_postings"), "n_postings",
            pa.array(col, type=t.schema.field("n_postings").type))
    _rewrite(_one_segment_file(corruptible_index), mutate)
    checks = {r["check"] for r in fsck(spark, corruptible_index).collect()
              if r["severity"] == "error"}
    assert "n_postings" in checks


def test_detects_truncated_blob(spark, corruptible_index):
    def mutate(t):
        col = t["doc_blob"].to_pylist()
        col[0] = col[0][: max(len(col[0]) - 1, 0)]
        return t.set_column(
            t.schema.get_field_index("doc_blob"), "doc_blob",
            pa.array(col, type=pa.binary()))
    _rewrite(_one_segment_file(corruptible_index), mutate)
    checks = {r["check"] for r in fsck(spark, corruptible_index).collect()
              if r["severity"] == "error"}
    # a chopped varbyte stream either fails to decode or decodes to the
    # wrong count / wrong block boundaries
    assert checks & {"blob_decode", "n_postings", "block_last", "block_meta_len"}


def test_detects_dictionary_drift(spark, corruptible_index):
    dfile = sorted(glob.glob(os.path.join(
        catalog.path(corruptible_index, "dictionary"), "group=*", "*.parquet")))[0]
    def mutate(t):
        col = t["df"].to_pylist()
        col[0] += 5
        return t.set_column(
            t.schema.get_field_index("df"), "df",
            pa.array(col, type=t.schema.field("df").type))
    _rewrite(dfile, mutate)
    checks = {r["check"] for r in fsck(spark, corruptible_index).collect()
              if r["severity"] == "error"}
    assert "dictionary" in checks


def test_detects_stats_drift(spark, corruptible_index):
    sfile = sorted(glob.glob(os.path.join(
        catalog.path(corruptible_index, catalog.STATS), "*.parquet")))[0]
    def mutate(t):
        return t.set_column(
            t.schema.get_field_index("avgdl"), "avgdl",
            pa.array([v + 1.0 for v in t["avgdl"].to_pylist()], type=pa.float64()))
    _rewrite(sfile, mutate)
    checks = {r["check"] for r in fsck(spark, corruptible_index).collect()
              if r["severity"] == "error"}
    assert "stats" in checks


def test_detects_stale_lineage_after_token_append(spark, corruptible_index):
    # plant a new token file the postings manifest has never seen
    tokens_root = catalog.path(corruptible_index, catalog.TOKENS)
    src = sorted(glob.glob(os.path.join(
        tokens_root, "chunk=*", "bucket=*", "*.parquet")))[0]
    shutil.copy(src, os.path.join(os.path.dirname(src), "part-appended.parquet"))
    rows = fsck(spark, corruptible_index).collect()
    assert any(r["check"] == "lineage" and r["severity"] == "warning"
               for r in rows)
    # and it is a warning, not an error: exit code contract
    assert not any(r["severity"] == "error" for r in rows)


def test_serving_stores_checked(spark, corruptible_index, tiny_pages_path):
    """Docstore/anchor stores join the integrity sweep: clean when
    consistent; duplicated docstore doc_id and orphan rows are errors;
    docs missing from the store (post-ingest lag) is a warning naming
    refresh_docstore; duplicated anchor (doc_id, term) is an error."""
    from searchengine_spark.anchors import build_anchor_stage
    from searchengine_spark.serving import build_docstore

    root = corruptible_index
    build_docstore(spark, root, tiny_pages_path, n_files=2)
    build_anchor_stage(spark, tiny_pages_path, root, "fsck-anchor")
    assert fsck(spark, root).collect() == []

    ds = catalog.path(root, catalog.DOCSTORE)
    files = sorted(glob.glob(os.path.join(ds, "*.parquet")))
    assert files

    # duplicate one docstore row -> error
    t = pq.read_table(files[0])
    pq.write_table(pa.concat_tables([t, t.slice(0, 1)]), files[0])
    crc = os.path.join(ds, f".{os.path.basename(files[0])}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    found = [r["check"] for r in fsck(spark, root).collect()
             if r["severity"] == "error"]
    assert "docstore" in found

    # drop the duplicate but point the row at a foreign doc_id -> orphan
    t2 = t.set_column(
        t.schema.get_field_index("doc_id"), "doc_id",
        pa.array([-1] + t.column("doc_id").to_pylist()[1:], pa.int64()),
    )
    pq.write_table(t2, files[0])
    rows = fsck(spark, root).collect()
    assert any(
        r["check"] == "docstore" and r["severity"] == "error"
        and "absent from docstats" in r["detail"] for r in rows
    )
    # ...and the displaced real doc now reads as lagging -> warning
    assert any(
        r["check"] == "docstore" and r["severity"] == "warning"
        and "refresh_docstore" in r["detail"] for r in rows
    )

    # restore, then duplicate an anchor row -> error
    pq.write_table(t, files[0])
    ai = catalog.path(root, catalog.ANCHOR_INDEX)
    afiles = sorted(glob.glob(os.path.join(ai, "*.parquet")))
    assert afiles
    at = pq.read_table(afiles[0])
    pq.write_table(pa.concat_tables([at, at.slice(0, 1)]), afiles[0])
    acrc = os.path.join(ai, f".{os.path.basename(afiles[0])}.crc")
    if os.path.exists(acrc):
        os.remove(acrc)
    assert any(
        r["check"] == "anchor_index" and r["severity"] == "error"
        for r in fsck(spark, root).collect()
    )
