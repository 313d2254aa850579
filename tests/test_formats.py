"""JSON-lines / CSV / ORC connectors: explicit-schema round-trips must
equal the Parquet source exactly (values, types, timestamps)."""

import os

import pytest
from pyspark.sql import functions as F

from searchengine_spark import formats

FMTDIR = "/tmp/se_spark_fixtures/formats"
SF = "/root/testdata/sf0.001"


def _canon(df):
    cols = sorted(df.columns)
    return [tuple(r) for r in df.select(*cols).orderBy(*cols).collect()]


@pytest.mark.parametrize("fmt", ["jsonl", "csv", "orc"])
def test_roundtrip_equals_parquet(spark, fmt):
    src = spark.read.parquet(os.path.join(SF, "events.parquet"))
    path = os.path.join(FMTDIR, fmt)
    write = getattr(formats, f"write_{fmt}")
    read = getattr(formats, f"read_{fmt}")
    write(src, path)
    back = read(spark, path, src.schema)
    assert back.schema == src.schema
    assert _canon(back) == _canon(src)


def test_csv_quoted_text_roundtrip(spark):
    """Free text with commas, quotes, and newlines survives CSV."""
    df = spark.createDataFrame(
        [(1, 'a,b "quoted"\nnewline'), (2, ""), (3, None)],
        "id int, text string",
    )
    path = os.path.join(FMTDIR, "csv_text")
    formats.write_csv(df, path)
    back = formats.read_csv(spark, path, df.schema, multiline=True)
    got = {r["id"]: r["text"] for r in back.collect()}
    # CSV cannot distinguish empty string from NULL — both come back
    # NULL with Spark's writer defaults; document-and-assert that edge
    assert got[1] == 'a,b "quoted"\nnewline'
    assert got[2] is None and got[3] is None


def test_jsonl_is_splittable_source(spark):
    """A single JSONL file still produces a multi-split scan (no
    repartition needed to parallelize a big dump)."""
    src = spark.read.parquet(os.path.join(SF, "documents.parquet")).select(
        "doc_id", "text"
    )
    path = os.path.join(FMTDIR, "split")
    formats.write_jsonl(src.coalesce(1), path)
    back = formats.read_jsonl(spark, path, src.schema)
    # with the repo's 4m maxPartitionBytes the scan should split iff the
    # file exceeds one slice; at minimum the read plans without error
    # and counts match
    assert back.count() == src.count()


def test_pyfiles_zip_is_importable(tmp_path):
    """tools/package.py produces a zip that import-resolves the whole
    package from sys.path (the spark-submit --py-files contract)."""
    import subprocess
    import sys

    sys.path.insert(0, "/root/repo/tools")
    try:
        from package import build_zip
    finally:
        sys.path.pop(0)
    out = str(tmp_path / "searchengine_spark.zip")
    names = build_zip(out)
    assert "searchengine_spark/__init__.py" in names
    assert "searchengine_spark/jobs/build_index.py" in names
    assert not any("__pycache__" in n for n in names)
    # import from the zip alone in a fresh interpreter (cwd elsewhere so
    # the repo dir cannot shadow the zip)
    code = (
        "import sys; sys.path.insert(0, %r); "
        "import searchengine_spark.wand, searchengine_spark.fsck, "
        "searchengine_spark.pipelines.curation; print('ZIPOK')" % out
    )
    r = subprocess.run(
        [sys.executable, "-c", code], cwd=str(tmp_path),
        capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 0 and "ZIPOK" in r.stdout, r.stderr
