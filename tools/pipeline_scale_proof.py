"""10x scale datapoints for the heavy PIPELINE ops (VERDICT r3 item 4).

`tools/scale_proof.py` evidences the index build + serving at sf1; this
tool does the same for the five expensive pipeline operators whose
100 TB claims were previously plan-audited but bench-measured only at
sf0.1: q32 (banded SimHash), q38 (LSH dup clusters + connected
components), q83 (shingle containment), q87 (SemDeDup), q59 (HITS).

The driver fixture's 31-word vocabulary makes the near-dup families
pair-degenerate at sf0.1 (every doc collides with every doc — see the
q17 note in bench.py), so a 10x run of the FIXTURE would measure the
degeneracy, not the operator. Instead this tool synthesizes input
tables of exactly the driver shape (documents / embeddings / lineitem)
with a realistic ~5k-lemma Zipf vocabulary and LINEAR planted duplicate
structure (4% prefix-truncations, ~3% near-dup rewrites, clustered
embeddings with 5% near-dup vectors), generates them at a base scale
matched to sf0.1 row counts (5k docs / 2k vectors / 600k lineitem) and
at 10x, and times each op at both. Sub-quadratic = wall ratio well
under 100x; the linear-candidate designs should land near 10-30x.

Prints ONE JSON line; paste into BASELINE.md's scale-proof section.
Scratch on tmpfs like bench.py (virtio disk throttles 4-7x).
"""

from __future__ import annotations

import json
import os
import random
import shutil
import sys
import time

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TMP = os.environ.get("SPARK_GRAFT_BENCH_TMP", "/dev/shm/se_bench")
BASE_DOCS = int(os.environ.get("SCALE_PROOF_BASE_DOCS", "5000"))
FACTOR = 10
N_SOURCES = 20
EMB_DIM = 64
EMB_PER_DOC = (2, 5)  # 2 vectors per 5 docs, the sf0.1 ratio
LI_PER_DOC = 120  # 600k lineitem rows per 5k docs

OPS = [
    "q32_simhash_banded",
    "q38_dup_clusters",
    "q83_shingle_containment",
    "q87_semdedup",
    "q104_semdedup_twolevel",
    "q59_hits",
    # round-4 linear-claim dedup ops
    "q101_chunk_dedup",
    "q106_dup_span_extents",
    # round-4 closing additions (q119-q123)
    "q119_anchor_field",
    "q120_source_overlap_oph",
    "q121_bm25f",
    "q122_bfs_layers",
    "q123_leakage_safe_split",
    "q124_ann_recall_audit",
    "q125_curation_funnel",
    "q126_ann_ndcg_audit",
    "q127_stopword_discovery",
    "q128_embedding_drift",
    # round-5 heavy additions (iterative graph ops, pair joins)
    "q157_harmonic_centrality",
    "q162_bowtie",
    "q166_textrank_keywords",
    "q175_cdc_chunks",
    "q183_winnow_pairs",
    "q185_pagerank_delta",
    "q189_modularity",
]


def _doc_text(i: int, vocab: list[str]) -> str:
    """Deterministic word-soup text for doc i, with LINEAR planted dup
    structure: i % 25 == 1 -> prefix truncation of doc i-1; i % 37 == 2
    -> near-dup of doc i-1 with 3 word substitutions."""
    if i % 25 == 1 and i > 0:
        base = _base_text(i - 1, vocab).split()
        return " ".join(base[: max(8, (len(base) * 3) // 5)])
    if i % 37 == 2 and i > 0:
        rng = random.Random(f"sp:nd:{i}")
        w = _base_text(i - 1, vocab).split()
        for _ in range(3):
            w[rng.randrange(len(w))] = vocab[rng.randrange(len(vocab))]
        return " ".join(w)
    return _base_text(i, vocab)


def _base_text(i: int, vocab: list[str]) -> str:
    rng = random.Random(f"sp:doc:{i}")
    n_words = rng.randrange(30, 80)
    # Zipf-ish: squared-uniform index concentrates mass on the head
    return " ".join(
        vocab[int(rng.random() ** 2 * len(vocab))] for _ in range(n_words)
    )


def write_documents(path: str, n: int, vocab: list[str]) -> None:
    writer = pq.ParquetWriter(
        os.path.join(path, "part-0.parquet"),
        pa.schema(
            [
                pa.field("doc_id", pa.int64()),
                pa.field("text", pa.string()),
                pa.field("lang", pa.string()),
                pa.field("source", pa.string()),
                pa.field("n_chars", pa.int64()),
            ]
        ),
        compression="zstd",
    )
    try:
        for lo in range(0, n, 10_000):
            hi = min(lo + 10_000, n)
            texts = [_doc_text(i, vocab) for i in range(lo, hi)]
            writer.write_table(
                pa.table(
                    {
                        "doc_id": list(range(lo, hi)),
                        "text": texts,
                        "lang": ["en"] * (hi - lo),
                        "source": [f"src{i % N_SOURCES}" for i in range(lo, hi)],
                        "n_chars": [len(t) for t in texts],
                    }
                )
            )
    finally:
        writer.close()


def _vec(i: int, n: int) -> list[float]:
    """Clustered embedding: 32·(n/5000) true clusters, small noise; 5%
    of vectors are near-dups of their predecessor (the SemDeDup prey)."""
    if i % 20 == 3 and i > 0:
        rng = random.Random(f"sp:vnd:{i}")
        return [x + rng.uniform(-0.005, 0.005) for x in _vec(i - 1, n)]
    n_clusters = max(8, 32 * n // 2000)
    c = i % n_clusters
    crng = random.Random(f"sp:cent:{c}")
    center = [crng.uniform(-1, 1) for _ in range(EMB_DIM)]
    rng = random.Random(f"sp:vec:{i}")
    return [x + rng.uniform(-0.15, 0.15) for x in center]


def write_embeddings(path: str, n: int) -> None:
    rows = {
        "vec_id": list(range(n)),
        "embedding": [
            [float(f"{x:.6g}") for x in _vec(i, n)] for i in range(n)
        ],
        "label": [i % 32 for i in range(n)],
    }
    pq.write_table(
        pa.table(
            rows,
            schema=pa.schema(
                [
                    pa.field("vec_id", pa.int64()),
                    pa.field("embedding", pa.list_(pa.float32())),
                    pa.field("label", pa.int32()),
                ]
            ),
        ),
        os.path.join(path, "part-0.parquet"),
        compression="zstd",
    )


def write_lineitem(path: str, n_docs: int) -> None:
    """The columns the graph family reads (l_suppkey, l_partkey, and —
    since the round-5 co-purchase/sequence ops — l_orderkey with ~6
    lines per order and l_linenumber) — the explicit read schema
    null-fills the rest. Edge density matches sf0.1 (~120 rows/doc,
    supp fan-in ~ docs/2, part universe ~ 4x docs)."""
    n = n_docs * LI_PER_DOC
    supp_n = max(64, n_docs // 2)
    part_n = 4 * n_docs
    writer = pq.ParquetWriter(
        os.path.join(path, "part-0.parquet"),
        pa.schema(
            [
                pa.field("l_orderkey", pa.int64()),
                pa.field("l_linenumber", pa.int32()),
                pa.field("l_suppkey", pa.int64()),
                pa.field("l_partkey", pa.int64()),
            ]
        ),
        compression="zstd",
    )
    try:
        for lo in range(0, n, 500_000):
            hi = min(lo + 500_000, n)
            writer.write_table(
                pa.table(
                    {
                        "l_orderkey": [1 + i // 6 for i in range(lo, hi)],
                        "l_linenumber": pa.array([1 + i % 6 for i in range(lo, hi)], type=pa.int32()),
                        "l_suppkey": [1 + (i * 7919) % supp_n
                                      for i in range(lo, hi)],
                        "l_partkey": [1 + (i * 104729) % part_n
                                      for i in range(lo, hi)],
                    }
                )
            )
    finally:
        writer.close()


def gen_scale(n_docs: int) -> str:
    out = os.path.join(TMP, f"pipescale_{n_docs}")
    if os.path.exists(out + ".ok"):
        return out
    shutil.rmtree(out, ignore_errors=True)
    from searchengine_spark import corpus

    vocab = corpus._make_vocab()
    for sub in ("documents.parquet", "embeddings.parquet",
                "lineitem.parquet"):
        os.makedirs(os.path.join(out, sub), exist_ok=True)
    write_documents(os.path.join(out, "documents.parquet"), n_docs, vocab)
    write_embeddings(
        os.path.join(out, "embeddings.parquet"),
        n_docs * EMB_PER_DOC[0] // EMB_PER_DOC[1],
    )
    write_lineitem(os.path.join(out, "lineitem.parquet"), n_docs)
    open(out + ".ok", "w").write(str(n_docs))
    return out


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    os.makedirs(TMP, exist_ok=True)
    os.environ.setdefault("SPARK_GRAFT_LOCAL_DIR", os.path.join(TMP, "spark"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from searchengine_spark.pipelines import all_queries
    from searchengine_spark.session import get_spark

    # optional argv subset: time only the named ops (fresh additions)
    ops = [a for a in sys.argv[1:] if a.startswith("q")] or OPS

    t0 = time.time()
    dirs = {n: gen_scale(n) for n in (BASE_DOCS, BASE_DOCS * FACTOR)}
    gen_wall = round(time.time() - t0, 1)

    spark = get_spark("pipeline-scale-proof", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    registry = all_queries()
    out: dict = {
        "metric": "pipeline_scale_proof",
        "n_docs_base": BASE_DOCS,
        "factor": FACTOR,
        "gen_wall": gen_wall,
        "cpus": cpus,
        "ops": {},
    }
    try:
        # untimed warm-up at a tiny scale (JIT + python workers)
        import bench as _bench

        warm = gen_scale(500)
        for op in ops:
            _bench._consume(registry[op](spark, warm))
        for op in ops:
            legs = {}
            for n, d in dirs.items():
                t0 = time.time()
                # _consume, not count(): count() lets Catalyst prune
                # expensive columns out of the timed plan (q124 read
                # 2.1 s under count() vs 52 s consumed)
                rows = _bench._consume(registry[op](spark, d))
                legs[f"t_{n}"] = round(time.time() - t0, 2)
                legs[f"rows_{n}"] = rows
            legs["ratio"] = round(
                legs[f"t_{BASE_DOCS * FACTOR}"] / legs[f"t_{BASE_DOCS}"], 2
            )
            out["ops"][op] = legs
            print(f"# {op}: {legs}", file=sys.stderr)
    finally:
        spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
