"""Solo-query serving floor profile (round-4 verdict #6).

BASELINE.md records solo p50 ~3.2 s at sf0.1 with ~2 s attributed to
"the scoring job" at any posting volume. This tool decomposes a single
``serving.search`` into its phases and times each across repeated
queries in a warmed session, so the floor's composition is measured,
not guessed:

  stats    read_stats + term_idfs (collect scalars)
  plan     _topk_df plan construction (no job)
  score    the scoring job (topk.collect())
  attach   docstore fetch + coverage probe + final collect

and prints per-phase medians plus the end-to-end solo p50. Run on an
idle host after bench.py has left its index on tmpfs:

    python tools/solo_serve_profile.py [index_root] [pages_path]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    root = sys.argv[1] if len(sys.argv) > 1 else "/dev/shm/se_bench/idx"
    pages = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "/dev/shm/se_bench/pages_200000.parquet"
    )
    from pyspark.sql import functions as F

    from searchengine_spark import corpus
    from searchengine_spark.indexer import read_stats
    from searchengine_spark.query import all_query_terms, term_idfs
    from searchengine_spark.serving import _attach_docs, _topk_df, search
    from searchengine_spark.session import get_spark

    spark = get_spark("solo-profile", master="local[32]",
                      shuffle_partitions=32)
    qs = corpus.reference_queries()
    # a spread of query shapes: short OR, AND, exclusion, head-term
    sample = [q for q in qs if q.get("mode", "OR") != "PHRASE"][:12]

    # warm: one full search (JIT, python workers, page cache)
    search(spark, root, pages, sample[0]["query"]).collect()

    phases: dict[str, list[float]] = {
        "stats": [], "plan": [], "score": [], "attach": [], "total": [],
    }
    for q in sample:
        req = {"query": q["query"], "mode": q.get("mode", "OR"), "k": 15,
               "offset": 0}
        t0 = time.perf_counter()
        n_docs, avgdl = read_stats(spark, root)
        idfs = term_idfs(
            spark, root, all_query_terms(
                [{"query_id": 0, "query": req["query"]}]
            ), n_docs,
        )
        t1 = time.perf_counter()
        topk = _topk_df(spark, root, [req]).filter(F.col("rank") > 0)
        t2 = time.perf_counter()
        rows = topk.collect()
        t3 = time.perf_counter()
        import pyspark.sql as pysql

        local = spark.createDataFrame(rows, schema=topk.schema) if rows \
            else topk.limit(0)
        _ = _attach_docs(spark, root, pages, local).collect()
        t4 = time.perf_counter()
        phases["stats"].append(t1 - t0)
        phases["plan"].append(t2 - t1)
        phases["score"].append(t3 - t2)
        phases["attach"].append(t4 - t3)
        phases["total"].append(t4 - t0)

    med = {k: round(statistics.median(v), 3) for k, v in phases.items()}
    p95 = {k: round(sorted(v)[int(0.95 * (len(v) - 1))], 3)
           for k, v in phases.items()}

    # end-to-end search() (includes its own stats/plan) for the honest
    # solo p50 the verdict tracks
    e2e = []
    for q in sample:
        t0 = time.perf_counter()
        search(spark, root, pages, q["query"],
               mode=q.get("mode", "OR")).collect()
        e2e.append(time.perf_counter() - t0)
    solo_p50 = round(statistics.median(e2e), 3)

    out = {
        "index_root": root,
        "n_queries": len(sample),
        "phase_median_s": med,
        "phase_p95_s": p95,
        "solo_search_p50_s": solo_p50,
        "solo_search_best_s": round(min(e2e), 3),
    }
    print(json.dumps(out, indent=1))
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "solo_serve_profile.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"written: {path}")
    spark.stop()


if __name__ == "__main__":
    main()
