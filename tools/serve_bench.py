"""HTTP serving-endpoint latency: per-request p50/p95 and concurrent
throughput over the bench index (200k pages).

The reference budgets 10 s connect / 3 s read for its frontend
(`Mainpage.java:150-151`) and serves from a 100-thread pool
(`webserver/Server.java:17`); this measures what our endpoint actually
delivers: the reference queries issued twice sequentially (first
pass warms the JVM; second pass is the quoted latency), then 4 and 12
concurrent client threads sharing the same query set — the load legs
that exercise the QueryBatcher's request coalescing (concurrent
requests ride one Spark job, the single-box proxy for a serving tier
that shares one cluster).

Run: python tools/serve_bench.py   (expects the bench index at
$SPARK_GRAFT_BENCH_TMP or /dev/shm/se_bench; build one with bench.py
first)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import threading
import time
import urllib.parse
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TMP = os.environ.get("SPARK_GRAFT_BENCH_TMP", "/dev/shm/se_bench")
CLIENT_COUNTS = (4, 12)


def main() -> None:
    root = os.path.join(TMP, "idx")
    pages = os.path.join(TMP, "pages_200000.parquet")
    if not os.path.isdir(root):
        raise SystemExit(f"no bench index at {root} — run bench.py first")

    from searchengine_spark import catalog, corpus
    from searchengine_spark.serving import build_docstore
    from searchengine_spark.session import get_spark
    from searchengine_spark.webserver import start_server

    spark = get_spark("serve-bench", master="local[32]")
    docstore_s = None
    if not catalog.exists(root, catalog.DOCSTORE):
        t0 = time.time()
        build_docstore(spark, root, pages)
        docstore_s = round(time.time() - t0, 2)
    server, _thread = start_server(spark, root, pages)
    port = server.server_address[1]
    base = f"http://127.0.0.1:{port}/search?"
    queries = [
        (q["query"], q.get("mode", "OR")) for q in corpus.reference_queries()
    ]

    def fetch(q: tuple[str, str]) -> float:
        t0 = time.time()
        qs = urllib.parse.urlencode(
            {"limit": 15, "query": q[0], "mode": q[1]}
        )
        with urllib.request.urlopen(base + qs, timeout=120) as r:
            r.read()
        return time.time() - t0

    for q in queries:  # warm pass (cold-JIT tax, untimed)
        fetch(q)

    lat = [fetch(q) for q in queries]
    lat_sorted = sorted(lat)
    p50 = lat_sorted[len(lat) // 2]
    p95 = lat_sorted[int(len(lat) * 0.95)]
    seq_wall = sum(lat)

    concurrent = {}
    for n_clients in CLIENT_COUNTS:
        results: list[list[float]] = [[] for _ in range(n_clients)]

        def client(i: int, results=results) -> None:
            for q in queries:
                results[i].append(fetch(q))

        t0 = time.time()
        threads = [
            threading.Thread(target=client, args=(i,))
            for i in range(n_clients)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        conc_wall = time.time() - t0
        conc_all = sorted(x for r in results for x in r)
        concurrent[str(n_clients)] = {
            "n": len(conc_all),
            "wall_s": round(conc_wall, 2),
            "qps": round(len(conc_all) / conc_wall, 2),
            "p50_ms": round(conc_all[len(conc_all) // 2] * 1000),
            "p95_ms": round(conc_all[int(len(conc_all) * 0.95)] * 1000),
        }
    print(json.dumps({
        "docstore_build_s": docstore_s,
        "sequential": {
            "n": len(lat), "wall_s": round(seq_wall, 2),
            "qps": round(len(lat) / seq_wall, 2),
            "p50_ms": round(p50 * 1000), "p95_ms": round(p95 * 1000),
            "mean_ms": round(statistics.mean(lat) * 1000),
        },
        "concurrent": concurrent,
    }))
    server.shutdown()
    spark.stop()


if __name__ == "__main__":
    main()
