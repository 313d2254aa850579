"""Decode-count profile of the WAND serving paths (round-4 verdict #5).

Question: at sf0.1 plain WAND (n_ranges=1, one task per query) barely
beats the exhaustive refset while range-parallel WAND (n_ranges=8)
halves it — is plain WAND's tail decode-bound (wall tracks blocks
decoded) or heap-bound (wall high while decodes stay low), and does
ranging add redundant decode work or purely split the critical path?

Method: run the SAME ``wand_topk`` kernel driver-side (no Spark task
overhead, no Arrow transfer) over the bench index's segment rows, once
per query at n_ranges=1 and once per (query, range) at R=8, reading the
``_LazyTermList.decoded_blocks`` counters the kernel already maintains.
Driver-side execution isolates the algorithm: the distributed plan adds
a fixed per-task cost on top, identical for both paths.

Usage: python tools/wand_profile.py [index_root]
Writes a human table to stdout and a JSON summary to
``wand_profile.json`` next to this file.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_RANGES = 8


def main() -> None:
    root = sys.argv[1] if len(sys.argv) > 1 else "/dev/shm/se_bench/idx"
    from searchengine_spark import corpus
    from searchengine_spark.indexer import read_stats
    from searchengine_spark.query import (
        all_query_terms,
        load_segments,
        parse_exclusions,
        parse_query,
        term_idfs,
    )
    from searchengine_spark.session import get_spark
    from searchengine_spark.wand import (
        _range_bounds,
        merge_salted,
        wand_topk,
    )

    queries = corpus.reference_queries()
    spark = get_spark("wand-profile", master="local[8]", shuffle_partitions=8)
    try:
        n_docs, avgdl = read_stats(spark, root)
        terms = all_query_terms(queries)
        idfs = term_idfs(spark, root, terms, n_docs)
        seg_rows = load_segments(spark, root, terms).toPandas()
    finally:
        spark.stop()
    by_term: dict[str, list[dict]] = {}
    for r in seg_rows.to_dict("records"):
        by_term.setdefault(r["term"], []).append(r)

    def run_query(qm: dict, lo_doc, hi_doc) -> tuple[float, int, int, int]:
        """One kernel invocation; returns (wall, decoded, total_blocks,
        postings_in_lists)."""
        tls = []
        present = sorted(set(qm["terms"]))
        for order, t in enumerate(present):
            if t in by_term:
                tls.append(
                    merge_salted(
                        by_term[t], idfs.get(t, 0.0), avgdl,
                        lo_doc=lo_doc, hi_doc=hi_doc, field_order=order,
                    )
                )
        deny = [
            merge_salted(by_term[t], 0.0, avgdl, lo_doc=lo_doc, hi_doc=hi_doc)
            for t in sorted(set(qm["exclude"]))
            if t in by_term
        ]
        if qm["mode"] == "AND" and any(
            t not in by_term for t in set(qm["terms"])
        ):
            tls = []
        t0 = time.perf_counter()
        wand_topk(tls, qm["k"], qm["mode"], excluded=deny)
        wall = time.perf_counter() - t0
        dec = sum(t.decoded_blocks for t in tls) + sum(
            d.decoded_blocks for d in deny
        )
        tot = sum(t.n_blocks for t in tls) + sum(d.n_blocks for d in deny)
        npost = sum(t.n_postings for t in tls)
        return wall, dec, tot, npost

    qmetas = []
    for q in queries:
        qmetas.append(
            {
                "query_id": int(q["query_id"]),
                "terms": parse_query(q["query"]),
                "exclude": parse_exclusions(q),
                "mode": q.get("mode", "OR"),
                "k": int(q.get("k", 15)),
                "text": q["query"],
            }
        )

    # warm one pass (numpy/BLAS JIT-ish costs, page cache)
    for qm in qmetas:
        run_query(qm, None, None)

    rows = []
    for qm in qmetas:
        w1, d1, tot, npost = run_query(qm, None, None)
        range_walls, range_decs = [], []
        for rng in range(N_RANGES):
            lo, hi = _range_bounds(rng, N_RANGES)
            wr, dr, _t, _p = run_query(qm, lo, hi)
            range_walls.append(wr)
            range_decs.append(dr)
        rows.append(
            {
                "query_id": qm["query_id"],
                "mode": qm["mode"],
                "n_terms": len(set(qm["terms"])),
                "postings": npost,
                "blocks_total": tot,
                "plain_wall_ms": round(w1 * 1e3, 1),
                "plain_decoded": d1,
                "ranged_wall_sum_ms": round(sum(range_walls) * 1e3, 1),
                "ranged_wall_max_ms": round(max(range_walls) * 1e3, 1),
                "ranged_decoded_sum": sum(range_decs),
                "ranged_decoded_max": max(range_decs),
            }
        )

    rows.sort(key=lambda r: -r["plain_wall_ms"])
    hdr = (
        "qid mode terms postings blocks plain_ms dec dec% "
        "rng_sum_ms rng_max_ms rng_dec_sum rng_dec_max"
    )
    print(hdr)
    for r in rows:
        pct = 100.0 * r["plain_decoded"] / max(1, r["blocks_total"])
        print(
            f"{r['query_id']:>3} {r['mode']:>3} {r['n_terms']:>5} "
            f"{r['postings']:>8} {r['blocks_total']:>6} "
            f"{r['plain_wall_ms']:>8.1f} {r['plain_decoded']:>4} "
            f"{pct:>4.0f} {r['ranged_wall_sum_ms']:>10.1f} "
            f"{r['ranged_wall_max_ms']:>10.1f} {r['ranged_decoded_sum']:>11} "
            f"{r['ranged_decoded_max']:>11}"
        )

    tot_plain = sum(r["plain_wall_ms"] for r in rows)
    tot_rsum = sum(r["ranged_wall_sum_ms"] for r in rows)
    crit_plain = max(r["plain_wall_ms"] for r in rows)
    # critical path with (query, range) tasks: the slowest single task
    crit_ranged = max(r["ranged_wall_max_ms"] for r in rows)
    dec_plain = sum(r["plain_decoded"] for r in rows)
    dec_ranged = sum(r["ranged_decoded_sum"] for r in rows)
    # decode-vs-heap attribution: correlation of plain wall with decoded
    # blocks across queries (crude but decisive if near 1 or near 0)
    import statistics

    walls = [r["plain_wall_ms"] for r in rows]
    decs = [float(r["plain_decoded"]) for r in rows]
    try:
        corr = statistics.correlation(walls, decs)
    except statistics.StatisticsError:
        corr = float("nan")
    summary = {
        "index_root": root,
        "n_queries": len(rows),
        "n_ranges": N_RANGES,
        "kernel_wall_plain_ms": round(tot_plain, 1),
        "kernel_wall_ranged_sum_ms": round(tot_rsum, 1),
        "slowest_task_plain_ms": round(crit_plain, 1),
        "slowest_task_ranged_ms": round(crit_ranged, 1),
        "decoded_blocks_plain": dec_plain,
        "decoded_blocks_ranged": dec_ranged,
        "decode_overhead_of_ranging": round(
            dec_ranged / max(1, dec_plain), 3
        ),
        "wall_vs_decoded_correlation": round(corr, 3),
        "top3_plain": [
            {k: r[k] for k in ("query_id", "plain_wall_ms", "plain_decoded",
                               "postings", "mode")}
            for r in rows[:3]
        ],
    }
    print(json.dumps(summary, indent=1))
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "wand_profile.json")
    with open(out, "w") as f:
        json.dump({"summary": summary, "per_query": rows}, f, indent=1)
    print(f"written: {out}")


if __name__ == "__main__":
    main()
