"""spark-submit entry point: full resumable index build.

    spark-submit --py-files searchengine_spark.zip \
        searchengine_spark/jobs/build_index.py \
        --pages /data/pages --root /data/index \
        [--build-id b1 --chunks 8 --buckets 8 --with-pagerank]

Re-running after a kill resumes from the per-partition lineage
(checkpoint.py); completed chunks/bucket-groups are never recomputed.
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True)
    ap.add_argument("--root", required=True)
    ap.add_argument("--build-id", default="build-1")
    ap.add_argument("--chunks", type=int, default=None)
    ap.add_argument("--buckets", type=int, default=None)
    ap.add_argument("--with-pagerank", action="store_true")
    args = ap.parse_args()

    from searchengine_spark import catalog
    from searchengine_spark.indexer import build_index
    from searchengine_spark.session import get_spark

    spark = get_spark("se-build-index")
    try:
        build_index(
            spark,
            args.pages,
            args.root,
            build_id=args.build_id,
            n_chunks=args.chunks or catalog.N_CHUNKS,
            n_buckets=args.buckets or catalog.N_BUCKETS,
        )
        if args.with_pagerank:
            from searchengine_spark.pagerank import build_pagerank_stage

            build_pagerank_stage(spark, args.pages, args.root, args.build_id)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
