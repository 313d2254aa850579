"""spark-submit entry point: fold streamed/appended token chunks into
the compressed posting segments (incremental compaction).

    spark-submit --py-files searchengine_spark.zip \
        searchengine_spark/jobs/merge_segments.py \
        --root /data/index [--pages /data/pages --build-id merge-1]

Only buckets holding new token files are rewritten; see merge.py for the
delta-manifest mechanics and the avgdl-drift bound correction that keeps
untouched buckets valid.
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--pages", default=None,
                    help="full corpus dir for an exact docstats refresh "
                         "(urls for streamed docs); omit to derive doc "
                         "lengths from the delta tokens")
    ap.add_argument("--build-id", default="merge-1")
    ap.add_argument("--tiered", action="store_true",
                    help="size-tiered trigger: merge only once the delta "
                         "is a fraction of the segment bytes (bounded "
                         "write amplification for periodic/cron runs)")
    ap.add_argument("--ratio", type=float, default=0.25,
                    help="delta/segment byte fraction that fires a "
                         "tiered merge (default 0.25 => ~4x write amp)")
    ap.add_argument("--min-delta-bytes", type=int, default=64 << 20)
    ap.add_argument("--max-delta-files", type=int, default=256)
    ap.add_argument("--vacuum", action="store_true",
                    help="after a clean merge, reclaim the token files "
                         "already folded into the segments (the index "
                         "keeps serving and absorbing new deltas; a "
                         "full REBUILD then needs a fresh root)")
    args = ap.parse_args()

    from searchengine_spark.merge import maybe_merge_tiered, merge_tokens_stage
    from searchengine_spark.session import get_spark

    spark = get_spark("se-merge-segments")
    try:
        if args.tiered:
            report = maybe_merge_tiered(
                spark, args.root, ratio=args.ratio,
                min_delta_bytes=args.min_delta_bytes,
                max_delta_files=args.max_delta_files,
                build_id=args.build_id, pages_path=args.pages,
            )
        else:
            report = merge_tokens_stage(
                spark, args.root, build_id=args.build_id,
                pages_path=args.pages,
            )
        print(report)
        if args.vacuum:
            from searchengine_spark.merge import vacuum_tokens

            print(vacuum_tokens(args.root, build_id=args.build_id))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
