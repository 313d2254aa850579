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
    args = ap.parse_args()

    from searchengine_spark.merge import merge_tokens_stage
    from searchengine_spark.session import get_spark

    spark = get_spark("se-merge-segments")
    try:
        report = merge_tokens_stage(
            spark, args.root, build_id=args.build_id, pages_path=args.pages
        )
        print(report)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
