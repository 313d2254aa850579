"""spark-submit entry point: verify index integrity.

    spark-submit --py-files searchengine_spark.zip \
        searchengine_spark/jobs/fsck.py --root /data/index [--no-lineage]

Prints one line per finding and exits non-zero if any ERROR-severity
finding exists (warnings — e.g. a pending merge — exit 0).
"""

from __future__ import annotations

import argparse
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--no-lineage", action="store_true",
                    help="skip the lineage-freshness check")
    args = ap.parse_args()

    from searchengine_spark.fsck import fsck
    from searchengine_spark.session import get_spark

    spark = get_spark("se-fsck")
    try:
        rows = fsck(spark, args.root, check_lineage=not args.no_lineage).collect()
        for r in rows:
            where = f"bucket={r['bucket']} term={r['term']} salt={r['salt']}"
            print(f"{r['severity'].upper():8s} {r['check']:14s} {where}  {r['detail']}")
        n_err = sum(1 for r in rows if r["severity"] == "error")
        print(f"fsck: {n_err} errors, {len(rows) - n_err} warnings")
        return 1 if n_err else 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
