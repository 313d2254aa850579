"""spark-submit entry point: HTTP search frontend over a built index.

    spark-submit --py-files searchengine_spark.zip \
        searchengine_spark/jobs/serve.py \
        --root /data/index --pages /data/pages [--host 0.0.0.0 --port 8080]

The rebuild of the reference's frontend process
(``frontend/Mainpage.java`` main + ``webserver/Server.java``): binds the
HTTP routes from :mod:`searchengine_spark.webserver` and serves until
interrupted. The reference binds port 80/443 (``Mainpage.java:24-25``);
default here is 8080 (unprivileged).
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--pages", required=True)
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument(
        "--build-docstore",
        action="store_true",
        help="build the forward index (doc_id-sorted url/title/snippet) "
        "before serving if absent — turns the per-request corpus scan "
        "into O(k) row-group point lookups",
    )
    args = ap.parse_args()

    from searchengine_spark import catalog
    from searchengine_spark.session import get_spark
    from searchengine_spark.webserver import make_server

    spark = get_spark("se-serve")
    if args.build_docstore and not catalog.exists(
        args.root, catalog.DOCSTORE
    ):
        from searchengine_spark.serving import build_docstore

        build_docstore(spark, args.root, args.pages)
        print("docstore built")
    server = make_server(spark, args.root, args.pages, args.host, args.port)
    host, port = server.server_address[:2]
    print(f"serving on http://{host}:{port}/  (Ctrl-C to stop)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
        spark.stop()


if __name__ == "__main__":
    main()
