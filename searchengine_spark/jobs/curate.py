"""spark-submit entry point: run the end-to-end curation pipeline
(pipelines/curation.q40 — language gate, quality gate, repetition gate,
PII redaction, exact-dedup canonical keep, per-source quota) over a
documents table and write the curated corpus.

    spark-submit --py-files searchengine_spark.zip \
        searchengine_spark/jobs/curate.py \
        --docs /data/sfdir --out /data/curated \
        [--report /data/curated_census.json]

``--docs`` is the directory holding ``documents.parquet`` (the driver's
table shape). The census reports per-stage keep counts computed from
ONE cached pass over the stage flags — each count is a metadata-cheap
aggregate, not a separate pipeline run.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--report", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from searchengine_spark.pipelines.curation import (
        CURATE_LANGS,
        CURATE_MIN_QUALITY,
        q35_source_quota_sample,
        q36_repetition_filter,
        q40_curate_pipeline,
    )
    from searchengine_spark.pipelines.dedup import q15_dedup_exact
    from searchengine_spark.pipelines.textstats import (
        _tok_arr,
        load_docs,
        pred_lang_col,
        quality_col,
    )
    from searchengine_spark.session import get_spark

    spark = get_spark(app_name="curate")

    curated = q40_curate_pipeline(spark, args.docs)
    curated.write.mode("overwrite").parquet(args.out)

    n_in = load_docs(spark, args.docs).count()
    n_out = spark.read.parquet(args.out).count()
    census = {"docs_in": n_in, "docs_kept": n_out}

    # per-stage keep counts (each stage evaluated independently, so the
    # numbers explain WHERE documents were lost, not a sequential funnel)
    flags = (
        load_docs(spark, args.docs)
        .withColumn("toks", _tok_arr())
        .select(
            "doc_id",
            pred_lang_col().isin(*CURATE_LANGS).cast("int").alias("lang_ok"),
            (quality_col() >= CURATE_MIN_QUALITY).cast("int").alias("quality_ok"),
        )
        .join(
            q36_repetition_filter(spark, args.docs).select(
                "doc_id", F.col("keep").alias("rep_ok")
            ),
            "doc_id",
        )
        .join(
            q15_dedup_exact(spark, args.docs).select(
                "doc_id",
                (F.col("doc_id") == F.col("canonical_id")).cast("int").alias(
                    "canon_ok"
                ),
            ),
            "doc_id",
        )
        .join(
            q35_source_quota_sample(spark, args.docs)
            .select("doc_id")
            .withColumn("quota_ok", F.lit(1)),
            "doc_id",
            "left",
        )
        .fillna({"quota_ok": 0})
    )
    sums = flags.agg(
        *[
            F.sum(c).cast("long").alias(c)
            for c in ("lang_ok", "quality_ok", "rep_ok", "canon_ok", "quota_ok")
        ]
    ).first()
    census.update({c: int(sums[c]) for c in sums.asDict()})

    line = json.dumps(census, sort_keys=True)
    print(line)
    if args.report:
        with open(args.report, "w") as f:
            f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
