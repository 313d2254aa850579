"""Similarity search over the ``embeddings`` table (array<float>, 64-dim).

* q20 — brute-force cosine top-k: the correctness baseline. Queries are
  broadcast; candidates stream through a single projection+window. At
  100 TB this is one pass over the candidate set per query batch —
  embarrassingly parallel, no shuffle until the final per-query top-k.
* q21 — IVF-probed ANN: the scale path. A small deterministic centroid
  set is broadcast; every candidate is assigned to its nearest centroid
  (one map-side pass — this is the "index build"); each query probes
  only its IVF_NPROBE nearest centroid cells, so the scored candidate
  set shrinks by ~n_centroids/nprobe. Both stages are pure JVM
  expressions (zip_with/aggregate dot products in float64) — no Python.

Determinism: dots fold left-to-right in double; ties break vec_id ASC;
assignment ties break centroid_id ASC. Both entries carry full DuckDB
oracles (same fold order via list_reduce).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

N_QUERIES = 10        # vec_id < 10 are the query vectors
TOP_K = 10
IVF_CENTROID_MOD = 50  # vec_id % 50 == 0 -> centroid set (deterministic)
IVF_NPROBE = 3


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def load_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"), "label"
    )


def _with_norm(df: DataFrame) -> DataFrame:
    return df.withColumn("nrm", F.sqrt(_dot(F.col("v"), F.col("v"))))


def q20_ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _with_norm(load_emb(spark, sf_dir))
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    c = e.filter(F.col("vec_id") >= N_QUERIES).select(
        "vec_id", F.col("v").alias("cv"), F.col("nrm").alias("cn")
    )
    scored = c.crossJoin(F.broadcast(q)).withColumn(
        "cos", F.round(_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 9)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "vec_id", "cos")
        .orderBy("query_id", "rank")
    )


def q21_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _with_norm(load_emb(spark, sf_dir))
    cents = e.filter(F.pmod("vec_id", F.lit(IVF_CENTROID_MOD)) == 0).select(
        F.col("vec_id").alias("cent_id"), F.col("v").alias("centv"), F.col("nrm").alias("centn")
    )
    # assign every candidate to its nearest centroid (map-side: broadcast)
    cand = e.filter(F.col("vec_id") >= N_QUERIES).select(
        "vec_id", F.col("v").alias("cv"), F.col("nrm").alias("cn")
    )
    asgn_scored = cand.crossJoin(F.broadcast(cents)).withColumn(
        "sim", _dot(F.col("cv"), F.col("centv")) / (F.col("cn") * F.col("centn"))
    )
    wa = Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("cent_id"))
    assigned = (
        asgn_scored.withColumn("r", F.row_number().over(wa))
        .filter(F.col("r") == 1)
        .select("vec_id", "cv", "cn", "cent_id")
    )
    # probe: each query scores only its IVF_NPROBE nearest cells
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    probe_scored = q.crossJoin(F.broadcast(cents)).withColumn(
        "sim", _dot(F.col("qv"), F.col("centv")) / (F.col("qn") * F.col("centn"))
    )
    wp = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("cent_id"))
    probes = (
        probe_scored.withColumn("r", F.row_number().over(wp))
        .filter(F.col("r") <= IVF_NPROBE)
        .select("query_id", "qv", "qn", "cent_id")
    )
    scored = assigned.join(probes, "cent_id").withColumn(
        "cos", F.round(_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 9)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "vec_id", "cos")
        .orderBy("query_id", "rank")
    )


QUERIES = {
    "q20_ann_bruteforce": q20_ann_bruteforce,
    "q21_ann_ivf": q21_ann_ivf,
}

_EN = """
e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
en AS (
  SELECT vec_id, v,
         sqrt(list_reduce(list_prepend(0.0,
           list_transform(generate_series(1, len(v)), i -> v[i] * v[i])),
           (acc, x) -> acc + x)) AS nrm
  FROM e
)
"""

_DOT_AB = (
    "list_reduce(list_prepend(0.0, "
    "list_transform(generate_series(1, len({a})), i -> {a}[i] * {b}[i])), "
    "(acc, x) -> acc + x)"
)

ORACLE = {
    "q20_ann_bruteforce": f"""
WITH {_EN},
q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM en WHERE vec_id < {N_QUERIES}),
c AS (SELECT vec_id, v AS cv, nrm AS cn FROM en WHERE vec_id >= {N_QUERIES}),
scored AS (
  SELECT query_id, vec_id,
         round({_DOT_AB.format(a='qv', b='cv')} / (qn * cn), 9) AS cos
  FROM c CROSS JOIN q
)
SELECT query_id, rank, vec_id, cos
FROM (
  SELECT query_id, vec_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rank
  FROM scored
)
WHERE rank <= {TOP_K}
ORDER BY query_id, rank
""",
    "q21_ann_ivf": f"""
WITH {_EN},
cents AS (SELECT vec_id AS cent_id, v AS centv, nrm AS centn
          FROM en WHERE vec_id % {IVF_CENTROID_MOD} = 0),
cand AS (SELECT vec_id, v AS cv, nrm AS cn FROM en WHERE vec_id >= {N_QUERIES}),
asgn AS (
  SELECT vec_id, cv, cn, cent_id,
         row_number() OVER (PARTITION BY vec_id
           ORDER BY {_DOT_AB.format(a='cv', b='centv')} / (cn * centn) DESC,
                    cent_id ASC) AS r
  FROM cand CROSS JOIN cents
),
assigned AS (SELECT vec_id, cv, cn, cent_id FROM asgn WHERE r = 1),
q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM en WHERE vec_id < {N_QUERIES}),
pr AS (
  SELECT query_id, qv, qn, cent_id,
         row_number() OVER (PARTITION BY query_id
           ORDER BY {_DOT_AB.format(a='qv', b='centv')} / (qn * centn) DESC,
                    cent_id ASC) AS r
  FROM q CROSS JOIN cents
),
probes AS (SELECT query_id, qv, qn, cent_id FROM pr WHERE r <= {IVF_NPROBE}),
scored AS (
  SELECT query_id, vec_id,
         round({_DOT_AB.format(a='qv', b='cv')} / (qn * cn), 9) AS cos
  FROM assigned JOIN probes USING (cent_id)
)
SELECT query_id, rank, vec_id, cos
FROM (
  SELECT query_id, vec_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rank
  FROM scored
)
WHERE rank <= {TOP_K}
ORDER BY query_id, rank
""",
}
