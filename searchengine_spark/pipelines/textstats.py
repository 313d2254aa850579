"""Text-analysis operators for the training-data pipeline over
``documents``: language-ID (marker-word heuristic), quality scoring,
token counting, and rolling-hash document fingerprinting.

All four are single-pass, shuffle-free per-document projections (the
shape a 100 TB filter pass must have: map-only, predicate-pushdown
friendly, no Python). Each carries a full DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import _tables

# marker-word profiles for the n-gram/stopword language heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "row", "table"],
    "de": ["der", "die", "das", "und", "ein"],
    "es": ["el", "la", "de", "que", "los"],
    "fr": ["le", "la", "les", "des", "une"],
    "zh": ["de", "le", "shi", "zai", "he"],
}

STOPWORDS = ["the", "a", "of", "and", "to", "in"]

FP_MOD = 2_147_483_647
FP_BASE = 31


def load_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _tables.load(spark, sf_dir, "documents")


def _tok_arr() -> F.Column:
    return F.filter(F.split(F.col("text"), " "), lambda x: x != "")


# --------------------------------------------------------------------------
# q22: language-ID — score each doc against each language's marker list,
# argmax with lang-name tie-break. (The fixture text is synthetic word
# soup, so accuracy is moot — the operator shape is what matters.)
# --------------------------------------------------------------------------

def _lang_score_arr() -> F.Column:
    """array<struct<score,lang>> over a 'toks' column."""
    scores = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        marker_arr = F.array(*[F.lit(m) for m in markers])
        scores.append(
            F.struct(
                F.size(F.filter(F.col("toks"), lambda x: F.array_contains(marker_arr, x))).alias("score"),
                F.lit(lang).alias("lang"),
            )
        )
    return F.array(*scores)


def marker_hits_col() -> F.Column:
    return F.array_max(F.transform(_lang_score_arr(), lambda s: s["score"]))


def pred_lang_col() -> F.Column:
    """argmax language over a 'toks' column: max score; tie ->
    lexicographically SMALLEST lang (max picks largest (score, lang)
    struct, so filter to the maxima then take the min lang)."""
    arr = _lang_score_arr()
    best_score = F.array_max(F.transform(arr, lambda s: s["score"]))
    return F.array_min(
        F.transform(
            F.filter(arr, lambda s: s["score"] == best_score),
            lambda s: s["lang"],
        )
    )


def q22_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_docs(spark, sf_dir).withColumn("toks", _tok_arr())
    return docs.select(
        "doc_id",
        pred_lang_col().alias("pred_lang"),
        marker_hits_col().cast("int").alias("marker_hits"),
        "lang",
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# q117: lang-ID confusion matrix — the evaluation every classifier in
# the pipeline owes its dataset card: q22's predicted language crossed
# against the table's ground-truth ``lang`` column, rolled up to
# (true, predicted) counts with per-true-language recall. The matrix
# is what decides whether the cheap n-gram heuristic is good enough or
# the corpus needs a real model — and which language pairs confuse.
#
# Scale shape: q22's map-only argmax expressions + ONE hash agg to
# |langs|² rows; recall divides exact bigints off a per-true-lang
# window over that tiny matrix.
# --------------------------------------------------------------------------


def q117_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_docs(spark, sf_dir).withColumn("toks", _tok_arr())
    cells = (
        docs.select(
            F.col("lang").alias("true_lang"),
            pred_lang_col().alias("pred_lang"),
        )
        .groupBy("true_lang", "pred_lang")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )
    w = Window.partitionBy("true_lang")
    return (
        cells.withColumn("n_true", F.sum("n_docs").over(w))
        .select(
            "true_lang",
            "pred_lang",
            "n_docs",
            (F.col("true_lang") == F.col("pred_lang")).cast("int").alias(
                "correct"
            ),
            F.round(F.col("n_docs") / F.col("n_true"), 9).alias(
                "share_of_true"
            ),
        )
        .orderBy("true_lang", "pred_lang")
    )


# --------------------------------------------------------------------------
# q23: quality scoring — length / punctuation ratio / stopword ratio /
# mean token length, blended to one score.
# --------------------------------------------------------------------------

def _quality_parts() -> tuple[F.Column, F.Column, F.Column, F.Column]:
    """(n_toks, punct_ratio, stop_ratio, mean_tok_len) over 'text'+'toks'."""
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_chars = F.length("text")
    n_toks = F.size("toks")
    n_alnum = F.length(F.regexp_replace(F.col("text"), "[^a-z0-9]", ""))
    n_stop = F.size(F.filter(F.col("toks"), lambda x: F.array_contains(stop_arr, x)))
    mean_tok_len = F.aggregate(
        F.transform(F.col("toks"), lambda x: F.length(x).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    ) / n_toks
    punct_ratio = (n_chars - n_alnum) / n_chars
    stop_ratio = n_stop / n_toks
    return n_toks, punct_ratio, stop_ratio, mean_tok_len


def quality_col() -> F.Column:
    n_toks, punct_ratio, stop_ratio, mean_tok_len = _quality_parts()
    return F.round(
        F.lit(0.4) * F.least(n_toks / F.lit(100.0), F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio)
        + F.lit(0.2) * stop_ratio
        + F.lit(0.1) * F.least(mean_tok_len / F.lit(8.0), F.lit(1.0)),
        9,
    )


def q23_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_docs(spark, sf_dir).withColumn("toks", _tok_arr())
    n_toks, punct_ratio, stop_ratio, mean_tok_len = _quality_parts()
    quality = quality_col()
    return docs.select(
        "doc_id",
        n_toks.cast("int").alias("n_tokens"),
        F.round(punct_ratio, 9).alias("punct_ratio"),
        F.round(stop_ratio, 9).alias("stop_ratio"),
        F.round(mean_tok_len, 9).alias("mean_tok_len"),
        quality.alias("quality"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# q24: token counting — whitespace tokens + a BPE-ish alnum-run count.
# --------------------------------------------------------------------------

def q24_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_docs(spark, sf_dir).withColumn("toks", _tok_arr())
    return docs.select(
        "doc_id",
        F.size("toks").cast("int").alias("n_ws_tokens"),
        F.size(F.array_distinct("toks")).cast("int").alias("n_distinct"),
        F.size(
            F.filter(
                F.split(F.regexp_replace(F.col("text"), "[^a-z0-9]+", " "), " "),
                lambda x: x != "",
            )
        ).cast("int").alias("n_alnum_runs"),
        F.length("text").cast("int").alias("n_chars"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# q25: document fingerprint — order-sensitive rolling polynomial hash
# over the portable per-token hash (acc*31 + h mod 2^31-1).
# --------------------------------------------------------------------------

def q25_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_docs(spark, sf_dir).withColumn("toks", _tok_arr())
    th = F.transform(
        F.col("toks"),
        lambda x: F.conv(F.substring(F.md5(x), 1, 15), 16, 10).cast("long")
        % F.lit(FP_MOD),
    )
    fp = F.aggregate(
        th,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * FP_BASE + x) % F.lit(FP_MOD),
    )
    return docs.select("doc_id", fp.alias("fingerprint")).orderBy("doc_id")


# --------------------------------------------------------------------------
# q39: per-source token-length quantiles (p50/p90/p99) — the sequence-
# length budgeting stats a training pipeline reads before picking pack/
# truncate lengths. Exact, via distributed rank selection: window
# row_number per source (one hash-partitioned sort, no per-group value
# collection) + linear interpolation at pos = q*(n-1), the same formula
# percentile()/quantile_cont() use — but spelled out identically on both
# engines (`v_lo + (pos - lo) * (v_hi - v_lo)`, round 9dp) so the hash
# can't drift on engine-internal fold order. At 100 TB the same plan
# holds (sort within source partitions scales with executors); the
# sketch alternative (percentile_approx / t-digest) is the map-side-
# combinable fallback when even one sort is too much — exactness is the
# point here.
# --------------------------------------------------------------------------

LENGTH_QUANTILES = (0.5, 0.9, 0.99)


def q39_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_docs(spark, sf_dir).select(
        "source",
        "doc_id",
        F.size(_tok_arr()).cast("double").alias("cnt"),
    )
    w = Window.partitionBy("source").orderBy("cnt", "doc_id")
    ranked = docs.withColumn("r", F.row_number().over(w) - 1).select(
        "source", "cnt", "r"
    )
    n = docs.groupBy("source").agg(F.count("*").alias("n"))
    qs = spark.createDataFrame(
        [(q,) for q in LENGTH_QUANTILES], "q double"
    )
    pos = (
        n.crossJoin(F.broadcast(qs))
        .withColumn("pos", F.col("q") * (F.col("n") - 1))
        .withColumn("lo", F.floor("pos").cast("long"))
        .withColumn("hi", F.ceil("pos").cast("long"))
    )
    rl = ranked.select("source", F.col("r").alias("lo"), F.col("cnt").alias("vlo"))
    rh = ranked.select("source", F.col("r").alias("hi"), F.col("cnt").alias("vhi"))
    vals = (
        pos.join(rl, ["source", "lo"])
        .join(rh, ["source", "hi"])
        .withColumn(
            "val",
            F.col("vlo")
            + (F.col("pos") - F.col("lo")) * (F.col("vhi") - F.col("vlo")),
        )
    )
    aggs = [
        F.round(
            F.max(F.when(F.col("q") == F.lit(q), F.col("val"))), 9
        ).alias(f"p{int(q * 100)}")
        for q in LENGTH_QUANTILES
    ]
    return vals.groupBy("source").agg(*aggs).orderBy("source")


# --------------------------------------------------------------------------
# q46: unigram-LM perplexity filter — the CCNet-style quality gate a
# web-corpus pipeline runs before training: fit a smoothed unigram model
# on the corpus, score every document's cross-entropy against it, keep
# the low-perplexity tail. Two aggregations end-to-end:
#   train:  explode -> groupBy(tok).count (map-side partial combine; the
#           model is |vocab| rows — MBs even at 100 TB corpus scale);
#           N/V scalars ride along as a 1-row broadcast, never collect()ed.
#   score:  per-doc term frequencies shuffle once on doc_id; the model
#           join is broadcast at fixture scale and AQE-decided at 100 TB
#           (vocab ≪ corpus either way).
# Order-insensitivity: Σ log2 p over a doc's unordered token stream is
# summed as exact DECIMAL(28,12) partials of the 12dp-rounded log —
# identical at any parallelism/fold order (decimal sums carry no
# float-multiply scale quirks either engine could disagree on) — and
# divided once at the end (the CLAUDE.md float-reduction idiom).
# --------------------------------------------------------------------------

PPL_MAX = 800.0  # keep threshold for the filter verdict column


def q46_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = (
        load_docs(spark, sf_dir)
        .select("doc_id", F.explode(_tok_arr()).alias("tok"))
    )
    model = toks.groupBy("tok").agg(F.count("*").alias("c"))
    tot = model.agg(
        F.sum("c").cast("long").alias("n_total"),
        F.count("*").cast("long").alias("v_vocab"),
    )
    logp = F.round(
        F.log2((F.col("c") + 1) / (F.col("n_total") + F.col("v_vocab")).cast("double")),
        12,
    ).cast("decimal(28,12)")
    sc = (
        toks.join(F.broadcast(model), "tok")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.sum(logp).alias("lsum"),
            F.count("*").cast("long").alias("n_toks"),
        )
    )
    h = -(F.col("lsum").cast("double") / F.col("n_toks"))
    ppl = F.pow(F.lit(2.0), h)
    return sc.select(
        "doc_id",
        F.col("n_toks").cast("int").alias("n_toks"),
        F.round(h, 9).alias("cross_entropy"),
        F.round(ppl, 9).alias("perplexity"),
        (ppl < F.lit(PPL_MAX)).alias("kept"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# q47: count-min-sketch heavy hitters — the frequency twin of q44's HLL:
# a D×W counter grid whose merge is elementwise SUM (commutative,
# associative), so per-partition / per-micro-batch partial sketches fold
# to exactly the global sketch at any parallelism (streaming/sketch.py
# reuses cms_sketch for the incremental twin). estimate(tok) =
# min over D rows of grid[row][h_row(tok)] — always >= the true count
# (only collisions inflate), which the `overcount` column exhibits
# against the exact counts. The sketch is D·W rows (4 KiB of counters)
# regardless of corpus size; the exact-count side here is the small-scale
# verifier, vocab-sized, not corpus-sized.
# --------------------------------------------------------------------------

CMS_D = 4      # hash rows
CMS_W = 1024   # buckets per row
HH_K = 20      # heavy hitters reported


def _cms_bucket(tok: F.Column, i: int) -> F.Column:
    """Row-``i`` bucket for a token: portable 60-bit md5 hash of the
    salted token, mod W (identical expression in the DuckDB oracle)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{i}:"), tok)), 1, 15), 16, 10
    ).cast("long")
    return h % F.lit(CMS_W)


def _cms_probe(tok: F.Column) -> F.Column:
    """array<struct<row,bucket>> of the D probe cells for a token."""
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("row"), _cms_bucket(tok, i).alias("bucket")
            )
            for i in range(CMS_D)
        ]
    )


def cms_sketch(toks: DataFrame) -> DataFrame:
    """Count-min grid (row, bucket, cnt) over a ``tok`` column — one
    explode + one partial-combined groupBy; merges with sibling grids by
    (row, bucket) SUM."""
    return (
        toks.select(F.explode(_cms_probe(F.col("tok"))).alias("rb"))
        .groupBy(
            F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket")
        )
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def q47_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = load_docs(spark, sf_dir).select(F.explode(_tok_arr()).alias("tok"))
    sketch = cms_sketch(toks)
    exact = toks.groupBy("tok").agg(F.count("*").cast("long").alias("exact_cnt"))
    top = exact.orderBy(F.desc("exact_cnt"), "tok").limit(HH_K)
    probes = top.select(
        "tok", "exact_cnt", F.explode(_cms_probe(F.col("tok"))).alias("rb")
    ).select("tok", "exact_cnt", "rb.row", "rb.bucket")
    est = (
        probes.join(F.broadcast(sketch), ["row", "bucket"])
        .groupBy("tok", "exact_cnt")
        .agg(F.min("cnt").alias("cms_estimate"))
    )
    return est.select(
        "tok",
        "exact_cnt",
        "cms_estimate",
        (F.col("cms_estimate") - F.col("exact_cnt")).alias("overcount"),
    ).orderBy(F.desc("exact_cnt"), "tok")


# --------------------------------------------------------------------------
# q52: histogram quantile sketch — the mergeable scale path q39's own
# docstring promises as the fallback when even one per-source sort is
# too much: a fixed-width histogram (source, bin, n) built with ONE
# map-side-combinable groupBy (merges across partitions/streams by SUM,
# like q44/q47's sketches), then p50/p90/p99 estimated by uniform
# interpolation inside the covering bin. The histogram is |sources|×
# |bins| rows — KBs at any corpus size — so the quantile finish runs on
# a broadcast-scale relation. Deterministic end-to-end: integer bins,
# integer cumulative ranks, one double division — the DuckDB oracle
# reproduces the estimate (not just the histogram) bit-for-bit.
# Accuracy vs the exact q39 is bounded by the bin width (±Q52_BIN_W),
# asserted in pytest.
# --------------------------------------------------------------------------

Q52_BIN_W = 25  # tokens per histogram bin


def q52_hist_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_docs(spark, sf_dir).select(
        "source",
        F.expr(
            f"CAST(size(filter(split(text, ' '), x -> x != '')) div {Q52_BIN_W} AS BIGINT)"
        ).alias("bin"),
    )
    hist = docs.groupBy("source", "bin").agg(
        F.count("*").cast("long").alias("n")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = hist.withColumn(
        "cum_excl", F.coalesce(F.sum("n").over(w), F.lit(0))
    ).withColumn(
        "n_total", F.sum("n").over(Window.partitionBy("source"))
    )
    qs = spark.createDataFrame([(q,) for q in LENGTH_QUANTILES], "q double")
    # 0-based target rank r = floor(q*(N-1)); covering bin has
    # cum_excl <= r < cum_excl + n; uniform interpolation inside it
    tagged = (
        cum.crossJoin(F.broadcast(qs))
        .withColumn(
            "r", F.floor(F.col("q") * (F.col("n_total") - 1)).cast("long")
        )
        .filter(
            (F.col("cum_excl") <= F.col("r"))
            & (F.col("r") < F.col("cum_excl") + F.col("n"))
        )
        .withColumn(
            "est",
            F.round(
                F.col("bin") * F.lit(Q52_BIN_W)
                + F.lit(float(Q52_BIN_W))
                * (F.col("r") - F.col("cum_excl"))
                / F.col("n").cast("double"),
                9,
            ),
        )
    )
    aggs = [
        F.max(F.when(F.col("q") == F.lit(q), F.col("est"))).alias(
            f"p{int(q * 100)}"
        )
        for q in LENGTH_QUANTILES
    ]
    return tagged.groupBy("source").agg(*aggs).orderBy("source")


# --------------------------------------------------------------------------
# q60: PMI collocation mining — adjacent-bigram pointwise mutual
# information over the corpus, the classic phrase/tokenizer-merge signal.
# Bigram formation happens INSIDE each doc as one JVM array expression
# (no shuffle, no per-position row duplication until the single
# explode); counting is two map-side-combinable hash aggregations
# (unigram + bigram); the marginals attach via vocab-keyed equi-joins —
# NOT broadcast, a web-scale vocab is itself large — and the two 1-row
# corpus totals ride a broadcast crossJoin. Top-N by PMI is
# TakeOrderedAndProject (per-partition heap, never a global sort). PMI
# is ONE ln over a fixed-shape double ratio rounded 9dp, bit-portable
# vs the oracle.
# --------------------------------------------------------------------------

PMI_MIN_COUNT = 5
PMI_TOP_N = 100


def pmi_collocations(docs: DataFrame) -> DataFrame:
    """(w1, w2, c_ab, pmi) top collocations from a 'text' column;
    pmi = ln(p(w1,w2) / (p(w1)·p(w2))) with adjacent-pair cooccurrence."""
    base = docs.select(_tok_arr().alias("toks")).withColumn(
        "n", F.size("toks")
    )
    uni = (
        base.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    totals = base.agg(
        F.sum("n").cast("double").alias("t_uni"),
        F.sum(F.greatest(F.col("n") - 1, F.lit(0))).cast("double").alias("t_bi"),
    )
    pair_arr = F.when(
        F.col("n") >= 2,
        F.transform(
            F.sequence(F.lit(0), F.col("n") - 2),
            lambda i: F.struct(
                F.get("toks", i).alias("w1"), F.get("toks", i + 1).alias("w2")
            ),
        ),
    ).otherwise(F.expr("array()").cast("array<struct<w1:string,w2:string>>"))
    bi = (
        base.select(F.explode(pair_arr).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c_ab"))
        .filter(F.col("c_ab") >= PMI_MIN_COUNT)
    )
    return (
        bi.join(uni.select(F.col("w").alias("w1"), F.col("c").alias("c_a")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c").alias("c_b")), "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "w1",
            "w2",
            F.col("c_ab").cast("long").alias("c_ab"),
            F.round(
                F.log(
                    (F.col("c_ab").cast("double") * F.col("t_uni") * F.col("t_uni"))
                    / (F.col("t_bi") * F.col("c_a") * F.col("c_b"))
                ),
                9,
            ).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(PMI_TOP_N)
    )


def q60_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pmi_collocations(load_docs(spark, sf_dir))


# --------------------------------------------------------------------------
# q70: n-gram LM count table — trigram conditional log-probabilities with
# add-k smoothing, the count artifact an LM-training/quality pipeline
# materializes from a corpus. Same shuffle discipline as q60: n-grams
# form INSIDE each doc as one JVM array expression; counting is two
# map-side-combinable hash aggs (trigram + bigram-context); the context
# counts attach via a vocab-keyed equi-join (never broadcast — a web
# vocab is itself large); the 1-row vocab size rides a broadcast
# crossJoin; top-N is TakeOrderedAndProject. logp is ONE ln over a
# fixed-shape double ratio of exact int counts, bit-portable.
# --------------------------------------------------------------------------

LM_MIN_COUNT = 3
LM_TOP_N = 100
LM_K = 0.5  # add-k smoothing constant


def ngram_lm_counts(docs: DataFrame) -> DataFrame:
    """(w1, w2, w3, c3, logp) for the corpus' top trigrams;
    logp = ln((c3 + k) / (c2 + k*V)) — add-k smoothed P(w3 | w1 w2)."""
    base = docs.select(_tok_arr().alias("toks")).withColumn(
        "n", F.size("toks")
    )

    def grams(width: int, names: list[str]) -> F.Column:
        empty = "array<struct<%s>>" % ",".join(f"{c}:string" for c in names)
        return F.when(
            F.col("n") >= width,
            F.transform(
                F.sequence(F.lit(0), F.col("n") - width),
                lambda i: F.struct(
                    *[
                        F.get("toks", i + j).alias(names[j])
                        for j in range(width)
                    ]
                ),
            ),
        ).otherwise(F.expr("array()").cast(empty))

    tri = (
        base.select(F.explode(grams(3, ["w1", "w2", "w3"])).alias("g"))
        .select("g.w1", "g.w2", "g.w3")
        .groupBy("w1", "w2", "w3")
        .agg(F.count("*").alias("c3"))
        .filter(F.col("c3") >= LM_MIN_COUNT)
    )
    ctx = (
        base.select(F.explode(grams(2, ["w1", "w2"])).alias("g"))
        .select("g.w1", "g.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c2"))
    )
    vocab = base.select(F.explode("toks").alias("w")).agg(
        F.countDistinct("w").cast("double").alias("v")
    )
    return (
        tri.join(ctx, ["w1", "w2"])
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            "w3",
            F.col("c3").cast("long").alias("c3"),
            F.round(
                F.log(
                    (F.col("c3").cast("double") + F.lit(LM_K))
                    / (F.col("c2").cast("double") + F.lit(LM_K) * F.col("v"))
                ),
                9,
            ).alias("logp"),
        )
        .orderBy(F.col("c3").desc(), "w1", "w2", "w3")
        .limit(LM_TOP_N)
    )


def q70_ngram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_lm_counts(load_docs(spark, sf_dir))


# --------------------------------------------------------------------------
# q88: per-source quality rollup + blocklist flag — the host/feed-level
# curation decision a training pipeline makes AFTER q23's per-doc
# scores: a source whose share of low-quality docs crosses a threshold
# is dropped wholesale (doc-level filters miss systematically bad feeds
# whose individual docs hover near the cutoff). Scale shape: one
# map-only quality pass (q23's expressions, no shuffle) then one hash
# agg keyed by source — output is |sources| rows.
#
# Determinism: avg_quality sums the 9dp-rounded per-doc quality (bit-
# identical cross-engine via the q23 gate) in DECIMAL(28,12) so the
# partial/final aggregation order cannot move a bit, casts to double
# once (Spark decimal→double = BigDecimal.doubleValue; DuckDB routed
# via VARCHAR = strtod, same correctly-rounded result past 2^53
# unscaled), divides once. The blocklist compare is pure-integer
# (n_low * 100 >= LOWQ_PCT * n_docs).
# --------------------------------------------------------------------------

LOWQ_T = 0.5      # a doc below this quality counts as low-quality
LOWQ_PCT = 45     # flag the source when >= 45% of its docs are low


def doc_quality(docs: DataFrame) -> DataFrame:
    """(doc_id, quality) over a raw documents DF — q23's score only."""
    return docs.withColumn("toks", _tok_arr()).select(
        "doc_id", quality_col().alias("quality")
    )


def q88_source_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_docs(spark, sf_dir).withColumn("toks", _tok_arr())
    per_doc = docs.select("source", quality_col().alias("quality"))
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("quality").cast("decimal(28,12)")).alias("qsum"),
            F.sum(
                (F.col("quality") < F.lit(LOWQ_T)).cast("long")
            ).alias("n_low"),
        )
        .select(
            "source",
            "n_docs",
            F.round(
                F.col("qsum").cast("double") / F.col("n_docs"), 9
            ).alias("avg_quality"),
            "n_low",
            (F.col("n_low").cast("double") / F.col("n_docs")).alias(
                "low_share"
            ),
            (F.col("n_low") * 100 >= F.lit(LOWQ_PCT) * F.col("n_docs"))
            .cast("int")
            .alias("blocked"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# q129: Wilson-lower-bound source ranking — the statistically sound
# version of q88's mean-based source score. A source with 3/3 docs
# passing the quality gate must NOT outrank one with 940/1000: ranking
# by the Wilson score interval's lower bound (Wilson 1927; the
# standard fix, e.g. Reddit's comment ranking) discounts small samples
# by exactly their binomial uncertainty. This is the ordering a
# curation pipeline uses to allocate token budget across thousands of
# long-tail sources where per-source doc counts span six orders of
# magnitude.
#
# Scale shape: q23's map-only quality expressions + ONE hash agg keyed
# by source (integer count/sum partials, map-side combinable) →
# |sources| rows; the Wilson expression and the rank window run on
# that tiny table.
#
# Cross-engine float discipline: the bound is ONE IEEE expression over
# exact-integer inputs (n_pass, n_docs), written with the identical
# operation tree on both engines — every intermediate is then
# bit-identical (sqrt is IEEE-correctly-rounded everywhere), so the
# output needs NO rounding and the rank compare is exact. z and z²
# are embedded as repr literals via CAST('<repr>' AS DOUBLE) on the
# DuckDB side (strtod == Python float repr round-trip).
# --------------------------------------------------------------------------

WILSON_Z = 1.96  # 95% two-sided
WILSON_Z2 = WILSON_Z * WILSON_Z


def q129_source_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_docs(spark, sf_dir).withColumn("toks", _tok_arr())
    per_doc = docs.select("source", quality_col().alias("quality"))
    g = per_doc.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(
            (F.col("quality") >= F.lit(LOWQ_T)).cast("long")
        ).alias("n_pass"),
    )
    n = F.col("n_docs").cast("double")
    p = F.col("n_pass").cast("double") / n
    z = F.lit(WILSON_Z)
    z2 = F.lit(WILSON_Z2)
    lb = (
        p
        + z2 / (F.lit(2.0) * n)
        - z * F.sqrt((p * (F.lit(1.0) - p) + z2 / (F.lit(4.0) * n)) / n)
    ) / (F.lit(1.0) + z2 / n)
    w = Window.orderBy(F.desc("wilson_lb"), F.asc("source"))
    return (
        g.select(
            "source",
            "n_docs",
            "n_pass",
            p.alias("pass_rate"),
            lb.alias("wilson_lb"),
        )
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .orderBy("rank")
    )


# --------------------------------------------------------------------------
# q94: one BPE merge round — count adjacent character-pair occurrences
# weighted by word frequency, the inner loop of byte-pair-encoding
# tokenizer training (Sennrich 2016). The load-bearing scale trick is
# the same one every production BPE trainer uses: pair counting runs
# over the VOCABULARY (distinct words × their corpus frequency), not
# the corpus — one token-count agg collapses 100 TB of text to
# |vocab| rows, and the pair explode + sum touch only that.
# --------------------------------------------------------------------------

BPE_TOP = 30


def q94_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_docs(spark, sf_dir).withColumn("toks", _tok_arr())
    words = (
        docs.select(F.explode("toks").alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .filter(F.length("word") >= 2)
    )
    # sequence(1, len-1) is ascending only because len >= 2 (Spark
    # flips to a DESCENDING sequence when start > stop — a length-1
    # word would yield [1, 0], not []).
    pairs = words.select(
        "freq",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("word") - 1),
                lambda i: F.substring(F.col("word"), i, F.lit(2)),
            )
        ).alias("pair"),
    )
    w = Window.orderBy(F.desc("n"), F.asc("pair"))
    return (
        pairs.groupBy("pair")
        .agg(F.sum("freq").alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(BPE_TOP)
        .withColumn("rank", F.row_number().over(w))
        .select("rank", "pair", "n")
        .orderBy("rank")
    )


# --------------------------------------------------------------------------
# q95: Zipf rank-frequency fit per source — least-squares slope of
# ln(freq) on ln(rank) over each source's term distribution. Natural
# language sits near slope −1 (Zipf 1949); a source that drifts far is
# boilerplate, spam, or machine junk — a standard corpus-naturalness
# audit before training. Scale shape: one (source, term) hash agg
# (vocab-sized output), one rank window partitioned by source, then the
# regression reduces to five DECIMAL(28,12) partial sums per source
# (q67's exact-moment discipline) — the slope/intercept arithmetic runs
# once per source on exact sums, so partition order can't move a bit.
# --------------------------------------------------------------------------


# --------------------------------------------------------------------------
# q102: tokenizer-fertility audit per source — the budgeting numbers a
# pretraining pipeline reads before fixing a tokenizer and a context
# length: subword fertility (BPE-ish alnum-run subtokens per whitespace
# word, q24's per-doc columns rolled up), characters per subtoken
# (compression), and words per doc. A source whose fertility drifts high
# (code, tables, non-Latin transliteration) blows the token budget its
# sampling weight assumed — this is the per-snapshot tracking number.
#
# Scale shape: map-only per-doc array expressions (q24's, zero Python)
# feeding one |sources|-row hash agg of exact bigint sums; the three
# ratio divisions happen once per source. Nothing but (source, 3 ints)
# ever shuffles.
# --------------------------------------------------------------------------


def q102_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_docs(spark, sf_dir).withColumn("toks", _tok_arr())
    per_doc = docs.select(
        "source",
        F.size("toks").cast("long").alias("n_words"),
        F.size(
            F.filter(
                F.split(F.regexp_replace(F.col("text"), "[^a-z0-9]+", " "), " "),
                lambda x: x != "",
            )
        ).cast("long").alias("n_subtoks"),
        F.length("text").cast("long").alias("n_chars"),
    )
    agg = per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_words").alias("words"),
        F.sum("n_subtoks").alias("subtoks"),
        F.sum("n_chars").alias("chars"),
    )
    return agg.select(
        "source",
        "n_docs",
        "words",
        "subtoks",
        "chars",
        F.round(F.col("subtoks") / F.col("words"), 9).alias("fertility"),
        F.round(F.col("chars") / F.col("subtoks"), 9).alias(
            "chars_per_subtok"
        ),
        F.round(F.col("words") / F.col("n_docs"), 9).alias("words_per_doc"),
    ).orderBy("source")


def q95_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_docs(spark, sf_dir).withColumn("toks", _tok_arr())
    tfreq = (
        docs.select("source", F.explode("toks").alias("term"))
        .groupBy("source", "term")
        .agg(F.count("*").alias("freq"))
    )
    w = Window.partitionBy("source").orderBy(F.desc("freq"), F.asc("term"))
    xy = tfreq.withColumn("rnk", F.row_number().over(w)).select(
        "source",
        F.log(F.col("rnk").cast("double")).alias("x"),
        F.log(F.col("freq").cast("double")).alias("y"),
    )
    d28 = "decimal(28,12)"
    sums = xy.groupBy("source").agg(
        F.count("*").alias("n"),
        F.sum(F.col("x").cast(d28)).alias("sx"),
        F.sum(F.col("y").cast(d28)).alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast(d28)).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast(d28)).alias("sxx"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    # n >= 2 on BOTH engines: a single-distinct-term source has
    # denominator 0, where Spark (non-ANSI) double division yields NULL
    # but DuckDB yields NaN — a cross-engine divergence on degenerate
    # input, and the fit is meaningless at one point anyway.
    return (
        sums.filter(F.col("n") >= 2)
        .select(
            "source",
            F.col("n").cast("int").alias("n_terms"),
            F.round(slope, 9).alias("zipf_slope"),
            F.round((sy - slope * sx) / n, 9).alias("zipf_intercept"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# q97: per-source unigram KL divergence vs the corpus distribution —
# KL(P_s ‖ Q) = Σ_t p_st · ln(p_st / q_t), the standard domain-shift /
# contamination audit a mixture designer reads before setting sampling
# weights (a source whose unigram distribution sits far from the corpus
# is boilerplate, spam, or a different register). Every term of a
# source exists in the corpus, so q_t > 0 and the sum is finite.
#
# Scale shape: two vocab-sized hash aggs — (source, term) counts and
# corpus term counts — joined on term with the corpus side broadcast
# (|vocab| rows, the q46 LM-broadcast shape); the per-term KL
# contributions fold as DECIMAL(28,12) partials so partition order
# cannot move a bit; totals ride a 1-row broadcast.
# --------------------------------------------------------------------------


def q97_source_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_docs(spark, sf_dir).withColumn("toks", _tok_arr())
    toks = docs.select("source", F.explode("toks").alias("term"))
    st = toks.groupBy("source", "term").agg(F.count("*").alias("c_st"))
    ct = st.groupBy("term").agg(F.sum("c_st").alias("c_t"))
    ns = st.groupBy("source").agg(F.sum("c_st").alias("n_s"))
    n_row = ct.agg(F.sum("c_t").alias("n_total"))
    p = F.col("c_st").cast("double") / F.col("n_s").cast("double")
    q = F.col("c_t").cast("double") / F.col("n_total").cast("double")
    contrib = (p * F.log(p / q)).cast("decimal(28,12)")
    return (
        st.join(ns, "source")
        .join(F.broadcast(ct), "term")
        .crossJoin(F.broadcast(n_row))
        .groupBy("source")
        .agg(
            F.max("n_s").cast("long").alias("n_tokens"),
            F.count("*").cast("long").alias("n_terms"),
            F.sum(contrib).alias("kl_sum"),
        )
        .select(
            "source",
            "n_tokens",
            "n_terms",
            F.round(F.col("kl_sum").cast("double"), 9).alias("kl"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# q108: encoding / mojibake audit — the first gate a web crawl runs
# before any text op: detect bytes that survived a bad decode. Three
# detectors per doc: U+FFFD replacement characters (a decoder already
# gave up), the 'Ã'-prefix signature of UTF-8 read as Latin-1 (the
# classic double-decode), and the overall non-ASCII density. Damage is
# synthesized deterministically from doc_id (q37's PII discipline — the
# fixture text is clean ASCII) with identical expressions both engines.
#
# Scale shape: map-only — pure string expressions inside the scan
# stage, no shuffle at all; counts via length-difference (replace) so
# no regex backtracking on the hot path except the one non-ASCII class.
# --------------------------------------------------------------------------

MOJI_MOD = 17  # docs doc_id % MOJI_MOD == 0 get a mojibake tail
REPL_MOD = 23  # docs doc_id % REPL_MOD == 0 get a U+FFFD tail
_MOJI_TAIL = " cafÃ© rÃ©sumÃ©"  # 'cafÃ© rÃ©sumÃ©'
_REPL_TAIL = " ��"


def q108_mojibake_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_docs(spark, sf_dir)
    damaged = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % MOJI_MOD == 0, F.lit(_MOJI_TAIL)
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % REPL_MOD == 0, F.lit(_REPL_TAIL)
        ).otherwise(F.lit("")),
    )
    d = docs.select("doc_id", "source", damaged.alias("t"))
    n = F.length("t")
    n_repl = n - F.length(F.replace(F.col("t"), F.lit("�")))
    n_moji = n - F.length(F.replace(F.col("t"), F.lit("Ã")))
    n_nonascii = n - F.length(
        F.regexp_replace(F.col("t"), r"[^\x00-\x7F]", "")
    )
    return d.select(
        "doc_id",
        "source",
        n.cast("long").alias("n_chars"),
        n_repl.cast("long").alias("n_repl"),
        n_moji.cast("long").alias("n_moji"),
        n_nonascii.cast("long").alias("n_nonascii"),
        F.round((n - n_nonascii) / n, 9).alias("ascii_ratio"),
        ((n_repl > 0) | (n_moji > 0)).cast("int").alias("flag_encoding"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# q109: filter-threshold calibration sweep — choosing the quality-score
# cutoff is the highest-leverage decision in a filtering pipeline, and
# it's made from exactly this table: binned precision/recall at every
# candidate threshold against a cheap weak label (here "reads like
# prose": stopword count >= 1/5 of tokens, compared in integers). Rows:
# one per occupied score bin, with the cumulative tp/fp a >=threshold
# filter would keep.
#
# Scale shape: the corpus pass is q23's map-only quality expressions +
# ONE hash agg to <= SWEEP_BINS rows (bin, n_pos, n_neg); the
# cumulative window runs over that tiny series — NEVER a global sort of
# docs (the q52-vs-q39 histogram trick applied to PR curves). Divisions
# happen once per bin on exact bigints.
# --------------------------------------------------------------------------

SWEEP_BINS = 20
SWEEP_LABEL = (1, 5)  # positive iff n_stop * 5 >= n_toks * 1


def q109_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_docs(spark, sf_dir).withColumn("toks", _tok_arr())
    n_toks, _punct, _stop, _mtl = _quality_parts()
    quality = quality_col()
    num, den = SWEEP_LABEL
    n_stop = F.size(
        F.filter(F.col("toks"), lambda x: x.isin(list(STOPWORDS)))
    )
    pos = (n_stop * den >= n_toks * num).cast("long")
    binned = docs.select(
        F.least(
            F.floor(quality * SWEEP_BINS), F.lit(SWEEP_BINS - 1)
        ).cast("long").alias("bin"),
        pos.alias("pos"),
    )
    per_bin = binned.groupBy("bin").agg(
        F.sum("pos").alias("n_pos"),
        F.sum(F.lit(1) - F.col("pos")).alias("n_neg"),
    )
    w = Window.orderBy(F.desc("bin")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = per_bin.agg(F.sum("n_pos").alias("total_pos"))
    return (
        per_bin.withColumn("tp", F.sum("n_pos").over(w))
        .withColumn("fp", F.sum("n_neg").over(w))
        .crossJoin(F.broadcast(tot))
        .select(
            "bin",
            F.round(F.col("bin") / F.lit(float(SWEEP_BINS)), 9).alias(
                "threshold"
            ),
            F.col("n_pos").cast("long").alias("n_pos"),
            F.col("n_neg").cast("long").alias("n_neg"),
            F.col("tp").cast("long").alias("tp"),
            F.col("fp").cast("long").alias("fp"),
            F.round(F.col("tp") / (F.col("tp") + F.col("fp")), 9).alias(
                "precision"
            ),
            F.round(F.col("tp") / F.col("total_pos"), 9).alias("recall"),
        )
        .orderBy(F.desc("bin"))
    )


QUERIES = {
    "q22_lang_id": q22_lang_id,
    "q23_quality": q23_quality,
    "q24_token_stats": q24_token_stats,
    "q25_fingerprint": q25_fingerprint,
    "q39_length_quantiles": q39_length_quantiles,
    "q46_lm_perplexity": q46_lm_perplexity,
    "q47_cms_heavy_hitters": q47_cms_heavy_hitters,
    "q52_hist_quantiles": q52_hist_quantiles,
    "q60_pmi_collocations": q60_pmi_collocations,
    "q70_ngram_lm": q70_ngram_lm,
    "q88_source_quality": q88_source_quality,
    "q94_bpe_pairs": q94_bpe_pairs,
    "q95_zipf_fit": q95_zipf_fit,
    "q97_source_kl": q97_source_kl,
    "q102_tokenizer_fertility": q102_tokenizer_fertility,
    "q108_mojibake_audit": q108_mojibake_audit,
    "q109_threshold_sweep": q109_threshold_sweep,
    "q117_langid_confusion": q117_langid_confusion,
    "q129_source_wilson": q129_source_wilson,
}

# Reusable (doc_id, quality) CTE chain — q23's expressions verbatim (the
# q23 gate proves them bit-identical to the Spark side).
QUALITY_CTES_SQL = """
qd AS (
  SELECT doc_id, source, text,
         list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
qb AS (
  SELECT doc_id, source,
         length(text) AS n_chars,
         len(toks) AS n_toks,
         length(regexp_replace(text, '[^a-z0-9]', '', 'g')) AS n_alnum,
         len(list_filter(toks, x -> x IN ({stops}))) AS n_stop,
         list_reduce(list_prepend(0::BIGINT,
           list_transform(toks, x -> length(x)::BIGINT)),
           (acc, x) -> acc + x) / CAST(len(toks) AS DOUBLE) AS mean_tok_len
  FROM qd
),
qual AS (
  SELECT doc_id, source,
         round(0.4 * least(n_toks / 100.0, 1.0)
             + 0.3 * (1.0 - (n_chars - n_alnum) / CAST(n_chars AS DOUBLE))
             + 0.2 * (n_stop / CAST(n_toks AS DOUBLE))
             + 0.1 * least(mean_tok_len / 8.0, 1.0), 9) AS quality
  FROM qb
)
"""


def _sql_list(words: list[str]) -> str:
    return ", ".join(f"'{w}'" for w in words)


_LANG_STRUCTS = ", ".join(
    "{'score': len(list_filter(toks, x -> x IN (%s))), 'lang': '%s'}"
    % (_sql_list(m), lang)
    for lang, m in sorted(LANG_MARKERS.items())
)

ORACLE = {
    "q22_lang_id": f"""
WITH d AS (
  SELECT doc_id, lang,
         list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
s AS (SELECT doc_id, lang, [{_LANG_STRUCTS}] AS arr FROM d),
m AS (
  SELECT doc_id, lang, arr,
         list_max(list_transform(arr, s -> s.score)) AS best_score
  FROM s
)
SELECT doc_id,
       list_min(list_transform(list_filter(arr, s -> s.score = best_score),
                               s -> s.lang)) AS pred_lang,
       best_score::INT AS marker_hits,
       lang
FROM m ORDER BY doc_id
""",
    "q23_quality": f"""
WITH d AS (
  SELECT doc_id, text,
         list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
b AS (
  SELECT doc_id,
         length(text) AS n_chars,
         len(toks) AS n_toks,
         length(regexp_replace(text, '[^a-z0-9]', '', 'g')) AS n_alnum,
         len(list_filter(toks, x -> x IN ({_sql_list(STOPWORDS)}))) AS n_stop,
         list_reduce(list_prepend(0::BIGINT,
           list_transform(toks, x -> length(x)::BIGINT)),
           (acc, x) -> acc + x) / CAST(len(toks) AS DOUBLE) AS mean_tok_len
  FROM d
)
SELECT doc_id,
       n_toks::INT AS n_tokens,
       round((n_chars - n_alnum) / CAST(n_chars AS DOUBLE), 9) AS punct_ratio,
       round(n_stop / CAST(n_toks AS DOUBLE), 9) AS stop_ratio,
       round(mean_tok_len, 9) AS mean_tok_len,
       round(0.4 * least(n_toks / 100.0, 1.0)
           + 0.3 * (1.0 - (n_chars - n_alnum) / CAST(n_chars AS DOUBLE))
           + 0.2 * (n_stop / CAST(n_toks AS DOUBLE))
           + 0.1 * least(mean_tok_len / 8.0, 1.0), 9) AS quality
FROM b ORDER BY doc_id
""",
    "q24_token_stats": """
SELECT doc_id,
       len(list_filter(string_split(text, ' '), x -> x <> ''))::INT AS n_ws_tokens,
       len(list_distinct(list_filter(string_split(text, ' '), x -> x <> '')))::INT
         AS n_distinct,
       len(list_filter(string_split(regexp_replace(text, '[^a-z0-9]+', ' ', 'g'), ' '),
                       x -> x <> ''))::INT AS n_alnum_runs,
       length(text)::INT AS n_chars
FROM documents ORDER BY doc_id
""",
    "q25_fingerprint": f"""
WITH d AS (
  SELECT doc_id,
         list_transform(list_filter(string_split(text, ' '), x -> x <> ''),
           x -> ('0x' || substr(md5(x), 1, 15))::BIGINT % {FP_MOD}) AS hs
  FROM documents
)
SELECT doc_id,
       list_reduce(list_prepend(0::BIGINT, hs),
                   (acc, x) -> (acc * {FP_BASE} + x) % {FP_MOD}) AS fingerprint
FROM d ORDER BY doc_id
""",
    # q39: rank-selection quantiles — interpolation spelled with the SAME
    # expression shape as the Spark side (vlo + (pos - lo) * (vhi - vlo)).
    "q39_length_quantiles": f"""
WITH c AS (
  SELECT source, doc_id,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS DOUBLE) AS cnt
  FROM documents
),
r AS (
  SELECT source, cnt,
         row_number() OVER (PARTITION BY source ORDER BY cnt, doc_id) - 1 AS r
  FROM c
),
n AS (SELECT source, count(*) AS n FROM c GROUP BY source),
qs AS (SELECT unnest([{", ".join(str(q) for q in LENGTH_QUANTILES)}]::DOUBLE[]) AS q),
pos AS (
  SELECT source, q, q * (n - 1) AS pos,
         floor(q * (n - 1))::BIGINT AS lo,
         ceil(q * (n - 1))::BIGINT AS hi
  FROM n CROSS JOIN qs
),
v AS (
  SELECT p.source, p.q,
         rl.cnt + (p.pos - p.lo) * (rh.cnt - rl.cnt) AS val
  FROM pos p
  JOIN r rl ON rl.source = p.source AND rl.r = p.lo
  JOIN r rh ON rh.source = p.source AND rh.r = p.hi
)
SELECT source,
       {", ".join(f"round(max(CASE WHEN q = {q} THEN val END), 9) AS p{int(q * 100)}" for q in LENGTH_QUANTILES)}
FROM v GROUP BY source ORDER BY source
""",
    # q46: same 12dp-rounded log2 per occurrence, exact DECIMAL(28,12)
    # sum (order-free), one double division at the end — identical
    # expression shape to the Spark side.
    "q46_lm_perplexity": f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
  FROM documents
),
model AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
tot AS (
  SELECT sum(c)::BIGINT AS n_total, count(*)::BIGINT AS v_vocab FROM model
),
sc AS (
  SELECT doc_id,
         sum(round(log2((c + 1) / CAST(n_total + v_vocab AS DOUBLE)),
                   12)::DECIMAL(28,12)) AS lsum,
         count(*)::BIGINT AS n_toks
  FROM toks JOIN model USING (tok) CROSS JOIN tot
  GROUP BY doc_id
)
SELECT doc_id,
       n_toks::INT AS n_toks,
       round(-(CAST(lsum AS DOUBLE) / n_toks), 9) AS cross_entropy,
       round(pow(2.0::DOUBLE, -(CAST(lsum AS DOUBLE) / n_toks)), 9)
         AS perplexity,
       pow(2.0::DOUBLE, -(CAST(lsum AS DOUBLE) / n_toks)) < {PPL_MAX}::DOUBLE
         AS kept
FROM sc ORDER BY doc_id
""",
    # q47: identical salted-hash bucket expression; the grid and the
    # probe both derive from it, so only collision structure (not engine
    # fold order) shapes the estimates.
    "q47_cms_heavy_hitters": f"""
WITH toks AS (
  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
  FROM documents
),
rows_ AS (SELECT unnest([{", ".join(str(i) for i in range(CMS_D))}]) AS row),
pairs AS (
  SELECT row,
         ('0x' || substr(md5(row::VARCHAR || ':' || tok), 1, 15))::BIGINT
           % {CMS_W} AS bucket
  FROM toks CROSS JOIN rows_
),
sk AS (SELECT row, bucket, count(*)::BIGINT AS cnt FROM pairs GROUP BY row, bucket),
exact AS (SELECT tok, count(*)::BIGINT AS exact_cnt FROM toks GROUP BY tok),
top AS (SELECT tok, exact_cnt FROM exact ORDER BY exact_cnt DESC, tok LIMIT {HH_K}),
probe AS (
  SELECT tok, exact_cnt, row,
         ('0x' || substr(md5(row::VARCHAR || ':' || tok), 1, 15))::BIGINT
           % {CMS_W} AS bucket
  FROM top CROSS JOIN rows_
),
est AS (
  SELECT tok, exact_cnt, min(cnt) AS cms_estimate
  FROM probe JOIN sk USING (row, bucket)
  GROUP BY tok, exact_cnt
)
SELECT tok, exact_cnt, cms_estimate, cms_estimate - exact_cnt AS overcount
FROM est ORDER BY exact_cnt DESC, tok
""",
    # q52: identical integer bins / cumulative ranks / interpolation
    # expression — the sketch estimate itself is deterministic.
    "q52_hist_quantiles": f"""
WITH d AS (
  SELECT source,
         (len(list_filter(string_split(text, ' '), x -> x <> ''))
          // {Q52_BIN_W})::BIGINT AS bin
  FROM documents
),
hist AS (SELECT source, bin, count(*)::BIGINT AS n FROM d GROUP BY source, bin),
cum AS (
  SELECT source, bin, n,
         coalesce(sum(n) OVER (PARTITION BY source ORDER BY bin
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_excl,
         sum(n) OVER (PARTITION BY source) AS n_total
  FROM hist
),
qs AS (SELECT unnest([{", ".join(str(q) for q in LENGTH_QUANTILES)}]::DOUBLE[]) AS q),
tagged AS (
  SELECT source, q,
         round(bin * {Q52_BIN_W}
               + {Q52_BIN_W}::DOUBLE * (r - cum_excl) / CAST(n AS DOUBLE),
               9) AS est
  FROM (
    SELECT c.*, q, floor(q * (n_total - 1))::BIGINT AS r
    FROM cum c CROSS JOIN qs
  )
  WHERE cum_excl <= r AND r < cum_excl + n
)
SELECT source,
       {", ".join(f"max(CASE WHEN q = {q} THEN est END) AS p{int(q * 100)}" for q in LENGTH_QUANTILES)}
FROM tagged GROUP BY source ORDER BY source
""",
}

# q60 oracle: same fixed-shape single-ln PMI; DuckDB builds bigrams by
# positional list indexing (range is end-exclusive, lists 1-indexed).
ORACLE["q60_pmi_collocations"] = f"""
WITH t AS (
  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
base AS (SELECT toks, len(toks) AS n FROM t),
uc AS (
  SELECT w, count(*) AS c
  FROM (SELECT unnest(toks) AS w FROM base) GROUP BY w
),
totals AS (
  SELECT sum(n)::DOUBLE AS t_uni,
         sum(greatest(n - 1, 0))::DOUBLE AS t_bi
  FROM base
),
bc AS (
  SELECT w1, w2, count(*) AS c_ab
  FROM (
    SELECT toks[i] AS w1, toks[i + 1] AS w2
    FROM base, unnest(range(1, n)) AS u(i)
  )
  GROUP BY w1, w2 HAVING count(*) >= {PMI_MIN_COUNT}
)
SELECT w1, w2, c_ab::BIGINT AS c_ab,
       round(ln((c_ab::DOUBLE * t_uni * t_uni) / (t_bi * ca.c * cb.c)), 9) AS pmi
FROM bc
JOIN uc ca ON ca.w = bc.w1
JOIN uc cb ON cb.w = bc.w2, totals
ORDER BY pmi DESC, w1, w2
LIMIT {PMI_TOP_N}
"""

# q70 oracle: same counts, same fixed-shape ln ratio. range(1, n - 1)
# yields trigram start positions 1..n-2 (1-based list indexing).
ORACLE["q70_ngram_lm"] = f"""
WITH t AS (
  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
base AS (SELECT toks, len(toks) AS n FROM t),
tri AS (
  SELECT w1, w2, w3, count(*) AS c3
  FROM (
    SELECT toks[i] AS w1, toks[i + 1] AS w2, toks[i + 2] AS w3
    FROM base, unnest(range(1, n - 1)) AS u(i)
  )
  GROUP BY w1, w2, w3 HAVING count(*) >= {LM_MIN_COUNT}
),
ctx AS (
  SELECT w1, w2, count(*) AS c2
  FROM (
    SELECT toks[i] AS w1, toks[i + 1] AS w2
    FROM base, unnest(range(1, n)) AS u(i)
  )
  GROUP BY w1, w2
),
vocab AS (
  SELECT count(DISTINCT w)::DOUBLE AS v
  FROM (SELECT unnest(toks) AS w FROM base)
)
SELECT w1, w2, w3, c3::BIGINT AS c3,
       round(ln((c3::DOUBLE + {LM_K}::DOUBLE)
                / (c2::DOUBLE + {LM_K}::DOUBLE * v)), 9) AS logp
FROM tri JOIN ctx USING (w1, w2), vocab
ORDER BY c3 DESC, w1, w2, w3
LIMIT {LM_TOP_N}
"""

# q88: qual chain verbatim, one GROUP BY source. DECIMAL(28,12) sum of
# the 9dp-rounded doubles; decimal→double via the VARCHAR route (strtod
# = Java BigDecimal.doubleValue — DuckDB's direct cast double-rounds
# past 2^53 unscaled); integer blocklist compare.
ORACLE["q88_source_quality"] = f"""
WITH {QUALITY_CTES_SQL.format(stops=_sql_list(STOPWORDS))},
g AS (
  SELECT source, count(*) AS n_docs,
         sum(CAST(quality AS DECIMAL(28,12))) AS qsum,
         sum(CASE WHEN quality < {LOWQ_T}::DOUBLE THEN 1 ELSE 0 END)::BIGINT
           AS n_low
  FROM qual GROUP BY source
)
SELECT source, n_docs,
       round(CAST(qsum::VARCHAR AS DOUBLE) / n_docs, 9) AS avg_quality,
       n_low,
       CAST(n_low AS DOUBLE) / n_docs AS low_share,
       CASE WHEN n_low * 100 >= {LOWQ_PCT} * n_docs THEN 1 ELSE 0 END AS blocked
FROM g ORDER BY source
"""
# q129: the Wilson expression must be the IDENTICAL operation tree as
# the Spark side — bit-identity needs every IEEE op to match, so the
# parenthesization below mirrors the F.Column expression verbatim.
ORACLE["q129_source_wilson"] = f"""
WITH {{qcte}},
g AS (
  SELECT source, count(*)::BIGINT AS n_docs,
         sum(CASE WHEN quality >= {LOWQ_T}::DOUBLE THEN 1 ELSE 0 END)::BIGINT
           AS n_pass
  FROM qual GROUP BY source
),
wil AS (
  SELECT source, n_docs, n_pass,
         CAST(n_pass AS DOUBLE) / CAST(n_docs AS DOUBLE) AS pass_rate,
         (CAST(n_pass AS DOUBLE) / CAST(n_docs AS DOUBLE)
          + CAST('{WILSON_Z2!r}' AS DOUBLE) / (2.0 * CAST(n_docs AS DOUBLE))
          - CAST('{WILSON_Z!r}' AS DOUBLE) * sqrt(
              (CAST(n_pass AS DOUBLE) / CAST(n_docs AS DOUBLE)
               * (1.0 - CAST(n_pass AS DOUBLE) / CAST(n_docs AS DOUBLE))
               + CAST('{WILSON_Z2!r}' AS DOUBLE)
                 / (4.0 * CAST(n_docs AS DOUBLE)))
              / CAST(n_docs AS DOUBLE)))
         / (1.0 + CAST('{WILSON_Z2!r}' AS DOUBLE) / CAST(n_docs AS DOUBLE))
           AS wilson_lb
  FROM g
)
SELECT source, n_docs, n_pass, pass_rate, wilson_lb,
       row_number() OVER (ORDER BY wilson_lb DESC, source)::INT AS rank
FROM wil ORDER BY rank
"""
ORACLE["q129_source_wilson"] = ORACLE["q129_source_wilson"].format(
    qcte=QUALITY_CTES_SQL.format(stops=_sql_list(STOPWORDS)).strip()
)

# q94: pair counting over the vocabulary — range(1, length) is
# end-exclusive in DuckDB, so it enumerates starts 1..len-1 directly.
ORACLE["q94_bpe_pairs"] = f"""
WITH words AS (
  SELECT word, count(*) AS freq
  FROM (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> ''))
          AS word
        FROM documents)
  GROUP BY word HAVING length(word) >= 2
),
pairs AS (
  SELECT substr(word, i, 2) AS pair, freq
  FROM words, unnest(range(1, length(word))) AS u(i)
),
agg AS (SELECT pair, sum(freq)::BIGINT AS n FROM pairs GROUP BY pair)
SELECT rank, pair, n
FROM (SELECT pair, n,
             row_number() OVER (ORDER BY n DESC, pair ASC) AS rank
      FROM agg)
WHERE rank <= {BPE_TOP}
ORDER BY rank
"""
# q95: the five regression sums fold as DECIMAL(28,12) partials exactly
# like the Spark side; slope/intercept arithmetic is one double
# expression per source over the exact sums (identical IEEE shape).
ORACLE["q95_zipf_fit"] = """
WITH tfreq AS (
  SELECT source, term, count(*) AS freq
  FROM (SELECT source,
               unnest(list_filter(string_split(text, ' '), x -> x <> ''))
                 AS term
        FROM documents)
  GROUP BY source, term
),
xy AS (
  SELECT source,
         ln(CAST(row_number() OVER (PARTITION BY source
              ORDER BY freq DESC, term ASC) AS DOUBLE)) AS x,
         ln(CAST(freq AS DOUBLE)) AS y
  FROM tfreq
),
sums AS (
  SELECT source, count(*) AS n,
         sum(CAST(x AS DECIMAL(28,12))) AS sx,
         sum(CAST(y AS DECIMAL(28,12))) AS sy,
         sum(CAST(x * y AS DECIMAL(28,12))) AS sxy,
         sum(CAST(x * x AS DECIMAL(28,12))) AS sxx
  FROM xy GROUP BY source
  HAVING count(*) >= 2
)
SELECT source, n::INT AS n_terms,
       round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
             / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE), 9)
         AS zipf_slope,
       round((sy::DOUBLE
              - (n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
                / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
                * sx::DOUBLE)
             / n::DOUBLE, 9) AS zipf_intercept
FROM sums ORDER BY source
"""
# q97: identical p/q expression shape and DECIMAL(28,12) contribution
# fold; n totals are exact bigints.
ORACLE["q97_source_kl"] = """
WITH toks AS (
  SELECT source,
         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
  FROM documents
),
st AS (SELECT source, term, count(*) AS c_st FROM toks GROUP BY source, term),
ct AS (SELECT term, sum(c_st)::BIGINT AS c_t FROM st GROUP BY term),
ns AS (SELECT source, sum(c_st)::BIGINT AS n_s FROM st GROUP BY source),
nt AS (SELECT sum(c_t)::BIGINT AS n_total FROM ct)
SELECT st.source,
       max(ns.n_s)::BIGINT AS n_tokens,
       count(*)::BIGINT AS n_terms,
       round(sum(CAST(
         (CAST(st.c_st AS DOUBLE) / CAST(ns.n_s AS DOUBLE))
         * ln((CAST(st.c_st AS DOUBLE) / CAST(ns.n_s AS DOUBLE))
              / (CAST(ct.c_t AS DOUBLE) / CAST(nt.n_total AS DOUBLE)))
         AS DECIMAL(28,12)))::DOUBLE, 9) AS kl
FROM st JOIN ns USING (source) JOIN ct USING (term) CROSS JOIN nt
GROUP BY st.source
ORDER BY st.source
"""

# q102: q24's per-doc expressions rolled up per source; ratios divide
# exact bigint sums once per source (DuckDB integer '/' is true
# division, same IEEE op as Spark's bigint/bigint -> double).
ORACLE["q102_tokenizer_fertility"] = """
WITH per_doc AS (
  SELECT source,
         len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT
           AS n_words,
         len(list_filter(
               string_split(regexp_replace(text, '[^a-z0-9]+', ' ', 'g'),
                            ' '),
               x -> x <> ''))::BIGINT AS n_subtoks,
         length(text)::BIGINT AS n_chars
  FROM documents
)
SELECT source, count(*) AS n_docs,
       sum(n_words)::BIGINT AS words,
       sum(n_subtoks)::BIGINT AS subtoks,
       sum(n_chars)::BIGINT AS chars,
       round(sum(n_subtoks)::BIGINT / sum(n_words)::BIGINT, 9) AS fertility,
       round(sum(n_chars)::BIGINT / sum(n_subtoks)::BIGINT, 9)
         AS chars_per_subtok,
       round(sum(n_words)::BIGINT / count(*), 9) AS words_per_doc
FROM per_doc GROUP BY source ORDER BY source
"""

# q108: identical damage synthesis (mod rules over doc_id), counts via
# length-difference on replace(); the one regex is the non-ASCII class.
ORACLE["q108_mojibake_audit"] = f"""
WITH d AS (
  SELECT doc_id, source,
         text
           || CASE WHEN doc_id % {MOJI_MOD} = 0
                   THEN '{_MOJI_TAIL}' ELSE '' END
           || CASE WHEN doc_id % {REPL_MOD} = 0
                   THEN '{_REPL_TAIL}' ELSE '' END AS t
  FROM documents
),
m AS (
  SELECT doc_id, source, length(t) AS n,
         length(t) - length(replace(t, '�', '')) AS n_repl,
         length(t) - length(replace(t, 'Ã', '')) AS n_moji,
         length(t) - length(regexp_replace(t, '[^\\x00-\\x7F]', '', 'g'))
           AS n_nonascii
  FROM d
)
SELECT doc_id, source,
       n::BIGINT AS n_chars,
       n_repl::BIGINT AS n_repl,
       n_moji::BIGINT AS n_moji,
       n_nonascii::BIGINT AS n_nonascii,
       round((n - n_nonascii) / CAST(n AS DOUBLE), 9) AS ascii_ratio,
       CASE WHEN n_repl > 0 OR n_moji > 0 THEN 1 ELSE 0 END::INT
         AS flag_encoding
FROM m ORDER BY doc_id
"""

# q109: q23's quality CTEs verbatim; the weak label compares exact
# integers from qb; cumulative tp/fp over the <= SWEEP_BINS-row series.
ORACLE["q109_threshold_sweep"] = f"""
WITH {{qcte}},
lab AS (
  SELECT qual.doc_id, qual.quality,
         CASE WHEN qb.n_stop * {SWEEP_LABEL[1]}
                   >= qb.n_toks * {SWEEP_LABEL[0]}
              THEN 1 ELSE 0 END AS pos
  FROM qual JOIN qb USING (doc_id)
),
binned AS (
  SELECT least(floor(quality * {SWEEP_BINS}), {SWEEP_BINS - 1})::BIGINT
           AS bin,
         pos
  FROM lab
),
per_bin AS (
  SELECT bin, sum(pos)::BIGINT AS n_pos,
         sum(1 - pos)::BIGINT AS n_neg
  FROM binned GROUP BY bin
),
cum AS (
  SELECT bin, n_pos, n_neg,
         sum(n_pos) OVER (ORDER BY bin DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
         sum(n_neg) OVER (ORDER BY bin DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fp,
         sum(n_pos) OVER () AS total_pos
  FROM per_bin
)
SELECT bin, round(bin / {float(SWEEP_BINS)}::DOUBLE, 9) AS threshold,
       n_pos, n_neg, tp::BIGINT AS tp, fp::BIGINT AS fp,
       round(tp / CAST(tp + fp AS DOUBLE), 9) AS precision,
       round(tp / CAST(total_pos AS DOUBLE), 9) AS recall
FROM cum ORDER BY bin DESC
"""
ORACLE["q109_threshold_sweep"] = ORACLE["q109_threshold_sweep"].format(
    qcte=QUALITY_CTES_SQL.format(stops=_sql_list(STOPWORDS)).strip()
)

# q117: q22's argmax CTEs + one (true, pred) rollup; recall divides
# exact bigints via a window over the tiny matrix.
ORACLE["q117_langid_confusion"] = f"""
WITH d AS (
  SELECT doc_id, lang,
         list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
s AS (SELECT doc_id, lang, [{_LANG_STRUCTS}] AS arr FROM d),
m0 AS (
  SELECT lang, arr,
         list_max(list_transform(arr, s -> s.score)) AS best_score
  FROM s
),
m AS (
  SELECT lang AS true_lang,
         list_min(list_transform(list_filter(arr, s -> s.score = best_score),
                                 s -> s.lang)) AS pred_lang
  FROM m0
),
cells AS (
  SELECT true_lang, pred_lang, count(*)::BIGINT AS n_docs
  FROM m GROUP BY true_lang, pred_lang
)
SELECT true_lang, pred_lang, n_docs,
       CASE WHEN true_lang = pred_lang THEN 1 ELSE 0 END::INT AS correct,
       round(n_docs / CAST(sum(n_docs) OVER (PARTITION BY true_lang)
                           AS DOUBLE), 9) AS share_of_true
FROM cells ORDER BY true_lang, pred_lang
"""


# --------------------------------------------------------------------------
# q146: Kneser–Ney bigram statistics (Kneser/Ney ICASSP'95; Chen &
# Goodman 1998 formulation) — the LM-pipeline companion to q70's add-k
# trigram model: absolute discounting plus the CONTINUATION unigram
# (how many distinct left contexts a word follows — "Francisco" is
# frequent but only ever follows "San", so its continuation mass is
# tiny). A data-curation pipeline uses these to score corpora for LM
# training and to build the smoothed n-gram scorers q46 consumes.
#
#   p_kn(w2|w1) = (c(w1,w2) − d)/c(w1)
#               + ((d · N1+(w1,·))/c(w1)) · (N1+(·,w2)/B)
#
# with d = 0.75, N1+ = distinct-continuation counts, B = distinct
# bigram types. Scale shape: one map-only bigram explode, then
# vocabulary-keyed hash aggs and (w1)/(w2) equi-joins — all shuffle
# keys are natural; only the 1-row B total broadcasts; output bounded
# by the KN_MIN_COUNT support filter. Every input to the formula is an
# exact int64 count, and the formula is ONE identical IEEE tree on
# both engines (d embedded ::DOUBLE), emitted UNROUNDED (bit-identity
# beats round(x,9) — the q67/q139 half-ulp rule).
# --------------------------------------------------------------------------

KN_MIN_COUNT = 30  # report bigrams with support >= 30


def q146_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = (
        load_docs(spark, sf_dir)
        .select(_tok_arr().alias("toks"))
        .withColumn("n", F.size("toks"))
    )
    pairs = (
        base.filter(F.col("n") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.col("n") - 2),
                    lambda i: F.struct(
                        F.get("toks", i).alias("w1"),
                        F.get("toks", i + 1).alias("w2"),
                    ),
                )
            ).alias("g")
        )
        .select("g.w1", "g.w2")
    )
    big = pairs.groupBy("w1", "w2").agg(
        F.count("*").cast("long").alias("c2")
    )
    left = big.groupBy("w1").agg(
        F.sum("c2").cast("long").alias("c1"),
        F.count("*").cast("long").alias("rdiv"),
    )
    cont = big.groupBy("w2").agg(
        F.count("*").cast("long").alias("cont")
    )
    btot = big.groupBy().agg(
        F.count("*").cast("long").alias("n_bigram_types")
    )
    d = F.lit(0.75)
    out = (
        big.filter(F.col("c2") >= KN_MIN_COUNT)
        .join(left, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(btot))
        .withColumn(
            "pkn",
            (
                (F.col("c2").cast("double") - d)
                / F.col("c1").cast("double")
            )
            + (
                (d * F.col("rdiv").cast("double"))
                / F.col("c1").cast("double")
            )
            * (
                F.col("cont").cast("double")
                / F.col("n_bigram_types").cast("double")
            ),
        )
    )
    return out.select(
        "w1", "w2", "c2", "c1", "rdiv", "cont", "n_bigram_types", "pkn"
    ).orderBy(F.desc("c2"), "w1", "w2")


QUERIES["q146_kneser_ney"] = q146_kneser_ney

ORACLE["q146_kneser_ney"] = f"""
WITH t AS (
  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
base AS (SELECT toks, len(toks) AS n FROM t),
pairs AS (
  SELECT toks[i] AS w1, toks[i + 1] AS w2
  FROM base, unnest(range(1, n)) AS u(i)
  WHERE n >= 2
),
big AS (
  SELECT w1, w2, count(*)::BIGINT AS c2 FROM pairs GROUP BY w1, w2
),
lft AS (
  SELECT w1, sum(c2)::BIGINT AS c1, count(*)::BIGINT AS rdiv
  FROM big GROUP BY w1
),
con AS (
  SELECT w2, count(*)::BIGINT AS cont FROM big GROUP BY w2
),
btot AS (SELECT count(*)::BIGINT AS n_bigram_types FROM big)
SELECT b.w1, b.w2, b.c2, lft.c1, lft.rdiv, con.cont, btot.n_bigram_types,
       ((b.c2::DOUBLE - 0.75::DOUBLE) / lft.c1::DOUBLE)
       + ((0.75::DOUBLE * lft.rdiv::DOUBLE) / lft.c1::DOUBLE)
         * (con.cont::DOUBLE / btot.n_bigram_types::DOUBLE) AS pkn
FROM big b JOIN lft ON b.w1 = lft.w1
           JOIN con ON b.w2 = con.w2, btot
WHERE b.c2 >= {KN_MIN_COUNT}
ORDER BY b.c2 DESC, b.w1, b.w2
"""


# --------------------------------------------------------------------------
# q149: trimmed-mean (winsorized-tail) source quality — the robust
# companion to q88's plain average: a feed whose mean is dragged by a
# few spam pages (or inflated by a few gems) should be judged by its
# central mass, so each source's top and bottom TRIMQ_PCT% of docs by
# quality are dropped before averaging, and the shift between the two
# means is itself the diagnostic (a large |shift| = a tail-skewed
# feed the plain mean misjudges).
#
# Scale shape: one map-only quality pass, then ONE (source)-keyed
# shuffle serving both the rank/count windows and the final agg —
# per-source work is linear, output |sources| rows. Determinism: the
# trim boundary is pure integer ((n·pct) div 100) over the
# (quality, doc_id) total order (quality is the 9dp-rounded cross-
# engine-identical gate value), sums are DECIMAL(28,12) partials
# (order-insensitive), one decimal→double cast (VARCHAR route in
# DuckDB), divide once, round 9; the shift subtracts two identical
# rounded doubles — identical IEEE tree, emitted UNROUNDED.
# --------------------------------------------------------------------------

TRIMQ_PCT = 10  # drop this % of docs off EACH quality tail per source


def q149_trimmed_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_docs(spark, sf_dir).withColumn("toks", _tok_arr())
    q = docs.select("doc_id", "source", quality_col().alias("quality"))
    w = Window.partitionBy("source").orderBy(
        F.asc("quality"), F.asc("doc_id")
    )
    ws = Window.partitionBy("source")
    ranked = (
        q.withColumn("rk", F.row_number().over(w))
        .withColumn("n_docs", F.count("*").over(ws))
        .withColumn(
            "lo", F.expr(f"(n_docs * {TRIMQ_PCT}) div 100").cast("long")
        )
    )
    keep = (F.col("rk") > F.col("lo")) & (
        F.col("rk") <= F.col("n_docs") - F.col("lo")
    )
    g = ranked.groupBy("source").agg(
        F.max("n_docs").cast("long").alias("n_docs"),
        F.sum(F.when(keep, 1).otherwise(0)).cast("long").alias("n_kept"),
        F.sum(
            F.when(keep, F.col("quality"))
            .otherwise(F.lit(0.0))
            .cast("decimal(28,12)")
        ).alias("tsum"),
        F.sum(F.col("quality").cast("decimal(28,12)")).alias("fsum"),
    )
    mean_all = F.round(
        F.col("fsum").cast("double") / F.col("n_docs"), 9
    )
    mean_trim = F.round(
        F.col("tsum").cast("double") / F.col("n_kept"), 9
    )
    return g.select(
        "source",
        "n_docs",
        "n_kept",
        mean_all.alias("mean_all"),
        mean_trim.alias("mean_trimmed"),
        (mean_trim - mean_all).alias("shift"),
    ).orderBy("source")


QUERIES["q149_trimmed_quality"] = q149_trimmed_quality

ORACLE["q149_trimmed_quality"] = f"""
WITH {QUALITY_CTES_SQL.format(stops=_sql_list(STOPWORDS))},
ranked AS (
  SELECT source, doc_id, quality,
         row_number() OVER (PARTITION BY source
                            ORDER BY quality ASC, doc_id ASC) AS rk,
         count(*) OVER (PARTITION BY source) AS n_docs
  FROM qual
),
m AS (
  SELECT *, ((n_docs * {TRIMQ_PCT}) // 100)::BIGINT AS lo,
         CASE WHEN rk > (n_docs * {TRIMQ_PCT}) // 100
               AND rk <= n_docs - (n_docs * {TRIMQ_PCT}) // 100
              THEN 1 ELSE 0 END AS keep
  FROM ranked
),
g AS (
  SELECT source,
         max(n_docs)::BIGINT AS n_docs,
         sum(keep)::BIGINT AS n_kept,
         sum(CAST(CASE WHEN keep = 1 THEN quality ELSE 0.0 END
                  AS DECIMAL(28,12))) AS tsum,
         sum(CAST(quality AS DECIMAL(28,12))) AS fsum
  FROM m GROUP BY source
)
SELECT source, n_docs, n_kept,
       round(CAST(fsum::VARCHAR AS DOUBLE) / n_docs, 9) AS mean_all,
       round(CAST(tsum::VARCHAR AS DOUBLE) / n_kept, 9) AS mean_trimmed,
       round(CAST(tsum::VARCHAR AS DOUBLE) / n_kept, 9)
         - round(CAST(fsum::VARCHAR AS DOUBLE) / n_docs, 9) AS shift
FROM g ORDER BY source
"""


# --------------------------------------------------------------------------
# q154: lexical vocabulary drift between snapshot halves — the
# token-level complement of q128's embedding drift: split the corpus
# into two pseudo-snapshots (doc_id parity — at scale, crawl epochs),
# compare term frequency mass, and report the drift headline numbers
# a data pipeline alerts on: new-vocabulary token mass (terms absent
# from the old half), lost-vocabulary mass, and vocab-set Jaccard.
# Catches tokenizer changes, encoding regressions, and topic shifts
# BEFORE they skew the n-gram models (q70/q146) trained downstream.
#
# Scale shape: one map-only tokenize+explode, ONE (term)-keyed hash
# agg with conditional int64 partials (map-side combinable), one 1-row
# rollup. Every count is exact int64; the ratios are identical IEEE
# divisions over those integers, emitted UNROUNDED. Output: ONE row.
# --------------------------------------------------------------------------


def q154_vocab_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = (
        load_docs(spark, sf_dir)
        .select("doc_id", F.explode(_tok_arr()).alias("w"))
        .withColumn("half", (F.col("doc_id") % 2 == 0).cast("int"))
    )
    per_term = toks.groupBy("w").agg(
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
        .cast("long")
        .alias("ca"),
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0))
        .cast("long")
        .alias("cb"),
    )
    g = per_term.groupBy().agg(
        F.count("*").cast("long").alias("n_terms"),
        F.sum(F.when(F.col("ca") > 0, 1).otherwise(0))
        .cast("long")
        .alias("vocab_a"),
        F.sum(F.when(F.col("cb") > 0, 1).otherwise(0))
        .cast("long")
        .alias("vocab_b"),
        F.sum(
            F.when((F.col("ca") > 0) & (F.col("cb") > 0), 1).otherwise(0)
        )
        .cast("long")
        .alias("vocab_shared"),
        F.sum("ca").cast("long").alias("mass_a"),
        F.sum("cb").cast("long").alias("mass_b"),
        F.sum(F.when(F.col("ca") == 0, F.col("cb")).otherwise(0))
        .cast("long")
        .alias("new_mass"),
        F.sum(F.when(F.col("cb") == 0, F.col("ca")).otherwise(0))
        .cast("long")
        .alias("lost_mass"),
    )
    return g.select(
        "n_terms",
        "vocab_a",
        "vocab_b",
        "vocab_shared",
        "mass_a",
        "mass_b",
        "new_mass",
        "lost_mass",
        (
            F.col("vocab_shared").cast("double")
            / F.col("n_terms").cast("double")
        ).alias("vocab_jaccard"),
        (
            F.col("new_mass").cast("double") / F.col("mass_b").cast("double")
        ).alias("new_mass_share"),
        (
            F.col("lost_mass").cast("double")
            / F.col("mass_a").cast("double")
        ).alias("lost_mass_share"),
    )


QUERIES["q154_vocab_drift"] = q154_vocab_drift

ORACLE["q154_vocab_drift"] = """
WITH t AS (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
  FROM documents
),
pt AS (
  SELECT w,
         sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS ca,
         sum(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 1 END)::BIGINT AS cb
  FROM t GROUP BY w
),
g AS (
  SELECT count(*)::BIGINT AS n_terms,
         sum(CASE WHEN ca > 0 THEN 1 ELSE 0 END)::BIGINT AS vocab_a,
         sum(CASE WHEN cb > 0 THEN 1 ELSE 0 END)::BIGINT AS vocab_b,
         sum(CASE WHEN ca > 0 AND cb > 0 THEN 1 ELSE 0 END)::BIGINT
           AS vocab_shared,
         sum(ca)::BIGINT AS mass_a,
         sum(cb)::BIGINT AS mass_b,
         sum(CASE WHEN ca = 0 THEN cb ELSE 0 END)::BIGINT AS new_mass,
         sum(CASE WHEN cb = 0 THEN ca ELSE 0 END)::BIGINT AS lost_mass
  FROM pt
)
SELECT n_terms, vocab_a, vocab_b, vocab_shared, mass_a, mass_b,
       new_mass, lost_mass,
       CAST(vocab_shared AS DOUBLE) / CAST(n_terms AS DOUBLE)
         AS vocab_jaccard,
       CAST(new_mass AS DOUBLE) / CAST(mass_b AS DOUBLE)
         AS new_mass_share,
       CAST(lost_mass AS DOUBLE) / CAST(mass_a AS DOUBLE)
         AS lost_mass_share
FROM g
"""


# --------------------------------------------------------------------------
# q156: Spearman rank correlation between doc length and quality —
# the filter-design sanity check: q23's quality score has an explicit
# length term, so its rank correlation with raw length says how much
# of the "quality" signal is just length in disguise (a rho near 1
# means the quality gate is a length gate and the other terms are
# dead weight). Rank correlation, not Pearson, because quality is
# bounded and saturates — monotone association is the honest measure.
#
#   rho = 1 − 6·Σd² / (n·(n²−1)),  d = rank_len − rank_quality
#
# Ranks use the (value, doc_id) total order (a defined tie variant,
# deterministic on both engines). Scale shape: one map-only pass, two
# |docs|-row rank windows (single global sort each — at 100 TB this
# becomes a range-partitioned rank; the fixture keeps it exact), one
# 1-row rollup. Σd² and n·(n²−1) are exact int64 (fits to ~2M docs;
# a larger corpus moves the rollup to DECIMAL(38,0) partials), the
# final expression is one identical IEEE tree, UNROUNDED.
# --------------------------------------------------------------------------


def q156_spearman_len_quality(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    docs = load_docs(spark, sf_dir).withColumn("toks", _tok_arr())
    q = docs.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_toks"),
        quality_col().alias("quality"),
    )
    wx = Window.orderBy(F.asc("n_toks"), F.asc("doc_id"))
    wy = Window.orderBy(F.asc("quality"), F.asc("doc_id"))
    ranked = q.withColumn(
        "rx", F.row_number().over(wx).cast("long")
    ).withColumn("ry", F.row_number().over(wy).cast("long"))
    d2 = (F.col("rx") - F.col("ry")) * (F.col("rx") - F.col("ry"))
    g = ranked.groupBy().agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(d2).cast("long").alias("d2_sum"),
    )
    denom = (
        F.col("n_docs") * (F.col("n_docs") * F.col("n_docs") - 1)
    ).cast("long")
    return g.select(
        "n_docs",
        "d2_sum",
        (
            F.lit(1.0)
            - (F.lit(6) * F.col("d2_sum")).cast("double")
            / denom.cast("double")
        ).alias("spearman_rho"),
    )


QUERIES["q156_spearman_len_quality"] = q156_spearman_len_quality

ORACLE["q156_spearman_len_quality"] = f"""
WITH {QUALITY_CTES_SQL.format(stops=_sql_list(STOPWORDS))},
base AS (
  SELECT qb.doc_id, qb.n_toks::BIGINT AS n_toks, qual.quality
  FROM qb JOIN qual ON qb.doc_id = qual.doc_id
),
ranked AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY n_toks ASC, doc_id ASC)::BIGINT AS rx,
         row_number() OVER (ORDER BY quality ASC, doc_id ASC)::BIGINT AS ry
  FROM base
),
g AS (
  SELECT count(*)::BIGINT AS n_docs,
         sum((rx - ry) * (rx - ry))::BIGINT AS d2_sum
  FROM ranked
)
SELECT n_docs, d2_sum,
       1.0::DOUBLE - CAST(6 * d2_sum AS DOUBLE)
         / CAST(n_docs * (n_docs * n_docs - 1) AS DOUBLE) AS spearman_rho
FROM g
"""

# --------------------------------------------------------------------------
# q158: Yule's K lexical diversity per source (Yule 1944; the
# repetitiveness characteristic a corpus-quality dashboard reads next
# to q95's Zipf slope). K = 10^4 · (Σ_m m²·V_m − N) / N² over the
# term-frequency spectrum (V_m = #types occurring m times, N = token
# mass) — equivalently 10^4·(Σ_t tf_t² − N)/N², which is how both
# engines compute it: one (source, term) count, one |sources|-row
# int64 rollup. Unlike TTR, K is length-invariant, so sources of very
# different sizes compare honestly. Template-farm / boilerplate
# sources show K an order of magnitude above organic prose.
#
# Scale shape: one (source, term) hash agg — at 100 TB group on
# (source, xxhash64(term)) so the shuffle rows are 16 bytes (the
# fixture keeps raw terms; collision risk at 2^-64 per pair is the
# same argument q15's md5 key makes). Then a |sources|-row rollup.
# Σ tf² ≤ N² needs int64 up to N ≈ 3·10⁹ tokens per source; beyond
# that the rollup moves to DECIMAL(38,0) partials. The published
# double is ONE identical IEEE tree over exact ints, UNROUNDED.
# --------------------------------------------------------------------------


def q158_yule_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_docs(spark, sf_dir).withColumn("toks", _tok_arr())
    tf = (
        docs.select("source", F.explode("toks").alias("term"))
        .groupBy("source", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    g = tf.groupBy("source").agg(
        F.sum("tf").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_types"),
        F.sum(F.col("tf") * F.col("tf")).cast("long").alias("sum_tf2"),
    )
    n = F.col("n_tokens").cast("double")
    return g.select(
        "source",
        "n_tokens",
        "n_types",
        "sum_tf2",
        (
            F.lit(10000.0)
            * (F.col("sum_tf2") - F.col("n_tokens")).cast("double")
            / (n * n)
        ).alias("yule_k"),
        (F.col("n_types").cast("double") / n).alias("ttr"),
    ).orderBy("source")


QUERIES["q158_yule_k"] = q158_yule_k

ORACLE["q158_yule_k"] = """
WITH toks AS (
  SELECT source,
         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
  FROM documents
),
tf AS (
  SELECT source, term, count(*)::BIGINT AS tf
  FROM toks GROUP BY source, term
),
g AS (
  SELECT source,
         sum(tf)::BIGINT AS n_tokens,
         count(*)::BIGINT AS n_types,
         sum(tf * tf)::BIGINT AS sum_tf2
  FROM tf GROUP BY source
)
SELECT source, n_tokens, n_types, sum_tf2,
       10000.0::DOUBLE * CAST(sum_tf2 - n_tokens AS DOUBLE)
         / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE))
         AS yule_k,
       CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS ttr
FROM g ORDER BY source
"""

# --------------------------------------------------------------------------
# q161: winnowing fingerprint selection (Schleimer/Wilkerson/Aiken
# SIGMOD'03) — the guaranteed-coverage local fingerprinting scheme
# under q25's rolling hash: any shared run of WIN_W + WIN_K − 1 tokens
# between two docs is CAUGHT by at least one selected fingerprint,
# yet only ~2/(W+1) of k-grams are kept. This is the
# plagiarism/near-dup substrate (MOSS) that complements q17's MinHash
# (set overlap) with positional substring evidence.
#
# Selection rule: in every window of WIN_W consecutive k-gram hashes
# keep the minimum, rightmost position on ties — expressed as ONE
# combined int64 key h·2²⁰ + (2²⁰−1−pos), so min(key) over the frame
# IS the (min hash, max pos) selection: pure integer arithmetic,
# identical on both engines. pos < 2²⁰ bounds a doc at ~1M tokens
# (longer docs chunk via q96 first).
#
# Scale shape: map-only k-gram hashing (lead() windows per doc — the
# per-doc sort is the partition sort a 100 TB corpus does per task,
# docs never cross tasks), one frame-min window over the same
# partition order (no extra shuffle), one distinct + per-doc count.
# Density ≈ 2/(W+1) is the audit: a density far off means degenerate
# token hashes (all-equal pages, boilerplate).
# --------------------------------------------------------------------------

WIN_K = 3        # k-gram width (tokens)
WIN_W = 4        # winnowing window (k-grams)
WIN_POS_BITS = 20


def winnow_parts(docs: DataFrame) -> tuple:
    """Per-doc winnowing parts over a (doc_id, text) frame: the k-gram
    census ``nk`` (doc_id, n_kgrams) and the selected-fingerprint set
    ``sel`` (doc_id, selkey). Pure per-doc MAP — each document's rows
    depend on nothing outside the document, which is what makes the
    streaming twin (streaming/fingerprints.py) trivially exact."""
    from pyspark.sql import Window

    docs = docs.withColumn("toks", _tok_arr())
    tok = docs.select(
        "doc_id", F.posexplode("toks").alias("pos", "term")
    ).withColumn(
        "th",
        F.conv(F.substring(F.md5(F.col("term")), 1, 15), 16, 10).cast(
            "long"
        )
        % F.lit(FP_MOD),
    )
    wseq = Window.partitionBy("doc_id").orderBy("pos")
    kh = F.col("th")
    for j in range(1, WIN_K):
        kh = (kh * F.lit(FP_BASE) + F.lead("th", j).over(wseq)) % F.lit(
            FP_MOD
        )
    kg = (
        tok.withColumn("kh", kh)
        .filter(F.col("kh").isNotNull())
        .select("doc_id", "pos", "kh")
    )
    nk = kg.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_kgrams")
    )
    key = F.col("kh") * F.lit(1 << WIN_POS_BITS) + (
        F.lit((1 << WIN_POS_BITS) - 1) - F.col("pos")
    )
    wfrm = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(0, WIN_W - 1)
    )
    sel = (
        kg.withColumn("selkey", F.min(key).over(wfrm))
        .join(nk, "doc_id")
        .filter(F.col("pos") <= F.col("n_kgrams") - WIN_W)
        .select("doc_id", "selkey")
        .distinct()
    )
    return nk, sel


def winnow_census(nk: DataFrame, sel: DataFrame) -> DataFrame:
    cnt = sel.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_selected")
    )
    return (
        nk.join(cnt, "doc_id", "left")
        .select(
            "doc_id",
            "n_kgrams",
            F.coalesce(F.col("n_selected"), F.lit(0))
            .cast("long")
            .alias("n_selected"),
            F.when(
                F.col("n_kgrams") >= WIN_W,
                F.coalesce(F.col("n_selected"), F.lit(0)).cast("double")
                / (F.col("n_kgrams") - WIN_W + 1).cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("density"),
        )
        .orderBy("doc_id")
    )


def q161_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    nk, sel = winnow_parts(load_docs(spark, sf_dir))
    return winnow_census(nk, sel)


QUERIES["q161_winnowing"] = q161_winnowing

ORACLE["q161_winnowing"] = f"""
WITH d AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
tp AS (
  SELECT doc_id, unnest(generate_series(1, len(toks))) AS pos, toks FROM d
),
tok AS (
  SELECT doc_id, pos - 1 AS pos,
         ('0x' || substr(md5(toks[pos]), 1, 15))::BIGINT % {FP_MOD} AS th
  FROM tp
),
kg AS (
  SELECT doc_id, pos,
         ((th * {FP_BASE} + lead(th, 1) OVER w) % {FP_MOD}
          * {FP_BASE} + lead(th, 2) OVER w) % {FP_MOD} AS kh
  FROM tok
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
kg2 AS (SELECT * FROM kg WHERE kh IS NOT NULL),
nk AS (
  SELECT doc_id, count(*)::BIGINT AS n_kgrams FROM kg2 GROUP BY doc_id
),
sel AS (
  SELECT doc_id, pos,
         min(kh * {1 << WIN_POS_BITS}
             + ({(1 << WIN_POS_BITS) - 1} - pos))
           OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN CURRENT ROW AND {WIN_W - 1} FOLLOWING)
           AS selkey
  FROM kg2
),
sel2 AS (
  SELECT DISTINCT s.doc_id, s.selkey
  FROM sel s JOIN nk ON s.doc_id = nk.doc_id
  WHERE s.pos <= nk.n_kgrams - {WIN_W}
),
cnt AS (
  SELECT doc_id, count(*)::BIGINT AS n_selected FROM sel2 GROUP BY doc_id
)
SELECT nk.doc_id, nk.n_kgrams,
       COALESCE(cnt.n_selected, 0)::BIGINT AS n_selected,
       CASE WHEN nk.n_kgrams >= {WIN_W}
            THEN CAST(COALESCE(cnt.n_selected, 0) AS DOUBLE)
                 / CAST(nk.n_kgrams - {WIN_W} + 1 AS DOUBLE)
            ELSE 0.0::DOUBLE END AS density
FROM nk LEFT JOIN cnt ON nk.doc_id = cnt.doc_id
ORDER BY nk.doc_id
"""

# --------------------------------------------------------------------------
# q167: Heaps'-law vocabulary-growth fit (V = k·N^β) — the capacity-
# planning number behind every dictionary, term-id space, and posting
# directory: feed the corpus in doc_id order, log the (tokens-so-far,
# vocab-so-far) curve, and fit the log-log line. β far from the
# expected ~0.5 flags a degenerate corpus (template farm: β→0;
# encoding noise / unbounded token soup: β→1).
#
# Plan: one explode for per-term FIRST occurrence (min doc_id — an
# idempotent MIN fold), one per-doc census joined back, two running
# sums over the doc_id total order (range-partitioned rank at 100 TB),
# then q95's closed-form OLS with DECIMAL(28,12) partials. The DECIMAL
# sums exceed 2^53 unscaled at sf0.1 volumes, so the DuckDB side
# converts via CAST(dec AS VARCHAR → DOUBLE) (strtod = correctly
# rounded, matching Spark's BigDecimal.doubleValue — the CLAUDE.md
# DECIMAL→DOUBLE rule), slope/intercept rounded 9dp like q95.
# --------------------------------------------------------------------------


def q167_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_docs(spark, sf_dir).withColumn("toks", _tok_arr())
    per_doc = docs.select(
        "doc_id", F.size("toks").cast("long").alias("n_toks")
    )
    first = (
        docs.select("doc_id", F.explode("toks").alias("term"))
        .groupBy("term")
        .agg(F.min("doc_id").alias("first_doc"))
        .groupBy("first_doc")
        .agg(F.count("*").cast("long").alias("new_terms"))
    )
    w = Window.orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    curve = (
        per_doc.join(
            first, per_doc.doc_id == first.first_doc, "left"
        )
        .select(
            "doc_id",
            "n_toks",
            F.coalesce(F.col("new_terms"), F.lit(0)).alias("new_terms"),
        )
        .withColumn("cum_n", F.sum("n_toks").over(w).cast("long"))
        .withColumn("cum_v", F.sum("new_terms").over(w).cast("long"))
        .filter((F.col("cum_n") > 0) & (F.col("cum_v") > 0))
    )
    xy = curve.select(
        F.log(F.col("cum_n").cast("double")).alias("x"),
        F.log(F.col("cum_v").cast("double")).alias("y"),
    )
    d28 = "decimal(28,12)"
    sums = xy.groupBy().agg(
        F.count("*").alias("n"),
        F.sum(F.col("x").cast(d28)).alias("sx"),
        F.sum(F.col("y").cast(d28)).alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast(d28)).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast(d28)).alias("sxx"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    return sums.filter(F.col("n") >= 2).select(
        F.col("n").cast("long").alias("n_points"),
        F.round(slope, 9).alias("heaps_beta"),
        F.round(F.exp(intercept), 9).alias("heaps_k"),
    )


QUERIES["q167_heaps_law"] = q167_heaps_law

ORACLE["q167_heaps_law"] = """
WITH per_doc AS (
  SELECT doc_id,
         len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT
           AS n_toks
  FROM documents
),
first AS (
  SELECT first_doc, count(*)::BIGINT AS new_terms FROM (
    SELECT term, min(doc_id) AS first_doc
    FROM (SELECT doc_id,
                 unnest(list_filter(string_split(text, ' '), x -> x <> ''))
                   AS term
          FROM documents)
    GROUP BY term
  ) GROUP BY first_doc
),
curve AS (
  SELECT p.doc_id,
         sum(p.n_toks) OVER w AS cum_n,
         sum(COALESCE(f.new_terms, 0)) OVER w AS cum_v
  FROM per_doc p LEFT JOIN first f ON p.doc_id = f.first_doc
  WINDOW w AS (ORDER BY p.doc_id ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)
),
xy AS (
  SELECT ln(CAST(cum_n AS DOUBLE)) AS x, ln(CAST(cum_v AS DOUBLE)) AS y
  FROM curve WHERE cum_n > 0 AND cum_v > 0
),
sums AS (
  SELECT count(*) AS n,
         CAST(CAST(sum(CAST(x AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE)
           AS sx,
         CAST(CAST(sum(CAST(y AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE)
           AS sy,
         CAST(CAST(sum(CAST(x * y AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE)
           AS sxy,
         CAST(CAST(sum(CAST(x * x AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE)
           AS sxx
  FROM xy
)
SELECT n::BIGINT AS n_points,
       round((n::DOUBLE * sxy - sx * sy)
             / (n::DOUBLE * sxx - sx * sx), 9) AS heaps_beta,
       round(exp((sy - (n::DOUBLE * sxy - sx * sy)
                       / (n::DOUBLE * sxx - sx * sx) * sx)
                 / n::DOUBLE), 9) AS heaps_k
FROM sums WHERE n >= 2
"""

# --------------------------------------------------------------------------
# q170: pairwise Jensen–Shannon divergence between source unigram
# distributions — the SYMMETRIC companion to q97's KL-vs-corpus: KL
# says "how far is this source from the mix", JS says "which PAIRS of
# feeds are the same distribution" (syndication, mirrors, a crawler
# hitting one CMS twice) and is bounded in [0, ln 2] so thresholds
# transfer across corpora. JS(P,Q) = ½KL(P‖M) + ½KL(Q‖M), M = ½(P+Q),
# with 0·ln0 = 0 handled by an explicit presence CASE on BOTH engines.
#
# Scale shape: one (source, term) count matrix, then a
# pairs × vocab grid (|sources|²/2 · |vocab| — sources are few by
# construction; at web scale the vocab axis is capped to the top-K
# terms by mass, exactly how production JS monitors run) with two
# broadcast-joined count columns; per-term contributions fold as
# DECIMAL(28,12) partials (q97's recipe — order-insensitive), ONE
# cast to double, round 9.
# --------------------------------------------------------------------------


def q170_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_docs(spark, sf_dir).withColumn("toks", _tok_arr())
    tf = (
        docs.select("source", F.explode("toks").alias("term"))
        .groupBy("source", "term")
        .agg(F.count("*").cast("long").alias("c"))
    )
    tot = tf.groupBy("source").agg(
        F.sum("c").cast("long").alias("t")
    )
    vocab = tf.select("term").distinct()
    srcs = tot.select(
        F.col("source").alias("sa"), F.col("t").alias("ta")
    )
    srcs_b = tot.select(
        F.col("source").alias("sb"), F.col("t").alias("tb")
    )
    pairs = F.broadcast(srcs).crossJoin(F.broadcast(srcs_b)).filter(
        F.col("sa") < F.col("sb")
    )
    grid = (
        pairs.crossJoin(vocab)
        .join(
            tf.select(
                F.col("source").alias("sa"),
                "term",
                F.col("c").alias("ca"),
            ),
            ["sa", "term"],
            "left",
        )
        .join(
            tf.select(
                F.col("source").alias("sb"),
                "term",
                F.col("c").alias("cb"),
            ),
            ["sb", "term"],
            "left",
        )
        .withColumn("ca", F.coalesce(F.col("ca"), F.lit(0)))
        .withColumn("cb", F.coalesce(F.col("cb"), F.lit(0)))
    )
    p = F.col("ca").cast("double") / F.col("ta").cast("double")
    q = F.col("cb").cast("double") / F.col("tb").cast("double")
    m = F.lit(0.5) * (p + q)
    contrib = F.when(
        F.col("ca") > 0, F.lit(0.5) * p * F.log(p / m)
    ).otherwise(F.lit(0.0)) + F.when(
        F.col("cb") > 0, F.lit(0.5) * q * F.log(q / m)
    ).otherwise(F.lit(0.0))
    return (
        grid.withColumn("contrib", contrib.cast("decimal(28,12)"))
        .groupBy("sa", "sb")
        .agg(
            F.sum(F.when(F.col("ca") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_terms_a"),
            F.sum(F.when(F.col("cb") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_terms_b"),
            F.round(F.sum("contrib").cast("double"), 9).alias("js"),
        )
        .orderBy("sa", "sb")
    )


QUERIES["q170_js_divergence"] = q170_js_divergence

ORACLE["q170_js_divergence"] = """
WITH tf AS (
  SELECT source, term, count(*)::BIGINT AS c
  FROM (SELECT source,
               unnest(list_filter(string_split(text, ' '), x -> x <> ''))
                 AS term
        FROM documents)
  GROUP BY source, term
),
tot AS (SELECT source, sum(c)::BIGINT AS t FROM tf GROUP BY source),
vocab AS (SELECT DISTINCT term FROM tf),
pairs AS (
  SELECT a.source AS sa, a.t AS ta, b.source AS sb, b.t AS tb
  FROM tot a JOIN tot b ON a.source < b.source
),
grid AS (
  SELECT p.sa, p.sb, p.ta, p.tb, v.term,
         COALESCE(fa.c, 0)::BIGINT AS ca,
         COALESCE(fb.c, 0)::BIGINT AS cb
  FROM pairs p CROSS JOIN vocab v
  LEFT JOIN tf fa ON fa.source = p.sa AND fa.term = v.term
  LEFT JOIN tf fb ON fb.source = p.sb AND fb.term = v.term
),
ctr AS (
  SELECT sa, sb, ca, cb,
         CAST(
           CASE WHEN ca > 0
                THEN 0.5::DOUBLE * (CAST(ca AS DOUBLE) / CAST(ta AS DOUBLE))
                     * ln((CAST(ca AS DOUBLE) / CAST(ta AS DOUBLE))
                          / (0.5::DOUBLE
                             * (CAST(ca AS DOUBLE) / CAST(ta AS DOUBLE)
                                + CAST(cb AS DOUBLE) / CAST(tb AS DOUBLE))))
                ELSE 0.0::DOUBLE END
           + CASE WHEN cb > 0
                THEN 0.5::DOUBLE * (CAST(cb AS DOUBLE) / CAST(tb AS DOUBLE))
                     * ln((CAST(cb AS DOUBLE) / CAST(tb AS DOUBLE))
                          / (0.5::DOUBLE
                             * (CAST(ca AS DOUBLE) / CAST(ta AS DOUBLE)
                                + CAST(cb AS DOUBLE) / CAST(tb AS DOUBLE))))
                ELSE 0.0::DOUBLE END
           AS DECIMAL(28,12)) AS contrib
  FROM grid
)
SELECT sa, sb,
       sum(CASE WHEN ca > 0 THEN 1 ELSE 0 END)::BIGINT AS n_terms_a,
       sum(CASE WHEN cb > 0 THEN 1 ELSE 0 END)::BIGINT AS n_terms_b,
       round(CAST(sum(contrib) AS DOUBLE), 9) AS js
FROM ctr GROUP BY sa, sb ORDER BY sa, sb
"""

# --------------------------------------------------------------------------
# q176: χ² discriminative terms per source — supervised feature
# selection (Yang/Pedersen ICML'97's best-performing criterion): for
# each (source, term), the 2×2 presence contingency
# (in-source-with / in-source-without / out-with / out-without) and
# χ² = N(ad−bc)² / ((a+b)(c+d)(a+c)(b+d)). The complement of q60's
# PMI (term↔term) and q97's KL (distribution-level): χ² names the
# TERMS that identify a feed — the features a source classifier or a
# contamination tracer actually uses.
#
# Scale shape: one DISTINCT (doc_id, source, term) presence
# projection, two vocabulary-sized hash aggs (per-source df, global
# df) + a |sources|-row census, all joined back with the small sides
# broadcast; χ² is ONE IEEE tree over exact int64 counts (products
# stay under 2^53 to ~90M docs — beyond that the tree moves to
# DECIMAL), one rank window per source, TakeOrdered head. UNROUNDED.
# --------------------------------------------------------------------------

CHI_TOP = 5


def q176_chi2_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_docs(spark, sf_dir).withColumn("toks", _tok_arr())
    pres = (
        docs.select("doc_id", "source", F.explode("toks").alias("term"))
        .distinct()
    )
    df_st = pres.groupBy("source", "term").agg(
        F.count("*").cast("long").alias("a")
    )
    df_t = pres.select("doc_id", "term").distinct().groupBy("term").agg(
        F.count("*").cast("long").alias("df")
    )
    docs_s = docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n_src")
    )
    n_row = docs.agg(F.count("*").cast("long").alias("n_docs"))
    j = (
        df_st.join(F.broadcast(df_t), "term")
        .join(F.broadcast(docs_s), "source")
        .crossJoin(F.broadcast(n_row))
    )
    a = F.col("a").cast("double")
    b = (F.col("n_src") - F.col("a")).cast("double")
    c = (F.col("df") - F.col("a")).cast("double")
    d = (
        F.col("n_docs") - F.col("n_src") - F.col("df") + F.col("a")
    ).cast("double")
    n = F.col("n_docs").cast("double")
    num = a * d - b * c
    chi2 = (
        n * num * num / ((a + b) * (c + d) * (a + c) * (b + d))
    )
    w = Window.partitionBy("source").orderBy(
        F.desc("chi2"), F.asc("term")
    )
    return (
        j.withColumn("chi2", chi2)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= CHI_TOP)
        .select(
            "source",
            F.col("rnk").alias("rank"),
            "term",
            F.col("a").alias("df_in"),
            (F.col("df") - F.col("a")).cast("long").alias("df_out"),
            "chi2",
        )
        .orderBy("source", "rank")
    )


QUERIES["q176_chi2_terms"] = q176_chi2_terms

ORACLE["q176_chi2_terms"] = f"""
WITH pres AS (
  SELECT DISTINCT doc_id, source, term
  FROM (SELECT doc_id, source,
               unnest(list_filter(string_split(text, ' '), x -> x <> ''))
                 AS term
        FROM documents)
),
df_st AS (
  SELECT source, term, count(*)::BIGINT AS a
  FROM pres GROUP BY source, term
),
df_t AS (
  SELECT term, count(*)::BIGINT AS df
  FROM (SELECT DISTINCT doc_id, term FROM pres) GROUP BY term
),
docs_s AS (
  SELECT source, count(*)::BIGINT AS n_src FROM documents GROUP BY source
),
nn AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
j AS (
  SELECT s.source, s.term, s.a, t.df, d.n_src, nn.n_docs
  FROM df_st s JOIN df_t t ON s.term = t.term
               JOIN docs_s d ON s.source = d.source, nn
),
scored AS (
  SELECT source, term, a, df,
         CAST(n_docs AS DOUBLE)
           * (CAST(a AS DOUBLE) * CAST(n_docs - n_src - df + a AS DOUBLE)
              - CAST(n_src - a AS DOUBLE) * CAST(df - a AS DOUBLE))
           * (CAST(a AS DOUBLE) * CAST(n_docs - n_src - df + a AS DOUBLE)
              - CAST(n_src - a AS DOUBLE) * CAST(df - a AS DOUBLE))
           / ((CAST(a AS DOUBLE) + CAST(n_src - a AS DOUBLE))
              * (CAST(df - a AS DOUBLE)
                 + CAST(n_docs - n_src - df + a AS DOUBLE))
              * (CAST(a AS DOUBLE) + CAST(df - a AS DOUBLE))
              * (CAST(n_src - a AS DOUBLE)
                 + CAST(n_docs - n_src - df + a AS DOUBLE)))
           AS chi2
  FROM j
)
SELECT source, rank, term, df_in, df_out, chi2
FROM (
  SELECT source, term, a AS df_in, (df - a)::BIGINT AS df_out, chi2,
         row_number() OVER (PARTITION BY source
                            ORDER BY chi2 DESC, term ASC)::INT AS rank
  FROM scored
)
WHERE rank <= {CHI_TOP}
ORDER BY source, rank
"""

# --------------------------------------------------------------------------
# q179: Population Stability Index of the quality-score distribution
# between corpus halves — the SCORE-drift monitor completing the
# drift triptych (q128 = embedding drift, q154 = vocabulary drift):
# when the quality filter's input distribution moves, every
# downstream threshold (q109's sweep, q40's gate) silently changes
# meaning. PSI = Σ_bins (p_i − q_i)·ln(p_i / q_i) over FIXED quality
# bins, with the industry-standard Laplace smoothing (+1 per cell) so
# empty bins never produce ln(0) on either engine. Rule-of-thumb
# bands (<0.1 stable, >0.25 action) ride with fixed thresholds.
#
# Scale shape: one map-only quality pass with the q154 half split,
# ONE (bin) hash agg with conditional int64 partials (PSI_BINS rows),
# per-bin contributions are single IEEE trees over exact smoothed
# counts, folded as DECIMAL(28,12) partials, ONE double cast,
# UNROUNDED. The 1-row result is the dashboard scalar.
# --------------------------------------------------------------------------

PSI_BINS = 10
PSI_LO = 0.0
PSI_HI = 1.0


def q179_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_docs(spark, sf_dir).withColumn("toks", _tok_arr())
    q = docs.select(
        "doc_id",
        quality_col().alias("quality"),
        (F.col("doc_id") % 2 == 0).cast("int").alias("half"),
    )
    span = (PSI_HI - PSI_LO) / PSI_BINS
    bin_col = F.least(
        F.greatest(
            F.floor((F.col("quality") - PSI_LO) / F.lit(span)).cast("int"),
            F.lit(0),
        ),
        F.lit(PSI_BINS - 1),
    )
    bins = q.withColumn("bin", bin_col).groupBy("bin").agg(
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
        .cast("long")
        .alias("ca"),
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0))
        .cast("long")
        .alias("cb"),
    )
    tot = F.broadcast(
        bins.groupBy().agg(
            F.sum("ca").cast("long").alias("na"),
            F.sum("cb").cast("long").alias("nb"),
        )
    )
    p = (F.col("ca") + 1).cast("double") / (
        F.col("na") + PSI_BINS
    ).cast("double")
    qq = (F.col("cb") + 1).cast("double") / (
        F.col("nb") + PSI_BINS
    ).cast("double")
    contrib = (p - qq) * F.log(p / qq)
    g = (
        bins.crossJoin(tot)
        .withColumn("contrib", contrib.cast("decimal(28,12)"))
        .groupBy()
        .agg(
            F.count("*").cast("long").alias("n_bins_hit"),
            F.max("na").cast("long").alias("n_half_a"),
            F.max("nb").cast("long").alias("n_half_b"),
            F.sum("contrib").cast("double").alias("psi"),
        )
    )
    return g.select(
        "n_bins_hit",
        "n_half_a",
        "n_half_b",
        "psi",
        (F.col("psi") < 0.1).alias("stable"),
        (F.col("psi") > 0.25).alias("action_needed"),
    )


QUERIES["q179_psi_drift"] = q179_psi_drift

ORACLE["q179_psi_drift"] = f"""
WITH {{qcte}},
h AS (
  SELECT qual.doc_id, qual.quality,
         CASE WHEN qual.doc_id % 2 = 0 THEN 1 ELSE 0 END AS half
  FROM qual
),
binned AS (
  SELECT LEAST(GREATEST(CAST(floor((quality - {PSI_LO!r}::DOUBLE)
                                   / {(PSI_HI - PSI_LO) / PSI_BINS!r}::DOUBLE)
                             AS INT), 0), {PSI_BINS - 1}) AS bin,
         half
  FROM h
),
bins AS (
  SELECT bin,
         sum(CASE WHEN half = 1 THEN 1 ELSE 0 END)::BIGINT AS ca,
         sum(CASE WHEN half = 0 THEN 1 ELSE 0 END)::BIGINT AS cb
  FROM binned GROUP BY bin
),
tot AS (
  SELECT sum(ca)::BIGINT AS na, sum(cb)::BIGINT AS nb FROM bins
),
ctr AS (
  SELECT bins.*, tot.na, tot.nb,
         CAST((CAST(ca + 1 AS DOUBLE) / CAST(na + {PSI_BINS} AS DOUBLE)
               - CAST(cb + 1 AS DOUBLE) / CAST(nb + {PSI_BINS} AS DOUBLE))
              * ln((CAST(ca + 1 AS DOUBLE) / CAST(na + {PSI_BINS} AS DOUBLE))
                   / (CAST(cb + 1 AS DOUBLE)
                      / CAST(nb + {PSI_BINS} AS DOUBLE)))
              AS DECIMAL(28,12)) AS contrib
  FROM bins, tot
)
SELECT count(*)::BIGINT AS n_bins_hit,
       max(na)::BIGINT AS n_half_a,
       max(nb)::BIGINT AS n_half_b,
       CAST(sum(contrib) AS DOUBLE) AS psi,
       CAST(sum(contrib) AS DOUBLE) < 0.1::DOUBLE AS stable,
       CAST(sum(contrib) AS DOUBLE) > 0.25::DOUBLE AS action_needed
FROM ctr
"""

ORACLE["q179_psi_drift"] = ORACLE["q179_psi_drift"].format(
    qcte="qual AS (SELECT doc_id, quality FROM ("
    + ORACLE["q23_quality"]
    + "))"
)

# --------------------------------------------------------------------------
# q181: two-sample Kolmogorov–Smirnov test between corpus halves'
# quality distributions — the EXACT nonparametric companion to q179's
# binned PSI (PSI says how much drift in bucketed mass; KS gives the
# max CDF gap with a distribution-free significance threshold — the
# pair a drift dashboard shows together). Evaluated at distinct
# values (the tie-correct convention), with the supremum kept as an
# EXACT integer numerator: D = max|c1·n2 − c2·n1| / (n1·n2) — the
# max ranges over int64, so the statistic is order-insensitive and
# cross-engine exact; the only doubles are the final division and
# the asymptotic threshold c(α)·sqrt((n1+n2)/(n1·n2)).
#
# Scale shape: one map-only quality pass, ONE (value) hash agg with
# conditional partials, one ordered cumsum over distinct values
# (range-partitioned rank at scale), a 1-row max rollup.
# --------------------------------------------------------------------------

KS_ALPHA_C = 1.358  # c(alpha) for alpha = 0.05


def q181_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_docs(spark, sf_dir).withColumn("toks", _tok_arr())
    q = docs.select(
        quality_col().alias("v"),
        (F.col("doc_id") % 2 == 0).cast("int").alias("half"),
    )
    per_v = q.groupBy("v").agg(
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
        .cast("long")
        .alias("c1"),
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0))
        .cast("long")
        .alias("c2"),
    )
    w = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = per_v.withColumn(
        "cum1", F.sum("c1").over(w).cast("long")
    ).withColumn("cum2", F.sum("c2").over(w).cast("long"))
    tot = F.broadcast(
        per_v.groupBy().agg(
            F.sum("c1").cast("long").alias("n1"),
            F.sum("c2").cast("long").alias("n2"),
        )
    )
    g = (
        cum.crossJoin(tot)
        .withColumn(
            "gap",
            F.abs(
                F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1")
            ).cast("long"),
        )
        .groupBy()
        .agg(
            F.max("gap").cast("long").alias("d_num"),
            F.max("n1").cast("long").alias("n1"),
            F.max("n2").cast("long").alias("n2"),
        )
    )
    d = F.col("d_num").cast("double") / (
        F.col("n1").cast("double") * F.col("n2").cast("double")
    )
    thresh = F.lit(KS_ALPHA_C) * F.sqrt(
        (F.col("n1") + F.col("n2")).cast("double")
        / (F.col("n1").cast("double") * F.col("n2").cast("double"))
    )
    return g.select(
        "n1",
        "n2",
        "d_num",
        d.alias("ks_d"),
        thresh.alias("threshold"),
        (d > thresh).alias("reject_same_dist"),
    )


QUERIES["q181_ks_test"] = q181_ks_test

ORACLE["q181_ks_test"] = f"""
WITH {{qcte}},
h AS (
  SELECT quality AS v,
         CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS half
  FROM qual
),
per_v AS (
  SELECT v,
         sum(CASE WHEN half = 1 THEN 1 ELSE 0 END)::BIGINT AS c1,
         sum(CASE WHEN half = 0 THEN 1 ELSE 0 END)::BIGINT AS c2
  FROM h GROUP BY v
),
cum AS (
  SELECT v,
         sum(c1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW)::BIGINT AS cum1,
         sum(c2) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW)::BIGINT AS cum2
  FROM per_v
),
tot AS (
  SELECT sum(c1)::BIGINT AS n1, sum(c2)::BIGINT AS n2 FROM per_v
),
g AS (
  SELECT max(abs(cum1 * n2 - cum2 * n1))::BIGINT AS d_num,
         max(n1)::BIGINT AS n1, max(n2)::BIGINT AS n2
  FROM cum, tot
)
SELECT n1, n2, d_num,
       CAST(d_num AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
         AS ks_d,
       {KS_ALPHA_C!r}::DOUBLE
         * sqrt(CAST(n1 + n2 AS DOUBLE)
                / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)))
         AS threshold,
       CAST(d_num AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
         > {KS_ALPHA_C!r}::DOUBLE
           * sqrt(CAST(n1 + n2 AS DOUBLE)
                  / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)))
         AS reject_same_dist
FROM g
"""

ORACLE["q181_ks_test"] = ORACLE["q181_ks_test"].format(
    qcte="qual AS (SELECT doc_id, quality FROM ("
    + ORACLE["q23_quality"]
    + "))"
)

# --------------------------------------------------------------------------
# q184: term burstiness / index of dispersion (Church/Gale 1995) —
# the "content word or function word?" diagnostic a stopword list,
# an IDF sanity check, and a topic-segmentation heuristic all read:
# function words occur evenly (variance ≈ mean, VMR ≈ 1 under
# Poisson), content words BURST (a doc either ignores the term or
# uses it repeatedly, VMR ≫ 1). Per term over per-doc tf INCLUDING
# zeros: mean = cf/N, VMR = variance/mean with the zero-doc mass
# folded in closed form — Σ(tf−μ)² over all N docs needs only the
# nonzero tf moments: Σtf² − 2μ·cf + N·μ² — so the zero docs are
# never materialized.
#
# Determinism: per-term moments are exact int64 (Σtf, Σtf²); VMR is
# ONE IEEE tree over them and N, NULL-free by df ≥ 1. Burstiness
# cf/df is exact-int division published as double. UNROUNDED.
# Scale shape: one (term) hash agg + a 1-row N broadcast; top head
# by VMR. At 100 TB the agg keys on xxhash64(term).
# --------------------------------------------------------------------------

BURST_TOP = 30
BURST_MIN_DF = 5


def q184_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_docs(spark, sf_dir).withColumn("toks", _tok_arr())
    tf = (
        docs.select("doc_id", F.explode("toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    per_term = tf.groupBy("term").agg(
        F.count("*").cast("long").alias("df"),
        F.sum("tf").cast("long").alias("cf"),
        F.sum(F.col("tf") * F.col("tf")).cast("long").alias("s2"),
    )
    n_row = F.broadcast(
        docs.groupBy().agg(F.count("*").cast("long").alias("n_docs"))
    )
    n = F.col("n_docs").cast("double")
    mu = F.col("cf").cast("double") / n
    var = (
        F.col("s2").cast("double")
        - F.lit(2.0) * mu * F.col("cf").cast("double")
        + n * mu * mu
    ) / n
    vmr = var / mu
    return (
        per_term.crossJoin(n_row)
        .filter(F.col("df") >= BURST_MIN_DF)
        .select(
            "term",
            "df",
            "cf",
            "s2",
            (F.col("cf").cast("double") / F.col("df").cast("double"))
            .alias("burstiness"),
            vmr.alias("vmr"),
        )
        .orderBy(F.desc("vmr"), F.asc("term"))
        .limit(BURST_TOP)
    )


QUERIES["q184_burstiness"] = q184_burstiness

ORACLE["q184_burstiness"] = f"""
WITH tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id,
               unnest(list_filter(string_split(text, ' '), x -> x <> ''))
                 AS term
        FROM documents)
  GROUP BY doc_id, term
),
per_term AS (
  SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf,
         sum(tf * tf)::BIGINT AS s2
  FROM tf GROUP BY term
),
nn AS (SELECT count(*)::BIGINT AS n_docs FROM documents)
SELECT term, df, cf, s2,
       CAST(cf AS DOUBLE) / CAST(df AS DOUBLE) AS burstiness,
       ((CAST(s2 AS DOUBLE)
         - 2.0::DOUBLE * (CAST(cf AS DOUBLE) / CAST(n_docs AS DOUBLE))
           * CAST(cf AS DOUBLE)
         + CAST(n_docs AS DOUBLE)
           * (CAST(cf AS DOUBLE) / CAST(n_docs AS DOUBLE))
           * (CAST(cf AS DOUBLE) / CAST(n_docs AS DOUBLE)))
        / CAST(n_docs AS DOUBLE))
       / (CAST(cf AS DOUBLE) / CAST(n_docs AS DOUBLE)) AS vmr
FROM per_term, nn
WHERE df >= {BURST_MIN_DF}
ORDER BY vmr DESC, term ASC
LIMIT {BURST_TOP}
"""

# --------------------------------------------------------------------------
# q188: deterministic Poisson-bootstrap confidence interval for the
# mean quality score — THE distributed bootstrap (each of B resamples
# weights every row by an independent Poisson(1) count, so resampling
# is a map-only weight column instead of n draws — the only bootstrap
# that runs in one pass over 100 TB). Determinism: the Poisson draw
# derives from the portable md5 hash of (doc_id, b) inverted through
# the Poisson(1) CDF as a fixed literal ladder (P(0)=.3679, …) — the
# same hash gives the same resample everywhere, so the CI is
# reproducible run to run and engine to engine (a property audit
# pipelines need and true RNG bootstraps lack).
#
# Scale shape: one corpus pass × B weight columns folded as a single
# explode(B) + (b) hash agg with DECIMAL(28,12) weighted partials;
# the B resample means then take an exact rank for the percentile CI
# (B is small — the 2.5%/97.5% probe is a 2-row window read).
# --------------------------------------------------------------------------

BOOT_B = 40
# Poisson(1) CDF ladder quantized to 9 digits of the uniform hash
_POIS_CDF = [
    367879441,   # P(X<=0)*1e9
    735758882,
    919698602,
    981011843,
    996340153,
    1000000000,  # everything else -> 5+ capped at 5
]


def q188_poisson_bootstrap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    docs = load_docs(spark, sf_dir).withColumn("toks", _tok_arr())
    q = docs.select("doc_id", quality_col().alias("quality"))
    b = F.explode(F.sequence(F.lit(1), F.lit(BOOT_B))).alias("b")
    rows = q.select("doc_id", "quality", b)
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws("#", F.col("doc_id"), F.col("b"))
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % 1_000_000_000
    )
    wgt = (
        F.when(u < _POIS_CDF[0], 0)
        .when(u < _POIS_CDF[1], 1)
        .when(u < _POIS_CDF[2], 2)
        .when(u < _POIS_CDF[3], 3)
        .when(u < _POIS_CDF[4], 4)
        .otherwise(5)
        .cast("long")
    )
    means = (
        rows.withColumn("w", wgt)
        .groupBy("b")
        .agg(
            F.sum("w").cast("long").alias("n_eff"),
            F.sum(
                (F.col("w").cast("double") * F.col("quality")).cast(
                    "decimal(28,12)"
                )
            ).alias("qsum"),
        )
        .filter(F.col("n_eff") > 0)
        .select(
            "b",
            (
                F.col("qsum").cast("double") / F.col("n_eff").cast("double")
            ).alias("mean_q"),
        )
    )
    wr = Window.orderBy("mean_q", "b")
    ranked = means.withColumn("r", F.row_number().over(wr))
    nb = F.broadcast(
        means.groupBy().agg(F.count("*").cast("long").alias("nb"))
    )
    lo_r = F.greatest(F.expr("cast(ceil(nb * 0.025) as long)"), F.lit(1))
    hi_r = F.expr("cast(ceil(nb * 0.975) as long)")
    g = (
        ranked.crossJoin(nb)
        .groupBy()
        .agg(
            F.max("nb").cast("long").alias("n_resamples"),
            F.max(F.when(F.col("r") == lo_r, F.col("mean_q"))).alias(
                "ci_lo"
            ),
            F.max(F.when(F.col("r") == hi_r, F.col("mean_q"))).alias(
                "ci_hi"
            ),
        )
    )
    full = F.broadcast(
        q.groupBy().agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.col("quality").cast("decimal(28,12)"))
            .cast("double")
            .alias("qs"),
        )
    )
    return (
        g.crossJoin(full)
        .select(
            "n_resamples",
            "n_docs",
            (F.col("qs") / F.col("n_docs").cast("double")).alias(
                "mean_quality"
            ),
            "ci_lo",
            "ci_hi",
        )
    )


QUERIES["q188_poisson_bootstrap"] = q188_poisson_bootstrap

_POIS_CASE = (
    f"CASE WHEN u < {_POIS_CDF[0]} THEN 0 "
    f"WHEN u < {_POIS_CDF[1]} THEN 1 "
    f"WHEN u < {_POIS_CDF[2]} THEN 2 "
    f"WHEN u < {_POIS_CDF[3]} THEN 3 "
    f"WHEN u < {_POIS_CDF[4]} THEN 4 ELSE 5 END"
)

ORACLE["q188_poisson_bootstrap"] = f"""
WITH {{qcte}},
rows_b AS (
  SELECT doc_id, quality, unnest(generate_series(1, {BOOT_B})) AS b
  FROM qual
),
uw AS (
  SELECT quality, b,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#'
                             || CAST(b AS VARCHAR)), 1, 15))::BIGINT
           % 1000000000 AS u
  FROM rows_b
),
wt AS (SELECT quality, b, {_POIS_CASE} AS w FROM uw),
means AS (
  SELECT b,
         sum(w)::BIGINT AS n_eff,
         CAST(sum(CAST(CAST(w AS DOUBLE) * quality AS DECIMAL(28,12)))
              AS DOUBLE) AS qsum
  FROM wt GROUP BY b HAVING sum(w) > 0
),
m2 AS (
  SELECT b, qsum / CAST(n_eff AS DOUBLE) AS mean_q FROM means
),
ranked AS (
  SELECT b, mean_q, row_number() OVER (ORDER BY mean_q, b) AS r FROM m2
),
nb AS (SELECT count(*)::BIGINT AS nb FROM m2),
g AS (
  SELECT max(nb)::BIGINT AS n_resamples,
         max(CASE WHEN r = GREATEST(CAST(ceil(nb * 0.025) AS BIGINT), 1)
                  THEN mean_q END) AS ci_lo,
         max(CASE WHEN r = CAST(ceil(nb * 0.975) AS BIGINT)
                  THEN mean_q END) AS ci_hi
  FROM ranked, nb
),
full_m AS (
  SELECT count(*)::BIGINT AS n_docs,
         CAST(sum(CAST(quality AS DECIMAL(28,12))) AS DOUBLE) AS qs
  FROM qual
)
SELECT g.n_resamples, f.n_docs,
       f.qs / CAST(f.n_docs AS DOUBLE) AS mean_quality,
       g.ci_lo, g.ci_hi
FROM g, full_m f
"""

ORACLE["q188_poisson_bootstrap"] = ORACLE["q188_poisson_bootstrap"].format(
    qcte="qual AS (SELECT doc_id, quality FROM ("
    + ORACLE["q23_quality"]
    + "))"
)

# --------------------------------------------------------------------------
# q192: word2vec negative-sampling table — the unigram^0.75
# distribution (Mikolov et al. NIPS'13) every embedding trainer
# materializes: per term the smoothed sampling weight cf^α and its
# cumulative probability range [cum_lo, cum_hi) over the (term)
# total order, which IS the inverse-CDF sampler a trainer keys
# uniforms into. α=0.75 flattens the head so frequent words don't
# swamp the negatives.
#
# Determinism: α = 3/4 exactly, so cf^0.75 = sqrt(cf·sqrt(cf)) —
# ONLY multiplies and sqrt, and IEEE 754 REQUIRES sqrt to be
# correctly rounded, so the weight is bit-identical on any engine
# (pow() AND exp() both differ by 1 ulp JVM-vs-libm — measured here
# before this rewrite; the q172 lesson extends to exp); the cumulative
# sum runs over the (term) total order — a window prefix sum is
# sequential along its order, so both engines fold identically.
# Scale shape: one (term) agg (vocab-sized), one ordered cumsum, a
# 1-row total broadcast. UNROUNDED.
# --------------------------------------------------------------------------

NEG_ALPHA = 0.75


def q192_negative_sampling(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    docs = load_docs(spark, sf_dir).withColumn("toks", _tok_arr())
    cf = (
        docs.select(F.explode("toks").alias("term"))
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("cf"))
    )
    cfd = F.col("cf").cast("double")
    wgt = F.sqrt(cfd * F.sqrt(cfd))
    w = Window.orderBy("term").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = cf.withColumn("w", wgt).withColumn(
        "cum_hi_w", F.sum("w").over(w)
    )
    tot = F.broadcast(
        cum.groupBy().agg(F.max("cum_hi_w").alias("total_w"))
    )
    return (
        cum.crossJoin(tot)
        .select(
            "term",
            "cf",
            "w",
            ((F.col("cum_hi_w") - F.col("w")) / F.col("total_w")).alias(
                "cum_lo"
            ),
            (F.col("cum_hi_w") / F.col("total_w")).alias("cum_hi"),
        )
        .orderBy("term")
    )


QUERIES["q192_negative_sampling"] = q192_negative_sampling

ORACLE["q192_negative_sampling"] = f"""
WITH cf AS (
  SELECT term, count(*)::BIGINT AS cf
  FROM (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> ''))
          AS term FROM documents)
  GROUP BY term
),
wt AS (
  SELECT term, cf,
         sqrt(CAST(cf AS DOUBLE) * sqrt(CAST(cf AS DOUBLE))) AS w
  FROM cf
),
cum AS (
  SELECT term, cf, w,
         sum(w) OVER (ORDER BY term ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS cum_hi_w
  FROM wt
),
tot AS (SELECT max(cum_hi_w) AS total_w FROM cum)
SELECT term, cf, w,
       (cum_hi_w - w) / total_w AS cum_lo,
       cum_hi_w / total_w AS cum_hi
FROM cum, tot
ORDER BY term
"""
