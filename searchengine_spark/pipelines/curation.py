"""Corpus-curation operators for the training-data pipeline over
``documents``: per-source quota downsampling, Gopher-style repetition
filtering, and PII redaction.

These are the passes a web-scale (Common-Crawl-style) corpus runs
between raw ingest and tokenization. Scale shapes:

* q35 quota sampling is a map-side filter against a broadcast per-source
  count — no per-document shuffle, so it runs at scan speed at 100 TB
  (the per-source table is |sources| rows, tiny even at 10^8 hosts
  relative to the corpus).
* q36 repetition metrics shuffle once on doc_id (exploded unigram
  counts with map-side partial aggregation); bigram distinctness is
  computed map-only with array expressions. No Python anywhere.
* q37 redaction is a pure map (regexp_replace/regexp_count), JVM-side,
  whole-stage-codegen'd.

The synthetic fixture text contains no PII-shaped substrings at all, so
q37 deterministically synthesizes a contact tail from ``doc_id`` on BOTH
engines before redacting — the oracle checks the redaction logic, not
the fixture's (empty) PII census.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .textstats import _tok_arr, load_docs

# q35: expected per-source cap (docs kept per source, in expectation —
# the keep test is exact/deterministic per doc, the cap is the mean)
SOURCE_CAP = 15
_Q35_SCALE = 1_000_000

# q36 keep thresholds (Gopher-style: drop if one word dominates or the
# bigram stream is mostly repeats)
TOP_WORD_FRAC_MAX = 0.20
DUP_BIGRAM_FRAC_MAX = 0.90

_EMAIL_RE = "[a-z0-9]+@[a-z0-9.]+"
_PHONE_RE = r"\+1-[0-9]{3}-[0-9]{4}"


def _doc_uniform() -> F.Column:
    """Deterministic uniform-ish integer in [0, _Q35_SCALE) from doc_id —
    the portable-hash idiom (md5 prefix) so DuckDB derives the identical
    value; used as the keep/drop coin for quota sampling."""
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    return h % F.lit(_Q35_SCALE)


def q35_source_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cap every source (host/domain analog) at SOURCE_CAP docs in
    expectation: keep doc iff u(doc) * n_source < CAP * SCALE, i.e.
    a deterministic per-doc coin with keep-rate CAP/n. Sources at or
    under the cap keep everything (the inequality is then always true
    ... for u < SCALE*CAP/n with n <= CAP, CAP*SCALE/n >= SCALE > u).
    Integer-only comparison — no float thresholds to drift."""
    docs = load_docs(spark, sf_dir)
    counts = docs.groupBy("source").agg(F.count("*").alias("n_source"))
    return (
        docs.join(F.broadcast(counts), "source")
        .filter(
            _doc_uniform() * F.col("n_source")
            < F.lit(SOURCE_CAP) * F.lit(_Q35_SCALE)
        )
        .select("doc_id", "source", F.col("n_source").cast("long").alias("n_source"))
        .orderBy("doc_id")
    )


def q36_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition metrics per document: fraction of the
    most-common word, fraction of duplicate bigrams, and the keep flag.
    Unigram mode via exploded count (the scalable shape — map-side
    partial agg, one shuffle on doc_id); bigram distinctness map-only."""
    docs = load_docs(spark, sf_dir).withColumn("toks", _tok_arr())
    uni = (
        docs.select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("cnt"))
        .groupBy("doc_id")
        .agg(
            F.max("cnt").alias("top_cnt"),
            F.sum("cnt").cast("long").alias("n_toks"),
            F.count("*").cast("long").alias("n_distinct"),
        )
    )
    n = F.size("toks")
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat(
                F.element_at("toks", i), F.lit(" "), F.element_at("toks", i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    big = docs.select(
        "doc_id", F.size(F.array_distinct(bigrams)).cast("long").alias("nb_distinct")
    )
    top_frac = F.round(F.col("top_cnt") / F.col("n_toks").cast("double"), 9)
    dup_big = F.when(
        F.col("n_toks") >= 2,
        F.round(
            F.lit(1.0)
            - F.col("nb_distinct") / (F.col("n_toks") - 1).cast("double"),
            9,
        ),
    ).otherwise(F.lit(0.0))
    return (
        uni.join(big, "doc_id")
        .select(
            "doc_id",
            "n_toks",
            "n_distinct",
            top_frac.alias("top_word_frac"),
            dup_big.alias("dup_bigram_frac"),
            (
                (top_frac <= TOP_WORD_FRAC_MAX)
                & (dup_big <= DUP_BIGRAM_FRAC_MAX)
            ).cast("int").alias("keep"),
        )
        .orderBy("doc_id")
    )


def _augmented_text() -> F.Column:
    """text + deterministic contact tail derived from doc_id (same
    expression in the DuckDB oracle)."""
    return F.concat(
        F.col("text"),
        F.lit(" contact user"),
        (F.col("doc_id") % 97).cast("string"),
        F.lit("@mail"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".com phone +1-"),
        F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )


def redacted_col(aug: F.Column) -> F.Column:
    return F.regexp_replace(
        F.regexp_replace(aug, _EMAIL_RE, "<EMAIL>"),
        _PHONE_RE,
        "<PHONE>",
    )


def q37_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex PII scrub: count then redact email- and phone-shaped spans
    (patterns kept inside the Java-regex ∩ RE2 common dialect so both
    engines compile them identically)."""
    docs = load_docs(spark, sf_dir).withColumn("aug", _augmented_text())
    red = redacted_col(F.col("aug"))
    return docs.select(
        "doc_id",
        F.regexp_count("aug", F.lit(_EMAIL_RE)).cast("int").alias("n_emails"),
        F.regexp_count("aug", F.lit(_PHONE_RE)).cast("int").alias("n_phones"),
        red.alias("redacted"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# q40: the end-to-end curation pipeline — every pass a 100 TB corpus runs
# between raw ingest and tokenization, composed into ONE plan:
# language-ID gate, quality gate, repetition gate, PII redaction, exact
# dedup (keep the canonical copy), per-source quota sampling.
#
# Composition shape (the scale story): the map-only passes (lang,
# quality, redaction) are fused as column EXPRESSIONS over a single
# documents scan — zero extra shuffles, one codegen stage — instead of
# joining their standalone q22/q23/q37 outputs back by doc_id (7 scans
# instead of 10 — the aggregating stages self-join, so each inherently
# scans twice, column-pruned). Only the
# genuinely aggregating passes join: repetition metrics (one doc_id
# shuffle), exact-dedup canonical ids (16-byte-hash shuffle), quota keep
# (broadcast per-source counts). All three joins share the doc_id key,
# so at scale they co-partition on one exchange. Swapping the exact-
# dedup stage for the near-dup clusters (q38) is a one-line change; the
# exact stage keeps the oracle cheap.
# --------------------------------------------------------------------------

CURATE_LANGS = ("en",)
CURATE_MIN_QUALITY = 0.45


def q40_curate_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import q15_dedup_exact
    from .textstats import pred_lang_col, quality_col

    docs = load_docs(spark, sf_dir).withColumn("toks", _tok_arr())
    mapped = docs.select(
        "doc_id",
        "source",
        pred_lang_col().alias("pred_lang"),
        quality_col().alias("quality"),
        redacted_col(_augmented_text()).alias("redacted"),
    )
    rep = q36_repetition_filter(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("rep_keep")
    )
    ded = q15_dedup_exact(spark, sf_dir).select("doc_id", "canonical_id")
    quota = q35_source_quota_sample(spark, sf_dir).select("doc_id")
    return (
        mapped.join(rep, "doc_id")
        .join(ded, "doc_id")
        .join(quota, "doc_id")
        .filter(
            F.col("pred_lang").isin(*CURATE_LANGS)
            & (F.col("quality") >= CURATE_MIN_QUALITY)
            & (F.col("rep_keep") == 1)
            & (F.col("doc_id") == F.col("canonical_id"))
        )
        .select("doc_id", "source", "pred_lang", "quality", "redacted")
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# q41: benchmark decontamination — flag training docs that share any
# K-word shingle with the held-out eval split. Scale shape: the eval set
# is tiny relative to the corpus (benchmarks are thousands of docs, the
# corpus is billions), so its distinct shingle set is BROADCAST and the
# train side is a map + explode + broadcast-hash semi-join — the 100 TB
# corpus is scanned once and never shuffled on text. The eval split is
# carved deterministically from the same table (doc_id % EVAL_MOD == 0)
# so the fixture needs no second dataset.
# --------------------------------------------------------------------------

DECON_K = 8  # words per shingle (n-gram size used by e.g. GPT-3/PaLM decon)
# doc_id % EVAL_MOD == 0 -> held-out eval split. 10 (not a more
# realistic 1000) so the fixture's dup structure actually crosses the
# split and the gate checks non-empty overlap at sf0.01 (6 docs / 312
# hits); the operator shape is split-fraction-independent.
EVAL_MOD = 10


def _shingles(k: int) -> F.Column:
    """Distinct k-word shingles of ``toks`` (space-joined), [] if the doc
    is shorter than k words. Same construction as the q36 bigram column."""
    n = F.size("toks")
    return F.when(
        n >= k,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n - (k - 1)),
                lambda i: F.concat_ws(" ", F.slice("toks", i, k)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def q41_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_docs(spark, sf_dir).withColumn("toks", _tok_arr())
    shd = docs.select("doc_id", _shingles(DECON_K).alias("shingles"))
    ev = (
        shd.filter(F.col("doc_id") % EVAL_MOD == 0)
        .select(F.explode("shingles").alias("s"))
        .distinct()
    )
    tr = shd.filter(F.col("doc_id") % EVAL_MOD != 0).select(
        "doc_id", F.explode("shingles").alias("s")
    )
    return (
        tr.join(F.broadcast(ev), "s")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_hit_shingles"))
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# q42: token-budget sequence packing — the concat-and-chunk packer every
# pretraining pipeline runs before batching: stream each source's docs
# in doc_id order into fixed TOKEN_BUDGET sequences (docs may straddle a
# boundary, exactly like the standard "concatenate then chunk" packer).
# Scale shape: the window is PARTITIONED BY source (shards pack
# independently, as real packers do per input shard), so the sort is
# per-source-parallel — never a single-partition global window.
# --------------------------------------------------------------------------

TOKEN_BUDGET = 2048


def q42_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_docs(spark, sf_dir).withColumn("toks", _tok_arr())
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    n_toks = F.size("toks").cast("long")
    per_doc = docs.select(
        "doc_id",
        "source",
        n_toks.alias("n_toks"),
        F.coalesce(F.sum(n_toks).over(w), F.lit(0)).alias("cum_excl"),
    )
    seq = F.floor(F.col("cum_excl") / F.lit(TOKEN_BUDGET)).cast("long")
    return (
        per_doc.select("doc_id", "source", "n_toks", seq.alias("seq_id"))
        .groupBy("source", "seq_id")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_toks").cast("long").alias("seq_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("source", "seq_id")
    )


# --------------------------------------------------------------------------
# q48: token-weighted mixture sampling — training mixtures are specified
# in TOKENS per source, not documents (a long-doc source at a doc quota
# still swamps the mix), so the keep-rate is budget/token-mass. Same
# integer-only coin as q35 (u·n_tokens < B·SCALE — no float thresholds),
# same broadcast-census shape: the per-source table is |sources| rows,
# the corpus-side pass is a map-only filter at scan speed at 100 TB.
# Output is the per-source census (rates, kept docs, kept token mass);
# the kept doc set itself is the same filter without the re-aggregation.
# --------------------------------------------------------------------------

MIX_TOKEN_BUDGET = 1300  # target tokens kept per source (in expectation)


def q48_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_docs(spark, sf_dir).select(
        "doc_id", "source", F.size(_tok_arr()).cast("long").alias("ntok")
    )
    per_src = docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("ntok").cast("long").alias("n_tokens"),
    )
    keep = _doc_uniform() * F.col("n_tokens") < F.lit(MIX_TOKEN_BUDGET) * F.lit(
        _Q35_SCALE
    )
    kept = (
        docs.join(F.broadcast(per_src), "source")
        .withColumn("keep", keep)
        .groupBy("source")
        .agg(
            F.sum(F.when(F.col("keep"), 1).otherwise(0))
            .cast("long")
            .alias("n_kept"),
            F.sum(F.when(F.col("keep"), F.col("ntok")).otherwise(0))
            .cast("long")
            .alias("kept_tokens"),
        )
    )
    rate = F.round(
        F.least(
            F.lit(1.0),
            F.lit(float(MIX_TOKEN_BUDGET)) / F.col("n_tokens").cast("double"),
        ),
        9,
    )
    return (
        per_src.join(kept, "source")
        .select(
            "source",
            "n_docs",
            "n_tokens",
            rate.alias("keep_rate"),
            "n_kept",
            "kept_tokens",
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# q53: exact-n stratified sample — q35/q48 cap strata IN EXPECTATION
# (map-only coin, no shuffle); when the contract is "exactly n docs per
# stratum" (eval-set carving, per-domain audit samples), the realization
# is a per-stratum top-n by hash rank: deterministic order (portable
# md5 coin, doc_id tie-break), one window per stratum — the per-source
# sort parallelizes across strata like q39's, and n rows survive per
# stratum, so the output is |strata|·n regardless of corpus size.
# --------------------------------------------------------------------------

STRATUM_N = 10  # docs kept per source, exactly (or all, if fewer)


def q53_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_docs(spark, sf_dir).select(
        "doc_id", "source", _doc_uniform().alias("u")
    )
    w = Window.partitionBy("source").orderBy("u", "doc_id")
    return (
        docs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= STRATUM_N)
        .select("source", F.col("rk").cast("long").alias("rk"), "doc_id")
        .orderBy("source", "rk")
    )


# --------------------------------------------------------------------------
# q57: exact-n WEIGHTED sampling without replacement per stratum —
# Efraimidis–Spirakis priority sampling. Each doc draws the portable
# uniform u = (h+1)/2^60 from its id hash and gets priority
# ln(u)/weight (monotone in the classic u^(1/w) key, using only ln and
# division — both bit-identical across Spark and DuckDB, unlike pow);
# the top-n priorities per stratum ARE a weight-proportional
# without-replacement sample. Complements q48 (weighted Bernoulli, n in
# expectation) and q53 (exact-n uniform).
# Scale: ranking runs TWO-PHASE — per-(stratum, salt) partial top-n,
# then top-n of the ≤ n·S survivors — so a billion-doc stratum never
# lands in a single window task. Exact by construction (the global
# top-n is a subset of the union of per-salt top-ns), so the oracle is
# the plain single-window SQL and pytest pins two-phase == one-phase.
# --------------------------------------------------------------------------

PRIO_SAMPLE_N = 10
PRIO_N_SALTS = 16
_PRIO_U_DEN = float(1 << 60)


def priority_sample(docs: DataFrame, two_phase: bool = True) -> DataFrame:
    from pyspark.sql import Window

    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    d = docs.select("doc_id", "source", "n_chars", h.alias("h")).withColumn(
        "prio",
        F.log((F.col("h") + 1) / F.lit(_PRIO_U_DEN)) / F.col("n_chars"),
    )
    if two_phase:
        w1 = Window.partitionBy("source", F.col("h") % PRIO_N_SALTS).orderBy(
            F.desc("prio"), F.asc("doc_id")
        )
        d = d.withColumn("prk", F.row_number().over(w1)).filter(
            F.col("prk") <= PRIO_SAMPLE_N
        )
    w2 = Window.partitionBy("source").orderBy(F.desc("prio"), F.asc("doc_id"))
    return (
        d.withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= PRIO_SAMPLE_N)
        .select(
            "source",
            F.col("rk").cast("long").alias("rk"),
            "doc_id",
            F.col("n_chars").alias("weight"),
            F.round("prio", 9).alias("priority"),
        )
        .orderBy("source", "rk")
    )


def q57_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return priority_sample(load_docs(spark, sf_dir))


# --------------------------------------------------------------------------
# q96: passage chunking with overlap — split each document into
# CHUNK_C-token windows at stride CHUNK_S (overlap C−S), the standard
# preprocessing for RAG retrieval corpora and long-document training.
# A trailing window is kept only if the previous window did not already
# reach the end of the document (no fully-contained remainder chunks) —
# an integer rule both engines evaluate identically.
#
# Scale shape: map-only — one split per doc, starts enumerated by an
# in-row sequence, chunks materialized by explode; no shuffle at all
# (the 100 TB chunker is exactly this projection). Output carries the
# portable 60-bit hash of each chunk's text instead of the text itself,
# so the gate pins exact string equality without corpus-sized rows.
# --------------------------------------------------------------------------

CHUNK_C = 64   # chunk length (tokens)
CHUNK_S = 48   # stride (overlap = 16)


def q96_passage_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import portable_hash

    docs = load_docs(spark, sf_dir).withColumn("toks", _tok_arr())
    n = F.size("toks")
    starts = F.filter(
        F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(CHUNK_S)),
        lambda s: (s == 1) | (s - CHUNK_S + CHUNK_C <= n),
    )
    chunked = docs.select(
        "doc_id",
        n.alias("doc_tokens"),
        F.explode(starts).alias("start"),
        "toks",
    ).select(
        "doc_id",
        "doc_tokens",
        ((F.col("start") - 1) / CHUNK_S).cast("int").alias("chunk_id"),
        "start",
        F.slice(F.col("toks"), F.col("start"), CHUNK_C).alias("chunk"),
    )
    return (
        chunked.filter(F.size("chunk") > 0)
        .select(
            "doc_id",
            "chunk_id",
            "start",
            F.size("chunk").cast("int").alias("n_tokens"),
            portable_hash(F.array_join(F.col("chunk"), " ")).alias(
                "chunk_hash"
            ),
        )
        .orderBy("doc_id", "chunk_id")
    )


# --------------------------------------------------------------------------
# q100: per-source boilerplate-shingle fingerprints — the template-
# detection audit behind boilerplate REMOVAL: shingles that recur across
# many documents of the SAME source are navigation chrome, licence
# blocks, or shared headers (within-source document frequency is the
# signal; cross-corpus dup coverage is q55's job). Reports each source's
# top-BOILER_TOP recurring shingles with their within-source df.
#
# Scale shape: one (source, shingle) hash agg — the q94 vocab-agg shape,
# Zipf-bounded (at 100 TB you'd dictionary-encode the shingle to an
# 8-byte hash for the shuffle and join the tiny winner set back for the
# display string; the fixture's vocabulary is small enough to carry the
# string straight through) — then a ranking window over each source's
# df >= BOILER_MIN_DF survivors only. Tie-break df DESC, shingle ASC.
# --------------------------------------------------------------------------

BOILER_TOP = 5
BOILER_MIN_DF = 2


def q100_boilerplate_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_docs(spark, sf_dir).withColumn("toks", _tok_arr())
    occ = docs.select(
        "source", "doc_id", F.explode(_shingles(DECON_K)).alias("s")
    )
    # _shingles is per-doc distinct, so count(*) IS the within-source df
    df_s = occ.groupBy("source", "s").agg(F.count("*").alias("df"))
    w = Window.partitionBy("source").orderBy(F.desc("df"), F.asc("s"))
    return (
        df_s.filter(F.col("df") >= BOILER_MIN_DF)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= BOILER_TOP)
        .select("source", "rank", F.col("s").alias("shingle"), "df")
        .orderBy("source", "rank")
    )


# --------------------------------------------------------------------------
# q103: per-source contamination-rate report — the mixture designer's
# view of q41: instead of the per-doc hit list, report for each source
# how many of its training docs share any DECON_K-shingle with the eval
# split and the resulting contamination rate (the number a pipeline
# tracks per snapshot to catch an upstream crawl drift; sources above a
# threshold get the q41 doc-level treatment).
#
# Scale shape: q41's broadcast eval-shingle semi-join (corpus scanned
# once, never shuffled on text) followed by a |sources|-row agg; the
# rate division happens once per source on exact bigint counts.
# --------------------------------------------------------------------------


def q103_contamination_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_docs(spark, sf_dir).withColumn("toks", _tok_arr())
    shd = docs.select(
        "doc_id", "source", _shingles(DECON_K).alias("shingles")
    )
    ev = (
        shd.filter(F.col("doc_id") % EVAL_MOD == 0)
        .select(F.explode("shingles").alias("s"))
        .distinct()
    )
    tr = shd.filter(F.col("doc_id") % EVAL_MOD != 0)
    hit_docs = (
        tr.select("doc_id", F.explode("shingles").alias("s"))
        .join(F.broadcast(ev), "s")
        .select("doc_id")
        .distinct()
    )
    contam = (
        tr.join(hit_docs, "doc_id")
        .groupBy("source")
        .agg(F.count("*").alias("n_contaminated"))
    )
    return (
        tr.groupBy("source")
        .agg(F.count("*").alias("n_train_docs"))
        .join(contam, "source", "left")
        .select(
            "source",
            "n_train_docs",
            F.coalesce(F.col("n_contaminated"), F.lit(0).cast("long")).alias(
                "n_contaminated"
            ),
            F.round(
                F.coalesce(F.col("n_contaminated"), F.lit(0).cast("long"))
                / F.col("n_train_docs"),
                9,
            ).alias("contamination_rate"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# q101: chunk-level (paragraph) dedup — the CCNet/RefinedWeb dedup
# granularity: whole-document hashing (q15) misses a page whose BODY is
# copied under fresh chrome, so web pipelines dedup fixed-size chunks
# and keep only each chunk's FIRST occurrence (corpus order). Reports
# per doc how many of its CHUNKDEDUP_C-token disjoint chunks are
# removed as repeats and the token share lost — the number that drives
# the "dedup removed X% of tokens" line in every dataset card.
#
# Scale shape: map-only chunk enumeration (q96's in-row starts, stride
# = length → disjoint), one ranking window PARTITIONED BY the 60-bit
# chunk hash (groups are occurrence lists — tiny; the shuffle moves
# (hash, doc_id, chunk_id, n_tokens), never text), then a per-doc hash
# agg. First-occurrence = row_number over (doc_id, chunk_id) — a total
# integer order both engines share.
# --------------------------------------------------------------------------

CHUNKDEDUP_C = 16  # dedup granularity (tokens) — finer than q96's RAG chunks


def q101_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from .dedup import portable_hash

    docs = load_docs(spark, sf_dir).withColumn("toks", _tok_arr())
    n = F.size("toks")
    starts = F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(CHUNKDEDUP_C))
    ch = (
        docs.select(
            "doc_id", "source", F.explode(starts).alias("start"), "toks"
        )
        .select(
            "doc_id",
            "source",
            ((F.col("start") - 1) / CHUNKDEDUP_C).cast("int").alias(
                "chunk_id"
            ),
            F.slice(F.col("toks"), F.col("start"), CHUNKDEDUP_C).alias(
                "chunk"
            ),
        )
        .filter(F.size("chunk") > 0)
        .select(
            "doc_id",
            "source",
            "chunk_id",
            F.size("chunk").cast("long").alias("n_tokens"),
            portable_hash(F.array_join(F.col("chunk"), " ")).alias("h"),
        )
    )
    w = Window.partitionBy("h").orderBy("doc_id", "chunk_id")
    flagged = ch.withColumn("rn", F.row_number().over(w))
    dup_toks = F.sum(
        F.when(F.col("rn") > 1, F.col("n_tokens")).otherwise(
            F.lit(0).cast("long")
        )
    )
    return (
        flagged.groupBy("doc_id", "source")
        .agg(
            F.count("*").cast("long").alias("n_chunks"),
            F.sum((F.col("rn") > 1).cast("long")).alias("n_dup_chunks"),
            F.sum("n_tokens").alias("n_tokens"),
            dup_toks.alias("dup_tokens"),
        )
        .select(
            "doc_id",
            "source",
            "n_chunks",
            "n_dup_chunks",
            "n_tokens",
            "dup_tokens",
            F.round(F.col("dup_tokens") / F.col("n_tokens"), 9).alias(
                "dup_token_rate"
            ),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# q105: n-gram novelty rate — the corpus-growth audit a crawl pipeline
# tracks per snapshot: for each doc (in corpus order), the share of its
# distinct DECON_K-shingles whose FIRST corpus occurrence is this doc.
# A feed whose novelty decays to ~0 is re-crawling what the corpus
# already holds; a consistently-high-novelty source is worth more crawl
# budget. Per-doc rows; docs shorter than the shingle width are dropped
# on both engines (no 0/0).
#
# Scale shape: one shingle-keyed hash agg (MIN doc_id — map-side
# combinable) + one join back on the shingle key, then a per-doc agg.
# At 100 TB the shingle would be dictionary-encoded to its 8-byte hash
# before the shuffle (q55's trick); the fixture's vocabulary is small
# enough to carry the string.
# --------------------------------------------------------------------------


def ngram_novelty_from(occ: DataFrame, key: str = "s") -> DataFrame:
    """Aggregation half of q105 over a (doc_id, source, <key>) shingle-
    occurrence table — also fed by the streaming twin's folded per-batch
    partials (which carry the 60-bit hash as the key, the 100 TB
    shape)."""
    first = occ.groupBy(key).agg(F.min("doc_id").alias("first_doc"))
    return (
        occ.join(first, key)
        .groupBy("doc_id", "source")
        .agg(
            F.count("*").cast("long").alias("n_shingles"),
            F.sum((F.col("first_doc") == F.col("doc_id")).cast("long")).alias(
                "n_novel"
            ),
        )
        .select(
            "doc_id",
            "source",
            "n_shingles",
            "n_novel",
            F.round(F.col("n_novel") / F.col("n_shingles"), 9).alias(
                "novelty_rate"
            ),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# q116: CHUNK-level quality gate — RefinedWeb/CCNet-style pipelines
# filter at passage granularity, not document granularity: a long page
# with one good section and three boilerplate ones keeps the good
# section and drops the rest (doc-level q23 would average them into
# one mediocre score and mis-decide all four). Applies q23's exact
# quality expressions to every q96 chunk; keep = quality ≥
# CHUNKQ_MIN_QUALITY.
#
# Scale shape: q96's map-only in-row chunk enumeration + explode, then
# q23's map-only expressions over the chunk — ZERO shuffles end to
# end; the 100 TB chunk filter is exactly this one codegen stage.
# --------------------------------------------------------------------------

CHUNKQ_MIN_QUALITY = 0.45  # same bar as the q40 doc gate


def q116_chunk_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .textstats import quality_col

    docs = load_docs(spark, sf_dir).withColumn("toks", _tok_arr())
    n = F.size("toks")
    starts = F.filter(
        F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(CHUNK_S)),
        lambda s: (s == 1) | (s - CHUNK_S + CHUNK_C <= n),
    )
    chunked = (
        docs.select("doc_id", F.explode(starts).alias("start"), "toks")
        .select(
            "doc_id",
            ((F.col("start") - 1) / CHUNK_S).cast("int").alias("chunk_id"),
            F.slice(F.col("toks"), F.col("start"), CHUNK_C).alias("chunk"),
        )
        .filter(F.size("chunk") > 0)
        # alias the chunk into the 'text'/'toks' names so q23's
        # expressions apply verbatim
        .select(
            "doc_id",
            "chunk_id",
            F.col("chunk").alias("toks"),
            F.array_join(F.col("chunk"), " ").alias("text"),
        )
    )
    quality = quality_col()
    return chunked.select(
        "doc_id",
        "chunk_id",
        F.size("toks").cast("int").alias("n_tokens"),
        quality.alias("quality"),
        (quality >= CHUNKQ_MIN_QUALITY).cast("int").alias("keep"),
    ).orderBy("doc_id", "chunk_id")


# --------------------------------------------------------------------------
# q113: token-budget WATERFILLING — the mixture-design solver behind
# every "cap each source at C tokens" dataset card line: given a total
# token budget B, find the per-source cap C such that
# Σ_s min(tokens_s, C) spends B (small sources keep everything, big
# sources truncate to the shared waterline — the allocation that
# maximizes the minimum source share). Closed form, not iterative:
# sort sources by size ASC; the boundary is the FIRST row where
# cum + (K − i)·n_s ≥ B, and C = (B − cum_{i−1}) DIV (K − i + 1).
#
# Scale shape: the corpus collapses to a |sources|-row exact-bigint
# census first (q48's shape); every window/join after that runs over
# that tiny table. Pure integer math — DIV, no float thresholds — so
# both engines agree bit-for-bit and the spend check is exact.
# --------------------------------------------------------------------------

WF_BUDGET_DEN = 2  # budget = total_tokens DIV 2


def q113_budget_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_docs(spark, sf_dir)
    src = (
        docs.select(
            "source", F.size(_tok_arr()).cast("long").alias("nt")
        )
        .groupBy("source")
        .agg(F.sum("nt").alias("n_tokens"))
    )
    # |sources| rows — the windows below are over the census, never docs
    w = Window.orderBy("n_tokens", "source")
    t = src.withColumn("i", F.row_number().over(w)).withColumn(
        "cum",
        F.sum("n_tokens").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    tot = src.agg(
        F.sum("n_tokens").alias("total"),
        F.count("*").alias("k_src"),
    ).select(
        "total",
        "k_src",
        F.expr(f"total DIV {WF_BUDGET_DEN}").alias("budget"),
    )
    t2 = t.crossJoin(F.broadcast(tot))
    # boundary always exists: row K has cum = total >= budget
    cap_row = (
        t2.filter(
            F.col("cum")
            + (F.col("k_src") - F.col("i")) * F.col("n_tokens")
            >= F.col("budget")
        )
        .orderBy("i")
        .limit(1)
        .select(
            F.expr(
                "(budget - (cum - n_tokens)) DIV (k_src - i + 1)"
            ).alias("cap")
        )
    )
    return (
        t2.crossJoin(F.broadcast(cap_row))
        .select(
            "source",
            "n_tokens",
            "budget",
            "cap",
            F.least(F.col("n_tokens"), F.col("cap")).alias("alloc_tokens"),
            (F.col("n_tokens") > F.col("cap")).cast("int").alias("capped"),
        )
        .orderBy("source")
    )


def novelty_occurrences(docs: DataFrame) -> DataFrame:
    """(doc_id, source, s) one row per distinct DECON_K-shingle per doc
    — q105's map half, shared with the streaming twin."""
    return docs.withColumn("toks", _tok_arr()).select(
        "doc_id", "source", F.explode(_shingles(DECON_K)).alias("s")
    )


def q105_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_novelty_from(novelty_occurrences(load_docs(spark, sf_dir)))


QUERIES = {
    "q35_source_quota_sample": q35_source_quota_sample,
    "q113_budget_waterfill": q113_budget_waterfill,
    "q116_chunk_quality": q116_chunk_quality,
    "q101_chunk_dedup": q101_chunk_dedup,
    "q105_ngram_novelty": q105_ngram_novelty,
    "q100_boilerplate_shingles": q100_boilerplate_shingles,
    "q103_contamination_rate": q103_contamination_rate,
    "q36_repetition_filter": q36_repetition_filter,
    "q37_pii_redact": q37_pii_redact,
    "q40_curate_pipeline": q40_curate_pipeline,
    "q41_decontaminate": q41_decontaminate,
    "q42_pack_sequences": q42_pack_sequences,
    "q48_mixture_sample": q48_mixture_sample,
    "q53_stratified_sample": q53_stratified_sample,
    "q57_priority_sample": q57_priority_sample,
    "q96_passage_chunks": q96_passage_chunks,
}

ORACLE = {
    "q53_stratified_sample": f"""
WITH r AS (
  SELECT source, doc_id,
         row_number() OVER (
           PARTITION BY source
           ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                    % {_Q35_SCALE}, doc_id
         )::BIGINT AS rk
  FROM documents
)
SELECT source, rk, doc_id FROM r WHERE rk <= {STRATUM_N}
ORDER BY source, rk
""",
    "q48_mixture_sample": f"""
WITH d AS (
  SELECT doc_id, source,
         len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT AS ntok
  FROM documents
),
s AS (
  SELECT source, count(*)::BIGINT AS n_docs, sum(ntok)::BIGINT AS n_tokens
  FROM d GROUP BY source
),
k AS (
  SELECT d.source,
         sum(CASE WHEN (('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT
                        % {_Q35_SCALE}) * s.n_tokens
                       < {MIX_TOKEN_BUDGET} * {_Q35_SCALE}
                  THEN 1 ELSE 0 END)::BIGINT AS n_kept,
         sum(CASE WHEN (('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT
                        % {_Q35_SCALE}) * s.n_tokens
                       < {MIX_TOKEN_BUDGET} * {_Q35_SCALE}
                  THEN d.ntok ELSE 0 END)::BIGINT AS kept_tokens
  FROM d JOIN s USING (source) GROUP BY d.source
)
SELECT s.source, s.n_docs, s.n_tokens,
       round(least(1.0::DOUBLE, {MIX_TOKEN_BUDGET}::DOUBLE / s.n_tokens), 9)
         AS keep_rate,
       k.n_kept, k.kept_tokens
FROM s JOIN k USING (source) ORDER BY source
""",
    "q35_source_quota_sample": f"""
WITH n AS (SELECT source, count(*) AS n_source FROM documents GROUP BY source)
SELECT d.doc_id, d.source, n.n_source::BIGINT AS n_source
FROM documents d JOIN n USING (source)
WHERE (('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT
       % {_Q35_SCALE}) * n.n_source < {SOURCE_CAP} * {_Q35_SCALE}
ORDER BY doc_id
""",
    "q36_repetition_filter": f"""
WITH d AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
u AS (SELECT doc_id, unnest(toks) AS tok FROM d),
c AS (SELECT doc_id, tok, count(*) AS cnt FROM u GROUP BY doc_id, tok),
s AS (
  SELECT doc_id, max(cnt) AS top_cnt, sum(cnt)::BIGINT AS n_toks,
         count(*)::BIGINT AS n_distinct
  FROM c GROUP BY doc_id
),
b AS (
  SELECT doc_id,
         len(list_distinct(list_transform(range(1, len(toks)),
             i -> toks[i] || ' ' || toks[i+1])))::BIGINT AS nb_distinct
  FROM d
),
m AS (
  SELECT s.doc_id, s.n_toks, s.n_distinct,
         round(s.top_cnt / CAST(s.n_toks AS DOUBLE), 9) AS top_word_frac,
         CASE WHEN s.n_toks >= 2
              THEN round(1.0 - b.nb_distinct / CAST(s.n_toks - 1 AS DOUBLE), 9)
              ELSE 0.0 END AS dup_bigram_frac
  FROM s JOIN b USING (doc_id)
)
SELECT doc_id, n_toks, n_distinct, top_word_frac, dup_bigram_frac,
       (top_word_frac <= {TOP_WORD_FRAC_MAX}
        AND dup_bigram_frac <= {DUP_BIGRAM_FRAC_MAX})::INT AS keep
FROM m ORDER BY doc_id
""",
    "q37_pii_redact": f"""
WITH a AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id % 97 AS VARCHAR)
              || '@mail' || CAST(doc_id % 7 AS VARCHAR)
              || '.com phone +1-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
              || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS aug
  FROM documents
)
SELECT doc_id,
       len(regexp_extract_all(aug, '{_EMAIL_RE}'))::INT AS n_emails,
       len(regexp_extract_all(aug, '\\+1-[0-9]{{3}}-[0-9]{{4}}'))::INT AS n_phones,
       regexp_replace(regexp_replace(aug, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                      '\\+1-[0-9]{{3}}-[0-9]{{4}}', '<PHONE>', 'g') AS redacted
FROM a ORDER BY doc_id
""",
    # DuckDB range(a,b) is end-EXCLUSIVE (Spark sequence is inclusive):
    # range(1, len-K+2) = 1..len-K+1 start positions; toks[i:i+K-1] is
    # the 1-based inclusive K-element slice.
    "q41_decontaminate": f"""
WITH d AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
sh AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= {DECON_K}
              THEN list_distinct(list_transform(
                     range(1, len(toks) - {DECON_K - 2}),
                     i -> array_to_string(toks[i:i+{DECON_K - 1}], ' ')))
              ELSE [] END AS shingles
  FROM d
),
ev AS (SELECT DISTINCT unnest(shingles) AS s FROM sh
       WHERE doc_id % {EVAL_MOD} = 0),
tr AS (SELECT doc_id, unnest(shingles) AS s FROM sh
       WHERE doc_id % {EVAL_MOD} <> 0)
SELECT tr.doc_id, count(*)::BIGINT AS n_hit_shingles
FROM tr JOIN ev USING (s)
GROUP BY tr.doc_id ORDER BY doc_id
""",
    "q42_pack_sequences": f"""
WITH d AS (
  SELECT doc_id, source,
         len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT
           AS n_toks
  FROM documents
),
c AS (
  SELECT doc_id, source, n_toks,
         COALESCE(sum(n_toks) OVER (PARTITION BY source ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_excl
  FROM d
)
SELECT source, CAST(floor(cum_excl / {TOKEN_BUDGET}) AS BIGINT) AS seq_id,
       count(*)::BIGINT AS n_docs, sum(n_toks)::BIGINT AS seq_tokens,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM c GROUP BY source, seq_id ORDER BY source, seq_id
""",
}

# q40 oracle: the stage oracles composed verbatim as subqueries (DuckDB
# allows a WITH inside a parenthesized subquery), joined on doc_id with
# the same keep predicates as the Spark plan. quality is rounded 9dp on
# both engines before the >= threshold, so the gate decisions agree.
from .dedup import ORACLE as _DEDUP_ORACLE  # noqa: E402
from .dedup import PORTABLE_HASH_SQL  # noqa: E402
from .textstats import ORACLE as _TS_ORACLE  # noqa: E402

ORACLE["q40_curate_pipeline"] = f"""
WITH lang AS (SELECT doc_id, pred_lang FROM ({_TS_ORACLE["q22_lang_id"]})),
qual AS (SELECT doc_id, quality FROM ({_TS_ORACLE["q23_quality"]})),
rep AS (SELECT doc_id, keep AS rep_keep FROM ({ORACLE["q36_repetition_filter"]})),
red AS (SELECT doc_id, redacted FROM ({ORACLE["q37_pii_redact"]})),
ded AS (SELECT doc_id, canonical_id FROM ({_DEDUP_ORACLE["q15_dedup_exact"]})),
quota AS (SELECT doc_id FROM ({ORACLE["q35_source_quota_sample"]})),
d AS (SELECT doc_id, source FROM documents)
SELECT d.doc_id, d.source, pred_lang, quality, redacted
FROM d JOIN lang USING (doc_id) JOIN qual USING (doc_id)
       JOIN rep USING (doc_id) JOIN red USING (doc_id)
       JOIN ded USING (doc_id) JOIN quota USING (doc_id)
WHERE pred_lang IN ({", ".join(f"'{l}'" for l in CURATE_LANGS)})
  AND quality >= {CURATE_MIN_QUALITY}
  AND rep_keep = 1 AND doc_id = canonical_id
ORDER BY doc_id
"""

# q57 oracle: the PLAIN single-window ranking — the two-phase salted
# rewrite must be semantically invisible (same exact rows).
ORACLE["q57_priority_sample"] = f"""
WITH d AS (
  SELECT source, doc_id, n_chars,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM documents
),
p AS (
  SELECT source, doc_id, n_chars,
         ln((h + 1)::DOUBLE / {int(_PRIO_U_DEN)}::DOUBLE) / n_chars AS prio
  FROM d
),
r AS (
  SELECT source, doc_id, n_chars, prio,
         row_number() OVER (
           PARTITION BY source ORDER BY prio DESC, doc_id
         )::BIGINT AS rk
  FROM p
)
SELECT source, rk, doc_id, n_chars AS weight, round(prio, 9) AS priority
FROM r WHERE rk <= {PRIO_SAMPLE_N}
ORDER BY source, rk
"""
# q96: same start enumeration (end-exclusive range -> +1) and the same
# integer keep-rule; chunk strings hash via the portable 60-bit md5.
ORACLE["q96_passage_chunks"] = f"""
WITH d AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
b AS (SELECT doc_id, toks, len(toks) AS n FROM d),
st AS (
  SELECT doc_id, n, toks, s
  FROM b, unnest(range(1, greatest(n, 1) + 1, {CHUNK_S})) AS u(s)
  WHERE s = 1 OR s - {CHUNK_S} + {CHUNK_C} <= n
),
ch AS (
  SELECT doc_id,
         ((s - 1) / {CHUNK_S})::INT AS chunk_id,
         s::INT AS start,
         toks[s : s + {CHUNK_C} - 1] AS chunk
  FROM st
)
SELECT doc_id, chunk_id, start, len(chunk)::INT AS n_tokens,
       {PORTABLE_HASH_SQL.format(c="array_to_string(chunk, ' ')")}
         AS chunk_hash
FROM ch WHERE len(chunk) > 0
ORDER BY doc_id, chunk_id
"""

# q100: same per-doc-distinct shingle construction as q41's CTE; count(*)
# over (source, shingle) is the within-source df; ranking window matches
# the Spark tie-break (df DESC, shingle ASC).
# q101: q96's start enumeration at stride = chunk length (disjoint);
# first occurrence = row_number over (doc_id, chunk_id) per chunk hash —
# a total integer order; rate = bigint/bigint true division, same IEEE
# op both engines.
ORACLE["q101_chunk_dedup"] = f"""
WITH d AS (
  SELECT doc_id, source,
         list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
b AS (SELECT doc_id, source, toks, len(toks) AS n FROM d),
st AS (
  SELECT doc_id, source, toks, s
  FROM b, unnest(range(1, greatest(n, 1) + 1, {CHUNKDEDUP_C})) AS u(s)
),
ch AS (
  SELECT doc_id, source,
         ((s - 1) / {CHUNKDEDUP_C})::INT AS chunk_id,
         toks[s : s + {CHUNKDEDUP_C} - 1] AS chunk
  FROM st
),
cc AS (
  SELECT doc_id, source, chunk_id, len(chunk)::BIGINT AS n_tokens,
         {PORTABLE_HASH_SQL.format(c="array_to_string(chunk, ' ')")} AS h
  FROM ch WHERE len(chunk) > 0
),
rn AS (
  SELECT *, row_number() OVER (PARTITION BY h ORDER BY doc_id, chunk_id)
         AS rn
  FROM cc
)
SELECT doc_id, source,
       count(*)::BIGINT AS n_chunks,
       sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup_chunks,
       sum(n_tokens)::BIGINT AS n_tokens,
       sum(CASE WHEN rn > 1 THEN n_tokens ELSE 0 END)::BIGINT AS dup_tokens,
       round(sum(CASE WHEN rn > 1 THEN n_tokens ELSE 0 END)::BIGINT
             / sum(n_tokens)::BIGINT, 9) AS dup_token_rate
FROM rn GROUP BY doc_id, source ORDER BY doc_id
"""

# q105: q41's shingle CTE; MIN(doc_id) per shingle is the first corpus
# occurrence; novelty divides exact bigints once per doc.
ORACLE["q105_ngram_novelty"] = f"""
WITH d AS (
  SELECT doc_id, source,
         list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
sh AS (
  SELECT doc_id, source,
         unnest(list_distinct(list_transform(
           generate_series(1, len(toks) - {DECON_K - 1}),
           i -> array_to_string(toks[i : i + {DECON_K - 1}], ' ')))) AS s
  FROM d WHERE len(toks) >= {DECON_K}
),
fst AS (SELECT s, min(doc_id) AS first_doc FROM sh GROUP BY s)
SELECT doc_id, source,
       count(*)::BIGINT AS n_shingles,
       sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)::BIGINT
         AS n_novel,
       round(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)::BIGINT
             / count(*), 9) AS novelty_rate
FROM sh JOIN fst USING (s)
GROUP BY doc_id, source ORDER BY doc_id
"""

ORACLE["q100_boilerplate_shingles"] = f"""
WITH d AS (
  SELECT doc_id, source,
         list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
sh AS (
  SELECT doc_id, source,
         CASE WHEN len(toks) >= {DECON_K}
              THEN list_distinct(list_transform(
                     range(1, len(toks) - {DECON_K - 2}),
                     i -> array_to_string(toks[i:i+{DECON_K - 1}], ' ')))
              ELSE [] END AS shingles
  FROM d
),
occ AS (SELECT source, doc_id, unnest(shingles) AS s FROM sh),
dfs AS (SELECT source, s, count(*) AS df FROM occ GROUP BY source, s)
SELECT source, rank, s AS shingle, df
FROM (SELECT source, s, df,
             row_number() OVER (PARTITION BY source
               ORDER BY df DESC, s ASC) AS rank
      FROM dfs WHERE df >= {BOILER_MIN_DF})
WHERE rank <= {BOILER_TOP}
ORDER BY source, rank
"""

# q103: q41's shingle/eval CTEs + a per-source rollup; the rate divides
# exact bigint counts once per source.
ORACLE["q103_contamination_rate"] = f"""
WITH d AS (
  SELECT doc_id, source,
         list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
sh AS (
  SELECT doc_id, source,
         CASE WHEN len(toks) >= {DECON_K}
              THEN list_distinct(list_transform(
                     range(1, len(toks) - {DECON_K - 2}),
                     i -> array_to_string(toks[i:i+{DECON_K - 1}], ' ')))
              ELSE [] END AS shingles
  FROM d
),
ev AS (SELECT DISTINCT unnest(shingles) AS s FROM sh
       WHERE doc_id % {EVAL_MOD} = 0),
tr AS (SELECT doc_id, source, shingles FROM sh
       WHERE doc_id % {EVAL_MOD} <> 0),
hits AS (
  SELECT DISTINCT t.doc_id
  FROM (SELECT doc_id, unnest(shingles) AS s FROM tr) t JOIN ev USING (s)
),
contam AS (
  SELECT source, count(*) AS n_contaminated
  FROM tr JOIN hits USING (doc_id) GROUP BY source
)
SELECT tr.source, count(*) AS n_train_docs,
       coalesce(any_value(contam.n_contaminated), 0)::BIGINT
         AS n_contaminated,
       round(coalesce(any_value(contam.n_contaminated), 0)
             / count(*), 9) AS contamination_rate
FROM tr LEFT JOIN contam ON tr.source = contam.source
GROUP BY tr.source ORDER BY tr.source
"""

# q113: identical census/boundary/cap chain; integer DIV both engines
# (operands positive, so truncate == floor).
ORACLE["q113_budget_waterfill"] = f"""
WITH src AS (
  SELECT source,
         sum(len(list_filter(string_split(text, ' '),
                             x -> x <> '')))::BIGINT AS n_tokens
  FROM documents GROUP BY source
),
t AS (
  SELECT source, n_tokens,
         row_number() OVER (ORDER BY n_tokens, source) AS i,
         sum(n_tokens) OVER (ORDER BY n_tokens, source
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM src
),
tot AS (
  SELECT sum(n_tokens)::BIGINT AS total, count(*)::BIGINT AS k_src,
         sum(n_tokens)::BIGINT // {WF_BUDGET_DEN} AS budget
  FROM src
),
cap_row AS (
  SELECT ((budget - (cum - n_tokens)) // (k_src - i + 1))::BIGINT AS cap
  FROM t CROSS JOIN tot
  WHERE cum + (k_src - i) * n_tokens >= budget
  ORDER BY i LIMIT 1
)
SELECT source, n_tokens, budget, cap,
       least(n_tokens, cap)::BIGINT AS alloc_tokens,
       CASE WHEN n_tokens > cap THEN 1 ELSE 0 END::INT AS capped
FROM t CROSS JOIN tot CROSS JOIN cap_row
ORDER BY source
"""

# q116: q96's chunk CTE + q23's quality expressions over the chunk's
# joined text — identical shapes to both gated parents.
from .textstats import STOPWORDS as _Q116_STOPS  # noqa: E402


def _q116_oracle() -> str:
    stops = ", ".join(f"'{w}'" for w in _Q116_STOPS)
    return f"""
WITH d AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
b AS (SELECT doc_id, toks, len(toks) AS n FROM d),
st AS (
  SELECT doc_id, n, toks, s
  FROM b, unnest(range(1, greatest(n, 1) + 1, {CHUNK_S})) AS u(s)
  WHERE s = 1 OR s - {CHUNK_S} + {CHUNK_C} <= n
),
ch AS (
  SELECT doc_id,
         ((s - 1) / {CHUNK_S})::INT AS chunk_id,
         toks[s : s + {CHUNK_C} - 1] AS chunk
  FROM st
),
cq AS (
  SELECT doc_id, chunk_id, chunk,
         array_to_string(chunk, ' ') AS txt,
         len(chunk) AS n_toks
  FROM ch WHERE len(chunk) > 0
),
parts AS (
  SELECT doc_id, chunk_id, n_toks,
         length(txt) AS n_chars,
         length(regexp_replace(txt, '[^a-z0-9]', '', 'g')) AS n_alnum,
         len(list_filter(chunk, x -> x IN ({stops}))) AS n_stop,
         list_reduce(list_prepend(0::BIGINT,
           list_transform(chunk, x -> length(x)::BIGINT)),
           (acc, x) -> acc + x) / CAST(len(chunk) AS DOUBLE) AS mean_tok_len
  FROM cq
),
scored AS (
  SELECT doc_id, chunk_id, n_toks,
         round(0.4 * least(n_toks / 100.0, 1.0)
             + 0.3 * (1.0 - (n_chars - n_alnum) / CAST(n_chars AS DOUBLE))
             + 0.2 * (n_stop / CAST(n_toks AS DOUBLE))
             + 0.1 * least(mean_tok_len / 8.0, 1.0), 9) AS quality
  FROM parts
)
SELECT doc_id, chunk_id, n_toks::INT AS n_tokens, quality,
       CASE WHEN quality >= {CHUNKQ_MIN_QUALITY} THEN 1 ELSE 0 END::INT
         AS keep
FROM scored ORDER BY doc_id, chunk_id
"""


ORACLE["q116_chunk_quality"] = _q116_oracle()


# --------------------------------------------------------------------------
# q125: curation funnel report — the per-source attrition table every
# dataset card publishes (Gopher/RefinedWeb style): how many docs each
# source loses at each gate of q40's pipeline, in q40's gate order
# (lang -> quality -> repetition -> exact dedup). q40 emits the
# SURVIVORS; this emits the per-stage counts that justify them — the
# diagnostic that tells you WHICH gate is eating a feed before you
# re-tune thresholds.
#
# Scale shape: the same map-only flag expressions as q40 (lang argmax,
# 9dp-rounded quality, repetition fractions) plus q15's md5-keyed
# first-occurrence join; gates fold to int flags IN ROW, then ONE
# |sources|-row conditional-sum agg — the report adds no shuffle beyond
# the gates themselves. Gate flags are cumulative (gN implies gN-1), so
# the columns read as a funnel directly.
# --------------------------------------------------------------------------


def q125_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import q15_dedup_exact
    from .textstats import pred_lang_col, quality_col

    docs = load_docs(spark, sf_dir).withColumn("toks", _tok_arr())
    base = docs.select(
        "doc_id",
        "source",
        pred_lang_col().alias("pred_lang"),
        quality_col().alias("quality"),
    )
    rep = q36_repetition_filter(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("rep_keep")
    )
    ded = q15_dedup_exact(spark, sf_dir).select("doc_id", "canonical_id")
    g1 = F.col("pred_lang").isin(*CURATE_LANGS)
    g2 = g1 & (F.col("quality") >= CURATE_MIN_QUALITY)
    g3 = g2 & (F.col("rep_keep") == 1)
    g4 = g3 & (F.col("doc_id") == F.col("canonical_id"))
    flagged = (
        base.join(rep, "doc_id")
        .join(ded, "doc_id")
        .select(
            "source",
            g1.cast("long").alias("g1"),
            g2.cast("long").alias("g2"),
            g3.cast("long").alias("g3"),
            g4.cast("long").alias("g4"),
        )
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("g1").alias("after_lang"),
            F.sum("g2").alias("after_quality"),
            F.sum("g3").alias("after_repetition"),
            F.sum("g4").alias("after_dedup"),
        )
        .withColumn(
            "survival_rate",
            F.col("after_dedup").cast("double") / F.col("n_docs"),
        )
        .orderBy("source")
    )


QUERIES["q125_curation_funnel"] = q125_curation_funnel

ORACLE["q125_curation_funnel"] = f"""
WITH lang AS (SELECT doc_id, pred_lang FROM ({_TS_ORACLE["q22_lang_id"]})),
qual AS (SELECT doc_id, quality FROM ({_TS_ORACLE["q23_quality"]})),
rep AS (SELECT doc_id, keep AS rep_keep FROM ({ORACLE["q36_repetition_filter"]})),
ded AS (SELECT doc_id, canonical_id FROM ({_DEDUP_ORACLE["q15_dedup_exact"]})),
d AS (SELECT doc_id, source FROM documents),
g AS (
  SELECT d.source,
         CASE WHEN pred_lang IN ({", ".join(f"'{l}'" for l in CURATE_LANGS)})
              THEN 1 ELSE 0 END AS g1,
         CASE WHEN pred_lang IN ({", ".join(f"'{l}'" for l in CURATE_LANGS)})
               AND quality >= {CURATE_MIN_QUALITY}
              THEN 1 ELSE 0 END AS g2,
         CASE WHEN pred_lang IN ({", ".join(f"'{l}'" for l in CURATE_LANGS)})
               AND quality >= {CURATE_MIN_QUALITY} AND rep_keep = 1
              THEN 1 ELSE 0 END AS g3,
         CASE WHEN pred_lang IN ({", ".join(f"'{l}'" for l in CURATE_LANGS)})
               AND quality >= {CURATE_MIN_QUALITY} AND rep_keep = 1
               AND d.doc_id = canonical_id
              THEN 1 ELSE 0 END AS g4
  FROM d JOIN lang USING (doc_id) JOIN qual USING (doc_id)
         JOIN rep USING (doc_id) JOIN ded USING (doc_id)
)
SELECT source, count(*)::BIGINT AS n_docs,
       sum(g1)::BIGINT AS after_lang,
       sum(g2)::BIGINT AS after_quality,
       sum(g3)::BIGINT AS after_repetition,
       sum(g4)::BIGINT AS after_dedup,
       sum(g4)::BIGINT::DOUBLE / count(*) AS survival_rate
FROM g GROUP BY source ORDER BY source
"""


# --------------------------------------------------------------------------
# q131: temperature-scaled source mixture weights (alpha = 0.5) — the
# standard multilingual/multi-source LM sampling rule (Conneau & Lample
# 2019; mT5's alpha-sampling): sampling weight per source proportional
# to (token mass)^alpha, which up-weights small sources relative to
# proportional sampling without letting any source dominate. q48 samples
# at a FIXED per-source budget; this computes the budget VECTOR itself.
#
# Cross-engine exactness: alpha = 0.5 makes the power a single IEEE
# sqrt (correctly rounded in every engine); the weight denominator is a
# sum of floor(sqrt(...)) INTEGERS (exact, order-insensitive at any
# parallelism — never a float sum), and each output float is one
# identical IEEE expression tree over exact int64 inputs, so Spark and
# DuckDB agree bit-for-bit with no round() anywhere (CLAUDE.md rule).
#
# Scale shape: one corpus scan -> |sources|-row census; the sqrt/total
# ride a 1-row broadcast. Map-only at 100 TB beyond the census agg.
# --------------------------------------------------------------------------

TEMP_MIX_BUDGET = 100_000  # global training-token budget to allocate


def q131_temperature_mixture(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_docs(spark, sf_dir).select(
        "source", F.size(_tok_arr()).cast("long").alias("ntok")
    )
    per_src = docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("ntok").cast("long").alias("n_tokens"),
    )
    # integer-valued sqrt weight: floor of the correctly-rounded IEEE
    # sqrt — both engines compute the identical double, so the floor is
    # identical; summing the resulting int64s is exact in any order
    per_src = per_src.withColumn(
        "w_sqrt",
        F.floor(F.sqrt(F.col("n_tokens").cast("double"))).cast("long"),
    )
    tot = per_src.agg(F.sum("w_sqrt").alias("w_total"))
    weight = F.col("w_sqrt").cast("double") / F.col("w_total").cast("double")
    return (
        per_src.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "w_sqrt",
            weight.alias("weight"),
            (weight * F.lit(float(TEMP_MIX_BUDGET))).alias("alloc_tokens"),
            (
                (weight * F.lit(float(TEMP_MIX_BUDGET)))
                / F.col("n_tokens").cast("double")
            ).alias("epochs"),
        )
        .orderBy("source")
    )


QUERIES["q131_temperature_mixture"] = q131_temperature_mixture

ORACLE["q131_temperature_mixture"] = f"""
WITH d AS (
  SELECT source,
         len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT AS ntok
  FROM documents
),
census AS (
  SELECT source, count(*)::BIGINT AS n_docs, sum(ntok)::BIGINT AS n_tokens
  FROM d GROUP BY source
),
w AS (
  SELECT *, CAST(floor(sqrt(n_tokens::DOUBLE)) AS BIGINT) AS w_sqrt
  FROM census
),
tot AS (SELECT sum(w_sqrt)::BIGINT AS w_total FROM w)
SELECT source, n_docs, n_tokens, w_sqrt,
       w_sqrt::DOUBLE / w_total::DOUBLE AS weight,
       (w_sqrt::DOUBLE / w_total::DOUBLE) * CAST('{float(TEMP_MIX_BUDGET)}' AS DOUBLE)
         AS alloc_tokens,
       ((w_sqrt::DOUBLE / w_total::DOUBLE) * CAST('{float(TEMP_MIX_BUDGET)}' AS DOUBLE))
         / n_tokens::DOUBLE AS epochs
FROM w CROSS JOIN tot
ORDER BY source
"""


# --------------------------------------------------------------------------
# q147: crawl-budget apportionment by largest remainder (Hamilton's
# method) — the frontier-side twin of q113's token waterfilling: a
# crawler with a global per-cycle fetch budget splits it across hosts
# proportionally to observed host mass, and the split must be EXACT
# (allocations sum to the budget, no float drift deciding who gets the
# marginal fetch). Reference tie: the crawler caps its frontier per
# iteration (Crawler.java:53-56) but splits naively; this is the
# proportional policy a production frontier uses.
#
# Scale shape: one corpus scan → |sources|-row census (map-side-
# combinable sum), then pure-integer arithmetic and one |sources|-row
# remainder-rank window. Everything is exact int64 — base share
# (B·w) div W, remainder (B·w) mod W, and the top-r "+1" by remainder
# rank (remainder DESC, source ASC total order) — bit-identical at any
# parallelism and across engines with no float anywhere. The invariant
# sum(alloc) == B is pinned by the property test.
# --------------------------------------------------------------------------

CRAWL_BUDGET = 1_000_000  # fetches to apportion per crawl cycle


def q147_crawl_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_docs(spark, sf_dir)
    src = docs.groupBy("source").agg(
        F.sum("n_chars").cast("long").alias("w")
    )
    tot = src.groupBy().agg(F.sum("w").cast("long").alias("ww"))
    base = (
        src.crossJoin(F.broadcast(tot))
        .withColumn(
            "base", F.expr(f"({CRAWL_BUDGET} * w) div ww").cast("long")
        )
        .withColumn(
            "rem", F.expr(f"({CRAWL_BUDGET} * w) % ww").cast("long")
        )
    )
    short = base.groupBy().agg(
        (F.lit(CRAWL_BUDGET) - F.sum("base")).cast("long").alias("r")
    )
    wr = Window.orderBy(F.desc("rem"), F.asc("source"))
    out = (
        base.withColumn(
            "rem_rank", F.row_number().over(wr).cast("long")
        )
        .crossJoin(F.broadcast(short))
        .withColumn(
            "extra",
            (F.col("rem_rank") <= F.col("r")).cast("int"),
        )
        .withColumn(
            "alloc", (F.col("base") + F.col("extra")).cast("long")
        )
    )
    return out.select(
        "source", "w", "ww", "base", "rem", "rem_rank", "extra", "alloc"
    ).orderBy("source")


QUERIES["q147_crawl_budget"] = q147_crawl_budget

ORACLE["q147_crawl_budget"] = f"""
WITH src AS (
  SELECT source, sum(n_chars)::BIGINT AS w FROM documents GROUP BY source
),
tot AS (SELECT sum(w)::BIGINT AS ww FROM src),
base AS (
  SELECT source, w, ww,
         (({CRAWL_BUDGET} * w) // ww)::BIGINT AS base,
         (({CRAWL_BUDGET} * w) % ww)::BIGINT AS rem
  FROM src, tot
),
short AS (SELECT ({CRAWL_BUDGET} - sum(base))::BIGINT AS r FROM base),
rk AS (
  SELECT *, row_number() OVER (ORDER BY rem DESC, source ASC)::BIGINT
              AS rem_rank
  FROM base
)
SELECT source, w, ww, base, rem, rem_rank,
       (CASE WHEN rem_rank <= r THEN 1 ELSE 0 END)::INT AS extra,
       (base + CASE WHEN rem_rank <= r THEN 1 ELSE 0 END)::BIGINT AS alloc
FROM rk, short
ORDER BY source
"""


# --------------------------------------------------------------------------
# q155: Gini concentration of source token mass — the corpus-balance
# headline number: how unequally training-token mass is spread across
# sources (0 = perfectly balanced, →1 = one feed dominates). The
# scalar a mixture policy (q48/q113/q131) is judged by after it runs,
# and the alert that fires when one crawl feed starts swamping the mix.
#
#   gini = (2·Σ i·w_(i)) / (n·Σw) − (n+1)/n   (w ascending, i = 1..n)
#
# Scale shape: one corpus scan → |sources|-row census, one |sources|-
# row rank window, one 1-row rollup. Σ i·w is exact int64 (rank ×
# token count), so the reduction is order-insensitive; the two ratio
# terms are identical IEEE trees over exact integers, UNROUNDED.
# Ties in w are totally ordered by (w, source) — a defined variant,
# deterministic on both engines.
# --------------------------------------------------------------------------


def q155_source_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_docs(spark, sf_dir)
    src = docs.select(
        "source", F.size(_tok_arr()).cast("long").alias("nt")
    ).groupBy("source").agg(F.sum("nt").cast("long").alias("w"))
    wr = Window.orderBy(F.asc("w"), F.asc("source"))
    ranked = src.withColumn("i", F.row_number().over(wr).cast("long"))
    g = ranked.groupBy().agg(
        F.count("*").cast("long").alias("n_sources"),
        F.sum("w").cast("long").alias("total_w"),
        F.sum(F.col("i") * F.col("w")).cast("long").alias("iw_sum"),
        F.max("w").cast("long").alias("max_w"),
    )
    two_iw = F.col("iw_sum").cast("double") * F.lit(2.0)
    denom = F.col("n_sources").cast("double") * F.col("total_w").cast(
        "double"
    )
    corr = (F.col("n_sources") + 1).cast("double") / F.col(
        "n_sources"
    ).cast("double")
    return g.select(
        "n_sources",
        "total_w",
        "iw_sum",
        "max_w",
        (two_iw / denom - corr).alias("gini"),
        (
            F.col("max_w").cast("double") / F.col("total_w").cast("double")
        ).alias("top_share"),
    )


QUERIES["q155_source_gini"] = q155_source_gini

ORACLE["q155_source_gini"] = """
WITH src AS (
  SELECT source,
         sum(len(list_filter(string_split(text, ' '), x -> x <> '')))::BIGINT
           AS w
  FROM documents GROUP BY source
),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY w ASC, source ASC)::BIGINT AS i
  FROM src
),
g AS (
  SELECT count(*)::BIGINT AS n_sources,
         sum(w)::BIGINT AS total_w,
         sum(i * w)::BIGINT AS iw_sum,
         max(w)::BIGINT AS max_w
  FROM ranked
)
SELECT n_sources, total_w, iw_sum, max_w,
       (CAST(iw_sum AS DOUBLE) * 2.0::DOUBLE)
         / (CAST(n_sources AS DOUBLE) * CAST(total_w AS DOUBLE))
         - CAST(n_sources + 1 AS DOUBLE) / CAST(n_sources AS DOUBLE)
         AS gini,
       CAST(max_w AS DOUBLE) / CAST(total_w AS DOUBLE) AS top_share
FROM g
"""


# --------------------------------------------------------------------------
# q163: curriculum ordering — difficulty-stratified round-robin emit
# order for training (Bengio et al. ICML'09 made the case; production
# pipelines implement it exactly like this: bucket by a difficulty
# proxy, then interleave buckets so every training window sees the
# full difficulty mix while easy examples still front-load the early
# epochs via the bucket offset). Difficulty proxy = q23's quality
# score (high quality = easy/clean); docs are cut into CUR_BUCKETS
# quantile buckets over the (quality, doc_id) total order, then the
# global curriculum position is (rank_within_bucket, bucket) — i.e.
# round-robin across buckets, easiest first within each round.
#
# Scale shape: the bucket cut is ntile over ONE global sort (at 100 TB
# a range-partitioned rank — same plan family as q39/q156; the sort is
# the price of an exact curriculum and is paid once per epoch-plan,
# not per step), the interleave is a map-only expression, and the
# emitted prefix is TakeOrderedAndProject-capped at CUR_EMIT rows.
# Everything is exact integer arithmetic — no floats anywhere.
# --------------------------------------------------------------------------

CUR_BUCKETS = 8
CUR_EMIT = 200


def q163_curriculum_order(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    from .textstats import quality_col

    docs = load_docs(spark, sf_dir).withColumn("toks", _tok_arr())
    q = docs.select(
        "doc_id", quality_col().alias("quality")
    )
    wall = Window.orderBy(F.desc("quality"), F.asc("doc_id"))
    bucketed = q.withColumn(
        "bucket", (F.ntile(CUR_BUCKETS).over(wall) - 1).cast("int")
    )
    wb = Window.partitionBy("bucket").orderBy(
        F.desc("quality"), F.asc("doc_id")
    )
    ordered = bucketed.withColumn(
        "round", (F.row_number().over(wb) - 1).cast("long")
    ).withColumn(
        "cur_pos",
        (F.col("round") * CUR_BUCKETS + F.col("bucket")).cast("long"),
    )
    return (
        ordered.select("cur_pos", "doc_id", "bucket", "round", "quality")
        .orderBy("cur_pos", "doc_id")
        .limit(CUR_EMIT)
    )


QUERIES["q163_curriculum_order"] = q163_curriculum_order

ORACLE["q163_curriculum_order"] = f"""
WITH qual AS (SELECT doc_id, quality FROM ({_TS_ORACLE["q23_quality"]})),
b AS (
  SELECT doc_id, quality,
         (ntile({CUR_BUCKETS}) OVER (ORDER BY quality DESC,
                                     doc_id ASC) - 1)::INT AS bucket
  FROM qual
),
o AS (
  SELECT doc_id, quality, bucket,
         (row_number() OVER (PARTITION BY bucket
                             ORDER BY quality DESC, doc_id ASC)
          - 1)::BIGINT AS round
  FROM b
)
SELECT (round * {CUR_BUCKETS} + bucket)::BIGINT AS cur_pos,
       doc_id, bucket, round, quality
FROM o
ORDER BY cur_pos, doc_id
LIMIT {CUR_EMIT}
"""


# --------------------------------------------------------------------------
# q175: content-defined chunking + cross-doc chunk dedup census — the
# shift-robust complement to q96's fixed-size chunks: boundaries fall
# where the content's own hash says (token hash ≡ CDC_CONST mod
# CDC_MOD), so inserting one sentence at the top of a re-crawled page
# re-chunks ONLY the edited region — every downstream chunk hash
# stays stable, which is why rsync/restic/dataset-dedup pipelines use
# CDC, and fixed-size chunking (whose hashes all shift) cannot do
# storage-level dedup across revisions. Basic CDC here (no min/max
# size clamps — production adds them with a second sequential pass
# over the boundary list; the census arithmetic is identical).
#
# Scale shape: map-only token hashing, ONE per-doc window cumsum
# turns boundary flags into chunk ids (the per-doc partition sort,
# docs never cross tasks), chunk text re-assembled with an ORDERED
# aggregation (sort_array(collect_list(struct(pos,term))) ⇔
# string_agg(... ORDER BY pos) — both engines deterministic), then
# one (chunk_hash) census agg — 16-byte keys, never chunk text, at
# scale. Output = top duplicated chunks with the global census
# broadcast alongside; all counts exact int64.
# --------------------------------------------------------------------------

CDC_MOD = 16       # expected chunk length in tokens
CDC_CONST = 7
CDC_TOP = 50


def q175_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_docs(spark, sf_dir)
    tok = docs.select(
        "doc_id",
        F.posexplode(
            F.filter(F.split(F.col("text"), " "), lambda x: x != "")
        ).alias("pos", "term"),
    ).withColumn(
        "boundary",
        F.when(
            F.conv(F.substring(F.md5(F.col("term")), 1, 15), 16, 10)
            .cast("long")
            % CDC_MOD
            == CDC_CONST,
            1,
        ).otherwise(0),
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    chunked = tok.withColumn(
        "chunk",
        F.coalesce(F.sum("boundary").over(w), F.lit(0)).cast("long"),
    )
    chunks = (
        chunked.groupBy("doc_id", "chunk")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("pos", "term"))
                    ),
                    lambda s: s["term"],
                ),
                " ",
            ).alias("ctext"),
            F.count("*").cast("long").alias("clen"),
        )
        .withColumn(
            "chash",
            F.conv(
                F.substring(F.md5(F.col("ctext")), 1, 15), 16, 10
            ).cast("long"),
        )
    )
    census = chunks.groupBy("chash").agg(
        F.count("*").cast("long").alias("n_copies"),
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.max("clen").cast("long").alias("chunk_len"),
    )
    totals = F.broadcast(
        census.groupBy().agg(
            F.sum("n_copies").cast("long").alias("total_chunks"),
            F.count("*").cast("long").alias("distinct_chunks"),
        )
    )
    return (
        census.filter(F.col("n_copies") >= 2)
        .crossJoin(totals)
        .select(
            "chash",
            "n_copies",
            "n_docs",
            "chunk_len",
            "total_chunks",
            "distinct_chunks",
            (
                F.lit(1.0)
                - F.col("distinct_chunks").cast("double")
                / F.col("total_chunks").cast("double")
            ).alias("dup_ratio"),
        )
        .orderBy(F.desc("n_copies"), F.asc("chash"))
        .limit(CDC_TOP)
    )


QUERIES["q175_cdc_chunks"] = q175_cdc_chunks

ORACLE["q175_cdc_chunks"] = f"""
WITH d AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
tp AS (
  SELECT doc_id, unnest(generate_series(1, len(toks))) AS pos, toks FROM d
),
tok AS (
  SELECT doc_id, pos, toks[pos] AS term,
         CASE WHEN ('0x' || substr(md5(toks[pos]), 1, 15))::BIGINT
                   % {CDC_MOD} = {CDC_CONST}
              THEN 1 ELSE 0 END AS boundary
  FROM tp
),
chunked AS (
  SELECT doc_id, pos, term,
         COALESCE(sum(boundary) OVER (PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0)::BIGINT AS chunk
  FROM tok
),
chunks AS (
  SELECT doc_id, chunk,
         string_agg(term, ' ' ORDER BY pos) AS ctext,
         count(*)::BIGINT AS clen
  FROM chunked GROUP BY doc_id, chunk
),
hashed AS (
  SELECT doc_id, chunk, clen,
         ('0x' || substr(md5(ctext), 1, 15))::BIGINT AS chash
  FROM chunks
),
census AS (
  SELECT chash, count(*)::BIGINT AS n_copies,
         count(DISTINCT doc_id)::BIGINT AS n_docs,
         max(clen)::BIGINT AS chunk_len
  FROM hashed GROUP BY chash
),
tot AS (
  SELECT sum(n_copies)::BIGINT AS total_chunks,
         count(*)::BIGINT AS distinct_chunks
  FROM census
)
SELECT c.chash, c.n_copies, c.n_docs, c.chunk_len,
       t.total_chunks, t.distinct_chunks,
       1.0::DOUBLE - CAST(t.distinct_chunks AS DOUBLE)
         / CAST(t.total_chunks AS DOUBLE) AS dup_ratio
FROM census c, tot t
WHERE c.n_copies >= 2
ORDER BY c.n_copies DESC, c.chash ASC
LIMIT {CDC_TOP}
"""


# --------------------------------------------------------------------------
# q180: greedy max-coverage source selection — the submodular data-
# mixture primitive (Nemhauser's (1−1/e) guarantee is why every
# "select K sources/shards to maximize vocabulary/topic coverage"
# pipeline runs exactly this greedy): pick COV_K sources one at a
# time, each maximizing NEW vocabulary mass given everything already
# covered. The greedy is inherently sequential in K — so it unrolls
# K bounded rounds (q27's unroll idiom), each ONE anti-join agg +
# one argmax row; K is small by construction (you are picking a
# handful of feeds), the data side stays fully distributed.
#
# Determinism: gains are exact int64 distinct-shingle counts; argmax
# tie-breaks (gain DESC, source ASC) — a total order. Output one row
# per pick with its marginal gain and the running coverage share.
# Coverage units are COV_SH-word shingles, not unigrams — the fixture
# vocabulary is 31 words (one source covers it all, a degenerate
# greedy), while shingle space is rich at every scale; real mixture
# selection also covers n-gram/topic space, not bare vocabulary.
# --------------------------------------------------------------------------

COV_K = 5
COV_SH = 3


def q180_coverage_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_docs(spark, sf_dir).withColumn("toks", _tok_arr())
    pres = (
        docs.select(
            "source", F.explode(_shingles(COV_SH)).alias("term")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    vocab_n = F.broadcast(
        pres.select("term").distinct().groupBy().agg(
            F.count("*").cast("long").alias("n_vocab")
        )
    )
    covered = None  # DataFrame of covered terms
    picks = []
    cum = 0  # running covered count carried through the loop plan
    for step in range(1, COV_K + 1):
        cand = pres if covered is None else pres.join(
            covered, "term", "left_anti"
        )
        gains = cand.groupBy("source").agg(
            F.count("*").cast("long").alias("gain")
        )
        best = F.broadcast(
            gains.orderBy(F.desc("gain"), F.asc("source"))
            .limit(1)
            .select(
                F.col("source").alias("pick"),
                F.col("gain").alias("pick_gain"),
            )
        )
        picks.append(
            best.select(
                F.lit(step).cast("int").alias("step"),
                F.col("pick").alias("source"),
                F.col("pick_gain").alias("gain"),
            )
        )
        covered_new = pres.join(
            best, pres.source == F.col("pick")
        ).select("term").distinct()
        covered = (
            covered_new
            if covered is None
            else covered.unionAll(covered_new).distinct()
        ).localCheckpoint(eager=False)
    u = picks[0]
    for pf in picks[1:]:
        u = u.unionAll(pf)
    w = Window.orderBy("step").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        u.crossJoin(vocab_n)
        .withColumn("covered", F.sum("gain").over(w).cast("long"))
        .select(
            "step",
            "source",
            "gain",
            "covered",
            "n_vocab",
            (
                F.col("covered").cast("double")
                / F.col("n_vocab").cast("double")
            ).alias("coverage"),
        )
        .orderBy("step")
    )


QUERIES["q180_coverage_greedy"] = q180_coverage_greedy


def _cov_round_sql(i: int) -> str:
    prev_cov = (
        "SELECT term FROM pres WHERE source IN "
        f"(SELECT source FROM picks{i - 1})"
        if i > 1
        else "SELECT NULL AS term WHERE 1 = 0"
    )
    prev_picks = (
        f"SELECT source FROM picks{i - 1}" if i > 1 else "SELECT NULL WHERE 1=0"
    )
    return f"""
gain{i} AS (
  SELECT source, count(*)::BIGINT AS gain
  FROM pres
  WHERE term NOT IN ({prev_cov})
  GROUP BY source
),
pick{i} AS (
  SELECT {i}::INT AS step, source, gain
  FROM gain{i} ORDER BY gain DESC, source ASC LIMIT 1
),
picks{i} AS (
  {"SELECT source FROM picks" + str(i - 1) + " UNION ALL " if i > 1 else ""}
  SELECT source FROM pick{i}
)"""


_COV_CTES = ",".join(_cov_round_sql(i) for i in range(1, COV_K + 1))

_COV_UNION = " UNION ALL ".join(
    f"SELECT * FROM pick{i}" for i in range(1, COV_K + 1)
)

ORACLE["q180_coverage_greedy"] = f"""
WITH d AS (
  SELECT source,
         list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
tp AS (
  SELECT source, unnest(generate_series(1, len(toks) - {COV_SH - 1}))
           AS pos, toks
  FROM d WHERE len(toks) >= {COV_SH}
),
pres AS (
  SELECT DISTINCT source,
         array_to_string(toks[pos:pos + {COV_SH - 1}], ' ') AS term
  FROM tp
),
vocab AS (SELECT count(DISTINCT term)::BIGINT AS n_vocab FROM pres),
{_COV_CTES},
u AS ({_COV_UNION})
SELECT step, source, gain,
       sum(gain) OVER (ORDER BY step
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                      )::BIGINT AS covered,
       vocab.n_vocab,
       CAST(sum(gain) OVER (ORDER BY step ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS DOUBLE)
         / CAST(vocab.n_vocab AS DOUBLE) AS coverage
FROM u, vocab
ORDER BY step
"""


# --------------------------------------------------------------------------
# q193: deterministic MLM masking plan (BERT's 15% / 80-10-10 recipe,
# Devlin et al.) — the pre-training data op that turns a corpus into
# (input, label) pairs: per token decide mask / random-replace / keep
# via the portable hash of (doc, position), so the SAME corpus always
# yields the SAME masking plan (reproducible pre-training, and the
# plan can be re-derived anywhere instead of stored; the random-
# replacement TOKEN would come from a broadcast rank-indexed vocab —
# the plan census here carries everything needed to draw it).
#
# Determinism: every decision is integer arithmetic on the md5
# uniform (u < 150e6 of 1e9 → masked; then 80/10/10 ladder on a
# SECOND hash so the two draws are independent); counts exact int64.
# Scale shape: map-only over tokens; output = per-doc plan census +
# global shares off a 1-row broadcast.
# --------------------------------------------------------------------------

MLM_RATE_U = 150_000_000       # 15% of 1e9
MLM_MASK_U = 800_000_000       # of selected: 80% -> [MASK]
MLM_RAND_U = 900_000_000       # next 10% -> random token; rest keep


def q193_mlm_masking_plan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    docs = load_docs(spark, sf_dir)
    tok = docs.select(
        "doc_id",
        F.posexplode(
            F.filter(F.split(F.col("text"), " "), lambda x: x != "")
        ).alias("pos", "term"),
    )

    def u_of(tag: str) -> F.Column:
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "#",
                            F.lit(tag),
                            F.col("doc_id"),
                            F.col("pos"),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % 1_000_000_000
        )
    sel = u_of("sel")
    arm = u_of("arm")
    action = F.when(sel >= MLM_RATE_U, "keep_unselected").otherwise(
        F.when(arm < MLM_MASK_U, "mask")
        .when(arm < MLM_RAND_U, "random")
        .otherwise("keep_selected")
    )
    planned = tok.withColumn("action", action)
    per_doc = planned.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("action") == "mask", 1).otherwise(0))
        .cast("long")
        .alias("n_mask"),
        F.sum(F.when(F.col("action") == "random", 1).otherwise(0))
        .cast("long")
        .alias("n_random"),
        F.sum(
            F.when(F.col("action") == "keep_selected", 1).otherwise(0)
        )
        .cast("long")
        .alias("n_keep_selected"),
    )
    tot = F.broadcast(
        per_doc.groupBy().agg(
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.sum("n_mask").cast("long").alias("total_mask"),
            F.sum("n_random").cast("long").alias("total_random"),
            F.sum("n_keep_selected")
            .cast("long")
            .alias("total_keep_sel"),
        )
    )
    sel_share = (
        F.col("total_mask")
        + F.col("total_random")
        + F.col("total_keep_sel")
    ).cast("double") / F.col("total_tokens").cast("double")
    return (
        per_doc.crossJoin(tot)
        .select(
            "doc_id",
            "n_tokens",
            "n_mask",
            "n_random",
            "n_keep_selected",
            sel_share.alias("global_selected_share"),
        )
        .orderBy("doc_id")
    )


QUERIES["q193_mlm_masking_plan"] = q193_mlm_masking_plan

_MLM_U = (
    "('0x' || substr(md5('{tag}' || '#' || CAST(doc_id AS VARCHAR) || '#'"
    " || CAST(pos AS VARCHAR)), 1, 15))::BIGINT % 1000000000"
)

ORACLE["q193_mlm_masking_plan"] = f"""
WITH d AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
tp AS (
  SELECT doc_id, unnest(generate_series(1, len(toks))) - 1 AS pos,
         toks
  FROM d
),
acts AS (
  SELECT doc_id,
         CASE WHEN {_MLM_U.format(tag='sel')} >= {MLM_RATE_U}
              THEN 'keep_unselected'
              WHEN {_MLM_U.format(tag='arm')} < {MLM_MASK_U} THEN 'mask'
              WHEN {_MLM_U.format(tag='arm')} < {MLM_RAND_U} THEN 'random'
              ELSE 'keep_selected' END AS action
  FROM tp
),
per_doc AS (
  SELECT doc_id, count(*)::BIGINT AS n_tokens,
         sum(CASE WHEN action = 'mask' THEN 1 ELSE 0 END)::BIGINT
           AS n_mask,
         sum(CASE WHEN action = 'random' THEN 1 ELSE 0 END)::BIGINT
           AS n_random,
         sum(CASE WHEN action = 'keep_selected' THEN 1 ELSE 0 END)::BIGINT
           AS n_keep_selected
  FROM acts GROUP BY doc_id
),
tot AS (
  SELECT sum(n_tokens)::BIGINT AS total_tokens,
         sum(n_mask)::BIGINT AS total_mask,
         sum(n_random)::BIGINT AS total_random,
         sum(n_keep_selected)::BIGINT AS total_keep_sel
  FROM per_doc
)
SELECT doc_id, n_tokens, n_mask, n_random, n_keep_selected,
       CAST(total_mask + total_random + total_keep_sel AS DOUBLE)
         / CAST(total_tokens AS DOUBLE) AS global_selected_share
FROM per_doc, tot
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# q197: slice-parity report — per-source quality parity against the
# REST of the corpus (the slice-regression finder a data team runs
# after every pipeline change: which feed's quality moved relative
# to everyone else's?). Metric: share of docs above the GLOBAL
# quality median (an exact rank probe — median-share is robust where
# means are skew-dominated), tested per source with q160's pooled
# two-proportion z against its complement, |z| > crit flagged.
#
# Determinism: all counts exact int64 off ONE (source) agg + a 1-row
# median broadcast; per-source z is one identical IEEE tree over
# exact ints, NULL-guarded at degenerate pools (the q160 rule).
# Scale shape: one quality pass, one rank probe, |sources|-row math.
# --------------------------------------------------------------------------

PARITY_Z_CRIT = 2.575829304  # two-sided 99% (many slices -> stricter)


def q197_slice_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from .textstats import quality_col

    docs = load_docs(spark, sf_dir).withColumn("toks", _tok_arr())
    q = docs.select(
        "doc_id", "source", quality_col().alias("quality")
    )
    w = Window.orderBy("quality", "doc_id")
    cnt = q.groupBy().agg(F.count("*").cast("long").alias("n"))
    med = F.broadcast(
        q.withColumn("r", F.row_number().over(w))
        .crossJoin(F.broadcast(cnt))
        .filter(F.col("r") == F.expr("(n + 1) div 2"))
        .select(F.col("quality").alias("med_q"))
    )
    per_src = (
        q.crossJoin(med)
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_src"),
            F.sum(
                F.when(F.col("quality") > F.col("med_q"), 1).otherwise(0)
            )
            .cast("long")
            .alias("k_src"),
        )
    )
    tot = F.broadcast(
        per_src.groupBy().agg(
            F.sum("n_src").cast("long").alias("n_all"),
            F.sum("k_src").cast("long").alias("k_all"),
        )
    )
    j = per_src.crossJoin(tot).withColumn(
        "n_rest", (F.col("n_all") - F.col("n_src")).cast("long")
    ).withColumn(
        "k_rest", (F.col("k_all") - F.col("k_src")).cast("long")
    )
    p_src = F.col("k_src").cast("double") / F.col("n_src").cast("double")
    p_rest = F.col("k_rest").cast("double") / F.col("n_rest").cast("double")
    pp = F.col("k_all").cast("double") / F.col("n_all").cast("double")
    se = F.sqrt(
        pp
        * (F.lit(1.0) - pp)
        * (
            F.lit(1.0) / F.col("n_src").cast("double")
            + F.lit(1.0) / F.col("n_rest").cast("double")
        )
    )
    z = F.when((se > 0.0) & (F.col("n_rest") > 0), (p_src - p_rest) / se)
    return (
        j.select(
            "source",
            "n_src",
            "k_src",
            p_src.alias("share_above_median"),
            p_rest.alias("rest_share"),
            z.alias("z"),
            F.when(
                z.isNotNull(), F.abs(z) > F.lit(PARITY_Z_CRIT)
            ).alias("flagged"),
        )
        .orderBy("source")
    )


QUERIES["q197_slice_parity"] = q197_slice_parity

ORACLE["q197_slice_parity"] = f"""
WITH qual AS (SELECT doc_id, quality FROM ({{q23}})),
d AS (
  SELECT q.doc_id, doc.source, q.quality
  FROM qual q JOIN documents doc ON q.doc_id = doc.doc_id
),
cnt AS (SELECT count(*)::BIGINT AS n FROM d),
med AS (
  SELECT quality AS med_q FROM (
    SELECT quality, row_number() OVER (ORDER BY quality, doc_id) AS r
    FROM d
  ), cnt WHERE r = (n + 1) // 2
),
per_src AS (
  SELECT source, count(*)::BIGINT AS n_src,
         sum(CASE WHEN quality > med_q THEN 1 ELSE 0 END)::BIGINT
           AS k_src
  FROM d, med GROUP BY source
),
tot AS (
  SELECT sum(n_src)::BIGINT AS n_all, sum(k_src)::BIGINT AS k_all
  FROM per_src
),
j AS (
  SELECT p.*, t.n_all, t.k_all,
         (t.n_all - p.n_src)::BIGINT AS n_rest,
         (t.k_all - p.k_src)::BIGINT AS k_rest
  FROM per_src p, tot t
),
scored AS (
  SELECT source, n_src, k_src, n_rest, k_rest, n_all, k_all,
         CAST(k_src AS DOUBLE) / CAST(n_src AS DOUBLE) AS p_src,
         CAST(k_rest AS DOUBLE) / CAST(n_rest AS DOUBLE) AS p_rest,
         sqrt((CAST(k_all AS DOUBLE) / CAST(n_all AS DOUBLE))
              * (1.0::DOUBLE - CAST(k_all AS DOUBLE)
                               / CAST(n_all AS DOUBLE))
              * (1.0::DOUBLE / CAST(n_src AS DOUBLE)
                 + 1.0::DOUBLE / CAST(n_rest AS DOUBLE))) AS se
  FROM j
)
SELECT source, n_src, k_src,
       p_src AS share_above_median,
       p_rest AS rest_share,
       CASE WHEN se > 0.0 AND n_rest > 0
            THEN (p_src - p_rest) / se ELSE NULL END AS z,
       CASE WHEN se > 0.0 AND n_rest > 0
            THEN abs((p_src - p_rest) / se) > {PARITY_Z_CRIT!r}::DOUBLE
            ELSE NULL END AS flagged
FROM scored
ORDER BY source
"""

ORACLE["q197_slice_parity"] = ORACLE["q197_slice_parity"].format(
    q23=_TS_ORACLE["q23_quality"]
)


# --------------------------------------------------------------------------
# q200: the dataset card — the one-row datasheet a training-data
# release ships (Gebru et al.'s "Datasheets for Datasets" made the
# case; every serious corpus release now carries one): corpus size,
# vocabulary, duplication share, mean quality, language-mix entropy,
# source concentration (Gini), and the median document length — each
# computed with the repo's established exact recipe, composed into
# ONE plan so the card is a single action, not a notebook of ad-hoc
# scans.
#
# Determinism: every number reuses a proven shape — exact int64
# censuses, exact rank probes for medians (q177), DECIMAL(28,12)
# folds for the quality mean and entropy terms (q191), q155's
# integer rank-weighted Gini. All published floats are single IEEE
# trees, UNROUNDED. Scale shape: a handful of independent aggs over
# two scans (docs, tokens), all joined as 1-row broadcasts.
# --------------------------------------------------------------------------


def q200_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from .textstats import quality_col

    docs = load_docs(spark, sf_dir).withColumn("toks", _tok_arr())
    base = docs.select(
        "doc_id",
        "source",
        "lang",
        F.size("toks").cast("long").alias("n_toks"),
        F.md5("text").alias("h"),
        quality_col().alias("quality"),
    ).localCheckpoint(eager=False)

    counts = base.groupBy().agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_toks").cast("long").alias("n_tokens"),
        F.sum(F.col("quality").cast("decimal(28,12)"))
        .cast("double")
        .alias("q_sum"),
    )
    vocab = F.broadcast(
        docs.select(F.explode("toks").alias("t"))
        .agg(F.countDistinct("t").cast("long").alias("vocab_size"))
    )
    dups = F.broadcast(
        base.groupBy("h")
        .agg(F.count("*").cast("long").alias("c"))
        .groupBy()
        .agg(
            F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(0))
            .cast("long")
            .alias("n_dup_docs")
        )
    )
    # entropy terms fold in LANG ORDER (a window prefix sum is a
    # sequential left fold, bit-identical on both engines) — the
    # DECIMAL-quantized unordered sum hit a 1e-12 rounding-boundary
    # divergence at sf0.1 (the q112 class: Spark HALF_UP on exact
    # binary vs DuckDB scaled-float)
    wl = Window.orderBy("lang")
    lang_e = F.broadcast(
        base.groupBy("lang")
        .agg(F.count("*").cast("long").alias("nl"))
        .crossJoin(
            F.broadcast(
                base.groupBy().agg(
                    F.count("*").cast("long").alias("nn")
                )
            )
        )
        .withColumn(
            "term",
            F.col("nl").cast("double")
            * (
                F.log(F.col("nn").cast("double"))
                - F.log(F.col("nl").cast("double"))
            ),
        )
        .withColumn(
            "cum",
            F.sum("term").over(
                wl.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .withColumn("rn", F.row_number().over(wl))
        .withColumn(
            "nlangs_all",
            F.count("*").over(
                wl.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ),
        )
        .filter(F.col("rn") == F.col("nlangs_all"))
        .select(
            F.col("nlangs_all").cast("long").alias("n_langs"),
            (F.col("cum") / F.col("nn").cast("double")).alias(
                "lang_entropy"
            ),
        )
    )
    src = base.groupBy("source").agg(
        F.sum("n_toks").cast("long").alias("w")
    )
    wsrc = Window.orderBy(F.asc("w"), F.asc("source"))
    gini = F.broadcast(
        src.withColumn("i", F.row_number().over(wsrc).cast("long"))
        .groupBy()
        .agg(
            F.count("*").cast("long").alias("n_sources"),
            F.sum("w").cast("long").alias("total_w"),
            F.sum(F.col("i") * F.col("w")).cast("long").alias("iw"),
        )
        .select(
            "n_sources",
            (
                F.col("iw").cast("double")
                * F.lit(2.0)
                / (
                    F.col("n_sources").cast("double")
                    * F.col("total_w").cast("double")
                )
                - (F.col("n_sources") + 1).cast("double")
                / F.col("n_sources").cast("double")
            ).alias("source_gini"),
        )
    )
    wlen = Window.orderBy("n_toks", "doc_id")
    med = F.broadcast(
        base.withColumn("r", F.row_number().over(wlen))
        .crossJoin(F.broadcast(counts.select("n_docs")))
        .filter(F.col("r") == F.expr("(n_docs + 1) div 2"))
        .select(F.col("n_toks").alias("p50_tokens"))
    )
    return (
        counts.crossJoin(vocab)
        .crossJoin(dups)
        .crossJoin(lang_e)
        .crossJoin(gini)
        .crossJoin(med)
        .select(
            "n_docs",
            "n_tokens",
            "vocab_size",
            (
                F.col("n_dup_docs").cast("double")
                / F.col("n_docs").cast("double")
            ).alias("dup_doc_share"),
            (F.col("q_sum") / F.col("n_docs").cast("double")).alias(
                "mean_quality"
            ),
            "n_langs",
            "lang_entropy",
            "n_sources",
            "source_gini",
            "p50_tokens",
        )
    )


QUERIES["q200_dataset_card"] = q200_dataset_card

ORACLE["q200_dataset_card"] = f"""
WITH qual AS (SELECT doc_id, quality FROM ({{q23}})),
base AS (
  SELECT d.doc_id, d.source, d.lang,
         len(list_filter(string_split(d.text, ' '), x -> x <> ''))::BIGINT
           AS n_toks,
         md5(d.text) AS h, q.quality
  FROM documents d JOIN qual q ON d.doc_id = q.doc_id
),
counts AS (
  SELECT count(*)::BIGINT AS n_docs, sum(n_toks)::BIGINT AS n_tokens,
         CAST(sum(CAST(quality AS DECIMAL(28,12))) AS DOUBLE) AS q_sum
  FROM base
),
vocab AS (
  SELECT count(DISTINCT t)::BIGINT AS vocab_size
  FROM (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> ''))
          AS t FROM documents)
),
dups AS (
  SELECT sum(CASE WHEN c >= 2 THEN c ELSE 0 END)::BIGINT AS n_dup_docs
  FROM (SELECT h, count(*)::BIGINT AS c FROM base GROUP BY h)
),
lang_e AS (
  SELECT n_langs, cum / CAST(nn AS DOUBLE) AS lang_entropy
  FROM (
    SELECT lang, nn,
           sum(CAST(nl AS DOUBLE)
               * (ln(CAST(nn AS DOUBLE)) - ln(CAST(nl AS DOUBLE))))
             OVER (ORDER BY lang ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW) AS cum,
           row_number() OVER (ORDER BY lang) AS rn,
           count(*) OVER ()::BIGINT AS n_langs
    FROM (SELECT lang, count(*)::BIGINT AS nl FROM base GROUP BY lang),
         (SELECT count(*)::BIGINT AS nn FROM base)
  ) WHERE rn = n_langs
),
src AS (
  SELECT source, sum(n_toks)::BIGINT AS w FROM base GROUP BY source
),
gini AS (
  SELECT count(*)::BIGINT AS n_sources,
         CAST(sum(i * w) AS DOUBLE) * 2.0::DOUBLE
           / (CAST(count(*) AS DOUBLE) * CAST(sum(w) AS DOUBLE))
           - CAST(count(*) + 1 AS DOUBLE) / CAST(count(*) AS DOUBLE)
           AS source_gini
  FROM (SELECT w, row_number() OVER (ORDER BY w ASC, source ASC)::BIGINT
               AS i
        FROM src)
),
med AS (
  SELECT n_toks AS p50_tokens FROM (
    SELECT n_toks, row_number() OVER (ORDER BY n_toks, doc_id) AS r
    FROM base
  ), counts WHERE r = (n_docs + 1) // 2
)
SELECT c.n_docs, c.n_tokens, v.vocab_size,
       CAST(d.n_dup_docs AS DOUBLE) / CAST(c.n_docs AS DOUBLE)
         AS dup_doc_share,
       c.q_sum / CAST(c.n_docs AS DOUBLE) AS mean_quality,
       l.n_langs, l.lang_entropy,
       g.n_sources, g.source_gini,
       m.p50_tokens
FROM counts c, vocab v, dups d, lang_e l, gini g, med m
"""

ORACLE["q200_dataset_card"] = ORACLE["q200_dataset_card"].format(
    q23=_TS_ORACLE["q23_quality"]
)


# --------------------------------------------------------------------------
# q202: crawl-order novelty curve — q105 scores each doc's shingle
# novelty; this rolls the per-doc scores into the DECILE curve a
# crawl-budget owner actually reads: novelty per crawl-order decile
# falls as the corpus saturates (diminishing returns), and the decile
# where it flattens is where the budget should stop. Composes q105's
# exact first-occurrence machinery (MIN over doc_id = crawl order on
# the fixture) with an ntile cut.
#
# Determinism: per-decile sums are exact int64 (novel and total
# shingle counts); shares single IEEE divisions. Scale shape: q105's
# two hash aggs + one ntile window over |docs| + a 10-row rollup.
# --------------------------------------------------------------------------

NOVC_DECILES = 10


def q202_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    nov = ngram_novelty_from(
        novelty_occurrences(load_docs(spark, sf_dir))
    )
    w = Window.orderBy("doc_id")
    cut = nov.withColumn(
        "decile", (F.ntile(NOVC_DECILES).over(w) - 1).cast("int")
    )
    g = cut.groupBy("decile").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_novel").cast("long").alias("novel"),
        F.sum("n_shingles").cast("long").alias("total"),
    )
    return (
        g.select(
            "decile",
            "n_docs",
            "novel",
            "total",
            F.when(
                F.col("total") > 0,
                F.col("novel").cast("double")
                / F.col("total").cast("double"),
            ).alias("novelty_share"),
        )
        .orderBy("decile")
    )


QUERIES["q202_novelty_curve"] = q202_novelty_curve

ORACLE["q202_novelty_curve"] = f"""
WITH nov AS ({{q105}}),
cut AS (
  SELECT *, (ntile({NOVC_DECILES}) OVER (ORDER BY doc_id) - 1)::INT
           AS decile
  FROM nov
)
SELECT decile, count(*)::BIGINT AS n_docs,
       sum(n_novel)::BIGINT AS novel,
       sum(n_shingles)::BIGINT AS total,
       CASE WHEN sum(n_shingles) > 0
            THEN CAST(sum(n_novel) AS DOUBLE)
                 / CAST(sum(n_shingles) AS DOUBLE)
            ELSE NULL END AS novelty_share
FROM cut GROUP BY decile ORDER BY decile
"""

ORACLE["q202_novelty_curve"] = ORACLE["q202_novelty_curve"].format(
    q105=ORACLE["q105_ngram_novelty"]
)
