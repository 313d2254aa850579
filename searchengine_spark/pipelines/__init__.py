"""Driver-contract query pipelines: each submodule exposes QUERIES
(name -> callable(spark, sf_dir) -> DataFrame) and ORACLE (name ->
DuckDB SQL). ``all_queries()`` / ``all_oracles()`` merge them."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import (
    curation,
    dedup,
    engine_ops,
    frontier,
    fulltext,
    graph,
    lexical,
    multimodal,
    relational,
    similarity,
    textstats,
)

_MODULES = [
    relational,
    fulltext,
    dedup,
    similarity,
    textstats,
    curation,
    multimodal,
    graph,
    engine_ops,
    lexical,
    frontier,
]


# Gate ordering = staleness rotation: never-checked entries first (new
# this round), then entries by their last-verified round ASCENDING
# (CORRECTNESS_r01 -> r02 -> r03) so the driver's 50-query sample always
# refreshes the oldest scoreboard rows instead of re-checking what just
# went green. Recompute each round from the CORRECTNESS_r*.json files.
_CHECK_FIRST = [
    # --- new in r5, never driver-sampled ---
    "q132_lsh_audit",
    "q131_temperature_mixture",
    "q130_label_propagation",
    "q129_source_wilson",
    # --- new in r4, never driver-sampled ---
    "q128_embedding_drift",
    "q127_stopword_discovery",
    "q126_ann_ndcg_audit",
    "q125_curation_funnel",
    "q124_ann_recall_audit",
    "q123_leakage_safe_split",
    "q122_bfs_layers",
    "q121_bm25f",
    "q120_source_overlap_oph",
    "q119_anchor_field",
    "q118_robots_gate",
    "q116_chunk_quality",
    "q117_langid_confusion",
    "q115_class_cohesion",
    "q114_hybrid_retrieval",
    "q113_budget_waterfill",
    "q112_personalized_pagerank",
    "q110_filtered_ann",
    "q111_facet_counts",
    "q106_dup_span_extents",
    "q107_snapshot_diff",
    "q108_mojibake_audit",
    "q109_threshold_sweep",
    "q101_chunk_dedup",
    "q105_ngram_novelty",
    "q104_semdedup_twolevel",
    "q98_url_dedup",
    "q99_prefix_dedup",
    "q100_boilerplate_shingles",
    "q102_tokenizer_fertility",
    "q103_contamination_rate",
    # --- last verified r1 ---
    "q26_multimodal_meta",
    "q27_pagerank",
    # --- last verified r2 ---
    "q03_window_topk",
    "q04_set_ops",
    "q05_semi_anti",
    "q06_filter_pushdown",
    "q07_sessionize",
    "q08_window_agg",
    "q09_asof_join",
    "q10_sample_take",
    "q11_wordcount",
    "q12_tfidf",
    "q13_bm25_topk",
    "q14_phrase_match",
    "q15_dedup_exact",
    "q16_ngram_jaccard",
    "q17_minhash_lsh",
    "q18_simhash",
    "q19_embedding_neardup",
    "q20_ann_bruteforce",
    "q21_ann_ivf",
    "q22_lang_id",
    "q23_quality",
    "q24_token_stats",
    "q25_fingerprint",
    "q32_simhash_banded",
    "q33_embedding_neardup_ivf",
    "q34_cogroup",
    "q38_dup_clusters",
    "q39_length_quantiles",
    "q43_kmeans_train",
    "q45_ann_ivf_trained",
    "q46_lm_perplexity",
    "q51_range_join",
    "q54_sparse_cosine",
    "q55_dup_spans",
    "q56_gapfill",
    "q61_ann_sq",
    "q62_ann_pq",
    "q63_funnel",
    "q64_json_extract",
    "q65_pivot",
    "q66_unpivot",
    "q67_stats_moments",
    "q68_incremental_merge",
    "q69_rolling_window",
    "q76_retention_cohorts",
]


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        merged.update(m.QUERIES)
    out = {k: merged[k] for k in _CHECK_FIRST if k in merged}
    out.update(merged)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLE)
    return out
