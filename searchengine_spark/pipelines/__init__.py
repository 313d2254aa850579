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
    "q206_nprobe_curve",
    "q205_hot_term_routing",
    "q204_scorer_rank_corr",
    "q203_zero_results_audit",
    "q202_novelty_curve",
    "q201_triangle_null_model",
    "q200_dataset_card",
    "q199_stopword_stability",
    "q198_rbo",
    "q197_slice_parity",
    "q196_sprt",
    "q195_shrunken_rates",
    "q194_bm25_sensitivity",
    "q193_mlm_masking_plan",
    "q192_negative_sampling",
    "q191_session_entropy",
    "q190_freshness_halflife",
    "q189_modularity",
    "q188_poisson_bootstrap",
    "q187_hill_tail",
    "q186_impact_ordering",
    "q185_pagerank_delta",
    "q184_burstiness",
    "q183_winnow_pairs",
    "q182_seasonal_anomaly",
    "q181_ks_test",
    "q180_coverage_greedy",
    "q179_psi_drift",
    "q178_attribution",
    "q177_heavy_changers",
    "q176_chi2_terms",
    "q175_cdc_chunks",
    "q174_interleave",
    "q173_reciprocity",
    "q172_lsh_planner",
    "q171_term_shard_skew",
    "q170_js_divergence",
    "q169_dwell_percentiles",
    "q168_sdm_rank",
    "q167_heaps_law",
    "q166_textrank_keywords",
    "q165_zonemap_prune",
    "q164_jl_projection",
    "q163_curriculum_order",
    "q162_bowtie",
    "q161_winnowing",
    "q160_ab_ztest",
    "q159_markov_transitions",
    "q158_yule_k",
    "q157_harmonic_centrality",
    "q156_spearman_len_quality",
    "q155_source_gini",
    "q154_vocab_drift",
    "q153_adamic_adar",
    "q152_item_cosine",
    "q151_neighborhood_function",
    "q150_source_dup_split",
    "q149_trimmed_quality",
    "q148_mmr_diversify",
    "q147_crawl_budget",
    "q146_kneser_ney",
    "q145_spam_mass",
    "q144_session_copairs",
    "q143_pagerank_convergence",
    "q142_recrawl_schedule",
    "q141_clustering_coefficient",
    "q140_champion_lists",
    "q139_hyperball",
    "q138_postings_compression",
    "q137_cocitation",
    "q136_assortativity",
    "q135_kcore",
    "q134_percolate",
    "q133_hostrank",
    "q132_lsh_audit",
    "q131_temperature_mixture",
    "q130_label_propagation",
    "q129_source_wilson",
    # --- last verified r2 (the 28 rows VERDICT r4 item 4 wants refreshed) ---
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
    # --- last verified r3 ---
    "q01_fold_agg",
    "q02_join_revenue",
    "q28_postings_roundtrip",
    "q29_porter_stems",
    "q30_cube",
    "q31_approx_distinct",
    "q35_source_quota_sample",
    "q36_repetition_filter",
    "q37_pii_redact",
    "q40_curate_pipeline",
    "q41_decontaminate",
    "q42_pack_sequences",
    "q44_portable_hll",
    "q47_cms_heavy_hitters",
    "q48_mixture_sample",
    "q49_skew_salted_join",
    "q50_bloom_join_prune",
    "q52_hist_quantiles",
    "q53_stratified_sample",
    "q57_priority_sample",
    "q58_triangles",
    "q59_hits",
    "q60_pmi_collocations",
    "q70_ngram_lm",
    "q71_bucketed_join",
    "q72_partition_pruning",
    "q73_formats_roundtrip",
    "q74_multimodal_features",
    "q75_frame_sample",
    "q77_prefix_autocomplete",
    "q78_spell_correct",
    "q79_crawl_frontier",
    "q80_kwic_snippets",
    "q81_host_collapse",
    "q82_proximity_rank",
    "q83_shingle_containment",
    "q84_query_expansion",
    "q85_dup_source_matrix",
    "q86_burst_detect",
    "q87_semdedup",
    "q88_source_quality",
    "q89_canonical_rep",
    "q90_keywords",
    "q91_more_like_this",
    "q92_rank_fusion",
    "q93_lm_dirichlet",
    "q94_bpe_pairs",
    "q95_zipf_fit",
    "q96_passage_chunks",
    "q97_source_kl",
    # (r4-verified rows fall through to natural registry order)
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
