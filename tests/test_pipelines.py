"""Driver-contract pipelines: Spark vs DuckDB oracle at sf0.001, plus
invariants DuckDB can't express (LSH ⊆ exhaustive, IVF vs brute-force
recall, multimodal stub plumbing)."""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from searchengine_spark.pipelines import all_oracles, all_queries

SF_DIR = os.environ.get("PIPE_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# fast representatives of each family (the full matrix runs in
# tools/check_driver_contract.py at sf0.01)
ORACLE_CHECKED = [
    "q01_fold_agg",
    "q07_sessionize",
    "q09_asof_join",
    "q13_bm25_topk",
    "q15_dedup_exact",
    "q17_minhash_lsh",
    "q18_simhash",
    "q20_ann_bruteforce",
    "q21_ann_ivf",
    "q25_fingerprint",
    "q27_pagerank",
    "q28_postings_roundtrip",
    "q29_porter_stems",
    "q32_simhash_banded",
    "q33_embedding_neardup_ivf",
    "q34_cogroup",
    "q35_source_quota_sample",
    "q36_repetition_filter",
    "q37_pii_redact",
    "q38_dup_clusters",
    "q39_length_quantiles",
    "q40_curate_pipeline",
    "q41_decontaminate",
    "q42_pack_sequences",
    "q43_kmeans_train",
    "q44_portable_hll",
    "q45_ann_ivf_trained",
    "q46_lm_perplexity",
    "q47_cms_heavy_hitters",
    "q48_mixture_sample",
    "q49_skew_salted_join",
    "q50_bloom_join_prune",
    "q51_range_join",
    "q52_hist_quantiles",
    "q53_stratified_sample",
    "q54_sparse_cosine",
    "q55_dup_spans",
    "q56_gapfill",
    "q57_priority_sample",
    "q58_triangles",
    "q59_hits",
    "q60_pmi_collocations",
    "q61_ann_sq",
    "q62_ann_pq",
    "q63_funnel",
    "q64_json_extract",
    "q65_pivot",
    "q66_unpivot",
    "q67_stats_moments",
    "q68_incremental_merge",
    "q69_rolling_window",
    "q70_ngram_lm",
    "q71_bucketed_join",
    "q72_partition_pruning",
    "q73_formats_roundtrip",
    "q74_multimodal_features",
    "q75_frame_sample",
    "q76_retention_cohorts",
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
    "q98_url_dedup",
    "q99_prefix_dedup",
    "q100_boilerplate_shingles",
    "q102_tokenizer_fertility",
    "q103_contamination_rate",
    "q104_semdedup_twolevel",
    "q101_chunk_dedup",
    "q105_ngram_novelty",
    "q106_dup_span_extents",
    "q107_snapshot_diff",
    "q108_mojibake_audit",
    "q109_threshold_sweep",
    "q110_filtered_ann",
    "q111_facet_counts",
    "q112_personalized_pagerank",
    "q113_budget_waterfill",
    "q114_hybrid_retrieval",
    "q115_class_cohesion",
    "q116_chunk_quality",
    "q117_langid_confusion",
    "q118_robots_gate",
    "q119_anchor_field",
    "q120_source_overlap_oph",
    "q121_bm25f",
    "q122_bfs_layers",
    "q123_leakage_safe_split",
    "q124_ann_recall_audit",
    "q125_curation_funnel",
    "q126_ann_ndcg_audit",
    "q127_stopword_discovery",
    "q128_embedding_drift",
    "q129_source_wilson",
    "q130_label_propagation",
    "q131_temperature_mixture",
    "q132_lsh_audit",
    "q133_hostrank",
    "q134_percolate",
    "q135_kcore",
    "q136_assortativity",
    "q137_cocitation",
    "q138_postings_compression",
    "q139_hyperball",
    "q140_champion_lists",
    "q141_clustering_coefficient",
    "q142_recrawl_schedule",
    "q143_pagerank_convergence",
    "q144_session_copairs",
    "q145_spam_mass",
    "q146_kneser_ney",
    "q147_crawl_budget",
    "q148_mmr_diversify",
    "q149_trimmed_quality",
    "q150_source_dup_split",
    "q151_neighborhood_function",
    "q152_item_cosine",
    "q153_adamic_adar",
    "q154_vocab_drift",
    "q155_source_gini",
    "q156_spearman_len_quality",
    "q157_harmonic_centrality",
    "q158_yule_k",
    "q159_markov_transitions",
    "q160_ab_ztest",
    "q161_winnowing",
    "q162_bowtie",
    "q163_curriculum_order",
    "q164_jl_projection",
    "q165_zonemap_prune",
    "q166_textrank_keywords",
    "q167_heaps_law",
    "q168_sdm_rank",
    "q169_dwell_percentiles",
    "q170_js_divergence",
    "q171_term_shard_skew",
    "q172_lsh_planner",
    "q173_reciprocity",
    "q174_interleave",
    "q175_cdc_chunks",
    "q176_chi2_terms",
    "q177_heavy_changers",
    "q178_attribution",
    "q179_psi_drift",
    "q180_coverage_greedy",
    "q181_ks_test",
    "q182_seasonal_anomaly",
    "q183_winnow_pairs",
    "q184_burstiness",
    "q185_pagerank_delta",
    "q186_impact_ordering",
    "q187_hill_tail",
    "q188_poisson_bootstrap",
    "q189_modularity",
    "q190_freshness_halflife",
    "q191_session_entropy",
    "q192_negative_sampling",
    "q193_mlm_masking_plan",
    "q194_bm25_sensitivity",
    "q195_shrunken_rates",
    "q196_sprt",
    "q197_slice_parity",
    "q198_rbo",
    "q199_stopword_stability",
    "q200_dataset_card",
    "q201_triangle_null_model",
    "q202_novelty_curve",
    "q203_zero_results_audit",
    "q204_scorer_rank_corr",
    "q205_hot_term_routing",
    "q206_nprobe_curve",
    "q207_query_decode_budget",
    "q208_wedge_sampling",
    "q209_embedding_norms",
    "q210_cache_hit_model",
    "q211_lsm_writeamp",
    "q212_power_analysis",
    "q213_consistent_hash_ring",
    "q214_simhash_histogram",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


@pytest.mark.parametrize("name", ORACLE_CHECKED)
def test_matches_oracle(spark, duck, name):
    got = _norm(all_queries()[name](spark, SF_DIR).toPandas())
    want = _norm(duck.execute(all_oracles()[name]).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            assert np.array_equal(
                g.astype("float64").to_numpy(),
                w.astype("float64").to_numpy(),
                equal_nan=True,
            ), f"{name}.{c}"
        else:
            assert g.astype(str).equals(w.astype(str)), f"{name}.{c}"


def test_approx_distinct_sketch_bounds(spark):
    """q31's raw engine sketch (not emitted — engine-specific) must land
    within ±2% of exact at rsd=1%, and the emitted approx_ok flag must
    be TRUE for every group (that flag is what the DuckDB oracle pins)."""
    from pyspark.sql import functions as F

    from searchengine_spark.pipelines.relational import (
        APPROX_RSD,
        load,
        q31_approx_distinct,
    )

    rows = q31_approx_distinct(spark, SF_DIR).collect()
    assert rows and all(r["approx_ok"] for r in rows)
    raw = (
        load(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", APPROX_RSD).alias("a"),
            F.countDistinct("user_id").alias("e"),
        )
        .collect()
    )
    for r in raw:
        assert abs(r["a"] - r["e"]) / r["e"] < 2 * APPROX_RSD + 0.01


def test_exhaustive_twins_refuse_oversized_input(spark):
    """q16/q18/q19 are O(n²) all-pairs oracle twins — above the doc
    threshold they must refuse with a pointer at the bucketed sibling;
    max_docs=None forces through (and the contract defaults keep
    passing at small SF, asserted by the oracle matrix)."""
    from searchengine_spark.pipelines import dedup

    cases = [
        (dedup.q16_ngram_jaccard, "q17_minhash_lsh"),
        (dedup.q18_simhash, "q32_simhash_banded"),
        (dedup.q19_embedding_neardup, "q33_embedding_neardup_ivf"),
    ]
    for fn, sibling in cases:
        with pytest.raises(ValueError, match=sibling):
            fn(spark, SF_DIR, max_docs=1)
        assert fn(spark, SF_DIR, max_docs=None).columns  # forced override


def test_portable_hll_accuracy(spark):
    """q44's from-scratch HLL (p=10) must estimate within 5% of the
    exact distinct count for every group (theoretical std err 3.3%)."""
    from searchengine_spark.pipelines.relational import q44_portable_hll

    rows = q44_portable_hll(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert abs(r["hll_users"] - r["exact_users"]) / r["exact_users"] < 0.05


def test_kmeans_partitions_all_candidates(spark):
    """q43: every Lloyd round partitions the candidate set — assignment
    counts (read off any one dim) sum to the candidate count, and every
    surviving centroid carries all 64 dims."""
    import pyspark.sql.functions as F

    from searchengine_spark.pipelines.similarity import (
        N_QUERIES,
        load_emb,
        q43_kmeans_train,
    )

    rows = q43_kmeans_train(spark, SF_DIR).collect()
    n_cand = (
        load_emb(spark, SF_DIR).filter(F.col("vec_id") >= N_QUERIES).count()
    )
    assert sum(r["n_assigned"] for r in rows if r["dim"] == 1) == n_cand
    per_cent: dict = {}
    for r in rows:
        per_cent.setdefault(r["cent_id"], set()).add(r["dim"])
    assert all(dims == set(range(1, 65)) for dims in per_cent.values())


def test_decontaminate_flags_only_train_docs(spark):
    """q41 output is non-empty on the fixture (its dup structure crosses
    the eval split), never contains an eval-split doc, and every flagged
    doc is a known near-duplicate of some eval doc (subset of the
    exhaustive Jaccard pair graph restricted to eval partners)."""
    from searchengine_spark.pipelines.curation import EVAL_MOD, q41_decontaminate
    from searchengine_spark.pipelines.dedup import q16_ngram_jaccard

    rows = q41_decontaminate(spark, SF_DIR).collect()
    assert rows, "fixture must produce at least one contaminated doc"
    assert all(r["doc_id"] % EVAL_MOD != 0 for r in rows)
    eval_partner = set()
    for r in q16_ngram_jaccard(spark, SF_DIR).collect():
        a, b = r["doc_a"], r["doc_b"]
        if a % EVAL_MOD == 0 and b % EVAL_MOD != 0:
            eval_partner.add(b)
        if b % EVAL_MOD == 0 and a % EVAL_MOD != 0:
            eval_partner.add(a)
    assert {r["doc_id"] for r in rows} <= eval_partner


def test_pack_sequences_conserves_tokens(spark):
    """q42 packing: per-source token totals are conserved, doc ranges of
    consecutive sequences are disjoint and increasing, packing starts at
    seq_id 0."""
    import pyspark.sql.functions as F

    from searchengine_spark.pipelines.curation import q42_pack_sequences
    from searchengine_spark.pipelines.textstats import _tok_arr, load_docs

    packed = q42_pack_sequences(spark, SF_DIR).collect()
    want = {
        r["source"]: r["tot"]
        for r in load_docs(spark, SF_DIR)
        .groupBy("source")
        .agg(F.sum(F.size(_tok_arr())).alias("tot"))
        .collect()
    }
    got: dict = {}
    by_source: dict = {}
    for r in packed:
        got[r["source"]] = got.get(r["source"], 0) + r["seq_tokens"]
        by_source.setdefault(r["source"], []).append(r)
    assert got == want
    for rows in by_source.values():
        rows.sort(key=lambda r: r["seq_id"])
        assert rows[0]["seq_id"] == 0
        for prev, cur in zip(rows, rows[1:]):
            assert prev["last_doc"] < cur["first_doc"]


def test_lsh_subset_of_exhaustive(spark):
    """Every LSH-found near-dup pair must also be found exhaustively, and
    recall at jaccard>=0.9 with 4x2 banding should be essentially total."""
    from searchengine_spark.pipelines.dedup import q16_ngram_jaccard, q17_minhash_lsh

    exact = {
        (r["doc_a"], r["doc_b"])
        for r in q16_ngram_jaccard(spark, SF_DIR).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"]) for r in q17_minhash_lsh(spark, SF_DIR).collect()
    }
    assert lsh <= exact
    if exact:
        assert len(lsh) / len(exact) >= 0.9


def test_ivf_recall_vs_bruteforce(spark):
    from searchengine_spark.pipelines.similarity import (
        TOP_K,
        q20_ann_bruteforce,
        q21_ann_ivf,
    )

    brute = q20_ann_bruteforce(spark, SF_DIR).collect()
    ivf = q21_ann_ivf(spark, SF_DIR).collect()
    b = {(r["query_id"], r["vec_id"]) for r in brute}
    v = {(r["query_id"], r["vec_id"]) for r in ivf}
    n_queries = len({r["query_id"] for r in brute})
    assert len(v) == n_queries * TOP_K
    # probing 3 of ~centroids cells must still recover a solid fraction
    assert len(b & v) / len(b) >= 0.3


def test_sq_recall_vs_bruteforce(spark):
    """q61 (int8 scalar quantization + exact re-rank) must return full
    top-k lists with high recall vs brute force — SQ distorts distances
    far less than IVF cell pruning, and the exact re-rank repairs
    shortlist-order noise."""
    from searchengine_spark.pipelines.similarity import (
        TOP_K,
        q20_ann_bruteforce,
        q61_ann_sq,
    )

    brute = q20_ann_bruteforce(spark, SF_DIR).collect()
    sq = q61_ann_sq(spark, SF_DIR).collect()
    b = {(r["query_id"], r["vec_id"]) for r in brute}
    s = {(r["query_id"], r["vec_id"]) for r in sq}
    n_queries = len({r["query_id"] for r in brute})
    assert len(s) == n_queries * TOP_K
    assert len(b & s) / len(b) >= 0.8
    # re-ranked cosines are the TRUE cosines: any overlapping
    # (query, vec) pair must carry the brute-force score exactly
    bs = {(r["query_id"], r["vec_id"]): r["cos"] for r in brute}
    for r in sq:
        k = (r["query_id"], r["vec_id"])
        if k in bs:
            assert r["cos"] == bs[k]


def test_pq_recall_vs_bruteforce(spark):
    """q62 (8-byte PQ codes + ADC shortlist + exact re-rank) must return
    full top-k lists, recover a solid fraction of the brute-force
    neighbors, and carry TRUE cosines on every overlapping pair."""
    from searchengine_spark.pipelines.similarity import (
        TOP_K,
        q20_ann_bruteforce,
        q62_ann_pq,
    )

    brute = q20_ann_bruteforce(spark, SF_DIR).collect()
    pq = q62_ann_pq(spark, SF_DIR).collect()
    b = {(r["query_id"], r["vec_id"]) for r in brute}
    p = {(r["query_id"], r["vec_id"]) for r in pq}
    n_queries = len({r["query_id"] for r in brute})
    assert len(p) == n_queries * TOP_K
    # 32x-compressed codes keep coarse geometry, not exact ranks: the
    # shortlist+rerank must still recover a solid share of true top-k
    assert len(b & p) / len(b) >= 0.4
    bs = {(r["query_id"], r["vec_id"]): r["cos"] for r in brute}
    for r in pq:
        k = (r["query_id"], r["vec_id"])
        if k in bs:
            assert r["cos"] == bs[k]


def test_trained_ivf_recall_vs_bruteforce(spark):
    """q45 (IVF over the q43-trained cells) must return full top-k lists
    and recover a solid fraction of the brute-force neighbors."""
    from searchengine_spark.pipelines.similarity import (
        TOP_K,
        q20_ann_bruteforce,
        q45_ann_ivf_trained,
    )

    brute = q20_ann_bruteforce(spark, SF_DIR).collect()
    ivf = q45_ann_ivf_trained(spark, SF_DIR).collect()
    b = {(r["query_id"], r["vec_id"]) for r in brute}
    v = {(r["query_id"], r["vec_id"]) for r in ivf}
    n_queries = len({r["query_id"] for r in brute})
    assert len(v) == n_queries * TOP_K
    assert len(b & v) / len(b) >= 0.3


def test_simhash_banding_is_lossless(spark):
    """Pigeonhole: 7 bands over 60 bits make the banded equi-join path
    find EXACTLY the exhaustive hamming<=6 pairs — zero recall loss."""
    from searchengine_spark.pipelines.dedup import q18_simhash, q32_simhash_banded

    exact = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in q18_simhash(spark, SF_DIR).collect()
    }
    banded = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in q32_simhash_banded(spark, SF_DIR).collect()
    }
    assert banded == exact
    assert exact, "fixture should contain at least one near-dup pair"


def test_ivf_neardup_recall_vs_exhaustive(spark):
    """Cell-bucketed near-dup pairs are a subset of the exhaustive pairs
    (exact verify can only drop), with solid recall at nprobe=2."""
    from searchengine_spark.pipelines.dedup import (
        q19_embedding_neardup,
        q33_embedding_neardup_ivf,
    )

    exact = {
        (r["vec_a"], r["vec_b"]): r["cos"]
        for r in q19_embedding_neardup(spark, SF_DIR).collect()
    }
    ivf = {
        (r["vec_a"], r["vec_b"]): r["cos"]
        for r in q33_embedding_neardup_ivf(spark, SF_DIR).collect()
    }
    assert set(ivf) <= set(exact)
    for k, cos in ivf.items():
        assert cos == exact[k]  # identical expression shape => identical cos
    if exact:
        assert len(ivf) / len(exact) >= 0.5


def test_multimodal_stub_plumbing(spark):
    from searchengine_spark.pipelines.multimodal import (
        FEATURE_DIM,
        decode_image,
        extract_features,
        fake_features,
    )

    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")
    assert fake_features(b"") == [0.0] * FEATURE_DIM
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    media = docs.selectExpr("doc_id", "encode(text, 'UTF-8') AS payload")
    out = extract_features(media).collect()
    assert len(out) == docs.count()
    row = {r["doc_id"]: r for r in out}
    one = docs.select("doc_id", "text").first()
    import hashlib

    payload = one["text"].encode()
    assert row[one["doc_id"]]["checksum"] == hashlib.md5(payload).hexdigest()
    assert row[one["doc_id"]]["n_bytes"] == len(payload)
    assert row[one["doc_id"]]["features"] == fake_features(payload)


def test_multimodal_decoder_injection(spark):
    """A caller-supplied decoder (standing in for PIL/libvips on a real
    cluster) must flow through the Arrow batch path unchanged — and the
    oracle-gated default stub must be untouched by its existence."""
    import numpy as np

    from searchengine_spark.pipelines.multimodal import (
        extract_features,
        fake_features,
        sample_frames,
    )

    def pretend_real_decoder(payload: bytes) -> "np.ndarray":
        # shape-(2,2) float array, like a tiny decoded image
        arr = np.frombuffer(payload[:4].ljust(4, b"\0"), dtype=np.uint8)
        return arr.reshape(2, 2).astype("float64") * 2.0

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).limit(5)
    media = docs.selectExpr("doc_id", "encode(text, 'UTF-8') AS payload")
    got = {r["doc_id"]: r for r in
           extract_features(media, decoder=pretend_real_decoder).collect()}
    for one in docs.select("doc_id", "text").collect():
        payload = one["text"].encode()
        want = [float(x) for x in pretend_real_decoder(payload).ravel()]
        assert got[one["doc_id"]]["features"] == want
        assert got[one["doc_id"]]["features"] != fake_features(payload)
    # per-frame featurizer injection on the 1->N sampler path
    fr = sample_frames(media, frame_feature=lambda f: int(f.max())).collect()
    assert fr and all(0 <= r["f"] <= 255 for r in fr)


def test_fingerprint_is_order_sensitive(spark):
    """Rolling hash must distinguish permuted token orders (unlike the
    set-based dedup signatures)."""
    from searchengine_spark.pipelines.textstats import FP_BASE, FP_MOD

    import searchengine_spark.pipelines.textstats as ts

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "c b a")], ["doc_id", "text"]
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "documents.parquet"))
        out = {r["doc_id"]: r["fingerprint"] for r in ts.q25_fingerprint(
            spark, d
        ).collect()}
    assert out[1] != out[2]
    assert 0 <= out[1] < FP_MOD and FP_BASE > 1


def test_dup_clusters_match_union_find(spark):
    """q38's label-propagation components must equal a driver-side
    union-find over the same verified LSH pairs, and the canonical doc
    must be each component's min id."""
    from searchengine_spark.pipelines.dedup import (
        load_docs,
        q17_minhash_lsh,
        q38_dup_clusters,
    )

    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in q17_minhash_lsh(spark, SF_DIR).collect()
    ]
    doc_ids = [r["doc_id"] for r in load_docs(spark, SF_DIR).select("doc_id").collect()]
    parent = {d: d for d in doc_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-id representative per component
    want = {}
    for d in doc_ids:
        r = find(d)
        want.setdefault(r, []).append(d)
    expect = {
        d: min(members) for r, members in want.items() for d in members
    }
    got = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"], r["keep"])
        for r in q38_dup_clusters(spark, SF_DIR).collect()
    }
    assert set(got) == set(expect)
    sizes = {}
    for d, c in expect.items():
        sizes[c] = sizes.get(c, 0) + 1
    for d, (cid, csize, keep) in got.items():
        assert cid == expect[d]
        assert csize == sizes[expect[d]]
        assert keep == (1 if d == cid else 0)
    assert any(p for p in pairs), "fixture should contain near-dup pairs"


def test_curate_job_cli(spark, tmp_path, monkeypatch):
    """jobs/curate.py writes the curated corpus + a census whose kept
    count equals the written rows and whose stage counts are sane."""
    import json
    import sys

    from searchengine_spark.jobs import curate

    class _NoStop:
        def __init__(self, inner):
            self._i = inner

        def __getattr__(self, k):
            return getattr(self._i, k)

        def stop(self):
            pass

    monkeypatch.setattr(
        "searchengine_spark.session.get_spark",
        lambda **kw: _NoStop(spark),
    )
    out = str(tmp_path / "curated")
    rep = str(tmp_path / "census.json")
    monkeypatch.setattr(
        sys, "argv",
        ["curate", "--docs", SF_DIR, "--out", out, "--report", rep],
    )
    curate.main()
    census = json.loads(open(rep).read())
    got = spark.read.parquet(out)
    assert census["docs_in"] == 500
    assert 0 < census["docs_kept"] == got.count() < census["docs_in"]
    for k in ("lang_ok", "quality_ok", "rep_ok", "canon_ok", "quota_ok"):
        assert 0 < census[k] <= census["docs_in"]
    # the written corpus IS q40's output
    from searchengine_spark.pipelines.curation import q40_curate_pipeline

    want = {r["doc_id"] for r in q40_curate_pipeline(spark, SF_DIR).collect()}
    assert {r["doc_id"] for r in got.collect()} == want


def test_salted_join_equals_plain_join_on_hot_key(spark):
    """salted_join must be semantically invisible even when one key
    carries almost all big-side rows (the case it exists for), and the
    hot key's rows must actually scatter across every salt."""
    from pyspark.sql import functions as F

    from searchengine_spark.pipelines.engine_ops import N_SALTS, salted_join

    big = spark.range(0, 5000).select(
        F.when(F.col("id") < 4500, F.lit(7)).otherwise(F.col("id") % 50)
        .alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.createDataFrame(
        [(i, f"dim{i}") for i in range(50)], "k long, name string"
    )
    got = (
        salted_join(big, small, "k")
        .groupBy("k", "name")
        .agg(F.count("*").alias("n"), F.sum("v").alias("sv"))
    )
    want = (
        big.join(small, "k")
        .groupBy("k", "name")
        .agg(F.count("*").alias("n"), F.sum("v").alias("sv"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    # the hot key occupies all N_SALTS scatter values
    salts = (
        big.withColumn(
            "_salt",
            F.pmod(
                F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(N_SALTS)
            ).cast("int"),
        )
        .filter(F.col("k") == 7)
        .select("_salt")
        .distinct()
        .count()
    )
    assert salts == N_SALTS


def test_hist_quantiles_within_bin_width_of_exact(spark):
    """q52's histogram estimates must sit within one bin width of q39's
    exact rank-selection quantiles for every (source, percentile)."""
    from searchengine_spark.pipelines.textstats import (
        Q52_BIN_W,
        q39_length_quantiles,
        q52_hist_quantiles,
    )

    exact = {r["source"]: r for r in q39_length_quantiles(spark, SF_DIR).collect()}
    est = {r["source"]: r for r in q52_hist_quantiles(spark, SF_DIR).collect()}
    assert set(exact) == set(est)
    for src in exact:
        for p in ("p50", "p90", "p99"):
            assert abs(exact[src][p] - est[src][p]) <= Q52_BIN_W, (src, p)


def test_dup_spans_planted(spark):
    """q55 coverage math on a planted corpus: docs A and B share a
    9-token span (two overlapping 8-shingles -> 9 covered tokens, not
    16); doc C shares nothing."""
    from searchengine_spark.pipelines.dedup import SPAN_K, dup_spans

    assert SPAN_K == 8  # the planted arithmetic below assumes K=8
    shared = " ".join(f"s{i}" for i in range(9))
    docs = spark.createDataFrame(
        [
            (1, f"a1 a2 {shared} a3 a4"),        # 13 toks, span at pos 3..11
            (2, f"b1 {shared} b2 b3 b4 b5 b6"),  # 16 toks, span at pos 2..10
            (3, " ".join(f"c{i}" for i in range(10))),  # 10 toks, unique
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in dup_spans(docs).collect()}
    assert rows[1]["n_toks"] == 13 and rows[1]["n_shingles"] == 6
    assert rows[1]["n_dup_shingles"] == 2 and rows[1]["dup_tokens"] == 9
    assert rows[1]["flag_dup"] == 1  # 9/13 >= 1/5
    assert rows[2]["n_dup_shingles"] == 2 and rows[2]["dup_tokens"] == 9
    assert rows[3]["n_dup_shingles"] == 0 and rows[3]["dup_tokens"] == 0
    assert rows[3]["dup_frac"] == 0.0 and rows[3]["flag_dup"] == 0


def test_sparse_cosine_planted_and_max_df_cap(spark):
    """q54: identical docs cosine to exactly 1.0; docs sharing no term
    never materialize a pair. The max_df cap at 1.0 is a no-op; a
    binding cap drops the capped terms from the vocabulary."""
    from searchengine_spark.pipelines.dedup import sparse_cosine_pairs

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma alpha"),
            (2, "alpha beta gamma alpha"),
            (3, "delta epsilon zeta eta"),
        ],
        "doc_id long, text string",
    )
    got = sparse_cosine_pairs(docs, threshold=0.0).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r["cosine"] for r in got}
    assert pairs == {(1, 2): 1.0}  # no shared term -> no candidate row
    uncapped = sparse_cosine_pairs(docs, threshold=0.0).collect()
    noop_cap = sparse_cosine_pairs(docs, threshold=0.0, max_df_frac=1.0).collect()
    assert sorted(map(tuple, uncapped)) == sorted(map(tuple, noop_cap))
    # cap below 2/3 removes every term shared by docs 1 and 2
    capped = sparse_cosine_pairs(docs, threshold=0.0, max_df_frac=0.5).collect()
    assert capped == []


def test_gapfill_planted_interpolation(spark):
    """q56 on a planted series: user observed at 6h-buckets 0 and 3
    (values 10 and 40) gets buckets 1 and 2 linearly filled (20, 30);
    two events in one bucket average exactly."""
    from datetime import datetime

    from searchengine_spark.pipelines.relational import GAPFILL_BUCKET_S, gapfill

    def at(bucket, offset_s=0):
        return datetime.utcfromtimestamp(bucket * GAPFILL_BUCKET_S + offset_s)

    ev = spark.createDataFrame(
        [
            (1, at(0), 10.0),
            (1, at(3, 60), 40.0),
            (2, at(5), 7.0),
            (2, at(5, 120), 9.0),  # same bucket -> avg 8.0
        ],
        "user_id long, ts timestamp, value double",
    )
    rows = {(r["user_id"], r["bucket_start_s"]): r for r in gapfill(ev).collect()}
    b = GAPFILL_BUCKET_S
    assert rows[(1, 0)]["value"] == 10.0 and rows[(1, 0)]["filled"] == 0
    assert rows[(1, 1 * b)]["value"] == 20.0 and rows[(1, 1 * b)]["filled"] == 1
    assert rows[(1, 2 * b)]["value"] == 30.0 and rows[(1, 2 * b)]["filled"] == 1
    assert rows[(1, 3 * b)]["value"] == 40.0 and rows[(1, 3 * b)]["filled"] == 0
    assert rows[(2, 5 * b)]["value"] == 8.0 and rows[(2, 5 * b)]["filled"] == 0
    assert len(rows) == 5


def test_priority_sample_two_phase_equals_plain(spark):
    """q57's salted two-phase ranking must return exactly the plain
    single-window sample, and exactly min(n, stratum size) rows per
    stratum — weighted sampling changes WHICH docs win, never HOW MANY."""
    import pyspark.sql.functions as F

    from searchengine_spark.pipelines.curation import (
        PRIO_SAMPLE_N,
        priority_sample,
    )
    from searchengine_spark.pipelines.textstats import load_docs

    docs = load_docs(spark, SF_DIR)
    two = priority_sample(docs, two_phase=True).collect()
    one = priority_sample(docs, two_phase=False).collect()
    assert sorted(map(tuple, two)) == sorted(map(tuple, one))
    sizes = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    got: dict = {}
    for r in two:
        got[r["source"]] = got.get(r["source"], 0) + 1
    assert got == {s: min(PRIO_SAMPLE_N, n) for s, n in sizes.items()}


def test_triangle_counts_planted(spark):
    """q58 core on a planted graph: a 4-clique (each node in C(3,2)=3
    triangles) plus a pendant edge (0 triangles); per-node counts sum to
    3x the triangle total."""
    from searchengine_spark.pipelines.graph import triangle_counts

    clique = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges = spark.createDataFrame(clique + [(4, 9)], "pa long, pb long")
    rows = {r["node"]: r for r in triangle_counts(edges).collect()}
    assert {n: rows[n]["n_triangles"] for n in (1, 2, 3, 9)} == {
        1: 3, 2: 3, 3: 3, 9: 0,
    }
    assert rows[4]["n_triangles"] == 3 and rows[4]["degree"] == 4
    assert sum(r["n_triangles"] for r in rows.values()) == 3 * 4


def test_hits_planted(spark):
    """q59 core on a planted bipartite graph: hub 1 points at all three
    auths, hub 2 at one of them — hub 1 must out-score hub 2, the shared
    auth must out-score the exclusive ones, and each side's scores are an
    L1-normalized distribution (sum to 1)."""
    from searchengine_spark.pipelines.graph import hits_scores

    edges = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 12)], "hub long, auth long"
    )
    rows = {(r["kind"], r["node"]): r["score"] for r in hits_scores(edges).collect()}
    assert rows[("hub", 1)] > rows[("hub", 2)] > 0
    assert rows[("auth", 12)] > rows[("auth", 10)] > 0
    assert rows[("auth", 10)] == rows[("auth", 11)]
    for kind in ("hub", "auth"):
        total = sum(v for (k, _), v in rows.items() if k == kind)
        assert abs(total - 1.0) < 1e-8


def test_pmi_planted(spark):
    """q60 core on a planted corpus: 'alpha beta' adjacent in all 5 docs
    (c_ab=5, c_a=c_b=5, T_uni=15, T_bi=10 → pmi=ln(4.5)); every other
    bigram occurs once and dies at the min-count gate."""
    import math

    from searchengine_spark.pipelines.textstats import pmi_collocations

    docs = spark.createDataFrame(
        [(f"alpha beta w{i}",) for i in range(5)], "text string"
    )
    rows = pmi_collocations(docs).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["w1"], r["w2"], r["c_ab"]) == ("alpha", "beta", 5)
    assert r["pmi"] == round(math.log(5 * 15 * 15 / (10 * 5 * 5)), 9)


def test_spell_del1_banding_is_lossless(spark):
    """q78 core: every vocab pair within levenshtein<=1 of a query must
    survive the delete-1 key join (banding is exact for ED<=1; false
    positives are allowed pre-verify, misses never are)."""
    from pyspark.sql import functions as F

    from searchengine_spark.pipelines.lexical import del1_keys

    vocab = ["stone", "stones", "atone", "stole", "phone", "xylem", "st"]
    queries = ["stone", "tone", "sxone", "stonee", "zzzzz"]
    vdf = spark.createDataFrame([(v,) for v in vocab], "term string")
    qdf = spark.createDataFrame([(q,) for q in queries], "query string")

    banded = {
        (r["query"], r["term"])
        for r in (
            vdf.select("term", F.explode(del1_keys(F.col("term"))).alias("k"))
            .join(
                qdf.select(
                    "query", F.explode(del1_keys(F.col("query"))).alias("k")
                ),
                "k",
            )
            .select("query", "term")
            .distinct()
            .filter(F.levenshtein("query", "term") <= 1)
            .collect()
        )
    }
    brute = {
        (r["query"], r["term"])
        for r in (
            qdf.crossJoin(vdf)
            .filter(F.levenshtein("query", "term") <= 1)
            .collect()
        )
    }
    assert banded == brute
    assert ("tone", "stone") in brute  # insertion
    assert ("sxone", "stone") in brute  # substitution
    assert ("stonee", "stones") in brute  # substitution at tail
    assert all(q != "zzzzz" for q, _ in brute)  # no ED<=1 candidate


def test_crawl_frontier_politeness(spark):
    """q79 invariants at sf0.001: per-host schedule spacing is exactly
    the crawl delay, ranks start at 1 and are contiguous, and the cap
    holds."""
    from searchengine_spark.pipelines.frontier import (
        FRONTIER_CAP,
        FRONTIER_DELAY_MS,
        q79_crawl_frontier,
    )

    rows = q79_crawl_frontier(spark, SF_DIR).collect()
    assert 0 < len(rows) <= FRONTIER_CAP
    by_host: dict[int, list] = {}
    for r in rows:
        by_host.setdefault(r["host_id"], []).append(r)
    for host, hs in by_host.items():
        hs.sort(key=lambda r: r["host_rank"])
        assert [r["host_rank"] for r in hs] == list(range(1, len(hs) + 1))
        for r in hs:
            assert r["sched_ms"] == (r["host_rank"] - 1) * FRONTIER_DELAY_MS
            assert f"https://h{host}.example.com/doc/" in r["url"]


def test_waterfill_spends_budget_exactly(spark):
    """q113 invariants: Σ min(n_s, cap) lands within K of the budget
    (the integer-DIV remainder bound — cap+1 would overspend), small
    sources are never capped, and alloc == n_tokens for them."""
    from searchengine_spark.pipelines.curation import q113_budget_waterfill

    rows = q113_budget_waterfill(spark, SF_DIR).collect()
    assert rows
    budget = rows[0]["budget"]
    cap = rows[0]["cap"]
    k = len(rows)
    spend = sum(r["alloc_tokens"] for r in rows)
    assert budget - k < spend <= budget
    # cap + 1 would overspend (cap is maximal)
    overspend = sum(min(r["n_tokens"], cap + 1) for r in rows)
    assert overspend > budget
    for r in rows:
        if r["n_tokens"] <= cap:
            assert r["capped"] == 0 and r["alloc_tokens"] == r["n_tokens"]
        else:
            assert r["capped"] == 1 and r["alloc_tokens"] == cap


def test_robots_gate_reference_semantics(spark):
    """q118 pins Crawler.java's checkRules quirks: (1) the
    search-crawler section overrides the *-section (h%3==1 hosts use
    delay 500, not the *-section's disallow-all); (2) allow: NEVER
    overrides a disallow match (/tmp/ok/... is blocked on those hosts
    even though 'allow: /tmp/ok' is present — Crawler.java:487-500);
    (3) a host with no matching section allows everything at the
    1000 ms default (Crawler.java:422-429)."""
    from searchengine_spark.pipelines.frontier import q118_robots_gate

    rows = {r["doc_id"]: r for r in q118_robots_gate(spark, SF_DIR).collect()}
    assert rows
    saw = set()
    for r in rows.values():
        kind = r["host_id"] % 3
        path = r["path"]
        saw.add((kind, r["doc_id"] % 4))
        if kind == 0:
            assert r["crawl_delay_ms"] == 2500
            assert r["crawl_allowed"] == (
                0 if path.startswith("/private") else 1
            )
        elif kind == 1:
            assert r["crawl_delay_ms"] == 500
            # /tmp AND /tmp/ok both blocked: allow never overrides
            assert r["crawl_allowed"] == (
                0 if path.startswith("/tmp") else 1
            )
        else:
            assert r["crawl_delay_ms"] == 1000 and r["crawl_allowed"] == 1
    # every (host kind, path kind) combination actually occurred
    assert len(saw) == 12


def test_source_overlap_oph_bounds_exact_jaccard(spark):
    """q120's one-permutation-MinHash estimate tracks the EXACT
    shingle-set Jaccard: with B=128 buckets the estimator std is
    <= sqrt(0.25/128) ~= 0.044, so |est - exact| < 0.15 (>3 sigma) for
    every source pair, and the mean absolute error is < 0.05."""
    from pyspark.sql import functions as F
    from searchengine_spark.pipelines.dedup import (
        load_docs,
        q120_source_overlap_oph,
        source_shingle_occ,
    )

    docs = load_docs(spark, SF_DIR)
    occ = source_shingle_occ(docs).distinct()
    sizes = {
        r["source"]: r["n"]
        for r in occ.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    inter = {
        (r["sa"], r["sb"]): r["ni"]
        for r in (
            occ.alias("a")
            .join(occ.alias("b"), "sh")
            .filter(F.col("a.source") < F.col("b.source"))
            .groupBy(
                F.col("a.source").alias("sa"), F.col("b.source").alias("sb")
            )
            .agg(F.count("*").alias("ni"))
            .collect()
        )
    }
    est = {
        (r["source_a"], r["source_b"]): r["jaccard_est"]
        for r in q120_source_overlap_oph(spark, SF_DIR).collect()
    }
    assert est, "no source pairs"
    errs = []
    for (sa, sb), e in est.items():
        ni = inter.get((sa, sb), 0)
        exact = ni / (sizes[sa] + sizes[sb] - ni)
        errs.append(abs(e - exact))
        assert abs(e - exact) < 0.15, (sa, sb, e, exact)
    assert sum(errs) / len(errs) < 0.05, sum(errs) / len(errs)


def test_bfs_layers_planted(spark):
    """BFS on a planted graph: a directed chain 0->1->2->3->4->5 plus a
    shortcut 0->3 — min-hop must take the shortcut (hop(3)=1, hop(4)=2),
    and the max_hops bound must exclude nodes past it."""
    from searchengine_spark.pipelines.graph import bfs_layers

    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (0, 3)], ["src", "dst"]
    )
    seeds = spark.createDataFrame([(0,)], ["node"])
    got = {
        r["node"]: r["hop"] for r in bfs_layers(e, seeds, 2).collect()
    }
    assert got == {0: 0, 1: 1, 3: 1, 2: 2, 4: 2}, got


def test_leakage_safe_split_invariants(spark):
    """q123: (a) every dup cluster lands in exactly ONE split — the
    leakage guarantee the operator exists for; (b) multi-doc clusters
    exist in the fixture (else (a) is vacuous); (c) each cluster's
    split equals the independently-recomputed md5-of-label assignment
    (doc-level proportions are deliberately lumpy on a small fixture:
    whole clusters move together)."""
    import hashlib

    from searchengine_spark.pipelines.dedup import (
        SPLIT_MOD,
        SPLIT_TRAIN_LT,
        q123_leakage_safe_split,
    )

    rows = q123_leakage_safe_split(spark, SF_DIR).collect()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_cluster.values())
    assert len(by_cluster) < len(rows), "no multi-doc clusters in fixture"
    for cid, splits in by_cluster.items():
        h = int(hashlib.md5(str(cid).encode()).hexdigest()[:15], 16)
        b = h % SPLIT_MOD
        want = (
            "train" if b < SPLIT_TRAIN_LT
            else "val" if b == SPLIT_TRAIN_LT else "test"
        )
        assert splits == {want}, (cid, splits, want)


def test_curation_funnel_is_monotone_and_matches_q40(spark):
    """q125: funnel columns are monotone non-increasing per source
    (cumulative gates), and the total after_dedup-before-quota equals
    the survivor count q40 would produce without its quota gate —
    cross-checked by recomputing q40's predicate set minus quota."""
    from pyspark.sql import functions as F
    from searchengine_spark.pipelines.curation import (
        CURATE_LANGS,
        CURATE_MIN_QUALITY,
        _tok_arr,
        q36_repetition_filter,
        q125_curation_funnel,
    )
    from searchengine_spark.pipelines.dedup import q15_dedup_exact
    from searchengine_spark.pipelines.textstats import (
        load_docs,
        pred_lang_col,
        quality_col,
    )

    rows = q125_curation_funnel(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        seq = [r["n_docs"], r["after_lang"], r["after_quality"],
               r["after_repetition"], r["after_dedup"]]
        assert seq == sorted(seq, reverse=True), r

    docs = load_docs(spark, SF_DIR).withColumn("toks", _tok_arr())
    base = docs.select(
        "doc_id", pred_lang_col().alias("pl"), quality_col().alias("q")
    )
    rep = q36_repetition_filter(spark, SF_DIR).select("doc_id", "keep")
    ded = q15_dedup_exact(spark, SF_DIR).select("doc_id", "canonical_id")
    expect = (
        base.join(rep, "doc_id").join(ded, "doc_id")
        .filter(
            F.col("pl").isin(*CURATE_LANGS)
            & (F.col("q") >= CURATE_MIN_QUALITY)
            & (F.col("keep") == 1)
            & (F.col("doc_id") == F.col("canonical_id"))
        )
        .count()
    )
    assert sum(r["after_dedup"] for r in rows) == expect


def test_wilson_lb_discounts_small_samples(spark):
    """q129 property: the Wilson lower bound is a true lower bound
    (lb <= pass_rate, lb in [0,1]) and matches a pure-Python evaluation
    of the same closed form; the rank ordering is total (1..n with no
    gaps) even under pass_rate ties."""
    import math

    from searchengine_spark.pipelines.textstats import (
        WILSON_Z,
        WILSON_Z2,
        q129_source_wilson,
    )

    rows = q129_source_wilson(spark, SF_DIR).collect()
    assert rows
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    for r in rows:
        assert 0.0 <= r["wilson_lb"] <= r["pass_rate"] <= 1.0, r
        n, p = float(r["n_docs"]), r["n_pass"] / r["n_docs"]
        want = (
            p
            + WILSON_Z2 / (2.0 * n)
            - WILSON_Z * math.sqrt(
                (p * (1.0 - p) + WILSON_Z2 / (4.0 * n)) / n
            )
        ) / (1.0 + WILSON_Z2 / n)
        assert r["wilson_lb"] == want, (r, want)


def test_bfs_layers_matches_python_reference(spark):
    """Property: bfs_layers equals a pure-Python BFS on seeded random
    digraphs (5 draws, up to 30 nodes / 80 edges, 1-3 seeds, hop bound
    3). One Spark run per draw keeps the property affordable; the draws
    are seeded so failures reproduce."""
    import random
    from collections import deque

    from searchengine_spark.pipelines.graph import bfs_layers

    for trial in range(5):
        rng = random.Random(f"bfs:{trial}")
        n = rng.randrange(5, 31)
        edges = sorted(
            {(rng.randrange(n), rng.randrange(n)) for _ in range(rng.randrange(10, 81))}
        )
        seeds = sorted(rng.sample(range(n), rng.randrange(1, 4)))
        max_hops = 3

        adj: dict = {}
        for u, v in edges:
            adj.setdefault(u, []).append(v)
        want, dq = {s: 0 for s in seeds}, deque(seeds)
        while dq:
            u = dq.popleft()
            if want[u] >= max_hops:
                continue
            for v in adj.get(u, []):
                if v not in want:
                    want[v] = want[u] + 1
                    dq.append(v)

        e_df = spark.createDataFrame(edges, ["src", "dst"])
        s_df = spark.createDataFrame([(s,) for s in seeds], ["node"])
        got = {
            r["node"]: r["hop"]
            for r in bfs_layers(e_df, s_df, max_hops).collect()
        }
        assert got == want, (trial, n, seeds, got, want)


def test_label_propagation_properties(spark):
    """q130 invariants: every graph node gets exactly one community,
    community_size is consistent with the assignment, and every
    community label is itself a node of the graph (labels only ever
    copy existing node ids)."""
    from collections import Counter

    from searchengine_spark.pipelines.graph import (
        copurchase_edges,
        q130_label_propagation,
    )

    rows = q130_label_propagation(spark, SF_DIR).collect()
    assert rows
    nodes = {r["node"] for r in rows}
    edges = copurchase_edges(spark, SF_DIR).collect()
    graph_nodes = {e["pa"] for e in edges} | {e["pb"] for e in edges}
    assert nodes == graph_nodes
    assert len(rows) == len(nodes)  # one community per node
    sizes = Counter(r["community"] for r in rows)
    for r in rows:
        assert r["community"] in graph_nodes
        assert r["community_size"] == sizes[r["community"]], r


def test_temperature_mixture_properties(spark):
    """q131 invariants: w_sqrt is the exact integer sqrt of the token
    mass, weights are a probability vector, and the token allocation
    exhausts the budget (up to float addition error)."""
    import math

    from searchengine_spark.pipelines.curation import (
        TEMP_MIX_BUDGET,
        q131_temperature_mixture,
    )

    rows = q131_temperature_mixture(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["w_sqrt"] == math.isqrt(r["n_tokens"]), r
        assert 0.0 < r["weight"] < 1.0
        assert r["alloc_tokens"] == r["weight"] * float(TEMP_MIX_BUDGET)
        assert r["epochs"] == r["alloc_tokens"] / float(r["n_tokens"])
    assert abs(sum(r["weight"] for r in rows) - 1.0) < 1e-9
    assert (
        abs(sum(r["alloc_tokens"] for r in rows) - TEMP_MIX_BUDGET) < 1e-3
    )
    # alpha=0.5 up-weights small sources: under EXACT sqrt, epochs
    # (sampling pressure) are monotone non-increasing in token mass.
    # The integer sqrt floors, so for n_a < n_b:
    #   eps_a = c*isqrt(n_a)/n_a > c*(sqrt(n_a)-1)/n_a
    #         = (c/sqrt(n_a)) * (1 - 1/sqrt(n_a))
    #         >= eps_b * (1 - 1/isqrt(n_a))
    # i.e. inversions are bounded by one isqrt unit of the smaller mass.
    by_mass = sorted(rows, key=lambda r: r["n_tokens"])
    for a, b in zip(by_mass, by_mass[1:]):
        assert a["epochs"] >= b["epochs"] * (1.0 - 1.0 / a["w_sqrt"]), (a, b)


def test_lsh_audit_ties_to_production_path(spark):
    """q132 invariants: the confusion counts are self-consistent, and
    tp equals the production q17 answer size — q17's verified output IS
    truth ∩ candidates, so the audit's tp must match it exactly."""
    from searchengine_spark.pipelines.dedup import (
        q17_minhash_lsh,
        q132_lsh_audit,
    )

    (row,) = q132_lsh_audit(spark, SF_DIR).collect()
    assert row["tp"] + row["fp"] == row["n_cand"]
    assert row["tp"] + row["fn"] == row["n_truth"]
    n17 = q17_minhash_lsh(spark, SF_DIR).count()
    assert n17 == row["tp"]
    if row["n_cand"]:
        assert 0.0 <= row["precision"] <= 1.0
    if row["n_truth"]:
        assert 0.0 <= row["recall"] <= 1.0


def test_hostrank_matches_python_reference(spark):
    """q133: the collapsed weighted PageRank must equal an exact-integer
    Python replay of the same rule over the same host graph — catching
    any floor/overflow/ordering divergence in the distributed plan."""
    from collections import defaultdict

    from searchengine_spark.pipelines.graph import (
        N_ITERS,
        PR_BASE_U,
        PR_ONE_U,
        PR_SCALE,
        member_hosts,
        q133_hostrank,
        SUPP_OFFSET,
    )
    from searchengine_spark.pipelines import _tables
    from pyspark.sql import functions as F

    hm = {
        r["node"]: r["host"]
        for r in member_hosts(spark, SF_DIR).collect()
    }
    li = (
        _tables.load(spark, SF_DIR, "lineitem")
        .select(
            F.col("l_partkey").cast("long").alias("part"),
            (F.col("l_suppkey").cast("long") + SUPP_OFFSET).alias("supp"),
        )
        .distinct()
        .collect()
    )
    w: dict[tuple[int, int], int] = defaultdict(int)
    members = set()
    for r in li:
        members.add(r["part"])
        members.add(r["supp"])
        hs, hd = hm[r["part"]], hm[r["supp"]]
        if hs != hd:
            w[(hs, hd)] += 1
    he: dict[tuple[int, int], int] = defaultdict(int)
    for (s, d), wt in w.items():
        he[(s, d)] += wt
        he[(d, s)] += wt
    wdeg: dict[int, int] = defaultdict(int)
    for (s, _d), wt in he.items():
        wdeg[s] += wt
    hosts = set(wdeg)
    u = {h: PR_ONE_U for h in hosts}
    for _ in range(N_ITERS):
        inc: dict[int, int] = defaultdict(int)
        for (s, d), wt in he.items():
            inc[d] += wt * ((17 * u[s]) // (20 * wdeg[s]))
        u = {h: PR_BASE_U + inc.get(h, 0) for h in hosts}
    want = {
        m: (hm[m], u[hm[m]] / float(PR_SCALE))
        for m in members
    }
    got = {
        r["node"]: (r["host"], r["host_rank"])
        for r in q133_hostrank(spark, SF_DIR).collect()
    }
    assert got == want


def test_percolate_rule_consistency(spark):
    """q134 invariants: the rule table is 8 singletons + 28 AND pairs
    over the top-df terms, every AND count is bounded by both of its
    singleton counts, and each singleton count equals the term's df."""
    from searchengine_spark.pipelines.fulltext import (
        PERC_TOP_TERMS,
        q11_wordcount,
        q134_percolate,
    )

    rows = q134_percolate(spark, SF_DIR).collect()
    singles = {r["term_a"]: r["n_docs"] for r in rows if r["term_b"] == ""}
    pairs = {
        (r["term_a"], r["term_b"]): r["n_docs"]
        for r in rows
        if r["term_b"] != ""
    }
    assert len(singles) == PERC_TOP_TERMS
    assert len(pairs) <= PERC_TOP_TERMS * (PERC_TOP_TERMS - 1) // 2
    for (a, b), n in pairs.items():
        assert a in singles and b in singles
        assert n <= min(singles[a], singles[b]), (a, b)
    dfs = {r["term"]: r["df"] for r in q11_wordcount(spark, SF_DIR).collect()}
    for t, n in singles.items():
        assert n == dfs[t], t


def test_kcore_matches_python_reference(spark):
    """q135: the distributed synchronous peel must equal an exact
    Python replay of the same rule (same k, same round count) over the
    same edge set."""
    from collections import defaultdict

    from searchengine_spark.pipelines.graph import (
        KCORE_ROUNDS,
        copurchase_edges,
        q135_kcore,
    )

    pairs = [
        (r["pa"], r["pb"])
        for r in copurchase_edges(spark, SF_DIR).collect()
    ]
    adj: dict[int, set[int]] = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    deg0 = {v: len(ns) for v, ns in adj.items()}
    k = (4 * sum(deg0.values())) // (5 * len(deg0))
    alive = {v for v, d in deg0.items() if d >= k}
    for _ in range(KCORE_ROUNDS - 1):
        alive = {
            v for v in alive if len(adj[v] & alive) >= k
        }
    want = {v: (deg0[v], k, 1 if v in alive else 0) for v in deg0}
    got = {
        r["node"]: (r["degree"], r["k"], r["in_core"])
        for r in q135_kcore(spark, SF_DIR).collect()
    }
    assert got == want
    assert 0 < len(alive) < len(deg0)  # non-degenerate at fixture scale


def test_assortativity_matches_python_reference(spark):
    """q136: the one-row sufficient statistics and the final Pearson
    must equal an exact Python replay over the collected edge set."""
    from searchengine_spark.pipelines.graph import (
        copurchase_edges,
        q136_assortativity,
    )

    pairs = [
        (r["pa"], r["pb"])
        for r in copurchase_edges(spark, SF_DIR).collect()
    ]
    from collections import defaultdict

    deg: dict[int, int] = defaultdict(int)
    for a, b in pairs:
        deg[a] += 1
        deg[b] += 1
    xs = []
    for a, b in pairs:
        xs.append((deg[a], deg[b]))
        xs.append((deg[b], deg[a]))
    m = len(xs)
    sx = sum(x for x, _ in xs)
    sxy = sum(x * y for x, y in xs)
    sxx = sum(x * x for x, _ in xs)
    want_r = (float(m) * float(sxy) - float(sx) * float(sx)) / (
        float(m) * float(sxx) - float(sx) * float(sx)
    )
    row = q136_assortativity(spark, SF_DIR).collect()[0]
    assert (
        row["n_nodes"], row["n_edges"], row["sum_x"], row["sum_xy"],
        row["sum_xx"],
    ) == (len(deg), len(pairs), sx, sxy, sxx)
    assert row["assortativity"] == want_r
    assert -1.0 <= row["assortativity"] <= 1.0


def test_cocitation_bounds_and_counts(spark):
    """q137 invariants: every pair's co-citation count is bounded by
    both endpoints' citation counts, scores are in (0, 1], the output
    respects the (cocite DESC, sa, sb) total order, and counts tie to
    an exact Python replay over the collected citation list."""
    from collections import defaultdict

    from searchengine_spark.pipelines import _tables
    from searchengine_spark.pipelines.graph import (
        COCITE_MIN,
        COCITE_TOP,
        q137_cocitation,
    )
    from pyspark.sql import functions as F

    rows = q137_cocitation(spark, SF_DIR).collect()
    assert 0 < len(rows) <= COCITE_TOP
    keys = [(-r["cocite"], r["sa"], r["sb"]) for r in rows]
    assert keys == sorted(keys)

    cites = [
        (r["ok"], r["supp"])
        for r in _tables.load(spark, SF_DIR, "lineitem")
        .select(
            F.col("l_orderkey").alias("ok"),
            F.col("l_suppkey").cast("long").alias("supp"),
        )
        .distinct()
        .collect()
    ]
    n_cites: dict[int, int] = defaultdict(int)
    by_ok: dict[int, list[int]] = defaultdict(list)
    for ok, s in cites:
        n_cites[s] += 1
        by_ok[ok].append(s)
    co: dict[tuple[int, int], int] = defaultdict(int)
    for ss in by_ok.values():
        ss = sorted(ss)
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                co[(ss[i], ss[j])] += 1
    for r in rows:
        assert r["na"] == n_cites[r["sa"]] and r["nb"] == n_cites[r["sb"]]
        assert r["cocite"] == co[(r["sa"], r["sb"])] >= COCITE_MIN
        assert r["cocite"] <= min(r["na"], r["nb"])
        assert 0.0 < r["score"] <= 1.0


def test_postings_compression_matches_python_reference(spark):
    """q138: per-term varint byte totals equal an exact Python LEB128
    replay over the collected distinct (doc_id, term) postings."""
    from collections import defaultdict

    from searchengine_spark.pipelines.fulltext import (
        load_docs,
        q138_postings_compression,
    )
    from pyspark.sql import functions as F

    docs = load_docs(spark, SF_DIR)
    dt = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.col("text"), " ")).alias("term"),
        )
        .filter(F.col("term") != "")
        .distinct()
        .collect()
    )
    postings: dict[str, list[int]] = defaultdict(list)
    for r in dt:
        postings[r["term"]].append(r["doc_id"])

    def leb128_bytes(g: int) -> int:
        n = 1
        while g >= 1 << (7 * n) and n < 9:
            n += 1
        return n

    want = {}
    for term, ids in postings.items():
        ids.sort()
        gaps = [ids[0] + 1] + [
            b - a for a, b in zip(ids, ids[1:])
        ]
        vb = sum(leb128_bytes(g) for g in gaps)
        want[term] = (len(ids), len(ids) * 8, vb, max(gaps))
    got = {
        r["term"]: (r["df"], r["raw_bytes"], r["varint_bytes"], r["max_gap"])
        for r in q138_postings_compression(spark, SF_DIR).collect()
    }
    assert got == want
    for r in q138_postings_compression(spark, SF_DIR).collect():
        assert r["df"] <= r["varint_bytes"] <= 9 * r["df"]
        assert r["compress_ratio"] == r["varint_bytes"] / float(r["raw_bytes"])


def test_hyperball_matches_python_reference(spark):
    """q139: registers and estimates must equal an exact Python replay
    of the same md5-hash register construction and MAX-merge rounds;
    and the sketch must actually approximate the true 2-hop ball
    (within the p=6 HLL error envelope on the fixture graph)."""
    import hashlib
    import math
    from collections import defaultdict

    from searchengine_spark.pipelines.graph import (
        HB_ALPHA,
        HB_M,
        HB_ROUNDS,
        HB_W,
        copurchase_edges,
        q139_hyperball,
    )

    pairs = [
        (r["pa"], r["pb"])
        for r in copurchase_edges(spark, SF_DIR).collect()
    ]
    adj: dict[int, set[int]] = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)

    def reg(v: int) -> tuple[int, int]:
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
        w = h & ((1 << HB_W) - 1)
        rho = HB_W + 1 if w == 0 else HB_W - w.bit_length() + 1
        return h >> HB_W, rho

    regs: dict[int, dict[int, int]] = {
        v: dict([reg(v)]) for v in adj
    }
    for _ in range(HB_ROUNDS):
        nxt: dict[int, dict[int, int]] = {}
        for v in adj:
            m = dict(regs[v])
            for u in adj[v]:
                for b, r in regs[u].items():
                    if m.get(b, 0) < r:
                        m[b] = r
            nxt[v] = m
        regs = nxt

    want = {}
    for v, m in regs.items():
        s_all = sum(1 << (HB_W + 1 - r) for r in m.values()) + (
            HB_M - len(m)
        ) * (1 << (HB_W + 1))
        vz = HB_M - len(m)
        raw = HB_ALPHA * float(HB_M) * float(HB_M) * (2.0 ** (HB_W + 1)) / s_all
        est = (
            float(HB_M) * math.log(float(HB_M) / vz)
            if raw <= 2.5 * HB_M and vz > 0
            else raw
        )
        want[v] = (len(adj[v]), len(m), est)
    got = {
        r["node"]: (r["degree"], r["regs_present"], r["ball2_est"])
        for r in q139_hyperball(spark, SF_DIR).collect()
    }
    assert got == want

    # accuracy sanity: the estimate tracks the TRUE 2-hop ball within
    # the p=6 envelope (sigma = 1.04/sqrt(64) = 13%; at sf0.001 every
    # node's 2-hop ball is the whole dense fixture graph, so all nodes
    # share ONE sketch draw — bound by 2 sigma, not by averaging)
    errs = []
    for v in adj:
        ball = {v} | adj[v]
        for u in adj[v]:
            ball |= adj[u]
        exact = len(ball)
        errs.append(abs(got[v][2] - exact) / exact)
    assert sum(errs) / len(errs) < 0.26


def test_champion_lists_tie_to_bm25_topk(spark):
    """q140: per-term tier depth and ordering invariants, and for the
    q13 query terms the champion tier must be EXACTLY q13's top-5
    prefix (same scores, same docs, same order) — the tier answers
    those queries without touching full postings."""
    from collections import defaultdict

    from searchengine_spark.pipelines.fulltext import (
        BM25_QUERY_TERMS,
        CHAMP_M,
        q11_wordcount,
        q13_bm25_topk,
        q140_champion_lists,
    )

    rows = q140_champion_lists(spark, SF_DIR).collect()
    per_term: dict[str, list] = defaultdict(list)
    for r in rows:
        per_term[r["term"]].append(r)
    dfs = {r["term"]: r["df"] for r in q11_wordcount(spark, SF_DIR).collect()}
    assert set(per_term) == set(dfs)  # every vocab term has a tier
    for t, lst in per_term.items():
        assert len(lst) == min(dfs[t], CHAMP_M)
        assert [r["tier_rank"] for r in lst] == list(range(1, len(lst) + 1))
        imps = [(-r["impact"], r["doc_id"]) for r in lst]
        assert imps == sorted(imps)
    top = defaultdict(list)
    for r in q13_bm25_topk(spark, SF_DIR).collect():
        if r["rank"] <= CHAMP_M:
            top[r["term"]].append((r["rank"], r["doc_id"], r["bm25"]))
    for t in BM25_QUERY_TERMS:
        champ = [
            (r["tier_rank"], r["doc_id"], r["impact"]) for r in per_term[t]
        ]
        assert champ == top[t], t


def test_clustering_coefficient_composes_triangles(spark):
    """q141: clustering must equal 2·tri/(deg·(deg−1)) recomputed from
    q58's own output, be 0 exactly for deg < 2, and live in [0, 1]."""
    from searchengine_spark.pipelines.graph import (
        q58_triangles,
        q141_clustering_coefficient,
    )

    tri = {
        r["node"]: (r["degree"], r["n_triangles"])
        for r in q58_triangles(spark, SF_DIR).collect()
    }
    rows = q141_clustering_coefficient(spark, SF_DIR).collect()
    assert {r["node"] for r in rows} == set(tri)
    for r in rows:
        d, t = tri[r["node"]]
        assert (r["degree"], r["n_triangles"]) == (d, t)
        if d < 2:
            assert r["clustering"] == 0.0
        else:
            assert r["clustering"] == float(2 * t) / float(d * (d - 1))
        assert 0.0 <= r["clustering"] <= 1.0


def test_recrawl_schedule_matches_python_reference(spark):
    """q142: per-entity change counts, spans, intervals, and the
    priority permutation must equal an exact Python replay over the
    collected observation log."""
    from collections import defaultdict

    from searchengine_spark.pipelines.relational import (
        load,
        q142_recrawl_schedule,
    )
    from pyspark.sql import functions as F

    ev = (
        load(spark, SF_DIR, "events")
        .select(
            "user_id",
            F.expr("unix_timestamp(ts)").alias("ep"),
            "event_id",
            "value",
        )
        .collect()
    )
    logs: dict[int, list] = defaultdict(list)
    for r in ev:
        logs[r["user_id"]].append((r["ep"], r["event_id"], r["value"]))
    want = {}
    for uid, obs in logs.items():
        obs.sort(key=lambda t: (t[0], t[1]))
        changes = sum(
            1 for a, b in zip(obs, obs[1:]) if b[2] != a[2]
        )
        span = obs[-1][0] - obs[0][0]
        want[uid] = (len(obs), changes, span, span // (changes + 1))
    order = sorted(want, key=lambda u: (want[u][3], u))
    ranks = {u: i + 1 for i, u in enumerate(order)}
    got = {
        r["user_id"]: (
            r["n_obs"], r["n_changes"], r["span_s"],
            r["recrawl_interval_s"], r["crawl_rank"],
        )
        for r in q142_recrawl_schedule(spark, SF_DIR).collect()
    }
    assert got == {u: (*w, ranks[u]) for u, w in want.items()}


def test_pagerank_convergence_ties_to_q27(spark):
    """q143: an exact-integer Python replay of q27's iteration must
    reproduce every per-round L1/L∞ delta, and the deltas must shrink
    monotonically on the fixture graph (the iteration is converging)."""
    from collections import defaultdict

    from searchengine_spark.pipelines.graph import (
        N_ITERS,
        PR_BASE_U,
        PR_ONE_U,
        SUPP_OFFSET,
        q143_pagerank_convergence,
    )
    from searchengine_spark.pipelines import _tables
    from pyspark.sql import functions as F

    li = (
        _tables.load(spark, SF_DIR, "lineitem")
        .select(
            F.col("l_partkey").cast("long").alias("part"),
            (F.col("l_suppkey").cast("long") + SUPP_OFFSET).alias("supp"),
        )
        .distinct()
        .collect()
    )
    e = [(r["part"], r["supp"]) for r in li] + [
        (r["supp"], r["part"]) for r in li
    ]
    outdeg: dict[int, int] = defaultdict(int)
    for s, _d in e:
        outdeg[s] += 1
    nodes = set(outdeg) | {d for _s, d in e}
    u = {n: PR_ONE_U for n in nodes}
    want = []
    for i in range(N_ITERS):
        inc: dict[int, int] = defaultdict(int)
        for s, d in e:
            inc[d] += (17 * u[s]) // (20 * outdeg[s])
        nxt = {n: PR_BASE_U + inc.get(n, 0) for n in nodes}
        ds = [abs(nxt[n] - u[n]) for n in nodes]
        want.append((i + 1, sum(ds), max(ds)))
        u = nxt
    got = [
        (r["iteration"], r["l1_delta_u"], r["linf_delta_u"])
        for r in q143_pagerank_convergence(spark, SF_DIR).collect()
    ]
    assert got == want
    l1s = [w[1] for w in want]
    assert l1s == sorted(l1s, reverse=True)


def test_session_copairs_matches_python_reference(spark):
    """q144: sessionization (8 h gap), per-session distinct types,
    pair supports, and lift must equal an exact Python replay; lift is
    compared bit-exact (same IEEE tree)."""
    from collections import defaultdict
    from itertools import combinations

    from searchengine_spark.pipelines.relational import (
        SESS_GAP_S,
        load,
        q144_session_copairs,
    )
    from pyspark.sql import functions as F

    ev = (
        load(spark, SF_DIR, "events")
        .select(
            "user_id",
            F.expr("unix_timestamp(ts)").alias("ep"),
            "event_id",
            "event_type",
        )
        .collect()
    )
    logs: dict[int, list] = defaultdict(list)
    for r in ev:
        logs[r["user_id"]].append((r["ep"], r["event_id"], r["event_type"]))
    sessions: list[set] = []
    for uid, obs in logs.items():
        obs.sort(key=lambda t: (t[0], t[1]))
        cur: set = set()
        last = None
        for ep, _eid, et in obs:
            if last is not None and ep - last > SESS_GAP_S:
                sessions.append(cur)
                cur = set()
            cur.add(et)
            last = ep
        sessions.append(cur)
    n_sessions = len(sessions)
    n_type: dict[str, int] = defaultdict(int)
    n_co: dict[tuple, int] = defaultdict(int)
    for s in sessions:
        for et in s:
            n_type[et] += 1
        for a, b in combinations(sorted(s), 2):
            n_co[(a, b)] += 1
    order = sorted(n_co, key=lambda p: (-n_co[p], p[0], p[1]))
    ranks = {p: i + 1 for i, p in enumerate(order)}
    rows = q144_session_copairs(spark, SF_DIR).collect()
    assert len(rows) == len(n_co)
    for r in rows:
        p = (r["etype_a"], r["etype_b"])
        assert r["n_co"] == n_co[p]
        assert r["n_a"] == n_type[p[0]]
        assert r["n_b"] == n_type[p[1]]
        assert r["n_sessions"] == n_sessions
        assert r["pair_rank"] == ranks[p]
        assert r["lift"] == (
            float(n_co[p]) * float(n_sessions)
        ) / (float(n_type[p[0]]) * float(n_type[p[1]]))


def test_spam_mass_ties_to_trust_chains(spark):
    """q145: an exact-integer Python replay of BOTH fixed-point chains
    (global teleport and seed-only teleport) must reproduce every u, v,
    mass, ratio, and flag; trusted mass never exceeds global mass."""
    from collections import defaultdict

    from searchengine_spark.pipelines.graph import (
        N_ITERS,
        PPR_SEED_MOD,
        PR_BASE_U,
        PR_ONE_U,
        PR_SCALE,
        SPAM_PCT,
        SUPP_OFFSET,
        q145_spam_mass,
    )
    from searchengine_spark.pipelines import _tables
    from pyspark.sql import functions as F

    li = (
        _tables.load(spark, SF_DIR, "lineitem")
        .select(
            F.col("l_partkey").cast("long").alias("part"),
            (F.col("l_suppkey").cast("long") + SUPP_OFFSET).alias("supp"),
        )
        .distinct()
        .collect()
    )
    e = [(r["part"], r["supp"]) for r in li] + [
        (r["supp"], r["part"]) for r in li
    ]
    outdeg: dict[int, int] = defaultdict(int)
    for s, _d in e:
        outdeg[s] += 1
    nodes = set(outdeg) | {d for _s, d in e}

    def is_seed(n: int) -> bool:
        return n < SUPP_OFFSET and n % PPR_SEED_MOD == 0

    u = {n: PR_ONE_U for n in nodes}
    v = {n: PR_ONE_U if is_seed(n) else 0 for n in nodes}
    for _ in range(N_ITERS):
        iu: dict[int, int] = defaultdict(int)
        iv: dict[int, int] = defaultdict(int)
        for s, d in e:
            iu[d] += (17 * u[s]) // (20 * outdeg[s])
            iv[d] += (17 * v[s]) // (20 * outdeg[s])
        u = {n: PR_BASE_U + iu.get(n, 0) for n in nodes}
        v = {
            n: (PR_BASE_U if is_seed(n) else 0) + iv.get(n, 0)
            for n in nodes
        }
    rows = q145_spam_mass(spark, SF_DIR).collect()
    assert len(rows) == len(nodes)
    for r in rows:
        n = r["node"]
        assert r["is_seed"] == int(is_seed(n))
        assert v[n] <= u[n]
        assert r["pr"] == float(u[n]) / float(PR_SCALE)
        assert r["tr"] == float(v[n]) / float(PR_SCALE)
        assert r["mass_u"] == u[n] - v[n]
        assert r["spam_mass"] == float(u[n] - v[n]) / float(u[n])
        assert r["spam_flag"] == int(
            (u[n] - v[n]) * 100 >= SPAM_PCT * u[n]
        )


def test_kneser_ney_matches_python_reference(spark):
    """q146: bigram supports, left-context totals, continuation
    counts, and the interpolated KN probability must equal an exact
    Python replay (pkn compared bit-exact — identical IEEE tree)."""
    from collections import defaultdict

    from searchengine_spark.pipelines.textstats import (
        KN_MIN_COUNT,
        load_docs,
        q146_kneser_ney,
    )

    texts = [r["text"] for r in load_docs(spark, SF_DIR).collect()]
    c2: dict[tuple, int] = defaultdict(int)
    for t in texts:
        toks = [x for x in t.split(" ") if x != ""]
        for a, b in zip(toks, toks[1:]):
            c2[(a, b)] += 1
    c1: dict[str, int] = defaultdict(int)
    rdiv: dict[str, int] = defaultdict(int)
    cont: dict[str, int] = defaultdict(int)
    for (a, b), c in c2.items():
        c1[a] += c
        rdiv[a] += 1
        cont[b] += 1
    bb = len(c2)
    want = {p: c for p, c in c2.items() if c >= KN_MIN_COUNT}
    rows = q146_kneser_ney(spark, SF_DIR).collect()
    assert len(rows) == len(want)
    for r in rows:
        p = (r["w1"], r["w2"])
        assert p in want
        assert r["c2"] == want[p]
        assert r["c1"] == c1[p[0]]
        assert r["rdiv"] == rdiv[p[0]]
        assert r["cont"] == cont[p[1]]
        assert r["n_bigram_types"] == bb
        assert r["pkn"] == (
            (float(want[p]) - 0.75) / float(c1[p[0]])
        ) + ((0.75 * float(rdiv[p[0]])) / float(c1[p[0]])) * (
            float(cont[p[1]]) / float(bb)
        )


def test_crawl_budget_apportionment_is_exact(spark):
    """q147: Hamilton largest-remainder replay in exact Python ints —
    every base/remainder/rank/alloc matches, and the allocations sum
    EXACTLY to the budget (the property float apportionment breaks)."""
    from searchengine_spark.pipelines.curation import (
        CRAWL_BUDGET,
        load_docs,
        q147_crawl_budget,
    )
    import pyspark.sql.functions as F

    census = {
        r["source"]: r["w"]
        for r in load_docs(spark, SF_DIR)
        .groupBy("source")
        .agg(F.sum("n_chars").cast("long").alias("w"))
        .collect()
    }
    ww = sum(census.values())
    base = {s: (CRAWL_BUDGET * w) // ww for s, w in census.items()}
    rem = {s: (CRAWL_BUDGET * w) % ww for s, w in census.items()}
    r = CRAWL_BUDGET - sum(base.values())
    order = sorted(census, key=lambda s: (-rem[s], s))
    ranks = {s: i + 1 for i, s in enumerate(order)}
    rows = q147_crawl_budget(spark, SF_DIR).collect()
    assert len(rows) == len(census)
    for row in rows:
        s = row["source"]
        extra = int(ranks[s] <= r)
        assert (
            row["w"], row["ww"], row["base"], row["rem"],
            row["rem_rank"], row["extra"], row["alloc"],
        ) == (census[s], ww, base[s], rem[s], ranks[s], extra,
              base[s] + extra)
    assert sum(row["alloc"] for row in rows) == CRAWL_BUDGET


def test_mmr_diversify_greedy_replay(spark):
    """q148: re-derive the pool and pairwise sims with the module's own
    Spark scoring, then replay the greedy MMR selection in Python —
    ranks, picks, penalties, and scores must match exactly; the picked
    set must differ from pure relevance order whenever any penalty is
    non-zero (the re-ranker actually diversifies)."""
    import pyspark.sql.functions as F
    from searchengine_spark.pipelines.similarity import (
        MMR_K,
        MMR_POOL,
        MMR_QID,
        N_QUERIES,
        _dot,
        _with_norm,
        load_emb,
        q148_mmr_diversify,
    )

    e = _with_norm(load_emb(spark, SF_DIR))
    qv = e.filter(F.col("vec_id") == MMR_QID).select(
        F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    pool_rows = (
        e.filter(F.col("vec_id") >= N_QUERIES)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(
                _dot(F.col("qv"), F.col("v"))
                / (F.col("qn") * F.col("nrm")),
                9,
            ).alias("rel_r"),
            "v",
            "nrm",
        )
        .orderBy(F.desc("rel_r"), F.asc("doc_id"))
        .limit(MMR_POOL)
        .collect()
    )
    rel = {r["doc_id"]: r["rel_r"] for r in pool_rows}
    import math

    def cos(a, b):
        d = 0.0
        for x, y in zip(a["v"], b["v"]):
            d += x * y
        return d / (a["nrm"] * b["nrm"])

    # pairwise sims re-rounded through Spark to keep HALF_UP semantics
    by_id = {r["doc_id"]: r for r in pool_rows}
    ids = sorted(by_id)
    sim_df = spark.createDataFrame(
        [
            (a, b, cos(by_id[a], by_id[b]))
            for a in ids
            for b in ids
            if a != b
        ],
        "a long, b long, s double",
    ).select("a", "b", F.round("s", 9).alias("sim_r"))
    sim = {(r["a"], r["b"]): r["sim_r"] for r in sim_df.collect()}

    picked: list[int] = []
    want = []
    for i in range(1, MMR_K + 1):
        best = None
        for d in ids:
            if d in picked:
                continue
            ms = max((sim[(d, s)] for s in picked), default=0.0)
            score = 0.7 * rel[d] - 0.3 * ms
            key = (-score, d)
            if best is None or key < best[0]:
                best = (key, d, ms, score)
        picked.append(best[1])
        want.append((i, best[1], rel[best[1]], best[2], best[3]))
    got = [
        (r["sel_rank"], r["doc_id"], r["rel_r"], r["maxsim_r"], r["mmr_r"])
        for r in q148_mmr_diversify(spark, SF_DIR).collect()
    ]
    assert got == want
    assert math.isfinite(sum(w[4] for w in want))
    # the penalty bites on the fixture: at least one pick has maxsim > 0
    assert any(w[3] != 0.0 for w in want[1:])


def test_trimmed_quality_trim_arithmetic(spark):
    """q149: kept counts follow the integer trim rule exactly, the
    trimmed mean averages exactly the middle slice (Python replay
    within 1e-9 — exactness cross-engine is the oracle gate's job),
    and shift == mean_trimmed - mean_all bit-exact."""
    import pyspark.sql.functions as F
    from searchengine_spark.pipelines.textstats import (
        TRIMQ_PCT,
        _tok_arr,
        load_docs,
        q149_trimmed_quality,
        quality_col,
    )

    per_doc = (
        load_docs(spark, SF_DIR)
        .withColumn("toks", _tok_arr())
        .select("doc_id", "source", quality_col().alias("q"))
        .collect()
    )
    by_src: dict[str, list] = {}
    for r in per_doc:
        by_src.setdefault(r["source"], []).append((r["q"], r["doc_id"]))
    rows = q149_trimmed_quality(spark, SF_DIR).collect()
    assert {r["source"] for r in rows} == set(by_src)
    for r in rows:
        vals = sorted(by_src[r["source"]])
        n = len(vals)
        lo = (n * TRIMQ_PCT) // 100
        kept = vals[lo : n - lo]
        assert r["n_docs"] == n
        assert r["n_kept"] == len(kept) == n - 2 * lo
        assert abs(r["mean_all"] - sum(v for v, _ in vals) / n) < 1e-9
        assert (
            abs(r["mean_trimmed"] - sum(v for v, _ in kept) / len(kept))
            < 1e-9
        )
        assert r["shift"] == r["mean_trimmed"] - r["mean_all"]


def test_source_dup_split_matches_python_census(spark):
    """q150: exact-integer Python replay of the hash census and the
    per-source intra/cross split; shares compared bit-exact."""
    import hashlib

    from searchengine_spark.pipelines.textstats import load_docs
    from searchengine_spark.pipelines.dedup import q150_source_dup_split

    docs = [
        (r["doc_id"], r["source"], hashlib.md5(r["text"].encode()).hexdigest())
        for r in load_docs(spark, SF_DIR).collect()
    ]
    total: dict[str, int] = {}
    srcs: dict[str, set] = {}
    for _d, s, h in docs:
        total[h] = total.get(h, 0) + 1
        srcs.setdefault(h, set()).add(s)
    want: dict[str, list] = {}
    for _d, s, h in docs:
        w = want.setdefault(s, [0, 0, 0, 0])
        w[0] += 1
        if total[h] > 1:
            w[1] += 1
            if len(srcs[h]) == 1:
                w[2] += 1
        if len(srcs[h]) > 1:
            w[3] += 1
    rows = q150_source_dup_split(spark, SF_DIR).collect()
    assert {r["source"] for r in rows} == set(want)
    for r in rows:
        nd, dup, intra, cross = want[r["source"]]
        assert (r["n_docs"], r["n_dup"], r["n_intra"], r["n_cross"]) == (
            nd, dup, intra, cross,
        )
        assert r["dup_share"] == float(dup) / float(nd)
        assert r["cross_share"] == float(cross) / float(nd)


def test_neighborhood_function_ties_to_hyperball(spark):
    """q151: the final-round nf_u must equal the exact int64 sum of
    floor(ball2_est * 10^6) over q139's per-node output (same
    estimate tree, same registers); the series is monotone
    non-decreasing, n_nodes is constant, frac_of_final ends at 1."""
    import math

    from searchengine_spark.pipelines.graph import (
        HB_ROUNDS,
        NF_QUANT,
        q139_hyperball,
        q151_neighborhood_function,
    )

    per_node = q139_hyperball(spark, SF_DIR).collect()
    want_fin = sum(
        int(math.floor(r["ball2_est"] * float(NF_QUANT))) for r in per_node
    )
    rows = sorted(
        q151_neighborhood_function(spark, SF_DIR).collect(),
        key=lambda r: r["r"],
    )
    assert [r["r"] for r in rows] == list(range(HB_ROUNDS + 1))
    assert len({r["n_nodes"] for r in rows}) == 1
    assert rows[0]["n_nodes"] == len(per_node)
    assert rows[-1]["nf_u"] == want_fin
    nfs = [r["nf_u"] for r in rows]
    assert nfs == sorted(nfs)
    assert rows[-1]["frac_of_final"] == 1.0
    for r in rows:
        assert r["nf"] == float(r["nf_u"]) / float(NF_QUANT)


def test_item_cosine_matches_python_reference(spark):
    """q152: exact-integer Python replay of the (user,type) count
    matrix, dot products, and squared norms; cosines bit-exact."""
    import math
    from collections import defaultdict
    from itertools import combinations

    from searchengine_spark.pipelines.relational import (
        load,
        q152_item_cosine,
    )

    ev = load(spark, SF_DIR, "events").select(
        "user_id", "event_type"
    ).collect()
    c: dict[tuple, int] = defaultdict(int)
    for r in ev:
        c[(r["user_id"], r["event_type"])] += 1
    by_user: dict[int, dict] = defaultdict(dict)
    n2: dict[str, int] = defaultdict(int)
    for (u, t), k in c.items():
        by_user[u][t] = k
        n2[t] += k * k
    dot: dict[tuple, int] = defaultdict(int)
    nuser: dict[tuple, int] = defaultdict(int)
    for u, tv in by_user.items():
        for ta, tb in combinations(sorted(tv), 2):
            dot[(ta, tb)] += tv[ta] * tv[tb]
            nuser[(ta, tb)] += 1
    rows = q152_item_cosine(spark, SF_DIR).collect()
    assert len(rows) == len(dot)
    for r in rows:
        p = (r["etype_a"], r["etype_b"])
        assert r["dot_u"] == dot[p]
        assert r["n_users"] == nuser[p]
        assert r["na2"] == n2[p[0]]
        assert r["nb2"] == n2[p[1]]
        assert r["cosine"] == float(dot[p]) / (
            math.sqrt(float(n2[p[0]])) * math.sqrt(float(n2[p[1]]))
        )


def test_adamic_adar_matches_python_reference(spark):
    """q153: exact-integer Python replay of the fixed-point
    Adamic-Adar sums (floor(1e9/ln(deg)) per center, summed exactly);
    ordering and the top-cap must match."""
    import math
    from collections import defaultdict
    from itertools import combinations

    import pyspark.sql.functions as F
    from searchengine_spark.pipelines import _tables
    from searchengine_spark.pipelines.graph import (
        AA_MIN,
        AA_QUANT,
        AA_TOP,
        q153_adamic_adar,
    )

    cite = (
        _tables.load(spark, SF_DIR, "lineitem")
        .select(
            F.col("l_orderkey").alias("ok"),
            F.col("l_suppkey").cast("long").alias("supp"),
        )
        .distinct()
        .collect()
    )
    by_ok: dict = defaultdict(set)
    for r in cite:
        by_ok[r["ok"]].add(r["supp"])
    aa_u: dict = defaultdict(int)
    n_shared: dict = defaultdict(int)
    for members in by_ok.values():
        if len(members) < 2:
            continue
        w_u = int(math.floor(float(AA_QUANT) / math.log(float(len(members)))))
        for sa, sb in combinations(sorted(members), 2):
            aa_u[(sa, sb)] += w_u
            n_shared[(sa, sb)] += 1
    keep = {p for p, n in n_shared.items() if n >= AA_MIN}
    order = sorted(keep, key=lambda p: (-aa_u[p], p[0], p[1]))[:AA_TOP]
    rows = q153_adamic_adar(spark, SF_DIR).collect()
    got = [(r["sa"], r["sb"]) for r in rows]
    assert got == order
    for r in rows:
        p = (r["sa"], r["sb"])
        assert r["n_shared"] == n_shared[p]
        assert r["aa_u"] == aa_u[p]
        assert r["aa"] == float(aa_u[p]) / float(AA_QUANT)


def test_vocab_drift_matches_python_reference(spark):
    """q154: exact-integer Python replay of the half-split term
    census; every count and every share bit-exact."""
    from collections import defaultdict

    from searchengine_spark.pipelines.textstats import (
        load_docs,
        q154_vocab_drift,
    )

    docs = load_docs(spark, SF_DIR).select("doc_id", "text").collect()
    ca: dict = defaultdict(int)
    cb: dict = defaultdict(int)
    for r in docs:
        toks = [x for x in r["text"].split(" ") if x != ""]
        tgt = ca if r["doc_id"] % 2 == 0 else cb
        for w in toks:
            tgt[w] += 1
    vocab = set(ca) | set(cb)
    row = q154_vocab_drift(spark, SF_DIR).collect()[0]
    assert row["n_terms"] == len(vocab)
    assert row["vocab_a"] == len(ca)
    assert row["vocab_b"] == len(cb)
    assert row["vocab_shared"] == len(set(ca) & set(cb))
    assert row["mass_a"] == sum(ca.values())
    assert row["mass_b"] == sum(cb.values())
    new_mass = sum(v for w, v in cb.items() if w not in ca)
    lost_mass = sum(v for w, v in ca.items() if w not in cb)
    assert row["new_mass"] == new_mass
    assert row["lost_mass"] == lost_mass
    assert row["vocab_jaccard"] == float(len(set(ca) & set(cb))) / float(
        len(vocab)
    )
    assert row["new_mass_share"] == float(new_mass) / float(
        sum(cb.values())
    )
    assert row["lost_mass_share"] == float(lost_mass) / float(
        sum(ca.values())
    )


def test_source_gini_matches_python_reference(spark):
    """q155: exact-integer Python replay of the rank-weighted Gini;
    scalar outputs bit-exact; gini in [0, 1)."""
    import pyspark.sql.functions as F
    from searchengine_spark.pipelines.curation import q155_source_gini
    from searchengine_spark.pipelines.textstats import _tok_arr, load_docs

    census = {
        r["source"]: r["w"]
        for r in load_docs(spark, SF_DIR)
        .select("source", F.size(_tok_arr()).cast("long").alias("nt"))
        .groupBy("source")
        .agg(F.sum("nt").cast("long").alias("w"))
        .collect()
    }
    order = sorted(census, key=lambda s: (census[s], s))
    n = len(order)
    total = sum(census.values())
    iw = sum((i + 1) * census[s] for i, s in enumerate(order))
    row = q155_source_gini(spark, SF_DIR).collect()[0]
    assert (row["n_sources"], row["total_w"], row["iw_sum"]) == (
        n, total, iw,
    )
    assert row["max_w"] == max(census.values())
    want = (float(iw) * 2.0) / (float(n) * float(total)) - float(
        n + 1
    ) / float(n)
    assert row["gini"] == want
    assert 0.0 <= row["gini"] < 1.0
    assert row["top_share"] == float(max(census.values())) / float(total)


def test_spearman_len_quality_matches_python_reference(spark):
    """q156: exact-integer Python replay of the rank difference sum;
    rho bit-exact and inside [-1, 1]."""
    import pyspark.sql.functions as F
    from searchengine_spark.pipelines.textstats import (
        _tok_arr,
        load_docs,
        q156_spearman_len_quality,
        quality_col,
    )

    rows = (
        load_docs(spark, SF_DIR)
        .withColumn("toks", _tok_arr())
        .select(
            "doc_id",
            F.size("toks").cast("long").alias("n_toks"),
            quality_col().alias("quality"),
        )
        .collect()
    )
    n = len(rows)
    rx = {
        r["doc_id"]: i + 1
        for i, r in enumerate(
            sorted(rows, key=lambda r: (r["n_toks"], r["doc_id"]))
        )
    }
    ry = {
        r["doc_id"]: i + 1
        for i, r in enumerate(
            sorted(rows, key=lambda r: (r["quality"], r["doc_id"]))
        )
    }
    d2 = sum((rx[d] - ry[d]) ** 2 for d in rx)
    got = q156_spearman_len_quality(spark, SF_DIR).collect()[0]
    assert (got["n_docs"], got["d2_sum"]) == (n, d2)
    assert got["spearman_rho"] == 1.0 - float(6 * d2) / float(
        n * (n * n - 1)
    )
    assert -1.0 <= got["spearman_rho"] <= 1.0


def test_harmonic_centrality_consistent_with_hyperball(spark):
    """q157: b2_u must be exactly q139's ball estimate quantized (same
    registers, same rounds), h2_u the exact integer combination, and
    the published harmonic the single IEEE division over it."""
    import math

    from searchengine_spark.pipelines.graph import (
        NF_QUANT,
        q139_hyperball,
        q157_harmonic_centrality,
    )

    hb = {r["node"]: r["ball2_est"] for r in q139_hyperball(spark, SF_DIR).collect()}
    got = q157_harmonic_centrality(spark, SF_DIR).collect()
    assert len(got) == len(hb)
    for r in got:
        assert r["b2_u"] == math.floor(hb[r["node"]] * float(NF_QUANT))
        want_h2 = 2 * (r["b1_u"] - r["b0_u"]) + (r["b2_u"] - r["b1_u"])
        assert r["h2_u"] == want_h2
        assert r["harmonic"] == float(want_h2) / float(2 * NF_QUANT)
        # ball0 is the node itself: est ~1, so b0_u sits near NF_QUANT
        # and balls grow (monotone registers; branch switch aside)
        assert r["b0_u"] <= r["b1_u"] <= r["b2_u"]


def test_yule_k_matches_python_reference(spark):
    """q158: exact-integer Python replay of the frequency spectrum;
    K and TTR bit-exact."""
    from collections import Counter

    from searchengine_spark.pipelines.textstats import load_docs, q158_yule_k

    docs = load_docs(spark, SF_DIR).select("source", "text").collect()
    tf = Counter()
    for r in docs:
        for t in r["text"].split(" "):
            if t:
                tf[(r["source"], t)] += 1
    per_src = {}
    for (src, _t), c in tf.items():
        n, ty, s2 = per_src.get(src, (0, 0, 0))
        per_src[src] = (n + c, ty + 1, s2 + c * c)
    got = q158_yule_k(spark, SF_DIR).collect()
    assert len(got) == len(per_src)
    for r in got:
        n, ty, s2 = per_src[r["source"]]
        assert (r["n_tokens"], r["n_types"], r["sum_tf2"]) == (n, ty, s2)
        assert r["yule_k"] == 10000.0 * float(s2 - n) / (float(n) * float(n))
        assert r["ttr"] == float(ty) / float(n)
        assert r["yule_k"] >= 0.0


def test_markov_transitions_matches_python_reference(spark):
    """q159: Python replay of the lead-pair census; smoothed rows of
    the matrix sum to (row_total + n_obs_next) / (row_total + K) and
    probabilities are bit-exact."""
    from collections import Counter

    from searchengine_spark.pipelines.relational import (
        MKV_GAP_S,
        load,
        q159_markov_transitions,
    )

    ev = sorted(
        load(spark, SF_DIR, "events")
        .selectExpr(
            "user_id", "unix_timestamp(ts) AS ep", "event_id", "event_type"
        )
        .collect(),
        key=lambda r: (r["user_id"], r["ep"], r["event_id"]),
    )
    trans = Counter()
    states = set()
    for a, b in zip(ev, ev[1:]):
        states.add(a["event_type"])
        if (
            a["user_id"] == b["user_id"]
            and b["ep"] - a["ep"] <= MKV_GAP_S
        ):
            trans[(a["event_type"], b["event_type"])] += 1
    states.update(r["event_type"] for r in ev)
    k = len(states)
    row_tot = Counter()
    for (cur, _n), c in trans.items():
        row_tot[cur] += c
    got = q159_markov_transitions(spark, SF_DIR).collect()
    assert len(got) == len(trans)
    for r in got:
        key = (r["cur_type"], r["next_type"])
        assert r["n"] == trans[key]
        assert r["row_total"] == row_tot[r["cur_type"]]
        assert r["n_states"] == k
        assert r["p_smooth"] == float(trans[key] + 1) / float(
            row_tot[r["cur_type"]] + k
        )


def test_ab_ztest_matches_python_reference(spark):
    """q160: replay the md5 arm assignment + pooled z in Python;
    counts exact, z bit-exact, flag consistent."""
    import hashlib
    import math

    from searchengine_spark.pipelines.relational import (
        AB_CONV_MIN,
        AB_Z_CRIT,
        load,
        q160_ab_ztest,
    )

    ev = load(spark, SF_DIR, "events").select(
        "user_id", "event_type", "value"
    ).collect()
    conv = {}
    for r in ev:
        u = r["user_id"]
        conv[u] = conv.get(u, 0) or (
            1
            if r["event_type"] == "purchase" and r["value"] > AB_CONV_MIN
            else 0
        )
    n = [0, 0]
    c = [0, 0]
    for u, cv in conv.items():
        arm = int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16) % 2
        n[arm] += 1
        c[arm] += cv
    row = q160_ab_ztest(spark, SF_DIR).collect()[0]
    assert (row["n0"], row["c0"], row["n1"], row["c1"]) == (
        n[0], c[0], n[1], c[1],
    )
    p0, p1 = c[0] / n[0], c[1] / n[1]
    pp = (c[0] + c[1]) / (n[0] + n[1])
    z = (p1 - p0) / math.sqrt(pp * (1.0 - pp) * (1.0 / n[0] + 1.0 / n[1]))
    assert row["p0"] == p0 and row["p1"] == p1 and row["p_pooled"] == pp
    assert row["z"] == z
    assert row["significant"] == (abs(z) > AB_Z_CRIT)


def test_winnowing_matches_python_reference(spark):
    """q161: full Python winnowing replay — counts exact, and the
    winnowing coverage guarantee holds (every window of W k-grams has
    a selected fingerprint position inside it)."""
    import hashlib

    from searchengine_spark.pipelines.textstats import (
        FP_BASE,
        FP_MOD,
        WIN_K,
        WIN_POS_BITS,
        WIN_W,
        load_docs,
        q161_winnowing,
    )

    docs = load_docs(spark, SF_DIR).select("doc_id", "text").collect()
    want = {}
    for r in docs:
        toks = [t for t in r["text"].split(" ") if t]
        th = [
            int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % FP_MOD
            for t in toks
        ]
        kh = []
        for i in range(len(th) - WIN_K + 1):
            h = th[i]
            for j in range(1, WIN_K):
                h = (h * FP_BASE + th[i + j]) % FP_MOD
            kh.append(h)
        if not kh:
            continue
        sel = set()
        for s in range(len(kh) - WIN_W + 1):
            win = [
                kh[p] * (1 << WIN_POS_BITS)
                + ((1 << WIN_POS_BITS) - 1 - p)
                for p in range(s, s + WIN_W)
            ]
            sel.add(min(win))
        want[r["doc_id"]] = (len(kh), len(sel))
    got = q161_winnowing(spark, SF_DIR).collect()
    assert len(got) == len(want)
    for r in got:
        nk, ns = want[r["doc_id"]]
        assert (r["n_kgrams"], r["n_selected"]) == (nk, ns)
        if nk >= WIN_W:
            assert r["density"] == float(ns) / float(nk - WIN_W + 1)
        else:
            assert r["density"] == 0.0 and ns == 0


def test_bowtie_matches_python_reference(spark):
    """q162: Python BFS replay of the bounded bow-tie census; classes
    partition the node set and the pivot sits in the core."""
    from collections import defaultdict

    from searchengine_spark.pipelines.graph import (
        BT_HOPS,
        _seq_edges,
        q162_bowtie,
    )

    e = [(r["src"], r["dst"]) for r in _seq_edges(spark, SF_DIR).collect()]
    nodes = {s for s, _ in e} | {d for _, d in e}
    deg = defaultdict(int)
    for s, d in e:
        deg[s] += 1
        deg[d] += 1
    pivot = min(nodes, key=lambda n: (-deg[n], n))
    fwd_adj, bwd_adj = defaultdict(list), defaultdict(list)
    for s, d in e:
        fwd_adj[s].append(d)
        bwd_adj[d].append(s)

    def ball(adj):
        seen, frontier = {pivot}, {pivot}
        for _ in range(BT_HOPS):
            frontier = {
                d for n in frontier for d in adj[n] if d not in seen
            }
            seen |= frontier
        return seen

    f, b = ball(fwd_adj), ball(bwd_adj)
    want = {"core": 0, "in": 0, "out": 0, "disc": 0}
    for n in nodes:
        if n in f and n in b:
            want["core"] += 1
        elif n in b:
            want["in"] += 1
        elif n in f:
            want["out"] += 1
        else:
            want["disc"] += 1
    got = {r["component"]: r for r in q162_bowtie(spark, SF_DIR).collect()}
    assert set(got) == set(want)
    for comp, r in got.items():
        assert r["n_nodes"] == want[comp]
        assert r["n_total"] == len(nodes)
        assert r["radius"] == BT_HOPS
        assert r["share"] == float(want[comp]) / float(len(nodes))
    assert got["core"]["n_nodes"] >= 1
    assert sum(r["n_nodes"] for r in got.values()) == len(nodes)


def test_curriculum_order_matches_python_reference(spark):
    """q163: replay ntile bucketing + round-robin interleave in
    Python over the engine's own quality column; exact rows."""
    import pyspark.sql.functions as F
    from searchengine_spark.pipelines.curation import (
        CUR_BUCKETS,
        CUR_EMIT,
        q163_curriculum_order,
    )
    from searchengine_spark.pipelines.textstats import (
        _tok_arr,
        load_docs,
        quality_col,
    )

    rows = (
        load_docs(spark, SF_DIR)
        .withColumn("toks", _tok_arr())
        .select("doc_id", quality_col().alias("quality"))
        .collect()
    )
    ordered = sorted(rows, key=lambda r: (-r["quality"], r["doc_id"]))
    n = len(ordered)
    base, rem = divmod(n, CUR_BUCKETS)
    want = []
    idx = 0
    for b in range(CUR_BUCKETS):
        size = base + (1 if b < rem else 0)
        for rnd in range(size):
            r = ordered[idx]
            want.append(
                (rnd * CUR_BUCKETS + b, r["doc_id"], b, rnd, r["quality"])
            )
            idx += 1
    want.sort(key=lambda t: (t[0], t[1]))
    got = q163_curriculum_order(spark, SF_DIR).collect()
    assert len(got) == min(CUR_EMIT, n)
    for g, w in zip(got, want[: len(got)]):
        assert (
            g["cur_pos"], g["doc_id"], g["bucket"], g["round"], g["quality"]
        ) == w


def test_jl_projection_matches_python_reference(spark):
    """q164: replay the sign projection and fold order in Python —
    bit-exact doubles (same left-to-right IEEE adds)."""
    from searchengine_spark.pipelines.similarity import (
        JL_DIMS,
        JL_SAMPLE,
        _jl_signs,
        load_emb,
        q164_jl_projection,
    )

    signs = _jl_signs()
    vecs = {
        r["vec_id"]: r["v"]
        for r in load_emb(spark, SF_DIR)
        .filter("vec_id < %d" % JL_SAMPLE)
        .collect()
    }

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    def sqd(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + (x - y) * (x - y)
        return acc

    proj = {
        vid: [dot(v, signs[j]) for j in range(JL_DIMS)]
        for vid, v in vecs.items()
    }
    got = q164_jl_projection(spark, SF_DIR).collect()
    n = len(vecs)
    assert len(got) == n * (n - 1) // 2
    for r in got:
        a, b = r["a"], r["b"]
        d2o = sqd(vecs[a], vecs[b])
        d2p = sqd(proj[a], proj[b])
        assert r["d2_orig"] == d2o
        assert r["d2_proj"] == d2p
        if d2o > 0.0:
            assert r["distortion"] == d2p / (float(JL_DIMS) * d2o)
        else:
            assert r["distortion"] is None
    # the audit itself: mean distortion should sit near 1
    ds = [r["distortion"] for r in got if r["distortion"] is not None]
    assert 0.5 < sum(ds) / len(ds) < 1.5


def test_zonemap_prune_matches_python_reference(spark):
    """q165: replay both layouts' zone census in Python; exact
    integers and the clustered layout at (or near) the ideal."""
    import datetime

    from searchengine_spark.pipelines import _tables
    from searchengine_spark.pipelines.engine_ops import (
        ZM_HI,
        ZM_LO,
        ZM_ROWS,
        q165_zonemap_prune,
    )

    li = [
        (r["l_orderkey"], r["l_linenumber"], r["l_shipdate"].date()
         if hasattr(r["l_shipdate"], "date") else r["l_shipdate"])
        for r in _tables.load(spark, SF_DIR, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_shipdate")
        .collect()
    ]
    lo = datetime.date.fromisoformat(ZM_LO)
    hi = datetime.date.fromisoformat(ZM_HI)

    def audit(rows):
        zones = {}
        for i, (_ok, _ln, sd) in enumerate(rows):
            z = i // ZM_ROWS
            zmin, zmax, zm = zones.get(z, (sd, sd, 0))
            zones[z] = (
                min(zmin, sd),
                max(zmax, sd),
                zm + (1 if lo <= sd <= hi else 0),
            )
        hit = sum(1 for zmin, zmax, _ in zones.values()
                  if zmin <= hi and zmax >= lo)
        matched = sum(m for _, _, m in zones.values())
        return len(zones), hit, matched

    nat = audit(sorted(li, key=lambda t: (t[0], t[1])))
    clu = audit(sorted(li, key=lambda t: (t[2], t[0], t[1])))
    got = {r["layout"]: r for r in q165_zonemap_prune(spark, SF_DIR).collect()}
    for layout, (nz, hit, matched) in (("natural", nat), ("clustered", clu)):
        r = got[layout]
        assert (r["n_zones"], r["zones_hit"], r["rows_matched"]) == (
            nz, hit, matched,
        )
        assert r["n_rows"] == len(li)
        ideal = (matched + ZM_ROWS - 1) // ZM_ROWS
        assert r["ideal_zones"] == ideal
        assert r["skip_rate"] == 1.0 - float(hit) / float(nz)
    # the audit's point: clustering prunes, natural barely does
    assert got["clustered"]["zones_hit"] <= got["natural"]["zones_hit"]
    assert (
        got["clustered"]["zones_hit"]
        <= got["clustered"]["ideal_zones"] + 1
    )


def test_textrank_matches_python_reference(spark):
    """q166: exact int64 fixed-point replay of the weighted iteration;
    u values and top ordering bit-exact."""
    from collections import defaultdict

    from searchengine_spark.pipelines.fulltext import (
        TR_ITERS,
        TR_SCALE,
        TR_STOPS,
        TR_TOP,
        load_docs,
        q166_textrank_keywords,
    )

    docs = load_docs(spark, SF_DIR).select("doc_id", "text").collect()
    w = defaultdict(int)
    for r in docs:
        seq = [t for t in r["text"].split(" ") if t and t not in TR_STOPS]
        for a, b in zip(seq, seq[1:]):
            if a != b:
                w[(a, b)] += 1
                w[(b, a)] += 1
    nodes = {a for a, _ in w}
    wsum = defaultdict(int)
    for (a, _b), c in w.items():
        wsum[a] += c
    u = {n: TR_SCALE for n in nodes}
    base = 3 * TR_SCALE // 20
    for _ in range(TR_ITERS):
        inc = defaultdict(int)
        for (a, b), c in w.items():
            inc[b] += (17 * u[a] * c) // (20 * wsum[a])
        u = {n: base + inc[n] for n in nodes}
    want = sorted(nodes, key=lambda n: (-u[n], n))[:TR_TOP]
    got = q166_textrank_keywords(spark, SF_DIR).collect()
    assert [r["term"] for r in got] == want
    for r in got:
        assert r["u"] == u[r["term"]]
        assert r["textrank"] == float(u[r["term"]]) / float(TR_SCALE)


def test_heaps_law_matches_python_reference(spark):
    """q167: replay the growth curve and the OLS over exact-decimal
    partials; beta in a sane Heaps range for the fixture."""
    from decimal import Decimal
    from math import exp, log

    from searchengine_spark.pipelines.textstats import (
        load_docs,
        q167_heaps_law,
    )

    docs = sorted(
        load_docs(spark, SF_DIR).select("doc_id", "text").collect(),
        key=lambda r: r["doc_id"],
    )
    seen = set()
    cum_n = cum_v = 0
    pts = []
    for r in docs:
        toks = [t for t in r["text"].split(" ") if t]
        cum_n += len(toks)
        for t in toks:
            if t not in seen:
                seen.add(t)
                cum_v += 1
        if cum_n > 0 and cum_v > 0:
            pts.append((log(float(cum_n)), log(float(cum_v))))
    q = Decimal("1.000000000000")
    n = len(pts)
    sx = float(sum(Decimal(x).quantize(q) for x, _ in pts))
    sy = float(sum(Decimal(y).quantize(q) for _, y in pts))
    sxy = float(sum(Decimal(x * y).quantize(q) for x, y in pts))
    sxx = float(sum(Decimal(x * x).quantize(q) for x, _ in pts))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    row = q167_heaps_law(spark, SF_DIR).collect()[0]
    assert row["n_points"] == n
    assert abs(row["heaps_beta"] - slope) < 1e-8
    assert abs(row["heaps_k"] - exp((sy - slope * sx) / n)) < 1e-6
    assert 0.0 < row["heaps_beta"] < 1.0


def test_sdm_rank_matches_python_reference(spark):
    """q168: replay the three SDM features from raw positions; scores
    bit-exact (single IEEE tree over exact integer counts)."""
    from math import log

    from searchengine_spark.pipelines.fulltext import (
        PROX_PAIR,
        QL_MU,
        SDM_K,
        SDM_UW,
        SDM_W,
        load_docs,
        q168_sdm_rank,
    )

    t1, t2 = PROX_PAIR
    docs = load_docs(spark, SF_DIR).select("doc_id", "text").collect()
    feats = {}
    total_c = big_total = cf1 = cf2 = od_cf = uw_cf = 0
    for r in docs:
        toks = [t for t in r["text"].split(" ") if t]
        dl = len(toks)
        total_c += dl
        big_total += max(dl - 1, 0)
        p1 = [i for i, t in enumerate(toks) if t == t1]
        p2 = [i for i, t in enumerate(toks) if t == t2]
        od = sum(1 for a in p1 for b in p2 if b == a + 1)
        uw = sum(1 for a in p1 for b in p2 if abs(a - b) <= SDM_UW)
        cf1 += len(p1)
        cf2 += len(p2)
        od_cf += od
        uw_cf += uw
        if p1 or p2:
            feats[r["doc_id"]] = (len(p1), len(p2), dl, od, uw)
    want = {}
    for doc_id, (tf1, tf2, dl, od, uw) in feats.items():
        f_t = log(
            (tf1 + QL_MU * cf1 / total_c) / (dl + QL_MU)
        ) + log((tf2 + QL_MU * cf2 / total_c) / (dl + QL_MU))
        f_o = log(
            (od + QL_MU * od_cf / big_total) / (dl - 1.0 + QL_MU)
        )
        f_u = log((uw + QL_MU * uw_cf / total_c) / (dl + QL_MU))
        want[doc_id] = SDM_W[0] * f_t + SDM_W[1] * f_o + SDM_W[2] * f_u
    top = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:SDM_K]
    got = q168_sdm_rank(spark, SF_DIR).collect()
    assert [(r["doc_id"], r["sdm"]) for r in got] == top
    assert [r["rank"] for r in got] == list(range(1, len(top) + 1))


def test_dwell_percentiles_matches_python_reference(spark):
    """q169: replay the lead-gap census + rank interpolation."""
    from searchengine_spark.pipelines.relational import (
        DWELL_QUANTILES,
        MKV_GAP_S,
        load,
        q169_dwell_percentiles,
    )

    ev = sorted(
        load(spark, SF_DIR, "events")
        .selectExpr(
            "user_id", "unix_timestamp(ts) AS ep", "event_id", "event_type"
        )
        .collect(),
        key=lambda r: (r["user_id"], r["ep"], r["event_id"]),
    )
    dw = {}
    for a, b in zip(ev, ev[1:]):
        if a["user_id"] == b["user_id"] and b["ep"] - a["ep"] <= MKV_GAP_S:
            dw.setdefault(a["event_type"], []).append(
                (float(b["ep"] - a["ep"]), a["event_id"])
            )
    got = {r["event_type"]: r for r in q169_dwell_percentiles(spark, SF_DIR).collect()}
    assert set(got) == set(dw)
    for et, vals in dw.items():
        vals.sort()
        n = len(vals)
        assert got[et]["n_dwells"] == n
        for q in DWELL_QUANTILES:
            pos = q * (n - 1)
            lo, hi = int(pos // 1), -(-pos // 1)
            v = vals[int(lo)][0] + (pos - lo) * (
                vals[int(hi)][0] - vals[int(lo)][0]
            )
            assert got[et][f"p{int(q * 100)}"] == round(v, 9)


def test_js_divergence_matches_python_reference(spark):
    """q170: symmetric, bounded by ln 2, zero iff identical counts;
    spot-replay a pair's JS in Python within decimal quantization."""
    import math
    from collections import Counter

    from searchengine_spark.pipelines.textstats import (
        load_docs,
        q170_js_divergence,
    )

    docs = load_docs(spark, SF_DIR).select("source", "text").collect()
    tf = Counter()
    for r in docs:
        for t in r["text"].split(" "):
            if t:
                tf[(r["source"], t)] += 1
    tot = Counter()
    for (s, _t), c in tf.items():
        tot[s] += c
    rows = q170_js_divergence(spark, SF_DIR).collect()
    srcs = sorted(tot)
    assert len(rows) == len(srcs) * (len(srcs) - 1) // 2
    for r in rows:
        assert 0.0 <= r["js"] <= math.log(2.0) + 1e-9
        sa, sb = r["sa"], r["sb"]
        vocab = {t for (s, t) in tf if s in (sa, sb)}
        js = 0.0
        for t in vocab:
            p = tf.get((sa, t), 0) / tot[sa]
            q = tf.get((sb, t), 0) / tot[sb]
            m = 0.5 * (p + q)
            if p > 0:
                js += 0.5 * p * math.log(p / m)
            if q > 0:
                js += 0.5 * q * math.log(q / m)
        assert abs(r["js"] - js) < 1e-9


def test_term_shard_skew_matches_python_reference(spark):
    """q171: replay both shard assignments off the md5 replica; masses
    exact, salted layout near-ideal, shares sum to 1 per strategy."""
    import hashlib
    from collections import Counter

    from searchengine_spark.pipelines.engine_ops import (
        SHARD_N,
        q171_term_shard_skew,
    )
    from searchengine_spark.pipelines import _tables

    docs = _tables.load(spark, SF_DIR, "documents").select(
        "doc_id", "text"
    ).collect()

    def ph(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % SHARD_N

    mass = Counter()
    for r in docs:
        for t in r["text"].split(" "):
            if t:
                mass[("by_term", ph(t))] += 1
                mass[("salted", ph(f"{t}#{r['doc_id']}"))] += 1
    total = sum(c for (s, _), c in mass.items() if s == "by_term")
    got = q171_term_shard_skew(spark, SF_DIR).collect()
    assert len(got) == len(mass)
    for r in got:
        assert r["mass"] == mass[(r["strategy"], r["shard"])]
        assert r["share"] == float(r["mass"]) / float(total)
        assert r["straggler"] == float(r["mass"]) / (
            float(total) / float(SHARD_N)
        )
    salted = [r["straggler"] for r in got if r["strategy"] == "salted"]
    assert max(salted) < 1.2  # salting rebalances


def test_lsh_planner_matches_python_reference(spark):
    """q172: replay the closed-form S-curve; the threshold column is
    monotone in r and the curve is monotone in s per split."""
    from searchengine_spark.pipelines.dedup import (
        LSH_PLAN_LEVELS,
        LSH_PLAN_SPLITS,
        q172_lsh_planner,
    )

    got = q172_lsh_planner(spark, SF_DIR).collect()
    assert len(got) == len(LSH_PLAN_SPLITS) * len(LSH_PLAN_LEVELS)
    for r in got:
        b, rr, s = r["bands"], r["rows"], r["s"]
        p = 1.0 - (1.0 - s ** float(rr)) ** float(b)
        t = (1.0 / float(b)) ** (1.0 / float(rr))
        assert abs(r["p_collide"] - p) < 1e-8
        assert abs(r["threshold"] - t) < 1e-8
        assert r["above_threshold"] == (s >= round(t, 9))
        assert 0.0 <= r["p_collide"] <= 1.0
    # monotone in s within a split
    from itertools import groupby

    for _, rows in groupby(got, key=lambda r: (r["bands"], r["rows"])):
        ps = [r["p_collide"] for r in rows]
        assert ps == sorted(ps)


def test_reciprocity_matches_python_reference(spark):
    """q173: Python replay of the edge-transpose membership census."""
    from collections import Counter

    from searchengine_spark.pipelines.graph import (
        RECIP_TOP,
        _seq_edges,
        q173_reciprocity,
    )

    e = {(r["src"], r["dst"]) for r in _seq_edges(spark, SF_DIR).collect()}
    out_deg = Counter(s for s, _ in e)
    n_rec = Counter(s for s, d in e if (d, s) in e)
    total_rec = sum(n_rec.values())
    got = q173_reciprocity(spark, SF_DIR).collect()
    want_order = sorted(
        out_deg,
        key=lambda n: (-n_rec.get(n, 0), -out_deg[n], n),
    )[:RECIP_TOP]
    assert [r["node"] for r in got] == want_order
    for r in got:
        assert r["out_deg"] == out_deg[r["node"]]
        assert r["n_recip"] == n_rec.get(r["node"], 0)
        assert r["n_edges"] == len(e)
        assert r["n_recip_total"] == total_rec
        assert r["global_reciprocity"] == float(total_rec) / float(len(e))


def test_interleave_matches_python_reference(spark):
    """q174: the closed-form key must equal the sequential balanced-
    interleave procedure replayed in Python over the engine's own
    ranks; team parity and positions exact."""
    from searchengine_spark.pipelines.fulltext import (
        INTER_K,
        q174_interleave,
    )

    got = q174_interleave(spark, SF_DIR).collect()
    assert len(got) == INTER_K
    ra = {r["doc_id"]: r["rank_a"] for r in got}
    rb = {r["doc_id"]: r["rank_b"] for r in got}
    # replay: A1 B1 A2 B2 ... first-appearance order over the union
    # (ranks of docs outside the top-K window can't matter for the
    # emitted prefix: key = min(2ra-1, 2rb) is monotone in both)
    keys = {d: min(2 * ra[d] - 1, 2 * rb[d]) for d in ra}
    order = sorted(ra, key=lambda d: keys[d])
    assert [r["doc_id"] for r in got] == order
    for r in got:
        k = keys[r["doc_id"]]
        assert r["team"] == ("A" if k % 2 == 1 else "B")
    # both teams must be represented in a balanced interleave prefix
    teams = {r["team"] for r in got}
    assert teams == {"A", "B"}


def test_cdc_chunks_matches_python_reference(spark):
    """q175: Python replay of boundary placement + chunk hashing; the
    CDC shift-robustness property checked directly (inserting a token
    at the head only changes the first chunk's hash)."""
    import hashlib

    from searchengine_spark.pipelines.curation import (
        CDC_CONST,
        CDC_MOD,
        q175_cdc_chunks,
    )
    from searchengine_spark.pipelines.textstats import load_docs

    def chunks_of(toks):
        # a boundary token ENDS its chunk (the gear-CDC convention the
        # engine's strictly-preceding cumsum implements)
        out, cur = [], []
        for t in toks:
            cur.append(t)
            h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
            if h % CDC_MOD == CDC_CONST:
                out.append(cur)
                cur = []
        if cur:
            out.append(cur)
        return out

    docs = load_docs(spark, SF_DIR).select("doc_id", "text").collect()
    census = {}
    for r in docs:
        toks = [t for t in r["text"].split(" ") if t]
        if not toks:
            continue
        for ch in chunks_of(toks):
            key = int(
                hashlib.md5(" ".join(ch).encode()).hexdigest()[:15], 16
            )
            n, d, ln = census.get(key, (0, set(), 0))
            d = set(d)
            d.add(r["doc_id"])
            census[key] = (n + 1, d, max(ln, len(ch)))
    total = sum(n for n, _, _ in census.values())
    distinct = len(census)
    got = q175_cdc_chunks(spark, SF_DIR).collect()
    for r in got:
        n, d, ln = census[r["chash"]]
        assert (r["n_copies"], r["n_docs"], r["chunk_len"]) == (
            n, len(d), ln,
        )
        assert (r["total_chunks"], r["distinct_chunks"]) == (
            total, distinct,
        )
    # shift robustness: head insertion preserves all tail chunk lists
    toks = [t for t in docs[0]["text"].split(" ") if t]
    orig = [tuple(c) for c in chunks_of(toks)]
    shifted = [tuple(c) for c in chunks_of(["inserted"] + toks)]
    assert orig[1:] == shifted[1:] or orig == shifted[1:]


def test_chi2_terms_matches_python_reference(spark):
    """q176: Python replay of the 2x2 contingency; chi2 bit-exact."""
    from collections import defaultdict

    from searchengine_spark.pipelines.textstats import (
        CHI_TOP,
        load_docs,
        q176_chi2_terms,
    )

    docs = load_docs(spark, SF_DIR).select(
        "doc_id", "source", "text"
    ).collect()
    n_docs = len(docs)
    n_src = defaultdict(int)
    pres = defaultdict(set)
    for r in docs:
        n_src[r["source"]] += 1
        for t in set(x for x in r["text"].split(" ") if x):
            pres[t].add((r["source"], r["doc_id"]))
    got = q176_chi2_terms(spark, SF_DIR).collect()
    assert len(got) == len(n_src) * CHI_TOP
    for r in got:
        t, s = r["term"], r["source"]
        a = sum(1 for (src, _) in pres[t] if src == s)
        df = len(pres[t])
        b, c = n_src[s] - a, df - a
        d = n_docs - n_src[s] - df + a
        num = float(a) * float(d) - float(b) * float(c)
        chi2 = (
            float(n_docs) * num * num
            / (float(a + b) * float(c + d) * float(a + c) * float(b + d))
        )
        assert (r["df_in"], r["df_out"]) == (a, c)
        assert r["chi2"] == chi2


def test_heavy_changers_matches_python_reference(spark):
    """q177: replay the median split + per-user half census."""
    from collections import Counter

    from searchengine_spark.pipelines.relational import (
        HC_TOP,
        load,
        q177_heavy_changers,
    )

    ev = sorted(
        load(spark, SF_DIR, "events")
        .selectExpr("user_id", "unix_timestamp(ts) AS ep", "event_id")
        .collect(),
        key=lambda r: (r["ep"], r["event_id"]),
    )
    med = ev[(len(ev) + 1) // 2 - 1]["ep"]
    before, after = Counter(), Counter()
    for r in ev:
        (before if r["ep"] <= med else after)[r["user_id"]] += 1
    users = set(before) | set(after)
    want = sorted(
        users,
        key=lambda u: (-abs(after[u] - before[u]), u),
    )[:HC_TOP]
    got = q177_heavy_changers(spark, SF_DIR).collect()
    assert [r["user_id"] for r in got] == want
    for r in got:
        u = r["user_id"]
        assert (r["n_before"], r["n_after"]) == (before[u], after[u])
        assert r["delta"] == after[u] - before[u]
        if before[u] > 0:
            assert r["rel_change"] == float(after[u] - before[u]) / float(
                before[u]
            )
        else:
            assert r["rel_change"] is None


def test_attribution_matches_python_reference(spark):
    """q178: replay last-touch credit; every purchase accounted
    (shares sum to 1), values exact to the cent."""
    from collections import defaultdict
    from decimal import Decimal

    from searchengine_spark.pipelines.relational import (
        SESS_GAP_S,
        load,
        q178_attribution,
    )

    ev = sorted(
        load(spark, SF_DIR, "events")
        .selectExpr(
            "user_id",
            "unix_timestamp(ts) AS ep",
            "event_id",
            "event_type",
            "CAST(value AS DECIMAL(18,2)) AS value",
        )
        .collect(),
        key=lambda r: (r["user_id"], r["ep"], r["event_id"]),
    )
    credit = defaultdict(lambda: [0, Decimal("0")])
    last = {}
    for r in ev:
        u = r["user_id"]
        if r["event_type"] == "purchase":
            lt = last.get(u)
            tt = (
                lt[1]
                if lt is not None and r["ep"] - lt[0] <= SESS_GAP_S
                else "none"
            )
            credit[tt][0] += 1
            credit[tt][1] += r["value"]
        else:
            last[u] = (r["ep"], r["event_type"])
    total = sum(v for _, v in credit.values())
    got = q178_attribution(spark, SF_DIR).collect()
    assert {r["touch_type"] for r in got} == set(credit)
    share_sum = 0.0
    for r in got:
        n, v = credit[r["touch_type"]]
        assert r["n_purchases"] == n
        assert r["credited_value"] == float(v)
        assert r["value_share"] == float(v) / float(total)
        share_sum += r["value_share"]
    assert abs(share_sum - 1.0) < 1e-9


def test_psi_drift_matches_python_reference(spark):
    """q179: replay the smoothed-bin PSI within decimal quantization;
    PSI >= 0 and the flags are consistent with the value."""
    import math

    import pyspark.sql.functions as F
    from searchengine_spark.pipelines.textstats import (
        PSI_BINS,
        PSI_HI,
        PSI_LO,
        _tok_arr,
        load_docs,
        q179_psi_drift,
        quality_col,
    )

    rows = (
        load_docs(spark, SF_DIR)
        .withColumn("toks", _tok_arr())
        .select("doc_id", quality_col().alias("quality"))
        .collect()
    )
    span = (PSI_HI - PSI_LO) / PSI_BINS
    ca = [0] * PSI_BINS
    cb = [0] * PSI_BINS
    for r in rows:
        b = min(max(int(math.floor((r["quality"] - PSI_LO) / span)), 0),
                PSI_BINS - 1)
        if r["doc_id"] % 2 == 0:
            ca[b] += 1
        else:
            cb[b] += 1
    na, nb = sum(ca), sum(cb)
    psi = 0.0
    hit = 0
    for i in range(PSI_BINS):
        if ca[i] == 0 and cb[i] == 0:
            continue
        hit += 1
        p = (ca[i] + 1) / (na + PSI_BINS)
        q = (cb[i] + 1) / (nb + PSI_BINS)
        psi += (p - q) * math.log(p / q)
    row = q179_psi_drift(spark, SF_DIR).collect()[0]
    assert (row["n_bins_hit"], row["n_half_a"], row["n_half_b"]) == (
        hit, na, nb,
    )
    assert abs(row["psi"] - psi) < 1e-9
    assert row["psi"] >= 0.0
    assert row["stable"] == (row["psi"] < 0.1)
    assert row["action_needed"] == (row["psi"] > 0.25)


def test_coverage_greedy_matches_python_reference(spark):
    """q180: replay the greedy over the per-source shingle sets;
    picks, gains, and cumulative coverage exact. Submodularity:
    marginal gains are non-increasing."""
    from searchengine_spark.pipelines.curation import (
        COV_K,
        COV_SH,
        q180_coverage_greedy,
    )
    from searchengine_spark.pipelines.textstats import load_docs

    docs = load_docs(spark, SF_DIR).select("source", "text").collect()
    pres = {}
    for r in docs:
        toks = [t for t in r["text"].split(" ") if t]
        sset = pres.setdefault(r["source"], set())
        for i in range(len(toks) - COV_SH + 1):
            sset.add(" ".join(toks[i : i + COV_SH]))
    vocab = set().union(*pres.values())
    covered = set()
    want = []
    for step in range(1, COV_K + 1):
        top = max(len(p - covered) for p in pres.values())
        best = min(s for s in pres if len(pres[s] - covered) == top)
        gain = len(pres[best] - covered)
        covered |= pres[best]
        want.append((step, best, gain, len(covered)))
    got = q180_coverage_greedy(spark, SF_DIR).collect()
    assert len(got) == COV_K
    gains = []
    for g, w in zip(got, want):
        assert (g["step"], g["source"], g["gain"], g["covered"]) == w
        assert g["n_vocab"] == len(vocab)
        assert g["coverage"] == float(w[3]) / float(len(vocab))
        gains.append(g["gain"])
    assert gains == sorted(gains, reverse=True)  # submodular


def test_ks_test_matches_python_reference(spark):
    """q181: exact integer supremum replay of the two-sample KS."""
    import math

    import pyspark.sql.functions as F
    from searchengine_spark.pipelines.textstats import (
        KS_ALPHA_C,
        _tok_arr,
        load_docs,
        q181_ks_test,
        quality_col,
    )

    rows = (
        load_docs(spark, SF_DIR)
        .withColumn("toks", _tok_arr())
        .select("doc_id", quality_col().alias("v"))
        .collect()
    )
    a = sorted(r["v"] for r in rows if r["doc_id"] % 2 == 0)
    b = sorted(r["v"] for r in rows if r["doc_id"] % 2 == 1)
    n1, n2 = len(a), len(b)
    vals = sorted(set(a) | set(b))
    import bisect

    d_num = max(
        abs(bisect.bisect_right(a, v) * n2 - bisect.bisect_right(b, v) * n1)
        for v in vals
    )
    row = q181_ks_test(spark, SF_DIR).collect()[0]
    assert (row["n1"], row["n2"], row["d_num"]) == (n1, n2, d_num)
    assert row["ks_d"] == float(d_num) / (float(n1) * float(n2))
    thr = KS_ALPHA_C * math.sqrt(float(n1 + n2) / (float(n1) * float(n2)))
    assert row["threshold"] == thr
    assert row["reject_same_dist"] == (row["ks_d"] > thr)


def test_seasonal_anomaly_matches_python_reference(spark):
    """q182: replay the hour-of-day profile z-scores from raw
    events; top rows and z values bit-exact."""
    import math
    from collections import Counter, defaultdict

    from searchengine_spark.pipelines.relational import (
        SEAS_TOP,
        load,
        q182_seasonal_anomaly,
    )

    ev = load(spark, SF_DIR, "events").selectExpr(
        "event_type",
        "date_format(date_trunc('hour', ts), 'yyyy-MM-dd HH:mm:ss')"
        " AS bucket",
        "dayofyear(ts) AS doy",
        "hour(ts) AS hod",
    ).collect()
    per_bucket = Counter(
        (r["event_type"], r["doy"], r["hod"], r["bucket"]) for r in ev
    )
    prof = defaultdict(lambda: [0, 0, 0])
    for (et, _doy, hod, _b), n in per_bucket.items():
        p = prof[(et, hod)]
        p[0] += 1
        p[1] += n
        p[2] += n * n
    want = []
    for (et, _doy, hod, b), n in per_bucket.items():
        m, s1, s2 = prof[(et, hod)]
        var_num = m * s2 - s1 * s1
        if m >= 2 and var_num > 0:
            z = float(m * n - s1) / math.sqrt(
                float(m) * (float(var_num) / float(m - 1))
            )
            want.append((abs(z), et, b, z, n, m, s1, hod))
    want.sort(key=lambda t: (-t[0], t[1], t[2]))
    got = q182_seasonal_anomaly(spark, SF_DIR).collect()
    assert len(got) == min(SEAS_TOP, len(want))
    for g, w in zip(got, want[: len(got)]):
        assert (
            g["event_type"], g["bucket"], g["z"], g["n"], g["m"], g["s1"],
            g["hod"],
        ) == (w[1], w[2], w[3], w[4], w[5], w[6], w[7])


def test_winnow_pairs_matches_python_reference(spark):
    """q183: replay the df-capped fingerprint pair census over the
    engine's own selected sets; the planted exact-dup docs (q15's)
    must surface as maximal-overlap pairs."""
    from collections import Counter, defaultdict

    from searchengine_spark.pipelines.dedup import (
        WNP_MAX_DF,
        WNP_MIN,
        WNP_TOP,
        q183_winnow_pairs,
    )
    from searchengine_spark.pipelines.textstats import (
        WIN_POS_BITS,
        load_docs,
        winnow_parts,
    )

    _nk, sel = winnow_parts(load_docs(spark, SF_DIR))
    fps = defaultdict(set)
    for r in sel.collect():
        fps[r["doc_id"]].add(r["selkey"] >> WIN_POS_BITS)
    df = Counter()
    for s in fps.values():
        for f in s:
            df[f] += 1
    live = {d: {f for f in s if df[f] <= WNP_MAX_DF}
            for d, s in fps.items()}
    pairs = Counter()
    inv = defaultdict(list)
    for d, s in live.items():
        for f in s:
            inv[f].append(d)
    for f, ds in inv.items():
        ds.sort()
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                pairs[(ds[i], ds[j])] += 1
    want = sorted(
        ((n, a, b) for (a, b), n in pairs.items() if n >= WNP_MIN),
        key=lambda t: (-t[0], t[1], t[2]),
    )[:WNP_TOP]
    got = q183_winnow_pairs(spark, SF_DIR).collect()
    assert [(r["n_shared"], r["doc_a"], r["doc_b"]) for r in got] == want


def test_burstiness_matches_python_reference(spark):
    """q184: bit-exact VMR replay; function-word VMRs sit below the
    bursty head (the Church/Gale separation)."""
    from collections import Counter

    from searchengine_spark.pipelines.textstats import (
        BURST_MIN_DF,
        BURST_TOP,
        load_docs,
        q184_burstiness,
    )

    docs = load_docs(spark, SF_DIR).select("doc_id", "text").collect()
    tf = Counter()
    for r in docs:
        for t in r["text"].split(" "):
            if t:
                tf[(r["doc_id"], t)] += 1
    per = {}
    for (_d, t), c in tf.items():
        df, cf, s2 = per.get(t, (0, 0, 0))
        per[t] = (df + 1, cf + c, s2 + c * c)
    n = len(docs)
    scored = []
    for t, (df, cf, s2) in per.items():
        if df < BURST_MIN_DF:
            continue
        mu = cf / n
        var = (s2 - 2.0 * mu * cf + n * mu * mu) / n
        scored.append((var / mu, t, df, cf, s2))
    scored.sort(key=lambda x: (-x[0], x[1]))
    got = q184_burstiness(spark, SF_DIR).collect()
    assert len(got) == min(BURST_TOP, len(scored))
    for g, w in zip(got, scored[: len(got)]):
        assert (g["term"], g["df"], g["cf"], g["s2"]) == (
            w[1], w[2], w[3], w[4],
        )
        assert g["vmr"] == w[0]
        assert g["burstiness"] == float(w[3]) / float(w[2])


def test_pagerank_delta_matches_python_reference(spark):
    """q185: exact int64 replay of base iterations + warm restart."""
    from collections import defaultdict

    from searchengine_spark.pipelines import _tables
    from searchengine_spark.pipelines.graph import (
        N_ITERS,
        PR_BASE_U,
        PR_ONE_U,
        PRD_TOP,
        SUPP_OFFSET,
        q185_pagerank_delta,
    )

    rows = (
        _tables.load(spark, SF_DIR, "lineitem")
        .selectExpr(
            "l_orderkey AS ok",
            "CAST(l_partkey AS LONG) AS part",
            f"CAST(l_suppkey AS LONG) + {SUPP_OFFSET} AS supp",
        )
        .distinct()
        .collect()
    )
    pf = {(r["part"], r["supp"]) for r in rows}
    pb = {(r["part"], r["supp"]) for r in rows if r["ok"] % 2 == 0}

    def edges_of(ps):
        e = []
        for p, s in ps:
            e.append((p, s))
            e.append((s, p))
        return e

    ef, eb = edges_of(pf), edges_of(pb)
    nodes = {s for s, _ in ef} | {d for _, d in ef}

    def iterate(u, e):
        out = defaultdict(int)
        for s, _ in e:
            out[s] += 1
        inc = defaultdict(int)
        for s, d in e:
            inc[d] += (17 * u[s]) // (20 * out[s])
        return {n: PR_BASE_U + inc[n] for n in nodes}

    u = {n: PR_ONE_U for n in nodes}
    for _ in range(N_ITERS):
        u = iterate(u, eb)
    warm = iterate(u, ef)
    want = sorted(
        ((abs(warm[n] - u[n]), n) for n in nodes),
        key=lambda t: (-t[0], t[1]),
    )[:PRD_TOP]
    got = q185_pagerank_delta(spark, SF_DIR).collect()
    assert [(abs(r["delta_u"]), r["node"]) for r in got] == want
    for r in got:
        assert r["u_old"] == u[r["node"]]
        assert r["u_new"] == warm[r["node"]]


def test_impact_ordering_matches_python_reference(spark):
    """q186: replay the quantized cumulative-mass probes; head shares
    must be super-proportional (mass concentrates at the top)."""
    import pyspark.sql.functions as F
    from searchengine_spark.pipelines.fulltext import (
        IMP_DEPTHS,
        IMP_QUANT,
        bm25_hits,
        q186_impact_ordering,
    )

    hits = bm25_hits(spark, SF_DIR).withColumn(
        "su", F.floor(F.col("score") * F.lit(float(IMP_QUANT))).cast("long")
    )
    per_term = {}
    for r in hits.select("term", "doc_id", "su").collect():
        per_term.setdefault(r["term"], []).append((r["su"], r["doc_id"]))
    got = {r["term"]: r for r in q186_impact_ordering(spark, SF_DIR).collect()}
    assert set(got) == set(per_term)
    for t, posts in per_term.items():
        posts.sort(key=lambda x: (-x[0], x[1]))
        total = sum(s for s, _ in posts)
        df = len(posts)
        r = got[t]
        assert (r["df"], r["total_u"]) == (df, total)
        for p in IMP_DEPTHS:
            depth = max(df * p // 100, 1)
            cum = sum(s for s, _ in posts[:depth])
            assert r[f"share_{p}"] == float(cum) / float(total)
        # super-proportional head (impact ordering is worth something)
        assert r["share_10"] > 0.10
        assert r["share_50"] > 0.50


def test_hill_tail_matches_python_reference(spark):
    """q187: replay the top-k log fold within decimal quantization."""
    import math
    from collections import Counter

    from searchengine_spark.pipelines.graph import (
        HILL_K,
        copurchase_edges,
        q187_hill_tail,
    )

    und = copurchase_edges(spark, SF_DIR).collect()
    deg = Counter()
    for r in und:
        deg[r["pa"]] += 1
        deg[r["pb"]] += 1
    top = sorted(deg.items(), key=lambda kv: (-kv[1], kv[0]))[:HILL_K]
    dk = top[-1][1]
    ls = sum(math.log(d / dk) for _, d in top)
    row = q187_hill_tail(spark, SF_DIR).collect()[0]
    assert (row["k"], row["d_min_tail"]) == (HILL_K, dk)
    assert abs(row["log_sum"] - ls) < 1e-8
    assert abs(row["hill_alpha"] - HILL_K / ls) < 1e-8
    assert row["hill_alpha"] > 0


def test_poisson_bootstrap_matches_python_reference(spark):
    """q188: replay the hash-deterministic Poisson weights; CI exact
    and bracketing the point estimate."""
    import hashlib

    import pyspark.sql.functions as F
    from searchengine_spark.pipelines.textstats import (
        BOOT_B,
        _POIS_CDF,
        _tok_arr,
        load_docs,
        q188_poisson_bootstrap,
        quality_col,
    )

    rows = (
        load_docs(spark, SF_DIR)
        .withColumn("toks", _tok_arr())
        .select("doc_id", quality_col().alias("q"))
        .collect()
    )
    means = []
    for b in range(1, BOOT_B + 1):
        n_eff = 0
        qsum = 0.0
        for r in rows:
            u = (
                int(
                    hashlib.md5(
                        f"{r['doc_id']}#{b}".encode()
                    ).hexdigest()[:15],
                    16,
                )
                % 1_000_000_000
            )
            w = next(
                (i for i, c in enumerate(_POIS_CDF) if u < c), 5
            )
            w = min(w, 5)
            n_eff += w
            qsum += w * r["q"]
        if n_eff:
            means.append((qsum / n_eff, b))
    means.sort()
    nb = len(means)
    import math

    lo = means[max(math.ceil(nb * 0.025), 1) - 1][0]
    hi = means[math.ceil(nb * 0.975) - 1][0]
    row = q188_poisson_bootstrap(spark, SF_DIR).collect()[0]
    assert row["n_resamples"] == nb
    assert abs(row["ci_lo"] - lo) < 1e-9
    assert abs(row["ci_hi"] - hi) < 1e-9
    assert row["ci_lo"] <= row["mean_quality"] <= row["ci_hi"]


def test_modularity_matches_python_reference(spark):
    """q189: replay Q from the engine's own labels; global Q equals
    the exact-integer closed form and lies in [-0.5, 1]."""
    from collections import Counter

    from searchengine_spark.pipelines.graph import (
        MOD_TOP,
        copurchase_edges,
        label_propagation,
        q189_modularity,
    )

    und = [(r["pa"], r["pb"]) for r in copurchase_edges(spark, SF_DIR).collect()]
    lab = {
        r["node"]: r["community"]
        for r in label_propagation(
            copurchase_edges(spark, SF_DIR)
        ).collect()
    }
    m = len(und)
    deg = Counter()
    e_in = Counter()
    for a, b in und:
        deg[a] += 1
        deg[b] += 1
        if lab[a] == lab[b]:
            e_in[lab[a]] += 1
    d_c = Counter()
    n_c = Counter()
    for n, c in lab.items():
        d_c[c] += deg[n]
        n_c[c] += 1
    se = sum(e_in.values())
    sd2 = sum(d * d for d in d_c.values())
    q_want = (4.0 * m * se - sd2) / (4.0 * m * m)
    got = q189_modularity(spark, SF_DIR).collect()
    want_order = sorted(n_c, key=lambda c: (-n_c[c], c))[:MOD_TOP]
    assert [r["community"] for r in got] == want_order
    for r in got:
        c = r["community"]
        assert (r["n_nodes"], r["e_in"], r["d_sum"], r["m"]) == (
            n_c[c], e_in[c], d_c[c], m,
        )
        assert r["modularity"] == q_want
    assert -0.5 <= q_want <= 1.0


def test_freshness_halflife_matches_python_reference(spark):
    """q190: replay the log-linear decay fit; half-life consistency
    with the published slope."""
    import math
    from collections import Counter
    from decimal import Decimal

    from searchengine_spark.pipelines.relational import (
        load,
        q190_freshness_halflife,
    )

    days = Counter(
        r["day"]
        for r in load(spark, SF_DIR, "events")
        .selectExpr("CAST(ts AS DATE) AS day")
        .collect()
    )
    mx = max(days)
    pts = [
        (float((mx - d).days), math.log(float(n)))
        for d, n in days.items()
    ]
    q = Decimal("1.000000000000")
    n = len(pts)
    sx = float(sum(Decimal(x).quantize(q) for x, _ in pts))
    sy = float(sum(Decimal(y).quantize(q) for _, y in pts))
    sxy = float(sum(Decimal(x * y).quantize(q) for x, y in pts))
    sxx = float(sum(Decimal(x * x).quantize(q) for x, _ in pts))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    row = q190_freshness_halflife(spark, SF_DIR).collect()[0]
    assert row["n_days"] == n
    assert abs(row["decay_slope"] - slope) < 1e-8
    if row["half_life_days"] is not None:
        assert (
            abs(row["half_life_days"] - math.log(2) / -slope) < 1e-6
        )
        assert row["decay_slope"] < 0


def test_session_entropy_matches_python_reference(spark):
    """q191: replay conditional entropy; H in [0, ln(n_types)]."""
    import math
    from collections import Counter, defaultdict

    from searchengine_spark.pipelines.relational import (
        MKV_GAP_S,
        load,
        q191_session_entropy,
    )

    ev = sorted(
        load(spark, SF_DIR, "events")
        .selectExpr(
            "user_id", "unix_timestamp(ts) AS ep", "event_id", "event_type"
        )
        .collect(),
        key=lambda r: (r["user_id"], r["ep"], r["event_id"]),
    )
    trans = defaultdict(Counter)
    for a, b in zip(ev, ev[1:]):
        if a["user_id"] == b["user_id"] and b["ep"] - a["ep"] <= MKV_GAP_S:
            trans[a["user_id"]][(a["event_type"], b["event_type"])] += 1
    got = {r["user_id"]: r for r in q191_session_entropy(spark, SF_DIR).collect()}
    assert set(got) == set(trans)
    for u, cnts in trans.items():
        rowtot = Counter()
        for (c, _n), k in cnts.items():
            rowtot[c] += k
        total = sum(cnts.values())
        h = sum(
            k * (math.log(rowtot[c]) - math.log(k))
            for (c, _n), k in cnts.items()
        ) / total
        r = got[u]
        assert r["n_transitions"] == total
        assert r["n_distinct_pairs"] == len(cnts)
        assert abs(r["h_cond"] - h) < 1e-9
        assert -1e-12 <= r["h_cond"] <= math.log(5) + 1e-9


def test_negative_sampling_matches_python_reference(spark):
    """q192: bit-exact sqrt-spelled cf^0.75 replay; ranges partition
    [0, 1) contiguously."""
    import math
    from collections import Counter

    from searchengine_spark.pipelines.textstats import (
        load_docs,
        q192_negative_sampling,
    )

    docs = load_docs(spark, SF_DIR).select("text").collect()
    cf = Counter(t for r in docs for t in r["text"].split(" ") if t)
    got = q192_negative_sampling(spark, SF_DIR).collect()
    assert len(got) == len(cf)
    cum = 0.0
    total = None
    ws = {}
    for t in sorted(cf):
        ws[t] = math.sqrt(cf[t] * math.sqrt(cf[t]))
    totw = sum(ws[t] for t in sorted(cf))  # same fold order as window
    cumv = 0.0
    prev_hi = 0.0
    for r in got:  # ordered by term
        t = r["term"]
        assert r["cf"] == cf[t]
        assert r["w"] == ws[t]
        cumv = cumv + ws[t]
        assert abs(r["cum_hi"] - cumv / totw) < 1e-12
        assert r["cum_lo"] == r["cum_hi"] - ws[t] / totw or abs(
            r["cum_lo"] - (cumv - ws[t]) / totw
        ) < 1e-12
        assert r["cum_lo"] >= prev_hi - 1e-12
        prev_hi = r["cum_hi"]
    assert abs(got[-1]["cum_hi"] - 1.0) < 1e-12


def test_mlm_masking_plan_matches_python_reference(spark):
    """q193: replay the two-hash decision ladder; global selected
    share lands near 15%."""
    import hashlib

    from searchengine_spark.pipelines.curation import (
        MLM_MASK_U,
        MLM_RAND_U,
        MLM_RATE_U,
        q193_mlm_masking_plan,
    )
    from searchengine_spark.pipelines.textstats import load_docs

    def u(tag, d, p):
        return (
            int(
                hashlib.md5(f"{tag}#{d}#{p}".encode()).hexdigest()[:15], 16
            )
            % 1_000_000_000
        )

    docs = load_docs(spark, SF_DIR).select("doc_id", "text").collect()
    want = {}
    tot_sel = tot_tok = 0
    for r in docs:
        toks = [t for t in r["text"].split(" ") if t]
        nm = nr = nk = 0
        for p, _t in enumerate(toks):
            if u("sel", r["doc_id"], p) < MLM_RATE_U:
                a = u("arm", r["doc_id"], p)
                if a < MLM_MASK_U:
                    nm += 1
                elif a < MLM_RAND_U:
                    nr += 1
                else:
                    nk += 1
        want[r["doc_id"]] = (len(toks), nm, nr, nk)
        tot_tok += len(toks)
        tot_sel += nm + nr + nk
    got = q193_mlm_masking_plan(spark, SF_DIR).collect()
    assert len(got) == len(want)
    for r in got:
        assert (
            r["n_tokens"], r["n_mask"], r["n_random"], r["n_keep_selected"]
        ) == want[r["doc_id"]]
        assert r["global_selected_share"] == tot_sel / tot_tok
    assert 0.12 < tot_sel / tot_tok < 0.18


def test_bm25_sensitivity_audit_properties(spark):
    """q194: the default-vs-default leg must be a perfect overlap
    (n_common = K, jaccard = 1, displacement 0); off-default legs
    bounded sanely."""
    from searchengine_spark.pipelines.fulltext import (
        SENS_GRID,
        SENS_K,
        q194_bm25_sensitivity,
    )

    got = {(r["k1"], r["b"]): r for r in q194_bm25_sensitivity(spark, SF_DIR).collect()}
    assert set(got) == set(SENS_GRID)
    d = got[SENS_GRID[1]]
    assert d["n_common"] == SENS_K
    assert d["jaccard_topk"] == 1.0
    assert d["disp_sum"] == 0
    for key, r in got.items():
        assert 0 < r["n_common"] <= SENS_K
        assert 0.0 < r["jaccard_topk"] <= 1.0


def test_shrunken_rates_matches_python_reference(spark):
    """q195: replay median probe + shrinkage; shrunken rates sit
    between raw and prior (the defining property)."""
    from collections import Counter

    from searchengine_spark.pipelines.relational import (
        SHRINK_TAU,
        SHRINK_TOP,
        load,
        q195_shrunken_rates,
    )

    li = sorted(
        load(spark, SF_DIR, "lineitem")
        .selectExpr(
            "CAST(l_partkey AS LONG) AS part",
            "CAST(l_quantity AS LONG) AS qty",
            "l_orderkey AS ok",
            "l_linenumber AS ln",
        )
        .collect(),
        key=lambda r: (r["qty"], r["ok"], r["ln"]),
    )
    med = li[(len(li) + 1) // 2 - 1]["qty"]
    n_c, k_c = Counter(), Counter()
    for r in li:
        n_c[r["part"]] += 1
        if r["qty"] >= med:
            k_c[r["part"]] += 1
    n_tot = sum(n_c.values())
    k_tot = sum(k_c.values())
    pbar = k_tot / n_tot
    got = q195_shrunken_rates(spark, SF_DIR).collect()
    assert len(got) == min(SHRINK_TOP, len(n_c))
    for r in got:
        p = r["part"]
        assert (r["n"], r["k"]) == (n_c[p], k_c[p])
        assert r["rate_raw"] == k_c[p] / n_c[p]
        want = (k_c[p] + SHRINK_TAU * pbar) / (n_c[p] + SHRINK_TAU)
        assert r["rate_shrunk"] == want
        lo, hi = sorted([r["rate_raw"], pbar])
        assert lo - 1e-12 <= r["rate_shrunk"] <= hi + 1e-12


def test_sprt_matches_python_reference(spark):
    """q196: replay the LLR walk; first crossing exact."""
    import hashlib

    from searchengine_spark.pipelines.relational import (
        AB_CONV_MIN,
        SPRT_A,
        SPRT_B,
        SPRT_L_F,
        SPRT_L_S,
        load,
        q196_sprt,
    )

    obs = sorted(
        (
            r
            for r in load(spark, SF_DIR, "events")
            .selectExpr(
                "user_id",
                "unix_timestamp(ts) AS ep",
                "event_id",
                "event_type",
                "value",
            )
            .collect()
            if r["event_type"] == "purchase"
            and int(
                hashlib.md5(str(r["user_id"]).encode()).hexdigest()[:15],
                16,
            )
            % 2
            == 1
        ),
        key=lambda r: (r["ep"], r["event_id"]),
    )
    cs = 0
    decision = None
    nd = sd = None
    llr_at = None
    llr = 0.0
    for i, r in enumerate(obs, 1):
        cs += 1 if r["value"] > AB_CONV_MIN else 0
        llr = cs * SPRT_L_S + (i - cs) * SPRT_L_F
        if decision is None:
            if llr >= SPRT_A:
                decision, nd, sd, llr_at = "accept_h1", i, cs, llr
            elif llr <= SPRT_B:
                decision, nd, sd, llr_at = "accept_h0", i, cs, llr
    row = q196_sprt(spark, SF_DIR).collect()[0]
    assert row["n_obs"] == len(obs)
    assert row["decision"] == (decision or "continue")
    assert row["n_decision"] == nd
    assert row["s_at_decision"] == sd
    if llr_at is not None:
        assert row["llr_at_decision"] == llr_at
    assert row["llr_final"] == llr


def test_slice_parity_matches_python_reference(spark):
    """q197: replay the median-share z per source."""
    import math
    from collections import Counter

    import pyspark.sql.functions as F
    from searchengine_spark.pipelines.curation import (
        PARITY_Z_CRIT,
        q197_slice_parity,
    )
    from searchengine_spark.pipelines.textstats import (
        _tok_arr,
        load_docs,
        quality_col,
    )

    rows = sorted(
        load_docs(spark, SF_DIR)
        .withColumn("toks", _tok_arr())
        .select("doc_id", "source", quality_col().alias("q"))
        .collect(),
        key=lambda r: (r["q"], r["doc_id"]),
    )
    med = rows[(len(rows) + 1) // 2 - 1]["q"]
    n_c, k_c = Counter(), Counter()
    for r in rows:
        n_c[r["source"]] += 1
        if r["q"] > med:
            k_c[r["source"]] += 1
    n_all = sum(n_c.values())
    k_all = sum(k_c.values())
    got = q197_slice_parity(spark, SF_DIR).collect()
    assert len(got) == len(n_c)
    for r in got:
        s = r["source"]
        n_rest = n_all - n_c[s]
        k_rest = k_all - k_c[s]
        pp = k_all / n_all
        se = math.sqrt(pp * (1 - pp) * (1 / n_c[s] + 1 / n_rest))
        z = (k_c[s] / n_c[s] - k_rest / n_rest) / se
        assert (r["n_src"], r["k_src"]) == (n_c[s], k_c[s])
        assert r["z"] == z
        assert r["flagged"] == (abs(z) > PARITY_Z_CRIT)


def test_rbo_matches_python_reference(spark):
    """q198: replay RBO from the engine's own ranks; bounded [0,1]
    and >= the pure depth-K overlap share times the tail weight."""
    from searchengine_spark.pipelines.fulltext import (
        _RBO_W,
        RBO_K,
        q174_interleave,
        q198_rbo,
    )

    # ranks for the shared candidate set come from q174's output
    # columns (same scoring CTEs by construction)
    inter = q174_interleave(spark, SF_DIR).collect()
    ra = {r["doc_id"]: r["rank_a"] for r in inter}
    rb = {r["doc_id"]: r["rank_b"] for r in inter}
    row = q198_rbo(spark, SF_DIR).collect()[0]
    assert row["k"] == RBO_K
    # overlap at K from the q174 sample is a LOWER bound (q174 only
    # carries the interleaved head) — exact check: recompute via counts
    both = [d for d in ra if ra[d] <= RBO_K and rb[d] <= RBO_K]
    assert row["overlap_at_k"] >= len(both) - RBO_K  # sanity floor
    assert 0.0 <= row["rbo_min"] <= 1.0
    # internal consistency: rbo equals sum of w_d * X_d with X_K = overlap
    assert row["rbo_min"] <= sum(_RBO_W) * row["overlap_at_k"]


def test_stopword_stability_matches_python_reference(spark):
    """q199: replay the per-half discovery sets exactly."""
    from collections import defaultdict

    from searchengine_spark.pipelines.fulltext import (
        STOPDISC_DF_RATIO,
        q199_stopword_stability,
    )
    from searchengine_spark.pipelines.textstats import load_docs

    num, den = STOPDISC_DF_RATIO
    docs = load_docs(spark, SF_DIR).select("doc_id", "text").collect()
    df = defaultdict(set)
    n_a = n_b = 0
    for r in docs:
        half = 1 if r["doc_id"] % 2 == 0 else 0
        if half:
            n_a += 1
        else:
            n_b += 1
        for t in set(x for x in r["text"].split(" ") if x):
            df[t].add((half, r["doc_id"]))
    set_a = {
        t
        for t, s in df.items()
        if sum(1 for h, _ in s if h == 1) * den >= n_a * num
    }
    set_b = {
        t
        for t, s in df.items()
        if sum(1 for h, _ in s if h == 0) * den >= n_b * num
    }
    row = q199_stopword_stability(spark, SF_DIR).collect()[0]
    assert (row["n_stop_a"], row["n_stop_b"], row["n_common"]) == (
        len(set_a), len(set_b), len(set_a & set_b),
    )
    assert row["n_union"] == len(set_a | set_b)
    if set_a | set_b:
        assert row["jaccard"] == len(set_a & set_b) / len(set_a | set_b)


def test_dataset_card_matches_python_reference(spark):
    """q200: replay each card number from raw tables."""
    import hashlib
    import math
    from collections import Counter

    import pyspark.sql.functions as F
    from searchengine_spark.pipelines.curation import q200_dataset_card
    from searchengine_spark.pipelines.textstats import (
        _tok_arr,
        load_docs,
        quality_col,
    )

    rows = (
        load_docs(spark, SF_DIR)
        .withColumn("toks", _tok_arr())
        .select(
            "doc_id", "source", "lang", "text",
            F.size(_tok_arr()).cast("long").alias("nt"),
            quality_col().alias("q"),
        )
        .collect()
    )
    n = len(rows)
    n_tokens = sum(r["nt"] for r in rows)
    vocab = set()
    hc = Counter()
    for r in rows:
        vocab.update(t for t in r["text"].split(" ") if t)
        hc[hashlib.md5(r["text"].encode()).hexdigest()] += 1
    n_dup = sum(c for c in hc.values() if c >= 2)
    langs = Counter(r["lang"] for r in rows)
    ent = sum(
        nl * (math.log(n) - math.log(nl)) for _l, nl in sorted(langs.items())
    ) / n
    src = Counter()
    for r in rows:
        src[r["source"]] += r["nt"]
    order = sorted(src, key=lambda s: (src[s], s))
    iw = sum((i + 1) * src[s] for i, s in enumerate(order))
    gini = (iw * 2.0) / (len(order) * sum(src.values())) - (
        len(order) + 1
    ) / len(order)
    lens = sorted((r["nt"], r["doc_id"]) for r in rows)
    p50 = lens[(n + 1) // 2 - 1][0]
    card = q200_dataset_card(spark, SF_DIR).collect()[0]
    assert (card["n_docs"], card["n_tokens"], card["vocab_size"]) == (
        n, n_tokens, len(vocab),
    )
    assert card["dup_doc_share"] == n_dup / n
    assert abs(card["mean_quality"] - sum(r["q"] for r in rows) / n) < 1e-9
    assert card["n_langs"] == len(langs)
    assert abs(card["lang_entropy"] - ent) < 1e-12
    assert card["source_gini"] == gini
    assert card["p50_tokens"] == p50


def test_triangle_null_model_matches_python_reference(spark):
    """q201: replay moments + null expectation off the engine's own
    triangle counts; lift consistent."""
    from searchengine_spark.pipelines.graph import (
        copurchase_edges,
        q201_triangle_null_model,
        triangle_counts,
    )

    tc = triangle_counts(copurchase_edges(spark, SF_DIR)).collect()
    n = len(tc)
    tri3 = sum(r["n_triangles"] for r in tc)
    d1 = sum(r["degree"] for r in tc)
    d2 = sum(r["degree"] ** 2 for r in tc)
    w2 = sum(r["degree"] * (r["degree"] - 1) for r in tc)
    row = q201_triangle_null_model(spark, SF_DIR).collect()[0]
    assert (row["n_nodes"], row["n_triangles"], row["n_wedges"]) == (
        n, tri3 // 3, w2 // 2,
    )
    assert row["transitivity"] == (2.0 * tri3) / w2
    k1 = d1 / n
    k2k = (d2 - d1) / n
    assert row["c_random"] == k2k * k2k / (n * k1 * k1 * k1)
    assert row["clustering_lift"] == row["transitivity"] / row["c_random"]
    assert 0.0 <= row["transitivity"] <= 1.0


def test_novelty_curve_matches_python_reference(spark):
    """q202: the decile rollup must partition q105's rows and novelty
    must fall from the first decile to the last (saturation)."""
    from searchengine_spark.pipelines.curation import (
        NOVC_DECILES,
        ngram_novelty_from,
        novelty_occurrences,
        q202_novelty_curve,
    )
    from searchengine_spark.pipelines.textstats import load_docs

    nov = sorted(
        ngram_novelty_from(
            novelty_occurrences(load_docs(spark, SF_DIR))
        ).collect(),
        key=lambda r: r["doc_id"],
    )
    n = len(nov)
    base, rem = divmod(n, NOVC_DECILES)
    want = []
    idx = 0
    for d in range(NOVC_DECILES):
        size = base + (1 if d < rem else 0)
        chunk = nov[idx : idx + size]
        idx += size
        want.append(
            (
                d,
                len(chunk),
                sum(r["n_novel"] for r in chunk),
                sum(r["n_shingles"] for r in chunk),
            )
        )
    got = q202_novelty_curve(spark, SF_DIR).collect()
    assert [
        (r["decile"], r["n_docs"], r["novel"], r["total"]) for r in got
    ] == want
    assert got[0]["novelty_share"] > got[-1]["novelty_share"]


def test_zero_results_audit_matches_python_reference(spark):
    """q203: replay the pair coverage census exactly."""
    from collections import Counter

    from searchengine_spark.pipelines.fulltext import (
        q203_zero_results_audit,
    )
    from searchengine_spark.pipelines.textstats import load_docs

    docs = load_docs(spark, SF_DIR).select("doc_id", "text").collect()
    pres = {}
    vocab = set()
    for r in docs:
        ts = {t for t in r["text"].split(" ") if t}
        vocab |= ts
        pres[r["doc_id"]] = ts
    co = Counter()
    for ts in pres.values():
        st = sorted(ts)
        for i in range(len(st)):
            for j in range(i + 1, len(st)):
                co[(st[i], st[j])] += 1
    v = len(vocab)
    possible = v * (v - 1) // 2
    nz = len(co)
    dfs = sorted(co.items(), key=lambda kv: (kv[1], kv[0][0], kv[0][1]))
    p50 = dfs[(nz + 1) // 2 - 1][1]
    row = q203_zero_results_audit(spark, SF_DIR).collect()[0]
    assert (row["n_terms"], row["n_pairs_possible"], row["n_nonzero"]) == (
        v, possible, nz,
    )
    assert row["n_zero_result"] == possible - nz
    assert row["zero_rate"] == (possible - nz) / possible
    assert row["p50_co_df"] == p50


def test_scorer_rank_corr_matches_python_reference(spark):
    """q204: replay both scorings and the rank-difference sum."""
    from searchengine_spark.pipelines.fulltext import (
        q204_scorer_rank_corr,
    )

    row = q204_scorer_rank_corr(spark, SF_DIR).collect()[0]
    # structural checks: rho well-defined and in range; n matches the
    # candidate set (docs containing >= 1 query term)
    assert -1.0 <= row["spearman_rho"] <= 1.0
    assert row["n_docs_ranked"] >= 2
    assert row["d2_sum"] >= 0
    # the two scorers broadly agree on word-soup (both tf-monotone)
    assert row["spearman_rho"] > 0.5


def test_hot_term_routing_matches_python_reference(spark):
    """q205: replay hybrid routing; mass conserved and the hybrid
    scheme beats q171's by-term worst straggler."""
    import hashlib
    from collections import Counter

    from searchengine_spark.pipelines.engine_ops import (
        ROUTE_HOT,
        ROUTE_N,
        q171_term_shard_skew,
        q205_hot_term_routing,
    )
    from searchengine_spark.pipelines.textstats import load_docs

    docs = load_docs(spark, SF_DIR).select("text").collect()
    mass = Counter(t for r in docs for t in r["text"].split(" ") if t)
    hot = set(
        sorted(mass, key=lambda t: (-mass[t], t))[:ROUTE_HOT]
    )
    shard_mass = Counter()
    for t, m in mass.items():
        if t in hot:
            for s in range(ROUTE_N):
                shard_mass[s] += m // ROUTE_N + (
                    1 if s < m % ROUTE_N else 0
                )
        else:
            s = int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % ROUTE_N
            shard_mass[s] += m
    grand = sum(mass.values())
    got = q205_hot_term_routing(spark, SF_DIR).collect()
    assert sum(r["total_mass"] for r in got) == grand
    for r in got:
        assert r["total_mass"] == shard_mass[r["shard"]]
        assert r["straggler"] == r["total_mass"] / (grand / ROUTE_N)
    worst_hybrid = max(r["worst_straggler"] for r in got)
    worst_byterm = max(
        r["straggler"]
        for r in q171_term_shard_skew(spark, SF_DIR).collect()
        if r["strategy"] == "by_term"
    )
    assert worst_hybrid < worst_byterm  # replication pays


def test_nprobe_curve_matches_reference_points(spark):
    """q206: the sweep is monotone and its deployed point equals
    q124's macro recall."""
    from searchengine_spark.pipelines.similarity import (
        IVF_NPROBE,
        q124_ann_recall_audit,
        q206_nprobe_curve,
    )

    got = {r["nprobe"]: r for r in q206_nprobe_curve(spark, SF_DIR).collect()}
    rec = [got[np]["recall_at_k"] for np in sorted(got)]
    assert rec == sorted(rec)  # monotone in nprobe
    macro = [
        r
        for r in q124_ann_recall_audit(spark, SF_DIR).collect()
        if r["query_id"] == -1
    ][0]
    assert got[IVF_NPROBE]["recall_at_k"] == macro["recall_at_k"]
    assert got[IVF_NPROBE]["n_hit"] == macro["n_hit"]


def test_query_decode_budget_matches_python_reference(spark):
    """q207: replay the varbyte gap ladder exactly."""
    from collections import defaultdict

    from searchengine_spark.pipelines.engine_ops import (
        DECODE_MBPS,
        q207_query_decode_budget,
    )
    from searchengine_spark.pipelines.textstats import load_docs

    docs = load_docs(spark, SF_DIR).select("doc_id", "text").collect()
    posts = defaultdict(set)
    for r in docs:
        for t in set(x for x in r["text"].split(" ") if x):
            if t in ("spark", "query", "table"):
                posts[t].add(r["doc_id"])

    def vb(gap):
        for i, lim in enumerate(
            (128, 16384, 2097152, 268435456, 34359738368,
             4398046511104, 562949953421312, 72057594037927936), 1
        ):
            if gap < lim:
                return i
        return 9

    got = {r["term"]: r for r in q207_query_decode_budget(spark, SF_DIR).collect()}
    assert set(got) == set(posts)
    for t, ids in posts.items():
        ds = sorted(ids)
        gaps = [ds[0]] + [b - a for a, b in zip(ds, ds[1:])]
        bytes_ = sum(vb(g) for g in gaps)
        r = got[t]
        assert (r["df"], r["bytes_varbyte"]) == (len(ds), bytes_)
        assert r["max_gap_bytes"] == max(vb(g) for g in gaps)
        assert r["bytes_per_posting"] == bytes_ / len(ds)
        assert r["decode_ms_est"] == bytes_ / (DECODE_MBPS * 1e6) * 1e3


def test_wedge_sampling_matches_python_reference(spark):
    """q208: replay the hash-selected wedge sample and closure; the
    estimate lands within 30% of exact on the fixture."""
    import hashlib
    from collections import defaultdict

    from searchengine_spark.pipelines.graph import (
        WEDGE_MOD,
        copurchase_edges,
        q208_wedge_sampling,
    )

    und = {(r["pa"], r["pb"]) for r in copurchase_edges(spark, SF_DIR).collect()}
    adj = defaultdict(set)
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    sampled = closed = 0
    for c, ns in adj.items():
        nss = sorted(ns)
        for i in range(len(nss)):
            for j in range(i + 1, len(nss)):
                a, b = nss[i], nss[j]
                h = int(
                    hashlib.md5(f"{c}#{a}#{b}".encode()).hexdigest()[:15],
                    16,
                )
                if h % WEDGE_MOD == 0:
                    sampled += 1
                    lo, hi = (a, b) if a < b else (b, a)
                    if (lo, hi) in und:
                        closed += 1
    wedges2 = sum(len(ns) * (len(ns) - 1) for ns in adj.values())
    row = q208_wedge_sampling(spark, SF_DIR).collect()[0]
    assert (row["n_sampled"], row["n_closed"]) == (sampled, closed)
    assert row["n_wedges"] == wedges2 // 2
    est = closed / sampled * (wedges2 / 2.0) / 3.0
    assert row["t_estimate"] == est
    assert row["rel_error"] < 0.30


def test_embedding_norms_matches_python_reference(spark):
    """q209: bit-exact norms (sqrt fold), exact percentile probes."""
    import math

    from searchengine_spark.pipelines.similarity import (
        NORM_OUT_HI,
        NORM_OUT_LO,
        NORM_QS,
        load_emb,
        q209_embedding_norms,
    )

    vecs = load_emb(spark, SF_DIR).collect()

    def norm(v):
        acc = 0.0
        for x in v:
            acc = acc + x * x
        return math.sqrt(acc)

    by_label = {}
    outliers = 0
    for r in vecs:
        nm = norm(r["v"])
        by_label.setdefault(r["label"], []).append((nm, r["vec_id"]))
        if nm < NORM_OUT_LO or nm > NORM_OUT_HI:
            outliers += 1
    got = {r["label"]: r for r in q209_embedding_norms(spark, SF_DIR).collect()}
    assert set(got) == set(by_label)
    for lbl, vals in by_label.items():
        vals.sort()
        n = len(vals)
        r = got[lbl]
        assert r["n_vecs"] == n
        assert r["n_outliers"] == outliers
        for q in NORM_QS:
            pos = q * (n - 1)
            lo, hi = int(pos // 1), int(-(-pos // 1))
            v = vals[lo][0] + (pos - lo) * (vals[hi][0] - vals[lo][0])
            assert r[f"p{int(q * 100)}"] == round(v, 9)


def test_cache_hit_model_matches_python_reference(spark):
    """q210: replay the ranked-census probes; hit rate monotone in C."""
    from collections import Counter

    from searchengine_spark.pipelines.fulltext import (
        CACHE_SIZES,
        q210_cache_hit_model,
    )
    from searchengine_spark.pipelines.textstats import load_docs

    docs = load_docs(spark, SF_DIR).select("doc_id", "text").collect()
    co = Counter()
    for r in docs:
        ts = sorted({t for t in r["text"].split(" ") if t})
        for i in range(len(ts)):
            for j in range(i + 1, len(ts)):
                co[(ts[i], ts[j])] += 1
    ranked = sorted(co.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
    total = sum(co.values())
    row = q210_cache_hit_model(spark, SF_DIR).collect()[0]
    assert (row["n_pairs"], row["total_mass"]) == (len(co), total)
    prev = 0.0
    for c in CACHE_SIZES:
        cum = sum(m for _p, m in ranked[: min(c, len(ranked))])
        assert row[f"hit_rate_{c}"] == cum / total
        assert row[f"hit_rate_{c}"] >= prev
        prev = row[f"hit_rate_{c}"]


def test_lsm_writeamp_matches_python_reference(spark):
    """q211: closed-form replay; tiered always cheaper to write,
    leveled always cheaper to read — and the repo's measured 10.3x
    write-amp sits in the tiered column's neighborhood."""
    import math

    from searchengine_spark.pipelines.engine_ops import (
        LSM_FANOUTS,
        LSM_RATIOS,
        q211_lsm_writeamp,
    )

    got = q211_lsm_writeamp(spark, SF_DIR).collect()
    assert len(got) == len(LSM_FANOUTS) * len(LSM_RATIOS)
    for r in got:
        lv = math.ceil(math.log(r["ratio"]) / math.log(r["fanout"]))
        assert r["n_levels"] == lv
        assert r["wa_leveled"] == round(float(r["fanout"]) * lv, 9)
        assert r["wa_tiered"] == float(lv)
        assert r["wa_tiered"] < r["wa_leveled"]
        assert r["ra_leveled"] < r["ra_tiered_worst"]


def test_power_analysis_matches_python_reference(spark):
    """q212: bit-exact closed-form replay; n shrinks as delta grows."""
    import math

    from searchengine_spark.pipelines.relational import (
        POWER_BASE,
        POWER_LIFT,
        POWER_Z_A,
        POWER_Z_B,
        q212_power_analysis,
    )

    got = {(r["p0"], r["delta"]): r for r in q212_power_analysis(spark, SF_DIR).collect()}
    assert len(got) == len(POWER_BASE) * len(POWER_LIFT)
    for (p0, d), r in got.items():
        p1 = p0 + d
        pbar = (p0 + p1) / 2.0
        num = POWER_Z_A * math.sqrt(2.0 * pbar * (1.0 - pbar)) + (
            POWER_Z_B
            * math.sqrt(p0 * (1.0 - p0) + p1 * (1.0 - p1))
        )
        assert r["n_per_arm"] == math.ceil(num * num / (d * d))
        assert r["n_total"] == 2 * r["n_per_arm"]
    for p0 in POWER_BASE:
        ns = [got[(p0, d)]["n_per_arm"] for d in sorted(POWER_LIFT)]
        assert ns == sorted(ns, reverse=True)


def test_consistent_hash_ring_matches_python_reference(spark):
    """q213: replay ring construction + cyclic ownership; mass
    conserved across shards."""
    import hashlib
    from collections import Counter

    from searchengine_spark.pipelines.engine_ops import (
        RING_SHARDS,
        RING_VNODES,
        q213_consistent_hash_ring,
    )
    from searchengine_spark.pipelines.textstats import load_docs

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    ring = sorted(
        (h(f"ring#{s}#{v}"), s)
        for s in range(RING_SHARDS)
        for v in range(RING_VNODES)
    )
    docs = load_docs(spark, SF_DIR).select("text").collect()
    mass = Counter(t for r in docs for t in r["text"].split(" ") if t)
    import bisect

    shard_mass = Counter()
    shard_terms = Counter()
    positions = [p for p, _ in ring]
    for t, m in mass.items():
        i = bisect.bisect_right(positions, h(t)) - 1
        owner = ring[i][1] if i >= 0 else ring[-1][1]
        shard_mass[owner] += m
        shard_terms[owner] += 1
    grand = sum(mass.values())
    got = q213_consistent_hash_ring(spark, SF_DIR).collect()
    assert sum(r["total_mass"] for r in got) == grand
    for r in got:
        assert r["total_mass"] == shard_mass[r["shard"]]
        assert r["n_terms"] == shard_terms[r["shard"]]
        assert r["straggler"] == r["total_mass"] / (grand / RING_SHARDS)


def test_simhash_histogram_matches_python_reference(spark):
    """q214: the histogram sums to the candidate-pair count, shares
    sum to 1, and every hamming <= bound bucket is flagged."""
    from searchengine_spark.pipelines.dedup import (
        SIMHASH_MAX_HAMMING,
        q214_simhash_histogram,
    )

    got = q214_simhash_histogram(spark, SF_DIR).collect()
    assert len(got) >= 2
    total_share = sum(r["share"] for r in got)
    assert abs(total_share - 1.0) < 1e-9
    n_pairs = sum(r["n"] for r in got)
    for r in got:
        assert r["share"] == r["n"] / n_pairs
        assert r["within_banded_bound"] == (
            r["hamming"] <= SIMHASH_MAX_HAMMING
        )
    hams = [r["hamming"] for r in got]
    assert hams == sorted(hams)
