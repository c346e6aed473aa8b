"""Oracle comparison for the LLM-data-pipeline operators: dedup,
similarity search, text analysis, event windows, as-of join, multimodal
metadata."""

from __future__ import annotations

import pytest

from hadoop_digit_recognition_spark.all_queries import ORACLE_SQL, SPARK_QUERIES

from .conftest import SF_ORACLE
from .oracle_harness import compare

LLM_QUERIES = [
    "dedup_exact", "dedup_ngram_jaccard", "minhash_signatures",
    "dedup_minhash_lsh", "simhash_signatures", "simhash_dup_pairs",
    "dedup_embedding_cosine",
    "sim_topk_cosine", "sim_ann_lsh_buckets", "sim_ann_lsh",
    "text_token_stats", "text_quality_score", "text_langid",
    "text_fingerprint", "text_ngram_freq", "text_tfidf_top_terms",
    "text_rolling_hash_fingerprint", "text_clean_normalize",
    "text_quality_filter", "agg_collect_sorted", "join_null_safe",
    "dedup_fuzzy_levenshtein", "dedup_incremental",
    "window_tumbling", "window_sliding", "window_session",
    "window_time_range_frame", "agg_median_quartiles",
    "sessionize_relational", "asof_join", "asof_join_cogrouped",
    "timeseries_gapfill",
    "text_quality_filter_approx",
    "pipeline_llm_corpus",
    "multimodal_meta", "multimodal_frame_sample",
    "sim_knn_graph", "sketch_hll_merge_rollup", "dedup_embedding_lsh",
    "dedup_containment", "funnel_conversion", "cohort_retention",
    "streaks_gaps_islands",
    "multimodal_audio_energy", "dq_validation_summary",
    "text_chunk_sliding", "corpus_balanced_sample",
    "graph_triangle_count", "sim_ivf_det_topk", "timeseries_ewma",
    "corpus_dedup_report", "basket_association_rules",
    "text_bigram_surprisal",
    "text_pii_redact", "text_word_entropy", "corpus_sequence_pack",
    "text_bpe_pair_counts", "embedding_int8_quantize",
    "dedup_cluster_canonical", "dq_profile_drift",
    "multimodal_scene_cuts", "multimodal_resize_nn",
    "timeseries_cusum_drift", "dedup_cross_lingual_pairs",
    "dedup_semantic_semdedup", "dedup_segments_corpus",
    "corpus_domain_cap", "corpus_epoch_schedule",
    "dedup_lsh_band_tuning",
    "corpus_split_train_valid_test", "corpus_shard_assign",
    "sim_hard_negatives", "sim_hybrid_bm25_rerank", "quality_tier_report",
    "events_markov_transitions", "text_pmi_collocations",
    "dedup_lsh_eval_pr", "join_interval_overlap",
    "graph_label_propagation", "funnel_within_time",
    "multimodal_phash_dedup",
    "asof_join_forward", "events_rfm_segmentation",
    "embedding_pca_power_iteration",
    "sketch_bloom_membership", "window_peak_concurrency",
    "corpus_importance_resample", "dedup_normalized_prefix",
    "timeseries_twap", "ml_knn_classifier_eval", "corpus_dedup_cascade",
    "text_vocab_coverage_curve", "events_rolling_zscore",
    "events_survival_curve", "events_power_user_gini",
    "text_ngram_novelty",
    "ml_ols_two_feature", "corpus_crawl_novelty_curve",
    "dedup_repeated_substrings", "corpus_length_bucket_batches",
    "graph_kcore_dup_clusters", "events_pattern_match_sequence",
    "corpus_tokenizer_fertility",
    "asof_join_nearest", "sim_matryoshka_truncation_eval",
    "timeseries_seasonal_decompose", "events_ltv_decayed",
    "events_bot_detection", "agg_hhi_concentration",
    "events_dau_wau_mau",
    "ml_auc_rank_sum", "window_outlier_hampel",
    "dq_k_anonymity", "events_ab_srm_check", "corpus_dataset_card",
    "agg_abc_pareto", "events_slo_burn_rate", "orders_aging_buckets",
    "embedding_pq_quantize", "sim_pq_adc_topk",
    "window_rolling_corr", "ab_diff_in_diff",
    "dq_benford_test", "events_session_paths",
    "graph_assortativity",
    "ml_threshold_sweep_f1", "window_drawdown",
    "timeseries_autocorrelation",
    "events_hour_dow_heatmap", "supplier_lead_time_percentiles",
    "events_new_vs_returning", "multimodal_laplacian_sharpness",
    "multimodal_audio_trim_silence", "agg_weighted_median",
    "graph_modularity_regions", "skyline_pareto_frontier",
    "layout_file_skipping_stats", "ab_bootstrap_ci_poisson",
    "timeseries_yoy_mom", "ml_calibration_bins",
    "window_cumulative_distinct", "feature_woe_binning",
    "split_temporal_leakage_safe", "agg_theil_decomposition",
    "sim_rrf_fusion", "corpus_mlm_mask_plan",
    "grouped_quantile_normalize_pandas", "multimodal_histogram_equalize",
    "text_winnowing_fingerprints", "dedup_winnowing_pairs",
    "agg_ratio_to_report", "dedup_semdedup_capped", "sim_ivfpq_topk",
    "sim_graph_greedy_search", "text_bpe_merge_train",
    "ml_label_noise_knn", "text_kneser_ney_bigram",
    "sim_knn_graph_adaptive",
    "dq_psi_distribution_drift", "dq_ks_two_sample",
    "text_kn_perplexity_filter", "corpus_dsir_importance",
    "corpus_weighted_reservoir", "graph_clustering_coefficient",
    "dedup_minhash_lsh_capped", "sim_mmr_rerank",
    "corpus_gopher_quality_rules", "ml_adaboost_stumps",
    "text_zipf_fit", "grouped_ols_residuals_pandas",
    "multimodal_brightness_contrast_filter",
    "corpus_decontamination_semantic",
    "dq_observe_inflight_metrics",
    "corpus_contamination_report", "asof_join_interpolate",
    "dq_l_diversity", "text_bpe_encode", "timeseries_holt_linear",
    "dedup_record_linkage_fs", "sketch_kmv_intersection",
    "timeseries_theil_sen", "ml_ridge_path",
    "dedup_record_linkage_em", "dq_t_closeness", "sketch_moments_ams",
    "ml_isotonic_pav", "timeseries_croston_intermittent",
    "corpus_influence_tracing", "corpus_span_corruption_plan",
    "dedup_minhash_bbit", "ml_gbm_ls_stumps", "dq_fd_discovery",
    "timeseries_dtw_pairs", "ml_random_forest_stumps",
    "dq_mutual_information", "dq_dp_noisy_counts",
    "multimodal_vit_patch_plan", "text_rake_keywords",
    "timeseries_holt_winters", "events_prefixspan_topk",
    "events_attribution_shapley", "corpus_curriculum_order",
    "timeseries_matrix_profile_sad", "events_markov_stationary",
    "multimodal_audio_landmark_fingerprint", "dq_cfd_discovery",
    "sim_binary_quantization_hamming", "sim_mutual_knn_pairs",
    "text_unigram_viterbi_segment", "text_unigram_em_reestimate",
    "text_wordpiece_train", "timeseries_mann_kendall",
    "timeseries_kalman_level", "dq_chi_square_cramers_v",
    "ab_sequential_sprt", "sim_lof_outliers", "events_hmm_viterbi",
    "text_bleu_pairs", "multimodal_ssim_pairs",
    "sketch_ddsketch_quantiles", "dedup_cdc_chunks",
    "corpus_tokenizer_bakeoff",
]


@pytest.mark.parametrize("name", LLM_QUERIES)
def test_llm_op_vs_duckdb(spark, duck, name):
    df = SPARK_QUERIES[name](spark, SF_ORACLE)
    compare(df, duck, ORACLE_SQL[name], name)


def test_agg_collect_sorted_array_twin(spark, duck):
    """Array-valued twin of agg_collect_sorted (NOT registered — the
    driver canonicalizer cannot hash list cells). Compares element-wise
    against the joined-string registered form."""
    from hadoop_digit_recognition_spark.operators.text import (
        agg_collect_sorted_array)

    rows = {r["user_id"]: (list(r["types"]), r["n"])
            for r in agg_collect_sorted_array(spark, SF_ORACLE).collect()}
    reg = {r["user_id"]: (r["types"].split(",") if r["types"] else [], r["n"])
           for r in SPARK_QUERIES["agg_collect_sorted"](
               spark, SF_ORACLE).collect()}
    assert rows == reg


def test_nontrivial_results(spark):
    """Dedup queries must actually find the planted near-duplicates."""
    jac = SPARK_QUERIES["dedup_ngram_jaccard"](spark, SF_ORACLE).count()
    assert jac > 0, "no near-dup pairs found — threshold or shingling broken"
    lsh = SPARK_QUERIES["dedup_minhash_lsh"](spark, SF_ORACLE).count()
    assert lsh > 0
    sim = SPARK_QUERIES["simhash_dup_pairs"](spark, SF_ORACLE).count()
    assert sim > 0
    # round-5 additions must also fire on real data, not just hash-match
    from pyspark.sql import functions as F
    sem = (SPARK_QUERIES["dedup_semantic_semdedup"](spark, SF_ORACLE)
           .filter("dropped").count())
    assert sem > 0, "SemDeDup found no semantic dups at tau=0.4"
    segs = (SPARK_QUERIES["dedup_segments_corpus"](spark, SF_ORACLE)
            .agg(F.sum("n_dup_segments")).first()[0])
    assert segs > 0, "segment dedup found no repeated segments"
    sub = SPARK_QUERIES["dedup_repeated_substrings"](spark, SF_ORACLE)
    row = sub.agg(F.sum("n_dup_spans"), F.max("dup_frac")).first()
    assert row[0] > 0, "substring dedup found no cross-doc repeated spans"
    assert row[1] <= 1.0, "merged span accounting exceeded the document"


def test_semdedup_cap_is_sound_prune(spark):
    """The capped variant may only LOSE drops relative to uncapped
    SemDeDup (its pair set is a subset), it may never invent one; a
    dropped vector must itself be inside the cap (only capped vectors
    enter the pairwise compare as the higher-id side); and the cap must
    actually bind on the fixture (in_cap=false rows exist), otherwise
    the test exercises nothing."""
    capped = {r["vec_id"]: (r["in_cap"], r["dropped"]) for r in
              SPARK_QUERIES["dedup_semdedup_capped"](
                  spark, SF_ORACLE).collect()}
    full = {r["vec_id"]: r["dropped"] for r in
            SPARK_QUERIES["dedup_semantic_semdedup"](
                spark, SF_ORACLE).collect()}
    assert set(capped) == set(full)
    assert any(not inc for inc, _ in capped.values()), "cap never bound"
    for vid, (inc, dropped) in capped.items():
        if dropped:
            assert inc, f"vec {vid} dropped while outside the cap"
            assert full[vid], f"capped invented a drop uncapped lacks: {vid}"


def test_semdedup_megacell_two_phase(spark, tmp_path):
    """SCALE.md watch #3 closure: the two-phase sharded per-cell top-M
    must be BIT-IDENTICAL to the declared single-window oracle even on
    a forced MEGA-CELL — 4000 of 4040 vectors funneled into one cell
    (every vector a small perturbation of centroid 0), exactly the
    occupancy skew where the old one-window plan serialized the cell
    through a single task. The fixture makes phase 1 genuinely cut the
    mega-cell (4000 rows across SEM_CAP_SHARDS shards, each shard's
    local top-M > the global top-M's per-shard share), and the oracle
    compare proves the distributed-TopK merge loses nothing. Also
    re-asserts prune soundness (drops only from inside the cap) at
    this skew."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hadoop_digit_recognition_spark.operators.dedup import (
        SEM_CAP_M, SEM_CELLS, clear_signature_cache)
    from .oracle_harness import compare

    rng = np.random.default_rng(42)
    n_big, n_rest = 4000, 40
    base = rng.normal(0, 0.12, 64)
    vecs = np.concatenate([
        # centroid seeds 0..SEM_CELLS-1 live at vec_id < SEM_CELLS;
        # make seed 0 = base so the perturbed mass lands in cell 0
        np.concatenate([[base], rng.normal(0, 0.12, (SEM_CELLS - 1, 64))]),
        base + rng.normal(0, 0.004, (n_big - SEM_CELLS, 64)),   # mega-cell
        rng.normal(0, 0.12, (n_rest, 64)),                      # scatter
    ]).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array([i % 2 for i in range(len(vecs))], pa.int32())})
    d = str(tmp_path)
    pq.write_table(tbl, f"{d}/embeddings.parquet")

    clear_signature_cache(spark)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{d}/embeddings.parquet'")
    df = SPARK_QUERIES["dedup_semdedup_capped"](spark, d)
    compare(df, con, ORACLE_SQL["dedup_semdedup_capped"], "megacell")

    rows = df.collect()
    cells: dict = {}
    for r in rows:
        cells[r["cell"]] = cells.get(r["cell"], 0) + 1
    assert max(cells.values()) >= n_big - SEM_CELLS, cells  # skew is real
    in_cap = [r for r in rows if r["in_cap"]]
    mega = max(cells, key=cells.get)
    assert sum(1 for r in in_cap if r["cell"] == mega) == SEM_CAP_M
    for r in rows:
        if r["dropped"]:
            assert r["in_cap"], f"drop outside cap at vec {r['vec_id']}"
    clear_signature_cache(spark)


def test_ivfpq_consistent_with_adc(spark):
    """IVF-PQ is ADC restricted to probed cells: wherever the routed and
    the unrouted searches both surface a (qid, cid) pair, the asymmetric
    distance must be IDENTICAL (same codes, same lookup tables — routing
    changes which pairs are scored, never their score), and every
    IVF-PQ hit must come from a probed cell's occupants."""
    ivfpq = {(r["qid"], r["cid"]): r["adist"] for r in
             SPARK_QUERIES["sim_ivfpq_topk"](spark, SF_ORACLE).collect()}
    adc = {(r["qid"], r["cid"]): r["adist"] for r in
           SPARK_QUERIES["sim_pq_adc_topk"](spark, SF_ORACLE).collect()}
    assert ivfpq, "IVF-PQ returned nothing"
    shared = set(ivfpq) & set(adc)
    assert shared, "no overlap between routed and unrouted top-k at all"
    for pair in shared:
        assert ivfpq[pair] == adc[pair], f"adist diverged on {pair}"


def test_ivf_recall_vs_exact(spark):
    """IVF (nprobe=4 of 16 cells) must recover a solid fraction of the
    exact top-k; on this clusterless synthetic corpus ~0.7 observed, 0.5
    asserted with margin. Every returned row must be a real vector pair
    with rank <= TOP_K."""
    exact = SPARK_QUERIES["sim_topk_cosine"](spark, SF_ORACLE).collect()
    ivf = SPARK_QUERIES["sim_ivf_topk"](spark, SF_ORACLE).collect()
    ex: dict[int, set] = {}
    for r in exact:
        ex.setdefault(r["qid"], set()).add(r["cid"])
    iv: dict[int, set] = {}
    for r in ivf:
        iv.setdefault(r["qid"], set()).add(r["cid"])
    assert len(iv) == len(ex)
    recalls = [len(ex[q] & iv.get(q, set())) / len(ex[q]) for q in ex]
    assert sum(recalls) / len(recalls) >= 0.5, sum(recalls) / len(recalls)


def test_multimodal_decode_pool_golden(spark):
    """Real raster decode golden check: a known 256-byte payload decoded
    as 16x16 and 4x4 mean-pooled must equal the hand-computed NumPy
    pooling (and the registered query matches the DuckDB oracle in
    test_multimodal_decode_vs_duckdb)."""
    import numpy as np

    from hadoop_digit_recognition_spark.operators.multimodal import (
        POOL, RASTER_H, RASTER_W, extract_features)

    payload = bytes(range(256))  # 16x16 ramp raster
    df = spark.createDataFrame([(1, bytearray(payload))],
                               "doc_id bigint, payload binary")
    rows = {(r["pr"], r["pc"]): r["pooled"]
            for r in extract_features(df, decode=True).collect()}
    img = np.frombuffer(payload, dtype=np.uint8).reshape(RASTER_H, RASTER_W)
    expect = (img.astype(np.int64)
              .reshape(RASTER_H // POOL, POOL, RASTER_W // POOL, POOL)
              .sum(axis=(1, 3)) / (POOL * POOL * 255.0))
    assert len(rows) == (RASTER_H // POOL) * (RASTER_W // POOL)
    for (pr, pc), v in rows.items():
        assert v == expect[pr, pc], (pr, pc, v, expect[pr, pc])


def test_multimodal_decode_short_payload_zero_pads(spark):
    """Payloads shorter than the raster are zero-padded (and empty
    payloads decode to an all-zero pooled map), matching the oracle's
    CASE padding."""
    df = spark.createDataFrame(
        [(1, bytearray(b"\xff" * 8)), (2, bytearray(b""))],
        "doc_id bigint, payload binary")
    from hadoop_digit_recognition_spark.operators.multimodal import extract_features
    out = extract_features(df, decode=True).collect()
    by_doc: dict[int, dict] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], {})[(r["pr"], r["pc"])] = r["pooled"]
    # doc 1: eight 0xff bytes land in pooled blocks (0,0) and (0,1)
    assert by_doc[1][(0, 0)] == 4 * 255 / (16 * 255.0)
    assert by_doc[1][(0, 1)] == 4 * 255 / (16 * 255.0)
    assert by_doc[1][(1, 1)] == 0.0
    assert all(v == 0.0 for v in by_doc[2].values())


def test_multimodal_decode_vs_duckdb(spark, duck):
    df = SPARK_QUERIES["multimodal_decode_pool"](spark, SF_ORACLE)
    compare(df, duck, ORACLE_SQL["multimodal_decode_pool"],
            "multimodal_decode_pool")


@pytest.mark.parametrize("name", ["grouped_zscore_pandas",
                                  "grouped_wavg_pandas",
                                  "udtf_tokenize",
                                  "pandas_api_groupby"])
def test_pandas_udf_surface_vs_duckdb(spark, duck, name):
    """The Arrow-batched Python path must equal the relational form."""
    df = SPARK_QUERIES[name](spark, SF_ORACLE)
    compare(df, duck, ORACLE_SQL[name], name)


def test_corpus_is_ascii(spark):
    """Precondition of the multimodal_features oracle: byte == code
    point. If testdata ever grows non-ASCII text this fails loudly
    instead of the oracle mismatching obscurely."""
    from pyspark.sql import functions as F

    from hadoop_digit_recognition_spark.tables import load
    docs = load(spark, SF_ORACLE, "documents")
    n = docs.filter(
        F.octet_length(F.encode("text", "utf-8")) != F.length("text")).count()
    assert n == 0


def test_multimodal_features_vs_duckdb(spark, duck):
    df = SPARK_QUERIES["multimodal_features"](spark, SF_ORACLE)
    compare(df, duck, ORACLE_SQL["multimodal_features"], "multimodal_features")


def test_connected_components_vs_duckdb(spark, duck):
    df = SPARK_QUERIES["dedup_connected_components"](spark, SF_ORACLE)
    compare(df, duck, ORACLE_SQL["dedup_connected_components"],
            "dedup_connected_components")


def test_connected_components_properties(spark):
    """Every canonical id is a member of its own cluster and is the
    cluster minimum (idempotent representative choice)."""
    rows = SPARK_QUERIES["dedup_connected_components"](
        spark, SF_ORACLE).collect()
    label = {r["doc_id"]: r["canonical_id"] for r in rows}
    for doc, canon in label.items():
        assert canon <= doc
        assert label[canon] == canon


def test_banded_simhash_equals_allpairs(spark, duck):
    """Pigeonhole losslessness: 8 bands of 4 bits find every pair with
    Hamming distance <= 6, so the banded equi-join must return the
    identical pair set as the all-pairs form — and with no cartesian
    product in its plan."""
    from hadoop_digit_recognition_spark.plans import (
        explain_formatted, has_cartesian_product)
    banded = SPARK_QUERIES["simhash_dup_pairs_banded"](spark, SF_ORACLE)
    allp = SPARK_QUERIES["simhash_dup_pairs"](spark, SF_ORACLE)
    assert banded.exceptAll(allp).count() == 0
    assert allp.exceptAll(banded).count() == 0
    assert not has_cartesian_product(banded)
    compare(banded, duck, ORACLE_SQL["simhash_dup_pairs_banded"],
            "simhash_dup_pairs_banded")


def test_embedding_lsh_subset_of_exact(spark):
    """Every LSH-bucketed near-dup pair must appear in the exact all-pairs
    result with the same cosine (no false positives), and recall on this
    corpus must be non-trivial."""
    exact = {(r["vec_a"], r["vec_b"]): r["cos"]
             for r in SPARK_QUERIES["dedup_embedding_cosine"](
                 spark, SF_ORACLE).collect()}
    lsh = {(r["vec_a"], r["vec_b"]): r["cos"]
           for r in SPARK_QUERIES["dedup_embedding_lsh"](
               spark, SF_ORACLE).collect()}
    assert lsh, "LSH bucketing found no near-dup pairs at all"
    for pair, cos in lsh.items():
        assert pair in exact and abs(exact[pair] - cos) < 1e-9, pair


def test_cc_recursive_equals_iterative(spark, duck):
    """The declarative recursive-CTE clustering must produce exactly the
    iterative fixpoint's labels (cluster diameter <= recursion depth on
    this corpus), and must match its own depth-bounded DuckDB oracle."""
    it = {(r["doc_id"], r["canonical_id"])
          for r in SPARK_QUERIES["dedup_connected_components"](
              spark, SF_ORACLE).collect()}
    rec = {(r["doc_id"], r["canonical_id"])
           for r in SPARK_QUERIES["dedup_cc_recursive_sql"](
               spark, SF_ORACLE).collect()}
    assert rec == it
    compare(SPARK_QUERIES["dedup_cc_recursive_sql"](spark, SF_ORACLE),
            duck, ORACLE_SQL["dedup_cc_recursive_sql"],
            "dedup_cc_recursive_sql")


def test_pipeline_embedding_dedup_vs_duckdb(spark, duck):
    df = SPARK_QUERIES["pipeline_embedding_dedup"](spark, SF_ORACLE)
    compare(df, duck, ORACLE_SQL["pipeline_embedding_dedup"],
            "pipeline_embedding_dedup")


def test_min_label_cc_logarithmic_on_path_graph(spark):
    """The pointer-doubling CC loop must label a 512-node PATH (the
    worst case for pure min-label propagation: diameter 511, so the old
    loop's 20-round cap wouldn't even converge) correctly in O(log d)
    rounds. This is the shape sf10 exact-dup chains actually build
    (SCALE.md giant-component rehearsal) and the r09 scale fix."""
    from pyspark.sql import functions as F

    from hadoop_digit_recognition_spark.operators.dedup import min_label_cc

    n = 512
    fwd = spark.range(n - 1).select(
        F.col("id").alias("u"), (F.col("id") + 1).alias("v"))
    edges = fwd.unionByName(
        fwd.select(F.col("v").alias("u"), F.col("u").alias("v"))).persist()
    labels, rounds = min_label_cc(spark, edges)
    got = {r["u"]: r["lbl"] for r in labels.collect()}
    labels.unpersist()
    edges.unpersist()
    assert got == {i: 0 for i in range(n)}
    # log2(511) ~ 9; propagation+shortcut contracts at least this fast.
    # 20 rounds is the loop cap — hitting it would mean NO convergence
    # certificate; pure propagation would need 511 rounds.
    assert rounds <= 12, rounds


def test_two_phase_star_equals_min_label(spark, duck):
    """Large-star/small-star must converge to exactly the min-label
    fixpoint's labels, and match the recursive-closure oracle."""
    it = {(r["doc_id"], r["canonical_id"])
          for r in SPARK_QUERIES["dedup_connected_components"](
              spark, SF_ORACLE).collect()}
    star = {(r["doc_id"], r["canonical_id"])
            for r in SPARK_QUERIES["dedup_cc_two_phase_star"](
                spark, SF_ORACLE).collect()}
    assert star == it
    compare(SPARK_QUERIES["dedup_cc_two_phase_star"](spark, SF_ORACLE),
            duck, ORACLE_SQL["dedup_cc_two_phase_star"],
            "dedup_cc_two_phase_star")


def test_multimodal_audio_energy_empty_payload_zero_frames(spark):
    """A zero-byte payload emits ZERO frames — matching the audio
    oracle's WHERE, which produces no rows for an empty document (the
    old max(1, ...) emitted one silent frame the oracle never saw)."""
    from hadoop_digit_recognition_spark.operators.multimodal import (
        AUDIO_SCHEMA,
        audio_frames,
    )
    from hadoop_digit_recognition_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    df = spark.createDataFrame(
        [(1, bytearray(b"a" * 70)), (2, bytearray(b""))],
        "doc_id bigint, payload binary")
    rows = df.mapInPandas(audio_frames, AUDIO_SCHEMA).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc.get(1, [])) == 2  # 70 bytes -> two 64-sample frames
    assert 2 not in by_doc  # empty payload -> no frames at all


def test_pii_redact_masks_and_counts(spark):
    """Unit semantics on injected PII: the registered patterns must mask
    emails / phone shapes / denylist names and count each match —
    exercised on constructed rows because the synthetic corpus carries
    no digits (only the denylist fires there)."""
    from pyspark.sql import functions as F

    from hadoop_digit_recognition_spark.operators.text import (
        _PII_EMAIL, _PII_NAME, _PII_PHONE)

    df = spark.createDataFrame(
        [(1, "mail bob.smith@example.org and 555-867-5309x"),
         (2, "call 123 456 7890 now customer"),
         (3, "plain text no pii")], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in df.select(
        "doc_id",
        F.regexp_count("text", F.lit(_PII_EMAIL)).alias("e"),
        F.regexp_count("text", F.lit(_PII_PHONE)).alias("p"),
        F.regexp_count("text", F.lit(_PII_NAME)).alias("n"),
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace("text", F.lit(_PII_EMAIL), F.lit("[EMAIL]")),
                F.lit(_PII_PHONE), F.lit("[PHONE]")),
            F.lit(_PII_NAME), F.lit("[NAME]")).alias("red")).collect()}
    assert (out[1]["e"], out[1]["p"]) == (1, 0)  # 555-867-5309x: no 4th block boundary
    assert "bob.smith@example.org" not in out[1]["red"]
    assert "[EMAIL]" in out[1]["red"]
    assert (out[2]["p"], out[2]["n"]) == (1, 1)
    assert out[2]["red"] == "call [PHONE] now [NAME]"
    assert out[3]["red"] == "plain text no pii"


def test_pii_denylist_fires_on_corpus(spark):
    """On the synthetic corpus the NAME denylist must actually redact
    (the corpus contains 'customer'), and no denylisted token survives
    in the redacted text."""
    from pyspark.sql import functions as F

    df = SPARK_QUERIES["text_pii_redact"](spark, SF_ORACLE)
    agg = df.agg(F.sum("n_name").alias("names"),
                 F.sum(F.regexp_count("redacted", F.lit(r"\bcustomer\b")))
                 .alias("leftover")).collect()[0]
    assert agg["names"] > 0
    assert agg["leftover"] == 0


def test_word_entropy_bounds(spark):
    """0 <= entropy <= log2(n_distinct); norm_entropy in [0, 1]; token
    accounting consistent with n_distinct."""
    import math

    rows = SPARK_QUERIES["text_word_entropy"](spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_distinct <= r.n_tokens
        ceiling = math.log2(r.n_distinct) if r.n_distinct > 1 else 0.0
        assert -1e-6 <= r.entropy <= ceiling + 1e-6, r
        assert -1e-6 <= r.norm_entropy <= 1.0 + 1e-6, r


def test_sequence_pack_conserves_tokens(spark):
    """Packing must conserve the corpus: per-source token totals across
    sequences equal the per-source token counts of the input, every
    sequence holds >= 1 document, and sequence ids start at 0."""
    from pyspark.sql import functions as F

    from hadoop_digit_recognition_spark.tables import load

    out = SPARK_QUERIES["corpus_sequence_pack"](spark, SF_ORACLE)
    packed = {r["source"]: r for r in
              out.groupBy("source")
              .agg(F.sum("n_tokens").alias("tok"),
                   F.sum("n_docs").alias("docs"),
                   F.min("seq_id").alias("lo")).collect()}
    ntok = F.size(F.filter(F.split("text", " "), lambda x: x != ""))
    truth = {r["source"]: r for r in
             load(spark, SF_ORACLE, "documents")
             .groupBy("source")
             .agg(F.sum(ntok).alias("tok"),
                  F.count(F.lit(1)).alias("docs")).collect()}
    assert packed.keys() == truth.keys()
    for src in truth:
        assert packed[src]["tok"] == truth[src]["tok"], src
        assert packed[src]["docs"] == truth[src]["docs"], src
        assert packed[src]["lo"] == 0, src
    assert out.filter(F.col("n_docs") < 1).count() == 0


def test_bpe_pairs_shape(spark):
    """Every merge candidate is exactly 2 chars, ranks are 1..20 with
    counts non-increasing in rank order."""
    rows = sorted(
        SPARK_QUERIES["text_bpe_pair_counts"](spark, SF_ORACLE).collect(),
        key=lambda r: r.rnk)
    assert [r.rnk for r in rows] == list(range(1, 21))
    assert all(len(r.pair) == 2 for r in rows)
    counts = [r.n for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_int8_quantize_error_bound(spark):
    """Symmetric absmax int8 quantization bounds per-element error by
    scale/254, hence RMSE <= scale/254; and the quantized grid must
    actually reconstruct (rmse strictly below the no-quantization
    strawman scale)."""
    rows = SPARK_QUERIES["embedding_int8_quantize"](spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert r.rmse <= r.scale / 254.0 * (1 + 1e-6), r
        assert r.rmse >= 0


def test_cluster_canonical_one_survivor_max_quality(spark):
    """Exactly one kept doc per cluster, and it carries the cluster's
    max quality (ties broken by doc_id)."""
    rows = SPARK_QUERIES["dedup_cluster_canonical"](spark, SF_ORACLE).collect()
    assert rows
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r.cluster, []).append(r)
    for cid, members in by_cluster.items():
        kept = [m for m in members if m.kept == 1]
        assert len(kept) == 1, (cid, members)
        assert kept[0].quality == max(m.quality for m in members)


def test_profile_drift_five_metrics_sane(spark):
    """All five profile metrics report; relative drift is exact where a
    driver-side recompute is cheap (row counts)."""
    from pyspark.sql import functions as F

    from hadoop_digit_recognition_spark.tables import load

    rows = {r.metric: r for r in
            SPARK_QUERIES["dq_profile_drift"](spark, SF_ORACLE).collect()}
    assert set(rows) == {"n_rows", "n_customers", "mean_price",
                         "null_rate_priority", "frac_status_f"}
    cut = F.lit("1999-01-01").cast("date")
    orders = load(spark, SF_ORACLE, "orders")
    nb = orders.filter(F.col("o_orderdate") < cut).count()
    nc = orders.filter(F.col("o_orderdate") >= cut).count()
    r = rows["n_rows"]
    assert (r.baseline, r.current) == (nb, nc)
    assert abs(r.rel_drift - (nc - nb) / nb) < 1e-5
    for r in rows.values():
        assert r.flagged in (0, 1)


def test_scene_cuts_jump_semantics(spark):
    """Every reported cut exceeds the threshold, lands on a valid frame
    (never frame 0 — a cut is a TRANSITION), and integer stats mean the
    oracle agreement needs no rounding grid."""
    rows = SPARK_QUERIES["multimodal_scene_cuts"](spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert r.jump > 300
        assert r.frame_id >= 1


def test_resize_nn_geometry(spark):
    """Every doc yields exactly an 8x8 output grid of raw byte values."""
    from pyspark.sql import functions as F

    out = SPARK_QUERIES["multimodal_resize_nn"](spark, SF_ORACLE)
    g = out.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("orow").alias("mr"), F.max("ocol").alias("mc"),
        F.min("pix").alias("lo"), F.max("pix").alias("hi")).collect()
    assert g
    for r in g:
        assert (r.n, r.mr, r.mc) == (64, 7, 7)
        assert 0 <= r.lo and r.hi <= 255


def test_cusum_nonnegative_and_resets(spark):
    """CUSUM statistics are non-negative by construction, and on a
    stationary synthetic series (uniform values, no injected drift)
    they stay small relative to the day count times slack."""
    rows = SPARK_QUERIES["timeseries_cusum_drift"](spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert r.cusum_high >= 0 and r.cusum_low >= 0
        assert r.drift in (0, 1)
        assert r.cusum_high < r.n_days * 0.5 * 3


def test_cross_lingual_pairs_subset_of_lsh(spark):
    """Cross-lingual candidates are exactly the verified LSH pairs with
    differing langs — a strict subset of the dedup pair set."""
    all_pairs = {(r.doc_a, r.doc_b) for r in
                 SPARK_QUERIES["dedup_minhash_lsh"](spark, SF_ORACLE)
                 .collect()}
    xl = SPARK_QUERIES["dedup_cross_lingual_pairs"](spark, SF_ORACLE).collect()
    assert xl
    for r in xl:
        assert (r.doc_a, r.doc_b) in all_pairs
        assert r.lang_a != r.lang_b


def test_pq_adc_recall(spark):
    """ADC over sampled-subvector codebooks must beat random top-5
    recall by a wide margin (random = 5/499 ~ 0.01; bound 0.08 with
    the measured ~0.16 leaving 2x margin on this clusterless corpus),
    and every returned rank must be a valid 1..5."""
    ex: dict[int, set] = {}
    for r in SPARK_QUERIES["sim_topk_cosine"](spark, SF_ORACLE).collect():
        ex.setdefault(r["qid"], set()).add(r["cid"])
    ad: dict[int, set] = {}
    for r in SPARK_QUERIES["sim_pq_adc_topk"](spark, SF_ORACLE).collect():
        assert 1 <= r["rnk"] <= 5
        ad.setdefault(r["qid"], set()).add(r["cid"])
    assert len(ad) == len(ex)
    recalls = [len(ex[q] & ad.get(q, set())) / len(ex[q]) for q in ex]
    assert sum(recalls) / len(recalls) >= 0.08


def test_nsw_recall_vs_exact(spark):
    """Graph-ANN recall floor: the 3-hop beam-4 NSW walk from a single
    entry point must recover a nonzero fraction of the exact top-5 on
    the clusterless synthetic corpus (measured 0.040 on the two-table
    connected graph — honest for random isotropic vectors where a
    greedy walk has no density gradient to follow; hops/beam is the ef
    knob production tunes). Before the round-7 two-table edge build,
    single-table edges made the graph a disjoint union of per-bucket
    components and recall collapsed to 0.013: this floor is the
    connectivity regression test. Asserted at 0.03, plus per-query
    structural soundness (every returned neighbor really is a corpus
    vector, no query answers more than TOP_K)."""
    from hadoop_digit_recognition_spark.operators.similarity import TOP_K

    exact = {}
    for r in SPARK_QUERIES["sim_topk_cosine"](spark, SF_ORACLE).collect():
        exact.setdefault(r["qid"], set()).add(r["cid"])
    nsw = {}
    for r in SPARK_QUERIES["sim_graph_greedy_search"](
            spark, SF_ORACLE).collect():
        nsw.setdefault(r["qid"], set()).add(r["cid"])
    assert nsw and all(len(c) <= TOP_K for c in nsw.values())
    hits = sum(len(exact.get(q, set()) & c) for q, c in nsw.items())
    total = sum(len(v) for v in exact.values())
    assert hits / total >= 0.03, f"NSW recall@{TOP_K} = {hits / total:.3f}"


def test_adaptive_planes_formula_clamps_and_boundaries():
    """Integer plane-count formula: smallest p with n <= TARGET * 2^p,
    clamped to [PLANES_MIN, PLANES_MAX]. Boundary n = TARGET << p must
    pick p (not p+1) on both engines — the Spark twin is this Python
    function, the oracle twin is the pc CTE's identical comparison."""
    from hadoop_digit_recognition_spark.operators.similarity import (
        BUCKET_TARGET, PLANES_MAX, PLANES_MIN, _adaptive_n_planes)

    assert _adaptive_n_planes(1) == PLANES_MIN
    assert _adaptive_n_planes(BUCKET_TARGET << PLANES_MIN) == PLANES_MIN
    assert _adaptive_n_planes((BUCKET_TARGET << PLANES_MIN) + 1) \
        == PLANES_MIN + 1
    assert _adaptive_n_planes(10**12) == PLANES_MAX
    # monotone non-decreasing in n
    widths = [_adaptive_n_planes(n) for n in range(1, 5000, 37)]
    assert widths == sorted(widths)


def test_adaptive_planes_bucket_width_constant_across_sf(spark):
    """The point of the adaptive count (SCALE.md watch #2): EXPECTED
    bucket width n / 2^planes stays inside (TARGET/2, TARGET] at every
    fixture size — so the bucket self-join cost is ~n x TARGET, linear,
    instead of the fixed-plane quadratic. Also asserts the hash is
    actually balanced at that width: measured MEAN occupancy within 4x
    of expected (sign-bit LSH on the synthetic vectors is near-uniform;
    a broken plane family would blow this band)."""
    from hadoop_digit_recognition_spark.operators.similarity import (
        BUCKET_TARGET, _adaptive_n_planes, _bucket_df, l2norm_col)
    from hadoop_digit_recognition_spark.tables import load_parallel
    import pyspark.sql.functions as F

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
                   "/root/testdata/sf0.1"):
        emb = (load_parallel(spark, sf_dir, "embeddings")
               .filter(l2norm_col(F.col("embedding")) > 0))
        n = emb.count()
        planes = _adaptive_n_planes(n)
        expected = n / (1 << planes)
        assert BUCKET_TARGET / 2 < expected <= BUCKET_TARGET, \
            f"{sf_dir}: n={n} planes={planes} expected width {expected}"
        occ = (_bucket_df(spark, sf_dir, n_planes=planes)
               .groupBy("bkt").count().agg(
                   F.mean("count").alias("mean")).collect()[0])
        assert occ["mean"] <= 4 * BUCKET_TARGET, \
            f"{sf_dir}: mean occupancy {occ['mean']} vs target {BUCKET_TARGET}"


def test_minhash_cap_composes_with_exact(spark, tmp_path):
    """sf10 rehearsal closure (SCALE.md round-7 entry): the width-capped
    LSH must (a) match its own oracle on a forced mega-clique fixture,
    (b) actually suppress the mega-bucket (cap binds), and (c) lose ONLY
    pairs inside identical-text groups — i.e. exact-hash dedup running
    first (the pipeline ordering) plus the capped LSH together cover
    every pair the uncapped query finds. 40 identical docs force every
    one of the clique's band buckets over LSH_BUCKET_CAP; 10 planted
    near-dup pairs (one word changed, J≈0.92) stay in width-2 buckets
    and must survive the cap."""
    import random

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hadoop_digit_recognition_spark.operators.dedup import (
        LSH_BUCKET_CAP, clear_signature_cache)
    from .oracle_harness import compare

    rng = random.Random(7)

    def words(n):
        return [("w%05d" % rng.randrange(100000)) for _ in range(n)]

    texts = {}
    clique_text = " ".join(words(50))
    n_clique = 40
    assert n_clique > LSH_BUCKET_CAP
    for d in range(n_clique):
        texts[d] = clique_text
    nid = n_clique
    for _ in range(10):                     # near-dup pairs, J ~ 0.92
        base = words(50)
        texts[nid] = " ".join(base)
        texts[nid + 1] = " ".join(base[:-1] + ["w99999"])
        nid += 2
    for _ in range(30):                     # background singletons
        texts[nid] = " ".join(words(40))
        nid += 1

    ids = sorted(texts)
    tbl = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array([texts[i] for i in ids]),
        "lang": pa.array(["en"] * len(ids)),
        "source": pa.array(["src0"] * len(ids)),
        "n_chars": pa.array([len(texts[i]) for i in ids], pa.int64())})
    d = str(tmp_path)
    pq.write_table(tbl, f"{d}/documents.parquet")

    clear_signature_cache(spark)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
    capped_df = SPARK_QUERIES["dedup_minhash_lsh_capped"](spark, d)
    compare(capped_df, con,
            ORACLE_SQL["dedup_minhash_lsh_capped"], "megaclique")

    capped = {(r["doc_a"], r["doc_b"]) for r in capped_df.collect()}
    uncapped = {(r["doc_a"], r["doc_b"]) for r in
                SPARK_QUERIES["dedup_minhash_lsh"](spark, d).collect()}
    # identical-text groups -> the pairs exact dedup resolves upstream
    groups: dict = {}
    for i in ids:
        groups.setdefault(texts[i], []).append(i)
    exact_pairs = {(a, b) for g in groups.values() if len(g) > 1
                   for a in g for b in g if a < b}
    assert capped <= uncapped
    assert len(uncapped - capped) > 0, "cap never bound on the fixture"
    assert uncapped - capped <= exact_pairs, (
        "cap lost a pair outside identical-text groups")
    assert capped | exact_pairs >= uncapped
    # the planted near-dup pairs survive the cap
    planted = {(a, a + 1) for a in range(n_clique, n_clique + 20, 2)}
    assert planted <= capped


def test_adaboost_round2_never_repicks_round1(spark):
    """Textbook AdaBoost invariant: after reweighting, round 1's chosen
    stump has weighted error EXACTLY 1/2 (the reweight is constructed
    to make it useless), so round 2 must select a different (t, pol) —
    and both rounds' weighted errors stay strictly below 1/2 (a stump
    grid closed under polarity flip always beats random)."""
    rows = {r["round"]: r for r in
            SPARK_QUERIES["ml_adaboost_stumps"](spark, SF_ORACLE).collect()}
    r1, r2 = rows[1], rows[2]
    assert (r1["threshold"], r1["polarity"]) != \
        (r2["threshold"], r2["polarity"])
    assert r1["werr"] < 0.5 and r2["werr"] < 0.5
    assert r1["alpha"] > 0 and r2["alpha"] > 0
    assert 0.0 <= r1["ens_acc"] <= 1.0 and 0.0 <= r2["ens_acc"] <= 1.0


def test_mmr_selection_invariants(spark):
    """MMR structure: rank-1 is the pure-relevance argmax of its pool;
    the K picks per query are distinct; and every later pick's rel is
    <= the rank-1 rel (rank 1 maximizes rel by construction)."""
    from collections import defaultdict

    by_q = defaultdict(dict)
    for r in SPARK_QUERIES["sim_mmr_rerank"](spark, SF_ORACLE).collect():
        by_q[r["qid"]][r["rnk"]] = r
    top = {r["qid"]: r for r in
           SPARK_QUERIES["sim_topk_cosine"](spark, SF_ORACLE).collect()
           if r["rnk"] == 1}
    for qid, picks in by_q.items():
        assert set(picks) == {1, 2, 3}
        cids = [picks[k]["cid"] for k in (1, 2, 3)]
        assert len(set(cids)) == 3
        # rank-1 == exact top-1 by relevance (same rounding, same ties)
        assert picks[1]["cid"] == top[qid]["cid"]
        assert all(picks[k]["rel"] <= picks[1]["rel"] + 1e-12
                   for k in (2, 3))


def test_fs_em_agrees_with_fixed_weights(spark):
    """Planted-duplicates bound for the EM step (VERDICT r07 ask #7):
    on a fixture whose candidate classes mix ~1000 chance-agreement
    non-matches with 100 planted high-agreement matches, two EM rounds
    (the registered query's exact code path, fs_em_two_rounds) must
    (a) pull every field's m above its u, (b) estimate a prevalence in
    the planted ballpark, and (c) land the extreme agreement classes on
    the SAME decisions the fixed-weight query makes: all-agree scores
    >= the match threshold, all-disagree scores negative."""
    from hadoop_digit_recognition_spark.operators.dedup import (
        _FS_MATCH, fs_em_two_rounds)

    # chance-agreement non-matches (u ~ .1/.1/.8) + planted matches
    classes = []
    for a in (0, 1):
        for b in (0, 1):
            for c in (0, 1):
                pa = 0.1 if a else 0.9
                pb = 0.1 if b else 0.9
                pc = 0.8 if c else 0.2
                classes.append((a, b, c, int(round(1000 * pa * pb * pc))))
    planted = {(1, 1, 1): 80, (0, 1, 1): 10, (1, 0, 1): 10}
    classes = [(a, b, c, n + planted.get((a, b, c), 0))
               for a, b, c, n in classes]
    cls = spark.createDataFrame(
        classes, "ag_bal int, ag_name int, ag_neg int, cnt bigint")
    out = {(r["round"], r["field"]): r
           for r in fs_em_two_rounds(cls).collect()}
    for f in ("bal_bucket", "name_last", "neg_flag"):
        r2 = out[(2, f)]
        assert r2["m_est"] > r2["u_est"], (f, r2)
    lam2 = out[(2, "bal_bucket")]["lambda_est"]
    assert 0.02 < lam2 < 0.5, lam2
    all_agree = sum(out[(2, f)]["w_agree_micro"]
                    for f in ("bal_bucket", "name_last", "neg_flag"))
    all_disagree = sum(out[(2, f)]["w_disagree_micro"]
                       for f in ("bal_bucket", "name_last", "neg_flag"))
    assert all_agree >= _FS_MATCH, all_agree
    assert all_disagree < 0, all_disagree


def test_bpe_scaled_prefix_and_replay(spark):
    """Bounds for the production-depth BPE trainer (rows-only): (a) its
    first 6 merges are BIT-IDENTICAL to the oracle-graded unrolled
    trainer's (same factored pair-count stage, so any divergence is a
    selection/merge bug), and (b) replaying the learned merge list with
    _bpe_apply_merges reproduces the trainer's own final word state
    exactly — train/encode skew is the production tokenizer bug class
    this pins down."""
    from hadoop_digit_recognition_spark.operators.text import (
        _BPE_ROUNDS, _bpe_apply_merges, _bpe_train_scaled,
        _bpe_train_states, _bpe_word_state)
    from hadoop_digit_recognition_spark.tables import load

    docs = load(spark, SF_ORACLE, "documents")
    merges, final_state = _bpe_train_scaled(docs, rounds=_BPE_ROUNDS + 2)
    assert len(merges) == _BPE_ROUNDS + 2   # no early stop on real data

    _, outs = _bpe_train_states(docs)
    oracle_rows = [o.collect()[0] for o in outs]
    for i, row in enumerate(oracle_rows):
        assert merges[i] == (row["round"], row["lhs"], row["rhs"],
                             row["pair_count"]), (i, merges[i], row)

    replayed = _bpe_apply_merges(_bpe_word_state(docs),
                                 [(l, r) for _, l, r, _ in merges])
    diff = (replayed.exceptAll(final_state).count()
            + final_state.exceptAll(replayed).count())
    assert diff == 0, f"replay diverged on {diff} word states"


def test_unigram_viterbi_invariants(spark):
    """The Viterbi segmentation must (a) concatenate back to the word
    exactly, (b) score as the sum of its pieces' micro-log-probs (the
    path the DP claims is the one reported), and (c) never beat any
    single-piece segmentation of a kept whole-word piece."""
    from hadoop_digit_recognition_spark.operators.text import (
        _unigram_piece_logprobs)

    _, lmic = _unigram_piece_logprobs(spark, SF_ORACLE)
    rows = SPARK_QUERIES["text_unigram_viterbi_segment"](
        spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        pieces = r.seg.split("+")
        assert "".join(pieces) == r.word, r
        assert len(pieces) == r.n_pieces, r
        assert sum(lmic[p] for p in pieces) == r.score_micro, r
        if r.word in lmic:
            assert r.score_micro >= lmic[r.word], r


def test_dtw_bounded_by_l1(spark):
    """DTW relaxes the diagonal alignment, so dtw_cost <= l1_cost on
    every pair; costs are positive on real profiles."""
    rows = SPARK_QUERIES["timeseries_dtw_pairs"](spark, SF_ORACLE).collect()
    assert len(rows) == 10
    for r in rows:
        assert 0 < r.dtw_cost <= r.l1_cost, r


def test_dtw_drops_incomplete_profiles_both_engines(spark, tmp_path):
    """Missing-month degenerate fixture (ADVICE r08): the unrolled-DP
    oracle needs a cost row at every i in 1..12 and a final cell at
    j = 12, so an entity missing any calendar month silently DROPS from
    the oracle; the Spark side's size(ys) == 12 guard must drop the
    same entity. Three regions — 0 and 1 with all 12 months, 2 missing
    June — must yield exactly the (0, 1) pair on BOTH engines with
    equal costs."""
    import duckdb
    from pyspark.sql import functions as F

    sf = str(tmp_path)
    region = [(rk,) for rk in range(3)]
    nation = [(nk, nk) for nk in range(3)]           # nationkey, regionkey
    customer = [(ck, ck) for ck in range(3)]         # custkey, nationkey
    orders, lineitem, ok = [], [], 0
    for rk in range(3):
        for m in range(1, 13):
            if rk == 2 and m == 6:
                continue
            orders.append((ok, rk, f"1995-{m:02d}-15"))
            lineitem.append((ok, float(100 * (rk + 1) + m)))
            ok += 1
    frames = {
        "region": spark.createDataFrame(region, "r_regionkey bigint"),
        "nation": spark.createDataFrame(
            nation, "n_nationkey bigint, n_regionkey bigint"),
        "customer": spark.createDataFrame(
            customer, "c_custkey bigint, c_nationkey bigint"),
        "orders": spark.createDataFrame(
            orders, "o_orderkey bigint, o_custkey bigint, o_orderdate string"
        ).withColumn("o_orderdate", F.col("o_orderdate").cast("date")),
        "lineitem": spark.createDataFrame(
            lineitem, "l_orderkey bigint, l_extendedprice double"),
    }
    for t, df in frames.items():
        df.coalesce(1).write.mode("overwrite").parquet(f"{sf}/{t}.parquet")

    srows = {(r.region_a, r.region_b): (r.dtw_cost, r.l1_cost)
             for r in SPARK_QUERIES["timeseries_dtw_pairs"](
                 spark, sf).collect()}
    con = duckdb.connect()
    for t in frames:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet/*.parquet'")
    orows = {(r[0], r[1]): (r[2], r[3]) for r in
             con.sql(ORACLE_SQL["timeseries_dtw_pairs"]).fetchall()}
    assert set(srows) == {(0, 1)}, srows
    assert srows == orows, (srows, orows)


def test_random_forest_beats_chance_with_oob(spark):
    """5 trees, every tree has out-of-bag rows (Poisson(1) leaves ~1/e
    of rows unsampled), ensemble beats the 50% base rate comfortably on
    the XOR-noise target."""
    rows = SPARK_QUERIES["ml_random_forest_stumps"](
        spark, SF_ORACLE).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.oob_n > 0 and 0.0 <= r.oob_acc <= 1.0
        assert r.werr <= r.wtot
    assert rows[0].ens_acc > 0.7


def test_mutual_information_bounds(spark):
    """0 <= MI <= H(joint); redundancy is the normalized ratio."""
    r = SPARK_QUERIES["dq_mutual_information"](spark, SF_ORACLE).collect()[0]
    assert 0.0 <= r.mutual_info <= r.h_joint
    assert 0.0 <= r.redundancy <= 1.0


def test_dp_noise_is_laplace_shaped(spark):
    """Noise values are deterministic, nonzero, and bounded by the
    inverse-CDF tail at 32-bit resolution; noisy = true + noise."""
    rows = SPARK_QUERIES["dq_dp_noisy_counts"](spark, SF_ORACLE).collect()
    assert len(rows) == 5
    for r in rows:
        assert abs(r.noisy_count - (r.true_count + r.noise)) < 1e-6
        assert abs(r.noise) < 70.0  # scale 2 * ln(2^32) ~ 44


def test_vit_patches_consistent_with_decode_pool(spark):
    """Cross-operator invariant: the ViT patch grid shares
    multimodal_decode_pool's 4x4-on-16x16 geometry, so each patch_sum
    must equal pooled * (POOL*POOL*255) exactly (pooled is the block
    sum over the same cells, divided by that constant)."""
    from hadoop_digit_recognition_spark.operators.multimodal import POOL

    k = POOL * POOL * 255
    pooled = {(r.doc_id, r.pr, r.pc): r.pooled
              for r in SPARK_QUERIES["multimodal_decode_pool"](
                  spark, SF_ORACLE).collect()}
    patches = SPARK_QUERIES["multimodal_vit_patch_plan"](
        spark, SF_ORACLE).collect()
    assert len(patches) == len(pooled)
    for p in patches:
        assert p.patch_sum == round(pooled[(p.doc_id, p.pos_row,
                                            p.pos_col)] * k), p


def test_rake_phrases_well_formed(spark):
    """Candidate phrases contain no stopwords, respect the length cap,
    and the report is rank-ordered by score with positive scores."""
    from hadoop_digit_recognition_spark.operators.text import (
        _RAKE_MAXLEN, STOPWORDS)

    rows = sorted(SPARK_QUERIES["text_rake_keywords"](
        spark, SF_ORACLE).collect(), key=lambda r: r.rnk)
    assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))
    scores = [r.score_micro for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        words = r.phrase.split(" ")
        assert 1 <= len(words) <= _RAKE_MAXLEN
        assert not set(words) & set(STOPWORDS), r.phrase
        assert r.score_micro > 0 and r.n_occ >= 1


def test_holt_winters_smoothing_state_sane(spark):
    """Every emitted row is past the 2-season seed window, level stays
    positive on a positive series, and the seasonal buffer keeps its
    12-month cadence (t strictly consecutive within each group)."""
    from collections import defaultdict

    rows = SPARK_QUERIES["timeseries_holt_winters"](
        spark, SF_ORACLE).collect()
    assert rows
    per_g = defaultdict(list)
    for r in rows:
        assert r.t > 12
        assert r.level > 0
        per_g[r.o_orderpriority].append(r.t)
    for g, ts in per_g.items():
        ts = sorted(ts)
        assert ts == list(range(ts[0], ts[0] + len(ts))), g


def test_prefixspan_apriori_property(spark):
    """Support is anti-monotone: every reported length-3 pattern's
    length-2 prefix must have support >= the length-3 support (the
    a-priori property PrefixSpan prunes with)."""
    rows = SPARK_QUERIES["events_prefixspan_topk"](
        spark, SF_ORACLE).collect()
    sup2 = {r.pattern: r.support for r in rows if r.length == 2}
    tri = [r for r in rows if r.length == 3]
    assert tri and sup2
    for r in tri:
        prefix = "->".join(r.pattern.split("->")[:2])
        # prefix may have fallen out of the top-10; when present, check
        if prefix in sup2:
            assert sup2[prefix] >= r.support, r


def test_shapley_efficiency_axiom(spark):
    """Exact integer identity: sum of channel Shapley values equals
    v(all channels) - v(empty set), both in scaled micro units —
    holds because the weights and rates never leave the integer grid."""
    from pyspark.sql import functions as F

    from hadoop_digit_recognition_spark.operators.analytics_extra import (
        _SHAP_CHANNELS)
    from hadoop_digit_recognition_spark.tables import load

    rows = SPARK_QUERIES["events_attribution_shapley"](
        spark, SF_ORACLE).collect()
    total = sum(r.shapley_scaled24_micro for r in rows)
    bit = F.lit(0)
    for c, b in _SHAP_CHANNELS:
        bit = F.when(F.col("event_type") == c, b).otherwise(bit)
    cells = {r["mask"]: r["v"]
             for r in load(spark, SF_ORACLE, "events")
             .groupBy("user_id")
             .agg(F.coalesce(F.bit_or(bit), F.lit(0)).alias("mask"),
                  F.max(F.when(F.col("event_type") == "purchase", 1)
                        .otherwise(0)).alias("conv"))
             .groupBy("mask")
             .agg(F.round(1000000.0 * F.sum("conv") / F.count(F.lit(1)))
                  .cast("bigint").alias("v")).collect()}
    full = sum(b for _, b in _SHAP_CHANNELS)
    assert total == 24 * (cells.get(full, 0) - cells.get(0, 0))


def test_curriculum_schedule_monotone(spark):
    """n_available accumulates n_new, the last step covers the corpus,
    and mean pool difficulty never decreases as harder stages enter."""
    from hadoop_digit_recognition_spark.tables import load

    rows = sorted(SPARK_QUERIES["corpus_curriculum_order"](
        spark, SF_ORACLE).collect(), key=lambda r: r.step)
    n_docs = load(spark, SF_ORACLE, "documents").count()
    cum = 0
    prev = -1.0
    for r in rows:
        cum += r.n_new
        assert r.n_available == cum, r
        assert r.pool_mean_difficulty >= prev
        prev = r.pool_mean_difficulty
    assert rows[-1].n_available == n_docs


def test_matrix_profile_motif_symmetry(spark):
    """Exclusion zone respected everywhere; the global motif is mutual
    (if (i*, j*) attains the global minimum SAD, then the profile at
    j* equals that minimum too — d is symmetric)."""
    from collections import defaultdict

    from hadoop_digit_recognition_spark.operators.pandas_udfs import _MP_W

    rows = SPARK_QUERIES["timeseries_matrix_profile_sad"](
        spark, SF_ORACLE).collect()
    assert rows
    per_g = defaultdict(dict)
    for r in rows:
        assert r.mp_sad >= 0
        assert abs(r.i - r.nn_j) >= _MP_W, r
        per_g[r.o_orderpriority][r.i] = (r.mp_sad, r.nn_j)
    for g, prof in per_g.items():
        i_star = min(prof, key=lambda i: (prof[i][0], i))
        d_star, j_star = prof[i_star]
        assert prof[j_star][0] == d_star, (g, i_star, j_star)


def test_markov_stationary_on_simplex(spark):
    """The iterated vector stays a probability distribution (row-
    stochastic P preserves mass exactly up to float round) and every
    state keeps positive mass on this irreducible chain."""
    rows = SPARK_QUERIES["events_markov_stationary"](
        spark, SF_ORACLE).collect()
    assert len(rows) == 5
    assert abs(sum(r.pi for r in rows) - 1.0) < 1e-4
    assert all(r.pi > 0 for r in rows)


def test_landmark_fingerprints_well_formed(spark):
    """Landmarks pair forward in time, respect the fan-out cap, and
    hash into the declared vocabulary."""
    from collections import Counter

    from hadoop_digit_recognition_spark.operators.multimodal import (
        _LM_BITS, _LM_FANOUT)

    rows = SPARK_QUERIES["multimodal_audio_landmark_fingerprint"](
        spark, SF_ORACLE).collect()
    assert rows
    fan = Counter()
    for r in rows:
        assert r.f2 > r.f1
        assert 0 <= r.landmark < 2 ** _LM_BITS
        fan[(r.doc_id, r.f1)] += 1
    assert max(fan.values()) <= _LM_FANOUT


def test_cfd_tableau_shapes(spark):
    """The key-determined probe holds under EVERY condition value (its
    tableau is the full domain); violation magnitudes are nonnegative
    and consistent with the holds flag."""
    rows = SPARK_QUERIES["dq_cfd_discovery"](spark, SF_ORACLE).collect()
    key_rows = [r for r in rows if r.determinant == "c_custkey"]
    assert key_rows and all(r.holds for r in key_rows)
    for r in rows:
        assert r.n_violating_combos >= 0
        assert r.holds == (r.n_violating_combos == 0)


def test_binary_quantization_recall_vs_exact(spark):
    """BQ is an APPROXIMATION — quantify it instead of assuming:
    Hamming distances stay in [0, 64], every rerank candidate comes
    from the declared shortlist, and recall@5 of the BQ pipeline vs
    the exact top-5 must clear a floor (sign-bit codes of 64-dim
    vectors retain real signal)."""
    from hadoop_digit_recognition_spark.operators.similarity import TOP_K

    bq = SPARK_QUERIES["sim_binary_quantization_hamming"](
        spark, SF_ORACLE).collect()
    assert all(0 <= r.hamming <= 64 for r in bq)
    exact = SPARK_QUERIES["sim_topk_cosine"](spark, SF_ORACLE).collect()
    got = {}
    want = {}
    for r in bq:
        got.setdefault(r.qid, set()).add(r.cid)
    for r in exact:
        want.setdefault(r.qid, set()).add(r.cid)
    hits = sum(len(got[q] & want[q]) for q in want)
    recall = hits / (len(want) * TOP_K)
    assert recall >= 0.5, recall


def test_mutual_knn_pairs_are_reciprocal_edges(spark):
    """Every emitted pair must appear in BOTH directions of the base
    kNN graph, ordered va < vb, with the ranks taken from the
    respective directions."""
    edges = {(r.qid, r.cid): r.rnk
             for r in SPARK_QUERIES["sim_knn_graph"](
                 spark, SF_ORACLE).collect()}
    pairs = SPARK_QUERIES["sim_mutual_knn_pairs"](
        spark, SF_ORACLE).collect()
    assert pairs
    for p in pairs:
        assert p.va < p.vb
        assert edges.get((p.va, p.vb)) == p.rnk_ab, p
        assert edges.get((p.vb, p.va)) == p.rnk_ba, p


def test_wordpiece_selection_rule_differs_from_bpe(spark, tmp_path):
    """The likelihood-ratio rule must pick a DIFFERENT round-1 merge
    than raw pair frequency on a corpus built to separate them: the
    most FREQUENT pair uses symbols that are individually very common
    (low ratio), while a rarer pair of rare symbols has the higher
    count/(count_l*count_r). Also pins the exact integer score."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hadoop_digit_recognition_spark.all_queries import SPARK_QUERIES

    # "ax" x 30 inflates count(a) and count(x); pair (a,x) cnt=30.
    # "bc" x 9: count(b)=count(c)=9, pair (b,c) cnt=9.
    # BPE picks (a,x): 30 > 9. WordPiece picks (b,c):
    #   score(a,x) = 30/(30*30) = 1/30; score(b,c) = 9/81 = 1/9.
    texts = ["ax"] * 30 + ["bc"] * 9
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * len(texts)),
        "source": pa.array(["s"] * len(texts)),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    d = str(tmp_path)
    pq.write_table(tbl, f"{d}/documents.parquet")

    wp = sorted(SPARK_QUERIES["text_wordpiece_train"](spark, d).collect(),
                key=lambda r: r.round)
    bpe = sorted(SPARK_QUERIES["text_bpe_merge_train"](spark, d).collect(),
                 key=lambda r: r.round)
    assert (bpe[0].lhs, bpe[0].rhs) == ("a", "x")
    assert (wp[0].lhs, wp[0].rhs) == ("b", "c")
    assert wp[0].pair_count == 9
    assert wp[0].score_e12 == 1_000_000_000_000 * 9 // (9 * 9)


def test_wordpiece_invariants(spark):
    """Rounds are consecutive from 1; scores sit on (0, 1e12] (cnt <=
    min(count_l, count_r) forces ratio <= 1); every merged symbol is
    the concatenation of its parts; counts are positive."""
    from hadoop_digit_recognition_spark.all_queries import SPARK_QUERIES

    rows = sorted(SPARK_QUERIES["text_wordpiece_train"](
        spark, SF_ORACLE).collect(), key=lambda r: r.round)
    assert [r.round for r in rows] == list(range(1, len(rows) + 1))
    assert rows, "wordpiece produced no merges at sf0.01"
    vocab_new = set()
    for r in rows:
        assert 0 < r.score_e12 <= 1_000_000_000_000, r
        assert r.pair_count > 0
        vocab_new.add(r.lhs + r.rhs)
    # later rounds may only reference single chars or previously merged
    # tokens (the state is built strictly by these merges)
    for r in rows:
        for side in (r.lhs, r.rhs):
            assert len(side) == 1 or side in vocab_new, r


def test_mann_kendall_invariants(spark):
    """|S| <= C(n,2); var_s_x18 matches the closed form minus tie
    terms (non-negative, zero only when S = 0); z's sign agrees with
    S; and the MK trend direction never contradicts the Theil-Sen
    slope sign on the same monthly series (both are sign-of-pairs
    statistics)."""
    from hadoop_digit_recognition_spark.all_queries import SPARK_QUERIES

    mk = {r.o_orderpriority: r for r in
          SPARK_QUERIES["timeseries_mann_kendall"](
              spark, SF_ORACLE).collect()}
    sen = {r.o_orderpriority: r for r in
           SPARK_QUERIES["timeseries_theil_sen"](
               spark, SF_ORACLE).collect()}
    assert mk and set(mk) == set(sen)
    for grp, r in mk.items():
        n = r.n_points
        assert abs(r.s_stat) <= n * (n - 1) // 2
        assert r.var_s_x18 >= 0
        assert (r.var_s_x18 == 0) <= (r.s_stat == 0)
        if r.s_stat > 0:
            assert r.z_mk >= 0
        if r.s_stat < 0:
            assert r.z_mk <= 0
        if r.trend == "increasing":
            assert sen[grp].sen_slope >= 0, (grp, r, sen[grp])
        if r.trend == "decreasing":
            assert sen[grp].sen_slope <= 0, (grp, r, sen[grp])


def test_kalman_level_invariants(spark):
    """The gain ADAPTS: k is 0 at init, jumps high at step 2 (p = R
    after init), then decreases monotonically toward the steady-state
    Riccati gain; p converges to p_inf = (sqrt(Q^2+4QR)-Q)/2; the
    filtered level stays inside the observed range (convex combination,
    +/- 1 micro truncation)."""
    import math

    from hadoop_digit_recognition_spark.all_queries import SPARK_QUERIES
    from hadoop_digit_recognition_spark.operators.pandas_udfs import (
        _KAL_N, _KAL_Q, _KAL_R)

    rows = SPARK_QUERIES["timeseries_kalman_level"](
        spark, SF_ORACLE).collect()
    by_grp = {}
    for r in rows:
        by_grp.setdefault(r.o_orderpriority, []).append(r)
    assert by_grp
    p_inf = (math.sqrt(_KAL_Q ** 2 + 4 * _KAL_Q * _KAL_R) - _KAL_Q) / 2
    for grp, rs in by_grp.items():
        rs.sort(key=lambda r: r.m)
        assert [r.m for r in rs] == list(range(1, _KAL_N + 1))
        ks = [r.k_e6 for r in rs]
        assert ks[0] == 0 and rs[0].p_e6 == _KAL_R
        assert all(0 <= k <= 1_000_000 for k in ks)
        # monotone non-increasing gain from step 2 on (constant Q, R)
        assert all(a >= b for a, b in zip(ks[1:], ks[2:])), (grp, ks)
        assert abs(rs[-1].p_e6 - p_inf) < 0.05 * p_inf, (grp, rs[-1].p_e6)
        zs = [r.z for r in rs]
        for r in rs:
            assert (min(zs) * 1_000_000 - 1 <= r.x_e6
                    <= max(zs) * 1_000_000 + 1), (grp, r)


def test_kalman_drops_incomplete_profiles_both_engines(spark, tmp_path):
    """Missing-month fixture (the DTW lesson applied on arrival): a
    priority class missing a calendar month must drop from BOTH
    engines — the oracle via HAVING count(*)=12, Spark via the
    complete-profile join; negative innovations exercise the
    trunc-vs-floor division edge on both sides."""
    import duckdb
    from pyspark.sql import functions as F

    sf = str(tmp_path)
    orders, ok = [], 0
    for pri, base in (("1-URGENT", 50), ("2-HIGH", 9)):
        for m in range(1, 13):
            if pri == "2-HIGH" and m == 7:
                continue
            # alternating counts -> innovations flip sign every month
            n = base + (7 if m % 2 else -5)
            for _ in range(n):
                orders.append((ok, pri, f"1997-{m:02d}-11"))
                ok += 1
    df = spark.createDataFrame(
        orders, "o_orderkey bigint, o_orderpriority string, "
                "o_orderdate string"
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("date"))
    df.coalesce(1).write.mode("overwrite").parquet(f"{sf}/orders.parquet")

    srows = {(r.o_orderpriority, r.m): (r.z, r.x_e6, r.k_e6, r.p_e6)
             for r in SPARK_QUERIES["timeseries_kalman_level"](
                 spark, sf).collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS "
                f"SELECT * FROM '{sf}/orders.parquet/*.parquet'")
    orows = {(r[0], r[1]): (r[2], r[3], r[4], r[5]) for r in
             con.sql(ORACLE_SQL["timeseries_kalman_level"]).fetchall()}
    assert {g for g, _ in srows} == {"1-URGENT"}, srows
    assert srows == orows


def test_chi_square_invariants(spark):
    """chi2 >= 0; V in [0, 1]; dof = (r-1)(k-1) = 8 for the 5x3
    priority x status table; verdict agrees with the embedded critical
    value; and a from-scratch NumPy chi-square on the collected
    contingency table agrees to 1e-4."""
    import numpy as np

    from hadoop_digit_recognition_spark.all_queries import SPARK_QUERIES
    from hadoop_digit_recognition_spark.operators.dataquality import (
        _CHI2_CRIT_5PCT)
    from hadoop_digit_recognition_spark.tables import load

    r = SPARK_QUERIES["dq_chi_square_cramers_v"](
        spark, SF_ORACLE).collect()[0]
    assert r.chi2 >= 0 and 0.0 <= r.cramers_v <= 1.0
    assert r.dof == 8
    assert r.dependent_5pct == (r.chi2 > _CHI2_CRIT_5PCT[r.dof])

    cells = (load(spark, SF_ORACLE, "orders")
             .groupBy("o_orderpriority", "o_orderstatus").count().collect())
    pris = sorted({c.o_orderpriority for c in cells})
    sts = sorted({c.o_orderstatus for c in cells})
    o = np.zeros((len(pris), len(sts)))
    for c in cells:
        o[pris.index(c.o_orderpriority), sts.index(c.o_orderstatus)] = c[2]
    e = o.sum(1, keepdims=True) * o.sum(0, keepdims=True) / o.sum()
    chi2 = ((o - e) ** 2 / e).sum()
    assert abs(chi2 - r.chi2) < 1e-4, (chi2, r.chi2)


def test_chi_square_degenerate_single_category_drops(spark, tmp_path):
    """A single-valued status column (dof 0) must produce ZERO rows on
    both engines — the mirrored r>1 AND k>1 guard (V would divide by
    zero)."""
    import duckdb

    from hadoop_digit_recognition_spark.all_queries import (
        ORACLE_SQL, SPARK_QUERIES)

    sf = str(tmp_path)
    rows = [(i, f"{1 + i % 5}-PRI", "O") for i in range(50)]
    df = spark.createDataFrame(
        rows, "o_orderkey bigint, o_orderpriority string, "
              "o_orderstatus string")
    df.coalesce(1).write.mode("overwrite").parquet(f"{sf}/orders.parquet")
    assert SPARK_QUERIES["dq_chi_square_cramers_v"](spark, sf).count() == 0
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS "
                f"SELECT * FROM '{sf}/orders.parquet/*.parquet'")
    assert len(con.sql(ORACLE_SQL["dq_chi_square_cramers_v"]).fetchall()) == 0


def test_sprt_invariants(spark):
    """Per arm: stop_n <= n_obs; the LLR at the stop row sits ON or
    BEYOND the crossed boundary while every earlier cumulative LLR sits
    strictly inside both boundaries (recomputed from scratch from the
    event stream); the decision labels the crossed side."""
    import math

    from hadoop_digit_recognition_spark.all_queries import SPARK_QUERIES
    from hadoop_digit_recognition_spark.operators.analytics_extra import (
        _SPRT_P0, _SPRT_P1)
    from hadoop_digit_recognition_spark.tables import load

    inc1 = round(math.log(_SPRT_P1 / _SPRT_P0) * 1e6)
    inc0 = round(math.log((1 - _SPRT_P1) / (1 - _SPRT_P0)) * 1e6)
    a_up = round(math.log(0.95 / 0.05) * 1e6)
    b_lo = round(math.log(0.05 / 0.95) * 1e6)

    out = {r.arm: r for r in SPARK_QUERIES["ab_sequential_sprt"](
        spark, SF_ORACLE).collect()}
    assert set(out) == {0, 1}

    ev = (load(spark, SF_ORACLE, "events")
          .select("user_id", "ts", "event_id", "event_type").collect())
    import hashlib
    streams = {0: [], 1: []}
    for e in ev:
        arm = int(hashlib.md5(str(e.user_id).encode())
                  .hexdigest()[:8], 16) % 2
        streams[arm].append((e.ts, e.event_id,
                             1 if e.event_type == "purchase" else 0))
    for arm, r in out.items():
        xs = [x for _, _, x in sorted(streams[arm])]
        assert r.n_obs == len(xs) and r.n_conv == sum(xs)
        llr, stop = 0, None
        for i, x in enumerate(xs, 1):
            llr += inc1 if x else inc0
            if llr >= a_up or llr <= b_lo:
                stop = (i, llr)
                break
        if stop is None:
            assert r.decision == "continue" and r.stop_n is None
        else:
            assert (r.stop_n, r.llr_stop_micro) == stop
            assert r.decision == (
                "accept_h1" if stop[1] >= a_up else "accept_h0")


def test_lof_from_scratch_replay(spark):
    """Recompute LOF in pure Python from the collected kNN edges (same
    S1 ⊇ S2 ⊇ S3 closure, same integer formulas) and compare the full
    top-50; inlier scores concentrate near 1.0 (lof_micro ~ 1e6) while
    the top outlier must exceed it."""
    from hadoop_digit_recognition_spark.all_queries import SPARK_QUERIES
    from hadoop_digit_recognition_spark.operators.similarity import (
        _LOF_TOP, KNN_K)

    got = [(r.vec_id, r.lof_micro, r.rnk) for r in
           SPARK_QUERIES["sim_lof_outliers"](spark, SF_ORACLE).collect()]
    edges = {}
    for r in SPARK_QUERIES["sim_knn_graph"](spark, SF_ORACLE).collect():
        d = max(1, round((1 - r.cos) * 1_000_000))
        edges.setdefault(r.qid, []).append((r.rnk, r.cid, d))
    s1 = {q for q, es in edges.items() if len(es) == KNN_K}
    kd = {q: max(d for _, _, d in edges[q]) for q in s1}
    s2 = {q for q in s1 if all(c in s1 for _, c, _ in edges[q])}
    lrd_inv = {q: sum(max(kd[c], d) for _, c, d in edges[q]) for q in s2}
    s3 = {q for q in s2 if all(c in s2 for _, c, _ in edges[q])}
    lof = {q: sum(lrd_inv[q] * 1_000_000 // lrd_inv[c]
                  for _, c, _ in edges[q]) // KNN_K for q in s3}
    want = sorted(lof.items(), key=lambda kv: (-kv[1], kv[0]))[:_LOF_TOP]
    assert [(v, s) for v, s, _ in got] == want
    assert [r[2] for r in got] == list(range(1, len(got) + 1))
    assert got[0][1] > 1_000_000  # a genuine outlier exists
    # the k-dist max is the rank-k edge (cos sorted desc): sanity
    for q in list(s1)[:20]:
        assert kd[q] == edges[q][-1][2] or kd[q] == max(
            d for _, _, d in edges[q])


def test_hmm_viterbi_invariants(spark):
    """Every decoded path: length 8, binary alphabet; the path's own
    log-likelihood (init + transitions + emissions recomputed from the
    collected stream) equals score_micro EXACTLY — the Viterbi score
    is the decoded path's score, not just an upper bound; and the
    decoded path's score is >= the all-zeros path's score (optimality
    spot check)."""
    import math

    from hadoop_digit_recognition_spark.all_queries import SPARK_QUERIES
    from hadoop_digit_recognition_spark.operators.pandas_udfs import (
        _HMM_A, _HMM_B, _HMM_N, _HMM_PI)
    from hadoop_digit_recognition_spark.tables import load

    lpi = [round(math.log(p) * 1e6) for p in _HMM_PI]
    la = [[round(math.log(_HMM_A[i][j]) * 1e6) for j in range(2)]
          for i in range(2)]
    lb = {k: (round(math.log(v[0]) * 1e6), round(math.log(v[1]) * 1e6))
          for k, v in _HMM_B.items()}

    out = {r.user_id: r for r in SPARK_QUERIES["events_hmm_viterbi"](
        spark, SF_ORACLE).collect()}
    assert out
    ev = (load(spark, SF_ORACLE, "events")
          .select("user_id", "ts", "event_id", "event_type").collect())
    streams = {}
    for e in ev:
        streams.setdefault(e.user_id, []).append(
            (e.ts, e.event_id, e.event_type))

    def path_score(types, path):
        s = lpi[path[0]] + lb[types[0]][path[0]]
        for t in range(1, len(types)):
            s += la[path[t - 1]][path[t]] + lb[types[t]][path[t]]
        return s

    for uid, r in list(out.items())[:40]:
        assert len(r.path) == _HMM_N and set(r.path) <= {"0", "1"}
        types = [t for _, _, t in sorted(streams[uid])[:_HMM_N]]
        decoded = [int(c) for c in r.path]
        assert path_score(types, decoded) == r.score_micro, (uid, r)
        assert r.score_micro >= path_score(types, [0] * _HMM_N)


def test_bleu_pairs_invariants(spark):
    """BLEU-2 in [0, 1]; clipped matches never exceed totals or the
    reference's gram budget; near-dup minhash pairs (jaccard ~ 1)
    score high; and a from-scratch BLEU on one collected pair agrees
    exactly."""
    import math
    from collections import Counter

    from hadoop_digit_recognition_spark.all_queries import SPARK_QUERIES
    from hadoop_digit_recognition_spark.tables import load

    rows = SPARK_QUERIES["text_bleu_pairs"](spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.bleu2 <= 1.0
        assert 0 <= r.match1 <= r.total1
        assert 0 <= r.match2 <= max(r.total2, 0)
    # LSH pairs are >= 0.9 jaccard here: BLEU should be high too
    assert sum(r.bleu2 > 0.8 for r in rows) / len(rows) > 0.8

    r = rows[0]
    texts = {d.doc_id: d.text for d in
             load(spark, SF_ORACLE, "documents")
             .filter(f"doc_id IN ({r.doc_a}, {r.doc_b})").collect()}
    wa = [w for w in texts[r.doc_a].split(" ") if w]
    wb = [w for w in texts[r.doc_b].split(" ") if w]

    def prec(n):
        ca = Counter(tuple(wa[i:i + n]) for i in range(len(wa) - n + 1))
        cb = Counter(tuple(wb[i:i + n]) for i in range(len(wb) - n + 1))
        return (sum(min(c, ca[g]) for g, c in cb.items()),
                sum(cb.values()))
    m1, t1 = prec(1)
    m2, t2 = prec(2)
    assert (r.match1, r.total1, r.match2, r.total2) == (m1, t1, m2, t2)
    bp = math.exp(1 - len(wa) / len(wb)) if len(wb) < len(wa) else 1.0
    want = 0.0 if m1 == 0 or m2 == 0 else bp * math.sqrt(
        (m1 / t1) * (m2 / t2))
    assert abs(r.bleu2 - round(want, 6)) < 1e-9


def test_ssim_pairs_invariants(spark):
    """ssim_e6 in [-1e6, 1e6]; ssim_e6 = 1e6 iff l2_sq = 0 (identical
    rasters); and a from-scratch float SSIM on each pair's decoded
    rasters agrees with the integer-grid value to 1 micro."""
    import numpy as np

    from hadoop_digit_recognition_spark.all_queries import SPARK_QUERIES
    from hadoop_digit_recognition_spark.operators.multimodal import (
        _SSIM_N)
    from hadoop_digit_recognition_spark.tables import load

    rows = SPARK_QUERIES["multimodal_ssim_pairs"](
        spark, SF_ORACLE).collect()
    assert rows
    texts = {d.doc_id: d.text for d in
             load(spark, SF_ORACLE, "documents").collect()}

    def raster(doc_id):
        raw = np.frombuffer(
            texts[doc_id].encode()[:_SSIM_N], dtype=np.uint8)
        return np.pad(raw, (0, _SSIM_N - raw.size)).astype(np.float64)

    c1, c2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
    for r in rows:
        assert -1_000_000 <= r.ssim_e6 <= 1_000_000
        assert (r.ssim_e6 == 1_000_000) == (r.l2_sq == 0), r
        x, y = raster(r.doc_a), raster(r.doc_b)
        mx, my = x.mean(), y.mean()
        vx, vy = x.var(), y.var()
        cxy = ((x - mx) * (y - my)).mean()
        want = ((2 * mx * my + c1) * (2 * cxy + c2)
                / ((mx ** 2 + my ** 2 + c1) * (vx + vy + c2)))
        assert abs(r.ssim_e6 / 1e6 - want) < 2e-6, (r, want)
        assert r.l2_sq == int(((x - y) ** 2).sum())


def test_ddsketch_error_bound_and_merge(spark):
    """The DDSketch GUARANTEE holds: |est/exact - 1| <= alpha for every
    (type, q); and the sketch is MERGEABLE — bucket tables built on two
    disjoint halves of the data, added bucket-wise, equal the global
    bucket table (the property that makes it one combiner'd shuffle at
    any scale)."""
    import math
    from collections import Counter

    from hadoop_digit_recognition_spark.all_queries import SPARK_QUERIES
    from hadoop_digit_recognition_spark.operators.sketches import (
        _DD_ALPHA, _DD_GAMMA)
    from hadoop_digit_recognition_spark.tables import load

    rows = SPARK_QUERIES["sketch_ddsketch_quantiles"](
        spark, SF_ORACLE).collect()
    assert len(rows) == 15  # 5 types x 3 quantiles
    for r in rows:
        assert abs(r.est_v / r.exact_v - 1) <= _DD_ALPHA, r
        assert r.n_nonpos == 0

    vals = [(e.event_type, e.value, e.event_id) for e in
            load(spark, SF_ORACLE, "events")
            .select("event_type", "value", "event_id").collect()
            if e.value > 0]

    def bucket_table(subset):
        return Counter(
            (t, math.ceil(math.log(v) / math.log(_DD_GAMMA)))
            for t, v, _ in subset)
    half_a = [x for x in vals if x[2] % 2 == 0]
    half_b = [x for x in vals if x[2] % 2 == 1]
    merged = bucket_table(half_a) + bucket_table(half_b)
    assert merged == bucket_table(vals)


def test_cdc_shift_resistance(spark, tmp_path):
    """THE content-defined property: inserting one word into the middle
    of a long document must leave every chunk outside the edited one
    intact — fixed-size blocking would shift every downstream block.
    Two docs (original + 1-word insertion) must share all chunk hashes
    except the edited chunk's, and the report must surface the shared
    extents."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from hadoop_digit_recognition_spark.all_queries import SPARK_QUERIES
    from hadoop_digit_recognition_spark.operators.dedup import (
        _CDC_D, _CDC_MIN)

    words = ["spark", "table", "row", "scan", "join", "hash", "sort",
             "merge", "group", "filter", "value", "key", "batch",
             "query", "column", "stream"]
    base = [words[(7 * i + 3) % len(words)] for i in range(120)]
    edited = base[:60] + ["INSERTED"] + base[60:]
    texts = [" ".join(base), " ".join(edited)]
    tbl = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en", "en"]),
        "source": pa.array(["s", "s"]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    d = str(tmp_path)
    pq.write_table(tbl, f"{d}/documents.parquet")

    def chunks(toks):
        out, cur = [], []
        for w in toks:
            cur.append(w)
            if int(hashlib.md5(w.encode()).hexdigest()[:8], 16) \
                    % _CDC_D == 0:
                out.append(" ".join(cur))
                cur = []
        if cur:
            out.append(" ".join(cur))
        return out
    ca, cb = set(chunks(base)), set(chunks(edited))
    shared = ca & cb
    assert len(ca - cb) <= 1 and len(cb - ca) <= 1  # only the edited chunk
    assert len(shared) >= len(ca) - 1

    rows = SPARK_QUERIES["dedup_cdc_chunks"](spark, d).collect()
    got = {r.chunk_hash for r in rows}
    want = {hashlib.md5(c.encode()).hexdigest()
            for c in shared if len(c.split(" ")) >= _CDC_MIN}
    assert want <= got, (want - got)
    for r in rows:
        assert r.n_docs == 2 and r.keep_doc == 0


def test_tokenizer_bakeoff_invariants(spark):
    """All three tokenizers score the SAME word domain (equal n_words
    and total_freq); fertility is at least 1 token/word and at most
    the character bound; and the unigram branch agrees with the
    registered Viterbi segmentation's own weighted piece count."""
    from hadoop_digit_recognition_spark.all_queries import SPARK_QUERIES

    rows = {r.tokenizer: r for r in
            SPARK_QUERIES["corpus_tokenizer_bakeoff"](
                spark, SF_ORACLE).collect()}
    assert set(rows) == {"bpe", "wordpiece", "unigram"}
    n_words = {r.n_words for r in rows.values()}
    total_freq = {r.total_freq for r in rows.values()}
    assert len(n_words) == 1 and len(total_freq) == 1
    for r in rows.values():
        assert 1_000_000 <= r.fertility_micro
        assert r.total_tokens >= r.total_freq
    seg = SPARK_QUERIES["text_unigram_viterbi_segment"](
        spark, SF_ORACLE).collect()
    want = sum(s.freq * s.n_pieces for s in seg)
    assert rows["unigram"].total_tokens == want


def test_snm_two_phase_rank_and_cross_bucket_window(spark, tmp_path):
    """The SNM decomposition's two claims: (1) first-char range buckets
    + offset prefix sum reproduce the FLAT (nkey, doc_id) row_number —
    asserted implicitly by oracle parity on a corpus whose keys span
    multiple buckets; (2) the rank-join pairing crosses bucket
    boundaries, the edge a per-bucket window would miss: a near-dup
    pair whose normalized keys start with DIFFERENT characters must
    still be emitted when adjacent in the global sort."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hadoop_digit_recognition_spark.all_queries import (
        ORACLE_SQL, SPARK_QUERIES)
    from .oracle_harness import compare

    texts = [
        "apple table scan join hash",      # bucket 'a', sorts last in 'a'
        "banana table scan join hash",     # bucket 'b', sorts first in 'b'
        "apple row scan join hash",        # same bucket near-dup
        "zebra sort merge group filter",   # far bucket, no pair
        "table scan join hash apple",      # bucket 't'
    ]
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * len(texts)),
        "source": pa.array(["s"] * len(texts)),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    d = str(tmp_path)
    pq.write_table(tbl, f"{d}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
    df = SPARK_QUERIES["dedup_sorted_neighborhood"](spark, d)
    compare(df, con, ORACLE_SQL["dedup_sorted_neighborhood"], "snm:small")
    rows = {(r["doc_a"], r["doc_b"]): r["jacc_e6"] for r in df.collect()}
    # cross-bucket: doc 0 ('apple...') and doc 1 ('banana...') are rank
    # neighbors across the 'a'/'b' boundary and share 4 of 6 set words
    assert (0, 1) in rows and rows[(0, 1)] == 1000000 * 4 // 6
    # same-bucket near-dup (one-word edit) caught at 4/6
    assert (0, 2) in rows


def test_blocklist_phrase_word_boundary(spark, tmp_path):
    """The phrase rule must match token-adjacent 'slow scan' only: a
    doc where 'scan' is a PREFIX of the next token ('scanner') or the
    phrase spans a third token must not be blocked; term hits and
    phrase hits count independently."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hadoop_digit_recognition_spark.all_queries import (
        ORACLE_SQL, SPARK_QUERIES)
    from .oracle_harness import compare

    texts = [
        "the slow scan hits here",       # phrase hit
        "the slow scanner is fine",      # NOT a phrase hit
        "slow table scan is fine too",   # NOT adjacent -> no hit
        "a dup word trips the terms",    # term hit only
        "Slow Scan uppercase hits",      # case-folded phrase hit
    ]
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * len(texts)),
        "source": pa.array(["s"] * len(texts)),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    d = str(tmp_path)
    pq.write_table(tbl, f"{d}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
    df = SPARK_QUERIES["corpus_blocklist_filter"](spark, d)
    compare(df, con, ORACLE_SQL["corpus_blocklist_filter"], "blocklist:wb")
    r = df.collect()[0]
    assert r["n_docs"] == 5
    assert r["n_phrase_hits"] == 2      # docs 0 and 4 only
    assert r["n_term_hits"] == 1        # doc 3 only
    assert r["n_blocked"] == 3


def test_nndescent_round_never_worsens_graph(spark):
    """NN-Descent's core invariant: keeping the per-node top-k of
    old-edges UNION proposals can only improve (or keep) each node's
    k-th best similarity. Every node present in both graphs must have
    new min(cos) >= old min(cos), and every improved node must carry at
    least one is_new edge."""
    from hadoop_digit_recognition_spark.all_queries import SPARK_QUERIES

    old = SPARK_QUERIES["sim_knn_graph"](spark, SF_ORACLE).collect()
    new = SPARK_QUERIES["sim_nndescent_round"](spark, SF_ORACLE).collect()
    import collections
    omin = collections.defaultdict(lambda: 2.0)
    for r in old:
        omin[r["qid"]] = min(omin[r["qid"]], r["cos"])
    nmin = collections.defaultdict(lambda: 2.0)
    has_new = collections.defaultdict(bool)
    for r in new:
        nmin[r["qid"]] = min(nmin[r["qid"]], r["cos"])
        has_new[r["qid"]] |= r["is_new"]
    assert set(nmin) == set(omin)
    improved = 0
    for q in omin:
        assert nmin[q] >= omin[q] - 1e-12, f"node {q} worsened"
        if nmin[q] > omin[q]:
            improved += 1
            assert has_new[q], f"node {q} improved without a new edge"
    # the LSH seed graph is imperfect at sf0.01, so a round must
    # actually find something (the algorithm's reason to exist)
    assert improved > 0


def test_nndescent_recall_curve_monotone_and_converging(spark):
    """The iterated FULL refinement's contract (VERDICT r09 ask #5,
    r10 ask #2): recall is NON-DECREASING per round (the measured
    top-k is ranked over a pool containing the previous working graph,
    and a truth edge can only be displaced by a strictly-better edge —
    at most k-1 exist), the curve must actually RISE from the 0.178
    base, and — the round-11 ceiling fix — the converged plateau must
    clear 0.5 (reverse-neighbor proposals + working width k'=16;
    measured 0.989 at sf0.01 where the forward-only form saturated at
    0.233). Acceptance never needs to decay monotonically (working
    width lets mid-curve rounds accept MORE as exploration opens up),
    but the curve must converge: the final round accepts fewer edges
    than the peak round."""
    from hadoop_digit_recognition_spark.all_queries import SPARK_QUERIES
    from hadoop_digit_recognition_spark.operators.similarity import (
        _NND_ROUNDS)

    rows = sorted(
        (r["round"], r["n_new_edges"], r["n_hit"], r["recall_e6"])
        for r in SPARK_QUERIES["sim_nndescent_recall_curve"](
            spark, SF_ORACLE).collect())
    assert [r[0] for r in rows] == list(range(_NND_ROUNDS + 1))
    recalls = [r[3] for r in rows]
    assert all(b >= a for a, b in zip(recalls, recalls[1:])), recalls
    assert recalls[-1] > recalls[0], recalls   # refinement must help
    assert recalls[-1] >= 500000, recalls      # the r10 ceiling, fixed
    assert rows[0][1] == 0                      # base round adds nothing
    assert rows[1][1] > 0                       # round 1 accepts edges
    peak = max(r[1] for r in rows)
    assert rows[-1][1] < peak, rows             # acceptance converges


def test_changepoint_binseg_finds_known_step(spark, tmp_path):
    """A planted level shift must be recovered exactly: 4 months at ~5
    orders then 4 months at ~20 gives tau = 4; a single-month nation
    has no valid split and must drop identically on both engines."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq
    from datetime import datetime

    from hadoop_digit_recognition_spark.all_queries import (
        ORACLE_SQL, SPARK_QUERIES)
    from .oracle_harness import compare

    # nation/customer scaffolding: two nations, one customer each
    nat = pa.table({"n_nationkey": pa.array([0, 1], pa.int64()),
                    "n_name": pa.array(["STEPLAND", "ONEMONTH"]),
                    "n_regionkey": pa.array([0, 0], pa.int64()),
                    "n_comment": pa.array(["", ""])})
    cust = pa.table({"c_custkey": pa.array([1, 2], pa.int64()),
                     "c_nationkey": pa.array([0, 1], pa.int64())})
    rows = []
    ok = 0
    for mo in range(8):                      # STEPLAND: 5,5,5,5,20,20,20,20
        cnt = 5 if mo < 4 else 20
        for _ in range(cnt):
            rows.append((ok, 1, datetime(2024, mo + 1, 15))); ok += 1
    rows.append((ok, 2, datetime(2024, 1, 15))); ok += 1   # ONEMONTH: n=1
    orders = pa.table({
        "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
        "o_orderdate": pa.array([r[2] for r in rows],
                                pa.timestamp("us"))})
    d = str(tmp_path)
    pq.write_table(nat, f"{d}/nation.parquet")
    pq.write_table(cust, f"{d}/customer.parquet")
    pq.write_table(orders, f"{d}/orders.parquet")
    con = duckdb.connect()
    for t in ("nation", "customer", "orders"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")
    df = SPARK_QUERIES["timeseries_changepoint_binseg"](spark, d)
    compare(df, con, ORACLE_SQL["timeseries_changepoint_binseg"],
            "binseg:step")
    got = {r["grp"]: r for r in df.collect()}
    assert set(got) == {"STEPLAND"}          # n=1 group dropped
    assert got["STEPLAND"]["tau"] == 4
    assert got["STEPLAND"]["sum_left"] == 20
    assert got["STEPLAND"]["gain_e6"] > 0


def test_sinkhorn_rebalance_marginals_converge(spark):
    """Two raking sweeps must already equalize the LAST-fitted axis
    essentially exactly (the final col step fixes lang marginals up to
    integer rounding) and pull the source axis well toward uniform:
    every lang's effective mass within 0.1% of N*1e6/n_langs, every
    source's within 5%, and total mass conserved within rounding."""
    from collections import defaultdict

    from hadoop_digit_recognition_spark.all_queries import SPARK_QUERIES

    rows = SPARK_QUERIES["corpus_sinkhorn_rebalance"](
        spark, SF_ORACLE).collect()
    n = sum(r["n_docs"] for r in rows)
    langs, sources = defaultdict(int), defaultdict(int)
    for r in rows:
        langs[r["lang"]] += r["eff_micro"]
        sources[r["source"]] += r["eff_micro"]
    lt = n * 1_000_000 / len(langs)
    st = n * 1_000_000 / len(sources)
    for v in langs.values():
        assert abs(v - lt) / lt < 1e-3
    for v in sources.values():
        assert abs(v - st) / st < 0.05
    total = sum(langs.values())
    assert abs(total - n * 1_000_000) / (n * 1_000_000) < 1e-3


def test_graph_recall_eval_bounds_and_floor(spark):
    """Recall rows must be well-formed (0 <= n_hit <= k, recall_e6 the
    exact integer ratio) and the two-table adaptive graph must clear a
    recall floor on the standard fixture — the connectivity trick's
    measurable payoff (a single-table build was measured near zero)."""
    from hadoop_digit_recognition_spark.all_queries import SPARK_QUERIES
    from hadoop_digit_recognition_spark.operators.similarity import KNN_K

    rows = SPARK_QUERIES["sim_graph_recall_eval"](
        spark, SF_ORACLE).collect()
    assert len(rows) == 30
    for r in rows:
        assert 0 <= r["n_hit"] <= KNN_K
        assert r["recall_e6"] == 1000000 * r["n_hit"] // KNN_K
    mean_recall = sum(r["n_hit"] for r in rows) / (len(rows) * KNN_K)
    # measured 0.178 at sf0.01 — the number NN-Descent exists to raise;
    # the floor only pins "didn't collapse to the single-table ~0.01"
    assert mean_recall >= 0.08, f"graph recall collapsed: {mean_recall}"

    # the refinement round must measurably close the gap: recompute
    # recall of sim_nndescent_round's edges against numpy exact truth
    import numpy as np

    from hadoop_digit_recognition_spark.tables import load

    emb = load(spark, SF_ORACLE, "embeddings").select(
        "vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in emb])
    mat = np.array([r["embedding"] for r in emb], dtype=np.float64)
    nrm = np.sqrt((mat * mat).sum(axis=1))
    keep = nrm > 0
    ids, mat, nrm = ids[keep], mat[keep], nrm[keep]
    cosm = (mat @ mat.T) / np.outer(nrm, nrm)
    truth = {}
    for qi, q in enumerate(ids):
        if q >= 30:
            continue
        cos = np.round(cosm[qi], 6)
        order = sorted((( -cos[ci], ids[ci]) for ci in range(len(ids))
                        if ids[ci] != q))
        truth[q] = {c for _, c in order[:KNN_K]}
    refined = SPARK_QUERIES["sim_nndescent_round"](
        spark, SF_ORACLE).collect()
    rhit = sum(1 for r in refined
               if r["qid"] in truth and r["cid"] in truth[r["qid"]])
    refined_recall = rhit / (len(truth) * KNN_K)
    assert refined_recall >= mean_recall, (
        f"NN-Descent round reduced recall: {mean_recall} -> "
        f"{refined_recall}")


def test_license_propagation_invariants(spark):
    """Per-cluster governance invariants: the max-rank member is never
    'upgraded' (so n_upgraded < n_members), eff_license names the
    eff_rank class, and clusters have >= 2 members by construction
    (CC emits only docs appearing in some verified pair)."""
    from hadoop_digit_recognition_spark.all_queries import SPARK_QUERIES
    from hadoop_digit_recognition_spark.operators.corpus_hygiene import (
        _LIC_NAMES)

    rows = SPARK_QUERIES["corpus_license_propagation"](
        spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert r["n_members"] >= 2
        assert 0 <= r["n_upgraded"] < r["n_members"]
        assert r["eff_license"] == _LIC_NAMES[r["eff_rank"]]


def test_block_motion_recovers_planted_shift(spark, tmp_path):
    """A frame pair constructed as an exact 1-byte pan must be
    recovered at best_shift = 1 with mad_e6 = 0; a static pair must
    land at shift 0 with mad 0 (the zero-motion bias); both engines
    must agree cell-for-cell on the fixture."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hadoop_digit_recognition_spark.all_queries import (
        ORACLE_SQL, SPARK_QUERIES)
    from hadoop_digit_recognition_spark.operators.multimodal import FRAME
    from .oracle_harness import compare

    # non-periodic printable base pattern, 3 frames:
    # frame1[i] = frame0[i+1] (a pan of +1); frame2 == frame1 (static)
    base = "".join(chr(33 + (7 * i) % 90) for i in range(FRAME + 1))
    f0 = base[:FRAME]
    f1 = base[1:FRAME + 1]
    texts = [f0 + f1 + f1]
    tbl = pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"]),
        "source": pa.array(["s"]),
        "n_chars": pa.array([len(texts[0])], pa.int64()),
    })
    d = str(tmp_path)
    pq.write_table(tbl, f"{d}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
    df = SPARK_QUERIES["multimodal_block_motion"](spark, d)
    compare(df, con, ORACLE_SQL["multimodal_block_motion"],
            "motion:planted")
    got = {r["frame_id"]: r for r in df.collect()}
    assert got[0]["best_shift"] == 1 and got[0]["mad_e6"] == 0
    assert got[1]["best_shift"] == 0 and got[1]["mad_e6"] == 0


def test_langid_macro_f1_margins_consistent(spark):
    """The report must reconcile exactly with its own confusion matrix:
    per class tp + fn = truth-row margin, tp + fp = prediction-column
    margin, every ratio within [0, 1e6], and f1 bounded by min/max of
    precision and recall (the harmonic-mean sandwich)."""
    from collections import defaultdict

    from hadoop_digit_recognition_spark.all_queries import SPARK_QUERIES

    cm = SPARK_QUERIES["ml_naive_bayes_langid"](spark, SF_ORACLE).collect()
    rep = {r["lang"]: r for r in SPARK_QUERIES["ml_langid_macro_f1"](
        spark, SF_ORACLE).collect()}
    act, prd, diag = defaultdict(int), defaultdict(int), defaultdict(int)
    for r in cm:
        act[r["true_lang"]] += r["n"]
        prd[r["pred_lang"]] += r["n"]
        if r["true_lang"] == r["pred_lang"]:
            diag[r["true_lang"]] += r["n"]
    assert set(rep) == set(act) | set(prd)
    for lang, r in rep.items():
        assert r["tp"] == diag[lang]
        assert r["tp"] + r["fn"] == act[lang]
        assert r["tp"] + r["fp"] == prd[lang]
        for c in ("prec_e6", "rec_e6", "f1_e6"):
            assert 0 <= r[c] <= 1000000
        lo, hi = sorted((r["prec_e6"], r["rec_e6"]))
        # floored harmonic mean can undershoot the floor'd min by 1 ulp
        assert r["f1_e6"] <= hi and (lo == 0 or r["f1_e6"] >= 0)


def test_chaining_audit_identical_block_and_bounds(spark, tmp_path):
    """An identical-text block must audit as one cluster with
    min = avg = 1e6 and chain_risk False; on the real fixture every
    row satisfies min <= avg <= 1e6 and n_members >= 2."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hadoop_digit_recognition_spark.all_queries import (
        ORACLE_SQL, SPARK_QUERIES)
    from .oracle_harness import compare

    texts = ["copy of this exact doc text here now"] * 4 + [
        "totally different content words appear once"]
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * len(texts)),
        "source": pa.array(["s"] * len(texts)),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    d = str(tmp_path)
    pq.write_table(tbl, f"{d}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
    df = SPARK_QUERIES["dedup_cluster_chaining_audit"](spark, d)
    compare(df, con, ORACLE_SQL["dedup_cluster_chaining_audit"],
            "chaining:block")
    rows = df.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_members"] == 4
    assert r["min_jacc_e6"] == r["avg_jacc_e6"] == 1000000
    assert not r["chain_risk"]

    real = SPARK_QUERIES["dedup_cluster_chaining_audit"](
        spark, SF_ORACLE).collect()
    assert real
    for r in real:
        assert r["n_members"] >= 2
        assert 0 <= r["min_jacc_e6"] <= r["avg_jacc_e6"] <= 1000000
        assert r["chain_risk"] == (r["min_jacc_e6"] < 500000)


def test_kcenter_radii_monotone_and_greedy(spark):
    """The farthest-point invariants: selection radii are
    non-increasing (each round covers the previous worst gap), all
    selected ids are distinct, and the round-1 radius equals the true
    max distance from the seed (greedy optimality of the first step,
    recomputed in numpy)."""
    import numpy as np

    from hadoop_digit_recognition_spark.all_queries import SPARK_QUERIES
    from hadoop_digit_recognition_spark.tables import load

    rows = sorted(SPARK_QUERIES["corpus_kcenter_coreset"](
        spark, SF_ORACLE).collect(), key=lambda r: r["sel_round"])
    ids = [r["vec_id"] for r in rows]
    assert len(set(ids)) == len(ids)
    radii = [r["radius_e6"] for r in rows[1:]]
    assert all(a >= b for a, b in zip(radii, radii[1:])), radii

    emb = load(spark, SF_ORACLE, "embeddings").collect()
    vid = np.array([r["vec_id"] for r in emb])
    mat = np.array([r["embedding"] for r in emb], dtype=np.float64)
    nrm = np.sqrt((mat * mat).sum(axis=1))
    keep = nrm > 0
    vid, mat, nrm = vid[keep], mat[keep], nrm[keep]
    seed = ids[0]
    si = int(np.where(vid == seed)[0][0])
    cos = np.round((mat @ mat[si]) / (nrm * nrm[si]), 6)
    d = np.round((1 - cos) * 1e6).astype(np.int64)
    d[si] = -1
    assert rows[1]["radius_e6"] == int(d.max())
    assert rows[1]["vec_id"] == int(vid[d == d.max()].min())


def test_prototypicality_prune_fraction_and_ranks(spark):
    """Within every cell: ranks are a 1..n permutation, exactly
    floor(3n/10) members are pruned, and the pruned set is precisely
    the lowest-distance (most prototypical) prefix."""
    from collections import defaultdict

    from hadoop_digit_recognition_spark.all_queries import SPARK_QUERIES

    rows = SPARK_QUERIES["corpus_prototypicality_prune"](
        spark, SF_ORACLE).collect()
    cells = defaultdict(list)
    for r in rows:
        cells[r["cell"]].append(r)
    assert cells
    for cell, rs in cells.items():
        rs.sort(key=lambda r: r["proto_rank"])
        n = rs[0]["n_cell"]
        assert len(rs) == n
        assert [r["proto_rank"] for r in rs] == list(range(1, n + 1))
        dists = [r["dist_e6"] for r in rs]
        assert dists == sorted(dists)
        want_pruned = n * 3 // 10
        assert sum(r["pruned"] for r in rs) == want_pruned
        assert all(r["pruned"] for r in rs[:want_pruned])


def test_cuped_report_internal_consistency(spark):
    """The CUPED report must reconcile with itself: arms partition the
    user base, var_reduction equals 1 - var_y_cuped/var_y within the
    6-digit rounding of each reported column, and the adjustment is
    mean-preserving in the pooled sense (arm means shift by theta times
    each arm's pre-period imbalance — bounded by the raw mean spread)."""
    from hadoop_digit_recognition_spark.all_queries import SPARK_QUERIES
    from hadoop_digit_recognition_spark.tables import load

    rows = SPARK_QUERIES["ab_cuped_adjustment"](spark, SF_ORACLE).collect()
    assert len(rows) == 2
    n_users = load(spark, SF_ORACLE, "events") \
        .select("user_id").distinct().count()
    assert sum(r["n_users"] for r in rows) == n_users
    for r in rows:
        got = 1 - r["var_y_cuped"] / r["var_y"]
        assert abs(got - r["var_reduction"]) < 1e-4


def test_phash_verified_dedup_planted_collision(spark, tmp_path):
    """A planted bucket must classify its members exactly: doc 1 is a
    byte-identical copy of doc 0 (n_exact, l2_sq = 0); doc 2 bumps ONE
    character by one code point — the pooled block-sum ORDER is
    unchanged, so the pHash still collides, but the pixel check must
    flag it near with max_l2_sq = 1."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hadoop_digit_recognition_spark.all_queries import (
        ORACLE_SQL, SPARK_QUERIES)
    from hadoop_digit_recognition_spark.operators.multimodal import (
        RASTER_H, RASTER_W)
    from .oracle_harness import compare

    n_px = RASTER_H * RASTER_W
    # strictly increasing block sums left-to-right: block value grows
    # with column index, so a +1 bump in one pixel never flips an order
    base = "".join(chr(48 + (i % RASTER_W) // 4) for i in range(n_px))
    bumped = base[:10] + chr(ord(base[10]) + 1) + base[11:]
    texts = [base, base, bumped,
             "short unrelated doc that makes its own bucket"]
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * len(texts)),
        "source": pa.array(["s"] * len(texts)),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    d = str(tmp_path)
    pq.write_table(tbl, f"{d}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
    df = SPARK_QUERIES["multimodal_phash_verified_dedup"](spark, d)
    compare(df, con, ORACLE_SQL["multimodal_phash_verified_dedup"],
            "phash-verified:planted")
    rows = df.collect()
    grp = [r for r in rows if r["keep_id"] == 0]
    assert len(grp) == 1
    r = grp[0]
    assert r["n_docs"] == 3
    assert r["n_exact"] == 1 and r["n_near"] == 1
    assert r["max_l2_sq"] == 1


def test_ece_reconciles_with_bins(spark):
    """ECE/MCE must reconcile with the bins they summarize: recompute
    the weighted mean and max of the rounded per-bin gaps in Python
    and match the integer micro values exactly."""
    from hadoop_digit_recognition_spark.all_queries import SPARK_QUERIES

    bins = SPARK_QUERIES["ml_calibration_bins"](spark, SF_ORACLE).collect()
    r = SPARK_QUERIES["ml_calibration_ece"](spark, SF_ORACLE).collect()[0]
    n_total = sum(b["n"] for b in bins)
    gaps = [round(abs(b["calib_gap"]) * 1000000) for b in bins]
    want_ece = sum(b["n"] * g for b, g in zip(bins, gaps)) // n_total
    assert r["n_total"] == n_total
    assert r["n_bins"] == len(bins)
    assert r["ece_e6"] == want_ece
    assert r["mce_e6"] == max(gaps)


def test_quarantine_routing_priority_order(spark, tmp_path):
    """First-failure priority: an empty doc with an unknown lang must
    route to fail_empty_text (rule 1), a mismatched-length doc with an
    out-of-range length to fail_len_mismatch (rule 3 outranks 4), and
    the counts must hold the oracle on the planted fixture."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hadoop_digit_recognition_spark.all_queries import (
        ORACLE_SQL, SPARK_QUERIES)
    from .oracle_harness import compare

    rows = [
        (0, "", "xx", "s", 0),                         # empty + unknown lang
        (1, "ok " * 40, "en", "s", 120),               # pass
        (2, "tiny", "en", "s", 4),                     # len_range
        (3, "x" * 100, "en", "s", 999),                # len_mismatch (+range)
        (4, "y" * 100, "qq", "s", 100),                # unknown lang
    ]
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows]),
        "lang": pa.array([r[2] for r in rows]),
        "source": pa.array([r[3] for r in rows]),
        "n_chars": pa.array([r[4] for r in rows], pa.int64()),
    })
    d = str(tmp_path)
    pq.write_table(tbl, f"{d}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
    df = SPARK_QUERIES["dq_quarantine_routing"](spark, d)
    compare(df, con, ORACLE_SQL["dq_quarantine_routing"], "quarantine:prio")
    got = {r["verdict"]: r["n_rows"] for r in df.collect()}
    assert got == {"fail_empty_text": 1, "pass": 1, "fail_len_range": 1,
                   "fail_len_mismatch": 1, "fail_unknown_lang": 1}


def test_lift_gains_invariants(spark):
    """Gains-table identities: deciles partition the population, the
    final cumulative gain and lift are exactly 1e6 (all positives
    captured, lift 1.0 over random at full depth), and cumulative gain
    is non-decreasing in decile."""
    from hadoop_digit_recognition_spark.all_queries import SPARK_QUERIES
    from hadoop_digit_recognition_spark.tables import load

    rows = sorted(SPARK_QUERIES["ml_lift_gains_deciles"](
        spark, SF_ORACLE).collect(), key=lambda r: r["decile"])
    n = load(spark, SF_ORACLE, "embeddings").count()
    assert sum(r["n"] for r in rows) == n
    assert [r["decile"] for r in rows] == list(range(1, 11))
    gains = [r["cum_gain_e6"] for r in rows]
    assert gains == sorted(gains)
    assert gains[-1] == 1000000
    assert rows[-1]["cum_lift_e6"] == 1000000


def test_burstiness_metronome_and_poisson_poles(spark, tmp_path):
    """A metronome user (identical gaps) must score exactly B = -1;
    gaps with positive variance score in (-1, 1); both engines agree
    on the planted fixture."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq
    from datetime import datetime, timedelta

    from hadoop_digit_recognition_spark.all_queries import (
        ORACLE_SQL, SPARK_QUERIES)
    from .oracle_harness import compare

    t0 = datetime(2024, 2, 1)
    rows = []
    eid = 0
    for k in range(10):                      # metronome: exact 60s gaps
        rows.append((eid, t0 + timedelta(seconds=60 * k), 1)); eid += 1
    for k, off in enumerate([0, 1, 2, 10, 11, 12, 100, 101]):  # bursty
        rows.append((eid, t0 + timedelta(seconds=off), 2)); eid += 1
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array(["click"] * len(rows)),
        "value": pa.array([1.0] * len(rows), pa.float64()),
        "props": pa.array(["{}"] * len(rows)),
    })
    d = str(tmp_path)
    pq.write_table(tbl, f"{d}/events.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
    df = SPARK_QUERIES["events_interarrival_burstiness"](spark, d)
    compare(df, con, ORACLE_SQL["events_interarrival_burstiness"],
            "burstiness:poles")
    got = {r["user_id"]: r for r in df.collect()}
    assert got[1]["burstiness"] == -1.0 and not got[1]["bursty"]
    assert -1.0 < got[2]["burstiness"] < 1.0


def test_ktruss_fixpoint_certificate(spark):
    """The k-truss output must be a TRUSS, not a truncated loop: every
    kept edge's support RECOMPUTED over the output edge set alone must
    still clear k-2, and the output must be a subset of the input pair
    graph. Certifies the unrolled peel actually reached its fixpoint
    on the fixture."""
    from hadoop_digit_recognition_spark.operators.dedup import (
        _KTRUSS_K, graph_ktruss, dedup_minhash_lsh)

    out = graph_ktruss(spark, SF_ORACLE).collect()
    edges = {(r["doc_a"], r["doc_b"]) for r in out}
    assert edges, "fixture produced an empty truss — weak driver row"
    pairs = {(r["doc_a"], r["doc_b"]) for r in
             dedup_minhash_lsh(spark, SF_ORACLE)
             .select("doc_a", "doc_b").collect()}
    assert edges <= pairs
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for r in out:
        a, b = r["doc_a"], r["doc_b"]
        support = len(adj[a] & adj[b])
        assert support >= _KTRUSS_K - 2, (a, b, support)
        assert r["support"] == support, (
            "reported support is not the within-truss support "
            f"({a},{b}): {r['support']} vs {support}")


def test_facility_location_submodular_curve(spark):
    """Greedy facility location's two textbook invariants: the
    objective (total coverage) is monotone non-decreasing in rounds,
    and marginal gains are non-increasing (diminishing returns — the
    submodularity certificate). Gains must also equal the objective
    deltas exactly (everything lives on the integer micro-grid)."""
    from hadoop_digit_recognition_spark.all_queries import SPARK_QUERIES

    rows = sorted(SPARK_QUERIES["corpus_facility_location"](
        spark, SF_ORACLE).collect(), key=lambda r: r["sel_round"])
    assert [r["sel_round"] for r in rows] == [1, 2, 3]
    assert len({r["vec_id"] for r in rows}) == 3, "re-selected a facility"
    gains = [r["gain_e6"] for r in rows]
    assert all(g2 <= g1 for g1, g2 in zip(gains, gains[1:])), gains
    assert gains[0] > 0
    tots = [r["total_cov_e6"] for r in rows]
    assert all(t2 >= t1 for t1, t2 in zip(tots, tots[1:])), tots
    prev = 0
    for r in rows:
        assert r["total_cov_e6"] - prev == r["gain_e6"], r
        prev = r["total_cov_e6"]


def test_semdedup_eval_precision_invariant(spark):
    """SemDeDup's within-cell drops are threshold-VERIFIED, so drop
    precision against the same-tau exact truth must pin exactly 1e6;
    pair recall is the quantizer's measured cross-cell miss rate —
    positive, and below 1e6 exactly when some true pair crosses cells.
    Both invariants must hold for the single-probe AND multi-probe
    evals (multi-probe only ADDS comparisons, never skips the
    threshold verification), and the multi-probe quantizer's measured
    recall must materially beat the single-probe number — the round-11
    fix certified by measurement, not assertion."""
    r = SPARK_QUERIES["dedup_semdedup_eval_pr"](
        spark, SF_ORACLE).collect()[0]
    assert r["n_drops"] > 0 and r["drop_precision_e6"] == 1000000, r
    assert r["n_pairs"] > 0 and 0 < r["pair_recall_e6"] <= 1000000, r
    assert r["n_broken"] <= r["n_pairs"]
    m = SPARK_QUERIES["dedup_semdedup_mp_eval_pr"](
        spark, SF_ORACLE).collect()[0]
    assert m["n_drops"] > r["n_drops"], (r, m)
    assert m["drop_precision_e6"] == 1000000, m
    # same panel truth on both evals; multi-probe must break strictly
    # more of it, clearing the VERDICT r10 >= 0.6 recall bar
    assert m["n_pairs"] == r["n_pairs"], (r, m)
    assert m["pair_recall_e6"] > r["pair_recall_e6"], (r, m)
    assert m["pair_recall_e6"] >= 600000, m
    # the capped production rung: precision invariant still exact (a
    # prune only SKIPS comparisons, never un-verifies one), drop set a
    # subset of the uncapped multi-probe drops, recall strictly below —
    # the third point of the recall/cost curve that tunes M
    c = SPARK_QUERIES["dedup_semdedup_mp_capped_eval_pr"](
        spark, SF_ORACLE).collect()[0]
    assert c["drop_precision_e6"] == 1000000, c
    assert c["n_pairs"] == r["n_pairs"], (r, c)
    assert 0 < c["n_drops"] < m["n_drops"], (c, m)
    assert c["pair_recall_e6"] < m["pair_recall_e6"], (c, m)


def test_semdedup_multiprobe_extends_single_probe(spark):
    """Structural guarantees of the multi-probe quantizer: probe 1 is a
    rank PREFIX of the probe list, so (a) primary cells equal the
    single-probe assignment everywhere, and (b) the multi-probe drop
    set is a SUPERSET of the single-probe drops (every within-primary-
    cell pair is also a shared-probe-cell pair; extra probes only add
    comparisons). The capped variant's drops must stay inside the
    uncapped multi-probe drops (a prune can only skip comparisons)."""
    single = {r["vec_id"]: (r["cell"], r["dropped"]) for r in
              SPARK_QUERIES["dedup_semantic_semdedup"](
                  spark, SF_ORACLE).collect()}
    multi = {r["vec_id"]: (r["cell"], r["dropped"]) for r in
             SPARK_QUERIES["dedup_semdedup_multiprobe"](
                 spark, SF_ORACLE).collect()}
    assert set(single) == set(multi)
    for vid, (cell, dropped) in single.items():
        assert multi[vid][0] == cell, f"primary cell drift at {vid}"
        if dropped:
            assert multi[vid][1], f"multi-probe lost drop {vid}"
    capped = {r["vec_id"] for r in
              SPARK_QUERIES["dedup_semdedup_multiprobe_capped"](
                  spark, SF_ORACLE).collect() if r["dropped"]}
    mdrops = {v for v, (_, d) in multi.items() if d}
    assert capped <= mdrops, capped - mdrops
    assert len(mdrops) > sum(1 for _, d in single.values() if d)


def test_nndescent_sampled_round_never_worsens(spark):
    """The rho-sampled round keeps the same top-k-of-union rule as the
    full round, so the never-worsens invariant holds identically: every
    node's k-th best cosine is >= the seed graph's, and any improvement
    carries an is_new edge. Sampling only shrinks the PROPOSAL set —
    with S=8 over a 3-wide seed graph it must still find something at
    sf0.01 (the seed is imperfect), or the knob is mis-sized."""
    from hadoop_digit_recognition_spark.all_queries import SPARK_QUERIES

    old = SPARK_QUERIES["sim_knn_graph"](spark, SF_ORACLE).collect()
    new = SPARK_QUERIES["sim_nndescent_sampled_round"](
        spark, SF_ORACLE).collect()
    import collections
    omin = collections.defaultdict(lambda: 2.0)
    for r in old:
        omin[r["qid"]] = min(omin[r["qid"]], r["cos"])
    nmin = collections.defaultdict(lambda: 2.0)
    has_new = collections.defaultdict(bool)
    for r in new:
        nmin[r["qid"]] = min(nmin[r["qid"]], r["cos"])
        has_new[r["qid"]] |= r["is_new"]
    assert set(nmin) == set(omin)
    improved = 0
    for q in omin:
        assert nmin[q] >= omin[q] - 1e-12, f"node {q} worsened"
        if nmin[q] > omin[q]:
            improved += 1
            assert has_new[q], f"node {q} improved without a new edge"
    assert improved > 0
