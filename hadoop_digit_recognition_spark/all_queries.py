"""Import every operator module for its registration side effects and
expose the populated registry. `__spark_entry__.py` re-exports these."""

from __future__ import annotations

from .registry import ORACLE_SQL, ROWS_ONLY, SPARK_QUERIES

from .rbm import queries as _rbm_queries  # noqa: F401,E402

_OPTIONAL_MODULES = [
    "hadoop_digit_recognition_spark.operators.relational",
    "hadoop_digit_recognition_spark.operators.tpch_extra",
    "hadoop_digit_recognition_spark.operators.analytics_extra",
    "hadoop_digit_recognition_spark.operators.arrays",
    "hadoop_digit_recognition_spark.operators.dedup",
    "hadoop_digit_recognition_spark.operators.similarity",
    "hadoop_digit_recognition_spark.operators.text",
    "hadoop_digit_recognition_spark.operators.multimodal",
    "hadoop_digit_recognition_spark.operators.windows",
    "hadoop_digit_recognition_spark.operators.physical",
    "hadoop_digit_recognition_spark.operators.sketches",
    "hadoop_digit_recognition_spark.operators.corpus",
    "hadoop_digit_recognition_spark.operators.corpus_hygiene",
    "hadoop_digit_recognition_spark.operators.dataquality",
    "hadoop_digit_recognition_spark.operators.graph",
    "hadoop_digit_recognition_spark.operators.merge",
    "hadoop_digit_recognition_spark.operators.pandas_udfs",
    "hadoop_digit_recognition_spark.ml.queries",
    "hadoop_digit_recognition_spark.ml.lsh",
    "hadoop_digit_recognition_spark.streaming.queries",
    "hadoop_digit_recognition_spark.sources.queries",
]

import importlib

for _m in _OPTIONAL_MODULES:
    try:
        importlib.import_module(_m)
    except ModuleNotFoundError as _e:
        # Only "module not built yet" is ignorable. A missing TRANSITIVE
        # dependency (pandas, pyspark.ml, ...) must re-raise — swallowing it
        # would silently shrink the registry the driver verifies.
        if _e.name != _m:
            raise


def _rotate_for_driver_coverage() -> None:
    """Reorder SPARK_QUERIES so the driver's fixed-size correctness window
    (first N registry entries) rotates across the whole registry over rounds.

    The driver records each sampled query in CORRECTNESS_r{N}.json at the
    repo root. We count how many rounds have already sampled each query and
    stably sort the registry by that count ascending, so never-sampled
    queries reach the window first and coverage converges to the full
    registry as rounds progress. One override: a query whose MOST RECENT
    sampled row was not green (hash_match is not true and it isn't a
    declared rows-only entry) jumps to the very front — a fixed red needs
    a green driver row more urgently than a never-sampled one needs its
    first. Pure reordering: no entries are added, removed, or modified.
    """
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    times_seen: dict[str, int] = {}
    last_green: dict[str, bool] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        if isinstance(rows, dict):
            for name, row in rows.items():
                times_seen[name] = times_seen.get(name, 0) + 1
                if isinstance(row, dict):
                    last_green[name] = (
                        row.get("hash_match") is True
                        or row.get("err") == "no_oracle")
    if not times_seen:
        return
    # The round-7 `_ADDED_LATE` hold-back is dissolved (VERDICT r07 ask #1):
    # the seven late-round-7 operators are pinned to the FRONT of the round-8
    # window so each finally earns its official driver row, then zero-seen
    # rotation fills the remaining slots from the 68 never-sampled names.
    _NAME_PRIORITY = {
        "dq_l_diversity", "text_bpe_encode", "timeseries_holt_linear",
        "dedup_record_linkage_fs", "sketch_kmv_intersection",
        "timeseries_theil_sen", "ml_ridge_path",
    }
    _FAMILY_PRIORITY = {
        "hadoop_digit_recognition_spark.operators.graph": 1,
        "hadoop_digit_recognition_spark.operators.corpus": 2,
        "hadoop_digit_recognition_spark.operators.merge": 3,
        "hadoop_digit_recognition_spark.operators.dataquality": 4,
        "hadoop_digit_recognition_spark.operators.corpus_hygiene": 5,
        "hadoop_digit_recognition_spark.operators.physical": 6,
    }

    # Queries added DURING round 8 (mid-round additions): hold them behind
    # every longer-waiting zero-seen query so the driver burn-down of the
    # round-7 backlog is undisturbed; they enter the window in later rounds
    # through the same zero-seen-first rotation.
    _ADDED_LATE: set[str] = {
        "dedup_record_linkage_em", "text_bpe_merge_train_scaled",
        "dq_t_closeness", "sketch_moments_ams",
        "corpus_influence_tracing", "graph_harmonic_centrality",
        "timeseries_croston_intermittent", "ml_isotonic_pav",
        "corpus_span_corruption_plan", "graph_betweenness_bounded",
        "dedup_minhash_bbit", "ml_gbm_ls_stumps", "dq_fd_discovery",
        "source_tar_shard_ingest",
        # round-8 continuation session (third batch)
        "graph_hits_hubs_authorities", "graph_scc_forward_backward",
        "graph_personalized_pagerank", "timeseries_dtw_pairs",
        "ml_random_forest_stumps", "dq_mutual_information",
        "dq_dp_noisy_counts", "multimodal_vit_patch_plan",
        "text_rake_keywords", "source_txnlog_snapshot_replay",
        "timeseries_holt_winters", "graph_walk_corpus",
        "sketch_bitmap_distinct", "events_prefixspan_topk",
        "events_attribution_shapley", "graph_louvain_move_phase",
        "corpus_curriculum_order", "timeseries_matrix_profile_sad",
        "events_markov_stationary", "sql_recursive_cte_bfs",
        "multimodal_audio_landmark_fingerprint", "dq_cfd_discovery",
        "sim_binary_quantization_hamming", "sim_mutual_knn_pairs",
    }

    # Queries added during ROUND 9: behind even the round-8 late queue,
    # so the 55-name driver burn-down finishes undisturbed (VERDICT r08
    # ask #3) and these enter the window in r10+.
    _ADDED_LATE_R9: set[str] = {
        "pipeline_corpus_release", "pipeline_release_manifest",
        "ml_quality_classifier_distill",
        "corpus_decontamination_semantic_lsh",
        "text_unigram_viterbi_segment", "text_unigram_em_reestimate",
    }

    # Queries added during ROUND 10: behind the round-9 late queue, so
    # the final 44-name never-sampled burn-down (VERDICT r09 ask #2)
    # fronts the r10 window undisturbed; these enter in r11+.
    _ADDED_LATE_R10: set[str] = {
        "sim_nndescent_recall_curve", "ml_pr_auc", "dq_kruskal_wallis",
        "dq_fleiss_kappa", "graph_ktruss", "corpus_facility_location",
        "ab_propensity_strata", "ml_uplift_qini",
        "ml_brier_decomposition", "ab_simpsons_paradox_check",
        "dedup_semdedup_eval_pr", "ml_learning_curve",
    }

    # Queries added during ROUND 11: behind the round-10 late queue, so
    # the FINAL 6 never-sampled names (the round-10 eval shelf) front the
    # r11 window first and the registry's official-row ledger closes
    # (VERDICT r10 ask #4); these enter in r12+.
    _ADDED_LATE_R11: set[str] = {
        "dedup_semdedup_multiprobe", "dedup_semdedup_multiprobe_capped",
        "dedup_semdedup_mp_eval_pr", "dedup_semdedup_mp_capped_eval_pr",
        "sim_nndescent_sampled_round",
    }

    def _family(n: str) -> int:
        if n in _ADDED_LATE_R11:
            return 13
        if n in _ADDED_LATE_R10:
            return 12
        if n in _ADDED_LATE_R9:
            return 11
        if n in _ADDED_LATE:
            return 10
        if n in _NAME_PRIORITY:
            return 0
        return _FAMILY_PRIORITY.get(
            getattr(SPARK_QUERIES[n], "__module__", ""), 9)

    ordered = sorted(
        SPARK_QUERIES,
        key=lambda n: (-1 if last_green.get(n, True) is False else
                       times_seen.get(n, 0), _family(n)))
    reordered = {n: SPARK_QUERIES[n] for n in ordered}
    SPARK_QUERIES.clear()
    SPARK_QUERIES.update(reordered)


_rotate_for_driver_coverage()

__all__ = ["SPARK_QUERIES", "ORACLE_SQL", "ROWS_ONLY"]
