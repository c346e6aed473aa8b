"""Round-11 optimization internals: the composition-frame memo cache
(memo_persist / knn_graph_cached / _sem_probe_frames) and the honesty
contract the bench relies on — clear_signature_cache must leave NO
persisted state behind, so cold repetitions stay cold."""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def test_memo_persist_registers_and_evicts(spark):
    from hadoop_digit_recognition_spark.operators.dedup import (
        _SIG_CACHE, clear_signature_cache, memo_persist)

    clear_signature_cache(spark)
    built = []

    def build():
        built.append(1)
        return spark.range(10)

    a = memo_persist(spark, "r11test::range", build)
    b = memo_persist(spark, "r11test::range", build)
    assert built == [1], "second lookup must be a cache hit"
    assert a is b
    assert a.storageLevel.useMemory, "memo frames must be persisted"
    n = clear_signature_cache(spark)
    assert n >= 1
    assert "r11test::range" not in (_SIG_CACHE.get(spark) or {})
    # a fresh call rebuilds (cold again)
    memo_persist(spark, "r11test::range", build)
    assert built == [1, 1]
    clear_signature_cache(spark)


def test_knn_graph_cached_matches_builder(spark):
    from hadoop_digit_recognition_spark.operators.dedup import (
        clear_signature_cache)
    from hadoop_digit_recognition_spark.operators.similarity import (
        knn_graph_cached, sim_knn_graph)

    clear_signature_cache(spark)
    direct = {tuple(r) for r in
              sim_knn_graph(spark, SF_SMOKE).collect()}
    cached = {tuple(r) for r in
              knn_graph_cached(spark, SF_SMOKE).collect()}
    assert cached == direct
    # memo hit returns the identical frame
    again = knn_graph_cached(spark, SF_SMOKE)
    assert again is knn_graph_cached(spark, SF_SMOKE)
    clear_signature_cache(spark)


def test_sem_probe_frames_memoized_and_cold_after_clear(spark):
    from hadoop_digit_recognition_spark.operators.dedup import (
        SEM_PROBES, _sem_probe_frames, clear_signature_cache)

    clear_signature_cache(spark)
    p1, pr1, q1 = _sem_probe_frames(spark, SF_SMOKE, SEM_PROBES)
    rows1 = {tuple(r) for r in q1.collect()}
    p2, pr2, q2 = _sem_probe_frames(spark, SF_SMOKE, SEM_PROBES)
    assert q2 is q1 and pr2 is pr1, "memo must return the same frames"
    clear_signature_cache(spark)
    _, _, q3 = _sem_probe_frames(spark, SF_SMOKE, SEM_PROBES)
    assert q3 is not q1, "post-eviction call must rebuild"
    assert {tuple(r) for r in q3.collect()} == rows1
    clear_signature_cache(spark)


def test_facility_location_single_totals_job_equivalence(spark, duck):
    """The fused conditional-aggregation totals must equal the oracle's
    per-round coverage chain (already hash-checked by the registered
    oracle; this pins the per-round objective monotonicity the fusion
    must preserve)."""
    from hadoop_digit_recognition_spark.operators.dedup import (
        corpus_facility_location)
    from tests.conftest import SF_ORACLE

    rows = (corpus_facility_location(spark, SF_ORACLE)
            .orderBy("sel_round").collect())
    tots = [r["total_cov_e6"] for r in rows]
    gains = [r["gain_e6"] for r in rows]
    assert tots == sorted(tots), "coverage objective must be monotone"
    assert all(g >= 0 for g in gains)
    # round k's total equals round k-1's total plus its marginal gain
    for k in range(1, len(rows)):
        assert tots[k] == tots[k - 1] + gains[k]
    assert tots[0] == gains[0]
