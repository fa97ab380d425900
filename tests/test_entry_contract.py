"""Driver-gate contract pins for __spark_entry__.

The per-round driver runs every entry in queries() against oracle_sql()
and emits one CORRECTNESS row per query — but caps the gate at 50 rows.
Round 4 silently dropped 3 registered queries past the cap; these pins
keep the registered surface and the gate output coincident."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402

GATE_CAP = 50


def test_registry_exactly_at_gate_cap():
    qs = entry.queries()
    assert len(qs) == GATE_CAP, (
        f"queries() registers {len(qs)} entries; the driver gate emits at "
        f"most {GATE_CAP} CORRECTNESS rows — hold the registry at exactly "
        f"{GATE_CAP} so nothing silently drops out of the hard signal."
    )
    assert len(set(qs)) == len(qs)


def test_every_oracle_key_is_registered():
    qs, oracles = entry.queries(), entry.oracle_sql()
    missing = sorted(set(oracles) - set(qs))
    assert not missing, f"oracle_sql() keys with no queries() entry: {missing}"


def test_rows_only_queries_are_the_documented_set():
    """Every query WITHOUT an oracle must be one of the documented
    rows-only-by-design cases (xxhash64-jittered verdict fixtures, SPOT
    streaming flags on real events, the xxhash64 freshness-grid replay)
    — adding a new oracle-less query is a deliberate act, not an
    accident. Their computational cores are all green via oracle twins
    (see each query's docstring)."""
    qs, oracles = entry.queries(), entry.oracle_sql()
    rows_only = sorted(set(qs) - set(oracles))
    documented = sorted(
        [
            "minhash_lsh_documents",
            "simhash_documents",
            "event_freshness_synthetic",
            "backtest_freshness_grid_synthetic",
        ]
    )
    assert rows_only == documented, rows_only


def test_extra_queries_run_and_are_row_count_stable(spark):
    """Every _EXTRA_QUERIES entry (rotated out of the 50-row gate but
    still part of the exported surface) must keep running and keep its
    row count at sf0.001 — eviction from the gate must never become
    silent bit-rot."""
    expected = {
        "embedding_near_dups": 25,
        "text_quality_documents": 500,
        "ivf_planted_recall": 1,
        "uniqueness_lineitem_orderkey": 1365,
        "huber_params_synthetic": 4,
        "fingerprint_documents": 500,
        "ngram_jaccard_documents": 28,
        "freshness_constant_events": 15,
        "completeness_model_synthetic": 8,
        "media_pipeline_synthetic": 240,
        "freshness_model_synthetic": 8,
        "rolling_backtest_synthetic": 198,
        "completeness_override_events": 5,
        "latest_event_per_user": 15,
        "status_spine_orders": 3,
        "impact_levels_customers": 2,
        "lag_intervals_events": 985,
        "freshness_verdicts_synthetic": 8,
        "completeness_verdicts_synthetic": 7,
        "event_latency_running_max": 192,
        "ri_orders_customer_stats": 1,
        "alarm_accuracy_events": 1,
        "volume_buckets_events": 30,
        "backtest_grid_events": 5,
        "ri_dangling_partkeys": 0,
        "suite_overall_fold": 8,
        "spot_thresholds_synthetic": 4,
        "langid_documents": 2,
        "dedup_exact_documents": 1,
        "pack_sequences_documents": 500,
        "media_transform_synthetic": 240,
        "dedup_clusters_synthetic": 120,
        "backtest_volume_synthetic": 6,
        "ivf_ann_recall": 1,
    }
    assert set(expected) == set(entry._EXTRA_QUERIES)
    got = {
        name: entry._utc(fn)(spark, "/root/testdata/sf0.001").count()
        for name, fn in entry._EXTRA_QUERIES.items()
    }
    assert got == expected


def test_rotated_out_queries_retain_their_oracles():
    """Rotation policy (round-5 verdict #3): queries moved to
    _EXTRA_QUERIES keep their DuckDB twins in _oracle_sql_all() so
    rotating them back into the gate is a one-line registry edit; and
    every _EXTRA_QUERIES entry that ever had an oracle still has one."""
    all_oracles = entry._oracle_sql_all()
    for name in (
        "huber_params_synthetic",
        "fingerprint_documents",
        "ngram_jaccard_documents",
        "freshness_constant_events",
        "completeness_model_synthetic",
        "media_pipeline_synthetic",
        "status_spine_orders",
        "impact_levels_customers",
        "lag_intervals_events",
        "event_latency_running_max",
        "ri_orders_customer_stats",
        "alarm_accuracy_events",
        "volume_buckets_events",
        "backtest_grid_events",
        "ri_dangling_partkeys",
        "suite_overall_fold",
        "spot_thresholds_synthetic",
        "langid_documents",
        "completeness_model_synthetic",
        "media_pipeline_synthetic",
        "freshness_model_synthetic",
        "rolling_backtest_synthetic",
        "completeness_override_events",
        "dedup_exact_documents",
        "text_quality_documents",
        "ivf_planted_recall",
        "uniqueness_lineitem_orderkey",
        "embedding_near_dups",
        "pack_sequences_documents",
        "media_transform_synthetic",
        "dedup_clusters_synthetic",
        "backtest_volume_synthetic",
        "ivf_ann_recall",
    ):
        assert name in entry._EXTRA_QUERIES
        assert name in all_oracles, f"rotated-out {name} lost its oracle SQL"


def test_adpcm_oracle_step_table_in_lockstep():
    """The adpcm oracle's VALUES step table is generated from
    multimodal._IMA_STEPS — pin the published table's shape and
    endpoints so neither side can drift."""
    from anomaly_detection_spark.operators.multimodal import _IMA_STEPS

    assert len(_IMA_STEPS) == 89
    assert _IMA_STEPS[0] == 7 and _IMA_STEPS[88] == 32767
    assert list(_IMA_STEPS) == sorted(_IMA_STEPS)
    assert "(88, 32767)" in entry._ima_steps_values()
