"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

The authoritative metric (BASELINE.json) is documents-validated/sec of
the full rule suite over the synthetic interleaved-documents table;
per-query wall times for the operator inventory ride along in
"queries". Scaling evidence (local[8] vs local[32]) is produced by
scripts/scaling_bench.py → BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import shutil
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from anomaly_detection_spark.session import get_spark

BENCH_QUERIES = [
    "profile_lineitem",
    "uniqueness_lineitem_orderkey",
    "ri_dangling_partkeys",
    "volume_buckets_events",
    "latest_event_per_user",
    "lag_intervals_events",
    "drift_psi_events",
    "dedup_exact_documents",
    "text_quality_documents",
    "langid_documents",
    "curation_documents",
    "pii_redaction_documents",
    "webtext_cleanup_documents",
    "dsir_weights_documents",
    "line_dedup_documents",
    "quality_model_documents",
    "semdedup_synthetic",
    "dup_passages_documents",
    "mixture_sample_documents",
    "lm_perplexity_documents",
    "pack_sequences_documents",
    "ngram_jaccard_documents",
    "decontam_overlap_documents",
    "repetition_documents",
    "dataset_split_documents",
    "minhash_lsh_documents",
    "simhash_documents",
    "minhash_lsh_portable",
    "simhash_portable",
    "topk_embeddings_cosine",
    "lsh_ann_embeddings",
    "lsh_ann_recall",
    "ivf_ann_embeddings",
    "ivf_ann_recall",
    "ivf_planted_recall",
    "pq_ann_embeddings",
    "ivfpq_ann_embeddings",
    "embedding_near_dups",
    "impact_levels_customers",
    "alarm_accuracy_events",
    "event_latency_running_max",
    "outliers_huber_events",
    "outliers_spot_events",
    "backtest_volume_synthetic",
    "rolling_backtest_synthetic",
    "forecast_seasonal_synthetic",
    "backtest_grid_events",
    "backtest_freshness_grid_synthetic",
    "freshness_grid_oracle_synthetic",
    "span_violations_synthetic",
    "suite_doc_rule_counts",
    "suite_overall_fold",
    "suite_verdicts_synthetic",
    "completeness_model_synthetic",
    "freshness_model_synthetic",
    "event_freshness_model_synthetic",
    "spot_thresholds_synthetic",
    "spot_refit_synthetic",
    "huber_params_synthetic",
    "media_pipeline_synthetic",
    "media_transform_synthetic",
    "gif_pipeline_synthetic",
    "adpcm_pipeline_synthetic",
    "jpeg_pipeline_synthetic",
    "codec_pipeline_synthetic",
    "streaming_suite_synthetic",
    "dedup_clusters_synthetic",
    "dedup_survivors_documents",
    "stream_dedup_synthetic",
    "av_metadata_synthetic",
    "bpe_tokens_documents",
    "bpe_pack_documents",
    "stateful_freshness_synthetic",
    "event_freshness_synthetic",
    "freshness_verdicts_portable",
    "completeness_verdicts_portable",
]


def materialize(df) -> int:
    # noop datasource: full computation, zero serialization to driver
    df.write.format("noop").mode("overwrite").save()
    return 0


def run_full_suite(spark, n_docs: int, n_partitions: int) -> tuple[float, dict]:
    from anomaly_detection_spark.plans.suite import default_suite
    from anomaly_detection_spark.sources.catalog import LocalParquetCatalog
    from anomaly_detection_spark.sources.synthetic import (
        asset_catalog,
        commits_log,
        documents_interleaved,
        events_log,
        lineage_edges,
        queries_per_table,
    )

    # Materialize the synthetic table to parquet partitioned by
    # partition_id first: the engine's real input is a stored (Iceberg)
    # table, and the suite's rules must scan columnar storage — timing
    # repeated re-evaluation of the generator expressions would measure
    # the generator, not the engine.
    docs_dir = tempfile.mkdtemp(prefix="adspark_bench_docs_")
    documents_interleaved(spark, n_docs, n_partitions=n_partitions).write.mode(
        "overwrite"
    ).partitionBy("partition_id").parquet(docs_dir)
    docs = spark.read.parquet(docs_dir)
    cat = asset_catalog(spark, 4096)
    commits = commits_log(spark, n_partitions)

    scratch: list[str] = [docs_dir]

    def one_run() -> tuple[float, dict]:
        store_dir = tempfile.mkdtemp(prefix="adspark_bench_")
        scratch.append(store_dir)
        store = LocalParquetCatalog(store_dir)
        t0 = time.time()
        res = default_suite().run(
            spark,
            docs,
            cat,
            commits,
            store=store,
            events=events_log(spark, n_partitions),
            lineage_edges=lineage_edges(spark, n_partitions),
            queries_per_table=queries_per_table(spark),
        )
        n_verdicts = res.verdicts.count()
        n_viol = res.violations.count()
        return time.time() - t0, {"verdicts": n_verdicts, "violations": n_viol}

    # cold run includes one-time plan compile / codegen / python-worker
    # spinup (~15-25s regardless of data size — see CLAUDE.md); the warm
    # run on a FRESH store (no checkpoint reuse) measures the marginal
    # per-document cost that actually scales with corpus size.
    try:
        cold_sec, counts = one_run()
        warm_sec, counts2 = one_run()
        assert counts2 == counts
    finally:
        # drop the scratch dirs (docs parquet + per-run stores) — a
        # per-round bench at 1M docs writes tens of MB into /tmp, and
        # leaking them every round eventually fills the disk
        for d in scratch:
            shutil.rmtree(d, ignore_errors=True)
    return cold_sec, warm_sec, counts


def main() -> None:
    # Sample host weather BEFORE doing any work: load measured after the
    # bench would mostly reflect the bench's own local[N] execution.
    loadavg_at_start = [round(x, 2) for x in os.getloadavg()]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "1000000"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.1

    spark = get_spark(app_name="adspark-bench", master=f"local[{cpus}]", shuffle_partitions=2 * cpus)
    # warm the JVM + python workers once (excluded from timings)
    spark.range(1000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    cold_sec, warm_sec, suite_counts = run_full_suite(spark, n_docs, n_partitions=max(cpus, 16))
    timings["full_suite_synthetic"] = round(cold_sec, 3)
    timings["full_suite_synthetic_warm"] = round(warm_sec, 3)
    docs_per_sec = n_docs / warm_sec
    docs_per_sec_cold = n_docs / cold_sec

    qs = entrymod.all_queries()
    for name in BENCH_QUERIES:
        t0 = time.time()
        materialize(qs[name](spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "full_rule_suite_plus_operator_queries_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "docs_validated_per_sec": round(docs_per_sec, 1),
        "docs_validated_per_sec_cold": round(docs_per_sec_cold, 1),
        "suite_docs": n_docs,
        "suite_counts": suite_counts,
        "cpus": cpus,
        # host weather marker, sampled BEFORE the bench ran: bench
        # numbers are only comparable on an idle host (CLAUDE.md; the
        # r4 driver bench was load-contaminated)
        "loadavg_at_start_1m_5m_15m": loadavg_at_start,
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
